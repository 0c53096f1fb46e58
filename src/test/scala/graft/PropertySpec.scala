package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Temporal
import graft.sources.Sink

/** Property tests: operator semantics checked against a naive
  * in-memory reference on ScalaCheck-generated data. Generators run
  * with FIXED seeds (scalacheck as a generator library) so failures
  * are reproducible, not flaky. Key collisions, timestamp ties and
  * version ties are all likely at these ranges — exactly the corners
  * the deterministic tie-break rules exist for.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // (key, ts/version, value) triples over deliberately small ranges
  private val triplesGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(40, 80)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(1L, 5L)
      t <- Gen.choose(0L, 50L)
      v <- Gen.choose(1L, 999L)
    } yield (k, t, v))
  } yield rows

  /** Naive as-of: latest right (ts <= lts), ties on ts broken by max value. */
  private def naiveAsOf(lrows: Seq[(Long, Long, Long)],
      rrows: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Long)] =
    lrows.map { case (k, lts, lv) =>
      val cands = rrows.filter(r => r._1 == k && r._2 <= lts)
      val v =
        if (cands.isEmpty) -1L
        else {
          val mts = cands.map(_._2).max
          cands.filter(_._2 == mts).map(_._3).max
        }
      (k, lts, lv, v)
    }

  test("asOfJoin (window) matches the naive reference on random data") {
    val lrows = sample(triplesGen, 7L)
    val rrows = sample(triplesGen, 11L)
    val got = Temporal.asOfJoin(
        lrows.toDF("k", "lts", "lv"), rrows.toDF("k", "rts", "rv"),
        "k", "lts", "rts", Seq("rv"), tieBreak = Some("rv"))
      .select(col("k"), col("lts"), col("lv"), col("asof_rv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSeq
    assert(got.sorted == naiveAsOf(lrows, rrows).sorted)
  }

  test("asOfJoinForward matches the naive forward reference on random data") {
    val lrows = sample(triplesGen, 19L)
    val rrows = sample(triplesGen, 23L)
    val got = Temporal.asOfJoinForward(
        lrows.toDF("k", "lts", "lv"), rrows.toDF("k", "rts", "rv"),
        "k", "lts", "rts", Seq("rv"), tieBreak = Some("rv"))
      .select(col("k"), col("lts"), col("lv"), col("asof_rv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toSeq
    // Naive forward: earliest right (ts >= lts), ties on ts → max value.
    val naive = lrows.map { case (k, lts, lv) =>
      val cands = rrows.filter(r => r._1 == k && r._2 >= lts)
      val v =
        if (cands.isEmpty) -1L
        else {
          val mts = cands.map(_._2).min
          cands.filter(_._2 == mts).map(_._3).max
        }
      (k, lts, lv, v)
    }
    assert(got.sorted == naive.sorted)
  }

  test("native AsOfJoinExec agrees with the window formulation") {
    val lrows = sample(triplesGen, 13L)
    // both formulations require/assume a tie-free right side
    val rrows = sample(triplesGen, 17L)
      .groupBy(r => (r._1, r._2))
      .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toSeq
    val left = lrows.toDF("k", "lts", "lv")
    val win = Temporal.asOfJoin(
        left, rrows.toDF("k", "rts", "rv"), "k", "lts", "rts", Seq("rv"))
      .select(col("k"), col("lts"), col("lv"), col("asof_rv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    val nat = graft.plans.AsOfJoinOps.asOfJoinNative(spark,
        left, rrows.toDF("rk", "rts", "rv"), "k", "rk", "lts", "rts")
      .select(col("k"), col("lts"), col("lv"), col("rv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(win.sorted == nat.sorted)
    assert(nat.sorted == naiveAsOf(lrows, rrows).sorted)
  }

  test("saltedJoin is row-identical to the plain join under skew") {
    // heavily skewed facts: ~half the rows land on key 1
    val facts = sample(triplesGen, 29L)
      .map { case (k, t, v) => (if (v % 2 == 0) 1L else k, t, v) }
    val dims = sample(triplesGen, 31L).map(r => (r._1, r._3))
      .distinct.map { case (k, v) => (k, s"d$v") }
    val f = facts.toDF("fk", "t", "v")
    val d = dims.toDF("dk", "name")
    val plain = f.join(d, f("fk") === d("dk")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
      .toSeq.sorted
    val salted = Temporal
      .saltedJoin(f, d, "fk", "dk", nSalt = 4, saltCols = Seq("t", "v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
      .toSeq.sorted
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("dedupUpsert converges to max version per key across batches") {
    val b1 = sample(triplesGen, 19L)
    val b2 = sample(triplesGen, 23L)
    val path = java.nio.file.Files.createTempDirectory("graft-upsert")
      .resolve("t").toString
    Sink.dedupUpsert(spark, path, b1.toDF("k", "ver", "v"), Seq("k"), "ver")
    Sink.dedupUpsert(spark, path, b2.toDF("k", "ver", "v"), Seq("k"), "ver")
    val got = spark.read.parquet(path).select("k", "ver", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = (b1 ++ b2).groupBy(_._1).map { case (k, rs) =>
      val mver = rs.map(_._2).max
      (k, mver, rs.filter(_._2 == mver).map(_._3).max) // version tie → max v
    }.toSeq
    assert(got.sorted == expected.sorted)
    assert(got.map(_._1).distinct.length == got.length) // one row per key
  }

  test("IntervalJoinExec matches the naive interval scan on random data") {
    // Random NON-OVERLAPPING calendar: cut points -> [c_i, c_{i+1})
    // intervals, keeping every other gap so coverage has holes.
    val cutsGen = Gen.listOfN(12, Gen.choose(0L, 1000L))
    val tsGen = Gen.listOfN(300, Gen.choose(-50L, 1100L))
    val cuts = sample(cutsGen, 13L).distinct.sorted
    val ivs = cuts.sliding(2).zipWithIndex.collect {
      case (List(a, b), i) if i % 2 == 0 => (i.toLong, a, b)
    }.toList
    val ts = sample(tsGen, 17L)
    val naive = for {
      (t, row) <- ts.zipWithIndex
      (tag, a, b) <- ivs if t >= a && t < b
    } yield (row.toLong, tag)
    val left = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("row_id", "t")
      .select(col("row_id"), timestamp_seconds(col("t")).as("t"))
    val right = ivs.toDF("tag", "a", "b")
      .select(col("tag"), timestamp_seconds(col("a")).as("start_ts"),
        timestamp_seconds(col("b")).as("end_ts"))
    val got = graft.plans.IntervalJoinOps
      .intervalJoinNative(spark, left, right, "t", "start_ts", "end_ts")
      .select(col("row_id"), col("tag")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == naive.sorted)
  }

  test("property: TopKRewrite matches the unrewritten window on random data") {
    // deliberately small ranges → heavy key collisions and rank-key
    // ties; (v, tie) is made total by a unique tie column so window
    // and heap must agree exactly
    (1L to 5L).foreach { seed =>
      val rows = sample(triplesGen, 7000 + seed).zipWithIndex
        .map { case ((k, t, v), i) => (k, t, v, i.toLong) }
      val df = rows.toDF("k", "t", "v", "tie")
      def topn(enabled: Boolean) = {
        spark.conf.set("spark.graft.topkRewrite.enabled", enabled.toString)
        try {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("k")).orderBy(col("v").desc, col("tie").asc)
          val r = df.withColumn("rk", row_number().over(w))
            .filter(col("rk") <= 3)
            .collect().map(_.toSeq).toSet
          val plan = df.withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("k")).orderBy(col("v").desc, col("tie").asc)))
            .filter(col("rk") <= 3).queryExecution.optimizedPlan.toString
          (r, plan)
        } finally spark.conf.set("spark.graft.topkRewrite.enabled", "true")
      }
      val (on, planOn) = topn(enabled = true)
      val (off, planOff) = topn(enabled = false)
      assert(planOn.contains("graft_topk"), s"seed $seed: rule did not fire")
      assert(!planOff.contains("graft_topk"))
      assert(on == off, s"seed $seed")
    }
  }

  test("rolling frame aggregates match a naive sliding reference on random series") {
    // random (key, seq, cents) series with heavy ties; the 7-row frame
    // median/moment rules must agree with a straightforward slide
    (1L to 3L).foreach { seed =>
      val rows = sample(triplesGen, 9000 + seed).zipWithIndex
        .map { case ((k, t, v), i) => (k, t * 1000 + i, v) } // unique order key
      val df = rows.toDF("k", "ord", "cents")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("ord")).rowsBetween(-6, 0)
      val got = df
        .withColumn("vals", sort_array(collect_list(col("cents")).over(w)))
        .withColumn("n", size(col("vals")).cast("long"))
        .withColumn("med", element_at(col("vals"), expr("CAST(ceil(n / 2.0) AS INT)")))
        .withColumn("sx", sum(col("cents")).over(w))
        .select(col("k"), col("ord"), col("n"), col("med"), col("sx"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val byKey = rows.groupBy(_._1)
      for ((k, rs) <- byKey) {
        val sorted = rs.sortBy(_._2)
        for (i <- sorted.indices) {
          val win = sorted.slice(math.max(0, i - 6), i + 1).map(_._3)
          val med = win.sorted.apply((win.length + 1) / 2 - 1)
          val (gn, gmed, gsx) = got((k, sorted(i)._2))
          assert(gn === win.length.toLong, s"seed $seed n")
          assert(gmed === med, s"seed $seed med at $k/${sorted(i)._2}")
          assert(gsx === win.sum, s"seed $seed sum")
        }
      }
    }
  }

  test("sentence dedup drop rule is stable under duplicated corpora") {
    // duplicating every doc must not change WHICH sentences are hot
    // relative to the 3-doc threshold scaled accordingly — here we just
    // assert determinism and the containment invariant on the real table
    val a = graft.functions.TextFunctions.sentenceDedup(spark, sf).collect()
    val b = graft.functions.TextFunctions.sentenceDedup(spark, sf).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    for (r <- a) assert(r.getLong(2) <= r.getLong(1))
  }
}
