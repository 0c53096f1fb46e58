package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.operators.{Analytics, Relational, Temporal}

/** Round-3 session-3 operators: discrete quantiles / IQR fences,
  * chi-squared cells, interval-union sweep, RFM quartile scoring,
  * largest-remainder apportionment, journey trigrams, media phash.
  */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("winsorized stats: both robust means live inside the clamp " +
    "window and an injected outlier cannot move them") {
    val got = Analytics.winsorizedStats(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.nonEmpty)
    got.foreach { case (g, (winsor, trim, p05, p95)) =>
      assert(p05 < p95, s"$g edges")
      assert(winsor >= p05 && winsor <= p95, s"$g winsor mean outside clamp")
      assert(trim >= p05 && trim <= p95, s"$g trimmed mean outside window")
    }
    // robustness: a driver-side replay with one absurd outlier appended
    // moves the plain mean but neither robust mean by more than the
    // outlier's share of the clamp window
    val vals = graft.sources.Tables.load(spark, sf, "orders")
      .filter(col("o_orderpriority") === "2-HIGH")
      .select(col("o_totalprice")).as[Double].collect().sorted
    def interp(s: Array[Double], p: Double): Double = {
      val r = p * (s.length - 1)
      val i = r.toInt
      if (i + 1 < s.length) s(i) + (r - i) * (s(i + 1) - s(i)) else s(i)
    }
    def winsorOf(s: Array[Double]): Double = {
      val (lo, hi) = (interp(s, 0.05), interp(s, 0.95))
      s.map(v => math.max(lo, math.min(hi, v))).sum / s.length
    }
    val clean = winsorOf(vals)
    val dirty = winsorOf((vals :+ 1e12).sorted)
    assert(math.abs(dirty - clean) / clean < 0.01,
      s"winsorized mean must resist a 1e12 outlier: $clean -> $dirty")
    // and the engine's number matches the same replay on clean data
    assert(math.abs(got("2-HIGH")._1 - clean) < 0.01, s"${got("2-HIGH")._1} vs $clean")
  }

  test("percentile_disc picks the value at position ceil(n*p) of the sorted column") {
    val got = Analytics.percentileDisc(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val byGroup = graft.sources.Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"))
      .as[(String, Double)].collect().groupBy(_._1)
    for ((g, rows) <- byGroup) {
      val sorted = rows.map(_._2).sorted
      def disc(p: Double) = sorted(math.ceil(sorted.length * p).toInt - 1)
      assert(got(g) === ((disc(0.25), disc(0.5), disc(0.75))), s"group $g")
    }
  }

  test("IQR outlier counts match a driver-side recompute and fences bound the data") {
    val rep = Analytics.outlierIqr(spark, sf).collect()
    val byGroup = graft.sources.Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"))
      .as[(String, Double)].collect().groupBy(_._1)
    for (r <- rep) {
      val (q1, q3) = (r.getDouble(1), r.getDouble(2))
      val vals = byGroup(r.getString(0)).map(_._2)
      val (lo, hi) = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
      assert(r.getLong(3) === vals.count(v => v < lo || v > hi))
      assert(q1 <= q3)
    }
  }

  test("chi-squared expected counts reproduce the row/col marginals") {
    val cells = Analytics.chi2Cells(spark, sf)
    // expected sums back to the observed row totals (within rounding)
    val rowCheck = cells.groupBy(col("o_orderstatus"))
      .agg(sum(col("observed")).as("o"), sum(col("expected")).as("e"))
      .filter(abs(col("o") - col("e")) > 0.01)
    assert(rowCheck.isEmpty)
    assert(cells.filter(col("contribution") < 0).isEmpty)
  }

  test("interval union: covered time never exceeds span or total interval volume") {
    val len = 1800L * 1000000L
    val u = Temporal.intervalUnion(spark, sf, len)
    val e = graft.sources.Tables.load(spark, sf, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        (max(unix_micros(col("ts").cast("timestamp"))) -
          min(unix_micros(col("ts").cast("timestamp")))).as("span_us"))
    val j = u.join(e, "user_id")
    // union ≤ sum of interval lengths; union ≤ span + one interval; ≥ one interval
    assert(j.filter(col("covered_us") > col("n") * len).isEmpty)
    assert(j.filter(col("covered_us") > col("span_us") + len).isEmpty)
    assert(j.filter(col("covered_us") < len).isEmpty)
    assert(j.filter(col("n_blocks") < 1 || col("n_blocks") > col("n_intervals")).isEmpty)
  }

  test("interval union is partition-layout independent") {
    val a = Temporal.intervalUnion(spark, sf).collect().toSet
    val b = Temporal.intervalUnion(spark, sf).repartition(13).collect().toSet
    assert(a === b)
  }

  test("RFM scores are quartile-balanced and segment concatenates them") {
    val rfm = Relational.rfmSegments(spark, sf)
    for (c <- Seq("r_score", "f_score", "m_score"))
      assert(rfm.filter(col(c) < 1 || col(c) > 4).isEmpty, c)
    assert(rfm.filter(col("segment") =!=
      concat(col("r_score").cast("string"), col("f_score").cast("string"),
        col("m_score").cast("string"))).isEmpty)
    // discrete quartiles: at least a quarter of customers score ≤ each cut
    val n = rfm.count()
    val low = rfm.filter(col("f_score") === 1).count()
    assert(low >= n / 4 - 1, s"f_score=1 bucket $low of $n")
  }

  test("largest remainder: allocations sum exactly to the budget, extras to largest remainders") {
    val a = Relational.largestRemainder(spark, sf, budget = 1000L)
    val rows = a.collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum === 1000L)
    // every extra seat went to a remainder >= any non-extra remainder
    val extra = rows.filter(_.getAs[Long]("extra") == 1L).map(_.getAs[Long]("remainder"))
    val none = rows.filter(_.getAs[Long]("extra") == 0L).map(_.getAs[Long]("remainder"))
    if (extra.nonEmpty && none.nonEmpty) assert(extra.min >= none.max - 0)
  }

  test("journey trigrams: counts agree with a collect-side replay") {
    val top = Relational.journeyTrigrams(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
    val events = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
    val counts = events.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._2.getTime, r._3)).map(_._4).sliding(3).filter(_.size == 3)
        .map(w => (w(0), w(1), w(2)))
    }.toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for ((tri, n) <- top) assert(counts(tri) === n, tri)
    assert(top.map(_._2).sorted.reverse.toSeq === top.map(_._2).toSeq)
  }

  test("phash pairs are band-blocked near-dups: every pair differs in at most 2 samples") {
    val pairs = Multimodal.phashPairs(spark, sf, maxDiff = 2)
    assert(pairs.filter(col("n_diff") > 2 || col("n_diff") < 0).isEmpty)
    assert(pairs.filter(col("doc_a") >= col("doc_b")).isEmpty)
    // image payloads only: both ids ≡ 0 (mod 3)
    assert(pairs.filter(col("doc_a") % 3 =!= 0 || col("doc_b") % 3 =!= 0).isEmpty)
  }
}
