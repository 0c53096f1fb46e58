package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Analytics, Relational}

/** Round-3 session-4 operators: OLS trend from integer moments,
  * period-over-period revenue, event-sequence pattern match, map HOF
  * profile, type co-occurrence, Flesch readability, Zipf fit.
  */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  test("trend regression reproduces a driver-side OLS on the daily counts") {
    val got = Analytics.trendRegression(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val cells = graft.sources.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), datediff(to_date(col("ts")), lit("2024-01-01")).as("x"))
      .agg(count(lit(1)).as("y"))
      .as[(String, Int, Long)].collect().groupBy(_._1)
    for ((t, rows) <- cells) {
      val xs = rows.map(_._2.toDouble); val ys = rows.map(_._3.toDouble)
      val n = xs.length
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(got(t)._1 - slope) < 1e-5, s"slope $t")
      assert(math.abs(got(t)._2 - (sy - slope * sx) / n) < 1e-4, s"intercept $t")
      assert(got(t)._3 >= 0.0 && got(t)._3 <= 1.0, s"r2 range $t")
    }
  }

  test("theil-sen reproduces the driver-side median of pairwise slopes " +
    "and residuals") {
    def medianInterp(v: Seq[Double]): Double = {
      val s = v.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val got = Analytics.theilSen(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val cells = graft.sources.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).as("x"))
      .agg(count(lit(1)).as("y"))
      .as[(String, Int, Long)].collect().groupBy(_._1)
    assert(got.keySet == cells.keySet)
    for ((t, rows) <- cells) {
      val pts = rows.map(r => (r._2.toDouble, r._3.toDouble)).sortBy(_._1)
      val slopes = for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield (pts(j)._2 - pts(i)._2) / (pts(j)._1 - pts(i)._1)
      val slope = medianInterp(slopes)
      val intercept = medianInterp(pts.map { case (x, y) => y - slope * x })
      val (nDays, nPairs, gSlope, gIntercept) = got(t)
      assert(nDays == pts.length && nPairs == slopes.length, s"counts $t")
      assert(math.abs(gSlope - slope) < 1e-6, s"slope $t: $gSlope vs $slope")
      assert(math.abs(gIntercept - intercept) < 1e-6, s"intercept $t")
    }
  }

  test("theil-sen shrugs off the outlier day that drags OLS") {
    // same daily cells, one corrupted day: OLS slope moves by orders of
    // magnitude, the median slope barely at all
    val base = (0 until 20).map(i => (i, 100L + 2L * i))
    def slopes(cells: Seq[(Int, Long)]): (Double, Double) = {
      val pts = cells.map(c => (c._1.toDouble, c._2.toDouble))
      val n = pts.length
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val pw = for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield (pts(j)._2 - pts(i)._2) / (pts(j)._1 - pts(i)._1)
      val s = pw.sorted
      val ts = if (s.length % 2 == 1) s(s.length / 2)
        else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
      (ols, ts)
    }
    val (olsClean, tsClean) = slopes(base)
    val (olsDirty, tsDirty) = slopes(base.updated(19, (19, 100000L)))
    assert(math.abs(olsClean - 2.0) < 1e-9 && math.abs(tsClean - 2.0) < 1e-9)
    assert(math.abs(olsDirty - 2.0) > 100, s"OLS must be dragged: $olsDirty")
    assert(math.abs(tsDirty - 2.0) < 1.0,
      s"median slope must resist the outlier: $tsDirty")
  }

  test("yoy: mom_delta telescopes back to the revenue series") {
    val rows = Analytics.periodRevenue(spark, sf).collect()
    val rev = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    for (i <- 1 until rows.length) {
      val (m, p) = (rows(i), rows(i - 1))
      assert(math.abs(m.getDouble(2) - (m.getDouble(1) - p.getDouble(1))) < 0.011,
        s"delta at ${m.getString(0)}")
    }
    // lag-12 alignment: yoy_pct at month i uses revenue at i-12
    for (i <- 12 until rows.length) {
      val expect = (rows(i).getDouble(1) - rows(i - 12).getDouble(1)) / rows(i - 12).getDouble(1)
      assert(math.abs(rows(i).getDouble(4) - expect) < 1e-5, s"yoy at ${rows(i).getString(0)}")
    }
    assert(rev.size === rows.length) // months unique
  }

  test("event pattern: seq letters count events and hits contain v..c..p in order") {
    val rows = Analytics.eventPattern(spark, sf).collect()
    val total = graft.sources.Tables.load(spark, sf, "events").count()
    assert(rows.map(_.getString(2).length.toLong).sum === total)
    for (r <- rows if r.getInt(3) == 1) {
      val s = r.getString(2)
      val c = s.indexOf('c', s.indexOf('v') + 1)
      assert(s.indexOf('v') >= 0 && c > 0 && s.indexOf('p', c + 1) > 0, s"hit $s")
    }
    assert(rows.exists(_.getInt(3) == 1))
  }

  test("map funcs: weighted total is 10x event count and profile lists only c>=2 types") {
    val rows = Relational.mapFuncsProfile(spark, sf).collect()
    val counts = graft.sources.Tables.load(spark, sf, "events")
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("c"))
      .as[(Long, String, Long)].collect().groupBy(_._1)
    for (r <- rows) {
      val cs = counts(r.getLong(0)).map(t => t._2 -> t._3).toMap
      assert(r.getLong(3) === 10 * cs.values.sum, "weighted_total")
      val expectProfile = cs.filter(_._2 >= 2).toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k:$v" }.mkString(",")
      assert(r.getString(4) === expectProfile, s"profile user ${r.getLong(0)}")
      assert(r.getLong(1) === cs.size)
    }
  }

  test("cooccurrence jaccard is symmetric-bounded and n_both <= min(n1,n2)") {
    val rows = Relational.typeCooccurrence(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (both, n1, n2) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(both <= math.min(n1, n2))
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
      assert(r.getString(0) < r.getString(1)) // canonical pair order
    }
  }

  test("readability: counts are consistent and score decreases with syllable density") {
    val d = TextFunctions.readability(spark, sf)
    assert(d.filter(col("n_syll") < col("n_words")).count() === 0 ||
      d.count() > 0) // vowel groups >= words only for vowel-ful text; just sanity
    val bad = d.filter(col("n_words") > 0 &&
      abs(col("flesch") - (lit(206.835) -
        lit(1.015) * col("n_words") / col("n_sents") -
        lit(84.6) * col("n_syll") / col("n_words"))) > 0.001)
    assert(bad.isEmpty)
  }

  test("zipf slope is negative (frequency decays with rank)") {
    val r = TextFunctions.zipfFit(spark, sf).collect().head
    assert(r.getLong(0) > 10)
    assert(r.getDouble(1) < 0.0, "zipf slope should be negative")
  }

  test("table checksum is invariant under repartitioning") {
    val a = graft.sources.SchemaAlign.tableChecksums(spark, sf).collect()
    val o = graft.sources.Tables.load(spark, sf, "orders").repartition(7)
    val h = conv(substring(md5(concat_ws("|", col("o_orderkey"), col("o_custkey"),
      col("o_orderstatus"), col("o_orderpriority")).cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val r = o.agg(bit_xor(h), sum(h % lit(1000000007L))).collect().head
    val ordersRow = a.find(_.getString(0) == "orders").get
    assert(ordersRow.getLong(2) === r.getLong(0))
    assert(ordersRow.getLong(3) === r.getLong(1))
  }

  test("weighted median splits the weight mass in half") {
    val rows = Analytics.weightedMedian(spark, sf).collect()
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_quantity").cast("long"))
      .as[(String, Double, Long)].collect().groupBy(_._1)
    for (r <- rows) {
      val g = li(r.getString(0))
      val m = r.getDouble(2)
      val below = g.filter(_._2 < m).map(_._3).sum
      val atOrBelow = g.filter(_._2 <= m).map(_._3).sum
      val total = g.map(_._3).sum
      assert(r.getLong(1) === total)
      assert(below * 2 < total && atOrBelow * 2 >= total, s"median ${r.getString(0)}")
    }
  }

  test("percentile_cont brackets the discrete percentiles and is monotone") {
    val rows = Analytics.percentileCont(spark, sf).collect()
    for (r <- rows)
      assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3))
  }

  test("equi-depth histogram buckets partition the rows with contiguous bounds") {
    val rows = Analytics.equiDepthHistogram(spark, sf).collect()
    val total = graft.sources.Tables.load(spark, sf, "orders").count()
    assert(rows.map(_.getLong(1)).sum === total)
    val sorted = rows.sortBy(_.getLong(0))
    for (Array(a, b) <- sorted.sliding(2).map(_.toArray))
      assert(a.getDouble(3) <= b.getDouble(2), "bounds must not interleave")
    // depth balance: no bucket more than 2x the ideal share
    for (r <- sorted) assert(r.getLong(1) <= 2 * total / 10 + 1)
  }

  test("attribution: last touch is the latest in-window view before the purchase") {
    val rows = graft.operators.Temporal.attribution(spark, sf).collect()
    val ev = graft.sources.Tables.load(spark, sf, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")))
      .as[(Long, String, Long, Long)].collect().groupBy(_._1)
    val look = 3L * 86400L * 1000000L
    for (r <- rows.take(200)) {
      val prior = ev(r.getLong(0)).filter(e => e._2 == "view" &&
        (e._4 < r.getLong(2) || (e._4 == r.getLong(2) && e._3 < r.getLong(1))))
      val expectLast = prior.map(_._4).sorted.lastOption
        .filter(_ >= r.getLong(2) - look)
      val gotLast = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(gotLast === expectLast, s"purchase ${r.getLong(1)}")
      val expectFirst = prior.map(_._4).sorted.headOption
      val gotFirst = if (r.isNullAt(4)) None else Some(r.getLong(4))
      assert(gotFirst === expectFirst)
    }
  }

  test("capped balance never goes negative and ignores the cap when all deltas are credits") {
    val rows = Relational.cappedBalance(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) assert(r.getLong(2) >= 0L)
    // users with no purchase: balance equals the plain sum of credits
    val credits = graft.sources.Tables.load(spark, sf, "events")
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"),
        sum(floor(col("value") * 100).cast("long")).as("tot"))
      .filter(col("np") === 0)
      .as[(Long, Long, Long)].collect()
    val byUser = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    for ((u, _, tot) <- credits) assert(byUser(u) === tot, s"user $u")
  }

  test("rrf fusion ranks by the reciprocal-rank sum of both rankers") {
    val rows = graft.operators.Similarity.rrfFusion(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val expect = 1.0 / (60 + r.getLong(3)) + 1.0 / (60 + r.getLong(4))
      assert(math.abs(r.getDouble(5) - expect) < 1e-6)
    }
    // per query the rrf column is non-increasing in rank
    for ((_, g) <- rows.groupBy(_.getLong(0))) {
      val sorted = g.sortBy(_.getLong(1))
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray))
        assert(a.getDouble(5) >= b.getDouble(5))
    }
  }

  test("pagerank is a probability-like vector: positive, bounded, mass <= 1") {
    val rows = Analytics.pageRank(spark, sf).collect()
    assert(rows.length >= 2)
    val mass = rows.map(_.getDouble(1)).sum
    for (r <- rows) assert(r.getDouble(1) > 0.0 && r.getDouble(1) < 1.0)
    // without dangling redistribution mass can only leak, never grow
    assert(mass <= 1.0 + 1e-6)
    assert(mass > 0.15, "damping floor keeps at least (1-d) of the mass")
  }

  test("ab test: reaches are cohort-bounded and z sign follows the reach gap") {
    val rows = Analytics.abTest(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(1) <= r.getLong(2) && r.getLong(3) <= r.getLong(4))
      if (!r.isNullAt(7)) {
        val gap = r.getDouble(5) - r.getDouble(6)
        assert(math.signum(r.getDouble(7)) === math.signum(gap) || gap == 0.0)
      }
    }
  }

  test("decile lift: shares each sum to 1 and deciles partition the users") {
    val rows = Analytics.decileLift(spark, sf).collect()
    val nUsers = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum === nUsers)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getDouble(5)).sum - 1.0) < 1e-4)
    // top decile of spenders over-indexes on purchases
    val top = rows.minBy(_.getLong(0))
    assert(top.getDouble(6) >= 1.0, "top decile lift should be >= 1")
  }

  test("ngram novelty: doc 0 is fully novel and fractions are in [0,1]") {
    val rows = TextFunctions.ngramNovelty(spark, sf).collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getLong(0))
    assert(first.getDouble(3) === 1.0, "lowest-id doc owns all its grams")
    for (r <- rows) {
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("gini matches a driver-side sorted-rank computation") {
    val r = Analytics.giniSpend(spark, sf).collect().head
    val spends = graft.sources.Tables.load(spark, sf, "events")
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        floor(col("value") * 100).cast("long")).otherwise(0L)).as("v"))
      .as[(Long, Long)].collect().map(_._2).sorted
    val n = spends.length.toLong
    val s = spends.sum
    val s1 = spends.zipWithIndex.map { case (v, i) => (i + 1).toLong * v }.sum
    val expect = (2.0 * s1 - (n + 1) * s) / (n.toDouble * s)
    assert(r.getLong(0) === n)
    assert(math.abs(r.getDouble(2) - expect) < 1e-5)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0)
  }

  test("autocorrelation is a valid correlation in [-1, 1]") {
    val rows = Analytics.autocorr(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getDouble(2) >= -1.0 - 1e-9 && r.getDouble(2) <= 1.0 + 1e-9)
      assert(r.getLong(1) > 5)
    }
  }

  test("changepoint cusum equals the prefix-minus-mean recompute at the picked day") {
    val rows = Analytics.changepoint(spark, sf).collect()
    val daily = graft.sources.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("d"))
      .agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    for (r <- rows) {
      val series = daily(r.getString(0)).sortBy(_._2)
      val mean = series.map(_._3).sum.toDouble / series.length
      val cusums = series.scanLeft(0.0) { case (acc, (_, _, c)) => acc + c }
        .drop(1).zipWithIndex.map { case (ps, i) => ps - (i + 1) * mean }
      val best = cusums.map(math.abs).max
      assert(math.abs(math.abs(r.getDouble(2)) - best) < 1e-4, r.getString(0))
    }
  }

  test("ewma equals a driver-side left fold over the sorted daily series") {
    val rows = Analytics.ewmaDaily(spark, sf).collect()
    val daily = graft.sources.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("d"))
      .agg(count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    for (r <- rows) {
      val series = daily(r.getString(0)).sortBy(_._2).map(_._3.toDouble)
      val expect = series.tail.foldLeft(series.head)((s, x) => 0.3 * x + 0.7 * s)
      assert(math.abs(r.getDouble(2) - expect) < 1e-4, r.getString(0))
      assert(r.getLong(1) === series.length.toLong)
    }
  }

  test("benford: observed shares sum to 1 and expected follows log10(1+1/d)") {
    val rows = Analytics.benford(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(('1' to '9').map(_.toString).toSet))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    for (r <- rows) {
      val d = r.getString(0).toInt
      assert(math.abs(r.getDouble(3) - math.log10(1.0 + 1.0 / d)) < 1e-5)
      assert(r.getDouble(4) >= 0.0)
    }
  }

  test("backtest: mae bounds |bias| and evaluation only covers days with a lag-7 ancestor") {
    val rows = Analytics.backtestNaive(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getDouble(2) >= math.abs(r.getDouble(3)) - 1e-9, "MAE >= |bias|")
      assert(r.getLong(1) <= 23, "30-day series has at most 23 lag-7 pairs")
      assert(r.getDouble(4) >= 0.0)
    }
  }

  test("fuzzy join pairs share a block noun and respect the distance bound") {
    val rows = graft.operators.Fusion.fuzzyNameJoin(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getString(0) < r.getString(1), "canonical order")
      assert(r.getString(0).split(" ")(1) === r.getString(1).split(" ")(1))
      assert(r.getLong(2) <= 3 && r.getLong(2) >= 1)
    }
  }

  test("market basket: confidence is support-consistent and pairs are symmetric in n_both") {
    val rows = Relational.marketBasket(spark, sf).collect()
    assert(rows.nonEmpty)
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    for (r <- rows) {
      assert(byPair((r.getString(1), r.getString(0))) === r.getLong(2),
        "n_both symmetric across rule direction")
      assert(r.getDouble(6) >= r.getDouble(5), "confidence >= support")
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)))
    }
  }

  test("survival: monotone non-increasing, starts below 1, at-risk telescopes") {
    val rows = Relational.survivalCurve(spark, sf).collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    val nUsers = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.head.getLong(2) === nUsers, "first at-risk = all users")
    for (Array(a, b) <- rows.sliding(2).map(_.toArray))
      assert(a.getDouble(3) >= b.getDouble(3) - 1e-9, "S(t) non-increasing")
    for (r <- rows) assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }

  test("dau/wau: wau dominates dau and matches a driver-side 7-day distinct") {
    val rows = Analytics.dauWau(spark, sf).collect()
    val ud = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), date_format(to_date(col("ts")), "yyyy-MM-dd"))
      .distinct().as[(Long, String)].collect()
    for (r <- rows) {
      assert(r.getLong(1) <= r.getLong(2), "DAU <= WAU")
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
    val someDay = rows.last.getString(0)
    val window7 = ud.filter { case (_, d) =>
      d <= someDay && java.time.LocalDate.parse(d)
        .isAfter(java.time.LocalDate.parse(someDay).minusDays(7))
    }.map(_._1).distinct.length
    assert(rows.last.getLong(2) === window7.toLong)
  }

  test("elasticity: each brand regression has enough parts and a finite slope") {
    val rows = Analytics.elasticity(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(1) >= 2)
      assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite)
    }
  }

  test("boilerplate grams appear in at least minDocs distinct documents") {
    val rows = TextFunctions.boilerplate(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(lower(col("text"))).as[String].collect()
    for (r <- rows.take(5)) {
      val gram = r.getString(0)
      val n = docs.count(_.contains(gram))
      assert(n >= r.getLong(1), s"'$gram' containment check")
      assert(r.getLong(1) >= 3)
    }
  }
}
