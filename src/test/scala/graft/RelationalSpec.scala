package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Relational}
import graft.functions.TextFunctions

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("grouping sets emits both marginals plus the grand total") {
    val g = Relational.groupingSetsTotals(spark, sf)
    val byGid = g.groupBy("gid").count().as[(Long, Long)].collect().toMap
    // gid 1 = (status) rows, 2 = (priority) rows, 3 = grand total
    assert(byGid(3L) == 1L)
    assert(byGid.keySet == Set(1L, 2L, 3L))
    val total = g.filter(col("gid") === 3L).select("n_orders").as[Long].head()
    assert(total == graft.sources.Tables.load(spark, sf, "orders").count())
  }

  test("intersect/except equals the explicit set algebra") {
    val e = graft.sources.Tables.load(spark, sf, "events")
    def userDays(t: String) = e.filter(col("event_type") === t)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd"))
      .as[(Long, String)].collect().toSet
    val expected =
      (userDays("click") & userDays("purchase")) -- userDays("error")
    val got = Relational.intersectExceptUsers(spark, sf)
      .as[(Long, String)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty) // the set must be non-trivial to be a real check
  }

  test("approx_count_distinct stays within HLL error of the exact count") {
    val e = graft.sources.Tables.load(spark, sf, "events")
    val approx = graft.operators.Analytics.approxDistinctUsers(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) =>
      val a = approx(t).toDouble
      // default rsd is 5%; allow 3 sigma
      assert(math.abs(a - n) <= math.max(3, 0.15 * n),
        s"$t: approx $a vs exact $n")
    }
  }

  test("heavy hitters rank by count desc with key tie-break") {
    val h = Relational.heavyHitters(spark, sf, k = 10).collect()
    assert(h.length == 10)
    val counts = h.map(_.getLong(2))
    assert(counts.sameElements(counts.sorted.reverse)) // non-increasing
    // the top key really is the most frequent one
    val l = graft.sources.Tables.load(spark, sf, "lineitem")
    val top = l.groupBy("l_orderkey").count()
      .orderBy(col("count").desc, col("l_orderkey")).first()
    assert(h.head.getLong(1) == top.getLong(0))
    assert(h.head.getLong(2) == top.getLong(1))
  }

  test("argminmax picks the true extremes with key tie-break") {
    val rows = Relational.argMinMaxOrders(spark, sf)
    val o = graft.sources.Tables.load(spark, sf, "orders")
    val expectMax = o.orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
      .select("o_orderkey").as[Long].head()
    val gotMax = rows.orderBy(col("max_price").desc)
      .select("max_order").as[Long].head()
    assert(gotMax == expectMax)
  }

  test("histogram buckets cover every order exactly once") {
    val h = Relational.priceHistogram(spark, sf)
    val n = h.agg(sum("n_orders")).as[Long].head()
    assert(n == graft.sources.Tables.load(spark, sf, "orders").count())
    val buckets = h.select("bucket").as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b <= 11))
  }

  test("null-clean repairs synthesized nulls") {
    val r = Relational.nullCleanOrders(spark, sf)
    assert(r.filter(col("priority_clean").isNull).count() == 0)
    assert(r.filter(col("price_filled").isNull).count() == 0)
    // open orders must be flagged absent
    val o = graft.sources.Tables.load(spark, sf, "orders")
    val nOpen = o.filter(col("o_orderstatus") === "O").count()
    assert(r.filter(col("priority_present") === 0L).count() == nOpen)
  }

  test("zscore standardizes to mean ~0 within each priority") {
    val z = Analytics.zscorePerPriority(spark, sf)
    val means = z.groupBy("o_orderpriority").agg(avg("z").as("m"))
      .select("m").as[Double].collect()
    assert(means.forall(m => math.abs(m) < 1e-3))
  }

  test("lag/lead gaps are non-negative and first-per-user is null") {
    val g = Analytics.lagLeadDeltas(spark, sf)
    assert(g.filter(col("gap_us") < 0).count() == 0)
    val users = g.select("user_id").distinct().count()
    assert(g.filter(col("gap_us").isNull).count() == users)
  }

  test("tfidf ranks at most 3 terms per doc, scores descending") {
    val t = TextFunctions.tfidfTopTerms(spark, sf)
    val worst = t.groupBy("doc_id").count().agg(max("count")).as[Long].head()
    assert(worst <= 3)
    val bad = t.alias("a").join(t.alias("b"),
      col("a.doc_id") === col("b.doc_id") &&
        col("a.rk") === col("b.rk") - 1 &&
        col("a.tfidf") < col("b.tfidf"))
    assert(bad.count() == 0)
  }

  test("graft_topk bounded-heap aggregate matches the window formulation") {
    val o = graft.sources.Tables.load(spark, sf, "orders")
      .repartition(16) // force partial aggregation + heap merges + serde
    val viaAgg = o.groupBy(col("o_orderpriority"))
      .agg(graft.functions.TopKFunctions.topK(
        struct(col("o_totalprice").as("p"), col("o_orderkey").as("kk")), 5).as("top"))
      .select(col("o_orderpriority"), explode(col("top")).as("s"))
      .select(col("o_orderpriority"), col("s.kk"), col("s.p"))
      .as[(String, Long, Double)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    val viaWindow = o.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .as[(String, Long, Double)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("graft_topk is SQL-callable via the extensions registration") {
    graft.sql.GraftSql.registerTables(spark, sf)
    val rows = spark.sql(
      """SELECT o_orderpriority,
        |       graft_topk(struct(o_totalprice, o_orderkey), 2) AS top
        |FROM orders GROUP BY o_orderpriority""".stripMargin)
      .select(col("o_orderpriority"), size(col("top")).as("n"))
      .as[(String, Int)].collect()
    assert(rows.length == 5 && rows.forall(_._2 == 2))
  }

  test("journey equals the window-sorted formulation") {
    import org.apache.spark.sql.expressions.Window
    val e = graft.sources.Tables.load(spark, sf, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val naive = e
      .withColumn("journey", concat_ws(">", collect_list(col("event_type")).over(w)))
      .groupBy(col("user_id"))
      .agg(first(col("journey")).as("journey"), count(lit(1)).as("n_events"))
    val fast = graft.operators.Relational.journeyPerUser(spark, sf)
    assert(fast.join(naive.withColumnRenamed("journey", "j2"), "user_id")
      .filter(col("journey") =!= col("j2")).count() == 0)
  }

  test("modePerUser picks the max-count type, greatest name on ties") {
    import spark.implicits._
    val e = Seq(
      (1L, "a"), (1L, "a"), (1L, "b"),          // clear winner a
      (2L, "x"), (2L, "y")                      // tie -> y (greater name)
    ).toDF("user_id", "event_type")
    val out = e.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("user_id"))
      .agg(max(struct(col("cnt"), col("event_type"))).as("m"))
      .select(col("user_id"), col("m.event_type").as("mode_type"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "y"))
  }

  test("snapshotDiff classifies inserts, deletes, and updates") {
    val d = graft.operators.Relational.snapshotDiff(spark, sf)
    val byChange = d.groupBy("change").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = graft.sources.Tables.load(spark, sf, "orders")
    // inserts: in B only = key%3==0 && key%5!=0
    val ins = o.filter(col("o_orderkey") % 3 === 0 && col("o_orderkey") % 5 =!= 0).count()
    // deletes: in A only = key%5==0 && key%3!=0
    val del = o.filter(col("o_orderkey") % 5 === 0 && col("o_orderkey") % 3 =!= 0).count()
    // updates: in both with doubled price = key%7==0, %3!=0, %5!=0
    val upd = o.filter(col("o_orderkey") % 7 === 0 &&
      col("o_orderkey") % 3 =!= 0 && col("o_orderkey") % 5 =!= 0).count()
    assert(byChange.get("insert").contains(ins), s"$byChange vs insert=$ins")
    assert(byChange.get("delete").contains(del), s"$byChange vs delete=$del")
    assert(byChange.get("update").contains(upd), s"$byChange vs update=$upd")
    assert(byChange.keySet == Set("insert", "delete", "update"))
  }

  test("bigram frequencies are correctly ordered and bounded") {
    val b = TextFunctions.bigramFreq(spark, sf)
    val rows = b.select("rk", "n").as[(Long, Long)].collect()
    assert(rows.length <= 20)
    assert(rows.sliding(2).forall {
      case Array((_, n1), (_, n2)) => n1 >= n2
      case _ => true
    })
  }

  test("count-min sketch never under-counts and over-counts within eps·N") {
    val rows = Relational.cmsHeavyHitters(spark, sf)
      .select("key", "n_exact", "n_est")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val total = graft.sources.Tables.load(spark, sf, "lineitem").count()
    rows.foreach { case (key, exact, est) =>
      assert(est >= exact, s"CMS under-counted key $key: $est < $exact")
      // eps=0.0005 → width 2/eps; bound is eps·N w.h.p., allow 2×.
      assert(est <= exact + (2 * 0.0005 * total).toLong + 1,
        s"CMS over-count for $key out of bound: $est vs $exact (N=$total)")
    }
  }

  test("approx quantiles track the exact percentiles") {
    val est = Analytics.approxQuantiles(spark, sf)
      .select("o_orderpriority", "p50_est", "p90_est")
      .as[(String, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val exact = Analytics.medianPricePerPriority(spark, sf)
      .select("o_orderpriority", "median_price", "p90_price")
      .as[(String, Double, Double)].collect()
    exact.foreach { case (prio, p50, p90) =>
      val (e50, e90) = est(prio)
      // GK guarantees rank error ≤ n/accuracy; translate loosely to a
      // 5% relative value tolerance on this smooth distribution.
      assert(math.abs(e50 - p50) <= 0.05 * p50, s"$prio p50 $e50 vs $p50")
      assert(math.abs(e90 - p90) <= 0.05 * p90, s"$prio p90 $e90 vs $p90")
    }
  }

  test("bloom prune is lossless and the filter actually prunes the scan") {
    val o = graft.sources.Tables.load(spark, sf, "orders")
    val l = graft.sources.Tables.load(spark, sf, "lineitem")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val plain = l.join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pruned = Relational.bloomPrunedRevenue(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pruned == plain)
    // The membership test itself must pass every true key (no false
    // negatives) and reject most non-keys (fpp=1% plus slack).
    val bloom = graft.functions.BloomFunctions.buildBytes(urgent, "o_orderkey")
    val might = graft.functions.BloomFunctions.mightContain(bloom, col("l_orderkey"))
    val withFlag = l.select(col("l_orderkey"), might.as("hit"))
      .join(urgent.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left")
      .select(col("hit"), col("o_orderkey").isNotNull.as("truth")).collect()
    assert(withFlag.forall(r => !r.getBoolean(1) || r.getBoolean(0)))
    val negatives = withFlag.filterNot(_.getBoolean(1))
    val fp = negatives.count(_.getBoolean(0)).toDouble / negatives.length.max(1)
    assert(fp < 0.05, s"false-positive rate $fp")
  }

  test("mergeChanges applies update/delete/insert exactly") {
    val o = graft.sources.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
      .as[(Long, Double)].collect().toMap
    val got = graft.operators.Fusion.mergeChanges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(3)))
    val gotMap = got.map(t => t._1 -> t).toMap
    o.foreach { case (k, p) =>
      if (k % 11 == 0) assert(!gotMap.contains(k), s"key $k should be deleted")
      else if (k % 7 == 0) {
        assert(gotMap(k)._3 == "update")
        assert(math.abs(gotMap(k)._2 - BigDecimal(p + 100.0)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      } else assert(gotMap(k)._3 == "keep")
      if (k % 13 == 0) assert(gotMap(k + 1000000L)._3 == "insert")
    }
    assert(got.length ==
      o.count { case (k, _) => k % 11 != 0 } + o.count { case (k, _) => k % 13 == 0 })
  }

  test("session_window agg matches the lag/cumsum sessionization") {
    // Group the manual sessionization's per-event rows into sessions and
    // compare spans — the declarative operator must agree. NOTE the gap
    // rule differs at the exact boundary (>= vs >): no events in the
    // testdata are exactly 30min apart, which the generator guarantees.
    val e = graft.sources.Tables.load(spark, sf, "events")
    val manual = Analytics.sessionize(spark, sf)
      .join(e.select(col("event_id"), col("value")), Seq("event_id"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_last"),
        count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("session_start"), col("session_last"),
        col("n_events"), col("sum_value"))
      .collect().map(_.toSeq).toSet
    val declarative = Analytics.sessionWindowAgg(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(declarative == manual)
  }

  test("skyline equals the naive O(n^2) dominance filter") {
    val o = graft.sources.Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice"), col("o_orderdate"))
      .as[(String, Long, Double, java.sql.Timestamp)].collect()
    val naive = o.filter { case (g, _, p, d) =>
      !o.exists { case (g2, _, p2, d2) =>
        g2 == g && p2 <= p && !d2.after(d) && (p2 < p || d2.before(d))
      }
    }.map(t => (t._1, t._2)).toSet
    val got = Relational.paretoOrders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"))
      .as[(String, Long)].collect().toSet
    assert(got == naive)
    assert(got.nonEmpty)
    // a frontier must be mutually non-dominating within each group
    assert(got.size < o.length)
  }

  test("throttle keeps exactly the events with no same-key event in the prior hour") {
    val e = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .as[(Long, Long, String, Long)].collect()
    val naive = e.filter { case (id, u, t, us) =>
      val prev = e.filter(x => x._2 == u && x._3 == t &&
        (x._4 < us || (x._4 == us && x._1 < id)))
      prev.isEmpty || us - prev.map(_._4).max >= 3600L * 1000000L
    }.map(_._1).toSet
    val got = Analytics.throttleEvents(spark, sf)
      .select(col("event_id")).as[Long].collect().toSet
    assert(got == naive)
    assert(got.nonEmpty && got.size < e.length)
  }

  test("hll rollup: merged monthly sketches match a direct sketch and bound error") {
    val r = Analytics.hllRollup(spark, sf)
      .select(col("o_orderpriority"), col("est_custs"), col("exact_custs"), col("rel_err"))
      .as[(String, Long, Long, Double)].collect()
    assert(r.nonEmpty)
    // HLL is a few-percent estimator at lgK default 12
    r.foreach { case (p, est, exact, err) =>
      assert(err <= 0.05, s"$p: est $est vs exact $exact (err $err)") }
    // mergeability: union of the monthly sketches == one direct sketch
    // over the same rows (register-max union loses nothing)
    val o = graft.sources.Tables.load(spark, sf, "orders")
    val direct = o.groupBy(col("o_orderpriority"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("d"))
      .as[(String, Long)].collect().toMap
    r.foreach { case (p, est, _, _) => assert(est == direct(p)) }
  }

  test("weighted sample is deterministic and favors long documents") {
    val a = TextFunctions.weightedSample(spark, sf)
      .collect().map(_.toSeq)
    val b = TextFunctions.weightedSample(spark, sf)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq) // engine/layout-independent survivor set
    val d = graft.sources.Tables.load(spark, sf, "documents")
    val perSource = d.groupBy(col("source")).count().as[(String, Long)].collect().toMap
    val sampled = TextFunctions.weightedSample(spark, sf)
      .groupBy(col("source")).count().as[(String, Long)].collect().toMap
    // exactly min(3, group size) rows per source
    sampled.foreach { case (s, n) => assert(n == math.min(3L, perSource(s))) }
    // E-S with w = n_chars must skew the sample long: sampled docs'
    // mean length exceeds the corpus mean
    val corpusMean = d.agg(avg(col("n_chars"))).as[Double].head()
    val sampleMean = TextFunctions.weightedSample(spark, sf)
      .agg(avg(col("n_chars"))).as[Double].head()
    assert(sampleMean > corpusMean)
  }
}
