package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Dedup, Relational}
import graft.functions.TextFunctions

/** Time-series pack + exact-decimal money + semantic survivorship +
  * PMI collocations (round-3 session-2 operators).
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("ohlc open/close equal the window-ranked first/last rows") {
    val bars = Analytics.ohlcBars(spark, sf)
    // independent window formulation over the same events
    val e = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), date_trunc("hour", col("ts")).as("bar_ts"),
        col("ts"), col("event_id"), col("value"))
    val wa = Window.partitionBy(col("user_id"), col("bar_ts"))
      .orderBy(col("ts"), col("event_id"))
    val wd = Window.partitionBy(col("user_id"), col("bar_ts"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val ref = e.withColumn("rna", row_number().over(wa))
      .withColumn("rnd", row_number().over(wd))
      .groupBy(col("user_id"), col("bar_ts"))
      .agg(max(when(col("rna") === 1, col("value"))).as("open"),
        max(when(col("rnd") === 1, col("value"))).as("close"))
    val joined = bars.join(ref, Seq("user_id", "bar_ts"))
    assert(joined.filter(bars("open") =!= ref("open") ||
      bars("close") =!= ref("close")).isEmpty)
    assert(bars.filter(col("high") < col("low")).isEmpty)
    assert(bars.filter(col("volume") < 1).isEmpty)
  }

  test("time-weighted average is bounded by per-user min/max and spans the gaps") {
    val twa = Analytics.timeWeightedAvg(spark, sf)
    val e = graft.sources.Tables.load(spark, sf, "events")
    val bounds = e.groupBy(col("user_id"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"),
        (unix_micros(max(col("ts")).cast("timestamp")) -
          unix_micros(min(col("ts")).cast("timestamp"))).as("full_span"),
        count(lit(1)).as("n"))
    val j = twa.join(bounds, Seq("user_id"))
    assert(j.filter(col("twa_value") < col("lo") - 1e-9 ||
      col("twa_value") > col("hi") + 1e-9).isEmpty)
    // intervals = events − 1 per user; their µs gaps sum to the full span
    assert(j.filter(col("n_intervals") =!= col("n") - 1).isEmpty)
    assert(j.filter(col("span_us") =!= col("full_span")).isEmpty)
  }

  test("locf carries the purchase value itself on purchase rows and only forward") {
    val f = Analytics.locfFill(spark, sf)
    // on a purchase row the carried value IS that row's value
    val e = graft.sources.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("value"))
    val p = f.filter(col("event_type") === "purchase")
      .join(e, Seq("event_id"))
    assert(p.filter(col("last_purchase_value") =!= col("value")).isEmpty)
    // before a user's first purchase the fill is null; never after
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seen = f.withColumn("n_purch",
      sum(when(col("event_type") === "purchase", 1).otherwise(0)).over(w))
    assert(seen.filter(col("n_purch") === 0 && col("last_purchase_value").isNotNull).isEmpty)
    assert(seen.filter(col("n_purch") > 0 && col("last_purchase_value").isNull).isEmpty)
  }

  test("streaks partition the active days and bound the longest run") {
    val s = Analytics.dayStreaks(spark, sf)
    val days = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_distinct_days"))
    val j = s.join(days, Seq("user_id"))
    assert(j.filter(col("n_days") =!= col("n_distinct_days")).isEmpty)
    assert(j.filter(col("longest") > col("n_days") ||
      col("n_streaks") > col("n_days") || col("longest") < 1).isEmpty)
  }

  test("decimal aggregation is identical across partition layouts") {
    val a = Relational.decimalRevenue(spark, sf).collect().map(_.toSeq)
    // decimal sums are associative: any repartitioning gives the same bits
    val li = graft.sources.Tables.load(spark, sf, "lineitem").repartition(13)
    val dir2 = java.nio.file.Files.createTempDirectory("decimal13").toString
    li.write.mode("overwrite").parquet(dir2 + "/lineitem")
    val spark2 = spark
    val b = {
      val d = spark2.read.parquet(dir2 + "/lineitem")
      d.select(col("l_returnflag"),
          col("l_extendedprice").cast("decimal(18,4)").as("p"),
          col("l_discount").cast("decimal(9,4)").as("dsc"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("p")).cast("decimal(18,2)").as("g2"),
          sum(col("p") * (lit(1).cast("decimal(9,4)") - col("dsc")))
            .cast("decimal(18,2)").as("n2"),
          count(lit(1)).as("n_items"))
        .select(col("l_returnflag"),
          (col("g2") * 100).cast("long").as("gross_cents"),
          (col("n2") * 100).cast("long").as("net_cents"),
          col("g2").cast("double").as("gross"),
          col("n2").cast("double").as("net"),
          col("n_items"))
        .orderBy(col("l_returnflag")).collect().map(_.toSeq)
    }
    assert(a.toSeq == b.toSeq)
    assert(a.nonEmpty)
  }

  test("semantic survivors: dropped vectors have a lower-id near-neighbor, survivors don't") {
    val surv = Dedup.semanticSurvivors(spark, sf).select(col("vec_id"))
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
    val dropped = emb.select(col("vec_id")).except(surv)
    // rebuild the dominance pairs independently
    val pairs = Dedup.embeddingPairs(spark, sf, threshold = 0.3)
      .select(col("id_b").as("vec_id")).distinct()
    assert(dropped.except(pairs).isEmpty)        // every drop is justified
    assert(surv.intersect(pairs).isEmpty)        // no survivor is dominated
    assert(surv.count() + dropped.count() == emb.count())
  }

  test("transition matrix probabilities sum to 1 per source type") {
    val t = Analytics.transitionMatrix(spark, sf)
    val perFrom = t.groupBy(col("from_type"))
      .agg(sum(col("n")).as("sn"), max(col("n_from")).as("nf"),
        sum(col("p")).as("sp"))
    assert(perFrom.filter(col("sn") =!= col("nf")).isEmpty)
    assert(perFrom.filter(abs(col("sp") - 1.0) > 1e-4).isEmpty)
    // total transitions = total events − one per user (last has no successor)
    val e = graft.sources.Tables.load(spark, sf, "events")
    val expected = e.count() - e.select(col("user_id")).distinct().count()
    assert(t.agg(sum(col("n"))).head().getLong(0) == expected)
  }

  test("hour bitmap cardinality equals the distinct active hours") {
    val b = Analytics.hourBitmap(spark, sf)
    val e = graft.sources.Tables.load(spark, sf, "events")
      .groupBy(col("user_id"))
      .agg(countDistinct(hour(col("ts"))).as("nh"))
    val j = b.join(e, Seq("user_id"))
    assert(j.filter(col("n_active_hours") =!= col("nh")).isEmpty)
    // a 24-hour domain: the mask never sets bit 24+
    assert(b.filter(col("hour_mask") >= (1L << 24) || col("hour_mask") <= 0L).isEmpty)
  }

  test("shard pack equals a single-partition per-kind cumsum and is monotone") {
    val s = graft.multimodal.Multimodal.shardPack(spark, sf)
    // reference: plain window cumsum (the thing the two-phase sum replaces)
    val m = graft.multimodal.Multimodal.mediaTable(spark, sf)
      .select(col("doc_id"), col("kind"), length(col("payload")).cast("long").as("n_bytes"))
    val w = Window.partitionBy(col("kind")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = m.withColumn("cum", sum(col("n_bytes")).over(w))
      .select(col("doc_id"), col("kind"), col("n_bytes"),
        floor((col("cum") - col("n_bytes")).cast("double") / 4096L)
          .cast("long").as("shard_id"))
    assert(s.select("doc_id", "kind", "n_bytes", "shard_id")
      .except(ref).isEmpty)
    assert(ref.except(s.select("doc_id", "kind", "n_bytes", "shard_id")).isEmpty)
    // shard ids start at 0 per kind and never skip
    val ids = s.groupBy(col("kind")).agg(min(col("shard_id")).as("lo"),
      max(col("shard_id")).as("hi"), countDistinct(col("shard_id")).as("nd"))
    assert(ids.filter(col("lo") =!= 0L || col("nd") =!= col("hi") + 1).isEmpty)
  }

  test("peak concurrency matches a naive per-instant count on a sample") {
    val p = Analytics.peakConcurrency(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("peak"), r.getAs[String]("peak_at"))).toMap
    // naive check for one type: count sessions open at the reported peak minute
    val e = graft.sources.Tables.load(spark, sf, "events")
    p.foreach { case (tpe, (peak, at)) =>
      val atTs = java.sql.Timestamp.valueOf(at + ":00")
      // the grid counts a session open at minute m iff
      // trunc(start) <= m < trunc(start + 30min) — minute granularity
      val open = e.filter(col("event_type") === tpe)
        .filter(date_trunc("minute", col("ts")) <= lit(atTs) &&
          date_trunc("minute", col("ts") + expr("INTERVAL 30 MINUTES")) > lit(atTs))
        .count()
      assert(open == peak, s"type=$tpe naive=$open grid=$peak at=$at")
    }
  }

  test("percent-of-total shares sum to 1 within each status") {
    val p = Analytics.pctOfTotal(spark, sf)
    val sums = p.groupBy(col("o_orderstatus")).agg(sum(col("share")).as("s"))
    assert(sums.filter(abs(col("s") - 1.0) > 1e-4).isEmpty)
    assert(p.filter(col("share") < 0 || col("share") > 1).isEmpty)
  }

  test("cumulative users: final cume equals the distinct user count") {
    val c = Analytics.cumeUsers(spark, sf).orderBy(col("d")).collect()
    val total = graft.sources.Tables.load(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(c.last.getAs[Long]("cume_users") == total)
    // monotone, and increments match the per-day news
    val cum = c.map(_.getAs[Long]("cume_users"))
    val news = c.map(_.getAs[Long]("new_users"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a < b || a == b })
    assert(news.sum == total)
  }

  test("mad is non-negative and below the full range") {
    val m = Analytics.madPerPriority(spark, sf)
    val o = graft.sources.Tables.load(spark, sf, "orders")
    val rng = o.groupBy(col("o_orderpriority"))
      .agg((max(col("o_totalprice")) - min(col("o_totalprice"))).as("range"))
    val j = m.join(rng, Seq("o_orderpriority"))
    assert(j.filter(col("mad_price") < 0 || col("mad_price") > col("range")).isEmpty)
    // at least half the rows sit within one MAD of the median is NOT
    // guaranteed in general, but |x-median| <= MAD holds for >= half:
    val withM = o.join(m, Seq("o_orderpriority"))
    val within = withM.filter(
      abs(col("o_totalprice") - col("median_price")) <= col("mad_price") + 1e-6)
    assert(within.count() * 2 >= o.count())
  }

  test("asof tolerance voids only stale matches, keeping fresh ones bit-identical") {
    val base = graft.operators.Temporal.purchaseAsOfClick(spark, sf)
    val tol = graft.operators.Temporal.purchaseAsOfClickTolerance(spark, sf)
    val j = base.alias("b").join(tol.alias("t"), Seq("event_id"))
    val gapUs = unix_micros(col("b.ts").cast("timestamp")) -
      unix_micros(col("b.click_ts").cast("timestamp"))
    // fresh rows carry the identical match
    assert(j.filter(gapUs <= 3600000000L &&
      (col("t.click_event_id") =!= col("b.click_event_id"))).isEmpty)
    // stale rows are voided
    assert(j.filter(gapUs > 3600000000L && col("t.click_event_id").isNotNull).isEmpty)
    assert(tol.count() == base.count())
  }

  test("pmi top bigrams are count-ordered and component counts dominate pair counts") {
    val p = TextFunctions.pmiCollocations(spark, sf).collect()
    assert(p.nonEmpty && p.length <= 20)
    val ns = p.map(r => r.getAs[Long]("n_pair"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    p.foreach { r =>
      assert(r.getAs[Long]("cx") >= r.getAs[Long]("n_pair"))
      assert(r.getAs[Long]("cy") >= r.getAs[Long]("n_pair"))
      assert(!r.getAs[Double]("pmi").isNaN)
    }
  }

  test("cohort LTV: cum_value telescopes over week_value and actives " +
    "never exceed the retention curve") {
    val rows = Analytics.cohortLtv(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { cohort =>
      val sorted = cohort.sortBy(_._2)
      var running = 0.0
      sorted.foreach { case (_, _, _, wk, cum) =>
        running = math.round((running + wk) * 100.0) / 100.0
        assert(math.abs(cum - running) < 0.011, s"telescope broke at $cum vs $running")
      }
    }
    // the same cohort spine: active counts must equal q_retention_cohort's
    val ret = Analytics.retentionCohort(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (cw, wk, act, _, _) =>
      assert(ret((cw, wk)) == act, s"active mismatch at ($cw, $wk)")
    }
  }
}
