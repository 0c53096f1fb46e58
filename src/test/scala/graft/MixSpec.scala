package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Analytics

/** Round-3 session-5 operators: TPC-H Q3/Q5 join shapes, day-of-week
  * seasonality, token-budget mixture sampling.
  */
class MixSpec extends SparkSpec {
  import spark.implicits._

  test("ship priority: revenue matches a driver-side recompute of the filtered join") {
    val rows = Analytics.shipPriority(spark, sf).collect()
    assert(rows.length <= 10)
    // strictly ordered by revenue desc then key
    for (i <- 1 until rows.length) {
      val (a, b) = (rows(i - 1), rows(i))
      assert(a.getLong(1) > b.getLong(1) ||
        (a.getLong(1) == b.getLong(1) && a.getLong(0) < b.getLong(0)))
    }
    // recompute one order's revenue from raw tables in cents
    if (rows.nonEmpty) {
      val key = rows.head.getLong(0)
      val cents = graft.sources.Tables.load(spark, sf, "lineitem")
        .filter(col("l_orderkey") === key &&
          to_date(col("l_shipdate")) > to_date(lit("1997-06-01")))
        .select((col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(9,4)") - col("l_discount").cast("decimal(9,4)")))
          .as("r"))
        .agg(sum(col("r")).cast("decimal(18,2)").as("r2"))
        .select((col("r2") * 100).cast("long")).as[Long].head()
      assert(rows.head.getLong(1) === cents)
    }
  }

  test("region volume: every nation is in the region, revenue positive") {
    val rows = Analytics.regionVolume(spark, sf).collect()
    assert(rows.nonEmpty)
    val asia = graft.sources.Tables.load(spark, sf, "nation")
      .join(graft.sources.Tables.load(spark, sf, "region")
        .filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name")).as[String].collect().toSet
    for (r <- rows) {
      assert(asia.contains(r.getString(0)))
      assert(r.getLong(1) > 0L && r.getLong(2) > 0L)
    }
  }

  test("seasonality: per-type weighted mean of the index over dow slots is 1") {
    val rows = Analytics.seasonalityDow(spark, sf).collect()
    val days = graft.sources.Tables.load(spark, sf, "events")
      .select(to_date(col("ts")).as("d")).distinct()
      .select(expr("weekday(d) + 1").cast("long")).as[Long].collect()
    val dowDays = days.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totDays = days.length.toLong
    // sum over dow of index * (dd/dt) * (st) == st  =>  Σ sd == st
    for ((t, rs) <- rows.groupBy(_.getString(0))) {
      val st = rs.map(_.getLong(2)).sum
      val back = rs.map { r =>
        r.getDouble(3) * dowDays(r.getLong(1)) / totDays * st
      }.sum
      assert(math.abs(back - st) / st < 1e-4, s"type $t")
    }
  }

  test("mixture sample: rates are exact integer arithmetic and kept counts honor buckets") {
    val rows = TextFunctions.mixtureSample(spark, sf).collect()
    assert(rows.nonEmpty)
    val tokTotal = rows.map(_.getLong(1)).sum
    val budget = tokTotal * 40 / 100
    val w = TextFunctions.mixtureWeights.toMap
    for (r <- rows) {
      val (src, tokS) = (r.getString(0), r.getLong(1))
      val budgetS = budget * w(src) / 1000
      assert(r.getLong(2) === budgetS, s"budget $src")
      assert(r.getLong(3) === math.min(1000L, budgetS * 1000 / tokS), s"rate $src")
      assert(r.getLong(4) >= 0L && r.getLong(5) >= 0L)
      // a full-rate source keeps every doc
      if (r.getLong(3) == 1000L) assert(r.getLong(5) === tokS)
    }
    // deterministic: rerun is identical
    val again = TextFunctions.mixtureSample(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
