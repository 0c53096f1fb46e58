package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Temporal

class TemporalSpec extends SparkSpec {

  test("native as-of join plans AsOfJoinExec and matches the window formulation") {
    val native = Temporal.purchaseAsOfClickNative(spark, sf)
    val physical = native.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin"), physical.take(500))
    val window = Temporal.purchaseAsOfClick(spark, sf)
    assert(native.collect().toSeq == window.collect().toSeq)
  }

  test("native as-of join emits nulls for left rows with no prior right row") {
    import spark.implicits._
    val l = Seq((1L, 10L, "p1"), (1L, 5L, "p0"), (2L, 7L, "q0"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 6L, "r6"), (1L, 10L, "r10"), (3L, 1L, "zz"))
      .toDF("rk", "rt", "rtag")
    val out = graft.plans.AsOfJoinOps
      .asOfJoinNative(spark, l, r, "k", "rk", "t", "rt")
      .select("k", "t", "tag", "rtag")
      .as[(Long, Long, String, Option[String])].collect().toSet
    assert(out == Set(
      (1L, 10L, "p1", Some("r10")), // inclusive tie matches
      (1L, 5L, "p0", None),         // nothing at-or-before t=5
      (2L, 7L, "q0", None)))        // key with no right rows at all
  }
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin attaches the latest right row at-or-before each left row") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 09:00:00"), 200L)
    ).toDF("k", "t", "left_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), "a"),
      (1L, ts("2024-01-01 11:00:00"), "b"),
      (1L, ts("2024-01-01 13:00:00"), "c"), // after every left row of k=1
      (2L, ts("2024-01-01 09:00:00"), "d")  // exactly simultaneous → matches
    ).toDF("k", "rt", "tag")
    val out = Temporal.asOfJoin(left, right, "k", "t", "rt", Seq("tag"))
      .select("left_id", "asof_tag").as[(Long, String)].collect().toMap
    assert(out == Map(100L -> "a", 101L -> "b", 200L -> "d"))
  }

  test("asOfJoin leaves unmatched left rows null") {
    val left = Seq((1L, ts("2024-01-01 08:00:00"), 1L)).toDF("k", "t", "left_id")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), "late")).toDF("k", "rt", "tag")
    val out = Temporal.asOfJoin(left, right, "k", "t", "rt", Seq("tag"))
    assert(out.count() == 1 && out.filter(col("asof_tag").isNull).count() == 1)
  }

  test("purchaseAsOfClick matches a manual per-row check") {
    // events.ts decodes as java.sql.Timestamp (an instant) since the
    // LTZ read flip (GraftSession inferTimestampNTZ=false); compare as
    // instants, which is JVM-timezone-independent
    def nanos(t: java.sql.Timestamp): Long =
      math.floorDiv(t.getTime, 1000L) * 1000000000L + t.getNanos
    val out = Temporal.purchaseAsOfClick(spark, sf)
    val e = graft.sources.Tables.load(spark, sf, "events")
      .select("user_id", "ts", "event_type", "event_id")
      .as[(Long, java.sql.Timestamp, String, Long)].collect()
    val byUser = e.groupBy(_._1)
    val rows = out.select("event_id", "user_id", "ts", "click_event_id")
      .collect()
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val (uid, t) = (r.getLong(1), r.getAs[java.sql.Timestamp](2))
      val expect = byUser(uid).filter(x => x._3 == "click" && !x._2.after(t))
        .sortBy(x => (nanos(x._2), x._4)).lastOption.map(_._4)
      val got = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(got == expect, s"user $uid at $t")
    }
  }

  test("eventsByRange covers only in-calendar events, once each") {
    val out = Temporal.eventsByRange(spark, sf)
    val total = out.agg(sum("n_events")).as[Long].head()
    val e = graft.sources.Tables.load(spark, sf, "events")
    val inCal = e.filter(col("ts") >= "2024-01-01" && col("ts") < "2024-02-26").count()
    assert(total == inCal)
  }

  test("saltedJoinRevenue equals the unsalted join") {
    val salted = Temporal.saltedJoinRevenue(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
    val o = graft.sources.Tables.load(spark, sf, "orders")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(salted == plain)
  }
}
