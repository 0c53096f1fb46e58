package graft

import org.apache.spark.sql.functions._

class PlansSpec extends SparkSpec {

  test("BroadcastSmallDims hints broadcast when Spark's own threshold is off") {
    val autoKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(autoKey)
    try {
      // Disable Spark's size-based broadcast so only the graft rule can
      // produce a broadcast join.
      spark.conf.set(autoKey, "-1")
      val li = graft.sources.Tables.load(spark, sf, "lineitem")
      val n = graft.sources.Tables.load(spark, sf, "nation")
      val joined = li.join(n, li("l_suppkey") % 25 === n("n_nationkey"))
        .groupBy(col("n_name")).count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"expected graft broadcast hint to fire, got:\n$plan")
    } finally spark.conf.set(autoKey, prev)
  }

  test("rule leaves joins alone when both sides exceed the threshold") {
    val autoKey = "spark.sql.autoBroadcastJoinThreshold"
    val graftKey = "spark.graft.broadcastDimThreshold"
    val prev = spark.conf.get(autoKey)
    try {
      spark.conf.set(autoKey, "-1")
      spark.conf.set(graftKey, "1") // 1 byte: nothing qualifies
      val li = graft.sources.Tables.load(spark, sf, "lineitem")
      val o = graft.sources.Tables.load(spark, sf, "orders")
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority")).count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"expected no broadcast with thresholds off, got:\n$plan")
    } finally {
      spark.conf.set(autoKey, prev)
      spark.conf.unset(graftKey)
    }
  }

  test("graft session defaults: AQE on, UTC, shuffle partitions sized") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
  }
}
