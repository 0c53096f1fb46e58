package graft.probe

import org.apache.spark.sql.functions._

/** Diagnostic: does AQE's OptimizeSkewedJoin actually fire on the
  * SkewSoak revenue join over the Zipf 100x layout? Prints the FINAL
  * adaptive plan (after execution) so the skew annotation — or its
  * absence — is visible, under default and tuned split thresholds.
  * Usage: Test/runMain graft.probe.ProbeSkewAqe [scaleDir]
  */
object ProbeSkewAqe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_soak/x100_zipf")
    val spark = graft.GraftSession.builder(master = "local[32]",
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def revenue() = {
      val li = graft.sources.Tables.load(spark, dir, "lineitem")
      val o = graft.sources.Tables.load(spark, dir, "orders")
      li.join(o.hint("shuffle_merge"), li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"), count(lit(1)).as("n_items"))
    }

    def show(label: String): Unit = {
      val df = revenue()
      // execute THROUGH this QueryExecution (a write clones the plan,
      // so the adaptive final plan would live on the clone, not here)
      df.collect(): Unit
      val plan = df.queryExecution.executedPlan.toString
      val skewLines = plan.linesIterator.filter(l =>
        l.toLowerCase.contains("skew")).toSeq
      println(s"=== $label: adaptive=${plan.contains("AdaptiveSparkPlan")} " +
        s"isFinalPlan=${plan.contains("isFinalPlan=true")}")
      if (skewLines.isEmpty) println(s"=== $label: NO skew annotation in final plan")
      else skewLines.foreach(l => println(s"=== $label: $l"))
      plan.linesIterator.filter(l => l.contains("SortMergeJoin") ||
        l.contains("AQEShuffleRead") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin"))
        .foreach(l => println(s"=== $label JOIN: ${l.trim.take(160)}"))
    }

    // the row histogram the skew detector actually sees: rows per
    // hash-partition bucket of the fact side at 32 shuffle partitions
    graft.sources.Tables.load(spark, dir, "lineitem")
      .groupBy(pmod(hash(col("l_orderkey")), lit(32)).as("bucket")).count()
      .orderBy(col("count").desc).limit(5).collect()
      .foreach(r => println(s"=== bucket ${r.get(0)}: ${r.getLong(1)} rows"))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    show("default-thresholds")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64m")
    show("tuned-thresholds")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
    show("aggressive-thresholds")
    // full final plan for structural inspection
    val df = revenue()
    df.collect(): Unit
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/probe_skew_plan.txt"),
      df.queryExecution.executedPlan.toString.getBytes): Unit
    // the byte histogram the skew detector ACTUALLY sees: map output
    // stats per shuffle partition of each materialized shuffle stage
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    // QueryStageExec nodes are LEAVES (their subtree lives in .plan),
    // so a plain collect stops at the ResultQueryStage — recurse
    // through the wrappers explicitly.
    def stages(p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleQueryStageExec] =
      p match {
        case a: AdaptiveSparkPlanExec => stages(a.executedPlan)
        case s: ShuffleQueryStageExec => s +: stages(s.plan)
        case q: QueryStageExec => stages(q.plan)
        case other => other.children.flatMap(stages)
      }
    val found = stages(df.queryExecution.executedPlan)
    println(s"=== stats: root=${df.queryExecution.executedPlan.getClass.getSimpleName} " +
      s"stages=${found.size} mapStatsDefined=${found.count(_.mapStats.isDefined)}")
    found.foreach { s =>
      s.mapStats.foreach { ms =>
        val sizes = ms.bytesByPartitionId.sorted
        val med = sizes(sizes.length / 2)
        println(f"=== stage shuffleId=${ms.shuffleId}: nParts=${sizes.length} " +
          f"maxMB=${sizes.last / 1e6}%.1f medMB=${med / 1e6}%.1f ratio=${
            if (med > 0) sizes.last.toDouble / med else 0.0}%.2f")
      }
    }
    spark.stop()
  }
}
