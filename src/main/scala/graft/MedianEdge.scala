package graft

import org.apache.spark.sql.functions._

/** The ObjectHashAggregate fallback-threshold trade at high group
  * cardinality, measured — the round-13 verdict's concern made a
  * number: raising `objectHashAggregate.sortBased.fallbackThreshold`
  * session-wide (as round 13 did) un-guards Spark's builtin
  * TypedImperativeAggregates with UNBOUNDED buffers. Exact
  * `percentile` grouped by a high-cardinality key is the canonical
  * exposure: under the 128-key default a task degrades to sort-based
  * aggregation (predictable spill); under a 256k raise it holds one
  * open value-buffer per group in memory first.
  *
  * This probe times the q_median shape (exact percentile + MAD-style
  * abs-deviation percentile) grouped by `user_id` (~1.5k groups/task
  * at 10x) on the soak corpus, once under the session default and
  * once under the raised threshold, and asserts both return identical
  * results. The engine's posture after round 14 — default threshold
  * session-wide, scoped raise only around provably-bounded aggregates
  * — is validated by the `default` leg finishing comfortably (no OOM,
  * wall within noise of the raised leg).
  *
  * Appends `metric=median_edge` rows to soak_results.jsonl.
  * Usage: runMain graft.MedianEdge [scale]   (default 10)
  */
object MedianEdge {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sink = new java.io.PrintWriter(
      new java.io.FileWriter("soak_results.jsonl", true))
    def emit(l: String): Unit = { println(l); sink.println(l); sink.flush() }

    val dir = Soak.materialize(spark, k, needFacts = false)
    val events = graft.sources.Tables.load(spark, dir, "events")
    // prime the page cache on the measured columns (LayoutSoak.prime
    // discipline — parquet count() reads no data pages) so the first
    // leg doesn't pay the cold IO the second leg skips
    events.agg(sum(hash(col("user_id"), col("value")).cast("long")))
      .collect(): Unit

    // the q_median / q_mad shape, but grouped by the HIGH-cardinality
    // entity key instead of the 3-value priority column
    def medians() = events
      .groupBy(col("user_id"))
      .agg(expr("percentile(value, 0.5)").as("med"),
        count(lit(1)).as("n"))

    def leg(raise: Boolean): (Double, Long, Long) = {
      spark.catalog.clearCache()
      def body: (Double, Long, Long) = {
        val t0 = System.nanoTime()
        val row = medians()
          .agg(count(lit(1)).as("groups"),
            coalesce(sum(hash(col("user_id"), round(col("med"), 6), col("n"))
              .cast("long")), lit(0L)).as("h"))
          .head()
        ((System.nanoTime() - t0) / 1e9, row.getLong(0), row.getLong(1))
      }
      if (raise) GraftSession.withObjectAggHeadroom(spark)(body) else body
    }

    val (dSec, dGroups, dHash) = leg(raise = false)
    emit(f"""{"metric":"median_edge","scale":$k,"leg":"default_128","sec":$dSec%.3f,"groups":$dGroups}""")
    val (rSec, rGroups, rHash) = leg(raise = true)
    emit(f"""{"metric":"median_edge","scale":$k,"leg":"raised_256k","sec":$rSec%.3f,"groups":$rGroups}""")
    require(dGroups == rGroups && dHash == rHash,
      s"threshold changed RESULTS: default ($dGroups, $dHash) vs raised ($rGroups, $rHash)")
    emit(f"""{"metric":"median_edge","scale":$k,"leg":"ratio_default_over_raised","x":${dSec / rSec}%.3f}""")
    sink.close()
    spark.stop()
  }
}
