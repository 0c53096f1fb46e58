package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming throughput bench: drive the EventStream operators from a
  * saturating `rate` source for a fixed wall window and report the
  * SUSTAINED processed rows/second per pipeline (mean over completed
  * micro-batches after the first — batch 0 pays plan compile +
  * codegen). The batch surface has Bench + the scale soak; this is the
  * equivalent measured number for the streaming surface.
  *
  * Emits one JSON line per pipeline and a closing `stream_total` line,
  * appending to stream_bench.jsonl.
  *
  * Usage: runMain graft.StreamBench [secondsPerPipeline] [rowsPerSec]
  */
object StreamBench {

  /** rate source → the events shape the EventStream transforms expect */
  private def rateEvents(spark: SparkSession, rps: Long): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rps.toString)
      .option("numPartitions", "32")
      .load()
      .select(col("timestamp").as("ts"),
        pmod(col("value"), lit(100000L)).as("user_id"),
        element_at(
          array(lit("view"), lit("click"), lit("cart"), lit("purchase")),
          (pmod(col("value"), lit(4L)) + 1).cast("int")).as("event_type"),
        pmod(col("value"), lit(97L)).cast("double").as("value"),
        col("value").as("event_id"))

  def main(args: Array[String]): Unit = {
    val secs = args.headOption.map(_.toInt).getOrElse(20)
    val rps = args.drop(1).headOption.map(_.toLong).getOrElse(4000000L)
    val spark = GraftSession
      .builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.streaming.EventStream

    val sink = new java.io.PrintWriter(
      new java.io.FileWriter("stream_bench.jsonl", true))
    def emit(line: String): Unit = { println(line); sink.println(line); sink.flush() }

    def events = rateEvents(spark, rps)
    // Watermarks short enough that window state stays bounded inside
    // the bench run; the rate source's ts is wall-clock NOW, so a
    // 10-second window closes while the bench is still running.
    val pipelines: Seq[(String, () => DataFrame)] = Seq(
      ("passthrough_projection", () => events
        .withColumn("is_buy", (col("event_type") === "purchase").cast("int"))),
      ("tumbling_window_agg", () =>
        EventStream.tumblingCounts(events, "10 seconds", "5 seconds")),
      ("windowed_distinct_hll", () =>
        EventStream.windowedDistinctUsers(events, "10 seconds", "5 seconds")),
      // Bounded key domain (1M) so duplicates actually occur and the
      // watermark state stays ~1M entries: an all-unique key makes
      // state grow at the ingest rate (~4M keys/s) and heap-OOMs the
      // bench JVM — measured; a production dedup stream keys on a
      // bounded-cardinality natural id for the same reason.
      ("dedup_within_watermark", () =>
        EventStream.dedupWithinWatermark(
          events.withColumn("dedup_key", pmod(col("event_id"), lit(1000000L))),
          Seq("dedup_key"), "5 seconds")),
      ("stateful_sessionize", () => EventStream.sessionizeStateful(
        events.select(col("user_id"), col("ts"), col("value"))
          .as[EventStream.Ev]).toDF()),
      ("stateful_ewma", () => EventStream.ewmaStateful(
        events.select(col("user_id"), col("ts"), col("value"))
          .as[EventStream.Ev]).toDF()))

    var total = 0.0
    for ((name, build) <- pipelines) {
      val q = build().writeStream.format("noop")
        .trigger(Trigger.ProcessingTime("1 second"))
        .option("checkpointLocation",
          s"/tmp/graft_streambench/$name-${System.nanoTime()}")
        // every pipeline here is Append (both stateful ops are
        // flatMapGroupsWithState declared with OutputMode.Append)
        .outputMode("append")
        .start()
      Thread.sleep(secs * 1000L)
      val progress = q.recentProgress.toSeq
      q.stop()
      // drop batch 0 (plan compile) and empty batches
      val rates = progress.drop(1)
        .filter(p => p.numInputRows > 0)
        .map(_.processedRowsPerSecond)
      val sustained = if (rates.isEmpty) 0.0 else rates.sum / rates.size
      val rows = progress.map(_.numInputRows).sum
      total += sustained
      emit(f"""{"metric":"stream_bench","pipeline":"$name","rows_per_sec":$sustained%.0f,"batches":${progress.size},"rows":$rows}""")
    }
    emit(f"""{"metric":"stream_total","sum_rows_per_sec":$total%.0f,"n":${pipelines.size},"secs_each":$secs,"source_rps":$rps}""")
    sink.close()
    spark.stop()
  }
}
