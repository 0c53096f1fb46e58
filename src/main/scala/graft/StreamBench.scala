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
  * Two state-store providers are measured: the default in-memory
  * HDFSBackedStateStoreProvider (state must fit the executor heap —
  * fine for bounded key domains) and RocksDBStateStoreProvider (state
  * lives off-heap in RocksDB memtables + on-disk SSTs — the 100 TB
  * pipeline's keyed state does not fit a heap). Every STATEFUL
  * pipeline runs under both, tagged `"provider"` in the output; the
  * closing `state_blowup_dedup` pipeline runs ONLY under RocksDB with
  * an UNBOUNDED key domain (every event a new key plus a payload
  * column carried into state) precisely because the in-memory provider
  * heap-OOMs on it — measured in r6 — and reports the state row count
  * and on-disk SST bytes so "state exceeded the heap" is a number in
  * the artifact, not a claim.
  *
  * Emits one JSON line per (pipeline, provider) and a closing
  * `stream_total` line, appending to stream_bench.jsonl.
  *
  * Usage: runMain graft.StreamBench [secondsPerPipeline] [rowsPerSec] [blowupSeconds]
  */
object StreamBench {

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

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

  /** The same events shape with `user_id` drawn Zipf(1.1) over the
    * 100k-key domain (SkewSoak's inverse-CDF: rank = ⌊u^-10⌋ wrapped
    * into the domain; rank 1 carries ~6.7% of all rows) — the hot-key
    * regime for keyed STREAMING state: every micro-batch funnels ~7%
    * of its rows through one state-store partition.
    */
  private def zipfEvents(spark: SparkSession, rps: Long): DataFrame = {
    val nKeys = 100000L
    val base = spark.readStream.format("rate")
      .option("rowsPerSecond", rps.toString)
      .option("numPartitions", "32")
      .load()
    val u = (pmod(xxhash64(col("value")), lit(1000000000L)).cast("double") +
      lit(0.5)) / lit(1000000000.0)
    val raw = least(floor(pow(u, lit(-10.0))), lit(9.0e15)).cast("long")
    base.select(col("timestamp").as("ts"),
      (pmod(raw - lit(1L), lit(nKeys))).as("user_id"),
      element_at(
        array(lit("view"), lit("click"), lit("cart"), lit("purchase")),
        (pmod(col("value"), lit(4L)) + 1).cast("int")).as("event_type"),
      pmod(col("value"), lit(97L)).cast("double").as("value"),
      col("value").as("event_id"))
  }

  /** Successful-task durations across the run, for the hot-partition
    * drag ratio (max/median task ms of the stage holding the longest
    * task — same methodology as SkewSoak's join/agg ratios).
    */
  private final class TaskClock extends org.apache.spark.scheduler.SparkListener {
    val byStage = new java.util.concurrent.ConcurrentHashMap[
      Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (t.taskInfo != null && t.taskInfo.successful) {
        byStage.computeIfAbsent(t.stageId,
          _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
          .add(t.taskInfo.duration): Unit
      }
    def skewRatio(): (Long, Long) = {
      import scala.jdk.CollectionConverters._
      val stages = byStage.values().asScala.map(_.asScala.toVector.sorted)
        .filter(_.nonEmpty)
      if (stages.isEmpty) (0L, 0L)
      else {
        val worst = stages.maxBy(_.last)
        (worst.last, worst(worst.size / 2))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val secs = args.headOption.map(_.toInt).getOrElse(20)
    val rps = args.drop(1).headOption.map(_.toLong).getOrElse(4000000L)
    val blowupSecs = args.drop(2).headOption.map(_.toInt).getOrElse(secs * 3)
    // optional 4th arg: run only these comma-separated pipelines —
    // lets a new pipeline be measured at a longer duration without
    // re-timing the whole suite (empty = everything, as before)
    val only: Set[String] = args.drop(3).headOption.filter(_.nonEmpty)
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
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
    // stateful=false pipelines skip the RocksDB pass (no state store
    // in the plan — the second measurement would be the same number).
    val pipelines: Seq[(String, Boolean, () => DataFrame)] = Seq(
      ("passthrough_projection", false, () => events
        .withColumn("is_buy", (col("event_type") === "purchase").cast("int"))),
      ("tumbling_window_agg", true, () =>
        EventStream.tumblingCounts(events, "10 seconds", "5 seconds")),
      ("windowed_distinct_hll", true, () =>
        EventStream.windowedDistinctUsers(events, "10 seconds", "5 seconds")),
      // windowed percentile sketch: per-window state is ONE GK sketch
      // (O(accuracy)), so the latency-quantile monitor costs the same
      // state at any event cardinality — the streaming twin of
      // q_approx_quantile
      ("windowed_percentile", true, () =>
        EventStream.windowedPercentiles(events, Seq(0.5, 0.9, 0.99),
          10000, "10 seconds", "5 seconds")),
      // Bounded key domain (1M) so duplicates actually occur and the
      // watermark state stays ~1M entries: an all-unique key makes
      // state grow at the ingest rate (~4M keys/s) and heap-OOMs the
      // bench JVM under the in-memory provider — that regime is the
      // RocksDB-only state_blowup_dedup pipeline below.
      ("dedup_within_watermark", true, () =>
        EventStream.dedupWithinWatermark(
          events.withColumn("dedup_key", pmod(col("event_id"), lit(1000000L))),
          Seq("dedup_key"), "5 seconds")),
      ("stateful_sessionize", true, () => EventStream.sessionizeStateful(
        events.select(col("user_id"), col("ts"), col("value"))
          .as[EventStream.Ev]).toDF()),
      ("stateful_ewma", true, () => EventStream.ewmaStateful(
        events.select(col("user_id"), col("ts"), col("value"))
          .as[EventStream.Ev]).toDF()),
      // Stream-stream interval join: BOTH sides buffer state until
      // their watermark passes the join window — the heaviest stateful
      // operator class, previously spec-covered but never
      // throughput-measured. Purchases (1/4 of one rate stream) join
      // same-user clicks (1/4 of an INDEPENDENT rate stream) within
      // the preceding 5 seconds; 10s/20s watermarks keep the buffered
      // window bounded inside the bench run. ~12.5 matches per
      // purchase at the 100k-user default rate, so the output
      // amplification is part of what is being measured.
      ("stream_stream_join", true, () => EventStream.purchaseClickJoin(
        events.filter(col("event_type") === "purchase"),
        rateEvents(spark, rps).filter(col("event_type") === "click"),
        window = "5 SECONDS", pWatermark = "10 seconds",
        cWatermark = "20 seconds")),
      // LEFT OUTER twin: unmatched purchases emit (with null click
      // columns) only once the click watermark proves no match can
      // arrive — measures the extra state the outer side must hold.
      ("stream_stream_left_join", true, () =>
        EventStream.purchaseClickLeftJoin(
          events.filter(col("event_type") === "purchase"),
          rateEvents(spark, rps).filter(col("event_type") === "click"),
          window = "5 SECONDS", pWatermark = "10 seconds",
          cWatermark = "20 seconds")),
      // pre-aggregated twin under UNIFORM keys: the baseline cost of
      // the hot-key mitigation when no key is hot (what the bucketing
      // stage charges a healthy stream)
      ("stream_stream_join_preagg", true, () =>
        EventStream.purchaseClickJoinPreAgg(
          events.filter(col("event_type") === "purchase"),
          rateEvents(spark, rps).filter(col("event_type") === "click"),
          bucket = "5 seconds", window = "5 SECONDS",
          pWatermark = "10 seconds", cWatermark = "20 seconds")))

    /** Run one pipeline for `runSecs`; emits sustained rows/s, state
      * sizes from the LAST progress with state metrics, and the
      * per-batch state COMMIT latency (stateOperators.commitTimeMs,
      * batch 0 dropped) — commit time is the synchronous
      * checkpoint-upload tax every microbatch pays, separate from
      * ingest throughput: a pipeline can sustain its rate while
      * commits quietly dominate the trigger interval. `changelog=true`
      * (RocksDB only) switches checkpointing from full-SST uploads to
      * changelog files — the commit-latency lever for large state.
      */
    def run(name: String, build: () => DataFrame, provider: String,
        runSecs: Int, outputMode: String = "append",
        changelog: Boolean = false, zipf: Boolean = false): Unit = {
      if (only.nonEmpty && !only(name)) return
      val label = if (provider == RocksDbProvider) "rocksdb" else "hdfs"
      val clLabel = if (changelog) "on" else "off"
      val prev = spark.conf.getOption(ProviderKey)
      val clKey =
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
      if (provider.nonEmpty) spark.conf.set(ProviderKey, provider)
      spark.conf.set(clKey, changelog.toString)
      val clock = new TaskClock
      spark.sparkContext.addSparkListener(clock)
      try {
        val q = build().writeStream.format("noop")
          .trigger(Trigger.ProcessingTime("1 second"))
          .option("checkpointLocation",
            s"/tmp/graft_streambench/$name-$label-${System.nanoTime()}")
          .outputMode(outputMode)
          .start()
        Thread.sleep(runSecs * 1000L)
        val progress = q.recentProgress.toSeq
        q.stop()
        // drop batch 0 (plan compile) and empty batches
        val rates = progress.drop(1)
          .filter(p => p.numInputRows > 0)
          .map(_.processedRowsPerSecond)
        val sustained = if (rates.isEmpty) 0.0 else rates.sum / rates.size
        val rows = progress.map(_.numInputRows).sum
        val lastState = progress.reverse
          .flatMap(_.stateOperators.toSeq).headOption
        val stateRows = lastState.map(_.numRowsTotal).getOrElse(0L)
        val stateMem = lastState.map(_.memoryUsedBytes).getOrElse(0L)
        val sstBytes = lastState
          .flatMap(s => Option(s.customMetrics.get("rocksdbSstFileSize")))
          .map(_.longValue).getOrElse(0L)
        val commits = progress.drop(1).flatMap(_.stateOperators.toSeq)
          .map(_.commitTimeMs)
        val commitMean =
          if (commits.isEmpty) 0.0 else commits.sum.toDouble / commits.size
        val commitMax = if (commits.isEmpty) 0L else commits.max
        Thread.sleep(1000) // drain the listener bus
        val (taskMax, taskMed) = clock.skewRatio()
        val taskRatio = if (taskMed > 0) taskMax.toDouble / taskMed else 0.0
        emit(f"""{"metric":"stream_bench","pipeline":"$name","provider":"$label","changelog":"$clLabel","zipf":$zipf,"rows_per_sec":$sustained%.0f,"batches":${progress.size},"rows":$rows,"state_rows":$stateRows,"state_mem_bytes":$stateMem,"sst_bytes":$sstBytes,"commit_ms_mean":$commitMean%.0f,"commit_ms_max":$commitMax,"task_max_ms":$taskMax,"task_med_ms":$taskMed,"task_ratio":$taskRatio%.1f}""")
      } finally {
        spark.sparkContext.removeSparkListener(clock)
        prev match {
          case Some(v) => spark.conf.set(ProviderKey, v)
          case None => spark.conf.unset(ProviderKey)
        }
        spark.conf.unset(clKey)
      }
    }

    for ((name, stateful, build) <- pipelines) {
      run(name, build, "", secs)
      if (stateful) {
        run(name, build, RocksDbProvider, secs)
        run(name, build, RocksDbProvider, secs, changelog = true)
      }
    }

    // ---- the same stateful shapes under a Zipf(1.1) HOT KEY
    // (VERDICT r9 item 6): rank 1 carries ~6.7% of every micro-batch
    // into one state-store partition. task_ratio (max/median task ms)
    // is the hot-partition drag number; compare against the uniform
    // rows above. Both providers, changelog on for RocksDB — the
    // deployment shape SCALING.md recommends.
    def zEvents = zipfEvents(spark, rps)
    val zipfPipelines: Seq[(String, () => DataFrame)] = Seq(
      // dedup keyed directly on the Zipf user: the 100k-key domain
      // dedups hard at 4M rows/s, and the rank-1 key funnels ~6.7% of
      // every batch through one partition's state lookups
      ("dedup_within_watermark", () =>
        EventStream.dedupWithinWatermark(
          zEvents.withColumn("dedup_key", col("user_id")),
          Seq("dedup_key"), "5 seconds")),
      ("stateful_sessionize", () => EventStream.sessionizeStateful(
        zEvents.select(col("user_id"), col("ts"), col("value"))
          .as[EventStream.Ev]).toDF()),
      // Stream-stream join with a HOT key on one side only: the
      // rank-1 user's purchases all route to one join-state partition
      // (state skew) while output stays linear (each matches a
      // uniform user's in-window clicks). Expected survivable;
      // MEASURED not: zero batches committed within 120 s under
      // either provider (vs 25-73 s commits for the uniform twin) —
      // the hot key's join-state entry list grows with every buffered
      // purchase, and each probe/cleanup walks it, so a large
      // catch-up first batch never finishes. The boundary row is the
      // measurement (docs/SCALING.md).
      ("stream_stream_join", () => EventStream.purchaseClickJoin(
        zEvents.filter(col("event_type") === "purchase"),
        rateEvents(spark, rps).filter(col("event_type") === "click"),
        window = "5 SECONDS", pWatermark = "10 seconds",
        cWatermark = "20 seconds")),
      // the SEMANTIC mitigation for the stall above, measured in the
      // same regime: the hot purchase side is pre-aggregated into 5 s
      // buckets before the join (windowed agg feeding the join —
      // chained stateful operators), so the rank-1 key buffers ~2
      // bucket rows instead of ~6.7% of every batch and probes stop
      // walking an unbounded entry list
      ("stream_stream_join_preagg", () => EventStream.purchaseClickJoinPreAgg(
        zEvents.filter(col("event_type") === "purchase"),
        rateEvents(spark, rps).filter(col("event_type") === "click"),
        bucket = "5 seconds", window = "5 SECONDS",
        pWatermark = "10 seconds", cWatermark = "20 seconds")),
      // HOT key on BOTH sides: the join output for the rank-1 user is
      // purchases x in-window clicks — QUADRATIC in the key's share
      // (~67k purchases/s x ~330k buffered clicks ≈ 2e10 rows/s for
      // one key at this rate). No state-store or salt fixes an output
      // that large; the recorded stall IS the measurement, and the
      // mitigation is semantic (pre-aggregate one side, cap the
      // window, or de-hot the key upstream).
      ("stream_stream_join_hot2", () => EventStream.purchaseClickJoin(
        zEvents.filter(col("event_type") === "purchase"),
        zipfEvents(spark, rps).filter(col("event_type") === "click"),
        window = "5 SECONDS", pWatermark = "10 seconds",
        cWatermark = "20 seconds")),
      // pre-aggregation against the BOTH-SIDES-hot quadratic regime:
      // bucketing the purchase side caps the hot key's left cardinality
      // at ~2 bucket rows, so output per hot key drops from
      // purchases x clicks to buckets x clicks — linear in the click
      // share. Measures whether that is enough to commit.
      ("stream_stream_join_preagg_hot2", () =>
        EventStream.purchaseClickJoinPreAgg(
          zEvents.filter(col("event_type") === "purchase"),
          zipfEvents(spark, rps).filter(col("event_type") === "click"),
          bucket = "5 seconds", window = "5 SECONDS",
          pWatermark = "10 seconds", cWatermark = "20 seconds")))
    for ((name, build) <- zipfPipelines) {
      run(name, build, "", secs, zipf = true)
      run(name, build, RocksDbProvider, secs, changelog = true, zipf = true)
    }

    // State-exceeds-heap: every event is a NEW key and the state row
    // carries a ~770-byte INCOMPRESSIBLE payload (12 chained sha2
    // digests — a repeated string would vanish under RocksDB's block
    // compression and understate the on-disk state by 20x, measured) —
    // latest-value-per-key in Update mode, the canonical "wide keyed
    // state" shape. Source is rate-micro-batch with a FIXED 200k rows
    // per batch: the plain rate source grows its catch-up batches
    // without bound once processing lags behind wall clock, so a long
    // run commits almost nothing (measured: 450 s committed the same
    // 2 batches a 120 s run did). State grows ~165 MB/batch with no
    // expiry: at the default 120 s the on-disk SST footprint passes
    // the bench JVM's 8 GiB heap while state_mem_bytes (RocksDB
    // memtables + block cache) stays bounded — the emitted sst_bytes
    // vs state_mem_bytes pair is the heap-decoupling proof. The
    // in-memory provider on this same shape heap-OOMs (measured r6) —
    // which is why it is RocksDB-only here.
    def blowup(): DataFrame =
      spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", "200000")
        .option("numPartitions", "32")
        .load()
        .select(col("value").as("event_id"))
        .withColumn("payload", concat((0 until 12).map(i =>
          sha2(concat(col("event_id").cast("string"), lit(s"_$i")), 256)): _*))
        .groupBy(col("event_id"))
        .agg(last(col("payload")).as("payload"), count(lit(1)).as("n"))
    // Changelog checkpointing matters MOST here: full-SST checkpoint
    // uploads grow with total state (~165 MB/batch and rising) while
    // changelog files grow only with the batch's delta — the two
    // commit_ms columns are the measured comparison.
    run("state_blowup_dedup", () => blowup(),
      RocksDbProvider, blowupSecs, outputMode = "update")
    run("state_blowup_dedup", () => blowup(),
      RocksDbProvider, blowupSecs, outputMode = "update", changelog = true)

    emit(f"""{"metric":"stream_total","secs_each":$secs,"source_rps":$rps,"blowup_secs":$blowupSecs}""")
    sink.close()
    spark.stop()
  }
}
