package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout soak: measure what the three WRITE-TIME layout levers
  * actually buy on materialized data — the levers that dominate
  * repeated-query cost at warehouse scale, where "pay one shuffle /
  * one sort at ingest, never again" is the whole strategy.
  *
  * Why this exists: dynamic partition pruning and bucketed-join
  * shuffle elimination were spec-asserted (the plan contains
  * `dynamicpruning`, the bucketed join has zero Exchange) but never
  * MEASURED — no row of docs/SCALING.md said what a partitioned or
  * bucketed layout is worth in seconds, rows read, or shuffle bytes at
  * 10x/100x. The round-6 lesson applies: design-reviewed claims die
  * under measurement, so measure them.
  *
  * Three layout levers, each against its unorganized baseline:
  *
  *  1. PARTITIONED fact + month dim (dynamic partition pruning):
  *     lineitem written `partitionBy(l_shipmonth)` (~84 month
  *     directories), joined to a parquet month-dim filtered to 3
  *     months. Variants: `dpp_on` (runtime pruning via the
  *     dynamicpruning subquery), `dpp_off` (same layout, pruning
  *     disabled — every partition read, filter applied post-join),
  *     `part_static` (literal IN on the partition column — plan-time
  *     pruning, the cheap cousin), `unpart` (the same join on the
  *     unpartitioned base: derived month column, nothing prunable).
  *     Input rows/bytes read are recorded — pruning must show as ~3/84
  *     of the scan, not just as wall time.
  *
  *  2. BUCKETED join (shuffle elimination): lineitem and orders
  *     written `bucketBy(32, key) sortBy(key)` as managed tables.
  *     The same join+agg runs `join_bucketed` (both sides arrive
  *     hash-partitioned from disk: ZERO exchanges, recorded from the
  *     executed plan) vs `join_unbucketed` (both sides shuffle).
  *     `agg_bucketed`/`agg_unbucketed` do the same for a groupBy on
  *     the bucket key. Shuffle bytes written are recorded per variant.
  *
  *  3. SORT-CLUSTERED scan (row-group skipping): lineitem written
  *     range-partitioned + sorted by ship date with 1 MB row groups
  *     (Sink.writeSorted), scanned with a one-month predicate. The
  *     sorted layout should answer from the few row groups whose
  *     min/max overlap the window; the unsorted base reads everything.
  *     Measured twice because the first attempt found a trap:
  *     `scan_sorted_ts` filters the ship-date timestamp column — in
  *     round 10 that column read as TIMESTAMP_NTZ, whose filter shows
  *     in PushedFilters but never builds a reader predicate
  *     (ParquetFilters drops LocalDateTime), so NO row group skipped;
  *     `scan_sorted_date` filters the same rows through a DATE twin
  *     (`l_shipday`) where skipping works, and `scan_sorted_tstz`
  *     through a session-TZ TIMESTAMP twin. Round 12 closed the trap
  *     at the engine level (GraftSession inferTimestampNTZ=false reads
  *     naive parquet timestamps as session-TZ TIMESTAMP), so
  *     `scan_sorted_ts` — the exact headline l_shipdate filter shape —
  *     now skips like its twins; the NTZ PlanLint rule
  *     (`unpushed-scan-filter`) remains for genuinely-NTZ user data.
  *
  * Usage: runMain graft.LayoutSoak [scales] [variants] — default
  * scales "10", all variants. Appends JSON lines to
  * soak_results.jsonl (metric "layout") like Soak/SkewSoak.
  */
object LayoutSoak {

  /** Bump when layout-generation semantics change (same discipline as
    * Soak.GeneratorVersion — a silently-stale layout invalidates the
    * measurement).
    */
  // v2: sorted layout carries l_shipday DATE; v3: + l_shipts
  // session-TZ TIMESTAMP (the other pushdown-live twin of the NTZ col);
  // v4: l_shipdate itself is LTZ (Soak corpus v3 + the
  // inferTimestampNTZ=false flip — see Soak.GeneratorVersion)
  val LayoutGeneratorVersion = 4

  /** Per-task IO totals: scan input (rows + bytes) and shuffle write
    * bytes — the numbers that prove pruning/bucketing did what the
    * plan said, not just that wall time moved.
    */
  private final class IoClock extends org.apache.spark.scheduler.SparkListener {
    val inputRows = new java.util.concurrent.atomic.AtomicLong
    val inputBytes = new java.util.concurrent.atomic.AtomicLong
    val shuffleWriteBytes = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(
        t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        inputRows.addAndGet(m.inputMetrics.recordsRead): Unit
        inputBytes.addAndGet(m.inputMetrics.bytesRead): Unit
        shuffleWriteBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
      }
    }
  }

  private def versionFresh(marker: java.io.File): Boolean =
    marker.exists() && scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(marker.toPath)).trim.toInt
    ).getOrElse(-1) == LayoutGeneratorVersion

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmTree)
    f.delete(): Unit
  }

  /** Month-partitioned lineitem + the month dim (rank by month so a
    * `m_rank <= 3` filter is selective and survives to the dim scan).
    */
  def materializePartitioned(
      spark: SparkSession, k: Int, baseDir: String): String = {
    val dir = s"/tmp/graft_soak/x${k}_bymonth"
    val marker = new java.io.File(s"$dir/_LAYOUT_SCHEMA")
    if (versionFresh(marker) &&
      new java.io.File(s"$dir/lineitem.parquet/_SUCCESS").exists() &&
      new java.io.File(s"$dir/monthdim.parquet/_SUCCESS").exists()) return dir
    rmTree(new java.io.File(dir))
    System.err.println(s"[layout] materializing $dir ...")
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(marker.toPath,
      LayoutGeneratorVersion.toString.getBytes): Unit
    val li = spark.read.parquet(s"$baseDir/lineitem.parquet")
      .withColumn("l_shipmonth", date_format(col("l_shipdate"), "yyyy-MM"))
    // repartition BY the partition column so each month directory gets
    // a bounded number of files (~84 months land on 96 tasks) instead
    // of every task writing every month
    li.repartition(96, col("l_shipmonth"))
      .write.partitionBy("l_shipmonth")
      .mode("overwrite").parquet(s"$dir/lineitem.parquet")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_shipmonth")).distinct()
      .orderBy(col("l_shipmonth"))
      .withColumn("m_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("l_shipmonth"))))
      .withColumnRenamed("l_shipmonth", "m_month")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/monthdim.parquet")
    System.err.println(s"[layout] $dir ready")
    dir
  }

  /** Bucketed managed tables for lineitem/orders (join+agg columns
    * only — the unbucketed comparison scans the same columns through
    * parquet column pruning, so content is equivalent).
    */
  def materializeBucketed(
      spark: SparkSession, k: Int, baseDir: String): (String, String) = {
    val liTable = s"graft_layout_li_x$k"
    val ordTable = s"graft_layout_ord_x$k"
    val marker = new java.io.File(s"/tmp/graft_soak/x${k}_buckets_SCHEMA")
    // The session catalog is in-memory per JVM while the warehouse
    // directory persists: data bucketed by a PREVIOUS JVM is complete
    // on disk (the version marker is written last) but unknown to this
    // catalog. Re-register it as an external CLUSTERED BY table over
    // the old location instead of rebucketing — the bucket id is
    // encoded in the file names, so the spec still maps files to
    // buckets.
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    def registered(t: String, key: String): Boolean =
      spark.catalog.tableExists(t) || {
        val loc = new java.io.File(s"$warehouse/$t")
        loc.exists() && {
          val ddl = spark.read.parquet(loc.toString).schema.toDDL
          spark.sql(s"CREATE TABLE $t ($ddl) USING parquet " +
            s"CLUSTERED BY ($key) SORTED BY ($key) INTO 32 BUCKETS " +
            s"LOCATION '${loc.getAbsolutePath}'")
          true
        }
      }
    if (versionFresh(marker) && registered(liTable, "l_orderkey") &&
      registered(ordTable, "o_orderkey")) return (liTable, ordTable)
    System.err.println(s"[layout] bucketing $liTable / $ordTable ...")
    spark.sql(s"DROP TABLE IF EXISTS $liTable")
    spark.sql(s"DROP TABLE IF EXISTS $ordTable")
    // a stale location from a previous JVM blocks saveAsTable with
    // LOCATION_ALREADY_EXISTS even after DROP TABLE (the drop was a
    // no-op in this catalog) — clear it explicitly
    Seq(liTable, ordTable).foreach { t =>
      rmTree(new java.io.File(s"$warehouse/$t"))
    }
    val li = spark.read.parquet(s"$baseDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .repartition(32, col("l_orderkey"))
    graft.sources.Sink.writeBucketed(li, liTable, "l_orderkey",
      numBuckets = 32, sortCol = Some("l_orderkey"))
    val o = spark.read.parquet(s"$baseDir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"))
      .repartition(32, col("o_orderkey"))
    graft.sources.Sink.writeBucketed(o, ordTable, "o_orderkey",
      numBuckets = 32, sortCol = Some("o_orderkey"))
    java.nio.file.Files.write(marker.toPath,
      LayoutGeneratorVersion.toString.getBytes): Unit
    System.err.println(s"[layout] bucketed tables ready")
    (liTable, ordTable)
  }

  /** Date-sorted lineitem with small row groups (the min/max-skipping
    * layout).
    */
  def materializeSorted(
      spark: SparkSession, k: Int, baseDir: String): String = {
    val dir = s"/tmp/graft_soak/x${k}_bydate"
    val marker = new java.io.File(s"$dir/_LAYOUT_SCHEMA")
    if (versionFresh(marker) &&
      new java.io.File(s"$dir/lineitem.parquet/_SUCCESS").exists()) return dir
    rmTree(new java.io.File(dir))
    System.err.println(s"[layout] materializing $dir ...")
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(marker.toPath,
      LayoutGeneratorVersion.toString.getBytes): Unit
    // l_shipday / l_shipts: the DATE and session-TZ TIMESTAMP twins of
    // the TIMESTAMP_NTZ l_shipdate — the column types on which parquet
    // min/max skipping actually works (under the engine's UTC session
    // the LTZ cast preserves every instant bit-for-bit)
    val li = spark.read.parquet(s"$baseDir/lineitem.parquet")
      .withColumn("l_shipday", to_date(col("l_shipdate")))
      .withColumn("l_shipts", col("l_shipdate").cast("timestamp"))
    graft.sources.Sink.writeSorted(li, s"$dir/lineitem.parquet",
      Seq("l_shipdate"), numFiles = 32)
    System.err.println(s"[layout] $dir ready")
    dir
  }

  /** Event table rewritten through the first-ingest normalization pass
    * (Ingest.normalizeTimestamps): micros session-TZ TIMESTAMP,
    * range-clustered on `ts` with 1 MB row groups — the layout an
    * event-time filter can actually skip on. The raw comparison point
    * is the Soak-materialized events table: engine-written micros but
    * UNCLUSTERED (the k-copies expansion interleaves every timestamp
    * into every row group), so its window filter must read everything.
    */
  def materializeEventsNorm(
      spark: SparkSession, k: Int, baseDir: String): String = {
    val dir = s"/tmp/graft_soak/x${k}_events_norm"
    val marker = new java.io.File(s"$dir/_LAYOUT_SCHEMA")
    if (versionFresh(marker) &&
      new java.io.File(s"$dir/events.parquet/_SUCCESS").exists()) return dir
    rmTree(new java.io.File(dir))
    System.err.println(s"[layout] materializing $dir ...")
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(marker.toPath,
      LayoutGeneratorVersion.toString.getBytes): Unit
    graft.sources.Ingest.normalizeTimestamps(spark,
      s"$baseDir/events.parquet", s"$dir/events.parquet",
      tsCols = Seq("ts"), numFiles = 32): Unit
    System.err.println(s"[layout] $dir ready")
    dir
  }

  /** Events rewritten Z-ORDERED on (user_id, event time): the Morton
    * interleave of both filter dimensions min/max-scaled to a shared
    * 16-bit budget (Sink.zValue), range-partitioned + sorted on the
    * code with small row groups. Built FROM the normalized layout so
    * the time column is the pushdown-live micros form — the comparison
    * is layout-vs-layout, never type-vs-type.
    */
  def materializeEventsZorder(
      spark: SparkSession, k: Int, normDir: String): String = {
    val dir = s"/tmp/graft_soak/x${k}_events_zorder"
    val marker = new java.io.File(s"$dir/_LAYOUT_SCHEMA")
    if (versionFresh(marker) &&
      new java.io.File(s"$dir/events.parquet/_SUCCESS").exists()) return dir
    rmTree(new java.io.File(dir))
    System.err.println(s"[layout] materializing $dir ...")
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(marker.toPath,
      LayoutGeneratorVersion.toString.getBytes): Unit
    val e = spark.read.parquet(s"$normDir/events.parquet")
    val tMicros = unix_micros(col("ts"))
    val mm = e.agg(min(col("user_id")), max(col("user_id")),
      min(tMicros), max(tMicros)).head()
    def scale(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
      if (hi == lo) lit(0L)
      else ((c - lit(lo)) * lit(65535L) / lit(hi - lo)).cast("long")
    val z = graft.sources.Sink.zValue(
      scale(col("user_id"), mm.getLong(0), mm.getLong(1)),
      scale(tMicros, mm.getLong(2), mm.getLong(3)), bits = 16)
    graft.sources.Sink.writeZOrderedBy(e, s"$dir/events.parquet", z,
      numFiles = 32)
    System.err.println(s"[layout] $dir ready")
    dir
  }

  // ---- the measured queries ----------------------------------------

  /** Star-ish month join: fact x month dim filtered to the first 3
    * months. On the partitioned layout the dim filter reaches the fact
    * scan as a dynamicpruning partition filter.
    */
  def monthJoin(spark: SparkSession, factDf: DataFrame,
      dimPath: String): DataFrame = {
    val dim = spark.read.parquet(dimPath).filter(col("m_rank") <= 3)
    factDf.join(dim, factDf("l_shipmonth") === dim("m_month"))
      .groupBy(col("m_month"))
      .agg(round(sum(col("l_extendedprice")), 2).as("rev"),
        count(lit(1)).as("n"))
      .orderBy(col("m_month"))
  }

  def revenueJoin(li: DataFrame, o: DataFrame): DataFrame =
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))

  def keyAgg(li: DataFrame): DataFrame =
    li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice")).as("s"), count(lit(1)).as("n"))

  def tsWindowScan(li: DataFrame): DataFrame =
    li.filter(col("l_shipdate") >= lit("1997-03-01") &&
        col("l_shipdate") < lit("1997-04-01"))
      .agg(round(sum(col("l_extendedprice")), 2).as("rev"),
        count(lit(1)).as("n"))

  def dayWindowScan(li: DataFrame): DataFrame =
    li.filter(col("l_shipday") >= lit(java.sql.Date.valueOf("1997-03-01")) &&
        col("l_shipday") < lit(java.sql.Date.valueOf("1997-04-01")))
      .agg(round(sum(col("l_extendedprice")), 2).as("rev"),
        count(lit(1)).as("n"))

  def tsLtzWindowScan(li: DataFrame): DataFrame =
    li.filter(col("l_shipts") >= lit("1997-03-01") &&
        col("l_shipts") < lit("1997-04-01"))
      .agg(round(sum(col("l_extendedprice")), 2).as("rev"),
        count(lit(1)).as("n"))

  /** An 8-hour event-time window out of the one-month corpus (~1/90
    * selectivity): on the time-clustered layout the reader should
    * answer from ~1/90 of the row groups.
    */
  def eventsWindowScan(e: DataFrame): DataFrame =
    e.filter(col("ts") >= lit("2024-01-15 00:00:00") &&
        col("ts") < lit("2024-01-15 08:00:00"))
      .agg(round(sum(col("value")), 2).as("v"), count(lit(1)).as("n"))

  /** The CONJUNCTIVE two-dimension filter (narrow user band AND the
    * 8-hour window): on the time-clustered layout only the time half
    * skips; on the Z-ordered layout every row group is narrow in BOTH
    * dimensions, so min/max stats skip on either predicate.
    */
  def events2dScan(e: DataFrame): DataFrame =
    e.filter(col("user_id") >= 100L && col("user_id") < 200L &&
        col("ts") >= lit("2024-01-15 00:00:00") &&
        col("ts") < lit("2024-01-15 08:00:00"))
      .agg(round(sum(col("value")), 2).as("v"), count(lit(1)).as("n"))

  def main(args: Array[String]): Unit = {
    val scales = args.headOption.filter(_.nonEmpty)
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(10))
    val only: Set[String] = args.drop(1).headOption.filter(_.nonEmpty)
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = GraftSession
      .builder(master = master, shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sink = new java.io.PrintWriter(
      new java.io.FileWriter("soak_results.jsonl", true))
    def emit(line: String): Unit = { println(line); sink.println(line); sink.flush() }

    def countExchanges(df: DataFrame): Int =
      graft.plans.PlanLint.walk(df.queryExecution.executedPlan).count {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
        case _ => false
      }

    def timed(variant: String, scale: Int)(build: => DataFrame): Unit =
      if (only.isEmpty || only(variant)) {
        // a FATAL task error (e.g. SPILL_OUT_OF_MEMORY in an
        // undersized heap) stops the local-mode context; record the
        // remaining variants as skipped instead of dying on
        // addSparkListener (same guard as SkewSoak)
        if (spark.sparkContext.isStopped) {
          emit(s"""{"metric":"layout","scale":$scale,"variant":"$variant","sec":0.0,"input_rows":0,"input_mb":0.0,"shuffle_mb":0.0,"exchanges":-1,"status":"skipped: SparkContext stopped by a prior variant's fatal error"}""")
          return
        }
        System.gc()
        Thread.sleep(2000)
        val clock = new IoClock
        spark.sparkContext.addSparkListener(clock)
        val t0 = System.nanoTime()
        var exchanges = -1
        val res = try {
          val df = build
          df.write.format("noop").mode("overwrite").save()
          exchanges = countExchanges(df)
          "ok"
        } catch { case e: Throwable =>
          Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\n]", " ").take(120)
        }
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1000) // drain the listener bus
        spark.sparkContext.removeSparkListener(clock)
        val rows = clock.inputRows.get()
        val mbIn = clock.inputBytes.get() / 1e6
        val mbShuf = clock.shuffleWriteBytes.get() / 1e6
        emit(f"""{"metric":"layout","scale":$scale,"variant":"$variant","sec":$sec%.3f,"input_rows":$rows,"input_mb":$mbIn%.1f,"shuffle_mb":$mbShuf%.1f,"exchanges":$exchanges,"status":"$res"}""")
      }

    def withConf(key: String, v: String)(body: => Unit): Unit = {
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, v)
      try body finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }

    // codegen/classload warmup on sf0.1 so the first timed variant
    // doesn't absorb compilation
    val warm = "/root/testdata/sf0.1"
    val warmLi = spark.read.parquet(s"$warm/lineitem.parquet")
    val warmO = spark.read.parquet(s"$warm/orders.parquet")
    revenueJoin(warmLi, warmO).write.format("noop").mode("overwrite").save()
    keyAgg(warmLi).write.format("noop").mode("overwrite").save()
    tsWindowScan(warmLi).write.format("noop").mode("overwrite").save()
    dayWindowScan(warmLi.withColumn("l_shipday", to_date(col("l_shipdate"))))
      .write.format("noop").mode("overwrite").save()
    tsLtzWindowScan(warmLi.withColumn("l_shipts",
        col("l_shipdate").cast("timestamp")))
      .write.format("noop").mode("overwrite").save()
    eventsWindowScan(spark.read.parquet(s"$warm/events.parquet"))
      .write.format("noop").mode("overwrite").save()

    // a variant-filtered run materializes (and primes) ONLY the
    // layouts its variants touch — at 1000x the bucketed build alone
    // is a 600M-row sort a scan-only run must not pay
    // (unpart reads the UNpartitioned base but joins the month dim the
    // partitioned layout materializes, so it stays in needPart; the
    // *_unbucketed and scan_unsorted variants read only the base)
    val needPart = only.isEmpty ||
      only.exists(Set("dpp_on", "dpp_off", "part_static", "unpart"))
    val needBuck = only.isEmpty ||
      only.exists(Set("join_bucketed", "join_bucketed_hash",
        "join_bucketed_ordered", "agg_bucketed"))
    val needSort = only.isEmpty || only.exists(_.startsWith("scan_sorted"))
    val needEvents = only.isEmpty || only.exists(_.startsWith("scan_events"))

    for (k <- scales.sorted) {
      val base = Soak.materialize(spark, k, needFacts = true, needDocs = false)
      val part = if (needPart) materializePartitioned(spark, k, base) else ""
      val (liT, ordT) =
        if (needBuck) materializeBucketed(spark, k, base) else ("", "")
      val sorted = if (needSort) materializeSorted(spark, k, base) else ""
      val eventsNorm =
        if (needEvents) materializeEventsNorm(spark, k, base) else ""
      // Prime the page cache for every layout so variant order doesn't
      // decide who pays the disk reads. NOT count(): parquet answers
      // count from footer metadata without touching a data page, so a
      // count() "prime" primes nothing — the first layout-soak run
      // recorded a 2.6x dpp_off-vs-unpart gap that was pure cold-disk
      // order, and flipped sign when re-run order-controlled. Hashing
      // the measured columns forces their pages through the cache.
      def prime(df: DataFrame, cols: Seq[String]): Unit =
        df.agg(sum(hash(cols.map(col): _*).cast("long"))).collect(): Unit
      prime(spark.read.parquet(s"$base/lineitem.parquet"),
        Seq("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"))
      prime(spark.read.parquet(s"$base/orders.parquet"),
        Seq("o_orderkey", "o_orderpriority"))
      if (needPart) prime(spark.read.parquet(s"$part/lineitem.parquet"),
        Seq("l_extendedprice", "l_shipmonth"))
      if (needSort) prime(spark.read.parquet(s"$sorted/lineitem.parquet"),
        Seq("l_extendedprice", "l_shipdate", "l_shipday", "l_shipts"))
      if (needEvents) {
        prime(spark.read.parquet(s"$base/events.parquet"),
          Seq("ts", "value"))
        prime(spark.read.parquet(s"$eventsNorm/events.parquet"),
          Seq("ts", "value"))
      }
      if (needBuck) {
        prime(spark.table(liT),
          Seq("l_orderkey", "l_extendedprice", "l_discount"))
        prime(spark.table(ordT), Seq("o_orderkey", "o_orderpriority"))
      }
      // profile: prove the selections are non-vacuous before trusting
      // the variant rows (3 months of ~84; a ~1-month date window)
      val totalRows = spark.read.parquet(s"$base/lineitem.parquet").count()
      val (nMonths, monthRows) = if (needPart) {
        val factPartAll = spark.read.parquet(s"$part/lineitem.parquet")
        (spark.read.parquet(s"$part/monthdim.parquet").count(),
          monthJoin(spark, factPartAll, s"$part/monthdim.parquet")
            .agg(sum(col("n"))).head().getLong(0))
      } else (-1L, -1L)
      val windowRows = spark.read.parquet(s"$base/lineitem.parquet")
        .filter(col("l_shipdate") >= lit("1997-03-01") &&
          col("l_shipdate") < lit("1997-04-01")).count()
      emit(f"""{"metric":"layout_profile","scale":$k,"rows":$totalRows,"months":$nMonths,"month3_rows":$monthRows,"window_rows":$windowRows}""")

      // ---- 1. partition pruning
      val factPart = if (needPart)
        spark.read.parquet(s"$part/lineitem.parquet") else null
      val dimPath = s"$part/monthdim.parquet"
      timed("dpp_on", k) { monthJoin(spark, factPart, dimPath) }
      // the conf must cover PLANNING AND execution — both happen
      // inside timed's thunk+write, so wrap the whole call
      withConf("spark.sql.optimizer.dynamicPartitionPruning.enabled",
        "false") {
        timed("dpp_off", k) { monthJoin(spark, factPart, dimPath) }
      }
      timed("part_static", k) {
        val months = spark.read.parquet(dimPath).filter(col("m_rank") <= 3)
          .select("m_month").collect().map(_.getString(0)).toSeq
        factPart.filter(col("l_shipmonth").isin(months: _*))
          .groupBy(col("l_shipmonth").as("m_month"))
          .agg(round(sum(col("l_extendedprice")), 2).as("rev"),
            count(lit(1)).as("n"))
          .orderBy(col("m_month"))
      }
      timed("unpart", k) {
        val factBase = spark.read.parquet(s"$base/lineitem.parquet")
          .withColumn("l_shipmonth",
            date_format(col("l_shipdate"), "yyyy-MM"))
        monthJoin(spark, factBase, dimPath)
      }

      // ---- 2. bucketed join / agg
      val liBase = spark.read.parquet(s"$base/lineitem.parquet")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val oBase = spark.read.parquet(s"$base/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority"))
      timed("join_unbucketed", k) { revenueJoin(liBase, oBase) }
      // Bucketing removes the EXCHANGE, not the SORT: since Spark 3.0
      // a bucketed scan does not report per-bucket ordering (merging
      // multi-file buckets would need it), so the sort-merge join
      // re-sorts each bucket IN-TASK — at 1000x that sort is ~19M
      // rows/task and killed an 8g heap (SPILL_OUT_OF_MEMORY, exit
      // 52). The two escapes are measured alongside: a shuffle_hash
      // hint (no exchange AND no sort; builds a per-task hashmap of
      // the small side) and the legacy outputOrdering conf (SMJ
      // trusts the sortBy when every bucket is one file).
      timed("join_bucketed", k) {
        revenueJoin(spark.table(liT), spark.table(ordT))
      }
      timed("join_bucketed_hash", k) {
        revenueJoin(spark.table(liT), spark.table(ordT).hint("shuffle_hash"))
      }
      withConf("spark.sql.legacy.bucketedTableScan.outputOrdering", "true") {
        timed("join_bucketed_ordered", k) {
          revenueJoin(spark.table(liT), spark.table(ordT))
        }
      }
      timed("agg_unbucketed", k) { keyAgg(liBase) }
      timed("agg_bucketed", k) { keyAgg(spark.table(liT)) }

      // ---- 3. sort-clustered scan
      timed("scan_unsorted", k) {
        tsWindowScan(spark.read.parquet(s"$base/lineitem.parquet"))
      }
      timed("scan_sorted_ts", k) {
        tsWindowScan(spark.read.parquet(s"$sorted/lineitem.parquet"))
      }
      timed("scan_sorted_date", k) {
        dayWindowScan(spark.read.parquet(s"$sorted/lineitem.parquet"))
      }
      timed("scan_sorted_tstz", k) {
        tsLtzWindowScan(spark.read.parquet(s"$sorted/lineitem.parquet"))
      }

      // ---- 4. event-time normalization (round 13): the same window
      // filter against the raw (unclustered) events table and the
      // normalizeTimestamps rewrite — input_rows is the claim
      timed("scan_events_raw", k) {
        eventsWindowScan(spark.read.parquet(s"$base/events.parquet"))
      }
      timed("scan_events_norm", k) {
        eventsWindowScan(spark.read.parquet(s"$eventsNorm/events.parquet"))
      }

      // ---- 5. Z-order (round 14): the 2-D conjunctive filter against
      // all three layouts — raw (skips nothing), time-clustered (skips
      // the time half), Z-ordered (skips both) — input_rows is the claim
      if (needEvents) {
        val eventsZ = materializeEventsZorder(spark, k, eventsNorm)
        prime(spark.read.parquet(s"$eventsZ/events.parquet"),
          Seq("user_id", "ts", "value"))
        timed("scan_events_2d_raw", k) {
          events2dScan(spark.read.parquet(s"$base/events.parquet"))
        }
        timed("scan_events_2d_norm", k) {
          events2dScan(spark.read.parquet(s"$eventsNorm/events.parquet"))
        }
        timed("scan_events_2d_zorder", k) {
          events2dScan(spark.read.parquet(s"$eventsZ/events.parquet"))
        }
      }
    }
    sink.close()
    spark.stop()
  }
}
