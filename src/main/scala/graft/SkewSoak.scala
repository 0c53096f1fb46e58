package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skewed-join soak: measure the three answers to a Zipf-hot join key
  * — salting, AQE skew-split, and nothing — against each other and
  * against the uniform-key baseline, on REAL materialized data at
  * 10x/100x (docs/SCALING.md "skew" section holds the recorded
  * results).
  *
  * Why this exists: every prior soak drew join keys shifted-uniform,
  * so `saltedJoin` and `spark.sql.adaptive.skewJoin` — the two
  * operators whose whole purpose is surviving a hot key — had never
  * been measured in the regime they exist for. A 100 TB corpus always
  * has a hot key (the null surrogate, the default account, the
  * crawler's favourite domain).
  *
  * Data: `lineitem` at scale k with `l_orderkey` REDRAWN from the
  * actual orders-key population under a Zipf(1.1)-tail law (inverse-
  * CDF of the continuous Pareto: rank = ⌊u^(-1/(s-1))⌋ = ⌊u^-10⌋,
  * capped at the key count; rank 1 is the hottest key, carrying ~6.5%
  * of all rows — the measured share is emitted, not assumed). Ranks
  * map to real `o_orderkey` values via a hash-shuffled rank table, so
  * the standing `q_salted_join_agg` / plain-join pipelines run
  * UNCHANGED against the skewed directory: same orders side, same
  * aggregation, only the fact side's key histogram differs.
  *
  * Variants, each a cold pass over the same skewed fact:
  *  - `plain`  — sort-merge join, AQE skew-split DISABLED: the
  *    degenerate baseline where one reducer drags the stage.
  *  - `aqe`    — sort-merge join, AQE skew-split enabled (the
  *    GraftSession default): runtime re-plan splits the hot
  *    partition.
  *  - `salted4` / `salted16` — `Temporal.saltedJoinRevenue` with the
  *    explicit salt: the hot key is split across nSalt reducers at
  *    PLAN time.
  *  - `uniform` — the same plain join over the UNSKEWED lineitem of
  *    the same scale: what the join costs when no key is hot (the
  *    "salted ≤ ~1.5x uniform" target).
  *
  * Each variant reports wall seconds plus the task-level skew ratio
  * (max task runtime / median task runtime of the stage holding the
  * longest task, from a SparkListener) — wall time says WHether skew
  * hurt; the ratio says WHY (one task dragging vs everything slow).
  *
  * Usage: runMain graft.SkewSoak [scales] — default "10".
  * Appends JSON lines to soak_results.jsonl like the main Soak.
  */
object SkewSoak {

  /** Per-stage task durations, for the skew ratio. */
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
    /** (max task ms, median task ms) of the stage with the longest task. */
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

  private def copyDir(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    java.nio.file.Files.createDirectories(d)
    java.nio.file.Files.list(s).forEach { p =>
      java.nio.file.Files.copy(p, d.resolve(p.getFileName),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    }
  }

  /** Build (once) the skewed twin of the x<k> soak dir: same orders,
    * lineitem with Zipf-redrawn l_orderkey.
    */
  /** Bump when the zipf generator's SEMANTICS change — same discipline
    * as Soak.GeneratorVersion (a stale layout silently reused would
    * invalidate the measurements). v2 = wrapped (not capped) Pareto
    * tail; v3 = join-free rank→key mapping (multiplicative
    * permutation of the dense key domain instead of a materialized
    * rank table — the v2 rank join's shuffle spill is what killed the
    * 1000x decade ~25 GB short of disk, VERDICT r9 item 4).
    */
  val SkewGeneratorVersion = 3

  def materializeSkew(spark: SparkSession, k: Int, baseDir: String): String = {
    val dir = s"/tmp/graft_soak/x${k}_zipf"
    val marker = new java.io.File(s"$dir/_SKEW_SCHEMA")
    val fresh = marker.exists() && scala.util.Try(
      new String(java.nio.file.Files.readAllBytes(marker.toPath)).trim.toInt
    ).getOrElse(-1) == SkewGeneratorVersion
    if (fresh &&
      new java.io.File(s"$dir/lineitem.parquet/_SUCCESS").exists()) return dir
    // stale or partial: rebuild wholesale
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
    System.err.println(s"[skew] materializing $dir ...")
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(marker.toPath,
      SkewGeneratorVersion.toString.getBytes): Unit
    copyDir(s"$baseDir/orders.parquet", s"$dir/orders.parquet")
    val orders = spark.read.parquet(s"$baseDir/orders.parquet")
    // Soak's scaled orders keys are a CLOSED FORM — copy c of the base
    // table shifts keys by c·1e8, and the base keys are dense 0..B-1 —
    // so rank→key needs no materialized table at all: dense index
    // j = (rank-1)·A mod N (A coprime to N → a bijection that scatters
    // the Zipf head pseudo-randomly), then key = (j/B)·1e8 + j%B.
    // The whole skew redraw is ONE map over lineitem: no join, no
    // shuffle, no spill — v2's rank-table join shuffled the entire
    // fact and was the 1000x disk killer.
    val baseKeys = orders.where(col("o_orderkey") < 100000000L).count()
    val nKeys = orders.count()
    val copies = nKeys / baseKeys
    // guard the closed form before trusting it (generator drift would
    // silently produce keys that don't exist in orders)
    val probe = orders.agg(min(col("o_orderkey")), max(col("o_orderkey")))
      .head()
    require(probe.getLong(0) == 0L &&
      probe.getLong(1) == (copies - 1) * 100000000L + baseKeys - 1 &&
      nKeys == copies * baseKeys,
      s"orders keys not in Soak's closed form (n=$nKeys base=$baseKeys " +
        s"min=${probe.getLong(0)} max=${probe.getLong(1)}): " +
        "rebuild the base layout or revisit the permutation mapping")
    // multiplier: Knuth's 2654435761 bumped to the next value coprime
    // with N (N = 150000·k·copies has small factors; any odd A not
    // sharing 3/5 works — computed, not assumed)
    var mult = 2654435761L % nKeys
    while (BigInt(mult).gcd(BigInt(nKeys)) != 1) mult += 1
    val li = spark.read.parquet(s"$baseDir/lineitem.parquet")
    // u in (0,1): per-row deterministic uniform; raw = floor(u^-10) is
    // the inverse-CDF Pareto tail matching Zipf s=1.1 (P(rank 1) =
    // 1 - 2^-0.1 ≈ 6.7%). The unbounded tail is WRAPPED into the key
    // domain (mod, not cap): capping would pile the entire far tail
    // (~24% of rows at 10x) onto the single capped rank, which is a
    // different — far harsher — distribution than Zipf; wrapping folds
    // it near-uniformly across all keys, preserving the head.
    val u = (pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
      lit(1000000000L)).cast("double") + lit(0.5)) / lit(1000000000.0)
    val raw = least(floor(pow(u, lit(-10.0))), lit(9.0e15)).cast("long")
    val rank = pmod(raw - lit(1L), lit(nKeys)) + lit(1L)
    val dense = pmod((rank - lit(1L)) * lit(mult), lit(nKeys))
    val key = floor(dense / lit(baseKeys)).cast("long") * lit(100000000L) +
      pmod(dense, lit(baseKeys))
    li.withColumn("l_orderkey", key)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    System.err.println(s"[skew] $dir ready (join-free v3, mult=$mult)")
    dir
  }

  /** The unsalted join with a pinned shuffle-merge strategy, same
    * aggregation as `Temporal.saltedJoinRevenue`.
    */
  private def plainRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
    val o = graft.sources.Tables.load(spark, dir, "orders")
    li.join(o.hint("shuffle_merge"), li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }

  def main(args: Array[String]): Unit = {
    val scales = args.headOption.filter(_.nonEmpty)
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(10))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = GraftSession
      .builder(master = master, shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sink = new java.io.PrintWriter(
      new java.io.FileWriter("soak_results.jsonl", true))
    def emit(line: String): Unit = { println(line); sink.println(line); sink.flush() }

    // optional second arg: run only these comma-separated variants
    // (the layouts and profile still materialize) — lets a new variant
    // be measured without re-timing the whole decade.
    val only: Set[String] = args.drop(1).headOption.filter(_.nonEmpty)
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty)

    def timed(variant: String, scale: Int, skewOn: Boolean)
        (run: => Unit): Unit = if (only.isEmpty || only(variant)) {
      // a FATAL task error (e.g. SparkOutOfMemoryError when the sort
      // spill hits ENOSPC) stops the local-mode context; without this
      // guard the next variant dies on addSparkListener and every
      // remaining row is lost instead of recorded as skipped.
      if (spark.sparkContext.isStopped) {
        emit(s"""{"metric":"skew","scale":$scale,"variant":"$variant","sec":0.0,"task_max_ms":0,"task_med_ms":0,"ratio":0.0,"status":"skipped: SparkContext stopped by a prior variant's fatal error"}""")
      } else timedRun(variant, scale, skewOn)(run)
    }

    def timedRun(variant: String, scale: Int, skewOn: Boolean)
        (run: => Unit): Unit = {
      // release the PREVIOUS variant's shuffle files before timing the
      // next: at 1000x each join shuffles ~15 GB, and five variants'
      // worth of dead shuffle data would exhaust the scratch disk the
      // join-free v3 generator just reclaimed (ContextCleaner removes
      // shuffle dirs only after the owning objects are collected).
      System.gc()
      Thread.sleep(2000)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      val clock = new TaskClock
      spark.sparkContext.addSparkListener(clock)
      val t0 = System.nanoTime()
      val res = try { run; "ok" } catch { case e: Throwable =>
        Option(e.getMessage).getOrElse(e.getClass.getName)
          .replaceAll("[\"\\n]", " ").take(120)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // drain the listener bus
      spark.sparkContext.removeSparkListener(clock)
      val (maxMs, medMs) = clock.skewRatio()
      val ratio = if (medMs > 0) maxMs.toDouble / medMs else 0.0
      emit(f"""{"metric":"skew","scale":$scale,"variant":"$variant","sec":$sec%.3f,"task_max_ms":$maxMs,"task_med_ms":$medMs,"ratio":$ratio%.1f,"status":"$res"}""")
    }

    // codegen/classload warmup on sf0.1 (same plan shapes, different
    // dir) so the FIRST timed variant doesn't absorb compilation —
    // without this the run order masquerades as a skew effect.
    val warm = "/root/testdata/sf0.1"
    plainRevenue(spark, warm).write.format("noop").mode("overwrite").save()
    graft.operators.Temporal.saltedJoinRevenue(spark, warm, nSalt = 4)
      .write.format("noop").mode("overwrite").save()

    for (k <- scales.sorted) {
      val base = Soak.materialize(spark, k, needFacts = true, needDocs = false)
      val skew = materializeSkew(spark, k, base)
      // prime the page cache for BOTH fact layouts so variant order
      // doesn't decide who pays the disk reads
      spark.read.parquet(s"$base/lineitem.parquet").count(): Unit
      // measured hot-key share (assumed nothing): top key rows / total
      val total = spark.read.parquet(s"$skew/lineitem.parquet").count()
      val top = spark.read.parquet(s"$skew/lineitem.parquet")
        .groupBy("l_orderkey").count()
        .agg(max(col("count"))).head().getLong(0)
      emit(f"""{"metric":"skew_profile","scale":$k,"rows":$total,"top_key_rows":$top,"top_share":${top.toDouble / total}%.4f}""")

      def noop(df: DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()

      timed("uniform", k, skewOn = false) { noop(plainRevenue(spark, base)) }
      timed("plain", k, skewOn = false) { noop(plainRevenue(spark, skew)) }
      timed("aqe", k, skewOn = true) { noop(plainRevenue(spark, skew)) }
      // AQE with the split trigger TUNED to this skew: the default
      // trigger is hot > 5x median AND > 256 MB, but a 6.7%-share hot
      // key over 32 reducers is only ~3x the median partition — AQE
      // ships and does nothing (the `aqe` row above measures exactly
      // that). factor=2 + 64 MB makes the trigger match the observed
      // skew; on a real cluster this is a per-job tuning knob, not a
      // code change.
      def aqeWith(factor: String, threshold: String)(body: => Unit): Unit = {
        val fKey = "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
        val bKey =
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        val f0 = spark.conf.getOption(fKey); val b0 = spark.conf.getOption(bKey)
        spark.conf.set(fKey, factor); spark.conf.set(bKey, threshold)
        try body
        finally {
          f0.fold(spark.conf.unset(fKey))(spark.conf.set(fKey, _))
          b0.fold(spark.conf.unset(bKey))(spark.conf.set(bKey, _))
        }
      }
      timed("aqe_tuned", k, skewOn = true) {
        aqeWith("2.0", "64m") { noop(plainRevenue(spark, skew)) }
      }
      // ProbeSkewAqe finding: the detector compares shuffle BYTES, and
      // an identical hot key lz4-compresses ~2x better than uniform
      // keys — a 2.9x ROW skew reads as 1.95x in bytes, so factor 2.0
      // never fires. 1.2/16m is the setting the measured byte
      // histogram says will trigger (and at 100x the hot partition is
      // smaller than the 64 MB advisory chunk, so no split is even
      // constructible — splitting needs >1 target-size chunk).
      timed("aqe_split", k, skewOn = true) {
        aqeWith("1.2", "16m") { noop(plainRevenue(spark, skew)) }
      }
      // the advisor's own recommendation, measured end-to-end: advise
      // on the skewed fact (row histogram + haircut), apply the
      // returned trigger, run the same join. The advise() cost is
      // deliberately INSIDE the timing — it is part of what the
      // mitigation costs a real pipeline.
      timed("aqe_advised", k, skewOn = true) {
        val li = graft.sources.Tables.load(spark, skew, "lineitem")
        val advice = graft.operators.SkewAdvisor.advise(
          li, Seq(col("l_orderkey")), nPartitions = 32,
          bytesPerRow =
            graft.operators.SkewAdvisor.estimateBytesPerRow(
              li.select(col("l_orderkey"), col("l_extendedprice"),
                col("l_discount"))),
          sampleFraction = 0.02)
        System.err.println(s"[skew] advisor: $advice")
        val aKeys = Seq(
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes")
        val saved = aKeys.map(k0 => k0 -> spark.conf.getOption(k0))
        advice.applyTo(spark): Unit
        try noop(plainRevenue(spark, skew))
        finally saved.foreach { case (k0, v) =>
          v.fold(spark.conf.unset(k0))(spark.conf.set(k0, _)) }
      }
      timed("salted4", k, skewOn = false) {
        noop(graft.operators.Temporal.saltedJoinRevenue(spark, skew, nSalt = 4))
      }
      // ---- AGGREGATION under the same Zipf key (VERDICT r9 item 5).
      // Three aggregate classes, because "skewed groupBy" is not one
      // phenomenon:
      //  * algebraic (sum/count) — map-side partial aggregation folds
      //    the hot key to one row per map task BEFORE the shuffle, so
      //    the reducer sees ~nTasks rows per key. Expectation: flat;
      //    measured to confirm, and the salted twin quantifies what
      //    plan-time salting COSTS when it isn't needed.
      //  * holistic (exact median) — percentile buffers every value of
      //    a group on ONE reducer; the hot key's buffer is ~6.7% of
      //    the corpus. No mergeable partial exists, AQE cannot split
      //    an aggregation, and salting cannot decompose a median. The
      //    scale answer is the MERGEABLE SKETCH (percentile_approx,
      //    GK) — measured beside it.
      //  * exact distinct (count(DISTINCT v)) — Spark plans the dedup
      //    shuffle on (key, VALUE), which spreads the hot key across
      //    reducers structurally; the value-salted two-phase rewrite
      //    is the same idea made explicit. Expectation: both flat.
      def aggSum(dir: String): DataFrame =
        graft.sources.Tables.load(spark, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_extendedprice")).as("s"), count(lit(1)).as("n"))
      def aggSumSalted(dir: String, nSalt: Int): DataFrame =
        graft.sources.Tables.load(spark, dir, "lineitem")
          .groupBy(col("l_orderkey"),
            pmod(xxhash64(col("l_linenumber"), col("l_partkey")), lit(nSalt))
              .as("__salt"))
          .agg(sum(col("l_extendedprice")).as("ps"), count(lit(1)).as("pn"))
          .groupBy(col("l_orderkey"))
          .agg(sum(col("ps")).as("s"), sum(col("pn")).as("n"))
      def aggMedian(dir: String): DataFrame =
        graft.sources.Tables.load(spark, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(expr("percentile(l_extendedprice, 0.5)").as("med"))
      def aggMedianSketch(dir: String): DataFrame =
        graft.sources.Tables.load(spark, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(expr("percentile_approx(l_extendedprice, 0.5, 100)").as("med"))
      // the count-map escape hatch closed: a per-row-distinct value
      // (hash noise at 1e-9) forces percentile to buffer every VALUE
      // of the hot key in one reducer — the regime where the exact
      // path's round-10 survival story breaks and the mergeable
      // sketch is REQUIRED, not just faster.
      def hcValue = col("l_extendedprice") +
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(1000000L))
          .cast("double") * lit(1e-9)
      def aggMedianHC(dir: String): DataFrame =
        graft.sources.Tables.load(spark, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(percentile_approx(hcValue, lit(0.5), lit(100)).as("med"))
      def aggMedianHCExact(dir: String): DataFrame =
        graft.sources.Tables.load(spark, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(expr("percentile(l_extendedprice + cast(pmod(xxhash64(l_orderkey, l_linenumber), 1000000) as double) * 1e-9, 0.5)").as("med"))
      def aggDistinct(dir: String): DataFrame =
        graft.sources.Tables.load(spark, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(countDistinct(col("l_partkey")).as("nd"))
      def aggDistinctSalted(dir: String, nSalt: Int): DataFrame =
        graft.sources.Tables.load(spark, dir, "lineitem")
          .groupBy(col("l_orderkey"),
            pmod(xxhash64(col("l_partkey")), lit(nSalt)).as("__salt"))
          .agg(countDistinct(col("l_partkey")).as("pd"))
          .groupBy(col("l_orderkey"))
          .agg(sum(col("pd")).as("nd"))

      timed("aggsum_uniform", k, skewOn = false) { noop(aggSum(base)) }
      timed("aggsum_plain", k, skewOn = false) { noop(aggSum(skew)) }
      timed("aggsum_salted8", k, skewOn = false) { noop(aggSumSalted(skew, 8)) }
      timed("aggmed_uniform", k, skewOn = false) { noop(aggMedian(base)) }
      timed("aggmed_plain", k, skewOn = false) { noop(aggMedian(skew)) }
      timed("aggmed_sketch", k, skewOn = false) { noop(aggMedianSketch(skew)) }
      // sketch first: the exact variant's hot-key buffer (~25 B per
      // distinct value, 40M values at 1000x) can be fatal, and a
      // fatal variant takes the context with it
      // the round-11 third answer: exact AND memory-bounded — value-
      // domain narrowing (Quantiles.exactMedianAnyScale) takes the
      // classic count-map for every key under the threshold and
      // histogram refinement (O(buckets) state) for the hot keys, so
      // the decade that kills aggmedhc_exact's 40M-entry buffer can't
      // kill this one. Timed with the same per-row-distinct value.
      def aggMedianHCNarrow(dir: String): DataFrame =
        graft.operators.Quantiles.exactMedianAnyScale(
          graft.sources.Tables.load(spark, dir, "lineitem")
            .select(col("l_orderkey"), hcValue.as("__hc")),
          "l_orderkey", "__hc", hotThreshold = 1000000L)
      timed("aggmedhc_sketch", k, skewOn = false) { noop(aggMedianHC(skew)) }
      timed("aggmedhc_exact", k, skewOn = false) { noop(aggMedianHCExact(skew)) }
      timed("aggmedhc_narrow", k, skewOn = false) { noop(aggMedianHCNarrow(skew)) }
      // weighted twins on the same per-row-distinct value, quantity
      // weights: `sort` is the window-cumsum replay (q_weighted_median's
      // shape — the Zipf hot key's rows sort in ONE window task, the
      // wall this family measures), `narrow` the round-12 weighted
      // narrowing through the Quantiles.auto front door
      def wmedInput(dir: String): DataFrame =
        graft.sources.Tables.load(spark, dir, "lineitem")
          .select(col("l_orderkey"), hcValue.as("__hc"),
            col("l_quantity").cast("long").as("__w"))
      def aggWMedianHCSort(dir: String): DataFrame = {
        val byV = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_orderkey")).orderBy(col("__hc"))
        val all = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_orderkey"))
        wmedInput(dir)
          .withColumn("__cw", sum(col("__w")).over(byV))
          .withColumn("__tw", sum(col("__w")).over(all))
          .filter(col("__cw") * 2 >= col("__tw"))
          .groupBy(col("l_orderkey"))
          .agg(min(col("__hc")).as("wmed"))
      }
      def aggWMedianHCNarrow(dir: String): DataFrame =
        graft.operators.Quantiles.auto(wmedInput(dir),
          "l_orderkey", "__hc", Seq(0.5), weight = Some("__w"),
          hotThreshold = 1000000L,
          route = graft.operators.Quantiles.HotRoute.Narrow)
      // round-13 router leg: DEFAULT route — the cost model must pick
      // the better variant per decade on this host (the single wide
      // host is the replay's regime at every decade measured so far),
      // landing within ~1.1x of whichever of sort/narrow wins
      def aggWMedianHCAuto(dir: String): DataFrame =
        graft.operators.Quantiles.auto(wmedInput(dir),
          "l_orderkey", "__hc", Seq(0.5), weight = Some("__w"),
          hotThreshold = 1000000L)
      timed("aggwmedhc_sort", k, skewOn = false) { noop(aggWMedianHCSort(skew)) }
      timed("aggwmedhc_narrow", k, skewOn = false) {
        noop(aggWMedianHCNarrow(skew))
      }
      timed("aggwmedhc_auto", k, skewOn = false) {
        noop(aggWMedianHCAuto(skew))
      }
      // bracket leg: the replay re-timed AFTER auto in the same
      // process, so an auto-vs-sort gap can be split into real plan
      // cost vs within-run drift (page-cache/spill regime — this
      // host's known 4x wobble)
      timed("aggwmedhc_sort2", k, skewOn = false) {
        noop(aggWMedianHCSort(skew))
      }
      timed("aggdist_uniform", k, skewOn = false) { noop(aggDistinct(base)) }
      timed("aggdist_plain", k, skewOn = false) { noop(aggDistinct(skew)) }
      timed("aggdist_salted8", k, skewOn = false) {
        noop(aggDistinctSalted(skew, 8))
      }
      // LAST on purpose: the 16x-replicated orders side is the
      // largest sort spill of the decade — at 1000x it can hit ENOSPC
      // on this host's scratch disk, and SparkOutOfMemoryError is
      // FATAL to a local-mode context (both r10 attempts died here).
      // Running it last means a fatal ending costs only this row.
      timed("salted16", k, skewOn = false) {
        noop(graft.operators.Temporal.saltedJoinRevenue(spark, skew, nSalt = 16))
      }
    }
    sink.close()
    spark.stop()
  }
}
