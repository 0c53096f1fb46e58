package graft

import org.apache.spark.sql.functions._

/** The exact-median memory boundary, measured instead of extrapolated.
  *
  * Round 10 measured (`aggmedhc_*`, docs/SCALING.md): a hot key with
  * 40M distinct values completes the classic exact median
  * (`percentile`, a per-group count-map) on a 48 GB heap at 1.52x the
  * GK sketch — and concluded "one more decade puts exact past executor
  * memory". That conclusion was an extrapolation. This probe measures
  * it: a corpus with ONE hot key holding `hotMillions` distinct values
  * (median analytically known) plus 1M background keys is written once,
  * then each variant runs in its own child JVM with an EXECUTOR-SIZED
  * heap (`-Xmx<heapGb>g`, `-XX:+ExitOnOutOfMemoryError` so a fatal
  * buffer dies crisply instead of GC-thrashing):
  *
  *  - `exact`  — `percentile(v, 0.5)`: buffers every distinct value of
  *    the hot key in one in-task count-map that no spill path covers
  *    (sort-based fallback spills across GROUPS, not within one).
  *  - `sketch` — `percentile_approx` (GK): the mergeable estimate.
  *  - `narrow` — [[graft.operators.Quantiles.exactMedianAnyScale]]:
  *    exact, O(buckets) per hot key by value-domain narrowing.
  *  - `auto`   — [[graft.operators.Quantiles.auto]] with DEFAULT
  *    knobs: the one front door must route the hot key to narrowing
  *    and survive the same wall with no tuning.
  *  - `wnarrow` — `auto` with `weight = Some("w")` (alternating 1/2
  *    weights, its own closed form): the weighted narrowing twin at
  *    the same scale.
  *  - `wsort`  — the window-cumsum weighted-median replay
  *    (q_weighted_median's shape): window sorts SPILL, so this
  *    measures the serialized hot-key task cost in an executor-sized
  *    heap rather than an OOM boundary.
  *
  * The parent verifies the surviving variants' hot-key median against
  * the closed form (values are 1000 + i·1e-6 for i in [0, n): median =
  * 1000 + (n−1)/2 · 1e-6) and appends one JSON row per variant to
  * soak_results.jsonl (`metric=median_edge`).
  *
  * Usage: runMain graft.MedianEdge [hotMillions] [heapGb] [variants]
  * — defaults 50, 4, all three.
  */
object MedianEdge {

  def main(args: Array[String]): Unit =
    if (args.headOption.contains("child")) child(args(1), args(2))
    else parent(
      args.headOption.map(_.toInt).getOrElse(50),
      args.drop(1).headOption.map(_.toInt).getOrElse(4),
      args.drop(2).headOption.map(_.split(",").toSet)
        .getOrElse(Set("narrow", "sketch", "exact", "auto",
          "wnarrow", "wauto", "wsketch", "wsort")))

  private def parent(hotMillions: Int, heapGb: Int, variants: Set[String]): Unit = {
    val hotN = hotMillions * 1000000L
    // "2": corpus schema v2 carries an alternating 1/2 weight column
    // for the weighted-narrowing leg (old dirs lack it)
    val dir = s"/tmp/graft_soak/median_edge2_h${hotMillions}m"
    val marker = new java.io.File(s"$dir/_SUCCESS")
    if (!marker.exists()) {
      val spark = GraftSession.builder(master = "local[32]",
        shufflePartitions = 32).getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      // hot key 0: n strictly-distinct values with a closed-form median;
      // background: 1M keys x 10 rows through the classic small-key
      // path; w alternates 1/2 so the weighted leg has a closed form
      // that is NOT the unweighted one
      val hot = spark.range(hotN)
        .select(lit(0L).as("k"), (lit(1000.0) + col("id") * lit(1e-6)).as("v"),
          (lit(1L) + col("id") % 2L).as("w"))
      val bg = spark.range(10000000L)
        .select((col("id") % 1000000L + 1L).as("k"),
          (col("id") % 1000L).cast("double").as("v"),
          (lit(1L) + col("id") % 2L).as("w"))
      hot.unionByName(bg).repartition(32)
        .write.mode("overwrite").parquet(dir)
      spark.stop()
    }
    val expected = 1000.0 + (hotN - 1) / 2.0 * 1e-6
    // lower weighted median closed form: w(i) = 1 + (i % 2), so
    // cumw(i) = #even≤i + 2·#odd≤i; answer = v at the smallest i with
    // cumw(i) ≥ ⌈W/2⌉ (binary search over the closed-form cumsum)
    val expectedW = {
      def cumw(i: Long): Long = (i / 2 + 1) + 2 * ((i + 1) / 2)
      val target = (cumw(hotN - 1) + 1) / 2
      var lo = 0L; var hi = hotN - 1
      while (lo < hi) {
        val m = (lo + hi) / 2
        if (cumw(m) >= target) hi = m else lo = m + 1
      }
      1000.0 + lo * 1e-6
    }

    val sink = new java.io.PrintWriter(
      new java.io.FileWriter("soak_results.jsonl", true))
    def emit(line: String): Unit = { println(line); sink.println(line); sink.flush() }

    // narrow first: the success row lands even if a fatal variant
    // destabilizes the host; each variant is its own JVM regardless.
    // `auto`/`wnarrow` run with DEFAULT knobs — the front door must
    // survive the wall with no tuning.
    Seq("narrow", "auto", "wnarrow", "wauto", "wsketch", "wsort",
      "sketch", "exact").filter(variants)
      .foreach { variant =>
      val cmd = Seq("java") ++ ClusterBench.jvmOpens ++ Seq(
        s"-Xmx${heapGb}g", "-XX:+ExitOnOutOfMemoryError",
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-cp", new java.io.File("target/scala-2.13/classes").getAbsolutePath +
          ":/opt/spark/jars/*",
        "graft.MedianEdge", "child", variant, dir)
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_HOME", "/opt/spark")
      pb.environment().put("SPARK_SCALA_VERSION", "2.13")
      val p = pb.start()
      val outF = java.util.concurrent.CompletableFuture.supplyAsync(() =>
        new String(p.getInputStream.readAllBytes()))
      val errF = java.util.concurrent.CompletableFuture.supplyAsync(() =>
        new String(p.getErrorStream.readAllBytes()))
      val finished = p.waitFor(1200, java.util.concurrent.TimeUnit.SECONDS)
      if (!finished) p.destroyForcibly().waitFor(): Unit
      val rc = if (finished) p.exitValue() else -1
      val out = outF.get()
      val marker = out.linesIterator.find(_.startsWith("MEDIAN_EDGE_OK "))
      // a garbled marker line (e.g. interleaved child stdout) records a
      // fatal row for THIS variant instead of crashing the whole sweep
      val parsed = marker.flatMap { m =>
        scala.util.Try {
          // parse ALL numeric tokens: a marker garbled in sec/rows
          // would otherwise interpolate non-JSON into the artifact
          val Array(_, _, sec, med, rows) = m.trim.split(" ")
          (sec.toDouble, med.toDouble, rows.toLong)
        }.toOption
      }
      val row = parsed match {
        case Some((sec, med, rows)) =>
          val want = if (variant.startsWith("w")) expectedW else expected
          val err = math.abs(med - want) / want
          // exact variants must hit the closed form; the sketch records
          // its observed error (GK is approximate by construction)
          require(variant == "sketch" || variant == "wsketch" || err < 1e-12,
            s"$variant hot-key median ${med} != closed form $want")
          f"""{"metric":"median_edge","variant":"$variant","hot_distinct":$hotN,"heap_gb":$heapGb,"sec":$sec%.2f,"rows":$rows,"hot_median_relerr":$err%.2e,"status":"ok"}"""
        case None =>
          val why =
            if (!finished) "timeout-1200s"
            else if (errF.get().contains("OutOfMemoryError") || rc == 3)
              "oom" // ExitOnOutOfMemoryError exits 3; message may be on stderr
            else if (marker.isDefined) "garbled-marker"
            else s"rc=$rc"
          f"""{"metric":"median_edge","variant":"$variant","hot_distinct":$hotN,"heap_gb":$heapGb,"sec":null,"status":"fatal:$why"}"""
      }
      emit(row)
    }
    sink.close()
  }

  private def child(variant: String, dir: String): Unit = {
    val spark = GraftSession.builder(master = "local[8]",
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(dir)
    val t0 = System.nanoTime()
    val res = variant match {
      case "exact" =>
        df.groupBy(col("k")).agg(expr("percentile(v, 0.5)").as("median"))
      case "sketch" =>
        df.groupBy(col("k"))
          .agg(expr("percentile_approx(v, 0.5, 100)").as("median"))
      case "narrow" =>
        graft.operators.Quantiles.exactMedianAnyScale(
          df, "k", "v", hotThreshold = 1000000L)
      case "auto" => // the front door, DEFAULT knobs
        graft.operators.Quantiles.auto(df, "k", "v", Seq(0.5))
          .select(col("k"), col("quantile").as("median"))
      case "wnarrow" => // the weighted narrowing, route pinned
        graft.operators.Quantiles.auto(df, "k", "v", Seq(0.5),
            weight = Some("w"),
            route = graft.operators.Quantiles.HotRoute.Narrow)
          .select(col("k"), col("quantile").as("median"))
      case "wauto" => // weighted front door, DEFAULT knobs: the
        // round-13 cost router must pick the NARROWING in this
        // executor-sized (4 GiB) JVM — the regime where the replay's
        // spilling sort task loses 3.8x (docs/SCALING.md) — with no
        // tuning, and still hit the closed form exactly
        graft.operators.Quantiles.auto(df, "k", "v", Seq(0.5),
            weight = Some("w"))
          .select(col("k"), col("quantile").as("median"))
      case "wsketch" => // the round-13 bounded-error weighted sketch:
        // priority sampling through the front door; approximate, so
        // the parent records its observed error instead of requiring
        // the closed form (v is distinct within the hot key, so
        // (k, v) identifies a hot row for the deterministic draw)
        graft.operators.Quantiles.auto(df, "k", "v", Seq(0.5),
            mode = graft.operators.Quantiles.QuantileMode.Sketch(10000),
            weight = Some("w"), ident = Seq("k", "v"))
          .select(col("k"), col("quantile").as("median"))
      case "wsort" =>
        // the window-cumsum replay (q_weighted_median's shape): the
        // honest comparison point — window sorts SPILL (unlike
        // percentile's count-map), so its failure mode is the
        // serialized hot-key task, not memory; measure whether it
        // completes in the executor-sized heap and at what wall cost
        val byV = org.apache.spark.sql.expressions.Window
          .partitionBy(col("k")).orderBy(col("v"))
        val all = org.apache.spark.sql.expressions.Window
          .partitionBy(col("k"))
        df.withColumn("cw", sum(col("w")).over(byV))
          .withColumn("tw", sum(col("w")).over(all))
          .filter(col("cw") * 2 >= col("tw"))
          .groupBy(col("k")).agg(min(col("v")).as("median"))
      case other => sys.error(s"unknown variant $other")
    }
    // one execution: all group medians come back (1M rows, ~16 MB)
    val all = res.select(col("k"), col("median").cast("double")).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    val hotMed = all.find(_.getLong(0) == 0L).get.getDouble(1)
    println(f"MEDIAN_EDGE_OK $variant $sec%.2f $hotMed%.9f ${all.length}")
    spark.stop()
  }
}
