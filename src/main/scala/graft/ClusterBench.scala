package graft

/** Multi-JVM mini-bench: the 12 scale-critical queries (the same set
  * the round-7 local-cluster soak validated — scan-agg, the four join
  * shapes, sessionize, the five steepest dedup/text families,
  * sim_rp_lsh) run COLD, one pass each, under
  * `local-cluster[4,8,8192]` — four real executor JVMs, so every
  * number includes cross-process task serialization, broadcast
  * distribution, and real shuffle block transfer.
  *
  * Bench spawns this as a subprocess per round (a local-cluster
  * context cannot coexist with Bench's local[32] context in one JVM)
  * and folds the result into its machine line as the `cluster12`
  * block, so a regression that only bites under real executors —
  * exactly the class the round-7 soak caught (an executor-fatal
  * broadcast masked by local[n] reference-sharing) — shows up in the
  * per-round artifact instead of waiting for an ad-hoc soak.
  *
  * Usage: graft.ClusterBench <dataDir>. Emits per-query lines, a
  * steal-gate meta line `CLUSTER12META {"quiet":...,"pass_steal":[...],
  * "pass_quiet":[...]}`, and one machine-readable line
  * `CLUSTER12 {"q":sec,...}`; exits non-zero if any query fails.
  */
object ClusterBench {

  val queries12: Seq[String] = Seq(
    "q1_pricing_summary", "q_asof_join", "q_range_join",
    "q_salted_join_agg", "q_star_join_agg", "q_sessionize",
    "text_quality", "dedup_span", "dedup_ngram_jaccard",
    "dedup_minhash_oph", "dedup_containment", "sim_rp_lsh",
    // round 13: the narrowing quantile family across REAL executor
    // JVMs — its per-pass driver round trips and broadcast key tables
    // are exactly the shape only multi-process timing regresses on
    "q_median_narrow", "q_weighted_median_narrow",
    // round 13 (late session): the span-merge dedup — its dup-hash
    // equi-join + per-doc island window is the newest shuffle-heavy
    // shape, so it earns a real-executor timing too
    "dedup_substring")

  /** JDK17 module opens Spark needs — same list sbt's forked JVMs and
    * ExecutorLossSpec use; exposed so Bench can build the subprocess
    * command without duplicating it.
    */
  val jvmOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.error("usage: graft.ClusterBench <dataDir>"))
    val master =
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[4,8,8192]")
    // Executors are raw worker-launched JVMs: the engine classes must
    // ride spark.executor.extraClassPath (CLUSTER.md §5 classpath
    // gotcha — the failure mode is a misleading serialization CCE).
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val spark = GraftSession.builder(master = master, shufflePartitions = 32)
      .config("spark.executor.extraClassPath", classes)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // codegen/classload warmup on the smallest SF so the FIRST timed
    // query doesn't absorb session + whole-stage-codegen compilation
    // (measured ~7 s of q1's first pass) — same discipline as Bench.
    SparkEntry.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    // Round-robin passes, PER-PASS steal-gated (round 16, VERDICT r15
    // item 1): round 14's min-of-2 handled the 100-180 s descheduling
    // stalls (one stall mis-measures a row 10-20x; min-of-2 keeps one
    // clean sample), but gating only the WHOLE subprocess window from
    // the parent made cluster12 the one bench number that couldn't
    // prove its own validity — the minutes-long window accumulates
    // ambient steal past the gate even on a normal host day. Now the
    // gate runs INSIDE, at pass granularity (the main-block
    // discipline): minimum 2 passes, extend to 4 while fewer than 2
    // landed in quiet windows, per-query minima prefer quiet samples,
    // and the CLUSTER12META line carries the per-pass steal evidence.
    // Pass 1 is still the cold multi-JVM leg the block exists for (the
    // regression class it guards — executor-fatal broadcasts,
    // classpath CCEs — fails EVERY pass, never just one).
    var failed = false
    val samples = scala.collection.mutable.Map
      .empty[String, Vector[(Double, Int)]].withDefaultValue(Vector.empty)
    val passQuiet = scala.collection.mutable.ArrayBuffer.empty[Boolean]
    val passSteal = scala.collection.mutable.ArrayBuffer.empty[Long]
    var pass = 0
    while (pass < 4 && (pass < 2 || passQuiet.count(identity) < 2)) {
      pass += 1
      val s0 = StealGate.stealNow(); val p0 = System.nanoTime()
      for (name <- queries12) {
        val sec = try {
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[cluster12] $name failed: ${e.getMessage}")
          failed = true
          -1.0
        }
        System.err.println(f"[cluster12] pass$pass $name $sec%.3f s")
        if (sec >= 0) samples(name) = samples(name) :+ (sec, pass)
      }
      val passSec = (System.nanoTime() - p0) / 1e9
      val sd = StealGate.delta(s0, StealGate.stealNow())
      passSteal += sd
      passQuiet += StealGate.quietWindow(sd, passSec)
      System.err.println(
        f"[cluster12] pass$pass $passSec%.1f s steal=$sd quiet=${passQuiet.last}")
    }
    val quiet = passQuiet.count(identity) >= 2
    val times = queries12.map { name =>
      val quietSamples = samples(name).collect {
        case (sec, p) if passQuiet(p - 1) => sec
      }
      val sec =
        if (quietSamples.nonEmpty) quietSamples.min
        else if (samples(name).nonEmpty) samples(name).map(_._1).min
        else -1.0
      f""""$name":$sec%.3f"""
    }
    println(s"""CLUSTER12META {"quiet":$quiet,"pass_steal":${passSteal
      .mkString("[", ",", "]")},"pass_quiet":${passQuiet
      .mkString("[", ",", "]")}}""")
    println(times.mkString("CLUSTER12 {", ",", "}"))
    spark.stop()
    if (failed) sys.exit(1)
  }
}
