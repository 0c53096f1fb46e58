package graft

import graft.operators.Pipeline

/** Measures the materialized-stage-frames claim (round 16, VERDICT r15
  * item 5) at a soak scale: the recompute report (`pipe_report`) costs
  * about one pipeline run because Catalyst does not share subplans
  * across union branches, while the production shape — land s1–s6 once
  * ([[Pipeline.materializeStageFrames]]), aggregate the landed frames
  * ([[Pipeline.llmReportFrom]]) — should cost a small fraction of a
  * run. Four timed steps, each steal-gated min-of-2 (the IndexSoak
  * discipline):
  *
  *   pipeline   — `llmCorpus` end to end (the baseline "one run")
  *   report     — the recompute report (expected ≈ pipeline)
  *   mat        — the pipeline run that LANDS its stage frames
  *                (expected ≈ pipeline + write cost)
  *   report_mat — the report over the landed frames (the claim:
  *                ≤ ~10% of pipeline)
  *
  * Appends one JSON row per step to soak_results.jsonl
  * (`metric=pipe_soak`).
  *
  * Usage: runMain graft.PipeSoak [scale]   (default 10)
  */
object PipeSoak {
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
    SparkEntry.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()

    def timed(step: String)(body: => Unit): Double = {
      var best = Double.MaxValue
      var bestQuiet = Double.MaxValue
      var anyQuiet = false
      var worstSteal = 0L
      var attempt = 0
      while (attempt < 4 && (attempt < 2 || !anyQuiet)) {
        attempt += 1
        val (_, sec, sd, quiet) = StealGate.timedWindow(body)
        worstSteal = math.max(worstSteal, sd)
        if (quiet) { anyQuiet = true; bestQuiet = math.min(bestQuiet, sec) }
        best = math.min(best, sec)
      }
      val sec = if (anyQuiet) bestQuiet else best
      emit(f"""{"metric":"pipe_soak","scale":$k,"step":"$step","sec":$sec%.3f,"quiet":$anyQuiet,"steal":$worstSteal}""")
      sec
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val pipeSec = timed("pipeline")(noop(Pipeline.llmCorpus(spark, dir)))
    timed("report")(noop(Pipeline.llmReport(spark, dir)))
    var stages = ""
    timed("mat") { stages = Pipeline.materializeStageFrames(spark, dir) }
    val rmSec = timed("report_mat")(
      noop(Pipeline.llmReportFrom(spark, dir, stages)))
    emit(f"""{"metric":"pipe_soak","scale":$k,"step":"ratio","report_mat_over_pipeline":${rmSec / pipeSec}%.4f}""")
    sink.close()
    spark.stop()
  }
}
