package graft

import org.apache.spark.sql.functions._

/** Index lifecycle under a rolling ingest, measured: the round-13
  * verdict's week-two scenario — `appendToMinhashIndex` /
  * `appendToGramIndex` are append-only, so replayed batches and
  * per-append small files accumulate and every later probe pays for
  * them. This probe makes the climb AND the reset visible: build the
  * index from history, append the same batch `appends` times (the
  * at-least-once replay worst case — every row a duplicate), time the
  * probe after each append, then compact and time it once more. The
  * claim under test: probe wall climbs with accumulated appends and
  * returns to ~baseline after compaction, with identical probe
  * results (the spec pins result identity; this pins the cost story).
  *
  * Appends one JSON row per measurement to soak_results.jsonl
  * (`metric=index_soak`, family mh|gram, step base|append_i|compacted).
  *
  * Usage: runMain graft.IndexSoak [scale] [appends]   (default 10 10)
  */
object IndexSoak {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val appends = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sink = new java.io.PrintWriter(
      new java.io.FileWriter("soak_results.jsonl", true))
    def emit(l: String): Unit = { println(l); sink.println(l); sink.flush() }

    val dir = Soak.materialize(spark, k, needFacts = false)
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val history = docs.filter(col("doc_id") % 4 === 1)
    val batch = docs.filter(col("doc_id") % 4 === 2)
    val probeDocs = docs.filter(col("doc_id") % 4 === 0)

    // Steal-gated min-of-2 per step (round 15): the round-14 gram rows
    // swung 0.84→7.88 s between adjacent appends purely with the host's
    // steal counter, making the family's compaction story unreadable.
    // Each step now runs the probe at least twice, retries while the
    // window was steal-noisy (max 4 attempts), takes the min of quiet
    // attempts (min overall if none were quiet), and records the
    // per-attempt steal deltas so the row is self-diagnosing.
    // Sampling + threshold live in graft.StealGate since round 16, so
    // SPARK_GRAFT_STEAL_RATE overrides this surface too (ADVICE r15:
    // the 25 j/s gate was hardcoded here).
    def timed(body: => Long): (Double, Long, Boolean, Long) = {
      var best = Double.MaxValue
      var bestQuiet = Double.MaxValue
      var n = 0L
      var anyQuiet = false
      var worstSteal = 0L
      var attempt = 0
      while (attempt < 4 && (attempt < 2 || !anyQuiet)) {
        attempt += 1
        val (nn, sec, sd, quiet) = StealGate.timedWindow(body)
        n = nn
        worstSteal = math.max(worstSteal, sd)
        if (quiet) { anyQuiet = true; bestQuiet = math.min(bestQuiet, sec) }
        best = math.min(best, sec)
      }
      (if (anyQuiet) bestQuiet else best, n, anyQuiet, worstSteal)
    }
    def files(path: String): Int =
      Option(new java.io.File(path).listFiles()).toSeq.flatten
        .count(_.getName.endsWith(".parquet"))

    // ---- MinHash family ----
    val mhIdx = Scratch.dir(s"index_soak_mh_x$k")
    graft.operators.Dedup.writeMinhashIndex(history, mhIdx)
    def mhProbe(): Long = GraftSession.withObjectAggHeadroom(spark) {
      graft.operators.Dedup.probeMinhashIndex(probeDocs,
        spark.read.parquet(s"$mhIdx/bands.parquet"),
        spark.read.parquet(s"$mhIdx/sigs.parquet"), threshold = 0.5).count()
    }
    def mhEmit(step: String): Unit = {
      val (sec, n, quiet, steal) = timed(mhProbe())
      emit(f"""{"metric":"index_soak","family":"mh","scale":$k,"step":"$step","probe_sec":$sec%.3f,"pairs":$n,"band_files":${files(s"$mhIdx/bands.parquet")},"quiet":$quiet,"steal":$steal}""")
    }
    mhEmit("base")
    for (i <- 1 to appends) {
      graft.operators.Dedup.appendToMinhashIndex(batch, mhIdx)
      mhEmit(s"append_$i")
    }
    graft.operators.Dedup.compactMinhashIndex(spark, mhIdx)
    mhEmit("compacted")

    // ---- gram family ----
    val grIdx = Scratch.dir(s"index_soak_gram_x$k")
    graft.operators.Dedup.writeGramIndex(history, grIdx)
    def grProbe(): Long =
      graft.operators.Dedup.probeGramIndex(probeDocs,
        spark.read.parquet(s"$grIdx/grams.parquet")).count()
    def grEmit(step: String): Unit = {
      val (sec, n, quiet, steal) = timed(grProbe())
      emit(f"""{"metric":"index_soak","family":"gram","scale":$k,"step":"$step","probe_sec":$sec%.3f,"spans":$n,"gram_files":${files(s"$grIdx/grams.parquet")},"quiet":$quiet,"steal":$steal}""")
    }
    grEmit("base")
    for (i <- 1 to appends) {
      graft.operators.Dedup.appendToGramIndex(batch, grIdx)
      grEmit(s"append_$i")
    }
    graft.operators.Dedup.compactGramIndex(spark, grIdx)
    grEmit("compacted")

    sink.close()
    spark.stop()
  }
}
