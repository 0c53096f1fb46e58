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

    def timed(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
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
      val (sec, n) = timed(mhProbe())
      emit(f"""{"metric":"index_soak","family":"mh","scale":$k,"step":"$step","probe_sec":$sec%.3f,"pairs":$n,"band_files":${files(s"$mhIdx/bands.parquet")}}""")
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
      val (sec, n) = timed(grProbe())
      emit(f"""{"metric":"index_soak","family":"gram","scale":$k,"step":"$step","probe_sec":$sec%.3f,"spans":$n,"gram_files":${files(s"$grIdx/grams.parquet")}}""")
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
