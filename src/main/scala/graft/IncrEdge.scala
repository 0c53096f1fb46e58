package graft

import org.apache.spark.sql.functions._

/** Incremental-dedup cost split, measured: the `dedup_incremental`
  * GATE rebuilds its index every call (so the oracle can replay it),
  * which hides the operational claim — that the index BUILD is paid
  * once per history while each day's batch pays only the PROBE. This
  * main times the three pieces separately at scale k:
  *
  *   build  — writeMinhashIndex over history (¾ of the corpus)
  *   probe  — probeMinhashIndex of the new batch (¼) against the
  *            persisted index (signatures + bands read from parquet)
  *   full   — Dedup.minhashPairs over the whole corpus (what a
  *            pipeline without the index re-pays every run)
  *
  * Appends one JSON line (metric=incr_dedup) per scale to
  * soak_results.jsonl. Usage: runMain graft.IncrEdge [scales]
  */
object IncrEdge {
  def main(args: Array[String]): Unit = {
    val scales = args.headOption.filter(_.nonEmpty)
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(10))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sink = new java.io.PrintWriter(
      new java.io.FileWriter("soak_results.jsonl", true))
    def emit(l: String): Unit = { println(l); sink.println(l); sink.flush() }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // codegen warmup so scale timings measure plans, not classloading
    graft.operators.Dedup.dedupIncremental(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    for (k <- scales.sorted) {
      val dir = Soak.materialize(spark, k, needFacts = false)
      val docs = graft.sources.Tables.load(spark, dir, "documents")
      val history = docs.filter(col("doc_id") % 4 =!= 0)
      val batch = docs.filter(col("doc_id") % 4 === 0)
      val idx = Scratch.dir(s"incr_edge_x$k")
      val buildSec = timed {
        graft.operators.Dedup.writeMinhashIndex(history, idx)
      }
      val idxBands = spark.read.parquet(s"$idx/bands.parquet")
      val idxSigs = spark.read.parquet(s"$idx/sigs.parquet")
      var pairs = 0L
      val probeSec = timed {
        // scoped headroom, same as the streaming twin: the probe's
        // bounded witness heaps earn the raised fallback threshold
        pairs = GraftSession.withObjectAggHeadroom(spark) {
          graft.operators.Dedup.probeMinhashIndex(batch,
            idxBands, idxSigs, threshold = 0.5).count()
        }
      }
      System.err.println(f"[incr] x$k probe done: $pairs pairs ($probeSec%.1f s)")
      // the comparison leg may be UNRUNNABLE — that is a result, not an
      // error: the full pair re-run materializes the quadratic frontier
      // the witness probe exists to avoid (measured 37+ GB of spill on
      // this host's 47 GB scratch at 100x)
      val fullSec = try timed {
        graft.operators.Dedup.minhashPairs(spark, dir)
          .write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable =>
        System.err.println(s"[incr] full rerun failed: ${e.getMessage.take(100)}")
        -1.0
      }
      emit(f"""{"metric":"incr_dedup","scale":$k,"build_sec":$buildSec%.3f,"probe_sec":$probeSec%.3f,"full_rerun_sec":$fullSec%.3f,"probe_pairs":$pairs}""")
    }
    sink.close()
    spark.stop()
  }
}
