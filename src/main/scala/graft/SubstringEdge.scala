package graft

import org.apache.spark.sql.functions._

/** The substring detector's hash-once-vs-recompute trade, measured.
  *
  * The 1000x soak (docs/SCALING.md round 13) attributed
  * `dedup_substring`'s superlinear fourth decade to the occurrence
  * frame being consumed twice — once under the duplicated-hash
  * groupBy, once as the join probe — with the lineage (tokenize +
  * window + md5) recomputed both times, and argued the persist-once
  * alternative is the first cluster knob but unsafe at 1000x on this
  * host's shared 47 GB scratch. This probe turns the safe half of
  * that argument into numbers: at a scale where the persisted
  * occurrence blocks fit comfortably (100x ≈ 145M rows), run the
  * operator both ways, cold, in this JVM — `recompute` first, then
  * `persist` (`substringSpansOf(persistOcc = true)`) — after priming
  * the parquet page cache so neither variant pays the one-time IO.
  * Both variants must return the identical span multiset (checked by
  * count + hash fold, not just count).
  *
  * Appends one JSON row per variant to soak_results.jsonl
  * (`metric=substring_edge`).
  *
  * Usage: runMain graft.SubstringEdge [soakDir]
  * — default /tmp/graft_soak/x100 (run graft.Soak first to
  * materialize it).
  */
object SubstringEdge {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_soak/x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sink = new java.io.PrintWriter(
      new java.io.FileWriter("soak_results.jsonl", true))
    def emit(line: String): Unit = { println(line); sink.println(line); sink.flush() }

    val docs = graft.sources.Tables.load(spark, dir, "documents")
    // decide-only mode: emit the size-aware router's pick from plan
    // stats alone (no operator run) — how the 1000x side of the
    // routing table is recorded without a 30-minute triple run
    if (args.lift(1).contains("decide")) {
      val pick = graft.operators.Dedup.persistOccAuto(docs)
      emit(f"""{"metric":"substring_edge","variant":"auto_decision","dir":"$dir","picked":"${if (pick) "persist" else "recompute"}","free_mb":${graft.Scratch.freeBytes() / (1 << 20)}}""")
      sink.close(); spark.stop(); return
    }
    // auto-only mode: one cold run through the router's pick — the
    // cheap way to validate the routed side at a scale where the full
    // three-variant comparison would take half an hour
    if (args.lift(1).contains("auto")) {
      val pick = graft.operators.Dedup.persistOccAuto(docs)
      val t0 = System.nanoTime()
      val row = graft.operators.Dedup.substringSpansOf(docs)
        .agg(count(lit(1)).as("n")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      emit(f"""{"metric":"substring_edge","variant":"auto_only","dir":"$dir","sec":$sec%.3f,"picked":"${if (pick) "persist" else "recompute"}","n_spans":${row.getLong(0)}}""")
      sink.close(); spark.stop(); return
    }
    // prime the page cache: both variants read warm parquet
    docs.agg(sum(hash(col("doc_id"), col("text")).cast("long"))).collect(): Unit

    def run(persistOcc: Option[Boolean]): (Double, Long, Long) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val row = graft.operators.Dedup
        .substringSpansOf(docs, persistOcc = persistOcc)
        .agg(count(lit(1)).as("n"),
          // coalesce: sum() over an empty frame is NULL — a corpus
          // with zero duplicated spans must report h=0, not NPE
          coalesce(sum(hash(col("doc_id"), col("span_start"),
            col("span_tokens")).cast("long")), lit(0L)).as("h"))
        .head()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, row.getLong(0), row.getLong(1))
    }

    val (rSec, rN, rH) = run(persistOcc = Some(false))
    emit(f"""{"metric":"substring_edge","variant":"recompute","dir":"$dir","sec":$rSec%.3f,"n_spans":$rN}""")
    val (pSec, pN, pH) = run(persistOcc = Some(true))
    emit(f"""{"metric":"substring_edge","variant":"persist","dir":"$dir","sec":$pSec%.3f,"n_spans":$pN}""")
    require(rN == pN && rH == pH,
      s"variants disagree: recompute ($rN, $rH) vs persist ($pN, $pH)")
    emit(f"""{"metric":"substring_edge","variant":"speedup","dir":"$dir","x":${rSec / pSec}%.3f}""")
    // the auto leg: record which side the size-aware router picks
    // here and that its result is the same span multiset
    val autoPick = graft.operators.Dedup.persistOccAuto(docs)
    val (aSec, aN, aH) = run(persistOcc = None)
    require(aN == rN && aH == rH,
      s"auto variant disagrees: auto ($aN, $aH) vs recompute ($rN, $rH)")
    emit(f"""{"metric":"substring_edge","variant":"auto","dir":"$dir","sec":$aSec%.3f,"picked":"${if (autoPick) "persist" else "recompute"}","n_spans":$aN}""")
    spark.stop()
  }
}
