package graft

import org.apache.spark.sql.functions._

/** RP-LSH tier rule at its extrapolation edge: an embeddings-only
  * measured run at 16384x (~33.5M vectors — 8x the 2048x point that
  * validated tier 4's activation) confirming the two claims the tier
  * doc extrapolates past its last measurement:
  *
  *  1. candidate volume stays ~linear in n under the 6x26 banding
  *     (occupancy n/2^26 ≈ 0.5 at 33.5M — candidates ≈ nb·n·occ/2,
  *     linear because occupancy is held ~constant per tier);
  *  2. planted near-dup probes (the gate's scale+offset shape,
  *     cos ≈ 0.9999) are retained through banding + exact-cosine
  *     verify at this width.
  *
  * Emits JSON lines (metric "rp_edge") to soak_results.jsonl;
  * docs/SCALING.md holds the recorded row. Usage:
  * runMain graft.RpEdge [scale] — default 16384.
  */
object RpEdge {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(16384)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sink = new java.io.PrintWriter(
      new java.io.FileWriter("soak_results.jsonl", true))
    def emit(line: String): Unit = { println(line); sink.println(line); sink.flush() }

    val dir = Soak.materialize(spark, k, needFacts = false, needDocs = false)
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val (nb, bw) = graft.operators.Similarity.rpBandConfig(n)

    // 1. candidate volume under the tier the rule picks for this n
    val t0 = System.nanoTime()
    val cands = graft.operators.Similarity.rpCandidates(emb, nb, bw).count()
    val candSec = (System.nanoTime() - t0) / 1e9
    emit(f"""{"metric":"rp_edge","scale":$k,"n_vectors":$n,"bands":$nb,"bits":$bw,"candidates":$cands,"cand_per_vec":${cands.toDouble / n}%.3f,"sec_candidates":$candSec%.1f}""")

    // 2. full pipeline with planted probes: banding + exact-cosine
    // verify must surface every planted (source, source+offset) pair
    val t1 = System.nanoTime()
    val pairs = graft.operators.Similarity
      .rpLshPairs(spark, dir, threshold = 0.99, probes = 3)
      .filter(col("id_b") >= graft.operators.Similarity.ProbeIdOffset)
      .count()
    val probeSec = (System.nanoTime() - t1) / 1e9
    emit(f"""{"metric":"rp_edge_probes","scale":$k,"planted":3,"retained":$pairs,"sec":$probeSec%.1f}""")

    sink.close()
    spark.stop()
    if (pairs < 3) sys.exit(1)
  }
}
