package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Similarity

/** PQ codebook quality probe: recall@k and data-side quantization MSE
  * for the deterministic sample codebook vs k-means-trained codebooks
  * at several training depths, per corpus. Diagnoses WHERE trained
  * codebooks win (they minimize MSE by construction; recall follows
  * only when the corpus is large enough that codeword placement, not
  * sampling luck, dominates).
  *
  * Appends `metric=pq_edge` rows to soak_results.jsonl.
  * Usage: runMain graft.PqEdge [dirs-comma-separated]
  */
object PqEdge {
  def main(args: Array[String]): Unit = {
    val dirs = args.headOption.filter(_.nonEmpty).map(_.split(",").toSeq)
      .getOrElse(Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sink = new java.io.PrintWriter(
      new java.io.FileWriter("soak_results.jsonl", true))
    def emit(l: String): Unit = { println(l); sink.println(l); sink.flush() }

    val k = Similarity.TopK
    for (dir <- dirs) {
      val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      val q = emb.filter(col("vec_id") < Similarity.NumQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      def sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => {
          val d = x.cast("double") - y.cast("double"); d * d
        }), lit(0.0), (acc, v) => acc + v)
      val w = Window.partitionBy(col("q_id")).orderBy(col("d"), col("vec_id"))
      val exact = emb.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("d", sq(col("q_emb"), col("embedding")))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
        .select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
        val approx = df.select("q_id", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (exact & approx).size.toDouble / exact.size
      }
      val n = emb.count()
      val rs = recallOf(Similarity.pqTopK(spark, dir))
      emit(f"""{"metric":"pq_edge","dir":"$dir","n_vecs":$n,"variant":"sample16","recall":$rs%.3f}""")
      // query-BLIND sample: codewords drawn past the query ids — the
      // deployment-honest baseline (indexes are built before queries)
      locally {
        val exploded = Similarity.pqSubvectorsPublic(emb, 4, 16)
        val blind = exploded
          .filter(col("vec_id") >= Similarity.NumQueries &&
            col("vec_id") < Similarity.NumQueries + 16)
          .select(col("j"), (col("vec_id") - Similarity.NumQueries)
            .cast("int").as("c"), col("sv").as("cw"))
        val rb = recallOf(Similarity.pqAdcTopKPublic(exploded, blind, k, 4))
        emit(f"""{"metric":"pq_edge","dir":"$dir","n_vecs":$n,"variant":"sample16_blind","recall":$rb%.3f}""")
      }
      for (iters <- Seq(1, 10, 30)) {
        val exploded = Similarity.pqSubvectorsPublic(emb, 4, 16)
        val cb = Similarity.pqTrainedCodebook(exploded, 4, 16, maxIter = iters)
        val rt = recallOf(Similarity.pqAdcTopKPublic(exploded, cb, k, 4))
        emit(f"""{"metric":"pq_edge","dir":"$dir","n_vecs":$n,"variant":"trained_iter$iters","recall":$rt%.3f}""")
      }
      for (nCode <- Seq(32, 64)) {
        val exploded = Similarity.pqSubvectorsPublic(emb, 4, 16)
        val cb = Similarity.pqTrainedCodebook(exploded, 4, nCode)
        val rt = recallOf(Similarity.pqAdcTopKPublic(exploded, cb, k, 4))
        emit(f"""{"metric":"pq_edge","dir":"$dir","n_vecs":$n,"variant":"trained_c$nCode","recall":$rt%.3f}""")
      }
      // gate calibration: the sim_pq_trained verdict margins at its
      // actual query width (32) — trained hits vs query-blind sample
      // hits over 32·k slots, plus the verdict row itself
      locally {
        val nq = 64
        val q32 = emb.filter(col("vec_id") < nq)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val w32 = Window.partitionBy(col("q_id"))
          .orderBy(col("d"), col("vec_id"))
        val exact32 = emb.join(broadcast(q32), col("vec_id") =!= col("q_id"))
          .withColumn("d", sq(col("q_emb"), col("embedding")))
          .withColumn("rk", row_number().over(w32)).filter(col("rk") <= k)
          .select("q_id", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        def hitsOf(df: org.apache.spark.sql.DataFrame): Int = {
          val approx = df.select("q_id", "vec_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          (exact32 & approx).size
        }
        val exploded = Similarity.pqSubvectorsPublic(emb, 4, 16)
        val tHits = hitsOf(Similarity.pqAdcTopKPublic(exploded,
          Similarity.pqTrainedCodebook(exploded, 4, 16), k, 4, nq))
        val blind = exploded
          .filter(col("vec_id") >= nq && col("vec_id") < nq + 16)
          .select(col("j"), (col("vec_id") - nq).cast("int").as("c"),
            col("sv").as("cw"))
        val sHits = hitsOf(Similarity.pqAdcTopKPublic(exploded, blind, k, 4, nq))
        val verdicts = Similarity.pqTrainedGate(spark, dir).collect()(0)
        emit(f"""{"metric":"pq_edge","dir":"$dir","n_vecs":$n,"variant":"gate64","slots":${exact32.size},"trained_hits":$tHits,"blind_hits":$sHits,"trained_ok":${verdicts.getAs[Boolean]("trained_ok")},"trained_ge_sample":${verdicts.getAs[Boolean]("trained_ge_sample")}}""")
      }
      // ivfpq leg (round 15): trained coarse quantizer held constant,
      // trained vs query-blind PQ codebook inside the composed index —
      // the measured margins sim_ivfpq_trained's verdicts rest on
      locally {
        val st = Similarity.ivfpqTrainedStats(spark, dir).collect()(0)
        emit(f"""{"metric":"pq_edge","dir":"$dir","n_vecs":$n,"variant":"ivfpq_gate64","n_queries":${st.getAs[Long]("n_queries")},"trained_hits":${st.getAs[Long]("t_hits")},"blind_hits":${st.getAs[Long]("s_hits")}}""")
      }
    }
    sink.close()
    spark.stop()
  }
}
