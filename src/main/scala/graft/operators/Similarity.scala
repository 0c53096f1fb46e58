package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosine
import graft.sources.Tables

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale posture: the query side is always tiny (a handful of probe
  * vectors) and is BROADCAST against the corpus — the corpus is scanned
  * once, never shuffled. Top-k per query is a per-partition heap
  * (window rank after the broadcast join) — no global sort. The IVF
  * variant prunes the scan to the probed cells before scoring; the cell
  * assignment is the partition key, so a real deployment co-locates a
  * cell's vectors and only reads probed cells (partition pruning).
  */
object Similarity {

  val NumQueries = 8
  val TopK = 5

  /** Exact brute-force cosine top-k for a query set: broadcast the
    * queries, scan the corpus once, rank per query. The baseline every
    * ANN variant is measured against.
    */
  def bruteforceTopK(spark: SparkSession, dir: String,
      k: Int = TopK): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    emb.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** Per-label centroids (element-wise mean), computed by position
    * explode + one aggregation — linear, no driver collect. Returns
    * (label, centroid array<double>).
    */
  def centroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))

  /** IVF-style ANN: the label is the coarse-quantizer cell. Each query
    * scores the (tiny, broadcast) centroid table, keeps its `nprobe`
    * closest cells, and scans only those cells for the final top-k.
    * Approximate by construction → rows-only check.
    */
  def ivfTopK(spark: SparkSession, dir: String, k: Int = TopK,
      nprobe: Int = 2): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val cent = centroids(emb)
    val q = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val wCell = Window.partitionBy(col("q_id"))
      .orderBy(col("cell_cos").desc, col("label").asc)
    val probed = q.join(broadcast(cent))
      .withColumn("cell_cos", cosine(col("q_emb"), col("centroid")))
      .withColumn("cell_rk", row_number().over(wCell))
      .filter(col("cell_rk") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("label"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    emb.join(broadcast(probed), Seq("label"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** IVF with a REAL coarse quantizer: k-means over the corpus builds
    * `nCells` centroids (the index build), every vector is assigned to
    * its nearest cell, and queries probe only their `nprobe` closest
    * cells. The model's centers are driver-side by design — an IVF
    * codebook is tiny and ships with the query, exactly like a
    * broadcast dimension. Approximate → rows-only check.
    */
  def ivfKMeansTopK(spark: SparkSession, dir: String, k: Int = TopK,
      nprobe: Int = 4, nCells: Int = 16): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import spark.implicits._
    val emb = Tables.load(spark, dir, "embeddings")
    val feat = emb.withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans().setK(nCells).setSeed(42).setMaxIter(5).fit(feat)
    val assigned = model.transform(feat)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))
    val cent = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }.toSeq
      .toDF("cell", "centroid")
    val q = assigned.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val wCell = Window.partitionBy(col("q_id"))
      .orderBy(col("cell_cos").desc, col("cell").asc)
    val probed = q.join(broadcast(cent))
      .withColumn("cell_cos", cosine(col("q_emb"), col("centroid")))
      .withColumn("cell_rk", row_number().over(wCell))
      .filter(col("cell_rk") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("cell"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** Cluster statistics: members per label + mean cosine of members to
    * their label centroid — the cluster-cohesion diagnostic an IVF
    * index build emits.
    */
  def pairStats(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    emb.join(broadcast(centroids(emb)), Seq("label"))
      .withColumn("cos", cosine(col("embedding"), col("centroid")))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("cos")), 6).as("mean_cos_to_centroid"))
      .orderBy(col("label"))
  }
}
