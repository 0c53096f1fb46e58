package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Threshold (radius) search (`sim_range_search`): every corpus
    * vector within cosine ≥ τ of each query — the range-query twin of
    * top-k, used when the caller wants "all near-duplicates of X"
    * rather than a fixed k. Same broadcast-query single-scan shape as
    * the brute-force baseline; the result volume is bounded by the
    * radius, and at corpus scale the scan side would first prune to
    * LSH/IVF candidate cells exactly as the top-k variants do.
    */
  def rangeSearch(spark: SparkSession, dir: String,
      threshold: Double = 0.3): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    emb.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
      .filter(col("cos") >= threshold)
      .select(col("q_id"), col("vec_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("q_id"), col("vec_id"))
  }

  /** Matryoshka-style two-stage ANN (`sim_mrl_topk`): rank on the
    * FIRST `dPrefix` dimensions only (MRL-trained embeddings front-load
    * information, so the prefix is a usable coarse score), keep the
    * top `cand` candidates per query, then rerank just those with the
    * full vector. At scale the prefix is stored as its own (8×
    * smaller) column so the coarse scan reads an eighth of the bytes,
    * and the full vectors are fetched for `cand` rows per query, not
    * the corpus. Both stages are deterministic (prefix slice + fixed
    * tie-break), so the whole cascade is oracle-checked — unlike
    * trained coarse quantizers.
    */
  def mrlTopK(spark: SparkSession, dir: String, dPrefix: Int = 8,
      cand: Int = 25, k: Int = TopK): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val wC = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_c").desc, col("vec_id").asc)
    val cands = emb.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos_c",
        cosine(slice(col("q_emb"), 1, dPrefix), slice(col("embedding"), 1, dPrefix)))
      .withColumn("crk", row_number().over(wC))
      .filter(col("crk") <= cand)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    cands.withColumn("cos", cosine(col("q_emb"), col("embedding")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** `sim_sq_topk`: int8 scalar-quantized ANN — per-vector symmetric
    * quantization q_i = floor(x_i * 127/max|x| + 0.5), then the whole
    * search (dot products, norms, ranking) runs on the quantized
    * vectors. At scale this is the memory lever: the stored corpus
    * shrinks 4× (int8 vs float32), so 4× more vectors fit in executor
    * page cache, and integer dot products SIMD-vectorize. The
    * quantization is a pure closed-form function of each vector, so
    * DuckDB replays it bit-for-bit (integer-valued doubles keep every
    * sum exact) — a fully oracle-checked ANN variant, unlike k-means
    * IVF. Quantized values are carried as integer-valued doubles
    * because the cosine kernel takes float/double arrays; a real
    * deployment would store `byte` arrays and widen in the kernel.
    */
  def sqTopK(spark: SparkSession, dir: String, k: Int = TopK): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val mx = array_max(transform(col("embedding"), x => abs(x))).cast("double")
    val scale = when(mx > lit(0.0), lit(127.0) / mx).otherwise(lit(1.0))
    val qv = transform(col("embedding"),
      x => floor(x.cast("double") * scale + lit(0.5)).cast("double"))
    val z = emb.select(col("vec_id"), qv.as("qv"))
    val q = z.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_q").desc, col("vec_id").asc)
    z.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos_q", cosine(col("q_qv"), col("qv")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id"),
        round(col("cos_q"), 6).as("cos_q"))
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

  /** `sim_pq_topk`: product-quantized ANN with asymmetric distance
    * (ADC) — the OTHER compression lever next to scalar quantization:
    * each vector stores only m=4 codebook indices (4 bytes vs 256),
    * a 64× memory cut, and search is m table lookups per candidate.
    * The codebook is deterministic sample-as-codebook (the nCode
    * lowest vec_ids' subvectors — the seed-sample initialization of a
    * k-means codebook, minus the iterations that would make it
    * unreplayable), so the WHOLE pipeline — encode, distance tables,
    * ranking — is oracle-checked, unlike classic trained PQ.
    *
    * Shapes: codes = corpus ⋈ broadcast codebook (argmin per
    * subspace, window over nCode rows per vector-subspace); search =
    * codes ⋈ broadcast per-query distance tables, then the m partial
    * distances re-assemble in FIXED subspace order (one conditional
    * sum per subspace — a float sum in shuffle order would wobble the
    * last ulp across layouts and engines). Linear in corpus × m.
    */
  def pqTopK(spark: SparkSession, dir: String, k: Int = TopK,
      m: Int = 4, subDim: Int = 16, nCode: Int = 16): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val exploded = pqSubvectors(emb, m, subDim)
    pqAdcTopK(exploded, pqSampleCodebook(exploded, nCode), k, m, cand = None)
  }

  /** Harness-visible aliases for the PQ internals (graft.PqEdge probes
    * codebook variants without widening the operator API).
    */
  private[graft] def pqSubvectorsPublic(emb: DataFrame, m: Int,
      subDim: Int): DataFrame = pqSubvectors(emb, m, subDim)
  private[graft] def pqAdcTopKPublic(exploded: DataFrame,
      codebook: DataFrame, k: Int, m: Int,
      nQueries: Int = NumQueries): DataFrame =
    pqAdcTopK(exploded, codebook, k, m, cand = None, nQueries)

  /** (vec_id, j, sv): the m-subspace decomposition shared by the PQ
    * family.
    */
  private def pqSubvectors(emb: DataFrame, m: Int, subDim: Int): DataFrame = {
    val subs = (0 until m).map(j => struct(lit(j).as("j"),
      slice(col("embedding"), j * subDim + 1, subDim).as("sv")))
    emb.select(col("vec_id"), explode(array(subs: _*)).as("s"))
      .select(col("vec_id"), col("s.j").as("j"), col("s.sv").as("sv"))
  }

  /** Deterministic sample-as-codebook (the nCode lowest vec_ids'
    * subvectors) — the oracle-replayable codebook rule.
    */
  private def pqSampleCodebook(exploded: DataFrame, nCode: Int): DataFrame =
    exploded.filter(col("vec_id") < nCode)
      .select(col("j"), col("vec_id").cast("int").as("c"), col("sv").as("cw"))

  /** Squared L2 — the native codegen expression (round 16, guide §4):
    * the previous `aggregate(zip_with(...))` formulation ran
    * interpreted per element per candidate row (profiled 2.4 s on one
    * single-task exact-ranking stage at sf0.1); the native twin is
    * bit-identical (same left-to-right double fold from 0.0, same
    * null poisoning — VectorSpec pins equivalence) and stays inside
    * whole-stage codegen.
    */
  private def sqL2(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.sqL2(a, b)

  /** The shared PQ tail: encode the corpus against `codebook` (argmin
    * per vector-subspace), build per-query ADC tables (m·nCode rows
    * per query, broadcast), re-assemble partial distances in FIXED
    * subspace order, rank top-k. `cand = Some((q_id, vec_id))`
    * restricts scoring to IVF-probed candidates; `None` scores the
    * whole corpus.
    */
  private def pqAdcTopK(exploded: DataFrame, codebook: DataFrame,
      k: Int, m: Int, cand: Option[DataFrame],
      nQueries: Int = NumQueries): DataFrame = {
    val wAssign = Window.partitionBy(col("vec_id"), col("j"))
      .orderBy(col("d"), col("c"))
    val codes = exploded.join(broadcast(codebook), Seq("j"))
      .withColumn("d", sqL2(col("sv"), col("cw")))
      .withColumn("rn", row_number().over(wAssign)).filter(col("rn") === 1)
      .select(col("vec_id"), col("j"), col("c"))
    // Per-query ADC tables: exact distance from each query subvector to
    // every codeword — m·nCode rows per query, broadcast to the corpus.
    val qdist = exploded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("j"), col("sv").as("q_sv"))
      .join(broadcast(codebook), Seq("j"))
      .withColumn("qd", sqL2(col("q_sv"), col("cw")))
      .select(col("q_id"), col("j"), col("c"), col("qd"))
    val partials = (0 until m).map(j =>
      sum(when(col("j") === j, col("qd"))).as(s"p$j"))
    val adist = (1 until m).foldLeft(col("p0"))((acc, j) => acc + col(s"p$j"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("adist"), col("vec_id"))
    val scored = cand match {
      case None =>
        codes.join(broadcast(qdist), Seq("j", "c"))
          .filter(col("vec_id") =!= col("q_id"))
      case Some(c) =>
        c.join(codes, Seq("vec_id"))
          .join(broadcast(qdist), Seq("q_id", "j", "c"))
    }
    scored
      .groupBy(col("q_id"), col("vec_id"))
      .agg(partials.head, partials.tail: _*)
      .withColumn("adist", adist)
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("vec_id"),
        round(col("adist"), 6).as("approx_dist"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** `sim_ivfpq_topk`: IVF × PQ composition — the memory layout
    * billion-scale ANN actually deploys (coarse cells prune the scan,
    * product-quantized codes shrink what remains 64×, ADC scores the
    * candidates with m table lookups each). The engine had both halves
    * separately (`sim_ivf_topk` cells, `sim_pq_topk` codes); this
    * composes them: each query keeps its `nprobe` closest cells by
    * centroid cosine, and ONLY vectors in those cells are ranked, by
    * PQ asymmetric distance instead of full-precision cosine.
    *
    * Deterministic end to end (label-cell coarse quantizer + the
    * sample-as-codebook PQ rule + total tie-breaks), so the WHOLE
    * pipeline is oracle-checked, unlike classic trained IVF-PQ.
    * Recall vs the exact ranking is spec-pinned next to
    * `sim_recall_report`'s IVF measurement (SimilaritySpec).
    *
    * Shapes at scale: probed cells broadcast to the corpus scan (the
    * ivf pruning join), candidates then equi-join the 4-codes-per-
    * vector table on vec_id (both corpus-keyed; the query-side ADC
    * tables broadcast), partial distances re-assemble in FIXED
    * subspace order. Nothing shuffles the full-precision vectors.
    */
  def ivfpqTopK(spark: SparkSession, dir: String, k: Int = TopK,
      nprobe: Int = 2, m: Int = 4, subDim: Int = 16,
      nCode: Int = 16): DataFrame = {
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
      .select(col("q_id"), col("label"))
    // candidates: the probed cells' vectors per query (the IVF prune —
    // exactly ivfTopK's broadcast shape, minus the full-precision score)
    val cand = emb.select(col("vec_id"), col("label"))
      .join(broadcast(probed), Seq("label"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
    val exploded = pqSubvectors(emb, m, subDim)
    pqAdcTopK(exploded, pqSampleCodebook(exploded, nCode), k, m, Some(cand))
  }

  /** `sim_recall_report`: recall@k of the IVF probe against the exact
    * brute-force ranking, per query — the quality gate every ANN
    * deployment runs before swapping an index in. Both inputs are
    * deterministic (label-cell IVF, tie-broken rankings), so the whole
    * report is oracle-checked — the measurement harness itself is
    * verified, not just eyeballed. Exact side LEFT-joins the approx
    * side on (q_id, neighbor); a missed neighbor contributes 0.
    * Both rankings broadcast-join (k rows per query), so the report
    * costs two corpus scans and no wide shuffle at any scale.
    */
  def recallReport(spark: SparkSession, dir: String, k: Int = TopK): DataFrame = {
    val exact = bruteforceTopK(spark, dir, k).select(col("q_id"), col("vec_id"))
    val approx = ivfTopK(spark, dir, k)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    exact.join(broadcast(approx), Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("q_id"), col("n_hits"),
        round(col("n_hits").cast("double") / k, 6).as("recall"))
      .orderBy(col("q_id"))
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

  /** `sim_ivf_kmeans` gate surface: the k-means IVF index measured
    * against the exact brute-force ranking and collapsed to the
    * verdict the DuckDB oracle can predict. Per-row top-k output is
    * float-summation-order sensitive (seeded k-means|| centroids are
    * reduced distributively, so borderline cell assignments may flip
    * between cluster layouts); MEAN recall over the query set is not —
    * a flipped borderline neighbor moves it by 1/(n·k) = 0.025. The
    * bound (≥ 0.4) sits 4+ flips under the measured recall at every
    * gate corpus (0.50 / 0.55 / 0.675 at sf0.001/0.01/0.1 with the
    * default nprobe=4 of 16 cells), so the gate records "the index
    * actually retrieves" without pinning reduction order; the full
    * recall-vs-nprobe CURVE is separately oracle-gated by
    * `sim_nprobe_sweep`. n_queries/k are exact, DuckDB-recomputed.
    */
  def ivfKMeansGate(spark: SparkSession, dir: String, k: Int = TopK,
      minRecall: Double = 0.4): DataFrame = {
    val exact = bruteforceTopK(spark, dir, k).select(col("q_id"), col("vec_id"))
    val approx = ivfKMeansTopK(spark, dir, k)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    exact.join(broadcast(approx), Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .agg(count(lit(1)).as("n_queries"), sum(col("n_hits")).as("tot_hits"))
      .select(col("n_queries"), lit(k.toLong).as("k"),
        (col("tot_hits").cast("double") >=
          lit(minRecall) * col("n_queries").cast("double") * k).as("recall_ok"))
  }

  /** k-means-TRAINED PQ codebooks — the recall lever the deterministic
    * sample rule leaves on the table: one MLlib k-means fit per
    * subspace (the `sim_ivf_kmeans` pattern applied to sub-quantizers;
    * Jégou et al. 2011, "Product Quantization for Nearest Neighbor
    * Search" trains exactly this way). The m models' centers are
    * driver-side by design — a PQ codebook is m·nCode·subDim floats
    * (16 KB here), shipped with the query like any broadcast
    * dimension. Build cost: m seeded fits over the corpus, paid at
    * index build time; encode/search reuse the shared ADC tail
    * unchanged.
    */
  def pqTrainedCodebook(exploded: DataFrame, m: Int, nCode: Int,
      seed: Long = 42, maxIter: Int = 10): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = exploded.sparkSession
    import spark.implicits._
    (0 until m).flatMap { j =>
      val feat = exploded.filter(col("j") === j)
        .select(array_to_vector(col("sv")).as("features"))
      val model = new KMeans().setK(nCode).setSeed(seed + j)
        .setMaxIter(maxIter).fit(feat)
      model.clusterCenters.zipWithIndex.map { case (v, c) => (j, c, v.toArray) }
    }.toDF("j", "c", "cw")
  }

  /** PQ top-k under the TRAINED codebooks — same code budget as
    * `pqTopK` (m indices/vector, nCode codewords/subspace), better
    * codewords. Approximate and k-means-float-sensitive per row →
    * gate-checked through the recall verdict below, not row hashes.
    */
  def pqTrainedTopK(spark: SparkSession, dir: String, k: Int = TopK,
      m: Int = 4, subDim: Int = 16, nCode: Int = 16): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    // Stabilized: the subvector explosion feeds the m k-means fits
    // (each a multi-pass consumer) plus the ADC encode/query arms — a
    // lazy plan re-explodes the corpus once per consumer. Partitioning
    // is preserved (localCheckpoint materializes the same partitions),
    // so the seeded fits see identical data layout → identical centers.
    val exploded = Stabilize(pqSubvectors(emb, m, subDim))
    pqAdcTopK(exploded, pqTrainedCodebook(exploded, m, nCode), k, m, None)
  }

  /** `sim_pq_trained` gate surface: trained-codebook PQ measured
    * against BOTH yardsticks at once — the exact L2 ranking (the
    * statistic ADC approximates) and a QUERY-BLIND sample codebook at
    * the identical code budget — and collapsed to verdicts the DuckDB
    * oracle predicts (the `sim_ivf_kmeans` discipline: per-row top-k
    * is float-summation-order sensitive under seeded k-means; TOTAL
    * hits over the query set are not, and the verdict margins below
    * sit multiple borderline-flips wide).
    *
    * Why query-blind: `pqTopK`'s deterministic codebook (lowest-nCode
    * vec_ids) CONTAINS the query vectors, so a query's neighbors
    * encode to the query's own codeword with near-zero ADC distance —
    * a query-aware advantage no real index build has (graft.PqEdge
    * measured it at +0.10–0.25 recall@5; the honest baseline,
    * codewords drawn past the query ids, scores 0.000/0.125/0.000 at
    * sf0.001/0.01/0.1 over 8 queries). Against that baseline k-means
    * training wins decisively at equal code budget — measured hits
    * over 64 queries × k=5 (320 slots): trained 52/49/17 vs
    * blind-sample 19/15/13 at sf0.001/0.01/0.1 (ge-margin 33/34/4
    * flips), and trained clears the 0.03 floor of 10 hits (chance ≈
    * k/n ≤ 0.01) with 42/39/7 flips of headroom. The gate runs a
    * WIDER query set (64) than the public top-k operators (8) purely
    * for verdict stability. n_queries and k are exact,
    * DuckDB-recomputed.
    */
  def pqTrainedGate(spark: SparkSession, dir: String, k: Int = TopK,
      m: Int = 4, subDim: Int = 16, nCode: Int = 16,
      minRecall: Double = 0.03, nQueries: Int = 64): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val wExact = Window.partitionBy(col("q_id"))
      .orderBy(col("d"), col("vec_id"))
    val exact = emb.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("d", sqL2(col("q_emb"), col("embedding")))
      .withColumn("rk", row_number().over(wExact))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"))
    // Stabilized for the same multi-consumer reason as pqTrainedTopK.
    val exploded = Stabilize(pqSubvectors(emb, m, subDim))
    val trained = pqAdcTopK(exploded,
      pqTrainedCodebook(exploded, m, nCode), k, m, None, nQueries)
    val blindSample = exploded
      .filter(col("vec_id") >= nQueries && col("vec_id") < nQueries + nCode)
      .select(col("j"), (col("vec_id") - nQueries).cast("int").as("c"),
        col("sv").as("cw"))
    val sampled = pqAdcTopK(exploded, blindSample, k, m, None, nQueries)
    def totalHits(approx: DataFrame, as: String): DataFrame =
      exact.join(broadcast(approx.select(col("q_id"), col("vec_id"),
          lit(1L).as("hit"))), Seq("q_id", "vec_id"), "left")
        .agg(sum(coalesce(col("hit"), lit(0L))).as(as))
    totalHits(trained, "t_hits")
      .crossJoin(totalHits(sampled, "s_hits"))
      .crossJoin(exact.agg(countDistinct(col("q_id")).as("n_queries")))
      .select(col("n_queries"), lit(k.toLong).as("k"),
        (col("t_hits").cast("double") >=
          lit(minRecall) * col("n_queries").cast("double") * k)
          .as("trained_ok"),
        (col("t_hits") >= col("s_hits")).as("trained_ge_sample"))
  }

  /** `sim_ivfpq_trained` gate surface: the HONEST billion-scale
    * composition — k-means coarse quantizer (the `sim_ivf_kmeans`
    * build) × k-means-trained PQ sub-quantizers (the `sim_pq_trained`
    * build) — where `sim_ivfpq_topk` still composes IVF with the
    * sample codebook PqEdge measured query-aware. The comparison
    * holds the coarse side CONSTANT (both arms rank the same k-means
    * probed candidate sets) and differs only in the PQ codebook:
    * trained vs the query-blind sample at the identical code budget —
    * so `trained_ge_sample` isolates exactly what training the
    * sub-quantizers buys inside the composed index. Verdict-collapsed
    * like its two parents (seeded k-means per-row rankings are
    * float-summation-order sensitive; total hits over 64 queries are
    * not). Measured hits over 64 queries × k=5 (320 slots, PqEdge
    * ivfpq_gate64 leg): trained 57/65/30 vs blind-sample 28/29/14 at
    * sf0.001/0.01/0.1 — ge-margin 29/36/16 flips, and trained clears
    * the 0.03·320 ≈ 10-hit floor with 47/55/20 flips of headroom.
    * (Trained-IVFPQ also beats FLAT trained PQ — 57 vs 52 hits at
    * sf0.001 — the trained coarse cells prune noise candidates the
    * full-corpus ADC scan still ranks.)
    *
    * Scale shape: both codebooks are driver-side by design (an IVF+PQ
    * index's quantizers are KB-sized and ship with the query); the
    * corpus full-precision vectors feed the two k-means fits and the
    * cell assignment, then only (vec_id, cell) and the m code columns
    * move — the ADC path never shuffles a full vector.
    */
  def ivfpqTrainedGate(spark: SparkSession, dir: String, k: Int = TopK,
      nprobe: Int = 4, nCells: Int = 16, m: Int = 4, subDim: Int = 16,
      nCode: Int = 16, minRecall: Double = 0.03,
      nQueries: Int = 64): DataFrame =
    ivfpqTrainedStats(spark, dir, k, nprobe, nCells, m, subDim, nCode,
        nQueries)
      .select(col("n_queries"), lit(k.toLong).as("k"),
        (col("t_hits").cast("double") >=
          lit(minRecall) * col("n_queries").cast("double") * k)
          .as("trained_ok"),
        (col("t_hits") >= col("s_hits")).as("trained_ge_sample"))

  /** One row (n_queries, t_hits, s_hits) behind `ivfpqTrainedGate` —
    * also read raw by graft.PqEdge's ivfpq leg, which records the
    * measured margins the gate's verdict thresholds rest on.
    */
  private[graft] def ivfpqTrainedStats(spark: SparkSession, dir: String,
      k: Int = TopK, nprobe: Int = 4, nCells: Int = 16, m: Int = 4,
      subDim: Int = 16, nCode: Int = 16, nQueries: Int = 64): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import spark.implicits._
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // exact L2 yardstick (the statistic ADC approximates)
    val wExact = Window.partitionBy(col("q_id"))
      .orderBy(col("d"), col("vec_id"))
    val exact = emb.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("d", sqL2(col("q_emb"), col("embedding")))
      .withColumn("rk", row_number().over(wExact))
      .filter(col("rk") <= k)
      .select(col("q_id"), col("vec_id"))
    // trained coarse quantizer: the ivfKMeansTopK build, shared by
    // both arms so the candidate sets are identical
    val feat = emb.withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans().setK(nCells).setSeed(42).setMaxIter(5).fit(feat)
    val assigned = model.transform(feat)
      .select(col("vec_id"), col("prediction").as("cell"))
    val cent = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }.toSeq.toDF("cell", "centroid")
    val wCell = Window.partitionBy(col("q_id"))
      .orderBy(col("cell_cos").desc, col("cell").asc)
    val probed = q.join(broadcast(cent))
      .withColumn("cell_cos", cosine(col("q_emb"), col("centroid")))
      .withColumn("cell_rk", row_number().over(wCell))
      .filter(col("cell_rk") <= nprobe)
      .select(col("q_id"), col("cell"))
    val cand = assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
    // Stabilized for the same multi-consumer reason as pqTrainedTopK.
    val exploded = Stabilize(pqSubvectors(emb, m, subDim))
    val trainedTop = pqAdcTopK(exploded,
      pqTrainedCodebook(exploded, m, nCode), k, m, Some(cand), nQueries)
    val blindSample = exploded
      .filter(col("vec_id") >= nQueries && col("vec_id") < nQueries + nCode)
      .select(col("j"), (col("vec_id") - nQueries).cast("int").as("c"),
        col("sv").as("cw"))
    val sampledTop = pqAdcTopK(exploded, blindSample, k, m, Some(cand), nQueries)
    def totalHits(approx: DataFrame, as: String): DataFrame =
      exact.join(broadcast(approx.select(col("q_id"), col("vec_id"),
          lit(1L).as("hit"))), Seq("q_id", "vec_id"), "left")
        .agg(sum(coalesce(col("hit"), lit(0L))).as(as))
    totalHits(trainedTop, "t_hits")
      .crossJoin(totalHits(sampledTop, "s_hits"))
      .crossJoin(exact.agg(countDistinct(col("q_id")).as("n_queries")))
      .select(col("n_queries"), col("t_hits"), col("s_hits"))
  }

  /** Nearest-centroid classification: assign every vector to its
    * closest label centroid and emit the (true label × predicted label)
    * confusion counts — the label-cleaning / propagation diagnostic a
    * training-data pipeline runs over weak labels. Centroid table is
    * tiny → broadcast; corpus scanned once.
    */
  def centroidClassify(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val cent = centroids(emb)
      .select(col("label").as("pred_label"), col("centroid"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("pred_label").asc)
    emb.join(broadcast(cent))
      .withColumn("cos", cosine(col("embedding"), col("centroid")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .groupBy(col("label"), col("pred_label"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("label"), col("pred_label"))
  }

  /** Corpus size above which rpLshPairs widens its bands from 8 to 16
    * bits. With FIXED 8-bit bands, bucket occupancy is ~n/256 per
    * band — LINEAR in corpus size — so candidate pairs grow ~n²/256:
    * the 100x soak (200k vectors) ground for >16 minutes generating
    * ~300M bucket pairs before being killed. Band width has to grow
    * with log(n) to hold occupancy constant; the cutoff keeps the
    * correctness-gate corpora (≤ 2k vectors) on the original 8-bit
    * banding bit-for-bit.
    */
  val RpAdaptiveCutoff = 4096L

  /** Second widening cutoff: above ~1M vectors even 16-bit bands
    * leave ~n/65536 per bucket (the 1000x soak at 2M vectors OOMed in
    * the candidate stage on ~100M bucket pairs), so banding switches
    * to 3 bands x 21 bits.
    */
  val RpWideCutoff = 1000000L

  /** Third widening cutoff. Band values are materialized PER BAND (no
    * packed 64-bit signature — see rpBandValues), so nothing caps
    * nb*bw at 64 bits anymore; above ~4M vectors the config jumps to
    * 6 bands x 26 bits = 156 signature bits. The switch is taken well
    * before tier 3 degrades (occupancy at 4M is still ~2 per 21-bit
    * bucket) because tier 4 dominates it on BOTH axes: occupancy
    * drops to ~n/2^26 (0.06 at 4M) AND recall at cos 0.99 rises from
    * 1-(1-p^21)^3 ≈ 0.76 to 1-(1-p^26)^6 ≈ 0.89 (p = 1-θ/π ≈ 0.955) —
    * doubling the band-table rows buys both. Past ~1B vectors the
    * same rule extends again (bw ≈ log2(n)+4, nb chosen for recall);
    * per-band storage puts no ceiling on either knob (bw ≤ 62).
    */
  val RpHugeCutoff = 4000000L

  /** Fourth widening cutoff, placed by MEASUREMENT rather than
    * extrapolation: the 16384x edge run (graft.RpEdge, SCALING.md)
    * showed within-tier candidate volume growing ~n²/2^26 exactly as
    * predicted — 1.17 cand/vec at 4.1M vectors (occupancy 0.06),
    * 9.4 at 32.8M (occupancy 0.49) — so tier 4's random-collision
    * component reaches parity with the real near-dup signal around
    * occupancy ~1 (n ≈ 2^26). The tier-extension rule the docs state
    * (bw ≈ log₂(n)+4) lands the next step at 64M: 6 × 30-bit bands
    * (occupancy back to ~0.06 at 64M, per-band recall at cos 0.99
    * p^30 ≈ 0.87, miss-all-6 ≈ 4e-6 — pinned by the tier-edge spec).
    */
  val RpVastCutoff = 64000000L

  /** (bands, bitsPerBand) for a corpus of n vectors — the rule the
    * oracle SQL replays. Occupancy per bucket is ~n/2^bits; each tier
    * holds it near or below ~15.
    */
  def rpBandConfig(n: Long): (Int, Int) =
    if (n <= RpAdaptiveCutoff) (4, 8)
    else if (n <= RpWideCutoff) (4, 16)
    else if (n <= RpHugeCutoff) (3, 21)
    else if (n <= RpVastCutoff) (6, 26)
    else (6, 30)

  /** Random-hyperplane band values (signed random projections): bit i
    * of band b is the sign of the vector's dot product with
    * pseudo-random hyperplane j = b*bw + i, whose ±1 components are
    * md5-derived per (j, position) — data-independent, reproducible on
    * any engine, no stored model.
    *
    * Shuffle-free AND allocation-free by construction: all nb·bw dots
    * accumulate in one codegen'd pass over each vector
    * ([[graft.functions.RpBandSignature]]), so banding is a pure MAP.
    * The original formulation (posexplode → broadcast-join a sign
    * table → groupBy(vec_id) over nb·bw partial sums) shuffled
    * n × nb·bw × 8 B of dot-product state — ~42 GB at 33.5M vectors
    * under the 156-bit tier (it filled the 16384x soak host's disk),
    * ~1.2 TB at 1B vectors. The only shuffle left in the LSH pipeline
    * is the (band_idx, band_val) self-join — the part that is
    * supposed to shuffle.
    *
    * Emits (vec_id, band_idx, band_val) DIRECTLY — each band's value
    * is its own ≤62-bit long, never packed into a single signature
    * word. This is what lets band width × band count scale past 64
    * total bits (tier 4 is 156 bits), and it is also what the DuckDB
    * oracle replays safely: the widest shift is bw-1 ≤ 61, so the
    * `1 << 63` overflow a packed-signature replay hits at exactly
    * 64 bits cannot occur. Band values are bit-identical to slicing
    * the old packed signature: band b = Σ_i (d_{b*bw+i} > 0) << i.
    * (Within each dot the summation is the sequential position order
    * rather than a partial-aggregation order; only the SIGN of the
    * dot feeds the bands, so band values are unchanged except on dots
    * within float rounding of zero — the same tolerance the
    * cross-engine oracle replay already lives with, re-verified
    * hash-green at the gate and candidate-identical at 4.1M vectors.)
    */
  def rpBandValues(emb: DataFrame, nb: Int, bw: Int): DataFrame = {
    require(bw <= 62, s"band width $bw exceeds a long's safe shift range")
    // fixed-dim embedding column; one metadata-cheap row read. Callers
    // may pass an EMPTY frame (cellBoundedPairs bands only oversized
    // cells, and often there are none) — banding nothing is nothing.
    val dim = emb.select(size(col("embedding"))).head(1)
      .headOption.map(_.getInt(0)).getOrElse(0)
    if (dim <= 0)
      emb.select(col("vec_id"), lit(0).as("band_idx"),
        lit(0L).as("band_val")).limit(0)
    else
      emb.select(col("vec_id"),
        posexplode(graft.functions.RpBandSignature
          .rpBandSignature(col("embedding"), nb, bw, dim))
          .as(Seq("band_idx", "band_val")))
  }

  /** Cosine near-dup pairs via random-hyperplane LSH: band the
    * signature bits into `nb` buckets of `bw` bits each, candidates =
    * any shared (band, value) bucket, verified with exact cosine ≥
    * threshold. Unlike the label-blocked variant this needs NO prior
    * clustering — the data-independent banding is the 100 TB path when
    * no coarse quantizer exists yet.
    *
    * Band config ADAPTS to corpus size (the oracle SQL replays the
    * same count-driven rule — see rpBandConfig for the four tiers):
    * occupancy per bucket is ~n/2^bw, so a fixed bw makes candidate
    * volume quadratic in n — the 100x soak proved it (see
    * RpAdaptiveCutoff). Wider bands trade per-band recall for bounded
    * candidates — the standard LSH move; adding bands buys the recall
    * back (at cos 0.99, 4 × 16-bit ≈ 0.93, 6 × 26-bit ≈ 0.89 with
    * p = 1-θ/π). Per-band value storage (rpBandValues) removes the
    * 64-bit packed-signature ceiling, so both knobs extend to any
    * corpus size.
    *
    * The corpus count that picks the band width is one metadata-cheap
    * aggregate (parquet footers), negligible against the pair scan.
    */
  /** Banded candidate pairs (id_a < id_b) for a given band width —
    * the blocking stage of rpLshPairs, exposed so the adaptive-width
    * spec can measure candidate volume directly.
    */
  private[graft] def rpCandidates(emb: DataFrame, nb: Int, bw: Int): DataFrame = {
    val bands = rpBandValues(emb, nb, bw).cache()
    bands.alias("x")
      .join(bands.alias("y"), Seq("band_idx", "band_val"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
      .distinct()
  }

  /** Probe-vector id offset — beyond any soak copy shift (copy*1e7 up
    * to 1000 copies) so planted ids can never collide with real ones.
    */
  val ProbeIdOffset = 1000000000000L

  /** Deterministic near-dup probes: the k lowest-id vectors, copied
    * with `x -> float(x*1.01 + 0.001)` (a scale + tiny offset — cosine
    * to the original ≈ 0.9999, NOT exactly 1). Both factors are exact
    * in double and the result is rounded back to float, so DuckDB's
    * `list_transform` replays the bytes bit-for-bit. Planted by the
    * correctness gate (probes=3) so the banding+verify path must
    * produce rows the oracle reproduces — the natural corpus has no
    * pair above cos 0.61, which left the r6 gate row vacuously green
    * (0 rows on both engines).
    */
  private def withProbes(emb: DataFrame, k: Int): DataFrame = {
    if (k <= 0) emb
    else {
      val probes = emb.orderBy(col("vec_id")).limit(k)
        .select((col("vec_id") + lit(ProbeIdOffset)).as("vec_id"),
          transform(col("embedding"),
            x => (x * lit(1.01) + lit(0.001)).cast("float")).as("embedding"))
      emb.unionByName(probes)
    }
  }

  def rpLshPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.5, probes: Int = 0): DataFrame = {
    val emb = withProbes(
      Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding")), probes)
    val (nb, bw) = rpBandConfig(emb.count())
    val cand = rpCandidates(emb, nb, bw)
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    cand.join(a, Seq("id_a")).join(b, Seq("id_b"))
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** k-NN graph (`sim_knn_graph`): every vector's k nearest neighbors
    * within its label cell — the building block of graph-based dedup
    * and cluster refinement. Blocking = the cell equi-join (pairs only
    * form inside a cell), ranking = a per-vector window with a
    * deterministic (cos desc, id asc) tie-break. At cluster scale the
    * cell is the IVF partition key, so each cell's self-join is
    * co-located and the stage is embarrassingly parallel; pair volume
    * is Σ|cell|², bounded by the quantizer's cell-size cap — never a
    * corpus-wide O(n²).
    */
  def knnGraph(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val nb = emb.select(col("label"), col("vec_id").as("nb_id"),
      col("embedding").as("nb_emb"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("nb_id").asc)
    emb.join(nb, Seq("label"))
      .filter(col("vec_id") =!= col("nb_id"))
      .withColumn("cos", cosine(col("embedding"), col("nb_emb")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("vec_id"), col("rk"), col("nb_id"), round(col("cos"), 6).as("cos"))
      .orderBy(col("vec_id"), col("rk"))
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

  /** Hybrid retrieval via reciprocal-rank fusion (`sim_rrf_fusion`):
    * the modern search-stack shape — a LEXICAL ranking (token-set
    * Jaccard of the query document against the corpus; doc_id and
    * vec_id share an id space) fused with a SEMANTIC ranking
    * (embedding cosine) by RRF: score = 1/(K+r_text) + 1/(K+r_vec).
    * Both rankings are full row_number orders with integral tie-breaks
    * (score desc, id asc), so the fused ranks — and therefore the
    * fused ORDER — are reproducible; the RRF sum is two exact
    * reciprocals of small ints. Each ranking is the same
    * broadcast-query single-scan shape as bruteforceTopK; the fusion
    * join is co-keyed on (q_id, id) — one shuffle each side. At scale
    * the two rankers prune to their own candidate sets (inverted
    * index / IVF) before fusion, unchanged fusion logic.
    */
  def rrfFusion(spark: SparkSession, dir: String,
      rrfK: Int = 60, topK: Int = 10): DataFrame = {
    import graft.functions.TextFunctions.words
    val docs = Spread(Tables.load(spark, dir, "documents"), col("doc_id"))
      .select(col("doc_id"), array_distinct(words(lower(col("text")))).as("toks"))
    val qd = docs.filter(col("doc_id") < NumQueries)
      .select(col("doc_id").as("q_id"), col("toks").as("q_toks"))
    val wt = Window.partitionBy(col("q_id"))
      .orderBy(col("jac").desc, col("doc_id").asc)
    val textRank = docs.join(broadcast(qd), col("doc_id") =!= col("q_id"))
      .withColumn("inter", size(array_intersect(col("toks"), col("q_toks"))).cast("long"))
      .withColumn("jac", col("inter").cast("double") /
        (size(col("toks")) + size(col("q_toks")) - col("inter")).cast("double"))
      .select(col("q_id"), col("doc_id").as("id"),
        row_number().over(wt).cast("long").as("r_text"))
    val emb = Tables.load(spark, dir, "embeddings")
    val qe = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val wv = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val vecRank = emb.join(broadcast(qe), col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
      .select(col("q_id"), col("vec_id").as("id"),
        row_number().over(wv).cast("long").as("r_vec"))
    val wf = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf").desc, col("id").asc)
    textRank.join(vecRank, Seq("q_id", "id"))
      .withColumn("rrf", lit(1.0) / (lit(rrfK) + col("r_text")) +
        lit(1.0) / (lit(rrfK) + col("r_vec")))
      .withColumn("rk", row_number().over(wf).cast("long"))
      .filter(col("rk") <= topK)
      .select(col("q_id"), col("rk"), col("id"), col("r_text"), col("r_vec"),
        round(col("rrf"), 6).as("rrf"))
      .orderBy(col("q_id"), col("rk"))
  }

  /** Embedding drift monitor (`sim_centroid_drift`): per label, the
    * cosine between the even-id and odd-id cohort centroids plus a
    * centroid-shift norm — the vector-space twin of q_psi (a healthy
    * random split drifts ≈ 0, i.e. cosine ≈ 1). Centroids are per-
    * position averages (the sim_pair_stats pattern: one combinable
    * aggregation per cohort, arrays never shuffled whole), and the
    * comparison is one cosine per label over 8-dim arrays.
    */
  def centroidDrift(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    def cohortCentroid(parity: Int, name: String) = emb
      .filter(col("vec_id") % 2 === parity)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v").cast("double")).as("m"), count(lit(1)).as("c"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"),
        (max(col("c"))).as(s"n_$name"))
      .select(col("label"), transform(col("pm"), x => x.getField("m")).as(name),
        col(s"n_$name"))
    val a = cohortCentroid(0, "cent_even")
    val b = cohortCentroid(1, "cent_odd")
    a.join(b, Seq("label"))
      .select(col("label"), col("n_cent_even").as("n_even"),
        col("n_cent_odd").as("n_odd"),
        round(cosine(col("cent_even"), col("cent_odd")), 6).as("cos_drift"))
      .orderBy(col("label"))
  }

  /** nprobe tuning sweep (`sim_nprobe_sweep`): mean recall@k of the
    * IVF probe at nprobe ∈ {1, 2, 3} against the exact ranking — the
    * latency/recall trade-off curve an ANN deployment is tuned on
    * (the recall twin of dedup_lsh_sweep's banding sweep). The exact
    * ranking is computed once; each nprobe costs one probed search
    * over the shared centroid table. Deterministic (label-cell
    * quantizer), so fully oracle-checked.
    */
  def nprobeSweep(spark: SparkSession, dir: String, k: Int = TopK,
      nprobes: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    import spark.implicits._
    val exact = bruteforceTopK(spark, dir, k)
      .select(col("q_id"), col("vec_id")).cache()
    val frames = nprobes.map { np =>
      val approx = ivfTopK(spark, dir, k, np)
        .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
      exact.join(broadcast(approx), Seq("q_id", "vec_id"), "left")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
          count(lit(1)).as("n_exact"))
        .select(lit(np.toLong).as("nprobe"), col("n_hits"), col("n_exact"),
          round(col("n_hits").cast("double") / col("n_exact").cast("double"), 6)
            .as("recall"))
    }
    frames.reduce(_.unionByName(_)).orderBy(col("nprobe"))
  }

  /** k-NN label classification (`sim_knn_classify`): vectors with
    * vec_id ≡ 0 (mod 5) play the UNLABELED set and are classified by
    * the majority label of their k=5 cosine-nearest LABELED vectors —
    * the label-spreading step of semi-supervised data cleaning (the
    * per-instance complement of sim_centroid_classify's per-class
    * prototype rule). Unlabeled side broadcasts; one corpus scan; the
    * vote is integral with (count desc, label asc) tie-break.
    */
  def knnClassify(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("true_label"))
    val labeled = emb.filter(col("vec_id") % 5 =!= 0)
    val wv = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val nn = labeled.join(broadcast(queries))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
      .withColumn("rk", row_number().over(wv))
      .filter(col("rk") <= k)
    val votes = nn.groupBy(col("q_id"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
    val wl = Window.partitionBy(col("q_id"))
      .orderBy(col("n_votes").desc, col("label").asc)
    votes.withColumn("vr", row_number().over(wl))
      .filter(col("vr") === 1)
      .select(col("q_id").as("vec_id"), col("label").as("predicted"),
        col("n_votes"), col("true_label"),
        (col("label") === col("true_label")).cast("long").as("correct"))
      .orderBy(col("vec_id"))
  }

  /** Sparse count-vector cosine over documents (`sim_sparse_cosine`):
    * the INVERTED-INDEX formulation of all-pairs doc similarity — the
    * only shape that survives corpus scale. Docs become (doc, token,
    * count) postings; the token equi-join enumerates exactly the pairs
    * that share a term (never the O(n²) cross product); the per-pair
    * dot product is Σ c_a·c_b. The vocabulary is clipped to tokens
    * with 2 ≤ df ≤ maxDf — df-1 tokens can't contribute to any pair,
    * and high-df (stopword-ish) tokens are what make posting lists —
    * and thus the join — quadratic; the clip bounds pair volume by
    * maxDf·Σdf, linear in the corpus. All accumulation is integral
    * (counts, dot, squared norms are BIGINT), so the cosine is ONE
    * double expression dot/(√na·√nb) written identically in both
    * engines — bit-stable, threshold compare included.
    */
  def sparseCosine(spark: SparkSession, dir: String, maxDf: Int = 50,
      minCos: Double = 0.4): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.words(lower(col("text")))).as("tok"))
    val counts = docs.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val vocab = counts.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select(col("tok"))
    val kept = counts.join(vocab, Seq("tok"))
    val norms = kept.groupBy(col("doc_id"))
      .agg(sum(col("c") * col("c")).as("nrm"))
    val dots = kept.as("a").join(kept.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(sum(col("a.c") * col("b.c")).as("dot"))
    val cosExpr = col("dot").cast("double") /
      (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))
    dots
      .join(norms.select(col("doc_id").as("id_a"), col("nrm").as("na")), Seq("id_a"))
      .join(norms.select(col("doc_id").as("id_b"), col("nrm").as("nb")), Seq("id_b"))
      .filter(cosExpr >= minCos)
      .select(col("id_a"), col("id_b"), col("dot"), round(cosExpr, 6).as("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
