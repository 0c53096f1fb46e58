package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.sources.Tables

/** Document deduplication family for a training-data pipeline.
  *
  * Scale posture: none of these is O(n²). Every near-dup variant blocks
  * candidates first — shingle equality, LSH bands, or hamming bands —
  * so the pairwise verify only touches rows that already share a bucket.
  * The bucket tables are (bucket_key, doc_id) shuffles that scale
  * linearly with corpus size; the verify join is bounded by bucket
  * occupancy, which the band/shingle width controls.
  */
object Dedup {

  /** Word-trigram shingles as distinct (doc_id, shingle) pairs — the
    * common substrate of the jaccard and minhash paths.
    */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    // Materialize the token array as a column BEFORE the shingle
    // lambda: referencing the tokenizer expression inside the lambda
    // would re-run the regexp once per shingle index (no common
    // subexpression elimination across higher-order functions) — a 10×
    // slowdown measured at sf0.1.
    val toks = col("toks")
    // sequence(a, b) is descending when a > b, so guard short docs with
    // an explicit empty index list instead.
    val idx = when(size(toks) >= n, sequence(lit(0), size(toks) - n))
      .otherwise(array().cast("array<int>"))
    val sh = transform(idx, i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    docs
      .select(col("doc_id"), TextFunctions.words(lower(col("text"))).as("toks"))
      .select(col("doc_id"), explode(sh).as("shingle"))
      .distinct()
  }

  /** Exact dedup: md5 over normalized text, one map-side-combinable
    * aggregation. keep_id = min(doc_id) is the survivor-selection rule.
    */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        md5(TextFunctions.normText(col("text")).cast("binary")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy(col("fp"))

  /** N-gram Jaccard near-dup pairs. Blocking = the shingle-equality join
    * itself (only docs sharing ≥1 trigram ever meet); intersection
    * counted per pair, union from per-doc cardinalities. One shuffle on
    * shingle, one on the pair key.
    */
  /** Optional hot-shingle guard: drop shingles present in more than
    * `maxDf` documents before the pairwise join. Ubiquitous shingles
    * carry no near-dup signal but dominate the self-join cost
    * (sum of per-shingle count² — quadratic in the hottest key). At
    * web-corpus scale this bound is what keeps the join linear; None
    * keeps exact semantics for the oracle comparison.
    */
  def boundedShingles(docs: DataFrame, maxDf: Option[Int]): DataFrame = {
    val sh = shingles(docs)
    maxDf.fold(sh) { df =>
      val hot = sh.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") > df)
        .select(col("shingle"))
      sh.join(hot, Seq("shingle"), "left_anti")
    }
  }

  def ngramJaccard(spark: SparkSession, dir: String,
      threshold: Double = 0.4, maxDf: Option[Int] = None): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val sh = boundedShingles(docs, maxDf).cache()
    val card = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("doc_id").as("id_a"), col("shingle"))
    val b = sh.select(col("doc_id").as("id_b"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(card.select(col("doc_id").as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(card.select(col("doc_id").as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val MinhashK = 32
  val MinhashBands = 8 // 4 rows per band

  /** MinHash signatures: sig_i = min over shingles of xxhash64(i, shingle).
    * One aggregation produces all K components (no K passes over the
    * corpus); the signature row is K longs wide.
    */
  def minhashSignatures(docs: DataFrame): DataFrame =
    signaturesFromShingles(shingles(docs))

  def signaturesFromShingles(sh: DataFrame): DataFrame = {
    val sigCols = (0 until MinhashK).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"sig_$i"))
    sh.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
  }

  /** MinHash + LSH banding: band_j = hash of 4 consecutive signature
    * components; docs sharing any (band_idx, band_hash) bucket become
    * candidates; candidates are verified with exact trigram Jaccard.
    * The band table is (band, doc) — linear in corpus size — and the
    * verify join touches only bucketed pairs.
    */
  def minhashPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.7): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    // One shingle pass feeds both the signature build and the exact
    // verify — cached so the corpus is tokenized once.
    val sh = shingles(docs).cache()
    val sigs = signaturesFromShingles(sh)
    val rowsPerBand = MinhashK / MinhashBands
    val bandArr = array((0 until MinhashBands).map { bIdx =>
      val comps = (0 until rowsPerBand).map(r => col(s"sig_${bIdx * rowsPerBand + r}"))
      xxhash64((lit(bIdx) +: comps): _*)
    }: _*)
    // The band table is referenced twice (both sides of the self-join)
    // and the candidate set three times (id pruning + semi-join) —
    // cache both; they are tiny relative to the corpus (8 rows/doc and
    // the near-dup pair set respectively).
    val bands = sigs.select(col("doc_id"), posexplode(bandArr).as(Seq("band_idx", "band_hash")))
      .cache()
    val cand = bands.alias("x")
      .join(bands.alias("y"), Seq("band_idx", "band_hash"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
      .cache()
    // Exact-Jaccard verify restricted to the candidate set: prune the
    // shingle table to candidate docs first (left-semi), shingle-join
    // only within that small set, then keep bucketed pairs. At scale
    // candidate docs ≪ corpus, so the pairwise stage never sees the
    // full shingle table.
    val candIds = cand.select(col("id_a").as("doc_id"))
      .union(cand.select(col("id_b").as("doc_id"))).distinct()
    val shC = sh.join(candIds, Seq("doc_id"), "left_semi")
    val card = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = shC.select(col("doc_id").as("id_a"), col("shingle"))
      .join(shC.select(col("doc_id").as("id_b"), col("shingle")), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(cand, Seq("id_a", "id_b"), "left_semi")
    inter
      .join(card.select(col("doc_id").as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(card.select(col("doc_id").as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** 64-bit SimHash over word unigrams: per bit, sum +1/-1 by whether
    * xxhash64(word) has that bit set; the signature bit is the sign.
    * All 64 bit-sums come out of ONE aggregation over the exploded
    * token table.
    */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextFunctions.words(lower(col("text")))).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"b_$j")
    }
    val agg = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64).map { j =>
      when(col(s"b_$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs: block on 16-bit bands (a pair within
    * hamming distance ≤ maxHamming of 64 bits must agree on at least one
    * of the 4 bands when maxHamming < 4... pigeonhole holds for ≤ 3 band
    * mismatches; maxHamming ≤ 3 guarantees a shared band), then verify
    * with bit_count(xor).
    */
  def simhashPairs(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val sigs = simhashSignatures(docs)
    val bandArr = array((0 until 4).map { j =>
      shiftright(col("simhash"), j * 16).bitwiseAND(lit(0xFFFFL))
    }: _*)
    // Cache: the self-join would otherwise recompute the 64-column
    // bit-sum aggregation for both sides.
    val bands = sigs.select(col("doc_id"), col("simhash"),
      posexplode(bandArr).as(Seq("band_idx", "band_val")))
      .cache()
    val pairs = bands.alias("x")
      .join(bands.alias("y"), Seq("band_idx", "band_val"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        col("x.simhash").as("sim_a"), col("y.simhash").as("sim_b"))
      .distinct()
    pairs
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Embedding-cosine near-dup pairs, label-blocked (IVF-style: the
    * label is the coarse quantizer cell; only same-cell pairs are
    * scored). Cosine runs in the native codegen expression.
    */
  def embeddingPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.3): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val a = emb.select(col("label"), col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = emb.select(col("label"), col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, Seq("label"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        graft.functions.VectorFunctions.cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
