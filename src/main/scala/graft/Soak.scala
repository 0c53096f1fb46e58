package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale soak: materialize K-times-sf0.1 datasets and run the
  * scale-critical operator families at 1x / 10x / 100x, so the "would
  * survive 100x" claims in the operator docs are CURVES, not prose
  * (docs/SCALING.md holds the recorded results).
  *
  * Scaled data (under /tmp/graft_soak/x<K>, generated once, reused):
  *
  *  - `documents` — K disjoint copies of the corpus. Copy 0 is the
  *    original; copy k > 0 keeps every column but deterministically
  *    PERMUTES the token order (sort by xxhash64(text, copy, position),
  *    pure array codegen — no shuffle). Token multisets — and so
  *    lengths, quality stats, Zipf mass — are preserved; shingle sets
  *    are randomized, so near-dup detectors do NOT pair a copy with its
  *    original and candidate volume stays linear, which is exactly the
  *    property real corpus growth has. Seeding the permutation by TEXT
  *    (not doc_id) keeps planted exact-dup groups intact within every
  *    copy, so dedup_exact's group structure scales linearly too.
  *  - `embeddings` — K copies with vec_id and label shifted per copy,
  *    and copy k > 0 passed through a deterministic diagonal ±1
  *    orthogonal transform (sign flip per (copy, position)). Within a
  *    copy ALL pairwise cosines are preserved (orthogonal transform),
  *    so planted near-dup structure grows linearly; ACROSS copies
  *    cosines decorrelate, so an unblocked detector (sim_rp_lsh) sees
  *    no copy-of-copy pairs — without the transform every original
  *    appears K times verbatim and the TRUE near-dup pair volume is
  *    K²/2 per original (~10⁹ pairs at 1000x), quadratic in the data
  *    itself, which no detector implementation can make linear. Cell
  *    SIZE stays constant while cell COUNT grows K-fold (what a grown
  *    corpus under the same quantizer does), so label-blocked pair
  *    volume also scales linearly.
  *  - `orders` / `events` / `lineitem` — K copies with keys shifted
  *    into disjoint ranges; o_totalprice gets +0.01*copy so the
  *    distinct-value count (the prefix-sum family's scale dimension)
  *    grows with K instead of saturating.
  *  - dimension tables are copied verbatim (they stay broadcast-sized
  *    at any corpus scale — that is their design point).
  *
  * Usage: runMain graft.Soak [scales] [queries]
  *   scales  comma list, default "1,10,100"
  *   queries comma list, default the soak set below
  * Emits one JSON line per (scale, query) AS IT FINISHES (partial runs
  * still yield data) plus a per-scale total, and appends everything to
  * soak_results.jsonl.
  */
object Soak {

  /** The scale-critical set: the most expensive headline queries plus
    * the whole prefix-sum and dedup families (VERDICT r5 next-round
    * item 2).
    */
  val soakQueries: Seq[String] = Seq(
    // classic scan-agg baseline
    "q1_pricing_summary",
    // prefix-sum family (two-phase cumsum discipline)
    "q_histogram_equi", "q_rfm", "q_psi", "q_decile_lift", "q_gini",
    "q_mwu_test", "q_time_to_convert",
    // dedup family
    // dedup_minhash itself is NOT here: its uncapped pair frontier is
    // quadratic on the twin-heavy soak corpus and cannot complete at
    // 100x on this host (docs/SCALING.md round 13) — dedup_incremental
    // is the witness-capped shape that soaks instead
    "dedup_exact", "dedup_minhash_oph", "dedup_ngram_jaccard",
    "dedup_span", "dedup_containment", "dedup_semantic", "dedup_embedding",
    "dedup_incremental", "dedup_substring", "dedup_substring_apply",
    "dedup_substring_incremental",
    // text curation
    "text_quality", "text_boilerplate", "text_keywords",
    "text_curriculum", "text_sentence_dedup", "text_dsir",
    // similarity + multimodal packing
    "sim_bruteforce_topk", "mm_shard_pack",
    // joins whose shape is the scale story: streaming-merge as-of,
    // bucket-bounded range, salt-split skew join, star broadcast
    "q_asof_join", "q_range_join", "q_salted_join_agg", "q_star_join_agg",
    // event-sequence + graph + basket self-joins
    "q_sessionize", "q_market_basket", "q_pagerank",
    // banded embedding pairs + benchmark-contamination gram join
    "sim_rp_lsh", "text_contamination",
    // round 15: the composed seven-stage corpus pipeline + its
    // attrition report (every stage already soaks piecemeal above;
    // the composition's own curve is the end-to-end claim) and the
    // URL canonicalization pass (expected flat — pure projection +
    // bounded windows)
    "pipe_llm_corpus", "pipe_report", "text_url_canon")

  private val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  private val root = "/tmp/graft_soak"

  /** K disjoint copies. The base table is re-split across the worker
    * count BEFORE the explode: the sf0.1 bases are single parquet
    * files (one input split), and exploding x1000 before any exchange
    * would run the whole 600M-row expansion on ONE core — the exact
    * single-file lesson the soak taught for the OUTPUT side (see
    * write()), applied to the input side.
    */
  private def copies(df: DataFrame, k: Int): DataFrame =
    df.repartition(32)
      .withColumn("copy", explode(sequence(lit(0), lit(k - 1))))

  /** Deterministic per-copy token permutation — see class doc. */
  private def permutedDocs(docs: DataFrame, k: Int): DataFrame = {
    val toks = split(col("text"), " ")
    val permuted = array_join(
      transform(
        array_sort(
          transform(toks, (t, i) =>
            struct(xxhash64(col("text"), col("copy"), i).as("h"), t.as("t")))),
        s => s.getField("t")),
      " ")
    copies(docs, k)
      .select(
        (col("doc_id") + col("copy") * 10000000L).as("doc_id"),
        when(col("copy") === 0, col("text")).otherwise(permuted).as("text"),
        col("lang"), col("source"), col("n_chars"))
  }

  /** Corpus-family queries read only documents/embeddings; the fact
    * tables (orders/events/lineitem — ~16 GB at 1000x) materialize
    * only when a requested query actually needs them.
    */
  private def corpusOnly(q: String): Boolean =
    Seq("dedup_", "text_", "sim_", "mm_", "pipe_").exists(q.startsWith)

  /** Queries that read ONLY the embeddings table — an embeddings-only
    * soak (e.g. sim_rp_lsh at 2048x to activate the tier-4 banding at
    * >4M vectors) skips the far more expensive permuted-documents
    * expansion.
    */
  private def embeddingsOnly(q: String): Boolean =
    q.startsWith("sim_") ||
      Set("dedup_embedding", "dedup_semantic", "dedup_semantic_sweep")
        .contains(q)

  /** Bump whenever a generator's SEMANTICS change (not just perf):
    * a pre-change /tmp/graft_soak/x* layout would otherwise be
    * silently reused by the per-table _SUCCESS skip and invalidate
    * the measurements (r6 ADVICE: the per-copy orthogonal sign-flip
    * changed embeddings semantics but old dirs kept quadratic
    * verbatim copies). v2 = sign-flipped embeddings + text-seeded
    * doc permutation. v3 = timestamp columns carried as session-TZ
    * TIMESTAMP: engine-written parquet embeds the Spark schema in the
    * footer, and a pre-flip corpus pins TIMESTAMP_NTZ through that
    * metadata REGARDLESS of the session's inferTimestampNTZ=false —
    * keeping every date filter over the corpus on the inert-pushdown
    * path the flip exists to close (round 12).
    */
  val GeneratorVersion = 3

  /** Public so Bench's per-round 10x regression guard reuses the same
    * generator (and its version gate).
    */
  def materialize(spark: SparkSession, k: Int,
      needFacts: Boolean, needDocs: Boolean = true): String = {
    val dir = s"$root/x$k"
    // Version gate: a layout built by a different generator version is
    // regenerated wholesale instead of trusted table-by-table.
    val marker = new java.io.File(s"$dir/_SOAK_SCHEMA")
    val stale = new java.io.File(dir).exists() && {
      val v = if (marker.exists())
        scala.util.Try(
          new String(java.nio.file.Files.readAllBytes(marker.toPath)).trim.toInt
        ).getOrElse(-1)
      else -1
      v != GeneratorVersion
    }
    if (stale) {
      System.err.println(s"[soak] $dir was built by generator v!=" +
        s"$GeneratorVersion — deleting and regenerating")
      def rm(f: java.io.File): Unit = {
        // listFiles() is null (not empty) on I/O error or racing delete
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
    System.err.println(s"[soak] materializing $dir (existing tables kept) ...")
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(marker.toPath,
      GeneratorVersion.toString.getBytes): Unit
    def t(name: String) = graft.sources.Tables.load(spark, base, name)
    // Multi-file output layout comes from `copies`' INPUT-side
    // repartition (32 splits before the explode), so each expansion
    // writes 32 files without a second corpus-wide shuffle after the
    // explode. The first soak run showed why layout matters: a 53 MB
    // single-file 100x documents table serialized the whole shingle
    // pipeline onto one core (160 s of a 231 s query). File layout is
    // part of the scale contract.
    // Per-table idempotence (skip tables already written): lets a
    // schema fix to ONE table regenerate just that table by deleting
    // its directory, without rebuilding the whole scale dir.
    def write(df: DataFrame, name: String): Unit =
      if (!new java.io.File(s"$dir/$name.parquet/_SUCCESS").exists())
        df.write.mode("overwrite").parquet(s"$dir/$name.parquet")

    if (needDocs) write(permutedDocs(t("documents"), k), "documents")
    val flipped = transform(col("embedding"), (x, i) =>
      when(col("copy") === 0 || pmod(xxhash64(col("copy"), i), lit(2)) === 0, x)
        .otherwise(-x))
    write(copies(t("embeddings"), k).select(
      (col("vec_id") + col("copy") * 10000000L).as("vec_id"),
      flipped.as("embedding"),
      (col("label") + col("copy") * 10000).cast("int").as("label")),
      "embeddings")
    if (needFacts) {
    write(copies(t("orders"), k).select(
      (col("o_orderkey") + col("copy") * 100000000L).as("o_orderkey"),
      (col("o_custkey") + col("copy") * 10000000L).as("o_custkey"),
      col("o_orderstatus"),
      round(col("o_totalprice") + col("copy") * 0.01, 2).as("o_totalprice"),
      col("o_orderdate"), col("o_orderpriority")), "orders")
    write(copies(t("events"), k).select(
      (col("event_id") + col("copy") * 100000000L).as("event_id"),
      col("ts"),
      (col("user_id") + col("copy") * 10000000L).as("user_id"),
      col("event_type"), col("value"), col("props")), "events")
    write(copies(t("lineitem"), k)
      .withColumn("l_orderkey", col("l_orderkey") + col("copy") * 100000000L)
      .drop("copy"), "lineitem")
    }
    for (name <- Seq("region", "nation", "customer", "supplier", "part"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$base/$name.parquet"),
        java.nio.file.Paths.get(s"$dir/$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    System.err.println(s"[soak] $dir ready")
    dir
  }

  def main(args: Array[String]): Unit = {
    val scales = args.headOption.filter(_.nonEmpty)
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(1, 10, 100))
    val picked = args.drop(1).headOption.filter(_.nonEmpty)
      .map(_.split(",").toSeq.filter(soakQueries.contains))
      .getOrElse(soakQueries)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = GraftSession
      .builder(master = master, shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sink = new java.io.PrintWriter(
      new java.io.FileWriter("soak_results.jsonl", true))
    def emit(line: String): Unit = {
      println(line); sink.println(line); sink.flush()
    }
    // codegen warm-up on the smallest data so scale-1 timings are plans,
    // not classloading
    SparkEntry.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    for (k <- scales.sorted) {
      val dir = materialize(spark, k,
        needFacts = picked.exists(q => !corpusOnly(q)),
        needDocs = picked.exists(q => !embeddingsOnly(q)))
      var total = 0.0
      // Two passes at EVERY scale, reported separately: sec_cold is
      // the first pass (includes substrate cache build + codegen),
      // sec is the min. Growth factors must compare cold-to-cold —
      // the first soak design ran one pass at 100x but min-of-two at
      // smaller scales, and the warm substrate cache (the deliberate
      // Dedup cross-query cache) made the 10x points reflect CACHED
      // re-runs, inflating the 10x->100x factor into a spurious
      // super-linear flag for the dedup family.
      val passes = if (k >= 1000) 1 else 2
      // Per-row steal annotation (the round-15 discipline — see
      // Bench/IndexSoak): no retries here (growth factors compare
      // cold-to-cold, so synthetic extra passes would change the
      // semantics), but every row records whether its window was
      // quiet so a contaminated curve is diagnosable from the row.
      // Sampling + threshold live in graft.StealGate since round 16
      // (ADVICE r15: the 25 j/s gate was hardcoded here).
      for (name <- picked) {
        SparkEntry.queries.get(name).foreach { fn =>
          try {
            val s0 = StealGate.stealNow()
            val t0All = System.nanoTime()
            val times = (1 to passes).map { _ =>
              val t0 = System.nanoTime()
              fn(spark, dir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9
            }
            val sd = StealGate.delta(s0, StealGate.stealNow())
            val wallAll = (System.nanoTime() - t0All) / 1e9
            val quiet = StealGate.quietWindow(sd, wallAll)
            val sec = times.min
            total += sec
            emit(f"""{"metric":"soak","scale":$k,"query":"$name","sec":$sec%.3f,"sec_cold":${times.head}%.3f,"quiet":$quiet,"steal":$sd}""")
          } catch { case e: Throwable =>
            emit(s"""{"metric":"soak","scale":$k,"query":"$name","error":"${
              Option(e.getMessage).getOrElse(e.getClass.getName)
                .replaceAll("[\"\\n]", " ").take(160)}"}""")
          }
        }
      }
      emit(f"""{"metric":"soak_total","scale":$k,"sec":$total%.3f,"n":${picked.size}}""")
    }
    sink.close()
    spark.stop()
  }
}
