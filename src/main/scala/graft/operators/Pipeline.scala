package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.sources.Tables

/** Composed end-to-end LLM-corpus pipeline (`pipe_llm_corpus`) — the
  * training-data twin of `q_fusion_etl` (which plays this role for the
  * reference's fusion flow, etl_ecollision_fusion_table_collisions.py:
  * 55-135): every stage exists as its own oracle-gated operator, but
  * only a composed gate verifies the column contracts BETWEEN stages,
  * which is exactly the class of bug a per-stage gate can't see.
  *
  * Seven chained stages, each consuming the previous stage's survivor
  * frame (not the raw corpus):
  *
  *   1. '''Gopher structural filter''' — keep docs passing all four
  *      word-level Gopher rules (TextFunctions.gopherRules).
  *   2. '''Exact dedup''' — min-doc_id survivor per normalized-text
  *      fingerprint, within stage-1 survivors (Dedup.exactOf).
  *   3. '''Near-dup cluster survivorship''' — MinHash LSH pairs +
  *      connected components over stage-2 survivors; keep the
  *      min-doc_id canonical doc per cluster (Dedup.nearDupClustersOf).
  *   4. '''Substring scrub''' — maximal duplicated token spans cut out
  *      of each surviving doc; the SCRUBBED text (not the original)
  *      flows downstream (Dedup.applySpans over substringSpansOf).
  *   5. '''Decontamination''' — eval slice = doc_id % 97 = 0 of the
  *      ORIGINAL corpus (a benchmark is defined outside the pipeline);
  *      eval docs leave the training set here, and survivors keep only
  *      docs whose scrubbed text shares < 5% of its distinct 8-token
  *      windows with the eval gram set.
  *   6. '''Mixture sampling''' — per-source token budgets (40% global
  *      budget × mixtureWeights permille) over SCRUBBED token counts;
  *      integral DIV arithmetic + deterministic md5-bucket accept, so
  *      the survivor set is a pure function of the corpus.
  *   7. '''Batch packing''' — doc_id-ordered running token total via
  *      the two-phase scalable prefix sum (Prefix.runningSum);
  *      batch_id = floor(tokens_before / capacity).
  *
  * Output: one row per shipped document — (doc_id, source, n_tok,
  * scrub_h, batch_id) — n_tok the scrubbed token count, scrub_h the
  * 60-bit hash of the scrubbed text, so the oracle hash pins every
  * stage's effect on the final corpus byte-for-byte.
  *
  * Scale shape: no stage introduces a shape its standalone operator
  * doesn't already have — the semi-joins between stages are keyed on
  * doc_id (survivor id sets, far smaller than the corpus), the scrub
  * text rides per-doc rows (never a corpus-wide sort), and the one
  * global ordering (packing) is the broadcast-offset prefix sum.
  */
object Pipeline {

  /** The stage survivor frames, shared by the corpus gate and the
    * attrition report. s1–s3 are full-width document frames; s4–s6
    * carry (doc_id, source, n_tok, scrub) with n_tok the SCRUBBED
    * token count.
    */
  private def stageFrames(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame,
         DataFrame, DataFrame, DataFrame) = {
    val docs = Tables.load(spark, dir, "documents")

    // Stage 1 — Gopher structural quality filter.
    val gopherKeep = TextFunctions.gopherRules(spark, dir)
      .filter(col("keep") === 1L).select(col("doc_id"))
    val s1 = docs.join(gopherKeep, Seq("doc_id"), "left_semi")

    // Stage 2 — exact dedup within stage-1 survivors.
    val exactKeep = Dedup.exactOf(s1).select(col("keep_id").as("doc_id"))
    val s2 = s1.join(exactKeep, Seq("doc_id"), "left_semi")

    // Stage 3 — minhash near-dup cluster survivorship within s2.
    val clusterKeep = Dedup.nearDupClustersOf(s2)
      .filter(col("keep") === 1L).select(col("doc_id"))
    val s3 = s2.join(clusterKeep, Seq("doc_id"), "left_semi")

    // Stage 4 — substring scrub: spans detected within s3 only, the
    // scrubbed text replaces the original downstream.
    val scrubbed = Dedup.applySpans(s3, Dedup.substringSpansOf(s3))
      .select(col("doc_id"), col("n_kept").as("n_tok"), col("scrub"))
    val s4 = s3.select(col("doc_id"), col("source"))
      .join(scrubbed, Seq("doc_id"))

    // Stage 5 — decontamination. Eval grams come from the ORIGINAL
    // corpus's held-out slice (the benchmark exists independent of any
    // pipeline filtering); training docs are scored on their SCRUBBED
    // text and drop out at ≥5% overlap. Eval-slice ids leave the
    // training corpus here too.
    def grams(d: DataFrame, textCol: String): DataFrame = d
      .select(col("doc_id"),
        TextFunctions.words(lower(col(textCol))).as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(
          TextFunctions.hashedTokenWindows(col("toks"), 8))).as("h"))
    val evalGrams = grams(docs.filter(col("doc_id") % 97 === 0), "text")
      .select(col("h")).distinct().withColumn("hit", lit(1L))
    val train = s4.filter(col("doc_id") % 97 =!= 0)
    val contam = grams(train, "scrub")
      .join(broadcast(evalGrams), Seq("h"), "left")
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .filter(col("n_hit").cast("double") >=
        lit(0.05) * col("n_grams").cast("double"))
      .select(col("doc_id"))
    val s5 = train.join(contam, Seq("doc_id"), "left_anti")

    // Stage 6 — token-budget mixture sampling over scrubbed counts
    // (same integral arithmetic as text_mixture_sample: budget_s =
    // (total*40 DIV 100)*w‰ DIV 1000, accept‰ = min(1000,
    // budget_s*1000 DIV tok_s), deterministic md5 bucket).
    import spark.implicits._
    val perSource = s5.groupBy(col("source")).agg(sum(col("n_tok")).as("tok_s"))
    val total = perSource.agg(sum(col("tok_s")).as("tok_total"))
    val weights = TextFunctions.mixtureWeights.toDF("source", "w_permille")
    val rates = perSource
      .join(broadcast(weights), Seq("source"))
      .crossJoin(broadcast(total))
      .withColumn("budget_s",
        expr("(tok_total * 40 DIV 100) * w_permille DIV 1000"))
      .withColumn("accept_permille",
        least(lit(1000L), expr("budget_s * 1000 DIV tok_s")))
      .select(col("source"), col("accept_permille"))
    val bucket = pmod(
      conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 7),
        16, 10).cast("long"), lit(1000L))
    val s6 = s5.join(broadcast(rates), Seq("source"))
      .filter(bucket < col("accept_permille"))

    (docs, s1, s2, s3, s4, s5, s6)
  }

  def llmCorpus(spark: SparkSession, dir: String,
      capacity: Long = 512L): DataFrame = {
    val (_, _, _, _, _, _, s6) = stageFrames(spark, dir)
    // Stage 7 — batch packing: scalable two-phase prefix sum over
    // doc_id order (doc_id is unique — Prefix.runningSum's contract).
    Prefix.runningSum(
        s6.select(col("doc_id"), col("source"), col("n_tok"), col("scrub")),
        col("n_tok"), "cum", Seq(col("doc_id")))
      .select(col("doc_id"), col("source"), col("n_tok"),
        Dedup.md5Bits(col("scrub"), 1, 15).as("scrub_h"),
        floor((col("cum") - col("n_tok")).cast("double") / capacity)
          .cast("long").as("batch_id"))
      .orderBy(col("doc_id"))
  }

  /** Per-stage attrition report (`pipe_report`): where the corpus went
    * — one row per pipeline stage with surviving docs and tokens (raw
    * word counts through the detection stages, SCRUBBED counts from
    * the scrub stage on, where tokens can shrink without docs
    * disappearing). This is the dashboard a data team reads before
    * shipping a mixture; the composed-gate twin of `dedup_report`.
    *
    * Cost honesty: each stage aggregates to ONE row (map-side
    * combinable), but Catalyst does not share subplans across union
    * branches, so each branch recomputes its stage prefix — measured
    * at the 10x soak the whole report costs about one pipeline run
    * (40.2 s vs 38.4 s; the late stages dominate and appear once per
    * chain anyway). A production run that wants the report for free
    * materializes the stage frames it is already shipping and
    * aggregates those.
    */
  def llmReport(spark: SparkSession, dir: String): DataFrame = {
    val (docs, s1, s2, s3, s4, s5, s6) = stageFrames(spark, dir)
    def aggRaw(df: DataFrame, no: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(TextFunctions.nWords(lower(col("text")))), lit(0L))
            .as("n_tokens"))
        .select(lit(no.toLong).as("stage_no"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
    def aggScrub(df: DataFrame, no: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("n_tok")), lit(0L)).as("n_tokens"))
        .select(lit(no.toLong).as("stage_no"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
    aggRaw(docs, 0, "raw")
      .unionAll(aggRaw(s1, 1, "gopher"))
      .unionAll(aggRaw(s2, 2, "exact_dedup"))
      .unionAll(aggRaw(s3, 3, "cluster_dedup"))
      .unionAll(aggScrub(s4, 4, "substring_scrub"))
      .unionAll(aggScrub(s5, 5, "decontaminate"))
      .unionAll(aggScrub(s6, 6, "mixture_sample"))
      .orderBy(col("stage_no"))
  }
}
