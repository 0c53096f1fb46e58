package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Pipeline}
import graft.functions.TextFunctions

/** Fast invariants over the composed LLM-corpus pipeline — the hash
  * contract itself lives in the DuckDB oracle (`pipe_llm_corpus`);
  * these pin the properties a reader reasons with: stage containment,
  * eval exclusion, dedup canonicality, and the packing replay.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val out = Pipeline.llmCorpus(spark, sf).cache()

  test("pipeline ships a non-empty, duplicate-free corpus") {
    val ids = out.select("doc_id").as[Long].collect()
    assert(ids.nonEmpty)
    assert(ids.distinct.length == ids.length)
  }

  test("survivors passed the Gopher filter and exclude the eval slice") {
    val gopherKeep = TextFunctions.gopherRules(spark, sf)
      .filter(col("keep") === 1L).select("doc_id").as[Long].collect().toSet
    val ids = out.select("doc_id").as[Long].collect()
    assert(ids.forall(gopherKeep.contains))
    assert(ids.forall(_ % 97 != 0))
  }

  test("survivors are exact-dedup canonical within the gopher slice") {
    // stage-2 contract: every shipped doc is the min-doc_id owner of
    // its normalized-text fingerprint AMONG gopher survivors
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val gopherKeep = TextFunctions.gopherRules(spark, sf)
      .filter(col("keep") === 1L).select("doc_id")
    val s1 = docs.join(gopherKeep, Seq("doc_id"), "left_semi")
    val keep = Dedup.exactOf(s1).select(col("keep_id")).as[Long].collect().toSet
    val ids = out.select("doc_id").as[Long].collect()
    assert(ids.forall(keep.contains))
  }

  test("attrition report: monotone, 7 stages, final row equals the shipped corpus") {
    val rep = Pipeline.llmReport(spark, sf)
      .select("stage_no", "stage", "n_docs", "n_tokens")
      .as[(Long, String, Long, Long)].collect()
    assert(rep.map(_._1).toSeq == (0L to 6L))
    // docs and tokens never grow through the pipeline (scrub shrinks
    // tokens without dropping docs; filters drop docs)
    assert(rep.map(_._3).sliding(2).forall(p => p(0) >= p(1)))
    assert(rep.map(_._4).sliding(2).forall(p => p(0) >= p(1)))
    // the mixture_sample row IS the shipped corpus
    val shipped = out.agg(count(lit(1)), coalesce(sum(col("n_tok")), lit(0L)))
      .as[(Long, Long)].collect()(0)
    assert((rep.last._3, rep.last._4) == shipped)
  }

  test("batch packing replays as the doc_id-ordered running-sum formula") {
    val rows = out.select("doc_id", "n_tok", "batch_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    var cum = 0L
    rows.foreach { case (_, nTok, batchId) =>
      assert(batchId == cum / 512L, s"cum=$cum n_tok=$nTok got=$batchId")
      cum += nTok
    }
    // monotone batch ids, starting at 0 when anything shipped
    assert(rows.isEmpty || rows.head._3 == 0L)
    assert(rows.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("decontamination route-equivalence: the forced shuffle route " +
    "(evalBroadcastMax=0) ships the identical corpus") {
    // evalBroadcastMax=0 forces the over-threshold branch — the exact
    // plan a corpus too large to broadcast its eval grams would get —
    // and must be row-identical to the broadcast route the gate runs.
    val forced = Pipeline.llmCorpus(spark, sf, evalBroadcastMax = 0L)
      .collect().toSeq
    assert(forced == out.collect().toSeq)
  }

  test("materialized-stage report is row-identical to the recompute " +
    "report, and the landed frames replay each stage exactly") {
    val rec = Pipeline.llmReport(spark, sf).collect().toSeq
    val stages = Pipeline.materializeStageFrames(spark, sf)
    val mat = Pipeline.llmReportFrom(spark, sf, stages).collect().toSeq
    assert(mat == rec)
    // the landed final frame IS the shipped survivor set (s6 = the
    // corpus before packing)
    val s6Ids = spark.read.parquet(s"$stages/s6.parquet")
      .select("doc_id").as[Long].collect().toSet
    assert(s6Ids == out.select("doc_id").as[Long].collect().toSet)
  }
}
