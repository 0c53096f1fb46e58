package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Lifecycle of the persisted dedup indexes: append-only growth is the
  * operational scale risk the round-13 verdict named (duplicate rows +
  * small files degrade every later probe), and compaction must be
  * invisible to probe RESULTS while visibly shrinking the artifacts.
  */
class DedupIndexLifecycleSpec extends SparkSpec {

  private def mhProbe(idx: String, b: org.apache.spark.sql.DataFrame)
      : Map[(Long, Long), Double] =
    Dedup.probeMinhashIndex(b,
      spark.read.parquet(s"$idx/bands.parquet"),
      spark.read.parquet(s"$idx/sigs.parquet"), threshold = 0.5,
      maxWitnesses = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap

  test("compactMinhashIndex: probe results identical after replayed " +
    "appends compact away; artifacts shrink to one row per doc/band") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val history = docs.filter(col("doc_id") % 4 === 1)
    val batch = docs.filter(col("doc_id") % 4 === 2)
    val fresh = docs.filter(col("doc_id") % 4 === 0)
    val idx = Scratch.dir("mh_idx_compact_spec")
    Dedup.writeMinhashIndex(history, idx)
    // an at-least-once world: the same batch appends THREE times
    Dedup.appendToMinhashIndex(batch, idx)
    Dedup.appendToMinhashIndex(batch, idx)
    Dedup.appendToMinhashIndex(batch, idx)
    val sigRowsDuped = spark.read.parquet(s"$idx/sigs.parquet").count()
    val before = mhProbe(idx, fresh)
    assert(before.nonEmpty)
    Dedup.compactMinhashIndex(spark, idx)
    val after = mhProbe(idx, fresh)
    assert(after == before,
      "compaction must not change a single probe pair or estimate")
    // one signature row per doc survives (history + batch, not 3x batch)
    val nDocs = history.count() + batch.count()
    val sigRows = spark.read.parquet(s"$idx/sigs.parquet").count()
    assert(sigRows == nDocs && sigRows < sigRowsDuped)
    // bands: exactly 8 distinct band rows per doc, no duplicates
    val bands = spark.read.parquet(s"$idx/bands.parquet")
    assert(bands.count() == bands.distinct().count())
    assert(bands.count() == nDocs * 8)
  }

  test("compactMinhashIndex age-out: entries below the doc_id watermark " +
    "stop suppressing new documents") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val history = docs.filter(col("doc_id") % 4 =!= 0)
    val fresh = docs.filter(col("doc_id") % 4 === 0)
    val idx = Scratch.dir("mh_idx_ageout_spec")
    Dedup.writeMinhashIndex(history, idx)
    val before = mhProbe(idx, fresh)
    assert(before.nonEmpty)
    val cut = before.keys.map(_._2).toSeq.sorted
      .apply(before.size / 2) // a watermark that splits the matched olds
    Dedup.compactMinhashIndex(spark, idx, dropBelowDocId = Some(cut))
    val after = mhProbe(idx, fresh)
    assert(after == before.filter { case ((_, oldId), _) => oldId >= cut },
      "age-out must drop exactly the pairs whose old side predates the watermark")
    assert(spark.read.parquet(s"$idx/sigs.parquet")
      .filter(col("doc_id") < cut).count() == 0)
  }

  test("compactGramIndex: probe spans identical; counts re-aggregate " +
    "exactly as one write over the concatenated corpus") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val history = docs.filter(col("doc_id") % 4 === 1)
    val batch = docs.filter(col("doc_id") % 4 === 2)
    val fresh = docs.filter(col("doc_id") % 4 === 0)
    val idx = Scratch.dir("gram_idx_compact_spec")
    Dedup.writeGramIndex(history, idx)
    Dedup.appendToGramIndex(batch, idx)
    Dedup.appendToGramIndex(batch, idx) // replay
    def probe(): Set[(Long, Long, Long)] =
      Dedup.probeGramIndex(fresh, spark.read.parquet(s"$idx/grams.parquet"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val before = probe()
    assert(before.nonEmpty)
    Dedup.compactGramIndex(spark, idx)
    assert(probe() == before,
      "the left-semi probe sees the same distinct-h set before and after")
    // exact re-aggregation: n_occ sums the appends (history + 2x batch),
    // first_doc takes the min across them
    val refIdx = Scratch.dir("gram_idx_ref_spec")
    Dedup.writeGramIndex(history.union(batch).union(batch), refIdx)
    val got = spark.read.parquet(s"$idx/grams.parquet")
      .orderBy("h").collect().map(_.toSeq).toSeq
    val want = spark.read.parquet(s"$refIdx/grams.parquet")
      .orderBy("h").collect().map(_.toSeq).toSeq
    assert(got == want)
    // one row per distinct gram hash
    val grams = spark.read.parquet(s"$idx/grams.parquet")
    assert(grams.count() == grams.select("h").distinct().count())
  }
}
