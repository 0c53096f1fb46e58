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

  test("witness displacement: replayed appends evict true pairs from the " +
    "capped heap; compaction restores every displaced pair") {
    // The round-15 40-append soak found the witness heap DISPLACING
    // true pairs past ~35 uncompacted appends at the 64-slot default
    // (972,504 → 949,827 pairs — recall loss, not just output bloat;
    // docs/SCALING.md round 15). compactEvery=32 fires first in the
    // streaming loop, but nothing PROVED the displaced pairs come
    // back. This case drives the same arithmetic scaled to spec data:
    // the heap holds 8·maxWitnesses smallest old ids WITH
    // band-duplicate slots, so R replayed appends give every batch
    // old id up to 8·(R+1) copies — crowding distinct survivors
    // toward 8·maxWitnesses / (8·(R+1)). maxWitnesses=2 (16 slots) ×
    // 16 total copies reproduces the 64-slot × ~35-append regime: any
    // batch candidate that lands even ONE band now floods the whole
    // heap, evicting every larger true witness.
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val history = docs.filter(col("doc_id") % 4 === 1)
    val batch = docs.filter(col("doc_id") % 4 === 2)
    val fresh = docs.filter(col("doc_id") % 4 === 0)
    val idx = Scratch.dir("mh_idx_displace_spec")
    Dedup.writeMinhashIndex(history, idx)
    Dedup.appendToMinhashIndex(batch, idx)
    def probe(): Set[(Long, Long)] = Dedup.probeMinhashIndex(fresh,
        spark.read.parquet(s"$idx/bands.parquet"),
        spark.read.parquet(s"$idx/sigs.parquet"), threshold = 0.5,
        maxWitnesses = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val baseline = probe()
    assert(baseline.nonEmpty)
    // at-least-once replay, compaction OFF: 15 more appends of the
    // same batch — 16 copies of every batch doc's band rows
    for (_ <- 1 to 15) Dedup.appendToMinhashIndex(batch, idx)
    val displaced = probe()
    // the displacement regime is REAL here: pairs are lost, and only
    // lost (duplicate copies can evict witnesses, never add them)
    assert(displaced.subsetOf(baseline))
    assert(displaced.size < baseline.size,
      s"expected recall loss under 16x-replayed appends, got " +
        s"${displaced.size} of ${baseline.size} pairs")
    Dedup.compactMinhashIndex(spark, idx)
    val recovered = probe()
    assert(recovered == baseline,
      "compaction must restore every displaced pair exactly")
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
