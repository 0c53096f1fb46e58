package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plan-time skew diagnosis for a keyed shuffle: measures the
  * per-reducer ROW histogram the hash partitioning will actually
  * produce and recommends AQE skew-join trigger settings that will
  * actually fire.
  *
  * Why this exists (measured, docs/SCALING.md round 10): AQE's skew
  * detector compares shuffle BYTES after compression, and a constant
  * hot key compresses ~2x better than uniform keys — a 2.9x row skew
  * reads as 1.5-2.0x in bytes, under the default
  * `skewedPartitionFactor=5` and even under 2. Task TIME tracks rows
  * (the reducer decompresses), so the byte-based trigger structurally
  * under-sees exactly the hottest pattern (a constant surrogate key).
  * Separately, a hot partition smaller than
  * `advisoryPartitionSizeInBytes` can never split at all — the split
  * needs more than one target-size chunk.
  *
  * The advisor measures the ROW histogram with the same hash family
  * the exchange uses (Murmur3 via `hash()`, `pmod` into reducers),
  * translates to the byte domain the trigger reads via a documented
  * compression haircut, and recommends (factor, threshold, advisory)
  * that make the split constructible. One bounded aggregation job
  * (`nPartitions` result rows); run it on a sample or the real input.
  */
object SkewAdvisor {

  /** Hot-key extra bytes compress about this much better than the
    * uniform baseline through the shuffle codec (measured 1.95x-2.0x
    * effective at 600M rows; using 2.0 keeps the predicted byte ratio
    * at or below what the detector will actually see, so a factor
    * derived from it fires).
    */
  val CompressionHaircut = 2.0

  /** Rough shuffle-codec compression of ordinary row data, used only
    * to turn raw row-size estimates into post-compression partition
    * sizes for the threshold/advisory recommendations.
    */
  val BaselineCompression = 3.0

  final case class Advice(
      nPartitions: Int,
      hotRows: Long,
      medianRows: Long,
      rowRatio: Double,
      predictedByteRatio: Double,
      estHotCompressedBytes: Long,
      skewed: Boolean,
      recommendedFactor: Option[Double],
      recommendedThresholdBytes: Option[Long],
      recommendedAdvisoryBytes: Option[Long],
      note: String) {

    /** Apply the recommended trigger to a session (no-op when the
      * advisor found nothing actionable).
      */
    def applyTo(spark: SparkSession): Boolean = {
      (recommendedFactor, recommendedThresholdBytes,
        recommendedAdvisoryBytes) match {
        case (Some(f), Some(t), Some(a)) =>
          spark.conf
            .set("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
              f.toString)
          spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            t.toString)
          spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
            a.toString)
          true
        case _ => false
      }
    }
  }

  /** Catalyst's per-row size estimate for the shuffled schema —
    * serviceable for ordering-of-magnitude byte math, replace with a
    * measured row width when one is available.
    */
  def estimateBytesPerRow(df: DataFrame): Long =
    math.max(8L, df.schema.defaultSize.toLong)

  /** @param sampleFraction measure the histogram on a Bernoulli
    *   sample and scale the counts back up — at 600M rows a 2%
    *   sample reproduces the reducer histogram to well under the
    *   1.5x decision boundary and cuts the advise() cost ~50x.
    */
  def advise(df: DataFrame, keys: Seq[Column], nPartitions: Int,
      bytesPerRow: Long, sampleFraction: Double = 1.0): Advice = {
    require(keys.nonEmpty, "advise needs at least one key column")
    require(nPartitions > 1, "advise needs nPartitions > 1")
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      "sampleFraction must be in (0, 1]")
    val input =
      if (sampleFraction < 1.0) df.sample(sampleFraction, seed = 42L) else df
    // the same reducer assignment HashPartitioning will produce:
    // Murmur3 hash of the key columns, pmod into nPartitions
    val hist = input
      .groupBy(pmod(hash(keys: _*), lit(nPartitions)).as("__p"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getAs[Long]("__n") / sampleFraction).toLong)
      .sorted
    val hot = if (hist.isEmpty) 0L else hist.last
    // empty reducers count as zero-row partitions
    val full = Array.fill(nPartitions - hist.length)(0L) ++ hist
    val med = full(full.length / 2)
    val rowRatio = if (med > 0) hot.toDouble / med else Double.PositiveInfinity
    // the byte ratio the detector will see is AT LEAST rowRatio /
    // haircut (the hot surplus compresses better; measured 1.46x
    // bytes for 2.86x rows at 60M rows, 1.95x for 2.95x at 600M)
    val predictedByteRatio = math.max(1.0, rowRatio / CompressionHaircut)
    val estHotCompressed =
      (hot * bytesPerRow / BaselineCompression).toLong
    val worthSplitting = rowRatio >= 1.5 && med > 0 &&
      estHotCompressed >= 32L * 1024 * 1024
    if (!worthSplitting) {
      val note =
        if (rowRatio < 1.5)
          f"row skew $rowRatio%.2f below 1.5 — splitting would not pay"
        else
          "hot partition too small for splitting to matter — leave defaults"
      Advice(nPartitions, hot, med, rowRatio, predictedByteRatio,
        estHotCompressed, skewed = rowRatio >= 1.5, None, None, None, note)
    } else {
      // fire margin: stay 15% under the predicted byte ratio, never
      // below 1.1 (factor 1.0 would split everything)
      val factor = math.max(1.1, predictedByteRatio * 0.85)
      // make the split constructible with margin: aim for >= 8 chunks
      // of the advisory size in the ESTIMATED hot bytes, because the
      // estimate's compression guess errs large (measured ~5x codec
      // compression on a repeated-key fact vs the 3x baseline here —
      // an advisory derived at /4 left only ~2 real chunks and the
      // max task barely moved). Finer advisory chunks are cheap:
      // coalescing only MERGES partitions, it never splits non-skewed
      // ones, so a smaller advisory does not fragment the rest of the
      // plan.
      val advisory = math.max(8L * 1024 * 1024, estHotCompressed / 8)
      val threshold = advisory
      Advice(nPartitions, hot, med, rowRatio, predictedByteRatio,
        estHotCompressed, skewed = true,
        Some(math.rint(factor * 100) / 100), Some(threshold), Some(advisory),
        f"hot reducer $hot%d rows vs median $med%d (${rowRatio}%.2f x rows, " +
          f"predicted ${predictedByteRatio}%.2f x bytes): set factor, " +
          "threshold and advisory so the split both fires and divides")
    }
  }
}
