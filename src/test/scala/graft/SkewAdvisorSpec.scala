package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewAdvisor

class SkewAdvisorSpec extends SparkSpec {

  test("planted hot key: advisor flags skew and recommends a firing trigger") {
    import spark.implicits._
    // 200k rows over 1000 keys, key 0 carries 30%
    val n = 200000
    val df = spark.range(n).select(
      when(col("id") < (n * 3 / 10), lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(1000L))).as("k"),
      col("id").as("v"))
    // bytesPerRow inflated so the size floor (32 MB compressed) is met
    val a = SkewAdvisor.advise(df, Seq($"k"), nPartitions = 32,
      bytesPerRow = 4096)

    assert(a.skewed)
    // the hot reducer holds at least the planted 30% share
    assert(a.hotRows >= (n * 3 / 10).toLong)
    assert(a.rowRatio > 5.0)
    // the recommendation must sit BELOW the byte ratio the detector
    // will see (predicted = rows / haircut), or it can never fire
    val f = a.recommendedFactor.get
    assert(f >= 1.1 && f < a.predictedByteRatio)
    // and the hot partition must divide into >= 8 advisory chunks
    // (margin for the compression estimate erring large), or no
    // split is constructible
    assert(a.recommendedAdvisoryBytes.get * 8 <= a.estHotCompressedBytes)
    assert(a.recommendedThresholdBytes.get <= a.estHotCompressedBytes)

    // applying the advice lands the three confs verbatim
    assert(a.applyTo(spark))
    assert(spark.conf
      .get("spark.sql.adaptive.skewJoin.skewedPartitionFactor") == f.toString)
    assert(spark.conf
      .get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes") ==
      a.recommendedThresholdBytes.get.toString)
    assert(spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes") ==
      a.recommendedAdvisoryBytes.get.toString)
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    spark.conf
      .unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
  }

  test("uniform keys: no skew, no recommendation, applyTo is a no-op") {
    import spark.implicits._
    val df = spark.range(100000).select(col("id").as("k"), col("id").as("v"))
    val a = SkewAdvisor.advise(df, Seq($"k"), nPartitions = 32,
      bytesPerRow = 4096)
    assert(!a.skewed)
    assert(a.rowRatio < 1.5)
    assert(a.recommendedFactor.isEmpty)
    assert(!a.applyTo(spark))
  }

  test("a hot key below the size floor is reported but not acted on") {
    import spark.implicits._
    // same 30% hot key, but tiny rows: splitting a few MB won't pay
    val df = spark.range(10000).select(
      when(col("id") < 3000, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(1000L))).as("k"))
    val a = SkewAdvisor.advise(df, Seq($"k"), nPartitions = 32,
      bytesPerRow = 16)
    assert(a.skewed) // the row ratio is real
    assert(a.recommendedFactor.isEmpty) // but not worth configuring
    assert(a.note.contains("too small"))
  }

  test("sampled advise reproduces the full histogram's decision") {
    import spark.implicits._
    val n = 200000
    val df = spark.range(n).select(
      when(col("id") < (n * 3 / 10), lit(0L))
        .otherwise(pmod(xxhash64(col("id")), lit(1000L))).as("k"))
    val full = SkewAdvisor.advise(df, Seq($"k"), 32, 4096)
    val sampled = SkewAdvisor.advise(df, Seq($"k"), 32, 4096,
      sampleFraction = 0.1)
    assert(sampled.skewed == full.skewed)
    // scaled-back counts land near the full measurement
    assert(math.abs(sampled.hotRows - full.hotRows).toDouble /
      full.hotRows < 0.1)
    assert(sampled.rowRatio / full.rowRatio > 0.8 &&
      sampled.rowRatio / full.rowRatio < 1.25)
    assert(sampled.recommendedFactor.isDefined)
  }

  test("advice is deterministic across runs") {
    import spark.implicits._
    val df = spark.range(50000).select(
      when(col("id") < 10000, lit(7L))
        .otherwise(pmod(xxhash64(col("id")), lit(500L))).as("k"))
    val a1 = SkewAdvisor.advise(df, Seq($"k"), 32, 4096)
    val a2 = SkewAdvisor.advise(df, Seq($"k"), 32, 4096)
    assert(a1 == a2)
  }
}
