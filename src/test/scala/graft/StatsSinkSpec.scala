package graft

import org.apache.spark.sql.functions._

import graft.sources.v2.StatsSink

/** The DSv2 batch WRITE path: per-task DataWriters fold counts, commit
  * messages merge on the driver — the real sink commit protocol,
  * without disk.
  */
class StatsSinkSpec extends SparkSpec {
  import spark.implicits._

  test("stats sink commits exact row counts through the V2 write protocol") {
    val df = spark.range(0, 1000, 1, 5).select(col("id"))
    df.write.format("graft-stats").option("name", "rows1k")
      .mode("append").save()
    val stats = StatsSink.results.get("rows1k")
    assert(stats != null)
    assert(stats.rows == 1000L)
    // one commit message per input partition
    assert(stats.partitionRows.length == 5)
    assert(stats.partitionRows.sum == 1000L)
  }

  test("per-partition counts expose skew before any bytes land") {
    // skew one partition deliberately: everything hashes to few keys
    val df = spark.range(0, 900).select((col("id") % 3).as("k"))
      .repartition(3, col("k"))
    df.write.format("graft-stats").option("name", "skewed")
      .mode("append").save()
    val stats = StatsSink.results.get("skewed")
    assert(stats.rows == 900L)
    assert(stats.partitionRows.exists(_ > 0L))
    // the dry-run sink reports the same totals a real write would commit
    assert(stats.partitionRows.sum == 900L)
  }

  test("a second named write replaces the previous entry (idempotent re-run)") {
    val a = spark.range(0, 10).toDF("id")
    a.write.format("graft-stats").option("name", "rerun").mode("append").save()
    assert(StatsSink.results.get("rerun").rows == 10L)
    val b = spark.range(0, 25).toDF("id")
    b.write.format("graft-stats").option("name", "rerun").mode("append").save()
    assert(StatsSink.results.get("rerun").rows == 25L)
  }
}
