package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.operators.Incremental

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def fileSet(path: String): Map[String, Long] = {
    val root = Paths.get(path)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(p => root.relativize(p).toString ->
        java.nio.file.Files.getLastModifiedTime(p).toMillis)
      .toMap
  }

  test("diff classifies insert/delete/update with null-safe compare") {
    val t = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, null))
      .toDF("id", "v", "s")
    val i = Seq((1L, 10.0, "a"), (2L, 25.0, "b"), (4L, 40.0, null))
      .toDF("id", "v", "s")
    val d = Incremental.diff(t, i, Seq("id")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(2L -> "update", 3L -> "delete", 4L -> "insert"))
    // null == null must be "same": id 1 absent, and a row with matching
    // nulls must not be an update
    val t2 = Seq((9L, Option.empty[String])).toDF("id", "s")
    val i2 = Seq((9L, Option.empty[String])).toDF("id", "s")
    assert(Incremental.diff(t2, i2, Seq("id")).count() == 0)
  }

  test("incremental reload rewrites only changed partitions") {
    val base = Files.createTempDirectory("graft-incr")
    val path = base.resolve("t").toString
    val v1 = Seq(
      (1L, "d1", 10.0), (2L, "d1", 20.0), // d1: one row will update
      (3L, "d2", 30.0),                   // d2: untouched
      (4L, "d3", 40.0),                   // d3: fully deleted
      (5L, "d4", 50.0))                   // d4: gains a row
      .toDF("id", "day", "v")
    v1.write.partitionBy("day").parquet(path)
    val before = fileSet(path)

    val v2 = Seq(
      (1L, "d1", 10.0), (2L, "d1", 99.0), // update in d1
      (3L, "d2", 30.0),                   // unchanged
      (5L, "d4", 50.0), (6L, "d4", 60.0)) // insert in d4
      .toDF("id", "day", "v")
    val (nParts, nRows) = Incremental.run(spark, path, v2, Seq("id"), "day")
    assert(nParts == 3) // d1 (update), d3 (delete), d4 (insert)
    assert(nRows == 4)  // d1 and d4 rewritten from incoming

    // final content equals the incoming snapshot
    val got = spark.read.parquet(path)
      .select(col("id"), col("day"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(got == v2.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet)

    // the untouched partition's files are bit-for-bit the same ones
    val after = fileSet(path)
    val beforeD2 = before.filter(_._1.startsWith("day=d2"))
    assert(beforeD2.nonEmpty)
    assert(after.filter(_._1.startsWith("day=d2")) == beforeD2)
    // the emptied partition is gone from disk
    assert(!after.keys.exists(_.startsWith("day=d3")))
  }

  test("chunked state merges equal the one-pass aggregate, any split") {
    val e = graft.sources.Tables.load(spark, sf, "events")
    val full = Incremental.aggState(e, "user_id", "value", "ts")
      .select(col("user_id"), col("n"), round(col("s"), 2).as("s"),
        col("first_ts"), col("last_ts"))
      .collect().map(_.toSeq).toSet
    // Three uneven chunks on an unrelated axis (event_id ranges), merged
    // pairwise in two different association orders.
    val chunks = Seq(
      e.filter(col("event_id") % 7 < 2), e.filter(col("event_id") % 7 === 2),
      e.filter(col("event_id") % 7 > 2))
      .map(Incremental.aggState(_, "user_id", "value", "ts"))
    def finish(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("n"), round(col("s"), 2).as("s"),
        col("first_ts"), col("last_ts")).collect().map(_.toSeq).toSet
    val leftFold = finish(Incremental.mergeState(
      Incremental.mergeState(chunks(0), chunks(1), "user_id"), chunks(2), "user_id"))
    val rightFold = finish(Incremental.mergeState(
      chunks(0), Incremental.mergeState(chunks(1), chunks(2), "user_id"), "user_id"))
    assert(leftFold == full)
    assert(rightFold == full)
  }

  test("no-op snapshot touches nothing") {
    val base = Files.createTempDirectory("graft-incr-noop")
    val path = base.resolve("t").toString
    val v = Seq((1L, "d1", 1.0), (2L, "d2", 2.0)).toDF("id", "day", "v")
    v.write.partitionBy("day").parquet(path)
    val before = fileSet(path)
    val (nParts, nRows) = Incremental.run(spark, path, v, Seq("id"), "day")
    assert(nParts == 0 && nRows == 0)
    assert(fileSet(path) == before)
  }
}
