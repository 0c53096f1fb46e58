package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Sink

class SinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-sink").resolve("t").toString

  test("overwrite replaces previous contents") {
    val p = tmpDir()
    Sink.overwrite(Seq((1L, "a")).toDF("k", "v"), p)
    Sink.overwrite(Seq((2L, "b"), (3L, "c")).toDF("k", "v"), p)
    assert(spark.read.parquet(p).count() == 2)
  }

  test("partitioned overwrite lays out hive-style dirs") {
    val p = tmpDir()
    Sink.overwrite(Seq((1L, "x", "2024"), (2L, "y", "2025")).toDF("k", "v", "yr"),
      p, partitionBy = Seq("yr"))
    val sub = new java.io.File(p).listFiles().map(_.getName).filter(_.startsWith("yr="))
    assert(sub.toSet == Set("yr=2024", "yr=2025"))
    // partition filter prunes to one directory
    assert(spark.read.parquet(p).filter(col("yr") === "2024").count() == 1)
  }

  test("append accumulates") {
    val p = tmpDir()
    Sink.append(Seq((1L, "a")).toDF("k", "v"), p)
    Sink.append(Seq((2L, "b")).toDF("k", "v"), p)
    assert(spark.read.parquet(p).count() == 2)
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    import graft.sources.Tables
    Sink.writeBucketed(Tables.load(spark, sf, "lineitem"), "li_b", "l_orderkey", 4)
    Sink.writeBucketed(Tables.load(spark, sf, "orders"), "o_b", "o_orderkey", 4)
    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").count()
    // the aggregate still shuffles on o_orderpriority; the join keys
    // must not (bucket layout satisfies the join's distribution)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(l_orderkey") &&
      !plan.contains("hashpartitioning(o_orderkey"),
      s"expected shuffle-free bucketed join, got:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE li_b"); spark.sql("DROP TABLE o_b")
  }

  test("hive-partitioned write enables partition pruning on read") {
    val p = tmpDir()
    val e = graft.sources.Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type")
    Sink.overwrite(e, p, partitionBy = Seq("event_type"))
    // one directory per partition value on disk
    val dirs = new java.io.File(p).listFiles()
      .filter(_.getName.startsWith("event_type=")).map(_.getName).toSet
    assert(dirs.contains("event_type=click"))
    val pruned = spark.read.parquet(p).filter(col("event_type") === "purchase")
    // the partition filter must reach the scan (pruning, not a row filter)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"), scan.take(800))
    val expected = e.filter(col("event_type") === "purchase").count()
    assert(pruned.count() == expected)
  }

  test("dynamic partition overwrite replaces only touched partitions, compacted") {
    val p = tmpDir()
    val day1 = Seq((1L, "2024-01-01", "a"), (2L, "2024-01-01", "b"),
      (3L, "2024-01-02", "c")).toDF("id", "day", "v")
    Sink.overwritePartitionsDynamic(day1, p, Seq("day"))
    // reload ONLY day 2 with new contents
    val day2 = Seq((9L, "2024-01-02", "z")).toDF("id", "day", "v")
    Sink.overwritePartitionsDynamic(day2, p, Seq("day"))
    val out = spark.read.parquet(p).orderBy("id")
      .select("id", "day", "v").as[(Long, String, String)].collect().toSeq
    // day 1 untouched, day 2 fully replaced
    assert(out == Seq((1L, "2024-01-01", "a"), (2L, "2024-01-01", "b"),
      (9L, "2024-01-02", "z")))
    // compaction: exactly one data file per partition directory
    Seq("day=2024-01-01", "day=2024-01-02").foreach { d =>
      val files = new java.io.File(p, d).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"$d has ${files.length} files")
    }
  }

  test("compact merges small files losslessly") {
    val p = tmpDir()
    val df = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    df.repartition(24).write.parquet(p) // simulate small-file accretion
    def snapshot(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.collect().map(_.toSeq.mkString("|")).toSeq.sorted
    val before = snapshot(df)
    val (nBefore, nAfter) = Sink.compact(spark, p, targetFileBytes = 1L << 30)
    assert(nBefore == 24 && nAfter == 1)
    val files = new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1)
    val after = snapshot(spark.read.parquet(p))
    assert(after == before)
  }

  test("z-order clustering bounds per-file ranges on BOTH dimensions") {
    // Scale lineitem's (partkey, suppkey) to a shared 10-bit budget,
    // write z-ordered vs sorted-by-one, and compare how much of each
    // dimension's global range an average file spans — the footer-stat
    // skipping a point/range predicate gets on reads.
    val l = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
    val stats = l.agg(
      min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
      .head()
    val (pLo, pHi) = (stats.getLong(0), stats.getLong(1))
    val (sLo, sHi) = (stats.getLong(2), stats.getLong(3))
    val bits = 10
    val scaleMax = (1 << bits) - 1
    val scaled = l.select(
      ((col("l_partkey") - pLo) * scaleMax / (pHi - pLo).max(1L)).cast("long").as("x"),
      ((col("l_suppkey") - sLo) * scaleMax / (sHi - sLo).max(1L)).cast("long").as("y"))
    def avgSpan(path: String, c: String): Double = {
      val perFile = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max(col(c)) - min(col(c))).as("span"))
        .select(avg(col("span"))).head().getDouble(0)
      perFile / scaleMax
    }
    val zPath = tmpDir()
    Sink.writeZOrdered(scaled, zPath, "x", "y", numFiles = 16, bits = bits)
    val sortedPath = tmpDir()
    Sink.writeSorted(scaled, sortedPath, Seq("x"), numFiles = 16)
    // One-column sort: files are narrow in x but span nearly all of y.
    assert(avgSpan(sortedPath, "y") > 0.8)
    // Z-order: BOTH dimensions bounded well below the global range.
    assert(avgSpan(zPath, "x") < 0.6, s"x span ${avgSpan(zPath, "x")}")
    assert(avgSpan(zPath, "y") < 0.6, s"y span ${avgSpan(zPath, "y")}")
  }

  test("dynamic partition pruning fires on a partitioned fact join") {
    // The 100 TB pattern: fact partitioned on the join key's FK date/
    // dim attribute, dim filtered at runtime — Spark must inject a
    // dynamicpruning subquery so the fact scan only reads partitions
    // the filtered dim reaches, without a literal partition predicate.
    val p = tmpDir()
    val o = graft.sources.Tables.load(spark, sf, "orders")
    o.select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .write.partitionBy("o_orderpriority").parquet(p)
    val fact = spark.read.parquet(p)
    val dimPath = tmpDir()
    Seq(("1-URGENT", "hot"), ("5-LOW", "cold"))
      .toDF("prio", "tier").write.parquet(dimPath)
    // The dim must be a scan with a surviving selective Filter —
    // a local Seq would constant-fold the filter away and DPP's
    // selectivity heuristic would see nothing to prune with.
    val dim = spark.read.parquet(dimPath)
    val joined = fact.join(dim, fact("o_orderpriority") === dim("prio"))
      .filter(col("tier") === "hot")
      .groupBy(col("prio")).agg(sum(col("o_totalprice")).as("v"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic partition pruning subquery, got:\n$plan")
    assert(joined.collect().length == 1)
  }

  test("versioned snapshots: time travel, latest resolution, retention expiry") {
    val p = tmpDir()
    assert(Sink.writeVersioned(Seq((1L, "a")).toDF("k", "v"), p) === 0L)
    assert(Sink.writeVersioned(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), p) === 1L)
    assert(Sink.writeVersioned(Seq((9L, "z")).toDF("k", "v"), p) === 2L)
    assert(Sink.listVersions(spark, p) === Seq(0L, 1L, 2L))
    // time travel: old snapshots are immutable and still readable
    assert(Sink.readVersion(spark, p, 0L).count() === 1L)
    assert(Sink.readVersion(spark, p, 1L).count() === 2L)
    assert(Sink.readLatest(spark, p).as[(Long, String)].collect().toSeq ===
      Seq((9L, "z")))
    // retention: keep the last 2, version 0 expires
    assert(Sink.expireVersions(spark, p, keep = 2) === Seq(0L))
    assert(Sink.listVersions(spark, p) === Seq(1L, 2L))
    assert(Sink.readLatest(spark, p).count() === 1L)
  }

  test("dedupUpsert keeps the latest version per key across writes") {
    val p = tmpDir()
    Sink.dedupUpsert(spark, p,
      Seq((1L, 1L, "old"), (2L, 1L, "two")).toDF("k", "ver", "v"),
      keys = Seq("k"), versionCol = "ver")
    Sink.dedupUpsert(spark, p,
      Seq((1L, 2L, "new"), (3L, 1L, "three")).toDF("k", "ver", "v"),
      keys = Seq("k"), versionCol = "ver")
    val out = spark.read.parquet(p).orderBy("k")
      .as[(Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 2L, "new"), (2L, 1L, "two"), (3L, 1L, "three")))
  }
}
