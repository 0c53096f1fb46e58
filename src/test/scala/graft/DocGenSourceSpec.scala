package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class DocGenSourceSpec extends SparkSpec {
  import spark.implicits._

  private def gen(rows: Long, parts: Int) =
    spark.read.format("graft-docgen")
      .option("rows", rows).option("partitions", parts).load()

  test("docgen emits exactly N rows across exactly P planned splits") {
    val df = gen(1000, 7)
    assert(df.count() == 1000L)
    assert(df.rdd.getNumPartitions == 7)
    // ids are a dense range, no dupes across splits
    assert(df.agg(countDistinct(col("doc_id"))).as[Long].head() == 1000L)
    assert(df.agg(min(col("doc_id")), max(col("doc_id")))
      .as[(Long, Long)].head() == ((0L, 999L)))
  }

  test("docgen content is partition-layout independent") {
    val a = gen(500, 3).orderBy("doc_id").collect().map(_.toSeq)
    val b = gen(500, 11).orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("docgen column pruning reaches the source scan") {
    val plan = gen(100, 2).select(col("source")).queryExecution.executedPlan
    val scans = plan.collect { case s: BatchScanExec => s }
    assert(scans.nonEmpty)
    // the pruned schema must be what the reader generates — text never built
    assert(scans.head.output.map(_.name) == Seq("source"))
  }

  test("graft_docgen TVF emits exactly the DSv2 source's rows") {
    val viaSql = spark.sql("SELECT * FROM graft_docgen(300)")
      .orderBy("doc_id").collect().map(_.toSeq)
    val viaSource = gen(300, 5).orderBy("doc_id").collect().map(_.toSeq)
    assert(viaSql.toSeq == viaSource.toSeq)
  }

  test("doc_id range filters are pushed into the generator") {
    val df = gen(1000000000L, 8)
      .filter(col("doc_id") >= 999999000L && col("doc_id") < 999999500L)
    val plan = df.queryExecution.executedPlan
    val scan = plan.collect { case s: BatchScanExec => s }.head
    // the scan itself is clamped — a 1e9-row logical table plans only
    // the 500 surviving ids (visible in the Scan description)
    assert(scan.scan.description().contains("range=[999999000,999999500)"))
    assert(df.count() == 500L)
    // and the values are the same closed form as an unfiltered read
    val direct = gen(1000000000L, 8) // lazily planned; only used via filter pushdown
      .filter(col("doc_id") === 999999123L).select("text").as[String].head()
    assert(direct == df.filter(col("doc_id") === 999999123L)
      .select("text").as[String].head())
  }

  test("pushdown composes with residual filters kept post-scan") {
    val df = gen(100000L, 4)
      .filter(col("doc_id") >= 50000L && col("doc_id") < 50100L &&
        col("source") === "gen3")
    // source predicate is NOT consumable by the generator — must still apply
    val ids = df.select("doc_id").as[Long].collect().sorted
    assert(ids.nonEmpty && ids.forall(id => id >= 50000L && id < 50100L && id % 10 == 3))
  }

  test("docgen streams as microbatches: all rows once, batch-equal content") {
    val q = spark.readStream.format("graft-docgen")
      .option("rows", 100L).option("partitions", 3)
      .option("rowsPerBatch", 30L).load()
      .writeStream.format("memory").queryName("docgen_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT doc_id, source, n_words, text FROM docgen_stream")
        .orderBy("doc_id").collect().map(_.toSeq)
      val batch = gen(100, 3)
        .select(col("doc_id"), col("source"), col("n_words"), col("text"))
        .orderBy("doc_id").collect().map(_.toSeq)
      assert(got.length === 100)
      assert(got.toSeq === batch.toSeq)
      // bounded stream: nothing more arrives
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM docgen_stream").as[Long].head() === 100L)
    } finally q.stop()
  }

  test("docgen stream restart from checkpoint resumes exactly-once") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = Files.createTempDirectory("graft-docgen-ckpt").toString
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    // one Trigger.Once run = one committed micro-batch (rowsPerBatch ids)
    def runOnce(): Seq[Long] = {
      val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = spark.readStream.format("graft-docgen")
        .option("rows", 250L).option("partitions", 3)
        .option("rowsPerBatch", 100L).load()
        .writeStream.trigger(Trigger.Once())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          ids.synchronized { ids ++= df.select("doc_id").as[Long].collect() }
          ()
        }
        .start()
      q.awaitTermination()
      ids.toSeq.sorted
    }
    emitted += runOnce() // [0,100)
    emitted += runOnce() // a FRESH stream instance must resume at 100
    emitted += runOnce() // [200,250)
    assert(emitted(0) == (0L until 100L))
    assert(emitted(1) == (100L until 200L), "restart re-emitted or stalled")
    assert(emitted(2) == (200L until 250L))
    // bounded source drained: a fourth run commits nothing new
    assert(runOnce().isEmpty)
  }

  test("count(*) pushes into the source: metadata answer, no generation") {
    // a billion-row logical table: only a metadata count finishes fast
    val df = gen(1000000000L, 4).agg(count(lit(1)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("COUNT pushdown"), s"plan: $plan")
    assert(df.as[Long].head() === 1000000000L)
    // composes with the doc_id range pushdown
    val clamped = gen(1000000000L, 4)
      .filter(col("doc_id") >= 10L && col("doc_id") < 1234L).agg(count(lit(1)))
    assert(clamped.as[Long].head() === 1224L)
    // grouped aggregates are NOT pushed — they still generate rows
    val grouped = gen(1000L, 2).groupBy(col("source")).agg(count(lit(1)))
    assert(!grouped.queryExecution.executedPlan.toString.contains("COUNT pushdown"))
    assert(grouped.collect().map(_.getLong(1)).sum === 1000L)
  }

  test("docgen text matches the closed-form id arithmetic") {
    val row = gen(100, 2).filter(col("doc_id") === 7L)
      .select(col("n_words"), col("text")).as[(Int, String)].head()
    assert(row._1 == (5 + 7 % 20))
    val toks = row._2.split(" ")
    assert(toks.length == row._1)
    assert(toks(0) == "w" + ((7L * 2654435761L) % 1000L))
    assert(toks(3) == "w" + ((7L * 2654435761L + 3L * 40503L) % 1000L))
  }
}
