package graft

import org.apache.spark.sql.functions._

/** Dev-only scratch main for inspecting schemas/plans. Not part of the
  * driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- graft.sources.Tables.all) {
      val df = graft.sources.Tables.load(spark, dir, t)
      println(s"== $t: ${df.schema.simpleString}")
    }
    val e = graft.sources.Tables.load(spark, dir, "events")
    e.select(col("ts"), year(col("ts")).as("y"),
      unix_micros(col("ts").cast("timestamp")).as("tsl"),
      date_trunc("hour", col("ts")).as("h")).show(3, false)
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
    emb.select(col("vec_id"),
      round(graft.functions.VectorFunctions.cosine(col("embedding"), col("embedding")), 6).as("self"),
      round(graft.functions.VectorFunctions.cosineComposed(col("embedding"), col("embedding")), 6).as("self2")).show(3)
    Analytics0.q1(spark, dir).show(5)
    spark.stop()
  }
}

private object Analytics0 {
  def q1(spark: org.apache.spark.sql.SparkSession, dir: String) =
    graft.operators.Analytics.pricingSummary(spark, dir)
}
