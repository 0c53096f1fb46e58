package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.Dedup.md5Bits
import graft.sources.Tables

/** Dev-only: stage timing for text_boilerplate at sf0.1. */
object ProbeBoiler {
  def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val d = Tables.load(spark, dir, "documents")
    val grams = d
      .select(col("doc_id"), explode(tokenWindows(words(lower(col("text"))), 6)).as("gram"))
      .select(col("doc_id"), col("gram"), md5Bits(col("gram"), 1, 15).as("h"))
    for (_ <- 1 to 2) {
      time("explode-only count")(
        d.select(col("doc_id"), explode(tokenWindows(words(lower(col("text"))), 6)).as("gram")).count())
      time("grams+md5 count")(grams.count())
      time("distinct(doc,h)")(grams.select(col("doc_id"), col("h")).distinct().count())
      val cand = grams.select(col("doc_id"), col("h")).distinct()
        .groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 3)
      time("cand count")(cand.count())
      time("full query")(
        graft.functions.TextFunctions.boilerplate(spark, dir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
