package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Dev-only: stage-by-stage timing of the contamination scan. */
object ProbeContam {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = graft.sources.Tables.load(spark, dir, "documents")

    def time[T](name: String)(f: => DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[perf] $name: ${ts.min}%.2f s (runs ${ts.map(t => f"$t%.2f").mkString(",")})")
    }

    val toks = d.select(col("doc_id"), TextFunctions.words(lower(col("text"))).as("toks"))
    time("tokenize")(toks)
    time("windows")(toks.select(col("doc_id"),
      TextFunctions.tokenWindows(col("toks"), 8).as("w")))
    time("windows_md5")(toks.select(col("doc_id"),
      transform(TextFunctions.tokenWindows(col("toks"), 8),
        s => graft.operators.Dedup.md5Bits(s, 1, 15)).as("w")))
    time("windows_xxhash")(toks.select(col("doc_id"),
      transform(TextFunctions.tokenWindows(col("toks"), 8),
        s => xxhash64(s)).as("w")))
    time("windows_md5_distinct_explode")(toks.select(col("doc_id"),
      array_distinct(transform(TextFunctions.tokenWindows(col("toks"), 8),
        s => graft.operators.Dedup.md5Bits(s, 1, 15))).as("w"))
      .select(col("doc_id"), explode(col("w")).as("h")))
    time("explode_then_md5")(toks
      .select(col("doc_id"),
        explode(array_distinct(TextFunctions.tokenWindows(col("toks"), 8))).as("s"))
      .select(col("doc_id"), graft.operators.Dedup.md5Bits(col("s"), 1, 15).as("h")))
    time("distinct_no_explode")(toks.select(col("doc_id"),
      array_distinct(transform(TextFunctions.tokenWindows(col("toks"), 8),
        s => graft.operators.Dedup.md5Bits(s, 1, 15))).as("w")))
    time("md5_then_distinct_explode_sep")(toks.select(col("doc_id"),
      array_distinct(transform(TextFunctions.tokenWindows(col("toks"), 8),
        s => graft.operators.Dedup.md5Bits(s, 1, 15))).as("w"))
      .repartition(32)
      .select(col("doc_id"), explode(col("w")).as("h")))
    time("full_current")(TextFunctions.contamination(spark, dir))
    println("n_docs=" + d.count())
    println("n_windows=" + toks.select(sum(greatest(size(col("toks")) - 7, lit(0)))).collect()(0))
  }
}
