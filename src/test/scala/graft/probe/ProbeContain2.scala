package graft

import org.apache.spark.sql.functions._

/** Stage attribution for dedup_containment at soak scale: time the gram
  * cache build, the df-window, and the pair join separately.
  */
object ProbeContain2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_soak/x100")
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions
    import graft.operators.Dedup.md5Bits
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val g = docs
      .select(col("doc_id"),
        TextFunctions.words(lower(col("text"))).as("toks"))
      .select(col("doc_id"),
        array_distinct(
          TextFunctions.hashedTokenWindows(col("toks"), 8)).as("grams"))
      .select(col("doc_id"), size(col("grams")).as("n_g"),
        explode(col("grams")).as("h"))
      .cache()
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    t("cache build (count)") { g.count() }
    val kept = g
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .filter(col("__df") <= 1000).drop("__df")
    t("df window (count)") { kept.count() }
    val a = kept.alias("a"); val b = kept.alias("b")
    val pairs = a.join(b.hint("merge"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.n_g").as("n_a"), col("b.n_g").as("n_b"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_shared"))
    t("pair join+agg (count)") { pairs.count() }
    t("full query again") {
      graft.operators.Dedup.containmentPairs(spark, dir)
        .write.format("noop").mode("overwrite").save(); "noop"
    }
    spark.stop()
  }
}
