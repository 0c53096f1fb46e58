package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only: A/B timing of near-dup formulation variants at sf0.1. */
object ProbePerf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.load(spark, dir, "documents")

    def time[T](name: String)(f: => DataFrame): Unit = {
      // two runs, min — same protocol as Bench
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[perf] $name: ${ts.min}%.2f s (runs ${ts.map(t => f"$t%.2f").mkString(",")})")
    }

    // stage A: tokenization+shingles+distinct alone
    time("shingles_distinct")(graft.operators.Dedup.shingles(docs))
    time("shingles_raw")(graft.operators.Dedup.shinglesRaw(docs))

    // current formulation
    time("ngram_current")(graft.operators.Dedup.ngramJaccard(spark, dir))

    // variant: hash shingle -> 60-bit long early; groupBy(h) collect_list
    def ngramHashed(): DataFrame = {
      val sh = graft.operators.Dedup.shinglesRaw(docs)
        .select(col("doc_id"), graft.operators.Dedup.md5Bits(col("shingle"), 1, 15).as("h"))
        .distinct()
        .cache()
      val card = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val ids = sh.groupBy(col("h")).agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
      val pairs = ids.select(explode(
        flatten(transform(col("ids"), (a, i) =>
          transform(slice(col("ids"), i + 2, size(col("ids"))), b => struct(a.as("id_a"), b.as("id_b"))))))
        .as("p"))
        .select(col("p.id_a"), col("p.id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
      pairs
        .join(card.select(col("doc_id").as("id_a"), col("n_sh").as("n_a")), "id_a")
        .join(card.select(col("doc_id").as("id_b"), col("n_sh").as("n_b")), "id_b")
        .withColumn("jaccard",
          col("n_inter").cast("double") /
            (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
        .filter(col("jaccard") >= 0.4)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }
    time("ngram_hashed")(ngramHashed())

    // variant: current join shape but on hashed longs
    def ngramHashedJoin(): DataFrame = {
      val sh = graft.operators.Dedup.shinglesRaw(docs)
        .select(col("doc_id"), graft.operators.Dedup.md5Bits(col("shingle"), 1, 15).as("h"))
        .distinct()
        .cache()
      val card = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
      val a = sh.select(col("doc_id").as("id_a"), col("h"))
      val b = sh.select(col("doc_id").as("id_b"), col("h"))
      val inter = a.join(b, Seq("h"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
      inter
        .join(card.select(col("doc_id").as("id_a"), col("n_sh").as("n_a")), "id_a")
        .join(card.select(col("doc_id").as("id_b"), col("n_sh").as("n_b")), "id_b")
        .withColumn("jaccard",
          col("n_inter").cast("double") /
            (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
        .filter(col("jaccard") >= 0.4)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
    }
    time("ngram_hashed_join")(ngramHashedJoin())

    time("minhash_current")(graft.operators.Dedup.minhashPairs(spark, dir))

    time("quality_current")(graft.functions.TextFunctions.qualityScore(spark, dir))

    // variant: one tokenize pass + one keep-class regex; alnum chars from
    // the token array instead of a second regex pass
    def qualityFused(): DataFrame = {
      import graft.functions.TextFunctions.{stopwords, words}
      val d = docs
      val sw = array(stopwords.map(lit): _*)
      val base = d.select(col("doc_id"),
        length(col("text")).cast("long").as("len"),
        words(lower(col("text"))).as("toks"),
        length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", "")).cast("long").as("len_keep"))
      val nw = size(col("toks")).cast("long")
      val nalnum = aggregate(col("toks"), lit(0L), (acc, x) => acc + length(x).cast("long"))
      val nsw = size(filter(col("toks"), w => array_contains(sw, w))).cast("long")
      val punct = (col("len") - col("len_keep")).cast("double") / col("len").cast("double")
      val nwD = greatest(nw.cast("double"), lit(1.0))
      val stopR = nsw.cast("double") / nwD
      base.select(col("doc_id"),
          col("len").as("n_chars_text"),
          nw.as("n_words"),
          round(punct, 6).as("punct_ratio"),
          round(stopR, 6).as("stopword_ratio"),
          round(nalnum.cast("double") / nwD, 6).as("mean_word_len"),
          round(least(lit(1.0),
            least(nw.cast("double") / 20.0, lit(1.0)) *
              (lit(1.0) - punct) * (lit(0.5) + stopR)), 6).as("quality"))
        .orderBy(col("doc_id"))
    }
    time("quality_fused")(qualityFused())

    spark.stop()
  }
}
