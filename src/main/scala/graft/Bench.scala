package graft

/** Benchmark main: headline queries at the SF the driver points at.
  * Results are fully materialized through the noop sink (count() alone
  * lets Catalyst prune the very work being measured).
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q_star_join_agg", "q_valid_entities",
    "q_topn_per_group", "q_sessionize", "q_tumbling_window",
    "q_asof_join", "q_salted_join_agg",
    "dedup_exact", "dedup_minhash", "dedup_ngram_jaccard",
    "sim_bruteforce_topk", "text_quality", "mm_payload_stats",
    "q_fusion_etl", "dedup_span", "text_contamination",
    "q_merge", "q_bloom_prune", "sim_pq_topk",
    "dedup_containment", "sim_mrl_topk", "text_curriculum",
    "q_retention_cohort",
    // round-3 session-2 additions
    "q_ohlc", "q_decimal_agg", "dedup_semantic", "text_pmi",
    "mm_shard_pack", "q_concurrency",
    // round-3 session-4 additions
    "q_trend_regression", "q_histogram_equi", "q_capped_balance",
    "q_attribution", "sim_rrf_fusion", "text_boilerplate",
    // round-3 session-5 additions
    "q_ship_priority", "q_region_volume", "sim_sparse_cosine",
    "text_keywords", "dedup_minhash_oph", "text_sentence_dedup")

  def main(args: Array[String]): Unit = {
    // Optional arg: comma-separated query subset (dev-only A/B timing);
    // the driver invokes with no args and times the full headline.
    val picked = args.headOption
      .map(_.split(",").toSeq.filter(headline.contains)).getOrElse(headline)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen paths once on the smallest SF so the measured
    // runs time the plan, not classloading.
    SparkEntry.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    // min of three runs per query: the first pays plan compilation and
    // codegen, the rest are steady-state samples — the min discards
    // ambient host noise (virtualized timing varies 2x run-to-run).
    // A run that throws contributes NO timing — a fast failure must not
    // make the benchmark look faster; failed queries are reported and
    // fail the process.
    val results = picked.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val times = (1 to 3).flatMap { _ =>
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            None
          }
        }
        name -> times.minOption
      }
    }
    val ok = results.collect { case (k, Some(v)) => k -> v }
    val failed = results.collect { case (k, None) => k }
    val qs = ok.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
