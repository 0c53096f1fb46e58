package graft

/** Dev-only: dump formatted physical plans for the headline queries so
  * the broadcast/pushdown/codegen audit is reviewable.
  */
object ProbeExplain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = Seq("q1_pricing_summary", "q_star_join_agg", "q_valid_entities",
      "q_semi_join_filter", "sim_bruteforce_topk", "q_topn_per_group",
      "dedup_exact", "text_quality")
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n======== $n ========")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
