package graft

/** One-off probe: run dedup_containment against the 100x soak dataset
  * and print the full failure stack + the final plan, so the broadcast
  * OOM seen in the soak can be attributed to a specific join.
  */
object ProbeContain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_soak/x100")
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.operators.Dedup.containmentPairs(spark, dir)
    df.explain("formatted")
    try {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"OK ${(System.nanoTime() - t0) / 1e9}%.2f s")
    } catch {
      case e: Throwable =>
        e.printStackTrace()
        println("=== FINAL (adaptive) PLAN ===")
        df.explain("formatted")
    }
    spark.stop()
  }
}
