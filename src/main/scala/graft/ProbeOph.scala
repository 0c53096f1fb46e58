package graft

import org.apache.spark.sql.functions._

/** Stage-by-stage timing of ophPairs at a soak scale — which stage is
  * super-linear at 100x? (dev probe, not part of the gate)
  */
object ProbeOph {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_soak/x100")
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    import graft.operators.Dedup
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val sh = Dedup.shinglesRaw(docs)
      .select(col("doc_id"), md5(col("shingle").cast("binary")).as("m"))
      .cache()
    timed("shingles+cache count")(println(sh.count()))
    val h = sh.select(col("doc_id"),
      conv(substring(col("m"), 1, 15), 16, 10).cast("long").as("h"))
    val bins = h.groupBy(col("doc_id"), pmod(col("h"), lit(16L)).as("bin"))
      .agg(min(col("h")).as("sig"))
    timed("bins count")(println(bins.count()))
    val spine = h.select(col("doc_id")).distinct()
      .withColumn("bin", explode(sequence(lit(0L), lit(15L))))
    val full = spine.join(bins, Seq("doc_id", "bin"), "left")
      .withColumn("sig", coalesce(col("sig"), lit(1L << 60)))
      .withColumn("band", expr("bin DIV 4"))
    val bands = full.groupBy(col("doc_id"), col("band"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("bin"), col("sig").cast("string").as("s")))),
        x => x.getField("s")), "_").as("sigstr"),
        min(col("sig")).as("__min_sig"))
      .filter(col("__min_sig") < lit(1L << 60))
      .select(col("doc_id"),
        md5(concat_ws("_", col("band").cast("string"), col("sigstr"))
          .cast("binary")).as("band_hash"))
      .cache()
    timed("bands count")(println(bands.count()))
    val cand = bands.alias("x")
      .join(bands.alias("y"), Seq("band_hash"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
      .cache()
    timed("cand count")(println(cand.count()))
    // hottest band buckets — if a bucket is huge the join is quadratic
    timed("top buckets")(
      bands.groupBy(col("band_hash")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc).limit(10).collect()
        .foreach(r => println(s"[probe] bucket ${r.getString(0).take(8)} n=${r.getLong(1)}")))
    timed("verify")(
      println(Dedup.verifyJaccardProbe(sh, cand, 0.7).count()))
    spark.stop()
  }
}
