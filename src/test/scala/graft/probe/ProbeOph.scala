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
    // mirrors ophPairs' current shape: (doc_id, h) long cache, then
    // one conditional-min band aggregate (no spine join, no
    // collect_list object aggregation)
    val sh = Dedup.shinglesRaw(docs)
      .select(col("doc_id"),
        conv(substring(md5(col("shingle").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .cache()
    timed("shingles+cache count")(println(sh.count()))
    val keyed = sh
      .withColumn("bin", pmod(col("h"), lit(16L)))
      .withColumn("band", expr("bin DIV 4"))
      .withColumn("r", pmod(col("bin"), lit(4L)))
    val comps = (0 until 4).map(r =>
      coalesce(min(when(col("r") === r, col("h"))), lit(1L << 60)).as(s"s_$r"))
    val bands = keyed.groupBy(col("doc_id"), col("band"))
      .agg(comps.head, comps.tail: _*)
      .select(col("doc_id"),
        md5(concat_ws("_", col("band").cast("string") +:
            (0 until 4).map(r => col(s"s_$r").cast("string")): _*)
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
