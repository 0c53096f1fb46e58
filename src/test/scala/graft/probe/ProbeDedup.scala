package graft

import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the dedup near-dup paths. */
object ProbeDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.load(spark, dir, "documents")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val sh = graft.operators.Dedup.shingles(docs).cache()
    time("shingles count")(println("  rows=" + sh.count()))
    val sigs = time("minhash sigs")(graft.operators.Dedup.minhashSignatures(docs).cache())
    time("sigs count")(println("  rows=" + sigs.count()))
    val rowsPerBand = graft.operators.Dedup.MinhashK / graft.operators.Dedup.MinhashBands
    val bandArr = array((0 until graft.operators.Dedup.MinhashBands).map { bIdx =>
      val comps = (0 until rowsPerBand).map(r => col(s"sig_${bIdx * rowsPerBand + r}"))
      xxhash64((lit(bIdx) +: comps): _*)
    }: _*)
    val bands = sigs.select(col("doc_id"), posexplode(bandArr).as(Seq("band_idx", "band_hash"))).cache()
    time("bands count")(println("  rows=" + bands.count()))
    val cand = bands.alias("x").join(bands.alias("y"), Seq("band_idx", "band_hash"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b")).distinct().cache()
    time("cand count")(println("  rows=" + cand.count()))
    time("full minhashPairs")(
      println("  rows=" + graft.operators.Dedup.minhashPairs(spark, dir).count()))
    time("full ngramJaccard")(
      println("  rows=" + graft.operators.Dedup.ngramJaccard(spark, dir).count()))
    spark.stop()
  }
}
