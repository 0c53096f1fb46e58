package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{FakeDecoder, FakeEmbedder, Multimodal}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("payload bytes round-trip the document text deterministically") {
    val a = Multimodal.payloadStats(spark, sf).select("doc_id", "checksum")
      .as[(Long, String)].collect().toMap
    val b = Multimodal.payloadStats(spark, sf).select("doc_id", "checksum")
      .as[(Long, String)].collect().toMap
    assert(a == b)
    // checksum equals md5 of the text column
    val direct = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")))
      .as[(Long, String)].collect().toMap
    assert(a == direct)
  }

  test("kind assignment covers all three modalities") {
    val kinds = Multimodal.mediaTable(spark, sf)
      .select("kind").distinct().as[String].collect().toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decodeStats emits the typed metadata schema and is deterministic") {
    val d = Multimodal.decodeStats(spark, sf)
    assert(d.columns.toSeq ==
      Seq("doc_id", "kind", "n_bytes", "width", "height", "n_frames", "sample_rate"))
    val images = d.filter(col("kind") === "image")
    assert(images.filter(col("width") < 16 || col("width") >= 80).count() == 0)
    assert(images.filter(col("n_frames") =!= 1).count() == 0)
    val audio = d.filter(col("kind") === "audio")
    assert(audio.filter(col("sample_rate") < 8000).count() == 0)
    val twice = Multimodal.decodeStats(spark, sf).collect().toSeq
    assert(twice == d.collect().toSeq)
  }

  test("frameSample emits k evenly-spaced in-range frame indices per video") {
    val fs = Multimodal.frameSample(spark, sf, k = 4)
    val perDoc = fs.groupBy("doc_id").count()
    assert(perDoc.filter(col("count") =!= 4L).count() == 0)
    assert(fs.filter(col("frame_idx") < 0 ||
      col("frame_idx") >= col("n_frames")).count() == 0)
    // sample 0 is always frame 0; samples are non-decreasing
    assert(fs.filter(col("sample_i") === 0L && col("frame_idx") =!= 0L).count() == 0)
  }

  test("embedTopK ranks neighbors per query, excluding self") {
    val t = Multimodal.embedTopK(spark, sf, k = 3)
    assert(t.filter(col("q_id") === col("nb_id")).count() == 0)
    assert(t.filter(col("q_id") % 101 =!= 0).count() == 0)
    val perQ = t.groupBy("q_id").count()
    assert(perQ.filter(col("count") > 3L).count() == 0)
    // cos non-increasing within each query's ranking
    val rows = t.collect().groupBy(_.getLong(0))
    rows.values.foreach { rs =>
      val cs = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("FakeEmbedder reads bytes cyclically and never yields a zero vector") {
    val v = FakeEmbedder.embed("image", Array[Byte](1, 2))
    assert(v.length == FakeEmbedder.Dim)
    assert(v.toSeq == Seq(2.0, 3.0, 2.0, 3.0, 2.0, 3.0, 2.0, 3.0))
    assert(FakeEmbedder.embed("audio", Array.empty[Byte]).forall(_ == 1.0))
  }

  test("FakeDecoder is a pure function of bytes") {
    val m1 = FakeDecoder.decode("image", Array[Byte](10, 20, 30))
    val m2 = FakeDecoder.decode("image", Array[Byte](10, 20, 30))
    assert(m1 == m2)
    assert(FakeDecoder.decode("audio", Array[Byte](3)).sample_rate == 8000 + 3 * 8000 % 40000)
  }
}
