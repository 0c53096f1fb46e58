package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

class TextSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "The quick brown fox, and the lazy dog!"),
    (2L, "a b c"),
    (3L, "!!! ???")
  ).toDF("doc_id", "text")

  test("token counts") {
    val r = docs.select(col("doc_id"),
      TextFunctions.nWsTokens(col("text")).as("ws"),
      TextFunctions.nWords(col("text")).as("w"),
      TextFunctions.nAlnumChars(col("text")).as("c"))
      .collect().map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(1L) == ((8L, 8L, 29L)))
    assert(r(2L) == ((3L, 3L, 3L)))
    assert(r(3L) == ((2L, 0L, 0L)))
  }

  test("stopword counting is case-insensitive") {
    val n = docs.filter(col("doc_id") === 1L)
      .select(TextFunctions.nStopwords(col("text"))).as[Long].head()
    assert(n == 3) // The, and, the
  }

  test("quality and langid run end-to-end on sf data") {
    val q = TextFunctions.qualityScore(spark, sf)
    assert(q.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
    val l = TextFunctions.langId(spark, sf)
    assert(l.filter(!col("lang_guess").isin("en", "de", "es")).count() == 0)
  }

  test("fingerprint is whitespace-insensitive") {
    val two = Seq((1L, "a  b   c"), (2L, " a b c ")).toDF("doc_id", "text")
    val fps = two.select(md5(TextFunctions.normText(col("text")).cast("binary")))
      .as[String].collect()
    assert(fps(0) == fps(1))
  }
}
