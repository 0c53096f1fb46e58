package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
    (2L, Array(1.0f, 1.0f), Array(1.0f, 1.0f)),
    (3L, Array(1.0f, 2.0f), Array(2.0f, 4.0f)),
    (4L, Array(0.0f, 0.0f), Array(1.0f, 1.0f))
  ).toDF("id", "a", "b")

  test("native cosine matches known values") {
    val got = vecs.select(col("id"),
      round(VectorFunctions.cosine(col("a"), col("b")), 9).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).contains(0.0))
    assert(got(2L).contains(1.0))
    assert(got(3L).contains(1.0))
    assert(got(4L).isEmpty) // zero norm → null
  }

  test("native expression and builtin composition agree") {
    val diff = vecs.filter(col("id") =!= 4L).select(
      abs(VectorFunctions.cosine(col("a"), col("b")) -
        VectorFunctions.cosineComposed(col("a"), col("b"))).as("d"))
      .agg(max(col("d"))).as[Double].head()
    assert(diff < 1e-12)
  }

  test("double arrays are accepted") {
    val d = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
    val c = d.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("graft_cosine is registered for SQL") {
    import spark.implicits._
    Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
      .createOrReplaceTempView("vtest")
    val c = spark.sql("SELECT graft_cosine(a, b) AS c FROM vtest").as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("agreement on real embeddings") {
    val emb = graft.sources.Tables.load(spark, sf, "embeddings").limit(50)
    val diff = emb.crossJoin(emb.select(col("embedding").as("e2")).limit(5))
      .select(abs(VectorFunctions.cosine(col("embedding"), col("e2")) -
        VectorFunctions.cosineComposed(col("embedding"), col("e2"))).as("d"))
      .agg(max(col("d"))).as[Double].head()
    assert(diff < 1e-12)
  }
}
