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

  test("graft_jaccard merges sorted long arrays in one pass") {
    import graft.functions.JaccardFunctions
    val rows = Seq(
      (1L, Array(1L, 2L, 3L, 4L), Array(3L, 4L, 5L, 6L)), // inter 2, union 6
      (2L, Array(1L, 2L), Array(1L, 2L)),                 // identical
      (3L, Array(1L, 2L), Array(5L, 6L))                  // disjoint
    ).toDF("id", "a", "b")
    val got = rows.select(col("id"), JaccardFunctions.jaccardSorted(col("a"), col("b")).as("j"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 2.0 / 6.0) < 1e-12)
    assert(got(2L) == 1.0 && got(3L) == 0.0)
    // empty side -> null (undefined)
    val n = Seq((Array.empty[Long], Array(1L)))
      .toDF("a", "b")
      .select(JaccardFunctions.jaccardSorted(col("a"), col("b")))
      .collect()(0)
    assert(n.isNullAt(0))
    // matches the builtin-composed formulation on random-ish sets
    val sets = Seq.tabulate(40)(i =>
      (i.toLong, (0L to 30L).filter(v => (v * 7 + i) % 3 == 0).toArray,
        (0L to 30L).filter(v => (v * 11 + i) % 4 == 0).toArray))
      .toDF("id", "a", "b")
    val diff = sets.select(abs(
      JaccardFunctions.jaccardSorted(col("a"), col("b")) -
        size(array_intersect(col("a"), col("b"))).cast("double") /
          (size(col("a")) + size(col("b")) -
            size(array_intersect(col("a"), col("b")))).cast("double")).as("d"))
      .agg(max(col("d"))).as[Double].head()
    assert(diff < 1e-12)
  }

  test("graft_jaccard is registered for SQL") {
    Seq((Array(1L, 2L, 3L), Array(2L, 3L, 4L))).toDF("a", "b")
      .createOrReplaceTempView("jtest")
    val j = spark.sql("SELECT graft_jaccard(a, b) AS j FROM jtest").as[Double].head()
    assert(math.abs(j - 0.5) < 1e-12)
  }

  test("token window hashes: shape, determinism, distinct identity") {
    import graft.functions.TokenWindowHash.tokenWindowHashes
    val docs = Seq(
      (1L, Array("a", "b", "c", "d", "e")),
      (2L, Array("a", "b", "c")),          // exactly n tokens -> 1 window
      (3L, Array("a", "b")),               // shorter than n -> empty
      (4L, Array("a", "b", "c", "a", "b", "c")) // repeated trigram
    ).toDF("id", "toks")
    val got = docs.select(col("id"), tokenWindowHashes(col("toks"), 3).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L).length == 3 && got(2L).length == 1 && got(3L).isEmpty)
    // same token window -> same id, regardless of document/position
    assert(got(4L).head == got(4L)(3) && got(2L).head == got(1L).head)
    // different windows -> different ids (all 3 windows of doc 1 distinct)
    assert(got(1L).distinct.length == 3)
    // window identity matches position-sensitive content: "b c d" != "a b c"
    assert(got(1L)(1) != got(1L).head)
  }

  test("token window hashes: codegen and interpreted eval agree") {
    import graft.functions.TokenWindowHash.tokenWindowHashes
    val docs = Seq.tabulate(30)(i =>
      (i.toLong, (0 to (i % 11)).map(k => s"tok${(k * 7 + i) % 5}").toArray))
      .toDF("id", "toks")
    // size() over the hashes forces an eval through codegen; compare
    // against a collect()-side recomputation via the interpreted path
    val viaDf = docs.select(col("id"), tokenWindowHashes(col("toks"), 4).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val expr = graft.functions.TokenWindowHashes(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        null, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)), 4)
    docs.collect().foreach { r =>
      val toks = r.getSeq[String](1)
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
      val interp = expr.nullSafeEval(arr)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .toLongArray().toList
      assert(interp == viaDf(r.getLong(0)),
        s"codegen/interpreted mismatch for ${toks.mkString(" ")}")
    }
  }

  test("rp band signature: codegen and interpreted eval agree, and " +
      "a driver-side dot recompute confirms the bits") {
    import graft.functions.RpBandSignature
    val dim = 16
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed * 31L + 5)
      Array.fill(dim)(r.nextGaussian().toFloat)
    }
    val docs = Seq.tabulate(40)(i => (i.toLong, vec(i))).toDF("id", "emb")
    val (nb, bw) = (4, 16)
    val viaDf = docs.select(col("id"),
        RpBandSignature.rpBandSignature(col("emb"), nb, bw, dim).as("bs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val expr = graft.functions.RpBandSignature(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        null, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)), nb, bw, dim)
    val signs = RpBandSignature.signMatrix(nb * bw, dim)
    docs.collect().foreach { r =>
      val e = r.getSeq[Float](1)
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        e.toArray[Any])
      val interp = expr.nullSafeEval(arr)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .toLongArray().toList
      assert(interp == viaDf(r.getLong(0)),
        s"codegen/interpreted mismatch for id ${r.getLong(0)}")
      // independent driver-side recompute of every bit
      val expect = (0 until nb).map { b =>
        (0 until bw).foldLeft(0L) { (acc, i) =>
          val j = b * bw + i
          val dot = e.indices.foldLeft(0.0)((s, p) =>
            s + e(p).toDouble * signs(j * dim + p))
          if (dot > 0) acc | (1L << i) else acc
        }
      }.toList
      assert(expect == viaDf(r.getLong(0)), "bit mismatch vs driver recompute")
    }
  }

  test("native sqL2 is bit-identical to the composed fold, with its null semantics") {
    // equal-length, no nulls: BIT-identical (same left-to-right fold)
    val emb = graft.sources.Tables.load(spark, sf, "embeddings").limit(50)
    val pairs = emb.crossJoin(emb.select(col("embedding").as("e2")).limit(5))
    val mismatches = pairs.filter(
      VectorFunctions.sqL2(col("embedding"), col("e2")) =!=
        VectorFunctions.sqL2Composed(col("embedding"), col("e2"))).count()
    assert(mismatches == 0L, "native sqL2 diverged from the HOF fold")
    // known value on floats
    val v = Seq((Array(1.0f, 2.0f), Array(3.0f, 0.0f))).toDF("a", "b")
      .select(VectorFunctions.sqL2(col("a"), col("b"))).as[Double].head()
    assert(v == 8.0)
    // unequal lengths → null (the HOF's zip-pad-null poisoning)
    val uneq = Seq((Array(1.0), Array(1.0, 2.0))).toDF("a", "b")
    assert(uneq.select(VectorFunctions.sqL2(col("a"), col("b"))).collect()(0).isNullAt(0))
    assert(uneq.select(VectorFunctions.sqL2Composed(col("a"), col("b"))).collect()(0).isNullAt(0))
    // null element → null, matching the fold
    val withNull = Seq((Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("a", "b")
    assert(withNull.select(VectorFunctions.sqL2(col("a"), col("b"))).collect()(0).isNullAt(0))
    assert(withNull.select(VectorFunctions.sqL2Composed(col("a"), col("b"))).collect()(0).isNullAt(0))
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
