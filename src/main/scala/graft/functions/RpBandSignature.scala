package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All `nb` random-hyperplane band values of one embedding in ONE
  * codegen'd pass: `array<float|double>` → `array<long>` of length
  * `nb`, where bit i of band b is the sign of the dot product with
  * md5-derived hyperplane j = b·bw + i (see
  * [[graft.operators.Similarity.rpBandValues]], whose banding this
  * kernel implements).
  *
  * Why an Expression: the dots are a dense (dim × nb·bw) multiply.
  * The original posexplode → broadcast-sign-join → groupBy(vec_id)
  * formulation shuffles n·nb·bw·8 B of partial sums (~42 GB at 33.5M
  * vectors under the 156-bit tier — it filled the soak host's disk);
  * the higher-order-function form (one zip_with+aggregate per
  * hyperplane) is shuffle-free but allocates nb·bw temporary arrays
  * per row through interpreted lambda dispatch (measured 2.2x the
  * join form's CPU at 4.1M vectors). This kernel walks the vector
  * once, accumulating all nb·bw dots in a flat double[] inside
  * whole-stage codegen — no shuffle, no per-row allocation beyond the
  * two output-sized arrays.
  *
  * The hyperplane sign matrix is a pure function of (nb, bw, dim) —
  * md5-derived per (j, position), identical to the SQL-expression
  * form the DuckDB oracle replays — so it is NOT carried in the
  * expression's constructor (plans stay readable, semantic equality
  * stays structural); each task materializes it lazily, dim·nb·bw
  * doubles. Dot summation order is ascending position — the same
  * sequential fold the oracle-green HOF form used. Null elements
  * contribute zero.
  */
case class RpBandSignature(child: Expression, nb: Int, bw: Int, dim: Int)
    extends UnaryExpression {

  require(nb >= 1 && bw >= 1 && bw <= 62 && dim >= 1,
    s"bad band config nb=$nb bw=$bw dim=$dim")

  private def elemType: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rp_band_signature"

  /** Flat sign matrix, laid out [j * dim + pos]. */
  @transient private lazy val signs: Array[Double] =
    RpBandSignature.signMatrix(nb * bw, dim)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val bits = nb * bw
    val dots = new Array[Double](bits)
    val isFloat = elemType == FloatType
    val n = math.min(arr.numElements(), dim)
    var p = 0
    while (p < n) {
      if (!arr.isNullAt(p)) {
        val v = if (isFloat) arr.getFloat(p).toDouble else arr.getDouble(p)
        val base = p
        var j = 0
        while (j < bits) { dots(j) += v * signs(j * dim + base); j += 1 }
      }
      p += 1
    }
    val out = new Array[Long](nb)
    var b = 0
    while (b < nb) {
      var v = 0L
      var i = 0
      while (i < bw) { if (dots(b * bw + i) > 0) v |= (1L << i); i += 1 }
      out(b) = v
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val gad = classOf[GenericArrayData].getName
      val cls = RpBandSignature.getClass.getName.stripSuffix("$")
      // the matrix is deterministic from (bits, dim); cached per JVM in
      // the companion so generated classes share one copy
      val sg = ctx.addMutableState("double[]", "rpSigns",
        v => s"$v = $cls.signMatrix(${nb * bw}, $dim);")
      val getter = if (elemType == FloatType)
        s"(double) $arr.getFloat" else s"$arr.getDouble"
      val dots = ctx.freshName("dots")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val bv = ctx.freshName("bv")
      s"""
         |double[] $dots = new double[${nb * bw}];
         |int $n = java.lang.Math.min($arr.numElements(), $dim);
         |for (int $p = 0; $p < $n; $p++) {
         |  if (!$arr.isNullAt($p)) {
         |    double $v = $getter($p);
         |    for (int $j = 0; $j < ${nb * bw}; $j++) {
         |      $dots[$j] += $v * $sg[$j * $dim + $p];
         |    }
         |  }
         |}
         |long[] $out = new long[$nb];
         |for (int $b = 0; $b < $nb; $b++) {
         |  long $bv = 0L;
         |  for (int $i = 0; $i < $bw; $i++) {
         |    if ($dots[$b * $bw + $i] > 0) $bv |= (1L << $i);
         |  }
         |  $out[$b] = $bv;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RpBandSignature {

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Per-JVM cache of sign matrices keyed by (bits, dim) — tasks of
    * one stage share the array instead of re-deriving dim·bits md5s.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  /** Flat [j * dim + pos] ±1 matrix; bit-identical to
    * `md5Bits(concat(j, '_', pos), 1, 15) & 1` — the expression form
    * the DuckDB oracle replays.
    */
  def signMatrix(bits: Int, dim: Int): Array[Double] =
    cache.computeIfAbsent((bits, dim), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Double](bits * dim)
      var j = 0
      while (j < bits) {
        var p = 0
        while (p < dim) {
          md.reset()
          val hex = md.digest(s"${j}_$p".getBytes("UTF-8"))
            .map(b => f"$b%02x").mkString
          out(j * dim + p) =
            if ((java.lang.Long.parseLong(hex.substring(0, 15), 16) & 1L) == 1L)
              1.0
            else -1.0
          p += 1
        }
        j += 1
      }
      out
    })

  /** Column wrapper: the nb band values of an embedding. */
  def rpBandSignature(emb: Column, nb: Int, bw: Int, dim: Int): Column =
    ColumnBridge.column(
      RpBandSignature(ColumnBridge.expression(emb), nb, bw, dim))
}
