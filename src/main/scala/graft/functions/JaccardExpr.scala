package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact Jaccard similarity |A∩B| / |A∪B| over two SORTED long arrays
  * in ONE merge pass.
  *
  * The LSH verify stage (graft.operators.Dedup.minhashPairs) runs this
  * once per candidate pair. The builtin composition
  * `size(array_intersect(a, b))` hashes one side into a set per call
  * and walks both arrays separately; this expression instead streams
  * the two sorted arrays like a merge join — no allocation, no
  * boxing, inside whole-stage codegen. Inputs MUST be sorted ascending
  * and duplicate-free (collect_set + sort_array upstream); duplicates
  * on either side would be counted once per occurrence.
  *
  * Returns null if either array is empty (Jaccard undefined on ∅ here:
  * the dedup caller treats token-less docs via the exact-dup path).
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    if (na == 0 || nb == 0) return null
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    java.lang.Double.valueOf(inter.toDouble / (na + nb - inter).toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |if ($na == 0 || $nb == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $i = 0; int $j = 0; int $inter = 0;
         |  while ($i < $na && $j < $nb) {
         |    long $x = $a.getLong($i);
         |    long $y = $b.getLong($j);
         |    if ($x == $y) { $inter++; $i++; $j++; }
         |    else if ($x < $y) { $i++; }
         |    else { $j++; }
         |  }
         |  ${ev.value} = (double) $inter / (double) ($na + $nb - $inter);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardFunctions {

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column wrapper over the native expression. */
  def jaccardSorted(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaccardSorted(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Register `graft_jaccard` for SQL via SparkSessionExtensions. */
  def registerSql(e: SparkSessionExtensions): Unit =
    e.injectFunction(
      (
        new FunctionIdentifier("graft_jaccard"),
        new ExpressionInfo(classOf[JaccardSorted].getName, "graft_jaccard"),
        (children: Seq[Expression]) => JaccardSorted(children(0), children(1))
      )
    )
}
