package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All sliding token n-gram window hashes of a tokenized document in
  * ONE codegen'd pass: `array<string>` tokens → `array<long>` of
  * 64-bit window ids (length `L - n + 1`, empty when `L < n`).
  *
  * The composed form — `transform(sequence(...), i =>
  * xxhash64(slice(toks, i+1, n)))` — runs the higher-order lambda
  * INTERPRETED: per window it allocates a slice array and re-hashes n
  * token strings through expression dispatch, which measured as the
  * dominant cost of the containment gram scan at the 100x soak scale
  * (23 s of a 33 s query). This kernel hashes each token's bytes
  * exactly once (XXH64), then derives every window id by seed-chaining
  * the n per-token 64-bit hashes — O(L) string hashing + O(L·n) long
  * mixing, no per-window allocation, inside whole-stage codegen.
  *
  * Window ids are INTERNAL identities (callers expose only
  * distinct-gram counts, never the ids), so the exact hash family does
  * not need to match `xxhash64(slice(...))` — only injectivity-in-
  * practice matters, the same 64-bit-collision regime as the 60-bit
  * md5 gram ids used by the detectors that do expose ids.
  *
  * Null tokens (impossible from the regex tokenizer, but the type
  * allows them) hash as an empty byte string.
  */
case class TokenWindowHashes(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"window size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_window_hashes"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val len = toks.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](len)
    var k = 0
    while (k < len) {
      th(k) =
        if (toks.isNullAt(k)) XXH64.hashInt(0, 42L)
        else {
          val s = toks.getUTF8String(k)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      k += 1
    }
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var seed = 42L
      var j = i
      val end = i + n
      while (j < end) { seed = XXH64.hashLong(th(j), seed); j += 1 }
      out(i) = seed
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      val len = ctx.freshName("len")
      val m = ctx.freshName("m")
      val th = ctx.freshName("tokHash")
      val out = ctx.freshName("out")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val seed = ctx.freshName("seed")
      val s = ctx.freshName("s")
      s"""
         |int $len = $arr.numElements();
         |int $m = $len - $n + 1;
         |if ($m <= 0) {
         |  ${ev.value} = new $gad(new long[0]);
         |} else {
         |  long[] $th = new long[$len];
         |  for (int $k = 0; $k < $len; $k++) {
         |    if ($arr.isNullAt($k)) {
         |      $th[$k] = $xxh.hashInt(0, 42L);
         |    } else {
         |      UTF8String $s = $arr.getUTF8String($k);
         |      $th[$k] = $xxh.hashUnsafeBytes(
         |        $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |    }
         |  }
         |  long[] $out = new long[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    long $seed = 42L;
         |    for (int $j = $i; $j < $i + $n; $j++) {
         |      $seed = $xxh.hashLong($th[$j], $seed);
         |    }
         |    $out[$i] = $seed;
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenWindowHash {

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column wrapper: 64-bit ids of all token n-gram windows. */
  def tokenWindowHashes(toks: Column, n: Int): Column =
    ColumnBridge.column(TokenWindowHashes(ColumnBridge.expression(toks), n))
}
