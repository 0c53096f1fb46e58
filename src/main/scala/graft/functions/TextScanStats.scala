package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All per-document character/token statistics of the quality
  * pre-filter in ONE pass over the text bytes:
  *
  *   n_chars  total characters (UTF-8 aware)
  *   n_space  ASCII space characters
  *   n_words  maximal ASCII-alphanumeric runs (the `[A-Za-z0-9]+`
  *            tokenization)
  *   n_alnum  ASCII alphanumeric characters (Σ token lengths)
  *   n_keep   characters in `[A-Za-z0-9 ]` (the punctuation-ratio
  *            keep class)
  *   n_stop   tokens case-insensitively equal to one of the seven
  *            stopwords (the, a, of, and, to, in, is)
  *
  * The composed form costs one regex tokenizer pass + one
  * regexp_replace pass + interpreted array HOFs per document — at the
  * 1000x soak (1.5 GB of text) text_quality was the single most
  * expensive query (456 s). This kernel reads each byte once, no
  * allocation beyond the 6-long result row. Non-ASCII characters
  * count toward n_chars, terminate alnum runs, and fall outside the
  * keep class — exactly the regex semantics (`[A-Za-z0-9]` is
  * ASCII-only; the corpus contains no characters whose Unicode
  * case-folding enters ASCII, the same assumption the existing
  * lower()-then-tokenize formulation already makes).
  */
case class TextScanStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = TextScanStats.schema
  override def prettyName: String = "graft_text_scan_stats"

  override def nullSafeEval(input: Any): Any =
    TextScanStats.scanRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextScanStats.scanRow($s);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextScanStats {

  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_space", LongType, nullable = false),
    StructField("n_words", LongType, nullable = false),
    StructField("n_alnum", LongType, nullable = false),
    StructField("n_keep", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))

  // the seven stopwords as lowercase bytes, grouped by length
  private val stop1 = Array("a").map(_.getBytes("UTF-8"))
  private val stop2 = Array("of", "to", "in", "is").map(_.getBytes("UTF-8"))
  private val stop3 = Array("the", "and").map(_.getBytes("UTF-8"))

  @inline private def isAlnum(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')

  @inline private def low(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b | 0x20).toByte else b

  private def isStop(buf: Array[Byte], len: Int): Boolean = {
    val cands = len match {
      case 1 => stop1
      case 2 => stop2
      case 3 => stop3
      case _ => return false
    }
    var i = 0
    while (i < cands.length) {
      val c = cands(i)
      var j = 0
      var ok = true
      while (ok && j < len) { ok = low(buf(j)) == c(j); j += 1 }
      if (ok) return true
      i += 1
    }
    false
  }

  /** One pass over the UTF-8 bytes; called from both interpreted eval
    * and generated code.
    */
  def scanRow(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    var chars = 0L; var space = 0L; var words = 0L
    var alnum = 0L; var keep = 0L; var stop = 0L
    val runBuf = new Array[Byte](4) // only runs <= 3 can be stopwords
    var runLen = 0
    var i = 0
    def closeRun(): Unit = if (runLen > 0) {
      words += 1
      if (runLen <= 3 && isStop(runBuf, runLen)) stop += 1
      runLen = 0
    }
    while (i < n) {
      val b = bytes(i)
      if ((b & 0x80) == 0) { // ASCII
        chars += 1
        if (isAlnum(b)) {
          alnum += 1; keep += 1
          if (runLen < 4) { runBuf(runLen & 3) = b }
          runLen += 1
        } else {
          closeRun()
          if (b == ' ') { space += 1; keep += 1 }
        }
        i += 1
      } else { // multi-byte char: 1 char, not alnum/space/keep
        closeRun()
        chars += 1
        var skip = 1
        if ((b & 0xE0) == 0xC0) skip = 2
        else if ((b & 0xF0) == 0xE0) skip = 3
        else if ((b & 0xF8) == 0xF0) skip = 4
        i += skip
      }
    }
    closeRun()
    new GenericInternalRow(Array[Any](chars, space, words, alnum, keep, stop))
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column wrapper: struct of one-pass text statistics. */
  def textScanStats(text: Column): Column =
    ColumnBridge.column(TextScanStats(ColumnBridge.expression(text)))
}
