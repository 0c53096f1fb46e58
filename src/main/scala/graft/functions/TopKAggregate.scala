package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.{FunctionIdentifier, InternalRow}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded top-k as a REAL aggregate function (`graft_topk`):
  * per-group k-largest struct values via a size-k min-heap.
  *
  * Why this exists: the window formulation of top-N-per-group
  * (row_number → filter) must SORT every partition's full group data
  * before discarding all but k rows. This aggregate keeps at most k
  * rows of state per group on each map task, combines map-side
  * (partial aggregation — heaps merge associatively), and ships only
  * k-row heaps through the shuffle. At 100 TB that's the difference
  * between shuffling the fact table and shuffling |groups|·k rows.
  *
  * Input is a struct whose lexicographic order defines the ranking
  * (put the sort key first, tie-breakers after); output is the array
  * of the k largest structs, descending — deterministic whenever the
  * struct ordering is total.
  */
case class BoundedTopK(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val rowOrdering: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(structType).asInstanceOf[Ordering[InternalRow]]
  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType =>
      if (!org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(s))
        TypeCheckResult.TypeCheckFailure(s"$prettyName needs an orderable struct")
      else if (!kExpr.foldable || kExpr.eval() == null ||
        kExpr.eval().asInstanceOf[Number].intValue() <= 0)
        TypeCheckResult.TypeCheckFailure(s"$prettyName needs a positive literal k")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a struct argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  // PriorityQueue dequeues its LARGEST element; reverse the ordering so
  // the head is the smallest retained row — the one to evict at k+1.
  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    new mutable.PriorityQueue[InternalRow]()(rowOrdering.reverse)

  override def update(buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (buf.size < k) buf.enqueue(row.copy())
      else if (rowOrdering.compare(row, buf.head) > 0) {
        buf.dequeue(); buf.enqueue(row.copy())
      }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach { row =>
      if (buf.size < k) buf.enqueue(row)
      else if (rowOrdering.compare(row, buf.head) > 0) {
        buf.dequeue(); buf.enqueue(row)
      }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.toSeq.sorted(rowOrdering.reverse).toArray[Any])

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { row =>
      val unsafe = toUnsafe(row)
      out.writeInt(unsafe.getSizeInBytes)
      unsafe.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val buf = createAggregationBuffer()
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    (0 until n).foreach { _ =>
      val size = in.getInt
      val rowBytes = new Array[Byte](size)
      in.get(rowBytes)
      val row = new UnsafeRow(structType.length)
      row.pointTo(rowBytes, size)
      buf.enqueue(row)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override def children: Seq[Expression] = Seq(child, kExpr)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object TopKFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `groupBy(...).agg(topK(struct(sortKey, tieBreak, payload...), k))` */
  def topK(structCol: Column, k: Int): Column =
    ColumnBridge.column(
      BoundedTopK(ColumnBridge.expression(structCol), Literal(k))
        .toAggregateExpression())

  /** Register `graft_topk` for SQL via SparkSessionExtensions. */
  def registerSql(e: SparkSessionExtensions): Unit =
    e.injectFunction(
      (
        new FunctionIdentifier("graft_topk"),
        new ExpressionInfo(classOf[BoundedTopK].getName, "graft_topk"),
        (children: Seq[Expression]) => BoundedTopK(children(0), children(1))
      )
    )
}
