package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator broadcast interval join (INNER): for every left row,
  * attach the right-side interval row with `start <= t < end` —
  * the reference's per-year cutoff-calendar assignment
  * (create_view_vw_valid_collision_from_oracle.sql:2-26,48-58) as a
  * first-class operator.
  *
  * CONTRACT: the interval set is non-overlapping (a calendar); each
  * left row matches at most one interval. Rows matching none are
  * dropped (inner join).
  *
  * Why a custom exec beats BroadcastNestedLoopJoin at scale: BNLJ
  * probes every interval per fact row — O(|intervals|) comparisons per
  * row, fine for 8 calendar weeks but not for 10k fine-grained buckets.
  * This exec collects the (small) interval side once, sorts it by
  * start, and binary-searches per fact row: O(log |intervals|), with
  * the probe array broadcast to executors exactly like a broadcast
  * hash table.
  */
case class IntervalJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftTs: Attribute, start: Attribute, end: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoin =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(l, r, t, s, e) =>
      IntervalJoinExec(planLater(l), planLater(r), t, s, e) :: Nil
    case _ => Nil
  }
}

case class IntervalJoinExec(
    left: SparkPlan, right: SparkPlan,
    // Expression (not Attribute): plan preparation rewrites these to
    // BoundReference, and makeCopy must accept that.
    leftTs: Expression, start: Expression, end: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val startB = BindReferences.bindReference(start, right.output)
    val endB = BindReferences.bindReference(end, right.output)
    val ord = TypeUtils.getInterpretedOrdering(leftTs.dataType)
      .asInstanceOf[Ordering[Any]]
    // The interval side is collected ONCE on the driver (it is small by
    // contract — a calendar), sorted by start, and shipped to every
    // executor as one broadcast, the same lifecycle as a broadcast hash
    // table. Bounds are pre-evaluated so the probe never re-evals.
    val rows = right.executeCollect()
    val sorted = rows.sortWith((a, b) => ord.compare(startB.eval(a), startB.eval(b)) < 0)
    val starts = sorted.map(startB.eval)
    val ends = sorted.map(endB.eval)
    val bc = sparkContext.broadcast((sorted, starts, ends))
    val outputAttrs = output
    val leftOutput = left.output
    val ltsExpr = leftTs
    left.execute().mapPartitions { iter =>
      val (ivRows, ivStarts, ivEnds) = bc.value
      val ltsB = BindReferences.bindReference(ltsExpr, leftOutput)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
      iter.flatMap { lRow =>
        val t = ltsB.eval(lRow)
        if (t == null || ivRows.isEmpty) Iterator.empty
        else {
          // binary search: last interval with start <= t
          var lo = 0; var hi = ivRows.length - 1; var idx = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (ord.compare(ivStarts(mid), t) <= 0) { idx = mid; lo = mid + 1 }
            else hi = mid - 1
          }
          if (idx >= 0 && ivEnds(idx) != null && ord.compare(t, ivEnds(idx)) < 0)
            Iterator.single(proj(joined(lRow, ivRows(idx))))
          else Iterator.empty
        }
      }
    }
  }
}

/** DataFrame-facing API. */
object IntervalJoinOps {
  import org.apache.spark.sql.graftbridge.DatasetBridge

  def intervalJoinNative(spark: SparkSession, left: DataFrame,
      intervals: DataFrame, leftTs: String,
      start: String, end: String): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = intervals.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${p.output.map(_.name).mkString(",")}"))
    DatasetBridge.ofRows(spark,
      IntervalJoin(lPlan, rPlan,
        attr(lPlan, leftTs), attr(rPlan, start), attr(rPlan, end)))
  }
}
