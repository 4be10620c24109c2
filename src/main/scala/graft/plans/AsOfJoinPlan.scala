package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — a whole-operator Catalyst extension
  * (LogicalPlan + SparkStrategy + SparkPlan, injected through
  * `GraftExtensions`).
  *
  * The composed form (`AsOfJoin.asofComposed`: tag/union both sides, window
  * `last(_, ignoreNulls)` carry) already has the right *distribution*
  * cost — one hash shuffle per side on the key — but it pays three
  * avoidable executor-side taxes: every build row is padded to the
  * union's full width and carried through the sort; every probe row
  * evaluates a window aggregate frame; and the post-filter
  * (`_side = 1`) re-scans the unioned stream. This exec keeps the
  * shuffle shape (ClusteredDistribution on the key, per-partition
  * sort on (key, time) — EnsureRequirements plans exactly the
  * sort-merge exchanges a join would get) and replaces the
  * union+window with ONE streaming merge pass: both sorted iterators
  * advance monotonically, each probe row emits once with the last
  * build row at-or-before its time, and per-partition state is a
  * single copied carry row — O(1) memory, no padding, no window
  * machinery, no post-filter.
  *
  * Semantics match the composed form (and DuckDB's
  * `ASOF JOIN ... ON l.t >= r.t`) exactly: inclusive on time ties,
  * last build row wins on (key, time) build ties, probe rows with no
  * eligible build row keep null carry columns. Null build keys/times
  * are skipped; null probe keys/times carry null.
  *
  * Scale: per-partition state is one row regardless of key
  * cardinality or skew; AQE's skew handling applies to the exchanges
  * as usual. Keys and times are compared with interpreted orderings
  * on copied values — the merge itself never materializes either
  * side.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightCarry: Seq[Attribute]) extends BinaryNode {

  require(leftKey.dataType == rightKey.dataType,
    s"asof key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTime.dataType == rightTime.dataType,
    s"asof time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")

  // carry side is nullable: probe rows may precede every build row
  override def output: Seq[Attribute] = left.output ++ rightCarry.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, carry) =>
      SortMergeAsOfExec(lk, rk, lt, rt, carry, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class SortMergeAsOfExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightCarry: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  private def carryAttrs: Seq[Attribute] = rightCarry.map(_.withNullability(true))

  override def output: Seq[Attribute] = left.output ++ carryAttrs

  /** Both sides cluster on the key: EnsureRequirements co-partitions
    * them (same exchanges a sort-merge join gets). */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  /** Per-partition (key, time) sort on each side — the merge's only
    * precondition. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Probe rows pass through in sorted order. */
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyB = BindReferences.bindReference(leftKey, lOut)
    val lTimeB = BindReferences.bindReference(leftTime, lOut)
    val rKeyB = BindReferences.bindReference(rightKey, rOut)
    val rTimeB = BindReferences.bindReference(rightTime, rOut)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val outAttrs = output
    val nCarry = rightCarry.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val carryProj = UnsafeProjection.create(rightCarry, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ carryAttrs)
      val joined = new JoinedRow
      val nullCarry: InternalRow = new GenericInternalRow(nCarry)
      val rBuf = rIter.buffered
      // the whole merge state: the newest eligible build row (copied —
      // unsafe rows are reused by the sort) and its key
      var carryRow: InternalRow = null
      var carryKey: Any = null
      lIter.map { l =>
        val k = lKeyB.eval(l)
        val t = lTimeB.eval(l)
        if (k == null || t == null) {
          resultProj(joined(l, nullCarry))
        } else {
          var advance = true
          while (advance && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rKeyB.eval(r)
            val rt = rTimeB.eval(r)
            if (rk == null || rt == null) { rBuf.next() }
            else {
              val c = keyOrd.compare(rk, k)
              if (c < 0 || (c == 0 && timeOrd.compare(rt, t) <= 0)) {
                if (c == 0) { // eligible: remember it (later rows overwrite)
                  carryRow = carryProj(r).copy()
                  carryKey = InternalRow.copyValue(rk)
                }
                rBuf.next() // c < 0: build key has no remaining probes — drop
              } else advance = false // build side is ahead; stop
            }
          }
          val valid = carryKey != null && keyOrd.compare(carryKey, k) == 0
          resultProj(joined(l, if (valid) carryRow else nullCarry))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SortMergeAsOfExec =
    copy(left = newLeft, right = newRight)
}
