package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF JOIN — the whole-operator extension point (SURVEY §4.3
  * tier (c)): a custom `LogicalPlan` node, planned by an injected
  * `SparkStrategy` into a custom `SparkPlan`, registered through
  * `SparkSessionExtensions` (graft.GraftExtensions). Spark has no
  * as-of join; the composable workarounds either UNION both relations
  * into one window pass (one global (key, ts) sort over the COMBINED
  * data, no per-side pruning — the q35 shape) or explode a range join.
  * This operator instead declares exactly the distribution and
  * ordering it needs and merges:
  *
  *   - requiredChildDistribution: both children clustered on their
  *     key — EnsureRequirements co-partitions them (the sort-merge
  *     join machinery, reused, not reimplemented);
  *   - requiredChildOrdering: (key, ts) ascending per side — sorts
  *     are per-side, so a pre-bucketed/sorted table satisfies its
  *     side for free (the 100 TB case: a quotes table laid out by
  *     (symbol, ts) never re-sorts);
  *   - execute: one forward-only streaming merge per partition — for
  *     each left row, the LAST right row of the same key with
  *     rightTs <= leftTs (inclusive; ties resolved to the last row in
  *     right sort order). O(|L| + |R|) per partition, O(1) state (one
  *     buffered right row), never materializing a pair set.
  *
  * LEFT OUTER semantics: every left row survives; unmatched rows
  * carry nulls for the right side. Rows with null key or null ts on
  * the left emit unmatched (SQL comparison-with-null semantics, what
  * DuckDB's `ASOF LEFT JOIN` does); null-key/ts right rows match
  * nothing and are skipped.
  *
  * Variants (pandas merge_asof parity, all same O(|L|+|R|) merge):
  *   - direction "backward" (default): LAST right row with
  *     rightTs <= leftTs — ties in right ts resolve to the last row
  *     in right sort order;
  *   - direction "forward": FIRST right row with rightTs >= leftTs —
  *     ties resolve to the first row in right sort order;
  *   - tolerance (optional): max |leftTs - rightTs| in the ts type's
  *     INTERNAL units (micros for TimestampType, days for DateType,
  *     the value itself for integral types); a candidate beyond it
  *     emits unmatched. Requires an integral-backed ts type.
  *
  * Caller contract: left/right output attribute NAMES should be
  * disjoint (rename before joining) — the node concatenates outputs
  * like a join and duplicate names make downstream by-name selects
  * ambiguous.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    direction: String = "backward",
    tolerance: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  require(direction == "backward" || direction == "forward",
    s"asof direction must be backward|forward, got '$direction'")
  override lazy val resolved: Boolean = childrenResolved &&
    Seq(leftKey, rightKey, leftTs, rightTs).forall(_.resolved) &&
    leftKey.dataType.sameType(rightKey.dataType) &&
    leftTs.dataType.sameType(rightTs.dataType)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoinPlan → AsOfJoinExec. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy`.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(j.leftKey, j.rightKey, j.leftTs, j.rightTs,
        j.direction, j.tolerance,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    direction: String, tolerance: Option[Long],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)),
    ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // the merge preserves the left side's partitioning and row order —
  // declaring BOTH lets a downstream consumer keyed on (key) or
  // (key, ts) skip its own exchange/sort
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched left rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // tolerance needs the NUMERIC distance between two ts values, which
  // exists only for integral-backed types (TimestampType/NTZ = micros,
  // DateType = days, integral columns = themselves)
  private def tsAsLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case s: java.lang.Short => s.toLong
    case b: java.lang.Byte => b.toLong
    case other => throw new IllegalArgumentException(
      s"asof tolerance needs an integral-backed ts type, got $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val nRight = right.output.size
    val forward = direction == "forward"
    val tol = tolerance
    // bind once on the driver; expressions are serializable
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val numOut = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRight)
      val rBuf = rIter.buffered
      def out(l: InternalRow, r: InternalRow, matched: Boolean): InternalRow = {
        numOut += 1; if (matched) numMatched += 1; joined(l, r)
      }
      def withinTol(lts: Any, rts: Any): Boolean = tol.forall { t =>
        math.abs(tsAsLong(lts) - tsAsLong(rts)) <= t
      }
      if (forward) {
        // FORWARD: candidate is the right HEAD once everything earlier
        // than this left row is dropped — a right row with rts < lts is
        // useless for this and every LATER left row (left ts ascending),
        // so dropping is safe; the head itself is NOT consumed (the next
        // left row may match it too).
        lIter.map { l =>
          val lk = lKeyB.eval(l)
          val lts = lTsB.eval(l)
          if (lk == null || lts == null) out(l, nullRight, false)
          else {
            var advance = true
            while (advance && rBuf.hasNext) {
              val head = rBuf.head
              val rk = rKeyB.eval(head)
              val rts = rTsB.eval(head)
              if (rk == null || rts == null) rBuf.next()
              else if (keyOrd.compare(rk, lk) < 0) rBuf.next()
              else if (keyOrd.compare(rk, lk) == 0 &&
                  tsOrd.compare(rts, lts) < 0) rBuf.next()
              else advance = false
            }
            if (rBuf.hasNext) {
              val head = rBuf.head
              val rk = rKeyB.eval(head)
              val rts = rTsB.eval(head)
              if (rk != null && keyOrd.compare(rk, lk) == 0 &&
                  withinTol(lts, rts)) out(l, head, true)
              else out(l, nullRight, false)
            } else out(l, nullRight, false)
          }
        }
      } else {
        // BACKWARD: the one-row as-of state — the last right row
        // (copied: iterator rows are reused buffers) whose key we saw,
        // with key/ts evaluated AGAINST THE COPY (evaluating on the
        // live buffer would silently mutate under the iterator)
        var lastRow: InternalRow = null
        var lastKey: Any = null
        var lastTs: Any = null
        lIter.map { l =>
          val lk = lKeyB.eval(l)
          val lts = lTsB.eval(l)
          if (lk == null || lts == null) out(l, nullRight, false)
          else {
            // consume every right row still usable for THIS left row:
            // smaller key (drop), or same key with ts <= left ts
            // (becomes the candidate). Null-key/ts right rows skipped.
            var advance = true
            while (advance && rBuf.hasNext) {
              val head = rBuf.head
              val rk = rKeyB.eval(head)
              val rts = rTsB.eval(head)
              if (rk == null || rts == null) rBuf.next()
              else if (keyOrd.compare(rk, lk) < 0) rBuf.next()
              else if (keyOrd.compare(rk, lk) == 0 &&
                  tsOrd.compare(rts, lts) <= 0) {
                val c = rBuf.next().copy()
                lastRow = c
                lastKey = rKeyB.eval(c)
                lastTs = rTsB.eval(c)
              } else advance = false
            }
            // the candidate is the MAX rts <= lts; if IT fails the
            // tolerance, every earlier row fails it too
            if (lastRow != null && keyOrd.compare(lastKey, lk) == 0 &&
                withinTol(lts, lastTs))
              out(l, lastRow, true)
            else out(l, nullRight, false)
          }
        }
      }
    }
  }
}
