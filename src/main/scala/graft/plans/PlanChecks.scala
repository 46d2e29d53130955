package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Physical-plan introspection helpers — the assertions the spec suite
  * uses to PIN the plans we want at scale (pushdown reaching the scan,
  * bounded dims broadcast, two-phase top-k, codegen participation),
  * exposed as a small library API so downstream users can gate their
  * own pipelines the same way.
  */
object PlanChecks {

  def executedPlan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Predicate pushed into the file source scan. */
  def hasPushedFilter(df: DataFrame, fragment: String): Boolean = {
    val p = executedPlan(df)
    p.contains("PushedFilters:") && p.contains(fragment)
  }

  /** A broadcast hash join somewhere in the plan (bounded dim joins). */
  def hasBroadcastJoin(df: DataFrame): Boolean =
    executedPlan(df).contains("BroadcastHashJoin")

  /** Global top-k planned as TakeOrderedAndProject (no full sort). */
  def hasTakeOrdered(df: DataFrame): Boolean =
    executedPlan(df).contains("TakeOrderedAndProject")

  /** Per-group top-k rank filter rewritten to WindowGroupLimit. */
  def hasWindowGroupLimit(df: DataFrame): Boolean =
    executedPlan(df).contains("WindowGroupLimit")

  /** File scans reachable from a plan, descending into AQE wrappers
    * (AdaptiveSparkPlanExec is a leaf node — a plain collect stops at
    * it and would miss every scan under an adaptive plan).
    */
  private def fileScans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect { case s: FileSourceScanExec => Seq(s)
                case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
              }.flatten

  /** No file scan's read schema contains the given column (pruned).
    * Inspects the scan nodes' requiredSchema directly — the plan STRING
    * both truncates ReadSchema ("struct<…tim...") and mentions column
    * names in unrelated sections (filters, joins), so text matching is
    * wrong in both directions.
    */
  def prunesColumn(df: DataFrame, column: String): Boolean = {
    val scans = fileScans(df.queryExecution.executedPlan)
    scans.nonEmpty &&
      !scans.exists(_.requiredSchema.fieldNames.contains(column))
  }

  /** Number of whole-stage-codegen spans. EXECUTES the plan: under AQE
    * codegen ids are only assigned at runtime, so the final adaptive
    * plan is the only honest thing to inspect. Wider spans (fewer,
    * larger) mean more of the plan runs fused and codegen'd.
    */
  def wholeStageCodegenSpans(df: DataFrame): Int = {
    // df.count() would build a NEW QueryExecution; drive THIS plan's RDD
    // so the adaptive plan we inspect is the one that finalized.
    df.queryExecution.executedPlan.execute().count()
    "\\*\\((\\d+)\\)".r.findAllMatchIn(executedPlan(df))
      .map(_.group(1).toInt).toSet.size
  }

  /** Number of file source scans (parquet, text, csv, ...) in the plan
    * — 1 means the facts are read exactly once (no multi-branch subplan
    * re-reading the source).
    */
  def fileScanCount(df: DataFrame): Int =
    fileScans(df.queryExecution.executedPlan).size

  /** A BroadcastNestedLoopJoin anywhere — the O(n²)-with-full-broadcast
    * shape that non-equi joins degrade to; scale-sensitive operators
    * assert its ABSENCE.
    */
  def hasBroadcastNestedLoop(df: DataFrame): Boolean =
    executedPlan(df).contains("BroadcastNestedLoopJoin")

  /** Count of shuffle exchanges in the plan — the scale-critical number
    * to watch when composing operators.
    */
  def exchangeCount(df: DataFrame): Int =
    "(?m)^\\s*(?:\\+- |:- )?Exchange ".r
      .findAllMatchIn(executedPlan(df)).size

  /** (broadcast-hash, sort-merge, shuffled-hash, nested-loop) join
    * node counts — the star-shape pin: a dimension that stops
    * broadcasting or a fact join that degrades to nested-loop shows up
    * as a count change here before it shows up as a 100 TB incident.
    */
  def joinCounts(df: DataFrame): (Int, Int, Int, Int) = {
    import org.apache.spark.sql.execution.joins._
    val ns = allNodes(df.queryExecution.executedPlan)
    (ns.count(_.isInstanceOf[BroadcastHashJoinExec]),
      ns.count(_.isInstanceOf[SortMergeJoinExec]),
      ns.count(_.isInstanceOf[ShuffledHashJoinExec]),
      ns.count(n => n.isInstanceOf[BroadcastNestedLoopJoinExec] ||
        n.isInstanceOf[CartesianProductExec]))
  }

  /** Window nodes whose partition spec is EMPTY — the move-everything-
    * to-one-task shape that turns a global rank into a scale incident.
    * Operators that claim a distributed ranking assert this is 0.
    */
  def singlePartitionWindows(df: DataFrame): Int =
    allNodes(df.queryExecution.executedPlan).count {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.isEmpty
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
        w.partitionSpec.isEmpty
      case _ => false
    }

  /** Every physical node reachable from `p`, descending through the AQE
    * wrappers that hide their subtree from a plain `collect`:
    * AdaptiveSparkPlanExec and the QueryStageExec leaves the FINAL
    * adaptive plan is stitched from after execution. Both wrapper kinds
    * are themselves included (symmetrically — a node-count assertion
    * sees one node per wrapper plus its subtree). Cached
    * InMemoryRelations are deliberately NOT descended into — their plan
    * runs once at cache fill, not per consumer, so counting its nodes
    * per consuming branch would misstate the executed work. Use on
    * `df.queryExecution.executedPlan` AFTER driving the plan if the
    * final adaptive shape is wanted (see wholeStageCodegenSpans).
    */
  def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect {
      case a: AdaptiveSparkPlanExec => Seq(a) ++ allNodes(a.executedPlan)
      case q: QueryStageExec => Seq(q) ++ allNodes(q.plan)
      case n => Seq(n)
    }.flatten
}
