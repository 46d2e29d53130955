package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.StringType

import graft.functions.DotProduct

/** SQL-surface registration of graft's custom expressions
  * (SURVEY.md §4.3 extension point). Two ways in:
  *
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the standard SparkSessionExtensions route), or
  *  - `GraftExtensions.register(spark)` on a live session.
  *
  * Registered functions:
  *  - `graft_dot(a, b)`    — native codegen'd sequential dot product
  *  - `graft_hash64(s)`    — the md5-derived 60-bit positive hash the
  *                           sketch operators build on
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - sequential double dot product"),
      dotBuilder))
    e.injectFunction((FunctionIdentifier("graft_hash64"),
      info("graft_hash64", "graft_hash64(s) - md5-derived 60-bit hash"),
      hash64Builder))
    // optimizer extension: derive the implied length guard for
    // levenshtein-threshold filters (see the rule's scaladoc)
    e.injectOptimizerRule(_ => graft.plans.LevenshteinLengthPrune)
    // planner extension: the native as-of join (custom LogicalPlan →
    // custom SparkPlan; see org.apache.spark.sql.graft.AsOfJoin)
    e.injectPlannerStrategy(_ => org.apache.spark.sql.graft.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "")

  private val dotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) =>
      DotProduct(Cast(a, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)),
        Cast(b, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    case other =>
      throw new IllegalArgumentException(
        s"graft_dot expects 2 arguments, got ${other.size}")
  }

  private val hash64Builder: Seq[Expression] => Expression = {
    case Seq(s) =>
      graft.functions.Md5Hash64(Cast(s, StringType))
    case other =>
      throw new IllegalArgumentException(
        s"graft_hash64 expects 1 argument, got ${other.size}")
  }

  /** Register on a live session (temp-function registry). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graft.Shims.registerFunction(spark, "graft_dot", dotBuilder)
    org.apache.spark.sql.graft.Shims.registerFunction(spark, "graft_hash64", hash64Builder)
  }
}
