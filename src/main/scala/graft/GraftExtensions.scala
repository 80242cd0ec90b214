package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.RollingHash

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions with the SQL function registry, so
  * `spark.sql("SELECT rolling_hash(text) ...")` works in plain SQL.
  *
  * Install via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  *
  * Deliberately the engine's ONLY extension hook: no custom optimizer
  * rules or strategies are needed (SURVEY.md §4 — every reference
  * operator maps to built-in plans that Catalyst already optimizes).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash(children.head),
    ))
  }
}
