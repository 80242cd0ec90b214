package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{CharEntropy, DotProduct, PolyTokenHash, RollingHash, SqDist}

/** SparkSessionExtensions entry point: registers the engine's native
  * codegen expressions with the SQL function registry, so
  * `spark.sql("SELECT rolling_hash(text) ...")` and
  * `dot_product(a, b)` work in plain SQL with the same generated code
  * as the Column API.
  *
  * Install via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.GraftExtensions`.
  *
  * Function injection is deliberately the engine's ONLY extension
  * hook: no custom optimizer rules or strategies are needed
  * (SURVEY.md §4 — every reference operator maps to built-in plans
  * that Catalyst already optimizes).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash(children.head),
    ))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(children(0), children(1)),
    ))
    ext.injectFunction((
      FunctionIdentifier("sq_dist"),
      new ExpressionInfo(classOf[SqDist].getName, "sq_dist"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SqDist(children(0), children(1)),
    ))
    ext.injectFunction((
      FunctionIdentifier("char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "char_entropy"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CharEntropy(children.head),
    ))
    ext.injectFunction((
      FunctionIdentifier("poly_token_hash"),
      new ExpressionInfo(classOf[PolyTokenHash].getName, "poly_token_hash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PolyTokenHash(children.head),
    ))
  }
}
