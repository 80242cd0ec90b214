package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

import graft.ml.IsolationForestLite

/** Native isolation-forest anomaly score over an `array<double>`
  * feature column (Liu et al. 2008: s(x) = 2^(−E[h(x)] / c(ψ))).
  *
  * The fitted forest rides into generated code as a codegen reference
  * object (the standard mechanism whole-stage codegen uses for
  * broadcast-like constants), so scoring is a direct
  * `model.score(double[])` call per row — no Scala UDF dispatch and no
  * per-row `Seq[Double]` boxing, matching the repo's
  * [[DotProduct]]/[[SqDist]] codegen standard. The model is bounded by
  * construction (≤ trees × 2·ψ nodes, ~100 KB at the 100×256 default),
  * so embedding it per-task is the same cost profile as the broadcast
  * the UDF version used.
  */
case class IForestScore(child: Expression, model: IsolationForestLite.Model)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "iforest_score"

  override def nullSafeEval(input: Any): Any =
    model.score(input.asInstanceOf[ArrayData].toDoubleArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("iforestModel", model, model.getClass.getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $mRef.score($a.toDoubleArray());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IForestScore {
  def apply(features: Column, model: IsolationForestLite.Model): Column =
    GraftBridge.column(IForestScore(GraftBridge.expression(features), model))
}
