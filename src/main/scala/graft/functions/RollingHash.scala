package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string — document fingerprinting
  * primitive (content-defined chunking / dedup prefilters).
  *
  * Implemented as a native Catalyst `Expression` with `doGenCode` so it
  * runs inside whole-stage codegen (no UDF serialization, no boxing on
  * the hot path): h = Σ h·131 + byte mod 1e9+7, over UTF-8 bytes.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHash.hashBytes($c.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  final val Base = 131L
  final val Mod  = 1000000007L

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Base + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    h
  }

  /** Column wrapper: `RollingHash($"text")`. */
  def apply(c: Column): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(c)))
}
