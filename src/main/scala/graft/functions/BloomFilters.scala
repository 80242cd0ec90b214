package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter build + probe over Spark's own runtime-filter
  * machinery (`BloomFilterAggregate` / `BloomFilterMightContain`, the
  * expressions Catalyst's InjectRuntimeFilter plants for shuffle
  * pruning — both codegen'd, zero UDF).
  *
  * Scale shape: [[build]] is one partial-aggregated pass over the
  * build side producing a single constant-size binary (numBits/8
  * bytes — a bounded scalar collect, like a centroid sidecar);
  * [[mightContain]] embeds that binary as a literal, so the probe is
  * a pure per-row predicate evaluated before any shuffle. That turns
  * "join 100 TB against a membership set" into "scan 100 TB, keep the
  * ~hit-rate fraction, then exact-verify only survivors" — the
  * standard two-phase shape when the set is too big to broadcast as
  * exact keys but its bitset is not.
  *
  * Hashing is XxHash64 on both sides (the aggregate puts the 64-bit
  * hash, the probe tests it), so build and probe agree by
  * construction. False positives are possible (fpp governed by
  * numBits/n); false negatives are not — callers that need exactness
  * re-verify survivors against the true set.
  */
object BloomFilters {

  /** One-pass distributed build over `c`'s values; returns the
    * serialized filter (constant-size scalar).
    */
  def build(df: DataFrame, c: Column, expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftBridge.expression(c))),
      Literal(expectedItems), Literal(numBits))
    val row = df.select(GraftBridge.column(agg.toAggregateExpression()).as("bf")).head()
    row.getAs[Array[Byte]](0)
  }

  /** Per-row membership probe against a built filter. */
  def mightContain(bf: Array[Byte], c: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal(bf, BinaryType),
      new XxHash64(Seq(GraftBridge.expression(c)))))
}
