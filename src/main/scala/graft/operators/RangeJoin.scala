package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range (interval) join — "for each left row, the right rows
  * of the same key within a time window" without a cross product.
  *
  * Spark has no native range-join strategy: an inequality-only join
  * condition plans as BroadcastNestedLoopJoin (or worse, a cartesian),
  * which is quadratic per key. The standard fix is temporal binning:
  * quantize both sides to window-width bins, equi-join on
  * (key, bin) — each right row is exploded into the two bins whose
  * left rows could reach it — then apply the exact range predicate to
  * the candidates. The join is a plain shuffled (or broadcast)
  * hash-join on fixed-width keys; candidate fan-out per row is O(rows
  * in 2 bins), so cost tracks data density, never n² (same pattern as
  * the as-of join's bucketing, `operators/AsOfJoin.scala`).
  */
object RangeJoin {

  /** Pairs (l, r) with `l.key == r.key` and
    * `r.ts ∈ [l.ts - windowSec, l.ts)` (strictly before the left
    * event, at most windowSec earlier). Timestamps compare at
    * microsecond precision.
    *
    * Output: every left column, plus the matching right columns
    * prefixed `r_` (left rows with no match are dropped — compose
    * with a left join on the left key set if zero-match rows matter).
    */
  def lookback(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, windowSec: Long): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val winUs = windowSec * 1000000L
    def binOf(t: Column): Column = floor(unix_micros(t) / winUs)
    // a right row at bin b can precede left rows in bins b and b+1
    val l = left.withColumn("__bin", binOf(col(tsCol)))
    val rCols = Seq(col(keyCol), col(tsCol).as(s"r_$tsCol")) ++
      right.columns.filterNot(c => c == keyCol || c == tsCol).map(c => col(c).as(s"r_$c"))
    val r = right.select(rCols: _*)
      .withColumn("__bin", explode(array(binOf(col(s"r_$tsCol")), binOf(col(s"r_$tsCol")) + 1)))
    l.join(r, Seq(keyCol, "__bin"))
      .filter(col(s"r_$tsCol") < col(tsCol) &&
        unix_micros(col(s"r_$tsCol")) >= unix_micros(col(tsCol)) - winUs)
      .drop("__bin")
  }
}
