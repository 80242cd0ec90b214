package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum

package object queries {

  /** Exact, order-independent sum of a 2-dp double column: per-element
    * DECIMAL cast makes the aggregation associative-exact so Spark and
    * the DuckDB oracle hash-match bit for bit. The determinism-critical
    * idiom for every monetary sum in the registry; widen the precision
    * here if warehouse-scale sums ever approach decimal(18,_) overflow.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Signed-zero normalization for rounded slope/correlation/difference
    * outputs. A numerator like n·Σxy − Σx·Σy can cancel to a tiny
    * negative residual on a degenerate corpus (constant column), which
    * rounds to -0.0 in one engine and +0.0 in the other — the driver's
    * hash distinguishes them. IEEE guarantees `-0.0 + 0.0 = +0.0` and
    * leaves every nonzero value unchanged, so appending `+ 0.0` after
    * the final round() in BOTH engines (`+ 0.0` in the oracle SQL) makes
    * the zero canonical. Apply to every output column produced by a
    * subtraction that can vanish: slopes, correlations, covariances,
    * diffs, log-ratios.
    */
  def znorm(c: Column): Column = c + org.apache.spark.sql.functions.lit(0.0)
}
