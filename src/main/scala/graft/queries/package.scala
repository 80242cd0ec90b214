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
}
