package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass data-quality profiling (the Deequ-style completeness /
  * distinctness / range report a warehouse load gate runs before
  * publishing a table — the automated form of the reference's manual
  * post-load sanity queries).
  *
  * Scale shape: ONE aggregation over the table computes every metric
  * for every profiled column (count / non-null / exact distinct / min
  * / max); the per-column report rows are then unpivoted from that
  * single result row map-side. Exact multi-column distinct counts use
  * Catalyst's Expand (one pass over the data, ×(columns+1) rows into
  * the partial agg) — at very wide profiles swap `exactDistinct =
  * false` to HLL sketches and the Expand disappears.
  */
object Quality {

  /** Per-column profile: (col_name, n_rows, n_nonnull, n_distinct,
    * min_val, max_val), min/max rendered as strings so one report row
    * type covers every column type. Cast imprecise floats to DECIMAL
    * before profiling if the string forms must be engine-portable.
    */
  def profile(df: DataFrame, cols: Seq[String], exactDistinct: Boolean = true): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
