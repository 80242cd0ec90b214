package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile state — [[AggState]]'s incremental-refresh
  * contract extended from the monoid quad (cnt/total/min/max) to
  * order statistics, which the quad cannot answer.
  *
  * Exact streaming quantiles need the full multiset, so every
  * incremental system stores a sketch; the engine's sketch is the
  * simplest one that is EXACTLY mergeable: fixed-bin counts over a
  * declared [lo, hi) range. State = (keys…, bin, cnt) with
  * bin = clamp(⌊(v − lo)/w⌋, 0, bins−1) — a pure per-row expression,
  * so `build` is one keyed partial+final aggregate, and `merge` is
  * bin-count addition: `merge(build(old), build(delta)) ==
  * build(old ∪ delta)` bit for bit (integer sums — no rounding to
  * drift). A delta refresh shuffles ~|groups|·bins rows, never the
  * fact table.
  *
  * `quantile` interpolates inside the covering bin (the classic
  * equi-width histogram estimator): error is bounded by one bin width
  * — a deliberate, DECLARED approximation, unlike a t-digest whose
  * error depends on merge order. Everything downstream of the state
  * is deterministic column math over ≤ bins rows per group (windows
  * partition by key — never a global sort), which is also what lets
  * the DuckDB oracle replay estimates bit-for-bit (q135).
  */
object HistState {

  /** Fold raw rows into per-(keys, bin) counts. Rows outside
    * [lo, hi) clamp into the edge bins, so totals are preserved and
    * merge stays lossless even when the declared range is wrong.
    */
  def build(df: DataFrame, keys: Seq[String], valueCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, s"bins=$bins, range=[$lo,$hi)")
    val w = (hi - lo) / bins
    val bin = least(greatest(floor((col(valueCol) - lit(lo)) / lit(w)), lit(0)),
      lit(bins - 1)).cast("int")
    df.groupBy((keys.map(col) :+ bin.as("bin")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Add two state tables (schemas must match: keys ++ bin, cnt).
    * Bins present on only one side pass through — the "append this
    * partition" refresh.
    */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = keys ++ Seq("bin", "cnt")
    require(a.columns.toSeq == cols && b.columns.toSeq == cols,
      s"hist state schema must be ${cols.mkString(",")}; " +
        s"got ${a.columns.mkString(",")} / ${b.columns.mkString(",")}")
    a.unionByName(b).groupBy((keys :+ "bin").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Read-time quantile estimate per group at probability `p`:
    * target rank = p·(n−1) (the interpolated-percentile convention),
    * covered by the first bin whose cumulative count exceeds it;
    * interpolate linearly inside that bin. All windows partition by
    * the keys over ≤ bins rows. Output: keys…, q (6 dp).
    */
  def quantile(state: DataFrame, keys: Seq[String], lo: Double, hi: Double,
      bins: Int, p: Double): DataFrame = {
    require(p >= 0 && p <= 1, s"p=$p")
    val w = (hi - lo) / bins
    val kw = Window.partitionBy(keys.map(col): _*)
    val ord = kw.orderBy(col("bin"))
    val cum = state
      .withColumn("n", sum(col("cnt")).over(kw))
      .withColumn("cum", sum(col("cnt")).over(ord))
      .withColumn("before", col("cum") - col("cnt"))
      .withColumn("target", lit(p) * (col("n") - lit(1)))
    // exactly one covering bin per group: before/cum are integer
    // cumulative counts, 0 ≤ target < n
    cum.filter(col("target") >= col("before") && col("target") < col("cum"))
      .select((keys.map(col) :+
        round(lit(lo) + (col("bin") + (col("target") - col("before")) / col("cnt"))
          * lit(w), 6).as("q")): _*)
  }
}
