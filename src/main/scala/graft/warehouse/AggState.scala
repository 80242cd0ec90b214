package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable aggregation state — incremental materialized-aggregate
  * maintenance for the warehouse's summary tables.
  *
  * The reference recomputes its dashboard aggregates from the full
  * fact table on every refresh; at warehouse scale the refresh must
  * instead fold ONLY the new partition into a persisted state table.
  * That works exactly when the stored measures form a commutative
  * monoid, so the state is the classic mergeable quad per group:
  *
  *   cnt: BIGINT, total: DECIMAL(28,2), vmin/vmax: DOUBLE
  *
  * `merge(build(old), build(delta)) == build(old ∪ delta)` bit for
  * bit: counts and decimal sums are associative-exact (the repo's
  * never-sum-raw-doubles rule — DECIMAL(28,2) holds ~10^26, far past
  * any 100-TB fact table's 2-dp money sum), min/max are idempotent
  * monoids. Derived measures (avg = total/cnt) are computed FROM the
  * state at read time, never stored — storing them would break
  * mergeability. Each build/merge is one keyed partial+final
  * aggregate: map-side combine shrinks the shuffle to ~|groups| rows
  * per task, and a delta refresh touches only the delta's groups.
  */
object AggState {

  private val Measures = Seq("cnt", "total", "vmin", "vmax")

  /** Fold raw rows into per-key state. */
  def build(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("decimal(28,2)").as("total"),
        min(col(valueCol)).as("vmin"),
        max(col(valueCol)).as("vmax"))

  /** Fold two state tables (schemas must match: keys ++ measures).
    * Groups present on only one side pass through unchanged, so this
    * is also the "append this month's partition" refresh.
    */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = keys ++ Measures
    require(a.columns.toSeq == cols && b.columns.toSeq == cols,
      s"agg state schema must be ${cols.mkString(",")}; " +
        s"got ${a.columns.mkString(",")} / ${b.columns.mkString(",")}")
    a.unionByName(b).groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("total")).cast("decimal(28,2)").as("total"),
        min(col("vmin")).as("vmin"),
        max(col("vmax")).as("vmax"))
  }

  /** Read-time view: state plus the derived mean (6 dp — exact
    * decimal total ÷ exact count, the repo's average idiom).
    */
  def withAvg(state: DataFrame): DataFrame =
    state.withColumn("avg_v", round(col("total").cast("double") / col("cnt"), 6))
}
