package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification: complete date spines with
  * zero-fill / last-observation-carried-forward semantics (the q106
  * engine). Aggregate-first by design — callers pass an ALREADY
  * AGGREGATED daily table, so the global-ordered LOCF window runs over
  * one row per day (thousands at any corpus size), never raw facts;
  * the only single-partition stage is O(days). Spine bounds arrive as
  * a broadcast scalar row.
  */
object TimeSeries {

  /** Left-join `daily` (one row per date in `dayCol`, gaps allowed)
    * onto the complete min..max date spine. Columns in `zeroFill` get
    * 0 on gap days; columns in `locf` get a carried-forward copy named
    * `<col>_locf` (null until the first observation). The output day
    * is an ISO yyyy-MM-dd string.
    */
  def gapFillDaily(daily: DataFrame, dayCol: String,
      zeroFill: Seq[String], locf: Seq[String]): DataFrame = {
    val spine = daily.agg(min(dayCol).as("lo"), max(dayCol).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as(dayCol))
    val w = Window.orderBy(dayCol).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = spine.join(daily, Seq(dayCol), "left")
    val cols =
      Seq(date_format(col(dayCol), "yyyy-MM-dd").as(dayCol)) ++
        zeroFill.map(c => coalesce(col(c), lit(0L)).as(c)) ++
        locf.flatMap(c => Seq(
          coalesce(col(c), lit(0.0)).as(c),
          last(col(c), ignoreNulls = true).over(w).as(s"${c}_locf")))
    joined.select(cols: _*).orderBy(dayCol)
  }
}
