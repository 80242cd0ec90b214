package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * `rightTs <= leftTs` within the same key — the standard align-to-
  * latest-state operator (trades⇄quotes, events⇄dimensions-over-time).
  *
  * Spark has no native ASOF JOIN; the composition here is the scalable
  * union-sort-window form rather than a per-key loop:
  *   1. tag and union both inputs,
  *   2. one window partitioned by key ordered by (ts, side) carries the
  *      last right payload forward (`last(..., ignoreNulls)`),
  *   3. keep left rows, now holding the as-of right values.
  * One shuffle on the key, linear in |L| + |R| — no range-join blowup.
  * Right rows at exactly leftTs win over earlier ones (ties: right
  * sorts before left at the same timestamp), matching DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts` inclusive semantics.
  *
  * Tie semantics among MULTIPLE right rows at the same (key, ts): the
  * window's final sort key picks the winner. By default that key is the
  * payload struct itself — deterministic (max payload wins) but it
  * requires every payload column to be orderable (no maps), and an
  * engine with different ASOF tie rules may pick another row. Callers
  * with a unique right-side id should pass it as `tieBreakCol`; it then
  * replaces the payload as the final sort key, making the pick
  * row-identity-based and portable.
  */
object AsOfJoin {

  def join(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      payloadCols: Seq[String], tieBreakCol: Option[String] = None): DataFrame = {
    // Payload travels as ONE struct: last(_, ignoreNulls) then skips
    // only rows with no right match at all — a matched right row whose
    // payload fields are NULL still wins (DuckDB ASOF semantics), and
    // all payload columns are guaranteed to come from the same row.
    val pStruct = struct(payloadCols.map(col): _*)
    val pType = right.select(pStruct).schema.head.dataType
    val tbType = tieBreakCol.map(tb => right.schema(tb).dataType)
    val lTagged = left.withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(pType))
      .withColumn("__tb", lit(null).cast(tbType.getOrElse(org.apache.spark.sql.types.IntegerType)))
    val rTagged = right.select(col(keyCol), col(tsCol), pStruct.as("__p"),
        tieBreakCol.map(tb => col(tb).as("__tb"))
          .getOrElse(lit(null).cast("int").as("__tb")))
      .withColumn("__side", lit(0))
    val leftCols = left.columns
    val unioned = lTagged.select((leftCols ++ Seq("__side", "__p", "__tb")).map(col): _*)
      .unionByName(
        rTagged.withColumns(
          leftCols.filterNot(c => c == keyCol || c == tsCol)
            .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)
          .select((leftCols ++ Seq("__side", "__p", "__tb")).map(col): _*))
    // final sort key: the caller's unique right-row id when given, else
    // the payload struct — either way right-side ties at the same
    // (key, ts) resolve deterministically regardless of partitioning
    val tieKey = if (tieBreakCol.isDefined) col("__tb") else col("__p")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("__side"), tieKey)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    payloadCols.foldLeft(carried.filter(col("__side") === 1)) { (df, c) =>
      df.withColumn(c, col(s"__p.$c"))
    }.drop("__side", "__p", "__tb")
  }
}
