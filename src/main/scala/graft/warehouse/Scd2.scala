package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history (SURVEY.md §2.A warehouse
  * surface). The reference keeps dimensions current-state-only
  * (Postgres upsert, `scripts/etl.py:122-126`); a warehouse that feeds
  * analytics over *history* needs the type-2 form — every attribute
  * change opens a new versioned row with an effective interval instead
  * of overwriting. Two entry points:
  *
  *   - [[fromChangeLog]]: rebuild the full history from an event log
  *     (initial load / backfill).
  *   - [[applyChanges]]: incremental merge of a new snapshot into an
  *     existing SCD2 table (daily load).
  *
  * Scale shape: both are a single hash shuffle on the natural key.
  * [[fromChangeLog]] runs its change-flag window, the per-version
  * aggregation, and the interval-closing window all on that one
  * partitioning (key ⊆ every grouping/window key, so Catalyst reuses
  * the exchange); [[applyChanges]] is one outer join on the key —
  * zero shuffles when the table and snapshot are bucketed on it.
  */
object Scd2 {

  /** Collapse an ordered change log into SCD2 intervals: consecutive
    * rows of a key with identical `tracked` attributes merge into one
    * version; each attribute change opens the next. `tieBreak` makes
    * the per-key order total when `ts` alone has duplicates (runs of
    * equal-ts rows would otherwise version nondeterministically).
    *
    * Output: keys ++ tracked ++ (version, effective_from,
    * effective_to, is_current) — effective_to is the next version's
    * effective_from, null for the open (current) version.
    */
  def fromChangeLog(log: DataFrame, keys: Seq[String], ts: Column,
      tieBreak: Seq[Column], tracked: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ts +: tieBreak: _*)
    // null-safe change test: a first row (all lags null) counts as a
    // boundary via row_number, not via the attribute compare — a
    // legitimately-null first attribute must still open version 1
    val changed = tracked
      .map(t => !(col(t) <=> lag(col(t), 1).over(w)))
      .reduce(_ || _)
    val boundary = (row_number().over(w) === 1) || changed
    val versioned = log
      .withColumn("version",
        sum(when(boundary, 1L).otherwise(0L)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perVersion = versioned
      .groupBy((keys :+ "version").map(col): _*)
      .agg(min(ts).as("effective_from"),
        tracked.map(t => min(col(t)).as(t)): _*) // constant within a version
    val wv = Window.partitionBy(keys.map(col): _*).orderBy(col("version"))
    perVersion
      .withColumn("effective_to", lead(col("effective_from"), 1).over(wv))
      .withColumn("is_current", when(col("effective_to").isNull, 1).otherwise(0))
  }

  /** Incremental SCD2 merge: fold a current-state snapshot (MUST be
    * one row per key — a duplicate-key snapshot would open duplicate
    * versions; dedupe upstream, e.g. [[Merge.upsert]] keyed on the
    * natural key, before calling) observed at `asOf` into an existing
    * SCD2 table.
    * Changed keys close their open row at `asOf` and append a new
    * current version; unchanged keys pass through untouched; unseen
    * keys keep their history; brand-new keys open at version 1.
    * Idempotent: re-applying the same snapshot is a no-op.
    */
  def applyChanges(dim: DataFrame, snapshot: DataFrame, keys: Seq[String],
      tracked: Seq[String], asOf: Column): DataFrame = {
    val current = dim.filter(col("is_current") === 1)
    val closed  = dim.filter(col("is_current") === 0)
    // explicit membership marker: a snapshot row whose tracked
    // attributes are all legitimately null must not read as "key
    // absent from snapshot" after the outer join
    val snap = snapshot
      .select(keys.map(col) ++ tracked.map(c => col(c).as(s"__new_$c")): _*)
      .withColumn("__in_snap", lit(1))
    val joined  = current.join(snap, keys, "full_outer")
    val inSnap  = col("__in_snap").isNotNull // never three-valued after the outer join
    val newKey  = col("version").isNull          // in snapshot only
    val differs = tracked
      .map(t => !(col(t) <=> col(s"__new_$t")))
      .reduce(_ || _)
    // kept as-is: unchanged keys, and keys the snapshot didn't mention
    val untouched = joined
      .filter(!newKey && (!inSnap || !differs))
      .select(dim.columns.map(col): _*)
    // changed keys: close the open row at asOf
    val closedNow = joined
      .filter(!newKey && inSnap && differs)
      .select(dim.columns.map {
        case "effective_to" => asOf.as("effective_to")
        case "is_current"   => lit(0).as("is_current")
        case c              => col(c)
      }: _*)
    // changed + brand-new keys: open the next version at asOf
    val opened = joined
      .filter(inSnap && (newKey || differs))
      .select(keys.map(col) ++
        Seq(coalesce(col("version") + 1L, lit(1L)).as("version"),
          asOf.as("effective_from")) ++
        tracked.map(t => col(s"__new_$t").as(t)) ++
        Seq(lit(null).cast(dim.schema("effective_to").dataType).as("effective_to"),
          lit(1).as("is_current")): _*)
      .select(dim.columns.map(col): _*)
    closed.unionByName(untouched).unionByName(closedNow).unionByName(opened)
  }
}
