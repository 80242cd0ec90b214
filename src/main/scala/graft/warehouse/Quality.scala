package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
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

  /** A foreign-key constraint: every non-null `fkCol` value in the
    * child table must exist in `parentCol` of `parent` (dbt's
    * `relationships` generic test).
    */
  final case class Relationship(
      fkCol: String, parent: DataFrame, parentTable: String, parentCol: String)

  /** One table's declarative constraint suite — the four dbt generic
    * tests (unique / not_null / accepted_values / relationships) as
    * data. `unique` entries are composite keys (a one-element Seq is a
    * plain column test); `acceptedValues` compares string renderings so
    * one vocabulary covers every column type.
    */
  final case class TableChecks(
      table: String,
      df: DataFrame,
      unique: Seq[Seq[String]] = Nil,
      notNull: Seq[String] = Nil,
      acceptedValues: Seq[(String, Seq[String])] = Nil,
      relationships: Seq[Relationship] = Nil)

  /** Run a declarative constraint suite (the dbt `schema.yml` generic
    * tests the reference *configures* — dbt_project.yml sets
    * `test-paths` and README/airflow invoke `dbt test` — re-expressed
    * as a constraint API): one audit row per constraint with its
    * violation count and pass flag.
    *
    * Violation semantics match dbt's generated SQL:
    *  - unique: surplus rows beyond the first per duplicated key;
    *    rows with any NULL key column are exempt (dbt filters them).
    *  - not_null: rows where the column IS NULL.
    *  - accepted_values: non-null rows whose string rendering is
    *    outside the allowed list.
    *  - relationships: non-null FK rows with no parent match.
    *
    * Scale shape: the three scan-local test kinds fold into ONE
    * conditional aggregate per table (uniqueness rides Catalyst's
    * Expand for the distinct counts, exactly like [[profile]]); each
    * relationship is ONE keyed LEFT ANTI join against the parent's
    * distinct keys (broadcast when the dimension fits, AQE-shuffled
    * when it doesn't — deliberately unhinted), reduced to a scalar
    * before the union, so the audit output is bytes regardless of
    * fact-table scale. Nothing here collects, and constructing the
    * report launches no jobs.
    */
  def checks(suite: Seq[TableChecks]): DataFrame = {
    val perTable = suite.flatMap { tc =>
      // (check_type, target, violation-count aggregate) — one agg pass
      val scanLocal: Seq[(String, String, Column)] =
        tc.unique.map { keys =>
          val nonNull = keys.map(col(_).isNotNull).reduce(_ && _)
          val keyStruct = when(nonNull, struct(keys.map(col): _*))
          ("unique", keys.mkString(","),
            count(when(nonNull, lit(1))) - countDistinct(keyStruct))
        } ++
        tc.notNull.map { c =>
          ("not_null", c, count(lit(1)) - count(col(c)))
        } ++
        tc.acceptedValues.map { case (c, vals) =>
          ("accepted_values", c,
            coalesce(sum(when(col(c).isNotNull &&
              !col(c).cast("string").isin(vals: _*), 1L).otherwise(0L)), lit(0L)))
        }
      val aggRows =
        if (scanLocal.isEmpty) Nil
        else {
          val aggs = scanLocal.zipWithIndex.map { case ((_, _, c), i) =>
            c.cast("long").as(s"__v_$i")
          }
          val wide = tc.df.agg(aggs.head, aggs.tail: _*)
          val rows = scanLocal.zipWithIndex.map { case ((kind, target, _), i) =>
            struct(lit(tc.table).as("table_name"), lit(kind).as("check_type"),
              lit(target).as("target"), col(s"__v_$i").as("n_violations"))
          }
          Seq(wide.select(explode(array(rows: _*)).as("r")).select("r.*"))
        }
      val relRows = tc.relationships.map { r =>
        val parentKeys = r.parent.select(col(r.parentCol).as("__pk")).distinct()
        tc.df.filter(col(r.fkCol).isNotNull)
          .join(parentKeys, col(r.fkCol) === col("__pk"), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .select(lit(tc.table).as("table_name"),
            lit("relationships").as("check_type"),
            lit(s"${r.fkCol}->${r.parentTable}.${r.parentCol}").as("target"),
            col("n_violations"))
      }
      aggRows ++ relRows
    }
    require(perTable.nonEmpty, "Quality.checks: empty constraint suite")
    perTable.reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0)
      .orderBy("table_name", "check_type", "target")
  }
}
