package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a Spark query plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle SQL.
  * Queries with no oracle get the driver's weaker rows-only check.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

object Q {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
