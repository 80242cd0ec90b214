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

  // Oracle SQL authored WHILE the query runs, from artifacts the run
  // itself trained (k-means centroids, PQ codebooks) embedded as SQL
  // literals — the q78 plane pattern extended to data-trained
  // constants. Registration happens when the query executes; Verify
  // dumps oracleSql AFTER running every query, so the dump always sees
  // the entry for anything that ran. Training stays spec-gated (its
  // values are taken as given); what DuckDB independently replays is
  // the whole SERVING computation — assignment, probe pruning, ADC
  // scoring, exact re-rank — against those literals.
  private val dynamicSql =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def dynamicOracle(name: String)(
      fn: (SparkSession, String) => (DataFrame, String)): Q =
    Q(name, (s, dir) => {
      val (df, sql) = fn(s, dir)
      dynamicSql.put(name, sql)
      df
    }, None)

  /** Run-time-authored oracle entries registered so far (queries that
    * executed in this JVM). Merged into SparkEntry.oracleSql.
    */
  def registeredDynamic: Map[String, String] = {
    import scala.jdk.CollectionConverters._
    dynamicSql.asScala.toMap
  }
}
