package graft.warehouse

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only audit log + audited reads (SURVEY.md §2 A11;
  * `init.sql:115-124,170-192`).
  *
  * The reference's plpgsql read functions log a READ row and return the
  * table; we keep the side-effect (one appended audit row) but NOT the
  * reference's pushdown barrier — the returned DataFrame is the plain
  * table scan, so Catalyst still prunes and pushes filters.
  */
object Audit {
  val LOAD = "LOAD"
  val READ = "READ"

  private def auditRow(spark: SparkSession, action: String, table: String,
      user: String, details: String): DataFrame = {
    import spark.implicits._
    Seq((action, table, user, details))
      .toDF("action_type", "table_name", "user_name", "details")
      .withColumn("action_timestamp", current_timestamp())
  }

  def log(spark: SparkSession, auditPath: String, action: String, table: String,
      user: String, details: String = ""): Unit =
    auditRow(spark, action, table, user, details)
      .write.mode(SaveMode.Append).parquet(auditPath)

  /** Log a READ then return the table — audit side-effect without
    * breaking predicate pushdown on the returned scan.
    */
  def auditedRead(spark: SparkSession, auditPath: String, tablePath: String,
      user: String): DataFrame = {
    log(spark, auditPath, READ, tablePath, user)
    spark.read.parquet(tablePath)
  }

  def auditLog(spark: SparkSession, auditPath: String): DataFrame =
    spark.read.parquet(auditPath)
}
