package graft.healthcare

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Transforms
import graft.warehouse.{Audit, Keys, Merge}

/** The reference's warehouse build DAG (SURVEY.md §3.2) re-expressed as
  * Spark jobs: CSV/raw → staging (transforms + validity filters) →
  * dims (incremental anti-join + surrogate keys) → fact (FK-resolution
  * joins, Laplace-noised cost, partitioned write on visit_year).
  *
  * Physical layout mirrors `init.sql:83-109`: the fact table is written
  * `partitionBy("visit_year")`, so date filters prune partitions the
  * way Postgres range partitions did — but Catalyst also gets parquet
  * min/max pruning inside each partition for free.
  */
class Warehouse(spark: SparkSession, root: String, user: String = "etl_user") {
  val stagingPatients = s"$root/staging_patients"
  val stagingProviders = s"$root/staging_providers"
  val stagingVisits = s"$root/staging_visits"
  val dimPatients = s"$root/dim_patients"
  val dimProviders = s"$root/dim_providers"
  val factVisits = s"$root/fact_visits"
  val auditPath = s"$root/audit_log"

  // same filesystem API as the writes in Merge — a java.io.File probe
  // would silently report "missing" on any non-local fs and restart
  // surrogate keys from scratch
  private def exists(p: String) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(p), spark.sparkContext.hadoopConfiguration)
    fs.exists(new org.apache.hadoop.fs.Path(p))
  }

  /** §3.1 ETL: set-oriented staging load (the reference's per-row
    * INSERT loop becomes one vectorized write), with H1–H3/B7
    * transforms and a LOAD audit row per table.
    */
  def loadStaging(patients: DataFrame, providers: DataFrame, visits: DataFrame,
      asOf: String = "2026-02-15"): Unit = {
    patients
      .withColumn("anonymized_name", Transforms.anonymize(col("patient_name")))
      .withColumn("age", Transforms.age(col("date_of_birth"), lit(asOf).cast("date")))
      .withColumn("age_group", Transforms.ageGroup(col("age")))
      .withColumn("valid_record", Transforms.validRecord(Seq(col("patient_id"), col("patient_name"))))
      .withColumn("created_at", current_timestamp())
      .drop("patient_name")
      .write.mode(SaveMode.Overwrite).parquet(stagingPatients)
    Audit.log(spark, auditPath, Audit.LOAD, "staging_patients", user)

    providers
      .withColumn("valid_record", Transforms.validRecord(Seq(col("provider_id"), col("provider_name"))))
      .withColumn("created_at", current_timestamp())
      .write.mode(SaveMode.Overwrite).parquet(stagingProviders)
    Audit.log(spark, auditPath, Audit.LOAD, "staging_providers", user)

    visits
      .withColumn("valid_record", Transforms.validRecord(
        Seq(col("visit_id"), col("patient_id"), col("provider_id"), col("visit_date"))))
      .withColumn("created_at", current_timestamp())
      .write.mode(SaveMode.Overwrite).parquet(stagingVisits)
    Audit.log(spark, auditPath, Audit.LOAD, "staging_visits", user)
  }

  /** Staging views (dbt `stg_*`): validity + not-null + no-future-dates
    * filters (`stg_visits.sql:18-23`). Lazy DataFrames = views.
    */
  def stgPatients: DataFrame = spark.read.parquet(stagingPatients)
    .filter(col("valid_record") && col("patient_id").isNotNull)
  def stgProviders: DataFrame = spark.read.parquet(stagingProviders)
    .filter(col("valid_record") && col("provider_id").isNotNull)
  def stgVisits(today: String = "2026-02-15"): DataFrame = spark.read.parquet(stagingVisits)
    .filter(col("valid_record") && col("visit_id").isNotNull
      && col("visit_date") <= lit(today).cast("date"))

  /** Incremental dim build (`dim_patients.sql:20-47`): anti-join new
    * naturals, assign contiguous surrogate keys above the current max.
    * Existing rows are immutable here (type-1 inserts only), so the
    * incremental load APPENDS just the new keyed rows — O(new), never a
    * rewrite of the table, and prior files stay byte-identical.
    */
  private def buildDim(staged: DataFrame, path: String, naturalKey: String,
      keyName: String): Unit = {
    val (existing, maxKey) =
      if (exists(path)) {
        val e = spark.read.parquet(path)
        (e, e.agg(coalesce(max(col(keyName)), lit(0L))).head().getLong(0))
      } else (null: DataFrame, 0L)
    val fresh =
      if (existing == null) staged
      else staged.join(existing.select(naturalKey), Seq(naturalKey), "left_anti")
    val keyed = Keys.addSurrogate(fresh, keyName, Seq(col(naturalKey)), start = maxKey)
      .withColumn("valid_from", current_timestamp())
      .withColumn("is_current", lit(true))
    if (existing == null) Merge.rewriteTable(spark, keyed, path)
    else keyed.write.mode(SaveMode.Append).parquet(path)
  }

  /** Fact build (`fact_visits.sql`): anti-join new visits, resolve FKs
    * through the dims (C6), apply seeded Laplace noise to cost (H4,
    * ε=0.1), partition by visit_year (A8).
    */
  def build(noiseSeed: Long = 42L): Unit = {
    buildDim(stgPatients, dimPatients, "patient_id", "patient_key")
    buildDim(stgProviders, dimProviders, "provider_id", "provider_key")

    val pKeys = spark.read.parquet(dimPatients).select("patient_id", "patient_key")
    val rKeys = spark.read.parquet(dimProviders).select("provider_id", "provider_key")
    val staged = stgVisits()
    val newVisits =
      if (exists(factVisits))
        staged.join(spark.read.parquet(factVisits).select("visit_id"), Seq("visit_id"), "left_anti")
      else staged
    val maxKey =
      if (exists(factVisits))
        spark.read.parquet(factVisits).agg(coalesce(max(col("visit_key")), lit(0L))).head().getLong(0)
      else 0L

    val resolved = newVisits
      .join(broadcast(pKeys), Seq("patient_id"))
      .join(broadcast(rKeys), Seq("provider_id"))
      .withColumn("cost_with_privacy",
        round(Transforms.laplaceNoisedKeyed(col("cost"), col("visit_id"), 0.1, noiseSeed), 2)
          .cast("decimal(10,2)"))
      .withColumn("visit_year", year(col("visit_date")))
    val keyed = Keys.addSurrogate(resolved, "visit_key", Seq(col("visit_id")), start = maxKey)

    // facts are insert-only after the anti-join, so incremental loads
    // append into the visit_year layout: only partitions receiving new
    // rows gain files, all other partition dirs are untouched
    if (exists(factVisits))
      keyed.write.mode(SaveMode.Append).partitionBy("visit_year").parquet(factVisits)
    else
      Merge.rewriteTable(spark, keyed, factVisits, partitionBy = Seq("visit_year"))
    Audit.log(spark, auditPath, Audit.LOAD, "fact_visits", user)
  }

  /** A11: audited reads — append READ row, return the plain scan. */
  def factVisitsAudited(reader: String = user): DataFrame =
    Audit.auditedRead(spark, auditPath, factVisits, reader)
  def dimPatientsAudited(reader: String = user): DataFrame =
    Audit.auditedRead(spark, auditPath, dimPatients, reader)
  def dimProvidersAudited(reader: String = user): DataFrame =
    Audit.auditedRead(spark, auditPath, dimProviders, reader)

  def auditLog: DataFrame = spark.read.parquet(auditPath)
}
