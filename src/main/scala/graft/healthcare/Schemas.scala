package graft.healthcare

import org.apache.spark.sql.types._

/** Declared schemas for every warehouse table (SURVEY.md §1.2; DDL at
  * reference `init.sql:8-124`, `ml_pipeline.py:331-343`). CSV ingest
  * always reads with these — schema-on-write, never inference
  * (the reference's pandas re-inference at `scripts/etl.py:98` is a
  * deliberate non-goal).
  */
object Schemas {

  val rawPatients: StructType = StructType(Seq(
    StructField("patient_id", LongType, nullable = false),
    StructField("patient_name", StringType),
    StructField("date_of_birth", DateType),
    StructField("gender", StringType),
    StructField("city", StringType),
    StructField("state", StringType),
    StructField("zip_code", StringType),
  ))

  val rawProviders: StructType = StructType(Seq(
    StructField("provider_id", LongType, nullable = false),
    StructField("provider_name", StringType),
    StructField("specialty", StringType),
  ))

  val rawVisits: StructType = StructType(Seq(
    StructField("patient_id", LongType, nullable = false),
    StructField("visit_id", LongType, nullable = false),
    StructField("provider_id", LongType),
    StructField("visit_date", DateType),
    StructField("visit_type", StringType),
    StructField("diagnosis", StringType),
    StructField("procedure_performed", StringType),
    StructField("cost", DecimalType(10, 2)),
  ))

  /** `init.sql:115-124` audit log shape (Audit module writes this). */
  val auditLog: StructType = StructType(Seq(
    StructField("action_type", StringType, nullable = false),
    StructField("table_name", StringType, nullable = false),
    StructField("user_name", StringType),
    StructField("details", StringType),
    StructField("action_timestamp", TimestampType),
  ))

  /** `ml_pipeline.py:331-343` predictions table shape. */
  val mlPredictions: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("readmission_risk", DoubleType),
    StructField("predicted_cost", DoubleType),
    StructField("is_anomaly", IntegerType),
    StructField("anomaly_score", DoubleType),
    StructField("prediction_date", TimestampType),
  ))

  case class Patient(patient_id: Long, patient_name: String, date_of_birth: java.sql.Date,
      gender: String, city: String, state: String, zip_code: String)
  case class Provider(provider_id: Long, provider_name: String, specialty: String)
  case class Visit(patient_id: Long, visit_id: Long, provider_id: Long,
      visit_date: java.sql.Date, visit_type: String, diagnosis: String,
      procedure_performed: String, cost: java.math.BigDecimal)
}
