package graft.healthcare

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic healthcare data (SURVEY.md §2 A12; reference
  * `scripts/generate_data.py:17-133`): patients, providers, visits with
  * the reference's domains — no Faker, pure `spark.range` + seeded
  * `rand` + lookup arrays, so generation is distributed and
  * reproducible at any scale.
  */
object DataGenerator {

  val Specialties: Seq[String] = Seq("Cardiology", "Dermatology", "Emergency Medicine",
    "Family Medicine", "Internal Medicine", "Neurology", "Obstetrics", "Oncology",
    "Orthopedics", "Pediatrics", "Psychiatry", "Radiology", "Surgery")

  val Diagnoses: Seq[String] = Seq("Hypertension", "Type 2 Diabetes",
    "Upper Respiratory Infection", "Anxiety Disorder", "Depression", "Back Pain",
    "Arthritis", "Migraine", "Asthma", "COPD", "Hyperlipidemia",
    "Coronary Artery Disease", "Gastroesophageal Reflux", "Urinary Tract Infection",
    "Pneumonia", "Allergic Rhinitis", "Osteoporosis", "Hypothyroidism")

  val Procedures: Seq[String] = Seq("Physical Examination", "Blood Test", "X-Ray",
    "CT Scan", "MRI", "Ultrasound", "ECG", "Vaccination", "Minor Surgery",
    "Consultation", "Prescription Refill", "Physical Therapy", "Endoscopy", "Biopsy")

  val VisitTypes: Seq[String] = Seq("Routine Checkup", "Follow-up", "Emergency",
    "Consultation", "Surgery")

  val Genders: Seq[String] = Seq("Male", "Female", "Other")
  val States: Seq[String] = Seq("CA", "TX", "NY", "FL", "IL", "PA", "OH", "GA", "NC", "MI")

  private def pick(options: Seq[String], u: org.apache.spark.sql.Column) =
    element_at(array(options.map(lit): _*), (u * options.size).cast("int") + 1)

  /** 10k patients in the reference config; ages 1–90 at generation. */
  def patients(spark: SparkSession, n: Long = 10000L, seed: Long = 42L): DataFrame =
    spark.range(1, n + 1).toDF("patient_id")
      .withColumn("patient_name", concat(lit("Patient_"), col("patient_id")))
      .withColumn("date_of_birth",
        date_sub(lit("2026-02-15").cast("date"),
          (rand(seed) * 365.25 * 89 + 365).cast("int")))
      .withColumn("gender", pick(Genders, rand(seed + 1)))
      .withColumn("city", concat(lit("City_"), (rand(seed + 2) * 200).cast("int")))
      .withColumn("state", pick(States, rand(seed + 3)))
      .withColumn("zip_code", lpad(((rand(seed + 4) * 89999).cast("int") + 10000).cast("string"), 5, "0"))

  def providers(spark: SparkSession, n: Long = 50L, seed: Long = 42L): DataFrame =
    spark.range(1, n + 1).toDF("provider_id")
      .withColumn("provider_name", concat(lit("Dr. Provider_"), col("provider_id")))
      .withColumn("specialty", pick(Specialties, rand(seed + 10)))

  /** 1–5 visits per patient, dates 2023-01-01 → 2026-02-15, cost
    * U(100, 5000) at 2 dp (`generate_data.py:99-127`).
    */
  def visits(spark: SparkSession, nPatients: Long = 10000L, nProviders: Long = 50L,
      seed: Long = 42L): DataFrame = {
    val perPatient = spark.range(1, nPatients + 1).toDF("patient_id")
      .withColumn("n_visits", (rand(seed + 20) * 5).cast("int") + 1)
    val spanDays = 1141 // 2023-01-01 .. 2026-02-15
    perPatient
      .select(col("patient_id"), explode(sequence(lit(1), col("n_visits"))).as("visit_seq"))
      // deterministic, unique, and window-free (scales): patient carries ≤ 5 visits
      .withColumn("visit_id", col("patient_id") * 8 + col("visit_seq"))
      .withColumn("provider_id", (rand(seed + 21) * nProviders).cast("long") + 1)
      .withColumn("visit_date",
        date_add(lit("2023-01-01").cast("date"), (rand(seed + 22) * spanDays).cast("int")))
      .withColumn("visit_type", pick(VisitTypes, rand(seed + 23)))
      .withColumn("diagnosis", pick(Diagnoses, rand(seed + 24)))
      .withColumn("procedure_performed", pick(Procedures, rand(seed + 25)))
      .withColumn("cost", round(rand(seed + 26) * 4900 + 100, 2).cast("decimal(10,2)"))
      .drop("visit_seq")
  }

  /** CSV round-trip (A1/A2): the reference generates CSVs that ETL
    * re-reads with explicit schemas (never inference).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)
}
