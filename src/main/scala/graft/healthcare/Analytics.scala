package graft.healthcare

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's serving-layer queries (SURVEY.md §2.M;
  * `queries/analytics_examples.sql`, `dashboard_kpis.sql`, `api.py`,
  * `query_builder.py`) as named, parameterized functions returning
  * DataFrames. Dims broadcast; the fact shuffles at most once per query.
  */
class Analytics(wh: Warehouse) {
  private val spark = wh.auditLog.sparkSession

  private def fact = spark.read.parquet(wh.factVisits)
  private def patients = spark.read.parquet(wh.dimPatients)
  private def providers = spark.read.parquet(wh.dimProviders)

  /** Q1 `analytics_examples.sql:6-17`: age groups kept even with zero
    * visits (left join + COUNT(col) semantics).
    */
  def avgVisitsPerAgeGroup: DataFrame =
    patients.join(fact.drop("patient_id", "provider_id"), Seq("patient_key"), "left_outer")
      .groupBy("age_group")
      .agg(countDistinct(col("patient_id")).as("patients"),
        count(col("visit_key")).as("total_visits"),
        round(count(col("visit_key")).cast("double")
          / countDistinct(col("patient_id")), 2).as("avg_visits_per_patient"))
      .orderBy("age_group")

  /** `analytics_examples.sql:20-30`. */
  def topDiagnoses(limit: Int = 10): DataFrame =
    fact.filter(col("diagnosis").isNotNull)
      .groupBy("diagnosis")
      .agg(count(lit(1)).as("visit_cnt"),
        round(sum(col("cost")).cast("double"), 2).as("total_cost"))
      .orderBy(col("visit_cnt").desc, col("diagnosis"))
      .limit(limit)

  /** `analytics_examples.sql:45-55`: monthly time series. */
  def monthlyTrend: DataFrame =
    fact.groupBy(date_trunc("month", col("visit_date")).as("month"))
      .agg(count(lit(1)).as("visits"),
        countDistinct(col("patient_key")).as("unique_patients"),
        round(sum(col("cost")).cast("double"), 2).as("revenue"))
      .orderBy("month")

  /** `analytics_examples.sql:83-85`: exact interpolated percentiles. */
  def costPercentiles: DataFrame =
    fact.join(broadcast(providers), Seq("provider_key"))
      .groupBy("specialty")
      .agg(round(expr("percentile(cast(cost as double), 0.5)"), 2).as("p50_cost"),
        round(expr("percentile(cast(cost as double), 0.9)"), 2).as("p90_cost"),
        count(lit(1)).as("visits"))
      .orderBy("specialty")

  /** `analytics_examples.sql:92-102`: visits above the global p90. */
  def highCostVisits(limit: Int = 20): DataFrame = {
    val p90 = fact.agg(expr("percentile(cast(cost as double), 0.9)").as("p90"))
    fact.crossJoin(broadcast(p90))
      .filter(col("cost") > col("p90"))
      .join(broadcast(patients.select("patient_key", "age_group")), Seq("patient_key"))
      .join(broadcast(providers.select("provider_key", "specialty")), Seq("provider_key"))
      .select("visit_id", "visit_date", "cost", "age_group", "specialty")
      .orderBy(col("cost").desc, col("visit_id"))
      .limit(limit)
  }

  /** `analytics_examples.sql:104-130`: frequency cohorts (D10). */
  def visitFrequencyCohorts: DataFrame =
    fact.groupBy("patient_key").agg(count(lit(1)).as("visits"))
      .withColumn("cohort",
        when(col("visits") === 1, "1 visit")
          .when(col("visits").between(2, 3), "2-3 visits")
          .when(col("visits").between(4, 5), "4-5 visits")
          .otherwise("6+ visits"))
      .groupBy("cohort").agg(count(lit(1)).as("patients"))
      .withColumn("pct", round(col("patients") * 100.0
        / sum(col("patients")).over(Window.partitionBy()), 2))
      .orderBy("cohort")

  /** `dashboard.py:155-166`-style specialty utilization. The fact side
    * drops its natural FK copies first — both sides carry provider_id,
    * and the bare reference was ambiguous (caught by the golden spec;
    * this function previously had no executing test).
    */
  def specialtyStats: DataFrame =
    providers.join(fact.drop("provider_id", "patient_id"), Seq("provider_key"), "left_outer")
      .groupBy("specialty")
      .agg(countDistinct(col("provider_id")).as("providers"),
        count(col("visit_key")).as("visits"),
        round(avg(col("cost")).cast("double"), 2).as("avg_cost"))
      .orderBy(col("visits").desc, col("specialty"))

  /** `analytics_examples.sql:70-79`: geographic distribution with
    * percent-of-total (E1).
    */
  def stateDistribution(limit: Int = 15): DataFrame =
    patients.groupBy("state")
      .agg(count(lit(1)).as("patients"))
      .withColumn("pct", round(col("patients") * 100.0
        / sum(col("patients")).over(Window.partitionBy()), 2))
      .orderBy(col("patients").desc, col("state"))
      .limit(limit)

  /** `analytics_examples.sql:167-199`: stacked data-quality metrics. */
  def dataQualityReport: DataFrame = {
    def metric(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("metric"), col("value").cast("double"))
    metric("total_visits", fact.agg(count(lit(1)).as("value")))
      .unionByName(metric("null_diagnosis",
        fact.agg(count(when(col("diagnosis").isNull, 1)).as("value"))))
      .unionByName(metric("distinct_patients",
        fact.agg(countDistinct(col("patient_key")).as("value"))))
      .unionByName(metric("future_visits",
        fact.agg(count(when(col("visit_date") > current_date(), 1)).as("value"))))
      .orderBy("metric")
  }

  /** `analytics_examples.sql:158-165`: DP noise magnitude check. */
  def noiseImpact: DataFrame =
    fact.agg(
      round(avg(col("cost")).cast("double"), 2).as("avg_cost"),
      round(avg(col("cost_with_privacy")).cast("double"), 2).as("avg_noised"),
      round(abs(avg(col("cost")) - avg(col("cost_with_privacy"))).cast("double"), 2)
        .as("abs_avg_diff"))

  /** `dashboard_kpis.sql:7-19` / `api.py:208-214`: KPI block. */
  def kpiBlock: DataFrame = {
    val p = patients.agg(count(lit(1)).as("total_patients"))
    val d = providers.agg(count(lit(1)).as("total_providers"))
    val f = fact.agg(count(lit(1)).as("total_visits"),
      round(sum(col("cost")).cast("double"), 2).as("total_revenue"),
      round(avg(col("cost")).cast("double"), 2).as("avg_cost"))
    p.crossJoin(d).crossJoin(f)
  }

  /** `query_builder.py:31-42` "Patient Summary": age×gender census over
    * the patient dim alone — no fact scan.
    */
  def patientSummary: DataFrame =
    patients.groupBy("age_group", "gender")
      .agg(count(lit(1)).as("patient_count"))
      .orderBy("age_group", "gender")

  /** `query_builder.py:88-106` "High Cost Visits": the parameterized
    * threshold variant of [[highCostVisits]] (that one derives its cut
    * from the global p90). visit_id rides along only to make the
    * cost-tie ordering total, then drops.
    */
  def visitsAboveCost(costThreshold: Double, limit: Int = 100): DataFrame =
    fact.drop("provider_id")
      .join(broadcast(patients.select("patient_key", "age_group")), Seq("patient_key"))
      .filter(col("cost") > costThreshold)
      .select("patient_id", "age_group", "visit_date", "diagnosis", "cost", "visit_id")
      .orderBy(col("cost").desc, col("visit_id"))
      .limit(limit)
      .drop("visit_id")

  /** `dashboard.py:172-184` visit-type distribution. */
  def visitTypeDistribution: DataFrame =
    fact.groupBy("visit_type")
      .agg(count(lit(1)).as("visit_cnt"))
      .orderBy(col("visit_cnt").desc, col("visit_type"))

  /** `dashboard.py:91-106` age-group analysis — the dashboard variant
    * of [[avgVisitsPerAgeGroup]] that also reports the DP-noised cost
    * average side by side with the raw one.
    */
  def ageGroupDetail: DataFrame =
    fact.drop("provider_id")
      .join(broadcast(patients.select("patient_key", "age_group")), Seq("patient_key"))
      .groupBy("age_group")
      .agg(count(lit(1)).as("visit_count"),
        countDistinct(col("patient_id")).as("unique_patients"),
        round(avg(col("cost")).cast("double"), 2).as("avg_cost"),
        round(avg(col("cost_with_privacy")).cast("double"), 2).as("avg_cost_privacy"))
      .orderBy(col("visit_count").desc, col("age_group"))

  /** `dashboard.py:79-88` summary stats — [[kpiBlock]] plus the noised
    * cost average (three 1-row aggregates cross-joined; D8).
    */
  def summaryStats: DataFrame = {
    val p = patients.agg(countDistinct(col("patient_id")).as("total_patients"))
    val d = providers.agg(countDistinct(col("provider_id")).as("total_providers"))
    val f = fact.agg(count(lit(1)).as("total_visits"),
      round(avg(col("cost")).cast("double"), 2).as("avg_cost"),
      round(avg(col("cost_with_privacy")).cast("double"), 2).as("avg_cost_privacy"))
    p.crossJoin(d).crossJoin(f)
  }

  /** `api.py:382-401` / `query_builder.py:120-133` "Anomalies
    * Detected": serving scan over the predictions table
    * ([[graft.healthcare.Schemas.mlPredictions]]) — most anomalous
    * first (iForest scores are more negative the more isolated).
    */
  def anomalies(predictions: DataFrame, limit: Int = 50): DataFrame =
    predictions.filter(col("is_anomaly") === 1)
      .orderBy(col("anomaly_score"), col("event_id"))
      .limit(limit)

  /** `api.py:333-380` per-entity prediction lookup: the api keys by
    * patient; our predictions key by event_id, so resolve the entity's
    * event ids first (broadcast semi-join — the per-user set is tiny)
    * and return newest-first.
    */
  def predictionsForUser(predictions: DataFrame, events: DataFrame, userId: Long): DataFrame =
    predictions.join(
        broadcast(events.filter(col("user_id") === userId).select("event_id")),
        Seq("event_id"), "left_semi")
      .orderBy(col("prediction_date").desc, col("event_id"))

  /** `privacy_dashboard.py:44-61` raw-pull sample feeding the privacy
    * dashboard's pandas-side checks. The reference's bare LIMIT is
    * row-order-nondeterministic; a total visit_id order makes the
    * sample reproducible without changing its shape.
    */
  def privacySample(limit: Int = 1000): DataFrame =
    fact.drop("provider_id")
      .join(broadcast(patients.select("patient_key", "age_group", "gender", "state")),
        Seq("patient_key"))
      .select("age_group", "gender", "state", "diagnosis", "visit_type", "cost", "visit_id")
      .orderBy("visit_id")
      .limit(limit)
      .drop("visit_id")

  /** `api.py:316-318`: point lookup, 3-way join (B6, C2). */
  def patientVisits(patientId: Long): DataFrame =
    fact.join(broadcast(patients.filter(col("patient_id") === patientId)), Seq("patient_key"))
      .join(broadcast(providers), Seq("provider_key"))
      .select("visit_id", "visit_date", "visit_type", "diagnosis", "specialty", "cost")
      .orderBy(col("visit_date").desc)

  /** Year-filtered scan — hits only the matching visit_year partition
    * directories (A8 partition pruning; asserted in the spec).
    */
  def visitsInYear(yr: Int): DataFrame =
    fact.filter(col("visit_year") === yr)

  /** The reference's `generate_analytics_report`
    * (`export_utils.py:66-126`): the same five sheets from the same
    * query surface, one multi-sheet xlsx via [[graft.export.Exporters
    * .excel]]. Report-sized results only — each sheet is an aggregate.
    */
  def exportReport(path: String): Unit =
    graft.export.Exporters.excel(Seq(
      "KPIs" -> kpiBlock,
      "Age_Groups" -> avgVisitsPerAgeGroup,
      "Top_Diagnoses" -> topDiagnoses(20),
      "Provider_Stats" -> specialtyStats,
      "Monthly_Trends" -> monthlyTrend,
    ), path)
}
