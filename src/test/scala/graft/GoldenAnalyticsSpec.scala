package graft

import java.math.{BigDecimal => JBD, RoundingMode}
import java.time.LocalDate

import org.apache.spark.sql.Row
import graft.healthcare.{Analytics, DataGenerator, Warehouse}

/** Golden-VALUE verification for the §2.M serving surface: every
  * assertion here pins the exact numbers a named `Analytics` function
  * must return on the seeded warehouse, computed INDEPENDENTLY — the
  * expected side is pure driver-side Scala over the collected raw
  * generator output (java.time ages, BigDecimal money, a from-scratch
  * interpolated percentile), sharing no Spark plan, no Transforms
  * code, and no warehouse ETL with the system under test. A regression
  * anywhere in staging → dims → fact → query now fails on values, not
  * shapes.
  *
  * Covers the reference query sites `analytics_examples.sql:6-17`
  * (avg visits/age group), `:20-30` (top diagnoses), `:45-55` (monthly
  * trend), `:70-79` (state distribution), `:83-85` (percentiles),
  * `:92-102` (high-cost visits), `:104-130` (frequency cohorts),
  * `:167-199` (data quality), `dashboard_kpis.sql:7-19` (KPI block),
  * `dashboard.py:155-166` (specialty stats), `api.py:316-318`
  * (patient visit lookup) — plus, closing the §2.M surface:
  * `query_builder.py:31-42` (patient summary), `:88-106`
  * (threshold-parameterized high-cost scan), `:120-133` +
  * `api.py:382-401` (anomaly serving), `api.py:333-380` (per-entity
  * predictions), `dashboard.py:79-88` (summary stats incl. DP-noised
  * avg — the noise independently re-derived here from plain Scala
  * math), `:91-106` (age-group detail), `:172-184` (visit types), and
  * `privacy_dashboard.py:44-61` (raw sample pull).
  */
class GoldenAnalyticsSpec extends SparkSpec {

  private val AsOf = LocalDate.of(2026, 2, 15)

  // ---- the warehouse under test (same seeded config as HealthcareSpec) ----
  private lazy val root = java.nio.file.Files.createTempDirectory("graft-golden").toString
  private lazy val wh = {
    val w = new Warehouse(spark, root)
    w.loadStaging(DataGenerator.patients(spark, 1000),
      DataGenerator.providers(spark, 20),
      DataGenerator.visits(spark, 1000, 20))
    w.build()
    w
  }
  private lazy val an = new Analytics(wh)

  // ---- independent driver-side model of the same generated data ----------
  private case class P(id: Long, dob: LocalDate, state: String, gender: String)
  private case class V(id: Long, patientId: Long, providerId: Long, date: LocalDate,
      visitType: String, diagnosis: String, cost: JBD)

  private lazy val patients: Seq[P] = DataGenerator.patients(spark, 1000).collect().toSeq
    .map(r => P(r.getAs[Long]("patient_id"),
      r.getAs[java.sql.Date]("date_of_birth").toLocalDate, r.getAs[String]("state"),
      r.getAs[String]("gender")))
  private lazy val providerSpecialty: Map[Long, String] =
    DataGenerator.providers(spark, 20).collect()
      .map(r => r.getAs[Long]("provider_id") -> r.getAs[String]("specialty")).toMap
  private lazy val visits: Seq[V] = DataGenerator.visits(spark, 1000, 20).collect().toSeq
    .map(r => V(r.getAs[Long]("visit_id"), r.getAs[Long]("patient_id"),
      r.getAs[Long]("provider_id"), r.getAs[java.sql.Date]("visit_date").toLocalDate,
      r.getAs[String]("visit_type"), r.getAs[String]("diagnosis"),
      r.getAs[java.math.BigDecimal]("cost")))

  /** Independent age bucketing: java.time.Period, not Transforms.age. */
  private def ageGroupOf(dob: LocalDate): String = {
    val age = java.time.Period.between(dob, AsOf).getYears
    if (age < 18) "Child (0-17)"
    else if (age < 35) "Young Adult (18-34)"
    else if (age < 50) "Adult (35-49)"
    else if (age < 65) "Middle-Aged (50-64)"
    else "Senior (65+)"
  }

  private lazy val groupOfPatient: Map[Long, String] =
    patients.map(p => p.id -> ageGroupOf(p.dob)).toMap

  /** Spark's double ROUND: java BigDecimal.valueOf + HALF_UP. */
  private def r2(d: Double): Double = JBD.valueOf(d).setScale(2, RoundingMode.HALF_UP).doubleValue

  private def sumCost(vs: Iterable[V]): JBD =
    vs.foldLeft(JBD.ZERO)((a, v) => a.add(v.cost))

  /** From-scratch interpolated percentile (the PERCENTILE_CONT rule:
    * rank p·(n−1), linear interpolation between floor and ceil).
    */
  private def pct(values: Seq[Double], p: Double): Double = {
    val s = values.sorted
    val rank = p * (s.length - 1)
    val lo = math.floor(rank).toInt
    val hi = math.ceil(rank).toInt
    if (lo == hi) s(lo) else s(lo) + (rank - lo) * (s(hi) - s(lo))
  }

  test("golden: avgVisitsPerAgeGroup (analytics_examples.sql:6-17)") {
    val patientsPerGroup = patients.groupBy(p => ageGroupOf(p.dob)).view.mapValues(_.size.toLong)
    val visitsPerGroup = visits.groupBy(v => groupOfPatient(v.patientId))
      .view.mapValues(_.size.toLong)
    val expected = patientsPerGroup.keys.toSeq.sorted.map { g =>
      val np = patientsPerGroup(g)
      val nv = visitsPerGroup.getOrElse(g, 0L)
      (g, np, nv, r2(nv.toDouble / np))
    }
    val got = an.avgVisitsPerAgeGroup.collect().toSeq.map(r =>
      (r.getAs[String]("age_group"), r.getAs[Long]("patients"),
        r.getAs[Long]("total_visits"), r.getAs[Double]("avg_visits_per_patient")))
    assert(got === expected)
  }

  test("golden: topDiagnoses (analytics_examples.sql:20-30)") {
    val expected = visits.groupBy(_.diagnosis).toSeq
      .map { case (d, vs) => (d, vs.size.toLong, sumCost(vs).doubleValue) }
      .sortBy { case (d, n, _) => (-n, d) }
      .take(10)
    val got = an.topDiagnoses(10).collect().toSeq.map(r =>
      (r.getAs[String]("diagnosis"), r.getAs[Long]("visit_cnt"), r.getAs[Double]("total_cost")))
    assert(got === expected)
  }

  test("golden: monthlyTrend (analytics_examples.sql:45-55)") {
    val expected = visits.groupBy(v => (v.date.getYear, v.date.getMonthValue)).toSeq
      .map { case ((y, m), vs) =>
        ((y, m), vs.size.toLong, vs.map(_.patientId).distinct.size.toLong,
          sumCost(vs).doubleValue)
      }
      .sortBy(_._1)
    val got = an.monthlyTrend.collect().toSeq.map { r =>
      val ts = r.getAs[java.sql.Timestamp]("month").toLocalDateTime
      ((ts.getYear, ts.getMonthValue), r.getAs[Long]("visits"),
        r.getAs[Long]("unique_patients"), r.getAs[Double]("revenue"))
    }
    assert(got === expected)
    // month boundaries are clean: truncation produced day-1 midnight only
    assert(an.monthlyTrend.collect().forall { r =>
      val t = r.getAs[java.sql.Timestamp]("month").toLocalDateTime
      t.getDayOfMonth == 1 && t.getHour == 0
    })
  }

  test("golden: costPercentiles per specialty (analytics_examples.sql:83-85)") {
    val bySpec = visits.groupBy(v => providerSpecialty(v.providerId))
    val expected = bySpec.keys.toSeq.sorted.map { s =>
      val costs = bySpec(s).map(_.cost.doubleValue)
      (s, r2(pct(costs, 0.5)), r2(pct(costs, 0.9)), costs.size.toLong)
    }
    val got = an.costPercentiles.collect().toSeq.map(r =>
      (r.getAs[String]("specialty"), r.getAs[Double]("p50_cost"),
        r.getAs[Double]("p90_cost"), r.getAs[Long]("visits")))
    assert(got === expected)
  }

  test("golden: highCostVisits above global p90 (analytics_examples.sql:92-102)") {
    val p90 = pct(visits.map(_.cost.doubleValue), 0.9)
    val expected = visits.filter(_.cost.doubleValue > p90)
      .sortBy(v => (v.cost.negate, v.id))
      .take(20)
      .map(v => (v.id, v.date, v.cost, groupOfPatient(v.patientId),
        providerSpecialty(v.providerId)))
    val got = an.highCostVisits(20).collect().toSeq.map(r =>
      (r.getAs[Long]("visit_id"), r.getAs[java.sql.Date]("visit_date").toLocalDate,
        r.getAs[java.math.BigDecimal]("cost").stripTrailingZeros,
        r.getAs[String]("age_group"), r.getAs[String]("specialty")))
    assert(got === expected.map { case (i, d, c, g, s) => (i, d, c.stripTrailingZeros, g, s) })
  }

  test("golden: visitFrequencyCohorts (analytics_examples.sql:104-130)") {
    val perPatient = visits.groupBy(_.patientId).view.mapValues(_.size)
    def cohort(n: Int) =
      if (n == 1) "1 visit" else if (n <= 3) "2-3 visits" else if (n <= 5) "4-5 visits"
      else "6+ visits"
    val byCohort = perPatient.values.groupBy(cohort).view.mapValues(_.size.toLong)
    val total = byCohort.values.sum
    val expected = byCohort.keys.toSeq.sorted.map(c =>
      (c, byCohort(c), r2(byCohort(c) * 100.0 / total)))
    val got = an.visitFrequencyCohorts.collect().toSeq.map(r =>
      (r.getAs[String]("cohort"), r.getAs[Long]("patients"), r.getAs[Double]("pct")))
    assert(got === expected)
  }

  test("golden: specialtyStats (dashboard.py:155-166)") {
    val provsBySpec = providerSpecialty.groupBy(_._2).view.mapValues(_.size.toLong)
    val visBySpec = visits.groupBy(v => providerSpecialty(v.providerId))
    val expected = provsBySpec.keys.toSeq.map { s =>
      val vs = visBySpec.getOrElse(s, Seq.empty)
      // Spark's avg over DECIMAL(10,2): decimal sum ÷ count at scale 6
      // (HALF_UP), then cast double, then round 2
      val avg =
        if (vs.isEmpty) null
        else r2(sumCost(vs).divide(JBD.valueOf(vs.size.toLong), 6, RoundingMode.HALF_UP)
          .doubleValue)
      (s, provsBySpec(s), vs.size.toLong, avg)
    }.sortBy { case (s, _, nv, _) => (-nv, s) }
    val got = an.specialtyStats.collect().toSeq.map(r =>
      (r.getAs[String]("specialty"), r.getAs[Long]("providers"),
        r.getAs[Long]("visits"), r.getAs[Any]("avg_cost")))
    assert(got === expected)
  }

  test("golden: stateDistribution (analytics_examples.sql:70-79)") {
    val byState = patients.groupBy(_.state).view.mapValues(_.size.toLong)
    val expected = byState.toSeq
      .map { case (s, n) => (s, n, r2(n * 100.0 / patients.size)) }
      .sortBy { case (s, n, _) => (-n, s) }
      .take(15)
    val got = an.stateDistribution(15).collect().toSeq.map(r =>
      (r.getAs[String]("state"), r.getAs[Long]("patients"), r.getAs[Double]("pct")))
    assert(got === expected)
  }

  test("golden: dataQualityReport (analytics_examples.sql:167-199)") {
    val expected = Seq(
      ("distinct_patients", visits.map(_.patientId).distinct.size.toDouble),
      ("future_visits", 0.0),
      ("null_diagnosis", visits.count(_.diagnosis == null).toDouble),
      ("total_visits", visits.size.toDouble))
    val got = an.dataQualityReport.collect().toSeq.map(r =>
      (r.getAs[String]("metric"), r.getAs[Double]("value")))
    assert(got === expected)
  }

  test("golden: kpiBlock (dashboard_kpis.sql:7-19, api.py:208-214)") {
    val r: Row = an.kpiBlock.head()
    assert(r.getAs[Long]("total_patients") === 1000L)
    assert(r.getAs[Long]("total_providers") === 20L)
    assert(r.getAs[Long]("total_visits") === visits.size.toLong)
    assert(r.getAs[Double]("total_revenue") === sumCost(visits).doubleValue)
    assert(r.getAs[Double]("avg_cost") ===
      r2(sumCost(visits).divide(JBD.valueOf(visits.size.toLong), 6, RoundingMode.HALF_UP)
        .doubleValue))
  }

  /** Independent re-derivation of the keyed Laplace mechanism the
    * warehouse applies to cost (`Warehouse.build` default salt 42):
    * plain Scala math, no Transforms code. Result is what
    * DECIMAL(10,2) stores.
    */
  private def noisedCost(visitId: Long, cost: JBD): JBD = {
    val p = 1000003L
    val h = (((visitId % p) * 2654435761L + 42L) % p + p) % p
    val u = (h.toDouble + 0.5) / 1000003.0 - 0.5
    val noised = math.max(0.0,
      cost.doubleValue + (-1.0 / 0.1) * math.signum(u) * math.log(1.0 - 2.0 * math.abs(u)))
    JBD.valueOf(r2(noised)).setScale(2, RoundingMode.HALF_UP)
  }

  /** Spark AVG over DECIMAL(10,2): decimal sum ÷ count at scale 6
    * HALF_UP → double → round 2.
    */
  private def avg2(sum: JBD, n: Long): Double =
    r2(sum.divide(JBD.valueOf(n), 6, RoundingMode.HALF_UP).doubleValue)

  test("golden: patientSummary census (query_builder.py:31-42)") {
    val expected = patients.groupBy(p => (ageGroupOf(p.dob), p.gender)).toSeq
      .map { case ((g, sex), ps) => (g, sex, ps.size.toLong) }
      .sortBy { case (g, sex, _) => (g, sex) }
    val got = an.patientSummary.collect().toSeq.map(r =>
      (r.getAs[String]("age_group"), r.getAs[String]("gender"), r.getAs[Long]("patient_count")))
    assert(got === expected)
    assert(got.map(_._3).sum === 1000L)
  }

  test("golden: visitsAboveCost threshold scan (query_builder.py:88-106)") {
    val threshold = 2000.0
    val expected = visits.filter(_.cost.doubleValue > threshold)
      .sortBy(v => (v.cost.negate, v.id))
      .take(100)
      .map(v => (v.patientId, groupOfPatient(v.patientId), v.date, v.diagnosis,
        v.cost.stripTrailingZeros))
    val got = an.visitsAboveCost(threshold, 100).collect().toSeq.map(r =>
      (r.getAs[Long]("patient_id"), r.getAs[String]("age_group"),
        r.getAs[java.sql.Date]("visit_date").toLocalDate, r.getAs[String]("diagnosis"),
        r.getAs[java.math.BigDecimal]("cost").stripTrailingZeros))
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("golden: visitTypeDistribution (dashboard.py:172-184)") {
    val expected = visits.groupBy(_.visitType).toSeq
      .map { case (t, vs) => (t, vs.size.toLong) }
      .sortBy { case (t, n) => (-n, t) }
    val got = an.visitTypeDistribution.collect().toSeq.map(r =>
      (r.getAs[String]("visit_type"), r.getAs[Long]("visit_cnt")))
    assert(got === expected)
  }

  test("golden: ageGroupDetail with DP-noised averages (dashboard.py:91-106)") {
    val byGroup = visits.groupBy(v => groupOfPatient(v.patientId))
    val expected = byGroup.toSeq.map { case (g, vs) =>
      val noisedSum = vs.foldLeft(JBD.ZERO)((a, v) => a.add(noisedCost(v.id, v.cost)))
      (g, vs.size.toLong, vs.map(_.patientId).distinct.size.toLong,
        avg2(sumCost(vs), vs.size), avg2(noisedSum, vs.size))
    }.sortBy { case (g, n, _, _, _) => (-n, g) }
    val got = an.ageGroupDetail.collect().toSeq.map(r =>
      (r.getAs[String]("age_group"), r.getAs[Long]("visit_count"),
        r.getAs[Long]("unique_patients"), r.getAs[Double]("avg_cost"),
        r.getAs[Double]("avg_cost_privacy")))
    assert(got === expected)
  }

  test("golden: summaryStats KPI row (dashboard.py:79-88)") {
    val r: Row = an.summaryStats.head()
    val noisedSum = visits.foldLeft(JBD.ZERO)((a, v) => a.add(noisedCost(v.id, v.cost)))
    assert(r.getAs[Long]("total_patients") === 1000L)
    assert(r.getAs[Long]("total_providers") === 20L)
    assert(r.getAs[Long]("total_visits") === visits.size.toLong)
    assert(r.getAs[Double]("avg_cost") === avg2(sumCost(visits), visits.size))
    assert(r.getAs[Double]("avg_cost_privacy") === avg2(noisedSum, visits.size))
  }

  test("golden: anomalies serving scan (api.py:382-401, query_builder.py:120-133)") {
    // The serving query is deterministic given the predictions table
    // (api.py reads whatever ml_pipeline wrote); pin it on a
    // hand-written table rather than retraining a forest here.
    import spark.implicits._
    val preds = Seq(
      (1L, 0.2, 100.0, 1, -0.61), (2L, 0.9, 250.0, 0, 0.12),
      (3L, 0.4, 900.0, 1, -0.80), (4L, 0.1, 120.0, 1, -0.61),
      (5L, 0.5, 300.0, 0, -0.95))
      .toDF("event_id", "readmission_risk", "predicted_cost", "is_anomaly", "anomaly_score")
      .withColumn("prediction_date", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("2026-01-0"),
          org.apache.spark.sql.functions.col("event_id").cast("string"))))
    val got = an.anomalies(preds, 2).collect().toSeq.map(_.getAs[Long]("event_id"))
    // anomalies only (2,5 excluded despite 5's lower score), most
    // negative first, event_id breaks the 1-vs-4 tie
    assert(got === Seq(3L, 1L))
    val all = an.anomalies(preds, 50).collect().toSeq.map(_.getAs[Long]("event_id"))
    assert(all === Seq(3L, 1L, 4L))
  }

  test("golden: predictionsForUser lookup (api.py:333-380)") {
    import spark.implicits._
    val events = Seq((10L, 7L), (11L, 7L), (12L, 8L))
      .toDF("event_id", "user_id")
    val preds = Seq((10L, "2026-01-01 00:00:00"), (11L, "2026-01-03 00:00:00"),
      (12L, "2026-01-02 00:00:00"))
      .toDF("event_id", "ts")
      .withColumn("prediction_date",
        org.apache.spark.sql.functions.to_timestamp(
          org.apache.spark.sql.functions.col("ts"))).drop("ts")
    val got = an.predictionsForUser(preds, events, 7L).collect().toSeq
      .map(_.getAs[Long]("event_id"))
    assert(got === Seq(11L, 10L)) // user 7 only, newest first
  }

  test("golden: privacySample raw pull (privacy_dashboard.py:44-61)") {
    val byId = visits.sortBy(_.id).take(50)
    val genderOf = patients.map(p => p.id -> p.gender).toMap
    val stateOf = patients.map(p => p.id -> p.state).toMap
    val expected = byId.map(v => (groupOfPatient(v.patientId), genderOf(v.patientId),
      stateOf(v.patientId), v.diagnosis, v.visitType, v.cost.stripTrailingZeros))
    val got = an.privacySample(50).collect().toSeq.map(r =>
      (r.getAs[String]("age_group"), r.getAs[String]("gender"), r.getAs[String]("state"),
        r.getAs[String]("diagnosis"), r.getAs[String]("visit_type"),
        r.getAs[java.math.BigDecimal]("cost").stripTrailingZeros))
    assert(got === expected)
  }

  test("golden: patientVisits point lookup (api.py:316-318)") {
    val pid = 17L
    val expected = visits.filter(_.patientId == pid)
      .map(v => (v.id, v.date, v.visitType, v.diagnosis,
        providerSpecialty(v.providerId), v.cost.stripTrailingZeros))
      .toSet
    val got = an.patientVisits(pid).collect().toSeq.map(r =>
      (r.getAs[Long]("visit_id"), r.getAs[java.sql.Date]("visit_date").toLocalDate,
        r.getAs[String]("visit_type"), r.getAs[String]("diagnosis"),
        r.getAs[String]("specialty"), r.getAs[java.math.BigDecimal]("cost").stripTrailingZeros))
    assert(got.toSet === expected)
    assert(got.nonEmpty)
    // result is date-descending as the reference's endpoint returns it
    assert(got.map(_._2).sliding(2).forall {
      case Seq(a, b) => !a.isBefore(b)
      case _ => true
    })
  }
}
