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
  * (patient visit lookup).
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
  private case class P(id: Long, dob: LocalDate, state: String)
  private case class V(id: Long, patientId: Long, providerId: Long, date: LocalDate,
      visitType: String, diagnosis: String, cost: JBD)

  private lazy val patients: Seq[P] = DataGenerator.patients(spark, 1000).collect().toSeq
    .map(r => P(r.getAs[Long]("patient_id"),
      r.getAs[java.sql.Date]("date_of_birth").toLocalDate, r.getAs[String]("state")))
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
