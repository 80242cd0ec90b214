package graft

import org.apache.spark.sql.functions._
import graft.healthcare.{Analytics, DataGenerator, Warehouse}

/** End-to-end warehouse lifecycle (SURVEY.md §3): generate → ETL →
  * staging → dims/fact → analytics, with incremental-build and
  * partition-layout assertions.
  */
class HealthcareSpec extends SparkSpec {

  private lazy val root = java.nio.file.Files.createTempDirectory("graft-wh").toString
  private lazy val wh = {
    val w = new Warehouse(spark, root)
    val patients = DataGenerator.patients(spark, 1000)
    val providers = DataGenerator.providers(spark, 20)
    val visits = DataGenerator.visits(spark, 1000, 20)
    w.loadStaging(patients, providers, visits)
    w.build()
    w
  }
  private lazy val an = new Analytics(wh)

  test("CSV round-trip preserves the generated visits (A1/A2)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val visits = DataGenerator.visits(spark, 200, 10)
    DataGenerator.writeCsv(visits, s"$dir/visits")
    val back = DataGenerator.readCsv(spark, s"$dir/visits", graft.healthcare.Schemas.rawVisits)
    assert(back.count() === visits.count())
    assert(back.agg(sum("cost")).head().getDecimal(0) ===
      visits.agg(sum("cost")).head().getDecimal(0))
  }

  test("generator is deterministic and respects domains") {
    val v1 = DataGenerator.visits(spark, 100, 10).agg(sum("visit_id")).head().getLong(0)
    val v2 = DataGenerator.visits(spark, 100, 10).agg(sum("visit_id")).head().getLong(0)
    assert(v1 === v2)
    val costs = DataGenerator.visits(spark, 100, 10)
      .agg(min("cost").cast("double"), max("cost").cast("double")).head()
    assert(costs.getDouble(0) >= 100.0 && costs.getDouble(1) <= 5000.0)
  }

  test("warehouse builds dims and fact with resolved keys") {
    val dimP = spark.read.parquet(wh.dimPatients)
    val factV = spark.read.parquet(wh.factVisits)
    assert(dimP.count() === 1000)
    assert(factV.count() > 1000) // 1–5 visits per patient
    // every fact row resolves to a dim row
    assert(factV.join(dimP, Seq("patient_key"), "left_anti").count() === 0)
    // surrogate keys are unique
    assert(factV.select("visit_key").distinct().count() === factV.count())
  }

  test("fact table is laid out in visit_year partition directories") {
    val dirs = new java.io.File(wh.factVisits).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("visit_year=")).sorted
    assert(dirs.toSeq === Seq("visit_year=2023", "visit_year=2024", "visit_year=2025", "visit_year=2026"))
    // a year filter becomes a partition filter at the scan (pruning),
    // not a row-level data filter: visit_year must appear INSIDE the
    // PartitionFilters list
    val plan = an.visitsInYear(2024).queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(plan).map(_.group(1))
    assert(pf.exists(_.contains("visit_year")), s"PartitionFilters=$pf")
  }

  test("incremental rebuild is a no-op on identical input") {
    val before = spark.read.parquet(wh.factVisits).count()
    wh.build()
    assert(spark.read.parquet(wh.factVisits).count() === before)
    assert(spark.read.parquet(wh.dimPatients).count() === 1000)
  }

  /** relative file path → (length, mtime) for every file under root */
  private def snapshot(root: String): Map[String, (Long, Long)] = {
    val base = java.nio.file.Paths.get(root)
    val out = scala.collection.mutable.Map.empty[String, (Long, Long)]
    java.nio.file.Files.walk(base).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)) {
        val f = p.toFile
        out(base.relativize(p).toString) = (f.length, f.lastModified)
      }
    }
    out.toMap
  }

  test("incremental fact load appends without rewriting prior partitions") {
    val root2 = java.nio.file.Files.createTempDirectory("graft-wh-inc").toString
    val w = new Warehouse(spark, root2)
    val patients = DataGenerator.patients(spark, 200)
    val providers = DataGenerator.providers(spark, 10)
    val visits = DataGenerator.visits(spark, 200, 10)
    w.loadStaging(patients, providers, visits)
    w.build()
    val before = snapshot(w.factVisits)
    val factBefore = spark.read.parquet(w.factVisits).count()
    // second load: one brand-new 2026 visit on top of the same input
    val extra = visits.limit(1)
      .withColumn("visit_id", lit(999999L))
      .withColumn("visit_date", lit("2026-02-10").cast("date"))
    w.loadStaging(patients, providers, visits.unionByName(extra))
    w.build()
    val after = snapshot(w.factVisits)
    assert(spark.read.parquet(w.factVisits).count() === factBefore + 1)
    // every pre-existing file in an untouched year partition is
    // byte-identical (same length + mtime): the merge never rewrote it
    val prior = before.keySet.filter(p =>
      Seq("visit_year=2023", "visit_year=2024", "visit_year=2025").exists(p.startsWith))
    assert(prior.nonEmpty)
    prior.foreach { p => assert(after.get(p) === before.get(p), s"rewritten: $p") }
  }

  test("noise column clamps at zero and moves the mean only slightly") {
    val r = an.noiseImpact.head()
    assert(spark.read.parquet(wh.factVisits)
      .filter(col("cost_with_privacy") < 0).count() === 0)
    // ε=0.1 Laplace has scale 10 → averages over thousands of rows stay close
    assert(r.getDouble(2) < 5.0)
  }

  test("zero-visit age groups survive the left join with 0 counts") {
    val df = an.avgVisitsPerAgeGroup
    assert(df.count() >= 4) // buckets present
    assert(df.filter(col("avg_visits_per_patient").isNull).count() === 0)
  }

  test("analytics queries return sane shapes") {
    assert(an.topDiagnoses(5).count() === 5)
    assert(an.monthlyTrend.count() > 30)
    assert(an.costPercentiles.count() > 5)
    assert(an.visitFrequencyCohorts.count() >= 3)
    assert(an.kpiBlock.head().getAs[Long]("total_patients") === 1000)
    assert(an.dataQualityReport.filter(col("metric") === "future_visits")
      .head().getAs[Double]("value") === 0.0)
    val pv = an.patientVisits(17)
    assert(pv.count() >= 1 && pv.count() <= 5)
  }

  test("exportReport writes the reference's five-sheet xlsx") {
    val p = java.nio.file.Files.createTempFile("graft-report", ".xlsx").toString
    an.exportReport(p)
    val zf = new java.util.zip.ZipFile(p)
    try {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setNamespaceAware(true)
      val wb = f.newDocumentBuilder().parse(
        zf.getInputStream(zf.getEntry("xl/workbook.xml")))
      val sheets = wb.getElementsByTagNameNS("*", "sheet")
      val names = (0 until sheets.getLength)
        .map(sheets.item(_).getAttributes.getNamedItem("name").getNodeValue)
      assert(names === Seq("KPIs", "Age_Groups", "Top_Diagnoses",
        "Provider_Stats", "Monthly_Trends"))
      // the KPI sheet carries the same total the DataFrame reports
      val s1 = f.newDocumentBuilder().parse(
        zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")))
      val vs = s1.getElementsByTagNameNS("*", "v")
      val vals = (0 until vs.getLength).map(vs.item(_).getTextContent)
      assert(vals.contains("1000")) // total_patients
    } finally zf.close()
  }

  test("audited reads append READ rows to the audit log") {
    val before = wh.auditLog.filter(col("action_type") === "READ").count()
    wh.factVisitsAudited("analyst")
    val after = wh.auditLog.filter(col("action_type") === "READ").count()
    assert(after === before + 1)
    assert(wh.auditLog.filter(col("action_type") === "LOAD").count() >= 4)
  }
}
