package graft

import org.apache.spark.sql.functions._
import graft.export.Exporters

class ExportCacheSpec extends SparkSpec {
  import spark.implicits._

  test("csv export round-trips with header") {
    val dir = java.nio.file.Files.createTempDirectory("graft-exp").toString
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Exporters.csv(df, s"$dir/out", single = true)
    val back = spark.read.option("header", "true").csv(s"$dir/out")
    assert(back.count() === 2 && back.columns.toSeq === Seq("id", "v"))
  }

  test("json export round-trips values") {
    val dir = java.nio.file.Files.createTempDirectory("graft-exp2").toString
    val df = Seq((1, 2.5), (2, 3.5)).toDF("id", "x")
    Exporters.json(df, s"$dir/out")
    val back = spark.read.json(s"$dir/out")
    assert(back.agg(sum("x")).head().getDouble(0) === 6.0)
  }

  test("reportJson writes nested structures") {
    val p = java.nio.file.Files.createTempFile("graft-rep", ".json").toString
    Exporters.reportJson(Map("score" -> 87.5, "passes" -> Map("k" -> true), "qi" -> Seq("a", "b")), p)
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(p))
    assert(txt.contains("\"score\": 87.5") && txt.contains("\"k\": true") && txt.contains("[\"a\", \"b\"]"))
  }

  test("excel export writes a valid multi-sheet xlsx (zip + OOXML check)") {
    val p = java.nio.file.Files.createTempFile("graft-xl", ".xlsx").toString
    val kpis = Seq((100L, 12.5), (200L, 37.25)).toDF("total_visits", "avg_cost")
    val byDept = Seq(("Cardiology", 10, true), ("Labs & \"ER\"", 7, false), (null, 1, true))
      .toDF("dept", "n", "active")
    Exporters.excel(Seq("KPIs" -> kpis, "By [Dept]/Q?" -> byDept), p)

    // read back with the JDK's own zip + XML parsers — independent of
    // the writer's string-building
    val zf = new java.util.zip.ZipFile(p)
    try {
      val entries = {
        val es = zf.entries(); val b = Seq.newBuilder[String]
        while (es.hasMoreElements) b += es.nextElement().getName
        b.result()
      }
      assert(entries.contains("[Content_Types].xml"))
      assert(entries.contains("xl/workbook.xml"))
      assert(entries.contains("xl/worksheets/sheet1.xml"))
      assert(entries.contains("xl/worksheets/sheet2.xml"))
      def xml(name: String): org.w3c.dom.Document = {
        val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        f.setNamespaceAware(true)
        f.newDocumentBuilder().parse(zf.getInputStream(zf.getEntry(name)))
      }
      // workbook lists both sheets, illegal name chars sanitized
      val wb = xml("xl/workbook.xml")
      val sheetNodes = wb.getElementsByTagNameNS("*", "sheet")
      assert(sheetNodes.getLength === 2)
      assert(sheetNodes.item(0).getAttributes.getNamedItem("name").getNodeValue === "KPIs")
      assert(sheetNodes.item(1).getAttributes.getNamedItem("name").getNodeValue === "By _Dept__Q_")
      // sheet 1: header row + numeric cells survive
      val s1 = xml("xl/worksheets/sheet1.xml")
      val vs = s1.getElementsByTagNameNS("*", "v")
      val vals = (0 until vs.getLength).map(vs.item(_).getTextContent)
      assert(vals.contains("100") && vals.contains("37.25"))
      val ts = s1.getElementsByTagNameNS("*", "t")
      val headers = (0 until ts.getLength).map(ts.item(_).getTextContent)
      assert(headers.contains("total_visits") && headers.contains("avg_cost"))
      // sheet 2: escaped string cell, boolean cells, null → absent cell
      val s2 = xml("xl/worksheets/sheet2.xml")
      val t2 = s2.getElementsByTagNameNS("*", "t")
      val strs = (0 until t2.getLength).map(t2.item(_).getTextContent)
      assert(strs.contains("Labs & \"ER\""))
      val rows = s2.getElementsByTagNameNS("*", "row")
      assert(rows.getLength === 4) // header + 3 data rows
      val lastRowCells = rows.item(3).getChildNodes
      assert(lastRowCells.getLength === 2) // null dept cell omitted
    } finally zf.close()
  }

  test("excel export addresses columns past Z (AA…) correctly") {
    val p = java.nio.file.Files.createTempFile("graft-xl3", ".xlsx").toString
    // 30 columns forces AA/AB/AC/AD refs in row 1
    val wide = spark.range(1).select((0 until 30).map(i => lit(i).as(s"c$i")): _*)
    Exporters.excel(Seq("Wide" -> wide), p)
    val zf = new java.util.zip.ZipFile(p)
    try {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setNamespaceAware(true)
      val s1 = f.newDocumentBuilder().parse(
        zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml")))
      val cells = s1.getElementsByTagNameNS("*", "c")
      val refs = (0 until cells.getLength)
        .map(cells.item(_).getAttributes.getNamedItem("r").getNodeValue)
      assert(refs.contains("Z1") && refs.contains("AA1") && refs.contains("AD1"))
      assert(refs.contains("AD2")) // data row uses the same addressing
      assert(!refs.exists(_.startsWith("BA"))) // no runaway columns
    } finally zf.close()
  }

  test("excel export de-duplicates case-colliding sheet names") {
    val p = java.nio.file.Files.createTempFile("graft-xl2", ".xlsx").toString
    val df = Seq(1).toDF("x")
    Exporters.excel(Seq("Report" -> df, "report" -> df), p)
    val zf = new java.util.zip.ZipFile(p)
    try {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setNamespaceAware(true)
      val wb = f.newDocumentBuilder().parse(
        zf.getInputStream(zf.getEntry("xl/workbook.xml")))
      val sheets = wb.getElementsByTagNameNS("*", "sheet")
      val names = (0 until sheets.getLength)
        .map(sheets.item(_).getAttributes.getNamedItem("name").getNodeValue)
      assert(names.distinct.size === 2)
      assert(names.map(_.toLowerCase).distinct.size === 2)
    } finally zf.close()
  }

  test("query cache honors TTL with an injected clock") {
    var now = 0L
    val cache = new QueryCache(ttlSeconds = 300, clock = () => now)
    var builds = 0
    def build = { builds += 1; spark.range(10).toDF() }
    cache.get("k")(build); cache.get("k")(build)
    assert(builds === 1 && cache.hits === 1)
    now = 301 * 1000
    cache.get("k")(build)
    assert(builds === 2 && cache.misses === 2)
    cache.invalidate("k")
    cache.get("k")(build)
    assert(builds === 3)
  }

  test("approximate variants land near the exact answers") {
    // q56/q57 now emit the bound check themselves (`approx_ok`, pinned
    // TRUE by the DuckDB oracle); this spec asserts every group passes
    // — HLL++ at rsd=0.02 has a 3σ ≈ 6% relative error bound, and
    // approx_percentile at accuracy 1000 stays within 2% here.
    val ad = graft.queries.Scale.approxDistinct.fn(spark, "/root/testdata/sf0.001")
    assert(ad.filter(!col("approx_ok")).count() === 0)
    val ap = graft.queries.Scale.approxPercentile.fn(spark, "/root/testdata/sf0.001")
    assert(ap.filter(!col("approx_ok")).count() === 0)
  }
}
