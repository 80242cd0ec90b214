package graft.export

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Result sinks (SURVEY.md §2 A2/A3/A4; reference `export_utils.py`,
  * `privacy_engine.py:396-398`). [[excel]] matches the reference's
  * multi-sheet Excel surface (`export_utils.py:43-64` — one sheet per
  * named query result, header row, no index column) with a
  * from-scratch OOXML SpreadsheetML writer over `java.util.zip` — the
  * format is a public ECMA-376 standard and the JDK zips, so no
  * dependency is needed.
  */
object Exporters {

  /** CSV export with header; `single = true` coalesces to one file for
    * parity with the reference's one-file-per-query exports (only for
    * result-sized data — never coalesce a big table to 1 partition).
    */
  def csv(df: DataFrame, path: String, single: Boolean = false): Unit = {
    val out = if (single) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  }

  /** JSON-lines export (privacy audit reports, API payloads). */
  def json(df: DataFrame, path: String, single: Boolean = false): Unit = {
    val out = if (single) df.coalesce(1) else df
    out.write.mode(SaveMode.Overwrite).json(path)
  }

  /** Excel's hard sheet-size ceiling (rows incl. header). */
  val ExcelMaxRows: Int = 1048576

  /** Multi-sheet XLSX export (`export_utils.py:43-64`): one sheet per
    * named result, header row first, values as inline strings /
    * numbers / booleans. A report sink, not a table sink — rows stream
    * through the driver via `toLocalIterator` (one partition in memory
    * at a time), and a sheet that hits Excel's row ceiling fails fast
    * with a pointer to [[csv]]. Sheet names are sanitized to Excel's
    * rules (illegal chars, 31-char cap) and de-duplicated.
    */
  def excel(sheets: Seq[(String, DataFrame)], path: String): Unit = {
    require(sheets.nonEmpty, "excel export needs at least one sheet")
    val names = dedupeNames(sheets.map { case (n, _) => sanitizeSheetName(n) })
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    try {
      putEntry(zos, "[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
          sheets.indices.map(i =>
            s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
            .mkString + "</Types>")
      putEntry(zos, "_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
          "</Relationships>")
      putEntry(zos, "xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
          names.zipWithIndex.map { case (n, i) =>
            s"""<sheet name="${xmlEsc(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
          }.mkString + "</sheets></workbook>")
      putEntry(zos, "xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          sheets.indices.map(i =>
            s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""")
            .mkString + "</Relationships>")
      sheets.zipWithIndex.foreach { case ((rawName, df), i) =>
        zos.putNextEntry(new java.util.zip.ZipEntry(s"xl/worksheets/sheet${i + 1}.xml"))
        val w = new java.io.OutputStreamWriter(zos, java.nio.charset.StandardCharsets.UTF_8)
        w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
        w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
        writeRow(w, 1, df.columns.toSeq)
        var r = 2
        val it = df.toLocalIterator()
        while (it.hasNext) {
          if (r > ExcelMaxRows)
            throw new IllegalArgumentException(
              s"sheet '$rawName' exceeds Excel's $ExcelMaxRows-row limit — use Exporters.csv for table-sized data")
          writeRow(w, r, it.next().toSeq)
          r += 1
        }
        w.write("</sheetData></worksheet>")
        w.flush()
        zos.closeEntry()
      }
    } finally zos.close()
  }

  private def sanitizeSheetName(n: String): String = {
    val cleaned = n.map(c => if ("[]:*?/\\".contains(c)) '_' else c).trim
    val nonEmpty = if (cleaned.isEmpty) "Sheet" else cleaned
    nonEmpty.take(31)
  }

  private def dedupeNames(ns: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Set.empty[String]
    ns.map { n =>
      var candidate = n
      var i = 2
      while (!seen.add(candidate.toLowerCase)) { // Excel names are case-insensitive
        candidate = s"${n.take(28)}_$i"
        i += 1
      }
      candidate
    }
  }

  private def putEntry(zos: java.util.zip.ZipOutputStream, name: String, body: String): Unit = {
    zos.putNextEntry(new java.util.zip.ZipEntry(name))
    zos.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    zos.closeEntry()
  }

  private def xmlEsc(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => "" // illegal in XML 1.0
    case c => c.toString
  }

  /** A1-style column letters: 0 → A, 25 → Z, 26 → AA … */
  private def colLetters(i0: Int): String = {
    var i = i0
    val sb = new StringBuilder
    while (i >= 0) {
      sb.insert(0, ('A' + i % 26).toChar)
      i = i / 26 - 1
    }
    sb.toString
  }

  private def writeRow(w: java.io.Writer, r: Int, values: Seq[Any]): Unit = {
    w.write(s"""<row r="$r">""")
    values.zipWithIndex.foreach { case (v, c) =>
      val ref = s"${colLetters(c)}$r"
      v match {
        case null => // omitted cell = blank
        case b: Boolean =>
          w.write(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
        case n @ (_: Int | _: Long | _: Short | _: Byte) =>
          w.write(s"""<c r="$ref"><v>$n</v></c>""")
        case d: Double if !d.isNaN && !d.isInfinite =>
          w.write(s"""<c r="$ref"><v>$d</v></c>""")
        case f: Float if !f.isNaN && !f.isInfinite =>
          w.write(s"""<c r="$ref"><v>$f</v></c>""")
        case d: java.math.BigDecimal =>
          w.write(s"""<c r="$ref"><v>${d.toPlainString}</v></c>""")
        case d: BigDecimal =>
          w.write(s"""<c r="$ref"><v>${d.bigDecimal.toPlainString}</v></c>""")
        case other => // strings, dates, timestamps, NaN/Inf → inline string
          w.write(s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEsc(String.valueOf(other))}</t></is></c>""")
      }
    }
    w.write("</row>")
  }

  /** Small driver-side report as a single JSON object file
    * (`privacy_engine.py:396-398` shape).
    */
  def reportJson(report: Map[String, Any], path: String): Unit = {
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def render(v: Any): String = v match {
      case s: String => esc(s)
      case d: Double if d.isNaN || d.isInfinite => "null" // JSON has no NaN/Inf
      case f: Float if f.isNaN || f.isInfinite => "null"
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        .map { case (k, x) => s"${esc(k)}: ${render(x)}" }.mkString("{", ", ", "}")
      case seq: Seq[_] => seq.map(render).mkString("[", ", ", "]")
      case other => String.valueOf(other)
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), render(report))
  }
}
