package graft.export

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Result sinks (SURVEY.md §2 A2/A4; reference `export_utils.py`,
  * `privacy_engine.py:396-398`). The reference's Excel multi-sheet
  * export (A3) is out of engine scope by design — each "sheet" is a
  * named query result exported individually.
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
