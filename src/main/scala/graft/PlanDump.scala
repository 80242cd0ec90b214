package graft

import org.apache.spark.sql.SparkSession

/** Per-query `explain("formatted")` dumps — the round-12 optimization
  * evidence files (`plans/r12/<query>_{before,after}.txt`).
  *
  * Usage: PlanDump <sfDir> <outDir> <suffix> [q205,q337,...]
  * Writes `<outDir>/<name>_<suffix>.txt` for each matching query
  * (substring match like tools/check.py --only; no list = all).
  * Plan construction only — no jobs beyond what building a DataFrame
  * needs (Dedup plan construction launches zero jobs, DedupSpec).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val only = args.lift(3).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
        if only.forall(_.exists(name.contains))) {
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"$name ok")
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"$name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
