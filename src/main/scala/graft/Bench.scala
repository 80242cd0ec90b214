package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query is timed up
  * to `runs` times (default 3; `-n N` or SPARK_GRAFT_BENCH_RUNS) and
  * the per-query MINIMUM is reported — the host is co-tenant, so a
  * single sample conflates scheduler noise with plan cost; min-of-N is
  * the standard noise floor estimate.
  *
  * Kill resilience (the BENCH_r10 rc=124 lesson): the driver runs this
  * under a wall-clock timeout, and a three-pass sweep plus JVM startup
  * can exceed it under co-tenant load. Two defenses:
  *   - the artifact is (over)written after EVERY completed pass — and
  *     after a budget-truncated partial pass — so a mid-run kill still
  *     leaves the previous pass's complete min-map on disk;
  *   - a wall-clock budget (SPARK_GRAFT_BENCH_BUDGET_SEC, default
  *     1200 s) gates passes 2..N: re-runs proceed heaviest-query-first
  *     and stop starting new queries once the budget is spent, so
  *     min-of-N lands where scheduler noise matters most.
  * Pass 1 always runs to completion regardless of budget — a partial
  * first pass would not be a valid artifact.
  */
object Bench {

  /** The driver-contract JSON line for a (possibly still-improving)
    * best-time map. Failures are recorded as -1 per query and excluded
    * from the total.
    */
  def jsonLine(names: Seq[String], best: collection.Map[String, Double],
      passes: Int, sfDir: String, partial: Boolean = false): String = {
    val qs = names.map(k => "\"" + k + "\":" + best.getOrElse(k, -1.0))
      .mkString("{", ",", "}")
    val total = names.flatMap(best.get).filter(_ >= 0).sum
    val part = if (partial) ""","partial":true""" else ""
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$passes,"sf":"$sfDir"$part}"""
  }

  private def writeArtifact(line: String, outPath: String): Unit =
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }

  /** Core timing loop, separated from [[main]] so kill resilience is
    * testable (BenchResilienceSpec). `time(name)` executes and consumes
    * one query; per-query NonFatal errors mark the query -1, fatal
    * errors (OOM, a simulated kill) propagate — by then the previous
    * pass's artifact is already on disk, which is the contract.
    * Returns (best map, fully completed passes).
    */
  private[graft] def runLoop(names: Seq[String], time: String => Unit,
      runs: Int, budgetSec: Double, sfDir: String, outPath: String,
      beforePass: () => Unit = () => (),
      partialEvery: Int = 50): (Map[String, Double], Int) = {
    val best = scala.collection.mutable.Map.empty[String, Double]
    val start = System.nanoTime()
    def elapsed = (System.nanoTime() - start) / 1e9
    var passes = 0
    var pass = 1
    var truncated = false
    while (pass <= runs && !truncated && (pass == 1 || elapsed < budgetSec)) {
      beforePass()
      // pass 1: registry order; later passes: heaviest first, so a
      // budget cut re-samples the queries where noise costs the most
      val order = if (pass == 1) names
        else names.sortBy(n => -best.getOrElse(n, Double.MaxValue))
      var attempted = 0
      for (name <- order if !truncated) {
        if (pass > 1 && elapsed >= budgetSec) truncated = true
        else {
          val t0 = System.nanoTime()
          try {
            time(name)
            val dt = (System.nanoTime() - t0) / 1e9
            if (!best.get(name).exists(b => b >= 0 && b <= dt)) best(name) = dt
          } catch { case NonFatal(e) =>
            // a crashed query must not masquerade as a fast one
            System.err.println(s"[bench] $name FAILED pass $pass: ${e.getMessage}")
            if (!best.contains(name)) best(name) = -1.0
          }
          attempted += 1
          // r11 lesson: a kill INSIDE pass 1 used to leave nothing.
          // Checkpoint a partial artifact every `partialEvery` queries
          // during pass 1, covering only the ATTEMPTED names (absent ≠
          // failed) and flagged "partial":true so a reader never
          // mistakes it for a full-registry total.
          if (pass == 1 && attempted % partialEvery == 0 && attempted < order.size) {
            val line = jsonLine(order.take(attempted), best, 1, sfDir, partial = true)
            writeArtifact(line, outPath)
            println(line)
          }
        }
      }
      if (!truncated) passes = pass
      // overwrite the artifact after every pass (and a truncated one)
      // AND print it: run 1's complete min-map is a valid artifact and
      // must survive a driver-side kill of pass 2+ whether the driver
      // reads the file or the last stdout line (the BENCH_r10 rc=124
      // failure left BOTH empty)
      val line = jsonLine(names, best, math.max(passes, 1), sfDir)
      writeArtifact(line, outPath)
      println(line)
      pass += 1
    }
    (best.toMap, passes)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = args.sliding(2).collectFirst { case Array("-n", n) => n.toInt }
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt))
      .getOrElse(3)
    val budgetSec = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_SEC")
      .map(_.toDouble).getOrElse(1200.0)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/file-listing paths so the first measured
    // query doesn't absorb session startup.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
    // SPARK_GRAFT_BENCH_ONLY=q61,q95 → time just the matching queries
    // (substring match, like tools/check.py --only) for fast iteration
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // SPARK_GRAFT_BENCH_ACTION=count re-enables the pre-round-10 action
    // for A/B evidence only — count() lets Catalyst skip real work (see
    // below); "noop" (default) is the honest measurement.
    val useCount = sys.env.get("SPARK_GRAFT_BENCH_ACTION").contains("count")
    val fns = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.contains)) }
      .toMap
    val names = fns.keys.toSeq.sorted
    val time: String => Unit = { name =>
      // noop-format write, NOT count(): a count-only action lets
      // Catalyst eliminate work that cannot change the row count —
      // outer joins against unique keys (the q303 bug), windows and
      // aggregates that feed only output columns, even whole join
      // chains (71 of 331 queries lost spine nodes under count; see
      // graft.BenchHonesty). The noop sink consumes every output
      // column and keeps the final sort, so the measured plan IS
      // the plan the correctness gate executes, minus I/O.
      val df = fns(name)(spark, sfDir)
      if (useCount) df.count()
      else df.write.mode("overwrite").format("noop").save()
    }
    val beforePass = () => {
      // drop cached intermediates so each repeat re-executes the full
      // plan instead of reading the previous run's persisted subtrees
      // (cross-query reuse WITHIN a run is by design and stays)
      graft.dedup.Dedup.clearCaches(spark)
      spark.catalog.clearCache()
    }
    // runLoop already wrote and printed the line after every pass —
    // the LAST stdout line is always the newest complete artifact
    runLoop(names, time, runs, budgetSec, sfDir, outPath, beforePass)
    spark.stop()
  }
}
