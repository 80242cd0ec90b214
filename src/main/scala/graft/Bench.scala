package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query is timed
  * `runs` times (default 3; `-n N` or SPARK_GRAFT_BENCH_RUNS) and the
  * per-query MINIMUM is reported — the host is co-tenant, so a single
  * sample conflates scheduler noise with plan cost; min-of-N is the
  * standard noise floor estimate.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = args.sliding(2).collectFirst { case Array("-n", n) => n.toInt }
      .orElse(sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt))
      .getOrElse(3)
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
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.contains)) }
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (r <- 1 to runs) {
      // drop cached intermediates so each repeat re-executes the full
      // plan instead of reading the previous run's persisted subtrees
      // (cross-query reuse WITHIN a run is by design and stays)
      graft.dedup.Dedup.clearCaches(spark)
      spark.catalog.clearCache()
      for ((name, fn) <- names) {
        val t0 = System.nanoTime()
        try {
          // noop-format write, NOT count(): a count-only action lets
          // Catalyst eliminate work that cannot change the row count —
          // outer joins against unique keys (the q303 bug), windows and
          // aggregates that feed only output columns, even whole join
          // chains (71 of 331 queries lost spine nodes under count; see
          // graft.BenchHonesty). The noop sink consumes every output
          // column and keeps the final sort, so the measured plan IS
          // the plan the correctness gate executes, minus I/O.
          val df = fn(spark, sfDir)
          if (useCount) df.count()
          else df.write.mode("overwrite").format("noop").save()
          val dt = (System.nanoTime() - t0) / 1e9
          if (!best.contains(name) || (dt < best(name) && best(name) >= 0) || best(name) < 0)
            best(name) = dt
        } catch { case e: Throwable =>
          // a crashed query must not masquerade as a fast one
          System.err.println(s"[bench] $name FAILED run $r: ${e.getMessage}")
          if (!best.contains(name)) best(name) = -1.0
        }
      }
    }
    val qs = names.map { case (k, _) => "\"" + k + "\":" + best(k) }
      .mkString("{", ",", "}")
    val total = names.map(n => best(n._1)).filter(_ >= 0).sum // failures excluded; marked -1 per query
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"sf":"$sfDir"}"""
    println(line)
    // Tee the line to a file: stdout capture has truncated mid-stream
    // before (BENCH_r05.json had parsed:null), so the round artifact
    // must not depend on the pipe surviving.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: java.io.IOException =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    spark.stop()
  }
}
