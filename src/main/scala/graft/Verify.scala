package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Kill resilience (the CORRECTNESS_r11 `{}` lesson): the driver runs
  * this under a wall-clock timeout, and round 11's Verify wrote
  * `oracle_sql.json` + `queries.json` only AFTER the full dump loop —
  * so a driver-side kill mid-dump left N finished parquet dirs the
  * compare could not grade, and the round's correctness signal was
  * literally `{}` despite a green registry. Three defenses, mirroring
  * the Bench.runLoop fixes (d83f97d):
  *   - both metadata files are pure functions of the registry (query
  *     names + SQL strings) and are written BEFORE the first dump, so
  *     every query directory that finishes is gradeable;
  *   - dumps run cheap-first / heaviest-last (hints from the r11 quiet
  *     bench), so a kill loses the expensive tail, not the majority;
  *   - dumps are submitted through a bounded thread pool (Spark
  *     schedules concurrent jobs; FAIR mode keeps a heavy query from
  *     convoying the cheap ones), cutting wall time ~2-3× on the
  *     driver's 8-core verify config.
  * VerifyResilienceSpec pins metadata-before-dump ordering, the dump
  * order, failure isolation, and lock-group mutual exclusion.
  */
object Verify {

  /** sf0.1 noop-bench seconds from BENCH_NOTES_r11_quiet.json for the
    * heaviest ~40 queries (~40% of total wall). Relative cost is what
    * matters — sf0.01 dump cost tracks the same ordering. Unlisted
    * queries are the cheap majority and dump first in name order.
    */
  private[graft] val heavyHints: Map[String, Double] = Map(
    "q205_token_autocorr" -> 13.07, "q337_adaboost_stumps" -> 11.12,
    "q125_pagerank" -> 9.24, "q138_bootstrap_ci" -> 8.20,
    "q224_pca_power" -> 8.00, "q121_semdedup" -> 6.11,
    "q141_als_recommend" -> 5.45, "q142_ngram_jaccard_prefix" -> 4.92,
    "q336_personalized_pagerank" -> 4.47, "q314_dup_pair_explain" -> 4.27,
    "q215_streaming_neardup_gate" -> 4.17, "q167_label_noise" -> 4.14,
    "q132_item_similarity" -> 4.10, "q280_facility_location" -> 3.62,
    "q86_boilerplate_ngrams" -> 3.56, "q249_source_minhash" -> 3.50,
    "q114_source_overlap" -> 3.44, "q171_containment_pairs" -> 3.39,
    "q269_lz_compressibility" -> 3.30, "q174_column_stats" -> 3.18,
    "q41_minhash_lsh" -> 2.93, "q82_repetition" -> 2.90,
    "q157_hits" -> 2.88, "q278_textrank_keywords" -> 2.85,
    "q204_dup_span_islands" -> 2.84, "q190_dup_cluster_sizes" -> 2.81,
    "q95_dup_spans" -> 2.78, "q346_phrase_search" -> 2.77,
    "q166_frequent_pairs" -> 2.77, "q118_bigram_logprob" -> 2.74,
    "q151_stream_left_outer_join" -> 2.65, "q206_minhash_calibration" -> 2.62,
    "q303_substring_dedup" -> 2.56, "q53_iforest_anomaly" -> 2.48,
    "q262_mmd_sources" -> 2.37, "q92_bloom_decontaminate" -> 2.36,
    "q78_embedding_near_dup" -> 2.36, "q351_cms_heavy_hitters" -> 2.31,
    "q94_ann_pq" -> 2.28, "q301_signal_correlation" -> 2.21)

  /** Cheap-first, heaviest-LAST dump order: a driver kill at T seconds
    * should lose the fewest (and only the most expensive) queries.
    */
  private[graft] def dumpOrder(names: Seq[String]): Seq[String] = {
    val (heavy, cheap) = names.partition(heavyHints.contains)
    cheap.sorted ++ heavy.sortBy(heavyHints)
  }

  /** Queries whose CONSTRUCTION mutates a session-shared resource and
    * must not run concurrently with each other (other queries are
    * unaffected): q61/q70 build-or-probe the same persisted IVF index
    * path (Overwrite-vs-read on one dir); q122/q151 temporarily lower
    * spark.sql.shuffle.partitions around their streaming drain with a
    * save/restore that is only race-free if they exclude each other.
    * Everything else is verified concurrency-safe: per-query output
    * dirs, nanoTime-unique memory sinks, synchronized Dedup ledger,
    * ConcurrentHashMap model memos, idempotent nanosAsLong=true sets.
    */
  private[graft] def lockGroup(name: String): Option[String] =
    if (name.startsWith("q61_") || name.startsWith("q70_")) Some("ivf-base")
    else if (name.startsWith("q122_") || name.startsWith("q151_")) Some("shuffle-conf")
    else None

  /** Testable core (VerifyResilienceSpec): writes metadata FIRST, then
    * dumps every query through a bounded pool in [[dumpOrder]],
    * isolating per-query failures (a crashed query must not stop the
    * rest — the gate reports it as MISSING via the manifest).
    */
  private[graft] def runDump(names: Seq[String], writeMetadata: () => Unit,
      dumpOne: String => Unit, threads: Int): Unit = {
    writeMetadata()
    val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.max(1, threads))
    val futures = dumpOrder(names).map { name =>
      pool.submit(new Runnable {
        def run(): Unit = {
          def go(): Unit =
            try dumpOne(name)
            catch { case e: Throwable =>
              System.err.println(s"[verify] $name failed: ${e.getMessage}")
            }
          lockGroup(name) match {
            case Some(g) =>
              locks.computeIfAbsent(g, _ => new Object).synchronized(go())
            case None => go()
          }
        }
      })
    }
    pool.shutdown()
    futures.foreach(_.get())
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // concurrent dump jobs share task slots round-robin instead of
      // convoying behind the occasional heavy stage
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=q91,q95 → dump only matching queries (substring
    // match) — the fast iteration path; unset = full dump
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.contains))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def writeMetadata(): Unit = {
      val json = SparkEntry.oracleSql
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
      // manifest of every query this run attempts, so a gate can detect
      // queries that crashed (and therefore wrote no output directory)
      Files.writeString(Paths.get(s"$outDir/queries.json"),
        selected.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    }
    // default pool size tracks the session's core count (bounded 2..6):
    // on the driver's default local[4] six concurrent jobs would only
    // oversubscribe the four task slots
    val threads = sys.env.get("SPARK_GRAFT_VERIFY_THREADS").map(_.toInt)
      .getOrElse(math.max(2, math.min(6, cpus.toInt)))
    runDump(selected.keys.toSeq, () => writeMetadata(),
      name => {
        // FAIR shares slots across POOLS, not within one (the default
        // pool is internally FIFO) — one on-demand pool per dump
        // thread gives round-robin between concurrent queries
        spark.sparkContext.setLocalProperty("spark.scheduler.pool",
          "verify-" + Thread.currentThread().getId)
        selected(name)(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      },
      threads)
    spark.stop()
  }
}
