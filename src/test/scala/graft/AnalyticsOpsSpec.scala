package graft

import org.apache.spark.sql.functions._

/** Semantic gates for the time-series / drift / keyword / sampling
  * batch (q106–q111) beyond the DuckDB hash match: each test asserts a
  * property the hash can't express (spine completeness, statistic
  * bounds, weighting bias) on sf0.001.
  */
class AnalyticsOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q106 gap-fill emits a complete daily spine with LOCF") {
    val out = run("q106_gap_fill").cache()
    val days = out.select(to_date(col("day")).as("d"))
    val span = days.agg(datediff(max(col("d")), min(col("d")))).head.getInt(0) + 1
    assert(out.count() === span.toLong) // every day present exactly once
    // gap days carry zero activity but a non-null carried-forward value
    val gaps = out.filter(col("n_orders") === 0)
    assert(gaps.count() > 0) // the slice is genuinely sparse
    assert(gaps.filter(col("revenue") =!= 0.0).count() === 0)
    assert(out.filter(col("revenue_locf").isNull).count() === 0) // first day has data
    out.unpersist()
  }

  test("q107 KS statistic is a valid sup-distance") {
    val r = run("q107_ks_drift").head
    val ks = r.getAs[Double]("ks_stat")
    assert(ks >= 0.0 && ks <= 1.0)
    assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
  }

  test("q108 tf-idf ranks are dense, per-doc, and score-ordered") {
    val out = run("q108_tfidf_keywords").cache()
    val perDoc = out.groupBy("doc_id")
      .agg(count(lit(1)).as("k"),
        // collect_list has no ordering guarantee — sort by rk explicitly
        array_sort(collect_list(struct(col("rk"), col("tfidf")))).as("s"))
    assert(perDoc.filter(col("k") > 3).count() === 0)
    val unordered = perDoc.filter(size(col("s")) === 3)
      .filter(!(col("s")(0)("tfidf") >= col("s")(1)("tfidf")
        && col("s")(1)("tfidf") >= col("s")(2)("tfidf")))
    assert(unordered.count() === 0)
    out.unpersist()
  }

  test("q110 weighted sample over-represents heavy documents") {
    val corpusMean = Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).head.getDouble(0)
    val sampleMean = run("q110_weighted_sample")
      .agg(avg(col("n_chars"))).head.getDouble(0)
    // A-ES with w = n_chars biases selection toward long docs
    assert(sampleMean > corpusMean)
  }

  test("q133 classifier scores are valid probabilities over the top docs") {
    val out = run("q133_quality_classifier").cache()
    assert(out.count() === 15)
    assert(out.filter(col("score") < 0.0 || col("score") > 1.0).count() === 0)
    assert(out.filter(col("label").isin(0.0, 1.0) === false).count() === 0)
    out.unpersist()
  }

  test("q134 DSIR sample draws only raw-pool docs; gumbelKey tracks exp(logw)") {
    val out = SparkEntry.queries("q134_dsir_resample")(spark, "/root/testdata/sf0.01").cache()
    assert(out.count() === 50)
    // the target corpus defines the distribution; it is never sampled
    assert(out.filter(col("source").isin("src0", "src1", "src2")).count() === 0)
    out.unpersist()
    graft.dedup.Dedup.clearCaches(spark)
    // Gumbel-top-k bias: 50 keys at weight 20 among 1000 at weight 1 —
    // a uniform draw of 100 would include ~4.8 heavy keys, weighted
    // inclusion ∝ exp(lw) yields ~40; assert the separation.
    import spark.implicits._
    val df = (0L until 1050L).map(k => (k, if (k < 50) math.log(20.0) else 0.0))
      .toDF("k", "lw")
    val heavy = df.select(col("k"),
        graft.functions.Transforms.gumbelKey(col("lw"), col("k")).as("s"))
      .orderBy(col("s").desc).limit(100).filter(col("k") < 50).count()
    assert(heavy >= 25, s"only $heavy heavy keys in the weighted top-100")
  }

  test("q138 bootstrap CI brackets the full-sample mean") {
    val r = run("q138_bootstrap_ci").head
    assert(r.getAs[Long]("n_replicates") === 100L)
    val (lo, hi, m) = (r.getAs[Double]("boot_lo95"), r.getAs[Double]("boot_hi95"),
      r.getAs[Double]("mean_full"))
    assert(lo < hi)
    assert(lo <= m && m <= hi, s"mean $m outside [$lo, $hi]")
  }

  test("q139 attribution credit partitions the purchase set") {
    val out = run("q139_last_touch_attribution").cache()
    val channels = out.select("channel").collect().map(_.getString(0)).toSet
    assert(channels.subsetOf(Set("click", "view", "direct")))
    val credited = out.agg(sum("n_purchases")).head.getLong(0)
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(credited === purchases) // every purchase credited exactly once
    out.unpersist()
  }

  test("q112 count-min estimates never undercount") {
    val out = run("q112_cms_heavy_hitters").cache()
    assert(out.count() === 20)
    // the CMS guarantee is one-sided: collisions only inflate
    assert(out.filter(col("cms_est") < col("n")).count() === 0)
    out.unpersist()
  }

  test("q113 every spike exceeds twice its own trailing baseline") {
    val out = run("q113_rate_spike")
    assert(out.filter(col("spike_ratio") <= 2.0).count() === 0)
    assert(out.filter(col("trailing_avg") <= 0.0).count() === 0)
  }

  test("q114 overlap matrix is upper-triangular with valid Jaccard") {
    val out = run("q114_source_overlap").cache()
    assert(out.filter(col("src_a") >= col("src_b")).count() === 0)
    assert(out.filter(col("jaccard") <= 0.0 || col("jaccard") > 1.0).count() === 0)
    // n sources → at most n(n-1)/2 pairs
    val n = Tables.documents(spark, sf).select("source").distinct().count()
    assert(out.count() <= n * (n - 1) / 2)
    out.unpersist()
  }

  test("q115 session paths are capped at five hops and count-ordered") {
    val out = run("q115_session_paths").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("path").split(">").length <= 5))
    val counts = out.map(_.getAs[Long]("n_sessions"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("q116 contingency cells reconstruct the grand total") {
    val out = run("q116_chi_square").cache()
    val total = Tables.events(spark, sf).count()
    assert(out.agg(sum(col("o"))).head.getLong(0) === total)
    assert(out.filter(col("cell_chi2") < 0.0 || col("expected") <= 0.0).count() === 0)
    out.unpersist()
  }

  test("q117 trend moments match a direct per-group fit") {
    val out = run("q117_trend_slope").collect()
    assert(out.nonEmpty)
    assert(out.forall(r => !r.getAs[Double]("slope").isNaN && r.getAs[Long]("n_days") >= 2))
  }

  test("q118 MLE bigram log-probs are non-positive") {
    val out = run("q118_bigram_logprob")
    assert(out.filter(col("avg_logprob") > 0.0).count() === 0)
    assert(out.filter(col("n_bigrams") <= 0).count() === 0)
  }

  test("q119 two-level prefix AUC equals the direct tie-corrected AUC") {
    val r = run("q119_auc").head
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
    // recompute directly (average-rank Mann-Whitney) on the collected
    // toy slice — independent of the binning/window machinery
    val rows = Tables.events(spark, sf)
      .select(col("value"), (col("event_type") === "error").cast("int").as("y"))
      .collect().map(r => (r.getDouble(0), r.getInt(1)))
    val pos = rows.filter(_._2 == 1).map(_._1).sorted
    val neg = rows.filter(_._2 == 0).map(_._1).sorted
    var u2 = 0L // 2U, exact
    for (p <- pos) {
      val below = neg.count(_ < p).toLong
      val ties = neg.count(_ == p).toLong
      u2 += 2 * below + ties
    }
    val direct = u2.toDouble / (2.0 * pos.length * neg.length)
    assert(math.abs(auc - direct) < 1e-6, s"query $auc vs direct $direct")
  }

  test("q111 histogram partitions the table exactly") {
    val out = run("q111_histogram").cache()
    val total = Tables.orders(spark, sf).count()
    assert(out.agg(sum(col("n"))).head.getLong(0) === total)
    val bins = out.select("bin").collect().map(_.getLong(0))
    assert(bins.forall(b => b >= 0 && b <= 19))
    out.unpersist()
  }
}
