package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ml.{IsolationForestLite, MlPipeline}
import graft.multimodal.Multimodal

/** ML / advanced-analytics capabilities surfaced through the driver
  * gate (SURVEY.md §2.J + multimodal extension).
  */
object Ml {

  val all: Seq[Q] = Seq(zscoreAnomaly, iforestAnomaly, multimodalFeatures, ksDrift,
    chiSquare, aucMannWhitney, robustOutliers, cuped, qualityClassifier, calibration,
    bootstrapCi, psiDrift, classifierMetrics, trimmedMean, infoGain, rankSumDrift,
    wassersteinDrift, averagePrecision, permutationTest, cramersV, cumulativeGains,
    signalCorrelation, youdenThreshold, adaboostStumps, plattScaling,
    fellegiSunter)

  // --- q200: per-dimension information gain vs label ------------------------
  // Feature selection's first question: which embedding dimensions
  // carry label information? IG_i = H(label) − H(label | sign(x_i)) —
  // the decision-stump split criterion, computed relationally: one
  // posexplode feeds (dim, bucket, label) counts (map-side combined),
  // every entropy is a sum of −p·ln p terms over count ratios, 9-dp
  // rounded before DECIMAL sums (the q162 idiom). Corpus-scale work is
  // the one explode; everything after runs on dims×2×|labels| rows.
  def infoGain: Q = Q(
    "q200_info_gain",
    """WITH dims AS (SELECT vec_id, CAST(i AS INTEGER) AS i,
      |    CASE WHEN CAST(embedding[i] AS DOUBLE) >= 0 THEN 'p' ELSE 'n' END AS b,
      |    label
      |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS u(i)),
      |n AS (SELECT count(*) AS n FROM embeddings),
      |hl AS (SELECT CAST(sum(CAST(round(
      |      (CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n), 9)
      |      AS DECIMAL(18,9))) AS DOUBLE) AS negh
      |  FROM (SELECT label, count(*) AS c FROM embeddings GROUP BY label)
      |  CROSS JOIN n),
      |nbl AS (SELECT i, b, label, count(*) AS c FROM dims GROUP BY i, b, label),
      |nb AS (SELECT i, b, CAST(sum(c) AS BIGINT) AS nb FROM nbl GROUP BY i, b),
      |hcond AS (SELECT nbl.i,
      |    CAST(sum(CAST(round(
      |      (CAST(nbl.c AS DOUBLE) / n.n)
      |        * ln(CAST(nbl.c AS DOUBLE) / nb.nb), 9)
      |      AS DECIMAL(18,9))) AS DOUBLE) AS negc
      |  FROM nbl JOIN nb ON nb.i = nbl.i AND nb.b = nbl.b CROSS JOIN n
      |  GROUP BY nbl.i)
      |SELECT hcond.i AS dim, round(-hl.negh, 6) + 0.0 AS h_label,
      |  round(-hl.negh - (-hcond.negc), 6) + 0.0 AS info_gain
      |FROM hcond CROSS JOIN hl ORDER BY dim""".stripMargin,
  ) { (s, dir) =>
    val embs = Tables.embeddings(s, dir)
    val dims = embs
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "xf")))
      .select(col("vec_id"), (col("pos") + 1).cast("int").as("i"),
        when(col("xf").cast("double") >= 0, "p").otherwise("n").as("b"), col("label"))
    val n = embs.agg(count(lit(1)).as("n"))
    val pl = col("c").cast("double") / col("n")
    val hl = embs.groupBy("label").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(n))
      .agg(dsum(round(pl * log(pl), 9), 9).as("negh"))
    val nbl = graft.dedup.Dedup.persistTracked(
      dims.groupBy("i", "b", "label").agg(count(lit(1)).as("c")))
    val nb = nbl.groupBy("i", "b").agg(sum(col("c")).as("nb"))
    val hcond = nbl.join(nb, Seq("i", "b")).crossJoin(broadcast(n))
      .groupBy("i")
      .agg(dsum(round((col("c").cast("double") / col("n"))
        * log(col("c").cast("double") / col("nb")), 9), 9).as("negc"))
    hcond.crossJoin(broadcast(hl))
      .select(col("i").as("dim"), znorm(round(-col("negh"), 6)).as("h_label"),
        znorm(round(-col("negh") + col("negc"), 6)).as("info_gain"))
      .orderBy("dim")
  }

  // --- q150: trimmed and winsorized means ----------------------------------
  // The robust-location pair next to q128's MAD: drop (trimmed) or
  // clamp (winsorized) everything outside the per-group [p10, p90]
  // band before averaging. Bounds are exact interpolated percentiles
  // (q11 idiom) broadcast back into one fact scan; sums are
  // DECIMAL-exact. Two scans total, everything keyed on the tiny
  // group key.
  def trimmedMean: Q = Q(
    "q150_trimmed_mean",
    """WITH b AS (SELECT event_type, round(quantile_cont(value, 0.1), 2) AS lo,
      |           round(quantile_cont(value, 0.9), 2) AS hi
      |           FROM events GROUP BY 1)
      |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,2)))
      |          FILTER (WHERE value >= lo AND value <= hi) AS DOUBLE)
      |    / count(*) FILTER (WHERE value >= lo AND value <= hi), 6) AS trimmed_mean,
      |  round(CAST(sum(CAST(least(greatest(value, lo), hi) AS DECIMAL(18,2))) AS DOUBLE)
      |    / count(*), 6) AS winsor_mean
      |FROM events e JOIN b USING (event_type)
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
  ) { (s, dir) =>
    val events = Tables.events(s, dir)
    // Bounds are ROUNDED to the grid (2 dp) before clamping: a raw
    // interpolated percentile is an arbitrary double, and casting a
    // clamped boundary row to DECIMAL(18,2) then rounds HALF_UP in
    // Spark vs HALF_EVEN in DuckDB — a half-cent bound flips the
    // winsorized sum by a cent per clamped row (caught by a bonus
    // sf0.001 gate; sf0.01 happened to dodge the boundary).
    val b = events.groupBy("event_type")
      .agg(round(expr("percentile(value, 0.1)"), 2).as("lo"),
        round(expr("percentile(value, 0.9)"), 2).as("hi"))
    val in = col("value") >= col("lo") && col("value") <= col("hi")
    events.join(broadcast(b), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(dsum(when(in, col("value"))) / count(when(in, lit(1))), 6).as("trimmed_mean"),
        round(dsum(least(greatest(col("value"), col("lo")), col("hi"))) / count(lit(1)), 6)
          .as("winsor_mean"))
      .orderBy("event_type")
  }

  // --- q149: classifier evaluation metrics ---------------------------------
  // The scalar eval block next to q137's diagram: accuracy, Brier
  // score, log-loss, and expected calibration error for the same
  // 10-iteration trained model. Everything is aggregate-first — one
  // scan for the row metrics, one ≤10-row bin pass for ECE — with
  // 9-dp DECIMAL sums throughout; the oracle replays training then
  // all four metrics.
  def classifierMetrics: Q = Q(
    "q149_classifier_metrics",
    s"""WITH ${lrFeatSql("n_chars > 280")},
      |${(1 to 10).map(k => lrIterSql(k, s"w${k - 1}", "2")).mkString(",\n")},
      |sc AS (SELECT f.doc_id, f.y, round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) +
      |    exp(-((((w.b0 + f.x1 * w.b1) + f.x2 * w.b2) + f.x3 * w.b3)))), 9) AS s
      |  FROM f, w10 w),
      |row_m AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN (s >= CAST(0.5 AS DOUBLE)) = (y = CAST(1 AS DOUBLE))
      |             THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS acc,
      |    CAST(sum(CAST(round((s - y) * (s - y), 9) AS DECIMAL(18,9))) AS DOUBLE)
      |      / count(*) AS brier,
      |    CAST(sum(CAST(round(-(y * ln(greatest(s, CAST(1e-12 AS DOUBLE)))
      |      + (CAST(1 AS DOUBLE) - y) * ln(greatest(CAST(1 AS DOUBLE) - s,
      |          CAST(1e-12 AS DOUBLE)))), 9) AS DECIMAL(18,9))) AS DOUBLE)
      |      / count(*) AS logloss
      |  FROM sc),
      |bins AS (SELECT CAST(least(floor(s * CAST(10 AS DOUBLE)), 9) AS INT) AS bin,
      |    CAST(sum(CAST(s AS DECIMAL(18,9))) AS DOUBLE) AS ss,
      |    CAST(sum(CAST(y AS DECIMAL(18,9))) AS DOUBLE) AS sy
      |  FROM sc GROUP BY 1),
      |e AS (SELECT CAST(sum(CAST(round(abs(ss - sy), 9) AS DECIMAL(18,9))) AS DOUBLE)
      |      AS num FROM bins)
      |SELECT n, round(acc, 6) AS acc, round(brier, 6) AS brier,
      |  round(logloss, 6) AS logloss, round(e.num / n, 6) AS ece
      |FROM row_m, e""".stripMargin,
  ) { (s, dir) =>
    val f = lrFeatures(s, dir, col("n_chars") > 280)
    val feat = Seq("x1", "x2", "x3")
    val m = graft.ml.LogRegLite.train(f, feat, "y", iters = 10, lr = 2.0)
    val sc = graft.dedup.Dedup.persistTracked(
      graft.ml.LogRegLite.score(f, feat, m.weights.toSeq, "s").select("doc_id", "y", "s"))
    val eps = lit(1e-12)
    val rowM = sc.agg(
      count(lit(1)).as("n"),
      (sum(when((col("s") >= 0.5) === (col("y") === 1.0), 1L).otherwise(0L)).cast("double")
        / count(lit(1))).as("acc"),
      (dsum(round((col("s") - col("y")) * (col("s") - col("y")), 9), 9) / count(lit(1)))
        .as("brier"),
      (dsum(round(-(col("y") * log(greatest(col("s"), eps))
        + (lit(1.0) - col("y")) * log(greatest(lit(1.0) - col("s"), eps))), 9), 9)
        / count(lit(1))).as("logloss"))
    val bins = sc.groupBy(least(floor(col("s") * lit(10.0)), lit(9)).cast("int").as("bin"))
      .agg(dsum(col("s"), 9).as("ss"), dsum(col("y"), 9).as("sy"))
    val e = bins.agg(dsum(round(abs(col("ss") - col("sy")), 9), 9).as("num"))
    rowM.crossJoin(broadcast(e)) // 1-row scalar broadcast
      .select(col("n"), round(col("acc"), 6).as("acc"), round(col("brier"), 6).as("brier"),
        round(col("logloss"), 6).as("logloss"), round(col("num") / col("n"), 6).as("ece"))
  }

  // --- q147: PSI drift monitor ---------------------------------------------
  // The industry drift readout next to KS (q107): Population Stability
  // Index between the first and second half of the month, binned on
  // the q135 histogram grid — PSI = Σ (p_i − q_i)·ln(p_i / q_i) with
  // the standard 0.5-count smoothing so empty bins stay finite.
  // Per-type bin counts are two keyed aggregates full-outer-joined on
  // (type, bin) (≤ 50 rows per type); the ln terms round to 9 dp and
  // DECIMAL-sum, so the whole statistic replicates in the oracle.
  // PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted — the row
  // carries the verdict label too.
  def psiDrift: Q = Q(
    "q147_psi_drift",
    """WITH b AS (SELECT event_type,
      |    CAST(least(greatest(floor((value - CAST(0 AS DOUBLE)) / CAST(10 AS DOUBLE)),
      |                        0), 49) AS INT) AS bin,
      |    CAST(ts < TIMESTAMP '2024-01-16' AS INT) AS ref
      |  FROM events),
      |c AS (SELECT event_type, bin,
      |    sum(ref) AS n_ref, sum(1 - ref) AS n_cur FROM b GROUP BY 1, 2),
      |t AS (SELECT event_type,
      |    CAST(sum(n_ref) AS DOUBLE) AS t_ref, CAST(sum(n_cur) AS DOUBLE) AS t_cur,
      |    CAST(count(*) AS DOUBLE) AS nb FROM c GROUP BY 1),
      |p AS (SELECT c.event_type,
      |    (CAST(n_ref AS DOUBLE) + CAST(0.5 AS DOUBLE)) / (t_ref + CAST(0.5 AS DOUBLE) * nb) AS p,
      |    (CAST(n_cur AS DOUBLE) + CAST(0.5 AS DOUBLE)) / (t_cur + CAST(0.5 AS DOUBLE) * nb) AS q
      |  FROM c JOIN t ON c.event_type = t.event_type)
      |SELECT event_type,
      |  round(CAST(sum(CAST(round((p - q) * ln(p / q), 9) AS DECIMAL(18,9))) AS DOUBLE), 6) AS psi,
      |  CASE WHEN CAST(sum(CAST(round((p - q) * ln(p / q), 9) AS DECIMAL(18,9))) AS DOUBLE) < 0.1 THEN 'stable'
      |       WHEN CAST(sum(CAST(round((p - q) * ln(p / q), 9) AS DECIMAL(18,9))) AS DOUBLE) < 0.25 THEN 'drifting'
      |       ELSE 'shifted' END AS verdict
      |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin,
  ) { (s, dir) =>
    val bin = least(greatest(floor((col("value") - lit(0.0)) / lit(10.0)), lit(0)), lit(49))
      .cast("int")
    val b = Tables.events(s, dir)
      .select(col("event_type"), bin.as("bin"),
        (col("ts") < lit("2024-01-16").cast("timestamp")).cast("int").as("ref"))
    val c = b.groupBy("event_type", "bin")
      .agg(sum("ref").as("n_ref"), sum(lit(1) - col("ref")).as("n_cur"))
    val t = c.groupBy("event_type")
      .agg(sum("n_ref").cast("double").as("t_ref"),
        sum("n_cur").cast("double").as("t_cur"),
        count(lit(1)).cast("double").as("nb"))
    val p = c.join(broadcast(t), "event_type")
      .select(col("event_type"),
        ((col("n_ref").cast("double") + lit(0.5)) / (col("t_ref") + lit(0.5) * col("nb"))).as("p"),
        ((col("n_cur").cast("double") + lit(0.5)) / (col("t_cur") + lit(0.5) * col("nb"))).as("q"))
    val psi = dsum(round((col("p") - col("q")) * log(col("p") / col("q")), 9), 9)
    p.groupBy("event_type")
      .agg(round(psi, 6).as("psi"),
        when(psi < 0.1, "stable").when(psi < 0.25, "drifting").otherwise("shifted")
          .as("verdict"))
      .orderBy("event_type")
  }

  // --- q138: Poisson-bootstrap confidence interval -------------------------
  // The only bootstrap that works on a cluster (Chamandy et al.,
  // Google 2012): instead of resampling n rows with replacement (a
  // sequential draw), every (row, replicate) pair gets an independent
  // Poisson(1) weight — the multinomial's limit — so all B replicates
  // are computed in ONE pass. Weights come from the seeded LCG
  // uniform through the Poisson(1) inverse CDF (pure function of
  // (o_orderkey, b): engine-reproducible, retry-stable). Scale shape:
  // the ×B explode feeds a partial aggregate with B groups, so each
  // partition emits ≤ B rows and the shuffle is B·partitions counters
  // — the fact table is scanned once and never shuffled. The CI is an
  // exact interpolated percentile over the B-row replicate table.
  def bootstrapCi: Q = Q(
    "q138_bootstrap_ci",
    """WITH r AS (SELECT o_orderkey, o_totalprice, unnest(range(1, 101)) AS b FROM orders),
      |w AS (SELECT b, o_totalprice,
      |    CASE
      |      WHEN u < CAST(0.367879441 AS DOUBLE) THEN 0
      |      WHEN u < CAST(0.735758882 AS DOUBLE) THEN 1
      |      WHEN u < CAST(0.919698603 AS DOUBLE) THEN 2
      |      WHEN u < CAST(0.981011843 AS DOUBLE) THEN 3
      |      WHEN u < CAST(0.996340153 AS DOUBLE) THEN 4
      |      ELSE 5 END AS wt
      |  FROM (SELECT b, o_totalprice,
      |      ((((o_orderkey + b * 7919) % 1000003) * 2654435761 + 42) % 1000003 + 0.5)
      |        / 1000003.0 AS u
      |    FROM r)),
      |m AS (SELECT b,
      |    CAST(sum(CAST(wt * o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |      / sum(wt) AS mean_b
      |  FROM w GROUP BY b),
      |full_m AS (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    / count(*) AS mean_full FROM orders)
      |SELECT CAST(count(*) AS BIGINT) AS n_replicates,
      |  round(max(f.mean_full), 4) AS mean_full,
      |  round(quantile_cont(mean_b, 0.025), 4) AS boot_lo95,
      |  round(quantile_cont(mean_b, 0.975), 4) AS boot_hi95
      |FROM m, full_m f""".stripMargin,
  ) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    val key = (pmod((col("o_orderkey") + col("b") * lit(7919L)), lit(1000003L))
      * lit(2654435761L) + lit(42L))
    val u = (pmod(key, lit(1000003L)).cast("double") + lit(0.5)) / lit(1000003.0)
    val wt = when(u < lit(0.367879441), lit(0))
      .when(u < lit(0.735758882), lit(1))
      .when(u < lit(0.919698603), lit(2))
      .when(u < lit(0.981011843), lit(3))
      .when(u < lit(0.996340153), lit(4))
      .otherwise(lit(5))
    // integer-cents rewrite of dsum(wt·price): the DECIMAL(18,2) cast
    // moves OUT of the ×100 explode (one cast per ORDER row, exact
    // long cents), so the 100×-exploded region does only long
    // arithmetic and the replicate sum is a plain long sum. The final
    // decimal division by 100 is exact (scale 6 ≥ 2, terminating), so
    // mean_b is the same rational — hence the same double — as the
    // per-exploded-row decimal sum it replaces; the DuckDB oracle is
    // untouched. Headroom: Σ cents·wt ≤ 5·Σ cents — a corpus would
    // need ~10^17 dollars of orders to threaten the long. Measured
    // 6.6 s → 3.4 s at sf0.1 same-window (guide §2.3: shuffle/compute
    // narrower types; §1.2 step 2).
    val m = orders
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        explode(sequence(lit(1L), lit(100L))).as("b"))
      .select(col("b"), col("cents"), wt.as("wt"))
      .groupBy("b")
      .agg(((sum(col("cents") * col("wt")).cast("decimal(36,0)") / lit(100))
        .cast("double") / sum(col("wt"))).as("mean_b"))
    val fullM = orders.agg(
      (dsum(col("o_totalprice")) / count(lit(1))).as("mean_full"))
    m.crossJoin(broadcast(fullM)) // 1-row scalar broadcast
      .agg(count(lit(1)).as("n_replicates"),
        round(max(col("mean_full")), 4).as("mean_full"),
        round(expr("percentile(mean_b, 0.025)"), 4).as("boot_lo95"),
        round(expr("percentile(mean_b, 0.975)"), 4).as("boot_hi95"))
  }

  // One unrolled gradient-descent iteration of the q133/q137 oracle:
  // the sigmoid fold order, 9-dp rounding, DECIMAL(18,9) gradient
  // sums, and w − lr·(g/n) update mirror graft.ml.LogRegLite term for
  // term. `lr` is spliced as a literal so both engines parse the same
  // decimal string.
  private def lrIterSql(k: Int, prevW: String, lr: String = "0.5"): String =
    s"""s$k AS (SELECT f.*, round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) +
       |    exp(-((((w.b0 + f.x1 * w.b1) + f.x2 * w.b2) + f.x3 * w.b3)))), 9) AS s
       |  FROM f, $prevW w),
       |g$k AS (SELECT
       |    CAST(sum(CAST(round(s - y, 9) AS DECIMAL(18,9))) AS DOUBLE) AS g0,
       |    CAST(sum(CAST(round(x1 * (s - y), 9) AS DECIMAL(18,9))) AS DOUBLE) AS g1,
       |    CAST(sum(CAST(round(x2 * (s - y), 9) AS DECIMAL(18,9))) AS DOUBLE) AS g2,
       |    CAST(sum(CAST(round(x3 * (s - y), 9) AS DECIMAL(18,9))) AS DOUBLE) AS g3,
       |    CAST(count(*) AS DOUBLE) AS n FROM s$k),
       |w$k AS (SELECT w.b0 - CAST($lr AS DOUBLE) * (g.g0 / g.n) AS b0,
       |    w.b1 - CAST($lr AS DOUBLE) * (g.g1 / g.n) AS b1,
       |    w.b2 - CAST($lr AS DOUBLE) * (g.g2 / g.n) AS b2,
       |    w.b3 - CAST($lr AS DOUBLE) * (g.g3 / g.n) AS b3 FROM g$k g, $prevW w)""".stripMargin

  // Shared q133/q137 feature block: O(1)-scaled per-doc statistics +
  // a 0/1 label, identical arithmetic in both engines. q133 trains on
  // the lang='en' label (near-zero text signal in this corpus — the
  // classifier correctly converges to the base rate); q137's
  // calibration readout instead uses a learnable long-doc proxy label
  // so the scores span the probability axis and the diagram has bins
  // to show.
  private def lrFeatSql(labelSql: String): String =
    s"""f AS (SELECT doc_id,
      |    CAST(n_chars AS DOUBLE) / CAST(400 AS DOUBLE) AS x1,
      |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE)
      |      / CAST(100 AS DOUBLE) AS x2,
      |    CAST(n_chars AS DOUBLE) /
      |      (CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE)
      |       * CAST(10 AS DOUBLE)) AS x3,
      |    CAST(CASE WHEN $labelSql THEN 1 ELSE 0 END AS DOUBLE) AS y
      |  FROM documents),
      |w0 AS (SELECT CAST(0 AS DOUBLE) AS b0, CAST(0 AS DOUBLE) AS b1,
      |       CAST(0 AS DOUBLE) AS b2, CAST(0 AS DOUBLE) AS b3)""".stripMargin

  private def lrFeatures(s: org.apache.spark.sql.SparkSession, dir: String,
      label: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    def tokd = (length(col("text")) - length(expr("replace(text, ' ', '')")) + lit(1))
      .cast("double")
    Tables.documents(s, dir).select(
      col("doc_id"),
      (col("n_chars").cast("double") / lit(400.0)).as("x1"),
      (tokd / lit(100.0)).as("x2"),
      (col("n_chars").cast("double") / (tokd * lit(10.0))).as("x3"),
      when(label, lit(1)).otherwise(lit(0)).cast("double").as("y"))
  }

  // --- q133: linear quality classifier (from-scratch logistic regression) --
  // The CCNet/fastText-shaped curation move: train a cheap linear
  // classifier on per-doc statistics, score the corpus, keep the high
  // end. Trainer is `ml.LogRegLite` — full-batch GD where each
  // iteration is ONE map-side-combined aggregation of d+1 exact
  // DECIMAL(18,9) gradient sums (only d+2 scalars ever reach the
  // driver), weights ride back in as literals, serving is a map-only
  // scan+project. Because the per-row gradient terms round to 9 dp
  // before the decimal cast, training is bit-reproducible across
  // partitionings AND expressible in ANSI SQL — the oracle replays
  // all 3 iterations as chained 1-row CTEs and hash-checks the scored
  // output, so the entire training trajectory is driver-verified.
  // Features: chars/400, tokens/100, mean word length/10 (O(1)-scaled);
  // label: lang = 'en'.
  def qualityClassifier: Q = Q(
    "q133_quality_classifier",
    s"""WITH ${lrFeatSql("lang = 'en'")},
      |${lrIterSql(1, "w0")},
      |${lrIterSql(2, "w1")},
      |${lrIterSql(3, "w2")},
      |sc AS (SELECT f.doc_id, f.y, round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) +
      |    exp(-((((w.b0 + f.x1 * w.b1) + f.x2 * w.b2) + f.x3 * w.b3)))), 9) AS s
      |  FROM f, w3 w)
      |SELECT doc_id, y AS label, round(s, 6) AS score
      |FROM sc ORDER BY s DESC, doc_id LIMIT 15""".stripMargin,
  ) { (s, dir) =>
    val f = lrFeatures(s, dir, col("lang") === "en")
    val feat = Seq("x1", "x2", "x3")
    val m = graft.ml.LogRegLite.train(f, feat, "y", iters = 3, lr = 0.5)
    graft.ml.LogRegLite.score(f, feat, m.weights.toSeq, "s")
      .orderBy(col("s").desc, col("doc_id")).limit(15)
      .select(col("doc_id"), col("y").as("label"), round(col("s"), 6).as("score"))
  }

  // --- q137: classifier calibration (reliability diagram) ------------------
  // The eval half of q133: bin the scored corpus into 10 score
  // deciles and compare mean predicted probability against the
  // empirical positive rate per bin — the standard calibration
  // readout before a classifier's scores become sampling weights.
  // Trains on the LEARNABLE long-doc proxy label (n_chars > 280; the
  // q133 lang label has ~no text signal in this corpus, so its scores
  // collapse to the base rate and the diagram would be one bin) for
  // 10 iterations at lr 2 — scores span ~7 deciles. One scan of the
  // scored docs, one ≤10-group aggregate; score and label sums are
  // DECIMAL-exact. The oracle replays all 10 training iterations as
  // unrolled CTEs, then the binning — eval verified against the same
  // trajectory.
  def calibration: Q = Q(
    "q137_calibration",
    s"""WITH ${lrFeatSql("n_chars > 280")},
      |${(1 to 10).map(k => lrIterSql(k, s"w${k - 1}", "2")).mkString(",\n")},
      |sc AS (SELECT f.doc_id, f.y, round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) +
      |    exp(-((((w.b0 + f.x1 * w.b1) + f.x2 * w.b2) + f.x3 * w.b3)))), 9) AS s
      |  FROM f, w10 w),
      |b AS (SELECT CAST(least(floor(s * CAST(10 AS DOUBLE)), 9) AS INT) AS bin, y, s
      |      FROM sc)
      |SELECT bin, CAST(count(*) AS BIGINT) AS n,
      |  round(CAST(sum(CAST(s AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6) AS avg_score,
      |  round(CAST(sum(CAST(y AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6) AS pos_rate
      |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
  ) { (s, dir) =>
    val f = lrFeatures(s, dir, col("n_chars") > 280)
    val feat = Seq("x1", "x2", "x3")
    val m = graft.ml.LogRegLite.train(f, feat, "y", iters = 10, lr = 2.0)
    graft.ml.LogRegLite.score(f, feat, m.weights.toSeq, "s")
      .select(least(floor(col("s") * lit(10.0)), lit(9)).cast("int").as("bin"),
        col("y"), col("s"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(dsum(col("s"), 9) / count(lit(1)), 6).as("avg_score"),
        round(dsum(col("y"), 9) / count(lit(1)), 6).as("pos_rate"))
      .orderBy("bin")
  }

  // --- q128: robust outlier detection (median/MAD) -------------------------
  // q52's z-score breaks when the contamination it hunts inflates the
  // mean/stddev it thresholds on; the robust twin uses median and MAD
  // (both exact interpolated percentiles, the q11 idiom — breakdown
  // point 50%). Shape: one grouped-percentile scan for medians, one
  // scan joined against the broadcast medians to build the persisted
  // absolute-deviation projection, which then feeds BOTH the MAD
  // percentile and the outlier count — two scans of the fact table
  // total, everything after keyed on the (tiny) group key.
  def robustOutliers: Q = Q(
    "q128_robust_outliers",
    """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
      |            FROM events GROUP BY event_type),
      |b AS (SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS absdev
      |      FROM events e JOIN med m USING (event_type)),
      |mad AS (SELECT event_type, quantile_cont(absdev, 0.5) AS mad
      |        FROM b GROUP BY event_type)
      |SELECT b.event_type, round(max(b.med), 6) AS med, round(max(m.mad), 6) AS mad,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(*) FILTER (WHERE b.absdev > 3 * CAST(1.4826 AS DOUBLE) * m.mad)
      |       AS BIGINT) AS n_outliers
      |FROM b JOIN mad m USING (event_type)
      |GROUP BY b.event_type ORDER BY b.event_type""".stripMargin,
  ) { (s, dir) =>
    val events = Tables.events(s, dir)
    val med = events.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val b = graft.dedup.Dedup.persistTracked(
      events.join(broadcast(med), "event_type")
        .select(col("event_type"), col("value"), col("med"),
          abs(col("value") - col("med")).as("absdev")))
    val mad = b.groupBy("event_type")
      .agg(expr("percentile(absdev, 0.5)").as("mad"))
    b.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(round(max(col("med")), 6).as("med"),
        round(max(col("mad")), 6).as("mad"),
        count(lit(1)).as("n"),
        count(when(col("absdev") > lit(3) * lit(1.4826) * col("mad"), lit(1)))
          .as("n_outliers"))
      .orderBy("event_type")
  }

  // --- q129: CUPED variance-reduced experiment readout ---------------------
  // The A/B-testing workhorse: adjust each user's experiment-period
  // metric by their PRE-period activity (y − θ·(x − x̄), θ = cov/var
  // from pooled pre/post moments) so user-level variance the
  // experiment didn't cause cancels out. ONE scan of events builds the
  // per-user (x, y) table by conditional aggregation; θ and x̄ are a
  // 1-row broadcast; per-variant means come off the same user table.
  // All sums DECIMAL (the q52 moments idiom) — θ is a deterministic
  // function of exact sums.
  def cuped: Q = Q(
    "q129_cuped",
    """WITH u AS (
      |  SELECT user_id, user_id % 2 AS variant,
      |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS x,
      |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS y
      |  FROM events GROUP BY user_id),
      |uu AS (SELECT user_id, variant, coalesce(x, 0.0) AS x, coalesce(y, 0.0) AS y FROM u),
      |g AS (SELECT count(*) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(x * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS sxx
      |  FROM uu),
      |t AS (SELECT n, sx / n AS xbar,
      |    (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta FROM g)
      |SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
      |  round(CAST(sum(CAST(y AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS mean_y,
      |  round(CAST(sum(CAST(y - t.theta * (x - t.xbar) AS DECIMAL(24,6))) AS DOUBLE)
      |        / count(*), 6) AS mean_y_cuped,
      |  round(max(t.theta), 6) AS theta
      |FROM uu, t GROUP BY variant ORDER BY variant""".stripMargin,
  ) { (s, dir) =>
    val cut = lit("2024-01-16").cast("timestamp")
    val u = graft.dedup.Dedup.persistTracked(
      Tables.events(s, dir).groupBy("user_id")
        .agg(
          coalesce(sum(when(col("ts") < cut, col("value").cast("decimal(18,2)")))
            .cast("double"), lit(0.0)).as("x"),
          coalesce(sum(when(col("ts") >= cut, col("value").cast("decimal(18,2)")))
            .cast("double"), lit(0.0)).as("y"))
        .select(col("user_id"), pmod(col("user_id"), lit(2)).as("variant"),
          col("x"), col("y")))
    val t = graft.ml.Stats.cupedTheta(u, "x", "y")
    u.crossJoin(broadcast(t))
      .groupBy("variant")
      .agg(count(lit(1)).as("n_users"),
        round(dsum(col("y")) / count(lit(1)), 6).as("mean_y"),
        round(sum((col("y") - col("theta") * (col("x") - col("xbar")))
          .cast("decimal(24,6)")).cast("double") / count(lit(1)), 6).as("mean_y_cuped"),
        round(max(col("theta")), 6).as("theta"))
      .orderBy("variant")
  }

  // --- q116: chi-square contingency cells (independence diagnostic) ---------
  // event_type × day-of-week contingency table with expected counts
  // and per-cell chi-square contributions — is traffic mix independent
  // of weekday? Emitting CELLS, not the summed statistic, keeps every
  // output value a deterministic function of exact integers (a summed
  // χ² would be an order-sensitive double reduction); the spec sums
  // cells driver-side where order is fixed. Marginals are two tiny
  // broadcast aggregates off one shared hourly base — never a second
  // scan of raw events.
  def chiSquare: Q = Q(
    "q116_chi_square",
    """WITH obs AS (
      |  -- +1 aligns DuckDB's Sunday=0 with Spark dayofweek's Sunday=1
      |  SELECT event_type, dayofweek(ts) + 1 AS dow, count(*) AS o
      |  FROM events GROUP BY 1, 2),
      |rowt AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt FROM obs GROUP BY 1),
      |colt AS (SELECT dow, CAST(sum(o) AS BIGINT) AS ct FROM obs GROUP BY 1),
      |tot AS (SELECT CAST(sum(o) AS BIGINT) AS t FROM obs)
      |SELECT o.event_type, CAST(o.dow AS BIGINT) AS dow, CAST(o.o AS BIGINT) AS o,
      |  round(CAST(rt AS DOUBLE) * ct / t, 6) AS expected,
      |  round(pow(o.o - CAST(rt AS DOUBLE) * ct / t, 2) / (CAST(rt AS DOUBLE) * ct / t), 6)
      |    AS cell_chi2
      |FROM obs o JOIN rowt USING (event_type) JOIN colt USING (dow) CROSS JOIN tot
      |ORDER BY event_type, dow""".stripMargin,
  ) { (s, dir) =>
    graft.ml.Stats.chiSquareCells(
      Tables.events(s, dir)
        .select(col("event_type"), dayofweek(col("ts")).cast("long").as("dow")),
      "event_type", "dow")
      .orderBy("event_type", "dow")
  }

  // --- q119: exact AUC via distributed rank sums ------------------------------
  // Mann-Whitney AUC of event value separating errors from the rest,
  // WITHOUT a global sort: scores bucket into 256 coarse bins (scalar
  // bounds broadcast), the below-count for each distinct score is
  // coarse-bin prefix (a ≤256-row window) + within-bin prefix (a
  // partitioned window) — the classic two-level distributed prefix
  // sum. Doubling the tie term (2U = Σ ca·(2·below + cb)) keeps EVERY
  // intermediate an exact integer; the single double division happens
  // once at the end. Equivalent single-machine form: rank-sum AUC with
  // average-rank tie correction.
  def aucMannWhitney: Q = Q(
    "q119_auc",
    """WITH src AS (
      |  SELECT value AS v, CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM src),
      |pv AS (
      |  SELECT CAST(least(floor((v - lo) / ((hi - lo) / 256.0)), 255) AS BIGINT) AS g, v,
      |    CAST(sum(y) AS BIGINT) AS ca, CAST(sum(1 - y) AS BIGINT) AS cb
      |  FROM src CROSS JOIN bounds GROUP BY 1, 2),
      |bin AS (SELECT g, CAST(sum(cb) AS BIGINT) AS cbg FROM pv GROUP BY 1),
      |binpfx AS (
      |  SELECT g, CAST(coalesce(sum(cbg) OVER (ORDER BY g
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb_bins_below
      |  FROM bin),
      |fine AS (
      |  SELECT g, v, ca, cb,
      |    CAST(coalesce(sum(cb) OVER (PARTITION BY g ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb_in_bin_below
      |  FROM pv),
      |u AS (
      |  SELECT CAST(sum(ca) AS BIGINT) AS n_pos, CAST(sum(cb) AS BIGINT) AS n_neg,
      |    CAST(sum(ca * (2 * (cb_bins_below + cb_in_bin_below) + cb)) AS BIGINT) AS u2
      |  FROM fine JOIN binpfx USING (g))
      |SELECT n_pos, n_neg,
      |  round(CAST(u2 AS DOUBLE) / (2.0 * n_pos * n_neg), 6) AS auc
      |FROM u""".stripMargin,
  ) { (s, dir) =>
    graft.ml.Stats.aucBinned(
      Tables.events(s, dir).select(col("value").as("v"),
        when(col("event_type") === "error", 1).otherwise(0).as("y")),
      "v", "y", bins = 256)
  }

  // --- q107: two-sample KS drift statistic (binned ECDF) --------------------
  // Distribution drift between two order periods as the Kolmogorov-
  // Smirnov sup-distance over a 200-bin equi-width ECDF. Binning first
  // is the scale move: exact KS needs a global sort of every distinct
  // value (one fat partition at 100 TB); the binned form shuffles only
  // (bin, count_a, count_b) rows, and the cumulative window runs over
  // ≤ 200 rows. Resolution cost is bounded by 1/nbins per bin edge;
  // counts stay exact, so the statistic is engine-reproducible (the
  // only doubles are two divisions of exact integers). Totals arrive
  // via broadcast scalars, not whole-partition windows.
  def ksDrift: Q = Q(
    "q107_ks_drift",
    """WITH src AS (
      |  SELECT o_totalprice AS v,
      |    CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS is_a
      |  FROM orders),
      |bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM src),
      |binned AS (
      |  SELECT CAST(least(floor((v - lo) / ((hi - lo) / 200.0)), 199) AS BIGINT) AS bin,
      |    CAST(sum(is_a) AS BIGINT) AS ca, CAST(sum(1 - is_a) AS BIGINT) AS cb
      |  FROM src CROSS JOIN bounds GROUP BY 1),
      |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM binned),
      |cum AS (
      |  SELECT
      |    sum(ca) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
      |    sum(cb) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
      |  FROM binned)
      |SELECT n_a, n_b,
      |  round(max(abs(CAST(cum_a AS DOUBLE) / n_a - CAST(cum_b AS DOUBLE) / n_b)), 6) AS ks_stat
      |FROM cum CROSS JOIN tot GROUP BY n_a, n_b""".stripMargin,
  ) { (s, dir) =>
    graft.ml.Stats.ksBinned(
      Tables.orders(s, dir).select(col("o_totalprice").as("v"),
        when(col("o_orderdate") < lit("1998-01-01").cast("timestamp"), 1).otherwise(0).as("is_a")),
      "v", "is_a", bins = 200)
  }

  // --- z-score anomaly flags (per-group moments via exact decimal sums) ---
  // Deterministic across engines: variance from Σv and Σv² (decimal-
  // exact), not a streaming stddev whose accumulation order differs.
  def zscoreAnomaly: Q = Q(
    "q52_zscore_anomaly",
    """WITH m AS (
      |  SELECT event_type,
      |    count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
      |    CAST(sum(CAST(value * value AS DECIMAL(24,4))) AS DOUBLE) AS sq
      |  FROM events GROUP BY event_type)
      |SELECT e.event_id,
      |  CASE WHEN m.n > 1 AND (m.sq - m.s * m.s / m.n) > 0
      |            AND abs((e.value - m.s / m.n) / sqrt((m.sq - m.s * m.s / m.n) / (m.n - 1))) > 3
      |       THEN 1 ELSE 0 END AS is_anomaly
      |FROM events e JOIN m ON e.event_type = m.event_type
      |ORDER BY e.event_id""".stripMargin,
  ) { (s, dir) =>
    val events = Tables.events(s, dir)
    val m = events.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      dsum(col("value")).as("s"),
      sum((col("value") * col("value")).cast("decimal(24,4)")).cast("double").as("sq"))
    // degenerate groups (single row / zero variance) would divide 0/0:
    // Spark's NaN compares greater-than-anything while DuckDB yields
    // NULL→0 — guard both engines to a deterministic 0
    events.join(broadcast(m), "event_type")
      .select(col("event_id"),
        when(col("n") > 1 && (col("sq") - col("s") * col("s") / col("n")) > 0
          && abs((col("value") - col("s") / col("n"))
            / sqrt((col("sq") - col("s") * col("s") / col("n")) / (col("n") - 1))) > 3, 1)
          .otherwise(0).as("is_anomaly"))
      .orderBy("event_id")
  }

  // --- isolation-forest anomaly scores (trained-literal oracle) -----------
  // The forest's split points come from seeded random subsampling at
  // fit time — no SQL engine can re-derive TRAINING (spec-gated:
  // MlPipelineSpec pins determinism, score bounds, planted-outlier
  // detection). But SCORING given the trees is deterministic, so the
  // q61/q94/q141 trained-literal pattern applies: each tree embeds as
  // a CASE cascade with precomputed path-length literals and DuckDB
  // independently replays feature build → per-tree path selection →
  // the contamination cut (in mean-path space — see
  // IsolationForestLite.servingSql for the rank-equivalence argument
  // that keeps pow out of the cross-engine surface).
  // The supervised-demo ground truth: the synthetic generator's
  // lineitem columns are MUTUALLY INDEPENDENT (corr(qty, price) ≈
  // 0.003; every per-feature positive rate is flat — measured, not
  // assumed), so no natural label in the corpus is learnable and a
  // trainer demo on one degenerates to predicting the base rate.
  // q337/q349 therefore CONSTRUCT their target the way the fixture
  // suites do, with the q34 seeded-keyed-noise discipline: y = 1 iff
  // l_quantity + u·25 > 37.5, u = keyed-uniform(orderkey, linenumber)
  // ∈ [−0.5, 0.5) — a noisy quantity threshold that ramps P(y|qty)
  // from ~0 to ~1 across the qty range. Learnable by the quantity
  // stumps, irreducibly noisy (no stump grid reaches 100%), and a
  // pure function of row keys, so DuckDB replays the label exactly.
  private def noisyQtyLabel: org.apache.spark.sql.Column = {
    val key = pmod(col("l_orderkey") * 64 + col("l_linenumber"), lit(1000003L))
    val u = (pmod(key * 2654435761L + 42, lit(1000003L)).cast("double") + 0.5) /
      1000003.0 - 0.5
    col("l_quantity") + u * 25 > 37.5
  }

  private def noisyQtyLabelSql: String =
    "(l_quantity + ((((l_orderkey * 64 + l_linenumber) % 1000003" +
      " * 2654435761 + 42) % 1000003 + 0.5) / 1000003.0 - 0.5) * 25 > 37.5)"

  // q337 (4 rounds) and q349 (5) train the SAME greedy stump sequence:
  // AdaBoost is prefix-stable (round t depends only on rounds < t), so
  // ONE 5-round train serves both — q337 reads the 4-round prefix.
  // Training separately cost ~8 s/bench-run of duplicated aggregates
  // (the r10 verdict's top perf item). Memoized per (session, labeled
  // corpus plan) and dropped by Dedup.clearCaches, so a bench pass
  // never reuses the previous pass's training — cross-query reuse
  // WITHIN a pass is by design, cross-pass would hide plan cost.
  private val boostGrid = Seq(
    "l_quantity" -> Seq(10.0, 20.0, 30.0, 40.0),
    "l_discount" -> Seq(0.02, 0.05, 0.08),
    "l_tax" -> Seq(0.03, 0.06))
  // The memo key is a 32-bit semanticHash — the stored analyzed plan +
  // sameResult check below is the collision guard (same discipline as
  // Dedup.track): without it a hash collision between two different
  // labeled corpora would silently serve a model trained on the wrong
  // data, and the dynamic oracle would replay the same wrong weights.
  private val boostMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, Int),
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      graft.ml.BoostLite.BoostResult)]()
  graft.dedup.Dedup.onClearCaches(() => boostMemo.clear())

  private def sharedBoostModel(labeled: org.apache.spark.sql.DataFrame)
      : graft.ml.BoostLite.BoostResult = {
    val plan = labeled.queryExecution.analyzed
    boostMemo.compute(
      (labeled.sparkSession, plan.semanticHash()),
      (_, prev) =>
        if (prev != null && prev._1.sameResult(plan)) prev
        else (plan, graft.ml.BoostLite.train(labeled, boostGrid, "__lbl", rounds = 5))
    )._2
  }

  // --- q337: AdaBoost decision stumps (from-scratch boosting) ---------------
  // The boosting member of the trainer family (next to RF, isolation
  // forest, logistic regression, k-means, ALS): 4 rounds of discrete
  // AdaBoost over a curated stump grid on lineitem, predicting the
  // constructed noisy-quantity target (see noisyQtyLabel above — the
  // quantity stumps genuinely cut, discount/tax are noise controls
  // the argmin must reject). Training is one wide
  // conditional-sum aggregate per round (ml.BoostLite — the driver
  // sees |candidates|+1 decimals, picks the argmin, ships two exp
  // literals back); weights re-round to 12 dp per update so every sum
  // is associative-exact and the trained stumps are partitioning-
  // independent (RoundTenOpsSpec). Oracle (the q53 trained-literal
  // pattern): the stumps replay as CASE chains in DuckDB — the same
  // left-associated ±alpha fold, the same 9 dp margin rounding — so
  // the confusion matrix and mean margins hash-match exactly; the
  // training math itself stays spec-gated like every trainer.
  def adaboostStumps: Q = Q.dynamicOracle("q337_adaboost_stumps") { (s, dir) =>
    import graft.ml.BoostLite
    val li = Tables.lineitem(s, dir)
    // 4-round prefix of the shared 5-round train (see sharedBoostModel)
    val full = sharedBoostModel(li.withColumn("__lbl", noisyQtyLabel.cast("int")))
    val model = BoostLite.BoostResult(full.stumps.take(4), full.errors.take(4))
    val df = li
      .select(noisyQtyLabel.as("label"),
        BoostLite.score(model.stumps).as("score"))
      .groupBy(col("label"), (col("score") > 0).as("pred"))
      .agg(count(lit(1)).as("n"),
        znorm(round(dsum(col("score"), 9) / count(lit(1)), 6)).as("avg_score"))
      .orderBy("label", "pred")
    val terms = model.stumps.map { st =>
      val a = if (st.flip) -st.alpha else st.alpha
      s"(CASE WHEN ${st.feature} <= ${st.thr} THEN $a ELSE ${-a} END)"
    }.mkString(" + ")
    val sql =
      s"""WITH scored AS (SELECT $noisyQtyLabelSql AS label,
         |    round($terms, 9) AS score FROM lineitem)
         |SELECT label, score > 0 AS pred, CAST(count(*) AS BIGINT) AS n,
         |  round(CAST(sum(CAST(score AS DECIMAL(18,9))) AS DOUBLE)
         |    / count(*), 6) + 0.0 AS avg_score
         |FROM scored GROUP BY 1, 2 ORDER BY label, pred""".stripMargin
    (df, sql)
  }

  // --- q349: Platt scaling (margin calibration) ------------------------------
  // Boosting margins (q337) rank well but are not probabilities; the
  // standard fix since Platt 1999 is a 1-d logistic MLE p = σ(a·m + b)
  // on the margins. The scale insight that makes this CHEAP: a
  // T-round stump ensemble emits ≤ 2^T distinct margins, so the exact
  // full-data likelihood lives on the (margin → n, positives)
  // histogram — ONE corpus aggregate into a ≤ 2^T-row table, then
  // driver-side Newton-Raphson on those bounded sufficient statistics
  // (the q219 Bradley-Terry shape: corpus-scale work in one pass,
  // model arithmetic on a players-bounded matrix). A first cut ran
  // 40 row-level GD iterations instead — 40 full scans, 103 s at
  // sf0.1, and it still under/over-shot because one learning rate
  // can't serve intercept and slope gradients of different scales;
  // Newton on the histogram is exact, deterministic (sorted fold
  // order, pure IEEE), and free. Output: the reliability table
  // (decile bins of calibrated p: count, mean predicted p, empirical
  // positive rate — mean-p/rate ship UNROUNDED, exact divisions of
  // identical values, since rounding would sit on the q310
  // terminating-decimal boundary). Training stays spec-gated; the
  // oracle replays the ENTIRE serving path from literals — stump CASE
  // chains → margin → σ(b + a·m) at 9 dp → decile bins → stats.
  def plattScaling: Q = Q.dynamicOracle("q349_platt_scaling") { (s, dir) =>
    import graft.ml.BoostLite
    val li = Tables.lineitem(s, dir)
    val labeled = li.withColumn("__lbl", noisyQtyLabel.cast("int"))
    val model = sharedBoostModel(labeled)
    val margins = labeled
      .select(col("__lbl").cast("long").as("y"), BoostLite.score(model.stumps).as("m"))
    // exact sufficient statistics: ≤ 2^rounds rows — a bounded collect
    val hist = margins.groupBy("m")
      .agg(count(lit(1)).as("n"), sum("y").as("pos"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1) // fixed fold order → deterministic Newton
    require(hist.length <= 256,
      s"platt: ${hist.length} distinct margins exceed the driver histogram budget")
    var b = 0.0; var a = 0.0
    for (_ <- 1 to 25) { // Newton-Raphson, quadratic convergence
      var g0 = 0.0; var g1 = 0.0; var h00 = 0.0; var h01 = 0.0; var h11 = 0.0
      for ((m, n, pos) <- hist) {
        val p = 1.0 / (1.0 + math.exp(-(b + a * m)))
        val r = n * p - pos
        val w = n * p * (1.0 - p)
        g0 += r; g1 += m * r
        h00 += w; h01 += m * w; h11 += m * m * w
      }
      val det = h00 * h11 - h01 * h01
      if (det > 1e-12) {
        b -= (h11 * g0 - h01 * g1) / det
        a -= (h00 * g1 - h01 * g0) / det
      }
    }
    val p = round(lit(1.0) / (lit(1.0) + exp(-(lit(b) + col("m") * lit(a)))), 9)
    val df = margins.select(col("y"), p.as("p"))
      .groupBy(floor(col("p") * 10).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        (dsum(col("p"), 9) / count(lit(1))).as("mean_p"),
        (sum(col("y")).cast("double") / count(lit(1))).as("pos_rate"))
      .orderBy("bin")
    val terms = model.stumps.map { st =>
      val av = if (st.flip) -st.alpha else st.alpha
      s"(CASE WHEN ${st.feature} <= ${st.thr} THEN $av ELSE ${-av} END)"
    }.mkString(" + ")
    val sql =
      s"""WITH sc AS (SELECT CAST($noisyQtyLabelSql AS INTEGER) AS y,
         |    round($terms, 9) AS m FROM lineitem),
         |pp AS (SELECT y,
         |    round(CAST(1 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(-($b + m * $a))), 9)
         |      AS p FROM sc)
         |SELECT CAST(floor(p * 10) AS BIGINT) AS bin,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(p AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS mean_p,
         |  CAST(sum(y) AS DOUBLE) / count(*) AS pos_rate
         |FROM pp GROUP BY 1 ORDER BY bin""".stripMargin
    (df, sql)
  }

  // --- q352: Fellegi–Sunter probabilistic record linkage ----------------------
  // The entity-resolution member of the trainer family: q102's edit
  // distance measures string similarity, but production linkage
  // (Fellegi & Sunter 1969) is a latent-class model — per-field
  // agreement probabilities m (among true matches) and u (among
  // non-matches) estimated by EM, pairs scored by Σ log(m/u) over the
  // agreement vector. Ground truth is CONSTRUCTED the q337 way: the
  // "dirty" side is the customer table itself with fields perturbed by
  // keyed-uniform coin flips (name last-char swap at 30%, balance +7
  // at 30%, segment wiped at 20% — pure functions of c_custkey, so
  // DuckDB replays the corruption exactly), and truth = key equality.
  // Scale shape: candidate pairs come from a keyed BLOCK join
  // (nationkey × coarse balance band — never all-pairs; block keys are
  // a caller choice at 100 TB), the 2³-pattern histogram is one
  // map-side-combined aggregate, EM runs driver-side on those ≤8
  // sufficient-statistic rows (the q349 Newton shape: corpus work is
  // one join + one aggregate, model math is bounded), and the oracle
  // replays blocking, corruption, patterns, and the trained weights as
  // literals. n_true rides along as the honesty column — the EM's
  // classification quality is visible per pattern, not asserted.
  def fellegiSunter: Q = Q.dynamicOracle("q352_fellegi_sunter") { (s, dir) =>
    val P = 1000003L
    // keyed uniforms with a DISTINCT multiplier per coin: an additive
    // salt (even fed through a second mod stage) only shifts the same
    // linear congruence, so u(k,11)/u(k,22)/u(k,33) stay affinely
    // dependent and the corruption coins fire in lockstep — both forms
    // were measured to produce degenerate agreement-pattern tables.
    // Distinct multipliers decorrelate: P(bal kept | name kept) ≈ 0.714
    // vs the 0.7 marginal on this corpus.
    val mult = Map(11 -> 2654435761L, 22 -> 2246822519L, 33 -> 3266489917L)
    def u(salt: Int) =
      (pmod(col("c_custkey") * mult(salt) + salt, lit(P)).cast("double") + 0.5) / P.toDouble
    def uSql(salt: Int) =
      s"((c_custkey * ${mult(salt)} + $salt) % $P + 0.5) / $P.0"
    val cust = Tables.customer(s, dir)
    val clean = cust.select(col("c_custkey").as("lk"), col("c_name").as("lname"),
      floor(col("c_acctbal")).cast("long").as("lbal"), col("c_mktsegment").as("lseg"),
      col("c_nationkey").as("nation"),
      floor(floor(col("c_acctbal")).cast("double") / 2000.0).cast("long").as("band"))
    val dirty = cust.select(col("c_custkey").as("rk"),
      when(u(11) < 0.3,
        concat(expr("substring(c_name, 1, length(c_name) - 1)"), lit("X")))
        .otherwise(col("c_name")).as("rname"),
      (floor(col("c_acctbal")).cast("long")
        + when(u(22) < 0.3, 7L).otherwise(0L)).as("rbal"),
      when(u(33) < 0.2, lit("UNKNOWN")).otherwise(col("c_mktsegment")).as("rseg"),
      col("c_nationkey").as("nation"))
      .withColumn("band", floor(col("rbal").cast("double") / 2000.0).cast("long"))
    // persistTracked: pats feeds the EM fit (collect below) AND the
    // output plan — without it the blocked pair join runs twice per
    // invocation (the r11 verdict's one perf finding)
    val pats = graft.dedup.Dedup.persistTracked(
      clean.join(dirty, Seq("nation", "band"))
        .select(
          when(col("lname") === col("rname"), 1).otherwise(0).as("a_name"),
          when(col("lbal") === col("rbal"), 1).otherwise(0).as("a_bal"),
          when(col("lseg") === col("rseg"), 1).otherwise(0).as("a_seg"),
          when(col("lk") === col("rk"), 1L).otherwise(0L).as("t"))
        .groupBy("a_name", "a_bal", "a_seg")
        .agg(count(lit(1)).as("n"), sum("t").as("n_true")))
    // ≤ 2³ sufficient-statistic rows — a require-guarded driver collect
    val hist = pats.collect()
      .map(r => (Array(r.getInt(0), r.getInt(1), r.getInt(2)), r.getLong(3), r.getLong(4)))
      .sortBy(x => (x._1(0), x._1(1), x._1(2))) // fixed fold order
    require(hist.length <= 8,
      s"fellegi-sunter: ${hist.length} agreement patterns exceed the 2^3 budget")
    // an empty corpus would make EM's first sw = 0, NaN-poison m/u/p,
    // and interpolate bare `NaN` literals into the oracle SQL (a DuckDB
    // parse error) — fail with the real diagnostic instead
    require(hist.nonEmpty,
      "fellegi-sunter: no candidate pairs (empty blocked join) — EM is undefined on a degenerate corpus")
    val F = 3
    val m = Array(0.8, 0.8, 0.8)
    val uu = Array(0.1, 0.1, 0.1)
    var p = 0.05
    def clamp(x: Double) = math.min(math.max(x, 1e-6), 1.0 - 1e-6)
    for (_ <- 1 to 30) { // EM on the pattern histogram — deterministic IEEE
      var sw = 0.0; var snw = 0.0
      val swj = new Array[Double](F); val snwj = new Array[Double](F)
      for ((g, n, _) <- hist) {
        var pm = p; var pu = 1.0 - p
        for (j <- 0 until F) {
          pm *= (if (g(j) == 1) m(j) else 1.0 - m(j))
          pu *= (if (g(j) == 1) uu(j) else 1.0 - uu(j))
        }
        val w = pm / (pm + pu)
        sw += n * w; snw += n * (1.0 - w)
        for (j <- 0 until F if g(j) == 1) { swj(j) += n * w; snwj(j) += n * (1.0 - w) }
      }
      for (j <- 0 until F) { m(j) = clamp(swj(j) / sw); uu(j) = clamp(snwj(j) / snw) }
      p = clamp(sw / (sw + snw))
    }
    // per-field log agreement/disagreement weights + the match
    // threshold ln((1−p)/p) (posterior > 0.5), all shipped as literals
    val lt = (0 until F).map(j => math.log(m(j) / uu(j)))
    val lf = (0 until F).map(j => math.log((1.0 - m(j)) / (1.0 - uu(j))))
    val thr = math.log((1.0 - p) / p)
    val gcols = Seq("a_name", "a_bal", "a_seg")
    val wexpr = (0 until F).map(j =>
      col(gcols(j)) * lit(lt(j)) + (lit(1) - col(gcols(j))) * lit(lf(j)))
      .reduce(_ + _)
    val df = pats
      .select(col("a_name"), col("a_bal"), col("a_seg"),
        col("n").as("n_pairs"), col("n_true"),
        znorm(round(wexpr, 6)).as("weight"),
        (round(wexpr, 6) > lit(thr)).as("is_match"))
      .orderBy("a_name", "a_bal", "a_seg")
    val wsql = (0 until F).map(j =>
      s"${gcols(j)} * (${lt(j)}) + (1 - ${gcols(j)}) * (${lf(j)})").mkString(" + ")
    val sql =
      s"""WITH clean AS (SELECT c_custkey AS lk, c_name AS lname,
         |    CAST(floor(c_acctbal) AS BIGINT) AS lbal, c_mktsegment AS lseg,
         |    c_nationkey AS nation,
         |    CAST(floor(CAST(floor(c_acctbal) AS BIGINT) / 2000.0) AS BIGINT) AS band
         |  FROM customer),
         |dirty AS (SELECT c_custkey AS rk,
         |    CASE WHEN ${uSql(11)} < 0.3
         |         THEN substring(c_name, 1, length(c_name) - 1) || 'X'
         |         ELSE c_name END AS rname,
         |    CAST(floor(c_acctbal) AS BIGINT)
         |      + CASE WHEN ${uSql(22)} < 0.3 THEN 7 ELSE 0 END AS rbal,
         |    CASE WHEN ${uSql(33)} < 0.2 THEN 'UNKNOWN' ELSE c_mktsegment END AS rseg,
         |    c_nationkey AS nation
         |  FROM customer),
         |pats AS (SELECT
         |    CASE WHEN lname = rname THEN 1 ELSE 0 END AS a_name,
         |    CASE WHEN lbal = rbal THEN 1 ELSE 0 END AS a_bal,
         |    CASE WHEN lseg = rseg THEN 1 ELSE 0 END AS a_seg,
         |    CASE WHEN lk = rk THEN 1 ELSE 0 END AS t
         |  FROM clean JOIN dirty
         |    ON clean.nation = dirty.nation
         |   AND clean.band = CAST(floor(rbal / 2000.0) AS BIGINT))
         |SELECT a_name, a_bal, a_seg, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(t) AS BIGINT) AS n_true,
         |  round($wsql, 6) + 0.0 AS weight,
         |  round($wsql, 6) > ($thr) AS is_match
         |FROM pats GROUP BY 1, 2, 3 ORDER BY a_name, a_bal, a_seg""".stripMargin
    (df, sql)
  }

  def iforestAnomaly: Q = Q.dynamicOracle("q53_iforest_anomaly") { (s, dir) =>
    val features = MlPipeline.buildFeatures(Tables.events(s, dir))
    val model = IsolationForestLite.fit(features, MlPipeline.FeatureCols, numTrees = 50)
    val df = IsolationForestLite.transform(features, model, MlPipeline.FeatureCols,
        contamination = 0.05)
      .filter(col("is_anomaly") === 1)
      .select("event_id", "is_anomaly")
      .orderBy("event_id")
    (df, IsolationForestLite.servingSql(model, contamination = 0.05))
  }

  // --- multimodal decode vs authored ground truth (sidecar oracle) ---------
  // The decode is REAL (PNG/BMP via ImageIO, WAV PCM via AudioSystem,
  // AVI/DIB via the from-scratch RIFF parser); what used to force
  // rows-only is that no SQL engine can decode media. The r8 verdict's
  // conversion: the fixture generator (tools/make_media_fixtures.py)
  // AUTHORS the expected decode results from the pixel/sample values
  // it chose — pure-Python struct+zlib encoders, zero shared code with
  // the JDK decoders — into a truth sidecar parquet; the oracle reads
  // the sidecar and the driver hash-compares. All four containers are
  // lossless, so equality is exact: width/height, duration, unit
  // count, luminance sum, and a 31-rolling hash of the entire decoded
  // byte stream. MultimodalSpec stays as the deeper pixel-exact gate
  // and keeps the synthetic-corpus (synthesize/extractFeatures) path
  // covered.
  def multimodalFeatures: Q = Q.dynamicOracle("q54_multimodal_features") { (s, dir) =>
    val fix = Multimodal.fixtureDir
    val stats = Multimodal.decodeStats(s.read.parquet(s"$fix/media.parquet"))
      .toDF().orderBy("media_id")
    (stats,
      s"""SELECT media_id, media_type, width, height, duration_ms,
         |  n_units, lum_sum, lum_hash
         |FROM read_parquet('$fix/truth.parquet') ORDER BY media_id""".stripMargin)
  }

  // --- q252: Mann–Whitney rank-sum drift test per source ---------------------
  // q107 (KS) asks whether a source's quality DISTRIBUTION differs;
  // q119 computes the AUC form of the U statistic on a binary label.
  // This is the inferential member: for each source, a tie-corrected
  // two-sided Mann–Whitney z against the rest of the corpus —
  // "is this crawl's quality stochastically shifted, beyond what its
  // sample size explains?" Ranks never sort the corpus: quality is
  // 4-dp quantized, so mid-ranks come from a cumulative window over
  // the ≤10⁴-row score histogram (the q198 trick) and every per-source
  // sum is a keyed aggregate join against that histogram. Rank sums
  // are decimal-exact (mid-ranks live on a ½ grid); the tie term Σ(t³−t)
  // accumulates in DECIMAL(38,0) because cube counts overflow BIGINT
  // long before a 100-TB corpus does; μ/σ move to doubles only in the
  // closed form, identically in both engines. σ = 0 (a single shared
  // score) NULLs via try_divide rather than inventing a z.
  def rankSumDrift: Q = Q(
    "q252_ranksum_drift",
    s"""WITH sc AS (SELECT source,
       |    round(${TextSqlFragments.qualitySql("string_split(text, ' ')")}, 4) AS sq
       |  FROM documents),
       |hist AS (SELECT sq, count(*) AS c FROM sc GROUP BY sq),
       |rk AS (SELECT sq, sum(c) OVER (ORDER BY sq) - c + (c + 1) / 2.0 AS r FROM hist),
       |tie AS (SELECT CAST(sum(CAST(c * c * c - c AS DECIMAL(38,0))) AS DOUBLE) AS t,
       |    CAST(sum(c) AS BIGINT) AS n FROM hist),
       |bs AS (SELECT source, sq, count(*) AS cs FROM sc GROUP BY 1, 2),
       |rs AS (SELECT source, CAST(sum(cs) AS BIGINT) AS n1,
       |    CAST(sum(CAST(round(cs * r, 1) AS DECIMAL(28,1))) AS DOUBLE) AS rsum
       |  FROM bs JOIN rk USING (sq) GROUP BY source),
       |f AS (SELECT source, n1, n - n1 AS n2,
       |    rsum - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0 AS u,
       |    CAST(n1 AS DOUBLE) * (n - n1) / 2.0 AS mu,
       |    (CAST(n1 AS DOUBLE) * (n - n1) / 12.0)
       |      * ((n + 1) - t / (CAST(n AS DOUBLE) * (n - 1))) AS s2
       |  FROM rs CROSS JOIN tie)
       |SELECT source, n1 AS n_docs, round(u, 1) AS u_stat,
       |  round((u - mu) / sqrt(s2), 4) + 0.0 AS z,
       |  abs((u - mu) / sqrt(s2)) > 1.96 AS significant
       |FROM f ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.text.TextAnalysis
    val sc = graft.dedup.Dedup.persistTracked(Tables.documents(s, dir)
      .select(col("source"),
        round(TextAnalysis.qualityScore(col("text")), 4).as("sq")))
    val hist = graft.dedup.Dedup.persistTracked(
      sc.groupBy("sq").agg(count(lit(1)).as("c")))
    val rk = hist.withColumn("r",
      sum("c").over(Window.orderBy("sq")) - col("c") + (col("c") + 1) / 2.0)
    val tie = hist.agg(
      sum((col("c") * col("c") * col("c") - col("c")).cast("decimal(38,0)"))
        .cast("double").as("t"),
      sum("c").cast("long").as("n"))
    val bs = sc.groupBy("source", "sq").agg(count(lit(1)).as("cs"))
    val rs = bs.join(rk.select("sq", "r"), "sq")
      .groupBy("source").agg(sum("cs").cast("long").as("n1"),
        dsum(round(col("cs") * col("r"), 1), 1).as("rsum"))
    val u = col("rsum") - col("n1").cast("double") * (col("n1") + 1) / 2.0
    val mu = col("n1").cast("double") * (col("n") - col("n1")) / 2.0
    val s2 = (col("n1").cast("double") * (col("n") - col("n1")) / 12.0) *
      ((col("n") + 1) - col("t") / (col("n").cast("double") * (col("n") - 1)))
    val z = try_divide(u - mu, sqrt(s2))
    rs.crossJoin(broadcast(tie))
      .select(col("source"), col("n1").as("n_docs"),
        round(u, 1).as("u_stat"),
        znorm(round(z, 4)).as("z"),
        (abs(z) > 1.96).as("significant"))
      .orderBy("source")
  }

  // --- q270: 1-D Wasserstein (earth-mover) drift per source ------------------
  // The drift family's third lens: KS (q107) reports the sup ECDF gap,
  // rank-sum (q252) a location shift's significance; W₁ = ∫|F_s − F_r|
  // reports HOW MUCH quality mass must move to turn a source's
  // distribution into the rest of the corpus — the magnitude a
  // mixture-rebalancing decision actually needs. Quality is 4-dp
  // quantized, so everything reduces to the score histogram: the
  // source×value grid is sources × ≤10⁴ rows, cumulative counts come
  // from histogram-sized windows, and the integral is an EXACT integer
  // sum — |cums·(n−ns) − cumr·ns| · gap, with the gap lifted to the
  // 1e-4 integer grid — divided once at the end by ns·(n−ns)·10⁴.
  // Nothing touches corpus-sized windows; the one ORDER BY sq window
  // runs over the bounded histogram (the q252/q119 stance).
  def wassersteinDrift: Q = Q(
    "q270_wasserstein_drift",
    s"""WITH sc AS (SELECT source,
       |    round(${TextSqlFragments.qualitySql("string_split(text, ' ')")}, 4) AS sq
       |  FROM documents),
       |hist AS (SELECT source, sq, count(*) AS c FROM sc GROUP BY 1, 2),
       |vals AS (SELECT sq, CAST(sum(c) AS BIGINT) AS ct FROM hist GROUP BY sq),
       |vg AS (SELECT sq, ct, lead(sq) OVER (ORDER BY sq) AS nxt FROM vals),
       |srcs AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM hist GROUP BY source),
       |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS n FROM vals),
       |grid AS (SELECT s.source, s.ns, v.sq, v.nxt, v.ct, coalesce(h.c, 0) AS cs
       |  FROM srcs s CROSS JOIN vg v
       |  LEFT JOIN hist h ON h.source = s.source AND h.sq = v.sq),
       |cum AS (SELECT source, ns, sq, nxt,
       |    CAST(sum(cs) OVER (PARTITION BY source ORDER BY sq) AS BIGINT) AS cums,
       |    CAST(sum(ct) OVER (PARTITION BY source ORDER BY sq) AS BIGINT) AS cumt
       |  FROM grid),
       |w AS (SELECT source, ns, n,
       |    CAST(sum(abs(cums * (n - ns) - (cumt - cums) * ns)
       |      * CAST(round((nxt - sq) * 10000) AS BIGINT)) AS BIGINT) AS num
       |  FROM cum CROSS JOIN tot WHERE nxt IS NOT NULL GROUP BY source, ns, n)
       |SELECT source, ns AS n_docs,
       |  round(CAST(num AS DOUBLE) /
       |    (CAST(ns AS DOUBLE) * (n - ns) * 10000.0), 6) AS w1
       |FROM w ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.text.TextAnalysis
    val sc = graft.dedup.Dedup.persistTracked(Tables.documents(s, dir)
      .select(col("source"),
        round(TextAnalysis.qualityScore(col("text")), 4).as("sq")))
    val hist = graft.dedup.Dedup.persistTracked(
      sc.groupBy("source", "sq").agg(count(lit(1)).as("c")))
    val vals = hist.groupBy("sq").agg(sum("c").cast("long").as("ct"))
    val vg = vals.withColumn("nxt", lead(col("sq"), 1).over(Window.orderBy("sq")))
    val srcs = hist.groupBy("source").agg(sum("c").cast("long").as("ns"))
    val tot = vals.agg(sum("ct").cast("long").as("n"))
    val grid = srcs.crossJoin(broadcast(vg))
      .join(hist, Seq("source", "sq"), "left")
      .select(col("source"), col("ns"), col("sq"), col("nxt"), col("ct"),
        coalesce(col("c"), lit(0)).as("cs"))
    val win = Window.partitionBy("source").orderBy("sq")
    val cum = grid
      .withColumn("cums", sum("cs").over(win).cast("long"))
      .withColumn("cumt", sum("ct").over(win).cast("long"))
    val num = abs(col("cums") * (col("n") - col("ns")) -
      (col("cumt") - col("cums")) * col("ns")) *
      round((col("nxt") - col("sq")) * 10000).cast("long")
    val w = cum.crossJoin(broadcast(tot)).filter(col("nxt").isNotNull)
      .groupBy("source", "ns", "n").agg(sum(num).cast("long").as("num"))
    w.select(col("source"), col("ns").as("n_docs"),
        round(try_divide(col("num").cast("double"),
          col("ns").cast("double") * (col("n") - col("ns")) * 10000.0), 6).as("w1"))
      .orderBy("source")
  }

  // --- q271: average precision of the quality ranking, per language ----------
  // AUC (q119) scores pairwise ordering; curation thresholds live at
  // the TOP of the ranking, which is what average precision weights:
  // AP = (1/P)·Σ_{rel k} precision@k under the quality-desc ordering
  // (doc_id tiebreak), with relevance = the independent unique-token
  // gate (≥½ distinct — the boilerplate-free signal from q232's third
  // rater). Windows are PARTITION BY lang (the q73 per-group stance);
  // ranking metrics inherently need the group's order — at extreme
  // scale the fallback is q119's quantize-and-bin shape or per-shard
  // sampling. Each precision@k is rounded to 8 dp and summed in
  // DECIMAL, so the order-sensitive float sum can't diverge between
  // engines.
  def averagePrecision: Q = Q(
    "q271_average_precision",
    s"""WITH d AS (SELECT doc_id, lang,
       |    round(${TextSqlFragments.qualitySql("string_split(text, ' ')")}, 4) AS sq,
       |    CASE WHEN 2 * len(list_distinct(string_split(text, ' ')))
       |              >= len(string_split(text, ' ')) THEN 1 ELSE 0 END AS rel
       |  FROM documents),
       |r AS (SELECT lang, rel,
       |    row_number() OVER (PARTITION BY lang ORDER BY sq DESC, doc_id) AS k,
       |    CAST(sum(rel) OVER (PARTITION BY lang ORDER BY sq DESC, doc_id) AS BIGINT)
       |      AS cumpos
       |  FROM d)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(rel) AS BIGINT) AS n_pos,
       |  round(
       |    CAST(sum(CASE WHEN rel = 1
       |      THEN CAST(round(CAST(cumpos AS DOUBLE) / k, 8) AS DECIMAL(18,8))
       |      END) AS DOUBLE) / CAST(sum(rel) AS DOUBLE), 6) AS ap
       |FROM r GROUP BY lang ORDER BY lang""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.text.TextAnalysis
    val t = TextAnalysis.tokens(col("text"))
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        round(TextAnalysis.qualityScore(col("text")), 4).as("sq"),
        when(lit(2) * size(array_distinct(t)) >= size(t), 1).otherwise(0).as("rel"))
    val win = Window.partitionBy("lang").orderBy(col("sq").desc, col("doc_id"))
    val r = d
      .withColumn("k", row_number().over(win))
      .withColumn("cumpos", sum("rel").over(win).cast("long"))
    r.groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("rel").cast("long").as("n_pos"),
        round(try_divide(
          sum(when(col("rel") === 1,
            round(col("cumpos").cast("double") / col("k"), 8)
              .cast("decimal(18,8)"))).cast("double"),
          sum("rel").cast("double")), 6).as("ap"))
      .orderBy("lang")
  }

  // --- q274: seeded permutation test for the en-vs-rest quality gap ----------
  // The nonparametric inferential check on a group contrast: is the
  // observed mean-quality gap between English and the rest larger than
  // random relabelings produce? 64 pseudo-permutations are pure
  // functions of (doc_id, salt) through the portable md5 split (the
  // q72 sampling hash), so both engines enumerate the identical null
  // ensemble — no RNG, rerun-stable. One thin (doc_id, sq) projection
  // fans out ×64 and collapses straight into a 64-row aggregate
  // (map-side combined); at extreme scale the same statistic folds
  // into one pass of 64 conditional aggregates with zero fan-out. All
  // group sums are DECIMAL-exact; the p-value compares 6-dp-rounded
  // |gaps|, so a float boundary can't flip a count across engines.
  def permutationTest: Q = Q(
    "q274_permutation_test",
    s"""WITH d AS (SELECT doc_id,
       |    round(${TextSqlFragments.qualitySql("string_split(text, ' ')")}, 4) AS sq,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM documents),
       |obs AS (SELECT
       |    CAST(sum(CASE WHEN y = 1 THEN CAST(sq AS DECIMAL(18,4)) END) AS DOUBLE) AS sa,
       |    CAST(sum(y) AS BIGINT) AS na,
       |    CAST(sum(CASE WHEN y = 0 THEN CAST(sq AS DECIMAL(18,4)) END) AS DOUBLE) AS sb,
       |    CAST(count(*) - sum(y) AS BIGINT) AS nb
       |  FROM d),
       |p AS (SELECT s.salt, d.sq,
       |    CASE WHEN substr(md5(CAST(d.doc_id AS VARCHAR) || ':' ||
       |      CAST(s.salt AS VARCHAR)), 1, 1) < '8' THEN 1 ELSE 0 END AS py
       |  FROM d CROSS JOIN (SELECT unnest(range(64)) AS salt) s),
       |ps AS (SELECT salt,
       |    CAST(sum(CASE WHEN py = 1 THEN CAST(sq AS DECIMAL(18,4)) END) AS DOUBLE) AS sa,
       |    CAST(sum(py) AS BIGINT) AS na,
       |    CAST(sum(CASE WHEN py = 0 THEN CAST(sq AS DECIMAL(18,4)) END) AS DOUBLE) AS sb,
       |    CAST(count(*) - sum(py) AS BIGINT) AS nb
       |  FROM p GROUP BY salt),
       |pd AS (SELECT salt,
       |    round(abs(sa / CAST(na AS DOUBLE)
       |      - sb / CAST(nb AS DOUBLE)), 6) AS adiff
       |  FROM ps)
       |SELECT na AS n_en, nb AS n_rest,
       |  round(sa / CAST(na AS DOUBLE)
       |    - sb / CAST(nb AS DOUBLE), 6) + 0.0 AS obs_diff,
       |  CAST(64 AS BIGINT) AS n_perm,
       |  CAST((SELECT count(*) FROM pd WHERE adiff >=
       |    round(abs(sa / CAST(na AS DOUBLE)
       |      - sb / CAST(nb AS DOUBLE)), 6)) AS BIGINT) AS n_exceed,
       |  round((1.0 + (SELECT count(*) FROM pd WHERE adiff >=
       |    round(abs(sa / CAST(na AS DOUBLE)
       |      - sb / CAST(nb AS DOUBLE)), 6))) / 65.0, 4) AS p_value
       |FROM obs""".stripMargin,
  ) { (s, dir) =>
    import graft.text.TextAnalysis
    def dmean(v: org.apache.spark.sql.Column, g: org.apache.spark.sql.Column) = (
      sum(when(g, v.cast("decimal(18,4)"))).cast("double"),
      sum(when(g, 1).otherwise(0)).cast("long"))
    val d = graft.dedup.Dedup.persistTracked(Tables.documents(s, dir)
      .select(col("doc_id"),
        round(TextAnalysis.qualityScore(col("text")), 4).as("sq"),
        when(col("lang") === "en", 1).otherwise(0).as("y")))
    val (osa, _) = dmean(col("sq"), col("y") === 1)
    val (osb, _) = dmean(col("sq"), col("y") === 0)
    val obs = d.agg(osa.as("sa"), sum("y").cast("long").as("na"),
      osb.as("sb"), (count(lit(1)) - sum("y")).cast("long").as("nb"))
    val py = when(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
      col("salt").cast("string"))), 1, 1) < "8", 1).otherwise(0)
    val (psa, _) = dmean(col("sq"), col("py") === 1)
    val (psb, _) = dmean(col("sq"), col("py") === 0)
    val ps = d.crossJoin(broadcast(
        s.range(0, 64).toDF("salt").select(col("salt").cast("int").as("salt"))))
      .withColumn("py", py)
      .groupBy("salt")
      .agg(psa.as("sa"), sum("py").cast("long").as("na"),
        psb.as("sb"), (count(lit(1)) - sum("py")).cast("long").as("nb"))
    def gap(sa: org.apache.spark.sql.Column, na: org.apache.spark.sql.Column,
            sb: org.apache.spark.sql.Column, nb: org.apache.spark.sql.Column) =
      try_divide(sa, na.cast("double")) - try_divide(sb, nb.cast("double"))
    val pd = ps.select(round(abs(gap(col("sa"), col("na"), col("sb"), col("nb"))), 6)
      .as("adiff"))
    val og = gap(col("sa"), col("na"), col("sb"), col("nb"))
    obs.crossJoin(broadcast(pd.agg(collect_list("adiff").as("adiffs"))))
      .select(col("na").as("n_en"), col("nb").as("n_rest"),
        znorm(round(og, 6)).as("obs_diff"),
        lit(64L).as("n_perm"),
        size(filter(col("adiffs"), a => a >= round(abs(og), 6)))
          .cast("long").as("n_exceed"),
        round((lit(1.0) + size(filter(col("adiffs"), a => a >= round(abs(og), 6))))
          / 65.0, 4).as("p_value"))
  }

  // --- q283: Cramér's V between language and source ----------------------------
  // q116 emits the χ² CELLS; this is the bounded-effect-size summary a
  // mixture report needs: V = √(χ²/(n·min(r−1,c−1))) ∈ [0,1] for the
  // lang × source contingency — "how much does source determine
  // language" as one comparable number. The grid is densified
  // (langs × sources cross join, absent combinations count 0 — their
  // (0−E)²/E mass is NOT skippable), cell terms are 9-dp rounded into
  // DECIMAL, and the corpus-sized work is one 2-key aggregate.
  def cramersV: Q = Q(
    "q283_cramers_v",
    """WITH obs AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
      |  FROM documents GROUP BY 1, 2),
      |langs AS (SELECT DISTINCT lang FROM documents),
      |srcs AS (SELECT DISTINCT source FROM documents),
      |rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1),
      |ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS k FROM obs GROUP BY 1),
      |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
      |    (SELECT CAST(count(*) AS BIGINT) FROM langs) AS nr,
      |    (SELECT CAST(count(*) AS BIGINT) FROM srcs) AS nc
      |  FROM obs),
      |cells AS (SELECT l.lang, s.source, coalesce(o.o, 0) AS o,
      |    CAST(r AS DOUBLE) * k / n AS e
      |  FROM langs l CROSS JOIN srcs s
      |  LEFT JOIN obs o ON o.lang = l.lang AND o.source = s.source
      |  JOIN rt ON rt.lang = l.lang JOIN ct ON ct.source = s.source CROSS JOIN tot),
      |chi AS (SELECT CAST(sum(CAST(round(pow(o - e, 2) / e, 9) AS DECIMAL(18,9)))
      |    AS DOUBLE) AS chi2 FROM cells)
      |SELECT n, nr, nc, round(chi2, 6) AS chi2,
      |  round(sqrt(chi2 / (n * least(nr - 1, nc - 1))), 6) AS cramers_v
      |FROM chi CROSS JOIN tot""".stripMargin,
  ) { (s, dir) =>
    val docs = graft.dedup.Dedup.persistTracked(
      Tables.documents(s, dir).select("lang", "source"))
    val obs = graft.dedup.Dedup.persistTracked(
      docs.groupBy("lang", "source").agg(count(lit(1)).cast("long").as("o")))
    val langs = obs.select("lang").distinct()
    val srcs = obs.select("source").distinct()
    val rt = obs.groupBy("lang").agg(sum("o").cast("long").as("r"))
    val ct = obs.groupBy("source").agg(sum("o").cast("long").as("k"))
    val tot = obs.agg(sum("o").cast("long").as("n"))
      .crossJoin(broadcast(langs.agg(count(lit(1)).cast("long").as("nr"))))
      .crossJoin(broadcast(srcs.agg(count(lit(1)).cast("long").as("nc"))))
    val cells = langs.crossJoin(srcs)
      .join(obs, Seq("lang", "source"), "left")
      .join(rt, "lang").join(ct, "source").crossJoin(broadcast(tot))
      .select(coalesce(col("o"), lit(0L)).as("o"),
        (col("r").cast("double") * col("k") / col("n")).as("e"))
    val chi = cells.agg(
      sum(round(pow(col("o") - col("e"), 2) / col("e"), 9).cast("decimal(18,9)"))
        .cast("double").as("chi2"))
    chi.crossJoin(broadcast(tot))
      .select(col("n"), col("nr"), col("nc"), round(col("chi2"), 6).as("chi2"),
        round(sqrt(col("chi2") / (col("n") * least(col("nr") - 1, col("nc") - 1))), 6)
          .as("cramers_v"))
  }

  // --- q288: cumulative gains / lift table for the quality ranking -------------
  // The decile view a filter-threshold decision actually reads: rank
  // docs by quality, and per decile report the cumulative share of
  // relevant docs captured (gains) and the precision multiple over
  // random (lift). No corpus sort: deciles are assigned on the
  // 4-dp score histogram's cumulative counts via INTEGER division
  // ((cum−1)·10 div n — tie scores land whole in one decile, so both
  // engines carve identically), windows run over the bounded
  // histogram, and every rate is a ratio of exact integers.
  def cumulativeGains: Q = Q(
    "q288_cumulative_gains",
    s"""WITH d AS (SELECT
       |    round(${TextSqlFragments.qualitySql("string_split(text, ' ')")}, 4) AS sq,
       |    CASE WHEN 2 * len(list_distinct(string_split(text, ' ')))
       |         >= len(string_split(text, ' ')) THEN 1 ELSE 0 END AS rel
       |  FROM documents),
       |hist AS (SELECT sq, CAST(count(*) AS BIGINT) AS c,
       |    CAST(sum(rel) AS BIGINT) AS pos FROM d GROUP BY sq),
       |cum AS (SELECT sq, c, pos,
       |    CAST(sum(c) OVER (ORDER BY sq DESC) AS BIGINT) AS cumn FROM hist),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
       |    CAST(sum(pos) AS BIGINT) AS np FROM hist),
       |dec AS (SELECT least((cumn - 1) * 10 // n, 9) AS decile, c, pos
       |  FROM cum CROSS JOIN tot),
       |g AS (SELECT decile, CAST(sum(c) AS BIGINT) AS n_docs,
       |    CAST(sum(pos) AS BIGINT) AS n_pos FROM dec GROUP BY decile),
       |gc AS (SELECT decile, n_docs, n_pos,
       |    CAST(sum(n_docs) OVER (ORDER BY decile) AS BIGINT) AS cum_docs,
       |    CAST(sum(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos
       |  FROM g)
       |SELECT CAST(decile AS BIGINT) AS decile, n_docs, n_pos,
       |  round(CAST(cum_pos AS DOUBLE) / np, 6) AS cum_gain,
       |  round((CAST(cum_pos AS DOUBLE) / cum_docs) / (CAST(np AS DOUBLE) / n), 6)
       |    AS lift
       |FROM gc CROSS JOIN tot ORDER BY decile""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.text.TextAnalysis
    val t = TextAnalysis.tokens(col("text"))
    val d = Tables.documents(s, dir).select(
      round(TextAnalysis.qualityScore(col("text")), 4).as("sq"),
      when(lit(2) * size(array_distinct(t)) >= size(t), 1).otherwise(0).as("rel"))
    val hist = graft.dedup.Dedup.persistTracked(d.groupBy("sq")
      .agg(count(lit(1)).cast("long").as("c"), sum("rel").cast("long").as("pos")))
    val cum = hist.withColumn("cumn",
      sum("c").over(Window.orderBy(col("sq").desc)).cast("long"))
    val tot = hist.agg(sum("c").cast("long").as("n"), sum("pos").cast("long").as("np"))
    val dec = cum.crossJoin(broadcast(tot))
      .select(least(expr("(cumn - 1) * 10 div n"), lit(9L)).as("decile"),
        col("c"), col("pos"))
    val g = dec.groupBy("decile")
      .agg(sum("c").cast("long").as("n_docs"), sum("pos").cast("long").as("n_pos"))
    val w = Window.orderBy("decile")
    val gc = g
      .withColumn("cum_docs", sum("n_docs").over(w).cast("long"))
      .withColumn("cum_pos", sum("n_pos").over(w).cast("long"))
    gc.crossJoin(broadcast(tot))
      .select(col("decile").cast("long").as("decile"), col("n_docs"), col("n_pos"),
        round(col("cum_pos").cast("double") / col("np"), 6).as("cum_gain"),
        round((col("cum_pos").cast("double") / col("cum_docs")) /
          (col("np").cast("double") / col("n")), 6).as("lift"))
      .orderBy("decile")
  }

  // --- q301: correlation matrix of the quality-signal family --------------------
  // Before a curation pipeline stacks gates, it should know which of
  // its signals are redundant: pairwise Pearson r between the four
  // per-doc scores this registry computes — composite quality (q36),
  // char entropy (q191), LZ78 compressibility (q269), and Flesch
  // readability (q277) — in ONE corpus pass. Every signal is lifted
  // to the 1e-4 integer grid, so all 14 moments (4 sums, 4 squares, 6
  // cross-products) are exact DECIMAL(38,0) integers; r's cancelling
  // numerator and the znorm'd output follow the slope discipline, and
  // a zero-variance signal NULLs its pairs via try_divide.
  def signalCorrelation: Q = {
    val names = Seq("quality", "entropy", "lz", "flesch")
    val prs = for {
      i <- names.indices; j <- names.indices if i < j
    } yield (names(i), names(j))
    val momSql = (names.map(a =>
      s"CAST(sum(CAST($a AS DECIMAL(38,0))) AS DOUBLE) AS s_$a," +
        s" CAST(sum(CAST($a AS DECIMAL(38,0)) * $a) AS DOUBLE) AS q_$a") ++
      prs.map { case (a, b) =>
        s"CAST(sum(CAST($a AS DECIMAL(38,0)) * $b) AS DOUBLE) AS p_${a}_$b"
      }).mkString(",\n      |    ")
    val rowsSql = prs.map { case (a, b) =>
      s"""SELECT '$a' AS sig_a, '$b' AS sig_b,
         |  round((n * p_${a}_$b - s_$a * s_$b)
         |    / sqrt((n * q_$a - s_$a * s_$a) * (n * q_$b - s_$b * s_$b)), 6)
         |    + 0.0 AS r FROM mom""".stripMargin
    }.mkString("\n      |UNION ALL ")
    Q(
      "q301_signal_correlation",
      s"""WITH base AS (SELECT doc_id, text, string_split(text, ' ') AS t
         |  FROM documents),
         |chars AS (SELECT doc_id, substring(text, CAST(i AS INTEGER), 1) AS ch
         |  FROM base, UNNEST(range(1, len(text) + 1)) AS u(i)),
         |cc AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch),
         |cn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM cc GROUP BY doc_id),
         |ent AS (SELECT cc.doc_id, CAST(round(-CAST(sum(CAST(
         |    round((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n), 9)
         |    AS DECIMAL(18,9))) AS DOUBLE) * 10000) AS BIGINT) AS entropy
         |  FROM cc JOIN cn USING (doc_id) GROUP BY cc.doc_id),
         |lzf AS (SELECT doc_id, substr(text, 1, 240) AS lt FROM base),
         |lzr AS (SELECT doc_id, len(lt) AS nc,
         |    list_reduce(list_prepend('|;;0', string_split(lt, '')),
         |    (acc, c) -> CASE
         |      WHEN contains(string_split(acc, ';')[1],
         |                    '|' || string_split(acc, ';')[2] || c || '|')
         |        THEN string_split(acc, ';')[1] || ';' ||
         |             string_split(acc, ';')[2] || c || ';' || string_split(acc, ';')[3]
         |      ELSE string_split(acc, ';')[1] || string_split(acc, ';')[2] || c || '|' ||
         |           ';;' || CAST(CAST(string_split(acc, ';')[3] AS INT) + 1 AS VARCHAR)
         |    END) AS acc FROM lzf),
         |lz AS (SELECT doc_id, CAST(round(CAST(
         |    CAST(string_split(acc, ';')[3] AS INT)
         |      + CASE WHEN string_split(acc, ';')[2] <> '' THEN 1 ELSE 0 END
         |    AS DOUBLE) / nc * 10000) AS BIGINT) AS lz FROM lzr),
         |sig AS (SELECT b.doc_id,
         |    CAST(round((${TextSqlFragments.qualitySql("t")}) * 10000) AS BIGINT)
         |      AS quality,
         |    e.entropy, z.lz,
         |    CAST(round((206.835
         |      - 1.015 * (CAST(len(t) AS DOUBLE)
         |          / greatest(len(text) - len(replace(text, '.', '')), 1))
         |      - 84.6 * (CAST(len(regexp_replace(text, '[aeiou]+', '@', 'g'))
         |          - len(replace(regexp_replace(text, '[aeiou]+', '@', 'g'), '@', ''))
         |          AS DOUBLE) / len(t))) * 10000) AS BIGINT) AS flesch
         |  FROM base b JOIN ent e USING (doc_id) JOIN lz z USING (doc_id)),
         |mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    $momSql
         |  FROM sig)
         |SELECT sig_a, sig_b, r FROM ($rowsSql)
         |ORDER BY sig_a, sig_b""".stripMargin,
    ) { (s, dir) =>
      import graft.text.TextAnalysis
      val t = TextAnalysis.tokens(col("text"))
      val lt = substring(col("text"), 1, 240)
      val vg = regexp_replace(col("text"), "[aeiou]+", "@")
      val fleschRaw = lit(206.835) -
        lit(1.015) * (size(t).cast("double") /
          greatest(length(col("text")) -
            length(regexp_replace(col("text"), "\\.", "")), lit(1))) -
        lit(84.6) * ((length(vg) - length(regexp_replace(vg, "@", "")))
          .cast("double") / size(t))
      val sig = Tables.documents(s, dir).select(
        round(TextAnalysis.qualityScore(col("text")) * 10000).cast("long")
          .as("quality"),
        round((-graft.functions.CharEntropy(col("text")).getField("negent")) * 10000)
          .cast("long").as("entropy"),
        round(TextAnalysis.lzPhraseCount(col("text"), 240).cast("double")
          / length(lt) * 10000).cast("long").as("lz"),
        round(fleschRaw * 10000).cast("long").as("flesch"))
      val names = Seq("quality", "entropy", "lz", "flesch")
      val prs = for {
        i <- names.indices; j <- names.indices if i < j
      } yield (names(i), names(j))
      val aggs =
        names.flatMap(a => Seq(
          sum(col(a).cast("decimal(38,0)")).cast("double").as(s"s_$a"),
          sum(col(a).cast("decimal(38,0)") * col(a)).cast("double").as(s"q_$a"))) ++
        prs.map { case (a, b) =>
          sum(col(a).cast("decimal(38,0)") * col(b)).cast("double").as(s"p_${a}_$b")
        }
      val mom = sig.agg(count(lit(1)).cast("long").as("n"), aggs: _*)
      val rows = prs.map { case (a, b) =>
        struct(lit(a).as("sig_a"), lit(b).as("sig_b"),
          znorm(round(try_divide(
            col("n") * col(s"p_${a}_$b") - col(s"s_$a") * col(s"s_$b"),
            sqrt((col("n") * col(s"q_$a") - col(s"s_$a") * col(s"s_$a")) *
              (col("n") * col(s"q_$b") - col(s"s_$b") * col(s"s_$b")))), 6))
            .as("r"))
      }
      mom.select(explode(array(rows: _*)).as("e"))
        .select(col("e.sig_a"), col("e.sig_b"), col("e.r"))
        .orderBy("sig_a", "sig_b")
    }
  }

  // --- q302: Youden-J optimal operating point ------------------------------------
  // q119 summarizes the whole ROC as one AUC; q272 picks a threshold
  // unsupervised; this picks the SUPERVISED optimum — the quality
  // cutoff maximizing Youden's J = TPR − FPR against the unique-token
  // relevance gate, the standard operating-point criterion. The whole
  // ROC lives on the 4-dp score histogram (cumulative counts, two
  // integer ratios per row); the argmax is a flag on 6-dp-rounded J
  // (ties flag every optimum identically in both engines).
  def youdenThreshold: Q = Q(
    "q302_youden_threshold",
    s"""WITH d AS (SELECT
       |    round(${TextSqlFragments.qualitySql("string_split(text, ' ')")}, 4) AS sq,
       |    CASE WHEN 2 * len(list_distinct(string_split(text, ' ')))
       |         >= len(string_split(text, ' ')) THEN 1 ELSE 0 END AS rel
       |  FROM documents),
       |hist AS (SELECT sq, CAST(count(*) AS BIGINT) AS c,
       |    CAST(sum(rel) AS BIGINT) AS pos FROM d GROUP BY sq),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
       |    CAST(sum(pos) AS BIGINT) AS np FROM hist),
       |cum AS (SELECT sq,
       |    CAST(sum(c) OVER (ORDER BY sq DESC) AS BIGINT) AS cumn,
       |    CAST(sum(pos) OVER (ORDER BY sq DESC) AS BIGINT) AS cumpos FROM hist),
       |j AS (SELECT sq, cumn, cumpos,
       |    round(CAST(cumpos AS DOUBLE) / np
       |      - CAST(cumn - cumpos AS DOUBLE) / (n - np), 6) + 0.0 AS youden_j,
       |    round(CAST(cumpos AS DOUBLE) / np, 6) AS tpr,
       |    round(CAST(cumn - cumpos AS DOUBLE) / (n - np), 6) AS fpr
       |  FROM cum CROSS JOIN tot),
       |mx AS (SELECT max(youden_j) AS m FROM j)
       |SELECT sq AS threshold, tpr, fpr, youden_j, youden_j = m AS is_best
       |FROM j CROSS JOIN mx ORDER BY threshold""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    import graft.text.TextAnalysis
    val t = TextAnalysis.tokens(col("text"))
    val d = Tables.documents(s, dir).select(
      round(TextAnalysis.qualityScore(col("text")), 4).as("sq"),
      when(lit(2) * size(array_distinct(t)) >= size(t), 1).otherwise(0).as("rel"))
    val hist = graft.dedup.Dedup.persistTracked(d.groupBy("sq")
      .agg(count(lit(1)).cast("long").as("c"), sum("rel").cast("long").as("pos")))
    val tot = hist.agg(sum("c").cast("long").as("n"), sum("pos").cast("long").as("np"))
    val w = Window.orderBy(col("sq").desc)
    val cum = hist
      .withColumn("cumn", sum("c").over(w).cast("long"))
      .withColumn("cumpos", sum("pos").over(w).cast("long"))
    val jt = graft.dedup.Dedup.persistTracked(cum.crossJoin(broadcast(tot))
      .select(col("sq"),
        round(col("cumpos").cast("double") / col("np"), 6).as("tpr"),
        round((col("cumn") - col("cumpos")).cast("double") /
          (col("n") - col("np")), 6).as("fpr"),
        znorm(round(col("cumpos").cast("double") / col("np") -
          (col("cumn") - col("cumpos")).cast("double") / (col("n") - col("np")), 6))
          .as("youden_j")))
    val mx = jt.agg(max("youden_j").as("m"))
    jt.crossJoin(broadcast(mx))
      .select(col("sq").as("threshold"), col("tpr"), col("fpr"), col("youden_j"),
        (col("youden_j") === col("m")).as("is_best"))
      .orderBy("threshold")
  }
}
