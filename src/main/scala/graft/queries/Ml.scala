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
    chiSquare, aucMannWhitney)

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

  // --- isolation-forest anomaly scores (rows-only; seeded) ----------------
  // Rows-only BY NECESSITY: the forest's split points come from seeded
  // random subsampling at fit time — no SQL engine can re-derive them.
  // The algorithm (Liu et al. 2008) is spec-gated instead:
  // MlPipelineSpec pins determinism, score bounds, and that planted
  // outliers score above the contamination threshold.
  def iforestAnomaly: Q = Q.rowsOnly("q53_iforest_anomaly") { (s, dir) =>
    val features = MlPipeline.buildFeatures(Tables.events(s, dir))
    val model = IsolationForestLite.fit(features, MlPipeline.FeatureCols, numTrees = 50)
    IsolationForestLite.transform(features, model, MlPipeline.FeatureCols, contamination = 0.05)
      .filter(col("is_anomaly") === 1)
      .select("event_id", "is_anomaly")
      .orderBy("event_id")
  }

  // --- multimodal feature extraction (rows-only) ---------------------------
  // Rows-only BY NECESSITY: the features derive from REAL binary
  // decode (PNG/WAV/AVI bytes through the JDK codecs) — SQL engines
  // cannot decode media. The codecs are fixture-tested to known
  // pixel/sample values in MultimodalSpec.
  def multimodalFeatures: Q = Q.rowsOnly("q54_multimodal_features") { (s, dir) =>
    val corpus = Multimodal.synthesize(s, 500)
    Multimodal.extractFeatures(corpus, dim = 16).toDF()
      .groupBy("media_type")
      .agg(count(lit(1)).as("n"),
        round(avg("mean_intensity"), 2).as("avg_intensity"),
        round(avg("byte_entropy"), 3).as("avg_entropy"))
      .orderBy("media_type")
  }
}
