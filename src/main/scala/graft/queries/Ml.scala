package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.ml.{IsolationForestLite, MlPipeline}
import graft.multimodal.Multimodal

/** ML / advanced-analytics capabilities surfaced through the driver
  * gate (SURVEY.md §2.J + multimodal extension).
  */
object Ml {

  val all: Seq[Q] = Seq(zscoreAnomaly, iforestAnomaly, multimodalFeatures)

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
  def iforestAnomaly: Q = Q.rowsOnly("q53_iforest_anomaly") { (s, dir) =>
    val features = MlPipeline.buildFeatures(Tables.events(s, dir))
    val model = IsolationForestLite.fit(features, MlPipeline.FeatureCols, numTrees = 50)
    IsolationForestLite.transform(features, model, MlPipeline.FeatureCols, contamination = 0.05)
      .filter(col("is_anomaly") === 1)
      .select("event_id", "is_anomaly")
      .orderBy("event_id")
  }

  // --- multimodal feature extraction (rows-only; deterministic stub) ------
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
