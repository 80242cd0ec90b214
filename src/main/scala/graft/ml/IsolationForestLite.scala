package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Minimal isolation forest (SURVEY.md §7.7: MLlib has no iForest; the
  * reference uses sklearn's, `ml_pipeline.py:250-259`).
  *
  * Trees are fit on a driver-side reservoir sample (≤ trees × 256 rows
  * — bounded regardless of data size, standard iForest practice), then
  * broadcast; scoring is a distributed column transform. Score follows
  * Liu et al. 2008: s(x) = 2^(−E[h(x)] / c(ψ)).
  */
object IsolationForestLite {

  /** Flattened tree node: feature<0 marks a leaf holding `size`. */
  final case class Node(feature: Int, split: Double, left: Int, right: Int, size: Int)

  final case class Model(trees: Array[Array[Node]], sampleSize: Int) extends Serializable {
    private val cPsi = avgPathLength(sampleSize)

    def pathLength(x: Array[Double], tree: Array[Node]): Double = {
      var i = 0
      var depth = 0.0
      while (tree(i).feature >= 0) {
        i = if (x(tree(i).feature) < tree(i).split) tree(i).left else tree(i).right
        depth += 1.0
      }
      depth + avgPathLength(tree(i).size)
    }

    def score(x: Array[Double]): Double = {
      val mean = trees.map(pathLength(x, _)).sum / trees.length
      math.pow(2.0, -mean / cPsi)
    }
  }

  /** c(n): average unsuccessful-search path length of a BST of n. */
  def avgPathLength(n: Int): Double =
    if (n <= 1) 0.0
    else 2.0 * (math.log(n - 1.0) + 0.5772156649) - 2.0 * (n - 1.0) / n

  def fit(df: DataFrame, featureCols: Seq[String], numTrees: Int = 100,
      sampleSize: Int = 256, seed: Long = 42L): Model = {
    val total = numTrees * sampleSize
    val needed = total * 2
    val base = df.select(featureCols.map(c => col(c).cast("double")): _*)
    // Uniform sample regardless of input ordering: Bernoulli-sample at a
    // fraction sized from the row count, then a seeded driver-side
    // shuffle so the bounded take is unbiased even when data is sorted.
    val n = base.count()
    val sampled =
      if (n <= needed) base
      else base.sample(withReplacement = false, math.min(1.0, needed.toDouble / n * 1.2), seed)
    val rnd = new scala.util.Random(seed)
    val rows = rnd.shuffle(
      sampled.collect().toVector.map(r => Array.tabulate(featureCols.length)(r.getDouble)))
      .take(needed).toArray
    // empty input: a single-leaf forest that scores everything 0.5
    // rather than crashing on rnd.nextInt(0)
    if (rows.isEmpty)
      return Model(Array.fill(numTrees)(Array(Node(-1, 0.0, -1, -1, 0))), sampleSize)
    val maxDepth = math.ceil(math.log(sampleSize.toDouble) / math.log(2.0)).toInt
    val trees = Array.fill(numTrees) {
      val sample = Array.fill(math.min(sampleSize, rows.length))(rows(rnd.nextInt(rows.length)))
      val nodes = scala.collection.mutable.ArrayBuffer.empty[Node]
      def build(data: Array[Array[Double]], depth: Int): Int = {
        val idx = nodes.length
        if (depth >= maxDepth || data.length <= 1) {
          nodes += Node(-1, 0.0, -1, -1, data.length); idx
        } else {
          val f = rnd.nextInt(featureCols.length)
          val vals = data.map(_(f))
          val (lo, hi) = (vals.min, vals.max)
          if (lo == hi) { nodes += Node(-1, 0.0, -1, -1, data.length); idx }
          else {
            val split = lo + rnd.nextDouble() * (hi - lo)
            nodes += Node(f, split, -1, -1, data.length) // placeholder links
            val (l, r) = data.partition(_(f) < split)
            val li = build(l, depth + 1)
            val ri = build(r, depth + 1)
            nodes(idx) = nodes(idx).copy(left = li, right = ri)
            idx
          }
        }
      }
      build(sample, 0)
      nodes.toArray
    }
    Model(trees, sampleSize)
  }

  /** DuckDB serving oracle for a fitted forest over the q51-shaped
    * event features (the q61/q94 trained-literal pattern): each tree
    * becomes a nested CASE cascade whose LEAVES are the precomputed
    * `depth + c(size)` path lengths as `Double.toString` literals — the
    * oracle never does path arithmetic, it *selects* the same literal
    * Spark's scorer computes, so per-tree paths are bit-exact by
    * construction. The per-row path sum is written as the same
    * 0.0-seeded left-assoc chain `Array.sum` folds. The contamination
    * cut compares in MEAN-PATH space: s(x) = 2^(−m/c) is strictly
    * decreasing in m, so `score > quantile(score, 1−c)` selects exactly
    * the rows `msum < quantile(msum, c)` (rank equivalence — strict
    * inequality excludes boundary ties identically in both
    * parametrizations), and `pow` never has to agree across engines.
    */
  def servingSql(model: Model, contamination: Double): String = {
    // E-notation forces DuckDB to parse the token as DOUBLE: a plain
    // decimal literal becomes DECIMAL (the sum chain overflows
    // DECIMAL(18) and a DECIMAL→DOUBLE hop may not round-trip the bits
    // Double.toString guarantees)
    def dlit(x: Double): String = {
      val s = java.lang.Double.toString(x)
      if (s.contains("E")) s else s + "E0"
    }
    def tree(nodes: Array[Node]): String = {
      def go(i: Int, depth: Int): String = {
        val n = nodes(i)
        if (n.feature < 0) dlit(depth + avgPathLength(n.size))
        else s"(CASE WHEN f${n.feature + 1} < ${dlit(n.split)} " +
          s"THEN ${go(n.left, depth + 1)} ELSE ${go(n.right, depth + 1)} END)"
      }
      go(0, 0)
    }
    val sum = model.trees.map(tree).mkString("(0.0E0 + ", "\n    + ", ")")
    s"""WITH feats AS (SELECT event_id,
       |    value AS f1,
       |    CAST(count(*) OVER w AS DOUBLE) AS f2,
       |    sum(value) OVER w / count(*) OVER w AS f3,
       |    max(value) OVER w AS f4,
       |    min(value) OVER w AS f5
       |  FROM events WINDOW w AS (PARTITION BY user_id)),
       |paths AS (SELECT event_id, $sum AS msum FROM feats),
       |thr AS (SELECT quantile_cont(msum, $contamination) AS t FROM paths)
       |SELECT event_id, 1 AS is_anomaly FROM paths, thr
       |WHERE msum < t ORDER BY event_id""".stripMargin
  }

  /** Adds `anomaly_score` and `is_anomaly` (top `contamination` share
    * by score — matching the reference's contamination=0.05 semantics).
    *
    * `exactThreshold = true` (the deterministic gate default) computes
    * the cut as an exact interpolated percentile, which holds all score
    * values per group; at warehouse scale pass `false` to use
    * `approx_percentile` (fixed-memory sketch, rank error ≤ 1/accuracy)
    * — the same documented approx-at-scale policy as D3/D7.
    */
  def transform(df: DataFrame, model: Model, featureCols: Seq[String],
      contamination: Double = 0.05, exactThreshold: Boolean = true): DataFrame = {
    // codegen expression over the embedded (bounded-size) forest — no
    // UDF dispatch, no per-row Seq boxing
    val scored = df.withColumn("anomaly_score",
      graft.functions.IForestScore(
        array(featureCols.map(c => col(c).cast("double")): _*), model))
    val pct =
      if (exactThreshold) s"percentile(anomaly_score, ${1.0 - contamination})"
      else s"approx_percentile(anomaly_score, ${1.0 - contamination}, 10000)"
    val thrRow = scored.agg(expr(pct)).head()
    // empty input → null percentile → flag nothing
    val thr = if (thrRow.isNullAt(0)) Double.PositiveInfinity else thrRow.getDouble(0)
    scored.withColumn("is_anomaly", (col("anomaly_score") > thr).cast("int"))
  }
}
