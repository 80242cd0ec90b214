package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** From-scratch distributed logistic regression — the linear text
  * classifier every large-scale curation pipeline keeps on the shelf
  * (the CCNet/fastText-shaped "quality classifier": score documents
  * with a handful of cheap features, keep the high end). Reference
  * analogue: the RandomForest training surface of `ml_pipeline.py`
  * (fit → metrics → score); this is the linear member of that family,
  * built engine-native instead of wrapping MLlib.
  *
  * Scale shape per iteration — ONE map-side-combined aggregation:
  *
  *   - the weight vector rides into the scan as literals (d+1
  *     doubles), the sigmoid + per-feature gradient terms are pure
  *     codegen column expressions — no UDF, no driver data;
  *   - the full-batch gradient is d+1 DECIMAL(18,9) sums (partial
  *     aggregation on every partition, then one 1-row reduce), so the
  *     only thing that ever reaches the driver is d+2 numbers per
  *     iteration — the repo's bounded-scalars rule;
  *   - the weight update runs on the driver in plain IEEE doubles.
  *
  * Determinism: per-row gradient terms round to 9 dp before the
  * DECIMAL cast, so the sums are associative-exact — any partitioning,
  * any combine order, bit-identical weights. That also makes the whole
  * trainer expressible iteration-by-iteration in ANSI SQL (chained
  * 1-row CTEs), which is how q133 oracle-checks a 3-iteration run
  * end-to-end: same rounding, same fold order, same decimal sums in
  * both engines.
  *
  * The feature projection is persisted across iterations
  * (MEMORY_AND_DISK, the multi-consumer convention); pass `tol > 0`
  * to early-stop on the gradient's max-norm (deterministic — the
  * gradient is a pure function of the data).
  */
object LogRegLite {

  /** Trained weights (index 0 = intercept, then one per feature
    * column, in order) plus the per-iteration mean log-loss trace —
    * one entry per EXECUTED iteration; a correct full-batch GD run at
    * a sane learning rate is non-increasing.
    */
  final case class LogRegResult(weights: Array[Double], losses: Seq[Double])

  /** σ(w·x) as a pure codegen column, rounded to 9 dp — the shared
    * train/serve scoring path (same fold order everywhere):
    * z = ((w0 + x1·w1) + x2·w2) + … left-associated, σ = 1/(1+e⁻ᶻ).
    */
  def sigmoid(featCols: Seq[Column], weights: Seq[Double]): Column = {
    require(weights.length == featCols.length + 1,
      s"need ${featCols.length + 1} weights (intercept first), got ${weights.length}")
    val z = featCols.zip(weights.tail).foldLeft(lit(weights.head): Column) {
      case (acc, (c, w)) => acc + c * lit(w)
    }
    round(lit(1.0) / (lit(1.0) + exp(-z)), 9)
  }

  /** Full-batch gradient descent from w = 0. `labelCol` must be 0/1
    * (any numeric type); `featCols` are double feature columns —
    * scale them to O(1) like any linear model wants.
    */
  def train(df: DataFrame, featCols: Seq[String], labelCol: String,
      iters: Int, lr: Double, tol: Double = 0.0): LogRegResult = {
    require(iters >= 1 && lr > 0, s"iters=$iters, lr=$lr")
    val d = featCols.length
    val feats = graft.dedup.Dedup.persistTracked(
      df.select((featCols.map(c => col(c).cast("double")) :+
        col(labelCol).cast("double").as("__y")): _*).toDF(featCols :+ "__y": _*))
    val n = feats.count().toDouble
    require(n > 0, "empty training set")

    var w = new Array[Double](d + 1)
    val losses = Seq.newBuilder[Double]
    var converged = false
    for (_ <- 1 to iters if !converged) {
      val s = sigmoid(featCols.map(col), w.toSeq)
      val resid = s - col("__y") // exact: σ̂ has ≤9 dp, y ∈ {0,1}
      // d+1 exact decimal sums + the loss trace, one combined pass;
      // ε-clamp keeps ln finite when σ̂ rounds to exactly 0 or 1
      val sc = lit(1e-12)
      val gradCols = (graft.queries.dsum(round(resid, 9), 9).as("g0") +:
        featCols.zipWithIndex.map { case (c, i) =>
          graft.queries.dsum(round(col(c) * resid, 9), 9).as(s"g${i + 1}")
        }) :+
        graft.queries.dsum(round(-(col("__y") * log(greatest(s, sc)) +
          (lit(1.0) - col("__y")) * log(greatest(lit(1.0) - s, sc))), 9), 9).as("loss")
      val row = feats.agg(gradCols.head, gradCols.tail: _*).head()
      val grad = (0 to d).map(j => row.getDouble(j) / n).toArray
      losses += row.getDouble(d + 1) / n
      var j = 0
      while (j <= d) { w(j) = w(j) - lr * grad(j); j += 1 }
      converged = tol > 0 && grad.iterator.map(math.abs).max < tol
    }
    LogRegResult(w, losses.result())
  }

  /** Map-only serving: appends `scoreCol` = σ(w·x) (9 dp) — weights
    * ride as literals, the plan is scan + project.
    */
  def score(df: DataFrame, featCols: Seq[String], weights: Seq[Double],
      scoreCol: String = "score"): DataFrame =
    df.withColumn(scoreCol, sigmoid(featCols.map(col), weights))
}
