package graft

import org.apache.spark.sql.functions._
import graft.ml.LogRegLite

/** From-scratch logistic regression: hand-checked gradient step,
  * convergence on separable data, bit-exact determinism across
  * partitionings, and the early-stop contract.
  */
class LogRegSpec extends SparkSpec {

  private def toy = {
    import spark.implicits._
    // y = 1 iff x1 > 0 — linearly separable with margin.
    Seq(
      (1L, -1.0, 0.2, 0.0), (2L, -0.8, -0.3, 0.0), (3L, -1.2, 0.1, 0.0),
      (4L, -0.6, -0.1, 0.0), (5L, 0.7, 0.3, 1.0), (6L, 1.1, -0.2, 1.0),
      (7L, 0.9, 0.1, 1.0), (8L, 0.5, -0.4, 1.0),
    ).toDF("id", "x1", "x2", "y")
  }

  test("first gradient step matches the hand computation") {
    // From w = 0 every sigmoid is exactly 0.5, so g_j = Σ x_j·(0.5 − y)
    // (9-dp rounded per row) / n and w' = −lr·g — computable by hand.
    val df = toy
    val rows = df.select("x1", "x2", "y").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val n = rows.length.toDouble
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val g0 = rows.map { case (_, _, y) => BigDecimal(r9(0.5 - y)) }.sum.toDouble / n
    val g1 = rows.map { case (x1, _, y) => BigDecimal(r9(x1 * (0.5 - y))) }.sum.toDouble / n
    val g2 = rows.map { case (_, x2, y) => BigDecimal(r9(x2 * (0.5 - y))) }.sum.toDouble / n
    val m = LogRegLite.train(df, Seq("x1", "x2"), "y", iters = 1, lr = 0.5)
    assert(m.weights.toSeq === Seq(-0.5 * g0, -0.5 * g1, -0.5 * g2))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("separable data: loss is non-increasing and training accuracy reaches 1.0") {
    val df = toy
    val m = LogRegLite.train(df, Seq("x1", "x2"), "y", iters = 80, lr = 1.0)
    assert(m.losses.zip(m.losses.tail).forall { case (a, b) => b <= a + 1e-12 },
      s"loss increased: ${m.losses}")
    assert(m.losses.last < m.losses.head / 2)
    val scored = LogRegLite.score(df, Seq("x1", "x2"), m.weights.toSeq)
    val acc = scored.select(
      avg(when((col("score") >= 0.5) === (col("y") === 1.0), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(acc === 1.0)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("training is bit-identical across partitionings") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), (col("n_chars").cast("double") / 400.0).as("x1"),
        (length(col("text")).cast("double") / 500.0).as("x2"),
        when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
    val a = LogRegLite.train(docs, Seq("x1", "x2"), "y", iters = 4, lr = 0.5)
    val b = LogRegLite.train(docs.repartition(13), Seq("x1", "x2"), "y", iters = 4, lr = 0.5)
    assert(a.weights.toSeq === b.weights.toSeq) // exact ==: the determinism contract
    assert(a.losses === b.losses)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("tol early-stops once the gradient max-norm is small") {
    val m = LogRegLite.train(toy, Seq("x1", "x2"), "y", iters = 500, lr = 1.0, tol = 0.02)
    assert(m.losses.length < 500, "never early-stopped")
    graft.dedup.Dedup.clearCaches(spark)
  }
}
