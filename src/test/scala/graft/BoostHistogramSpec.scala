package graft

import org.apache.spark.sql.functions._
import graft.ml.BoostLite

/** Pins BoostLite's one-pass histogram trainer exactly equal to the
  * per-round wide-aggregate path it replaced for small grids: same
  * stumps (feature, threshold, polarity, alpha bit-for-bit) and same
  * error trace on a randomized noisy fixture, a separable fixture,
  * and a degenerate constant-label fixture. The histogram path's
  * driver-side DECIMAL replay must match Spark's round(·,12) /
  * cast(decimal(32,12)) semantics exactly — this spec is the gate on
  * that claim.
  */
class BoostHistogramSpec extends SparkSpec {
  import spark.implicits._

  private val grid = Seq(
    "x1" -> Seq(0.3, 0.5, 0.7),
    "x2" -> Seq(10.0, 20.0),
    "x3" -> Seq(-1.0, 0.0, 1.0))

  private def assertSame(df: org.apache.spark.sql.DataFrame, rounds: Int,
      label: String): Unit = {
    val cands = grid.flatMap { case (f, ts) => ts.map(f -> _) }
    val hist = BoostLite.trainHistogram(df, cands, "y", rounds)
    val wide = BoostLite.trainWide(df, grid, cands, "y", rounds)
    graft.dedup.Dedup.clearCaches(spark)
    assert(hist.stumps === wide.stumps, s"$label: stump mismatch")
    assert(hist.errors.zip(wide.errors).forall { case (a, b) =>
      java.lang.Double.doubleToRawLongBits(a) == java.lang.Double.doubleToRawLongBits(b)
    }, s"$label: error trace mismatch ${hist.errors} vs ${wide.errors}")
  }

  test("histogram trainer == wide trainer on a noisy random fixture") {
    val rnd = new scala.util.Random(20514)
    val rows = (1 to 4000).map { _ =>
      val x1 = rnd.nextDouble(); val x2 = rnd.nextDouble() * 30
      val x3 = rnd.nextDouble() * 4 - 2
      val y = if (x1 + rnd.nextGaussian() * 0.3 > 0.5) 1 else 0
      (x1, x2, x3, y)
    }
    assertSame(rows.toDF("x1", "x2", "x3", "y").repartition(7), rounds = 6,
      "random")
  }

  test("histogram trainer == wide trainer on separable and constant labels") {
    val sep = (1 to 200).map { i =>
      val x1 = i / 200.0
      (x1, i * 0.1, 0.0, if (x1 > 0.5) 1 else 0)
    }
    assertSame(sep.toDF("x1", "x2", "x3", "y"), rounds = 3, "separable")
    val const = (1 to 100).map(i => (i / 100.0, i * 0.2, -0.5, 1))
    assertSame(const.toDF("x1", "x2", "x3", "y"), rounds = 2, "constant")
  }

  test("histogram trainer == wide trainer with NULL labels present") {
    val rnd = new scala.util.Random(20515)
    val rows = (1 to 500).map { i =>
      val x1 = rnd.nextDouble()
      val y: java.lang.Integer =
        if (i % 7 == 0) null else Int.box(if (x1 > 0.4) 1 else 0)
      (x1, rnd.nextDouble() * 30, rnd.nextDouble() - 0.5, y)
    }
    assertSame(rows.toDF("x1", "x2", "x3", "y"), rounds = 4, "null-labels")
  }
}
