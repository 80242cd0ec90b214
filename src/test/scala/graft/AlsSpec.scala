package graft

import org.apache.spark.sql.functions._
import graft.ml.AlsLite

/** From-scratch ALS-WR: monotone objective, bit-exact determinism,
  * rank-recovery, and prediction plumbing.
  */
class AlsSpec extends SparkSpec {

  private def copurchase = {
    val dir = "/root/testdata/sf0.001"
    Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("u"), col("l_suppkey").as("i"))
      .agg(count(lit(1)).as("r"))
  }

  test("objective is non-increasing across iterations") {
    val m = AlsLite.train(copurchase, "u", "i", "r", k = 4, iters = 3, lambda = 0.1)
    assert(m.objective.length === 3)
    val pairs = m.objective.zip(m.objective.tail)
    assert(pairs.forall { case (a, b) => b <= a + 1e-6 },
      s"objective increased: ${m.objective}")
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("training is bit-identical at a different ratings partitioning") {
    val r = copurchase
    val a = AlsLite.train(r, "u", "i", "r", k = 3, iters = 2, lambda = 0.1)
    val b = AlsLite.train(r.repartition(13), "u", "i", "r", k = 3, iters = 2, lambda = 0.1)
    def dump(f: org.apache.spark.sql.DataFrame) =
      f.orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    assert(dump(a.userFactors) === dump(b.userFactors)) // exact ==
    assert(dump(a.itemFactors) === dump(b.itemFactors))
    assert(a.objective === b.objective)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("a rank-1 rating matrix is recovered to near-zero error") {
    import spark.implicits._
    val ratings = (for { u <- 0L until 20L; i <- 0L until 10L }
      yield (u, i, (1.0 + u % 3) * (1.0 + i % 2))).toDF("u", "i", "r")
    val m = AlsLite.train(ratings, "u", "i", "r", k = 2, iters = 8, lambda = 1e-3)
    val rmse = math.sqrt(
      AlsLite.predict(ratings, m.userFactors, m.itemFactors, "u", "i")
        .select(avg(pow(col("r") - col("pred"), 2))).head().getDouble(0))
    assert(rmse < 0.05, s"rmse=$rmse")
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("single-user single-item solve matches the closed form") {
    import spark.implicits._
    // One rating r=2 with k=1: the item factor is the deterministic
    // init v; the user half-step solves (v² + λ)x = r·v exactly.
    val ratings = Seq((5L, 9L, 2.0)).toDF("u", "i", "r")
    val m = AlsLite.train(ratings, "u", "i", "r", k = 1, iters = 1, lambda = 0.5)
    val iv = ((9L % 1000003L) * 2654435761L + 13L) % 1000003L // initF(9, 0, 1)
    val v = (iv + 0.5) / 1000003.0 / 1
    val x = m.userFactors.head().getSeq[Double](1).head
    val expected = 2.0 * v / (v * v + 0.5)
    assert(math.abs(x - expected) < 1e-12, s"x=$x expected=$expected")
    graft.dedup.Dedup.clearCaches(spark)
  }
}
