package graft

import org.apache.spark.sql.functions._
import graft.ml.KMeansLite

/** Lloyd's k-means: convergence, determinism, exact assignment
  * semantics, and the distributed shape (no full-corpus collect).
  */
class KMeansSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("inertia is non-increasing across Lloyd iterations") {
    val r = KMeansLite.lloyd(Tables.embeddings(spark, sf), "vec_id", "embedding",
      k = 8, iters = 4)
    val pairs = r.inertia.zip(r.inertia.tail)
    assert(pairs.forall { case (a, b) => b <= a + 1e-6 },
      s"inertia increased: ${r.inertia}")
    assert(r.inertia.head > 0.0)
  }

  test("training is deterministic run-to-run and at a different partitioning") {
    val embs = Tables.embeddings(spark, sf)
    val a = KMeansLite.lloyd(embs, "vec_id", "embedding", k = 4, iters = 3)
    val b = KMeansLite.lloyd(embs.repartition(7), "vec_id", "embedding", k = 4, iters = 3)
    assert(a.centroids.flatten.toSeq === b.centroids.flatten.toSeq)
    assert(a.inertia === b.inertia)
    val da = a.assignment.orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    val db = b.assignment.orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(da.toSeq === db.toSeq)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("assignment is the exact argmin (first index wins on ties)") {
    import spark.implicits._
    // 2-d fixture with an exact tie: point (0,1) is sqdist 1 from both
    // centroids (0,0) and (0,2) — the tie must go to cluster 0.
    val df = Seq(
      (1L, Array(0.0, 1.0)),
      (2L, Array(0.1, 0.0)), // nearest (0,0)
      (3L, Array(0.0, 1.9)), // nearest (0,2)
    ).toDF("id", "v")
    val cents = Seq(Array(0.0, 0.0), Array(0.0, 2.0))
    val got = KMeansLite.assign(df, "v", cents)
      .orderBy("id").select("id", "cluster", "dist")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.map(g => (g._1, g._2)).toSeq === Seq((1L, 0), (2L, 0), (3L, 1)))
    val expectedDist = Seq(1.0, 0.1 * 0.1, (1.9 - 2.0) * (1.9 - 2.0))
    got.map(_._3).zip(expectedDist).foreach { case (d, e) =>
      assert(math.abs(d - e) < 1e-12, s"dist $d != $e")
    }
  }

  test("one hand-checked Lloyd update: centroids move to cluster means") {
    import spark.implicits._
    // Two tight groups on a line; seeds are the two lowest ids (0.0
    // and 0.2, both in the left group) — after one update the right
    // centroid must be the mean of whatever it captured.
    val df = Seq(
      (0L, Array(0.0)), (1L, Array(0.2)), (2L, Array(0.1)),
      (3L, Array(10.0)), (4L, Array(10.4)),
    ).toDF("id", "v")
    val r = KMeansLite.lloyd(df, "id", "v", k = 2, iters = 2)
    // iter 1 assignment: c0={0.0,0.1}, c1={0.2,10.0,10.4} → means 0.05, 6.866…
    // iter 2 re-captures 0.2 into c0 → final centroids 0.1, 10.2
    assert(math.abs(r.centroids(0)(0) - 0.1) < 1e-9, r.centroids(0).toSeq.mkString(","))
    assert(math.abs(r.centroids(1)(0) - 10.2) < 1e-9, r.centroids(1).toSeq.mkString(","))
    val byCluster = r.assignment.groupBy("cluster").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(byCluster === Map(0 -> 3L, 1 -> 2L))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("an empty cluster keeps its previous centroid") {
    import spark.implicits._
    // Duplicate seed values: every point at 5.0 ties c0-vs-c1 and the
    // tie rule sends it to c0, so c1 captures nothing and must keep
    // its seed rather than NaN out.
    val df = Seq((0L, Array(5.0)), (1L, Array(5.0)), (2L, Array(6.0)))
      .toDF("id", "v")
    val r = KMeansLite.lloyd(df, "id", "v", k = 3, iters = 2)
    assert(!r.centroids.flatten.exists(_.isNaN))
    assert(r.centroids.map(_(0)).toSeq === Seq(5.0, 5.0, 6.0))
    assert(r.assignment.filter(col("cluster") === 1).isEmpty)
    graft.dedup.Dedup.clearCaches(spark)
  }
}
