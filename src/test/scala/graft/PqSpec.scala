package graft

import org.apache.spark.sql.functions._
import graft.similarity.{Pq, Similarity}

/** Product-quantization ANN: deterministic codes, bounded recall loss,
  * distributed-shape guarantees.
  */
class PqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("training is deterministic and codes stay in [0, k)") {
    val embs = Tables.embeddings(spark, sf)
    val cb1 = Pq.train(embs, "embedding")
    val cb2 = Pq.train(embs, "embedding")
    assert(cb1.centroids.flatten.flatten.toSeq === cb2.centroids.flatten.flatten.toSeq)
    val codes = Pq.encode(embs, "vec_id", "embedding", cb1)
    assert(codes.filter(exists(col("codes"), c => c < 0 || c >= cb1.k)).isEmpty)
    assert(codes.filter(size(col("codes")) =!= cb1.m).isEmpty)
  }

  test("PQ recall@10 >= 0.8 vs brute force over the query panel (both SFs)") {
    // same panel and bar as the LSH/IVF gate in SimilaritySpec — the
    // weak-neighbor corpus is the hard case; raise m/refine rather
    // than lowering the bar if this ever fails
    val qids = Seq(0L, 1L, 7L, 13L, 29L)
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val embs = Tables.embeddings(spark, dir).cache()
      val cb = Pq.train(embs, "embedding")
      val encoded = Pq.encode(embs, "vec_id", "embedding", cb)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var recall = 0.0
      for (q <- qids) {
        val bf = Similarity.bruteForceTopK(embs, "vec_id", "embedding", q, 10)
          .collect().map(_.getLong(0)).toSet
        val qv = embs.filter(col("vec_id") === q)
          .select(Similarity.asDouble(col("embedding"))).head().getSeq[Double](0).toArray
        val pq = Pq.topK(embs, encoded, cb, "vec_id", "embedding", qv, 10,
          excludeId = Some(q)).collect().map(_.getLong(0)).toSet
        recall += (bf & pq).size / 10.0
      }
      assert(recall / qids.size >= 0.8, s"$dir: PQ mean recall@10 ${recall / qids.size} < 0.8")
      encoded.unpersist()
      embs.unpersist()
    }
  }

  test("reported sims are exact cosines (re-rank), matching brute force on overlap") {
    val embs = Tables.embeddings(spark, sf)
    val cb = Pq.train(embs, "embedding")
    val encoded = Pq.encode(embs, "vec_id", "embedding", cb)
    val qv = embs.filter(col("vec_id") === 0L)
      .select(Similarity.asDouble(col("embedding"))).head().getSeq[Double](0).toArray
    val bf = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0L, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pq = Pq.topK(embs, encoded, cb, "vec_id", "embedding", qv, 10, excludeId = Some(0L))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, sim) <- pq if bf.contains(id))
      assert(sim === bf(id), s"id $id: PQ sim $sim != brute-force ${bf(id)}")
  }

  test("IVF×PQ recall@10 >= 0.8 vs brute force; probe scans only nProbe cell dirs") {
    val qids = Seq(0L, 1L, 7L, 13L, 29L)
    val dir = "/root/testdata/sf0.01"
    val embs = Tables.embeddings(spark, dir).cache()
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    Pq.writeIvfPqIndex(embs, "vec_id", "embedding", nCells = 8, path = idx)
    var recall = 0.0
    for (q <- qids) {
      val bf = Similarity.bruteForceTopK(embs, "vec_id", "embedding", q, 10)
        .collect().map(_.getLong(0)).toSet
      val qv = embs.filter(col("vec_id") === q)
        .select(Similarity.asDouble(col("embedding"))).head().getSeq[Double](0).toArray
      val got = Pq.ivfPqTopK(spark, idx, "vec_id", "embedding", qv, 10,
        nProbe = 4, excludeId = Some(q)).collect().map(_.getLong(0)).toSet
      recall += (bf & got).size / 10.0
    }
    assert(recall / qids.size >= 0.8, s"IVF×PQ mean recall@10 ${recall / qids.size} < 0.8")
    // the probe reads at most nProbe of the 8 cell dirs
    val qv0 = embs.filter(col("vec_id") === 0L)
      .select(Similarity.asDouble(col("embedding"))).head().getSeq[Double](0).toArray
    val probe = Pq.ivfPqTopK(spark, idx, "vec_id", "embedding", qv0, 10, nProbe = 4)
    probe.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val vecScans = scans(probe.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("vectors")))
    assert(vecScans.nonEmpty, "no vectors scan found in the probe plan")
    vecScans.foreach { sc =>
      assert(sc.selectedPartitions.partitionCount <= 4,
        s"probe scanned ${sc.selectedPartitions.partitionCount} cell dirs")
    }
    embs.unpersist()
  }

  test("ADC candidate scan is TakeOrderedAndProject — no shuffle, no UDF") {
    val embs = Tables.embeddings(spark, sf)
    val cb = Pq.train(embs, "embedding")
    val encoded = Pq.encode(embs, "vec_id", "embedding", cb)
    val qv = embs.filter(col("vec_id") === 0L)
      .select(Similarity.asDouble(col("embedding"))).head().getSeq[Double](0).toArray
    val p = Pq.adcCandidates(encoded, cb, "vec_id", qv, 80, excludeId = Some(0L))
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
    assert(!p.contains("Exchange hashpartitioning"), "ADC scan must not shuffle")
    assert(!p.toLowerCase.contains("udf"))
  }
}
