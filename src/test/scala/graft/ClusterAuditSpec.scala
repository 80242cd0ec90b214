package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-9 embedding audits (q304–q306) on a
  * crafted corpus of 8 well-separated point groups (one per label,
  * 3 vectors each, ids arranged so Lloyd's 8 lowest-id seeds hit one
  * group each). The driver oracle pins cross-engine equality; these
  * pin the math: a perfectly separable clustering must score
  * silhouette ≈ 1 in every cluster and NMI exactly 1 against the
  * aligned labels, and hard negatives must never share the anchor's
  * label.
  */
class ClusterAuditSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_clusaudit").toString
    val rows = (0 until 8).flatMap { g =>
      (0 until 3).map { j =>
        // ids 1..8 = the first vector of each group (the Lloyd seeds),
        // ids 9..24 = the remaining two per group
        val id = if (j == 0) g + 1L else 9L + g * 2L + (j - 1)
        val v = Array.fill(8)(0f)
        v(g) = 1f
        v((g + 1) % 8) = 0.01f * (j + 1) // deterministic within-group jitter
        (id, v, g)
      }
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("q305: separable groups score near-1 silhouette in every cluster") {
    val out = queries.Embeddings.centroidSilhouette.fn(spark, dir).collect()
    assert(out.length === 8)
    out.foreach { r =>
      assert(r.getLong(1) === 3L, s"cluster ${r.get(0)} size")
      assert(r.getDouble(2) > 0.8,
        s"cluster ${r.get(0)} silhouette ${r.getDouble(2)} not near 1")
    }
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q306: cluster assignment aligned with labels gives NMI exactly 1") {
    val r = queries.Embeddings.clusterLabelNmi.fn(spark, dir).head()
    assert(r.getLong(r.fieldIndex("k_clusters")) === 8L)
    assert(r.getLong(r.fieldIndex("n_labels")) === 8L)
    assert(r.getDouble(r.fieldIndex("nmi")) === 1.0)
    assert(r.getDouble(r.fieldIndex("h_cluster")) ===
      r.getDouble(r.fieldIndex("h_label")))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q304: hard negatives never share the anchor's label, 3 per anchor") {
    val out = queries.Embeddings.hardNegatives.fn(spark, dir).collect()
    assert(out.length === 24) // 8 anchors x top-3
    out.foreach { r =>
      assert(r.getInt(r.fieldIndex("anchor_label")) !==
        r.getInt(r.fieldIndex("neg_label")))
      // the anchor is the min-id representative of its label
      assert(r.getLong(r.fieldIndex("anchor_id")) ===
        r.getInt(r.fieldIndex("anchor_label")) + 1L)
    }
    val perAnchor = out.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sorted)
    perAnchor.foreach { case (a, rks) => assert(rks.toSeq === Seq(1L, 2L, 3L), s"anchor $a") }
    graft.dedup.Dedup.clearCaches(spark)
  }
}
