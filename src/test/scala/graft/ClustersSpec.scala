package graft

import org.apache.spark.sql.functions._
import graft.dedup.{Clusters, Dedup}

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def cc(vertices: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(
      vertices.toDF("id"), "id",
      edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("components: chain, triangle, and isolated vertex get min-id labels") {
    // chain 1-2-3-4 (diameter 3: exercises multi-round propagation),
    // triangle 10-11-12, isolated 99
    val labels = cc(Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 99L),
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L)))
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L))
  }

  test("a 50-vertex chain converges within the default round budget (pointer jumping)") {
    // plain per-hop propagation would need 49 rounds — over maxIter=20;
    // the label(label) shortcut makes chains collapse in O(log n)
    val labels = cc((0L until 50L).toSeq, (0L until 49L).map(i => (i, i + 1)))
    assert(labels.values.toSet === Set(0L))
  }

  test("plan size stays bounded across rounds (lineage cut every round)") {
    // 200-vertex chain ≈ 8 pointer-jump rounds. Before the per-round
    // eager localCheckpoint, each round embedded the previous round's
    // plan ~4× (two joins over derived views), so the returned plan
    // held ~4^rounds nodes and an 8 GiB driver OOM'd merely
    // stringifying it. Now every round is a LogicalRDD leaf: the
    // result plan must be a handful of nodes no matter the diameter.
    val n = 200L
    val labels = Clusters.connectedComponents(
      (0L until n).toDF("id"), "id",
      (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst"), "src", "dst")
    val planNodes = labels.queryExecution.analyzed.collect { case p => p }.size
    assert(planNodes <= 5, s"expected a checkpoint-leaf plan, got $planNodes nodes")
    assert(labels.collect().map(_.getLong(1)).toSet === Set(0L))
    Dedup.clearCaches(spark)
  }

  test("reliable-checkpoint opt-in yields the same labels as local checkpoints") {
    // warehouse runs with executor churn pass checkpointDir so a lost
    // executor can't strand a mid-loop round; results must be
    // identical to the local (fast-path) variant, and the checkpoint
    // dir must actually have been used
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    val labels = Clusters.connectedComponents(
      (0L until 50L).toDF("id"), "id",
      (0L until 49L).map(i => (i, i + 1)).toDF("src", "dst"), "src", "dst",
      checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.values.toSet === Set(0L))
    assert(labels.size === 50)
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, "reliable checkpoint wrote nothing under checkpointDir")
    Dedup.clearCaches(spark)
  }

  test("components: edge direction and self-loops are irrelevant") {
    val a = cc(Seq(1L, 2L, 3L), Seq((3L, 1L), (2L, 3L)))
    val b = cc(Seq(1L, 2L, 3L), Seq((1L, 3L), (3L, 2L), (2L, 2L)))
    assert(a === b)
    assert(a === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("exactEdges ties every copy to its min-id representative") {
    val docs = Seq((5L, "aaa"), (9L, "aaa"), (2L, "aaa"), (7L, "bbb"), (1L, "ccc"))
      .toDF("doc_id", "text")
    val edges = Clusters.exactEdges(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges === Set((5L, 2L), (9L, 2L))) // singletons produce no edge
  }

  test("incrementalNew drops known texts and dedups within the batch") {
    val existing = Seq((1L, "aaa"), (2L, "bbb")).toDF("doc_id", "text")
    val incoming = Seq((10L, "aaa"), (11L, "ccc"), (12L, "ccc"), (13L, "ddd"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNew(existing, incoming, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "aaa" already exists → dropped; "ccc" twice in-batch → min id 11
    assert(out === Map(11L -> "ccc", 13L -> "ddd"))
  }

  test("dedupCorpus keeps exactly one survivor per transitive cluster, columns intact") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val mid = base.replace("today", "tonight")
    val far = mid.replace("quick", "sluggish")
    val docs = Seq((0L, base, "en"), (1L, base, "en"), (2L, mid, "en"),
      (3L, far, "en"), (4L, "completely different words describing nothing in common at all", "de"))
      .toDF("doc_id", "text", "lang")
    val out = Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.5)
    // cluster {0,1,2,3} → survivor 0; singleton {4} survives; lang rides along
    assert(out.columns.toSeq === Seq("doc_id", "text", "lang"))
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet === Set(0L, 4L))
    Dedup.clearCaches(spark)
  }

  test("exact copies and transitive near-dups land in one cluster") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val mid = base.replace("today", "tonight")         // near-dup of base
    val far = mid.replace("quick", "sluggish")         // near-dup of mid, farther from base
    val docs = Seq((0L, base), (1L, base), (2L, mid), (3L, far),
      (4L, "completely different words describing nothing in common at all"))
      .toDF("doc_id", "text")
    val near = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val edges = near.unionByName(Clusters.exactEdges(docs, "doc_id", "text"))
    val labels = Clusters.connectedComponents(docs.select("doc_id"), "doc_id",
      edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 0,1 exact copies; 2 near-dups 0; 3 near-dups 2 → all one cluster,
    // even if (0,3) never paired directly; 4 stays its own
    assert(labels(0L) === 0L && labels(1L) === 0L && labels(2L) === 0L && labels(3L) === 0L)
    assert(labels(4L) === 4L)
    Dedup.clearCaches(spark)
  }
}
