package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of known vectors") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.0),
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 1.0f), Array(1.0f, 0.0f), math.sqrt(0.5)))
      .toDF("a", "b", "expected")
      .select(Similarity.cosine(Similarity.asDouble(col("a")), Similarity.asDouble(col("b"))).as("c"),
        col("expected"))
    assert(df.filter(abs(col("c") - col("expected")) > 1e-12).count() === 0)
  }

  test("brute-force top-k on sf0.001 returns k descending sims") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val top = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0L, 5).collect()
    assert(top.length === 5)
    val sims = top.map(_.getAs[Double]("cos_sim"))
    assert(sims.sliding(2).forall { case Array(x, y) => x >= y })
    assert(!top.map(_.getAs[Long]("vec_id")).contains(0L))
  }

  test("ANN recall@10 >= 0.8 vs brute force: LSH (q47) and IVF nProbe=4 (q61/q70)") {
    // numeric recall gate over a fixed query panel, both SFs (there is
    // no embeddings stress corpus; sf0.01 is the second dataset). The
    // test corpus has weak neighbor structure (top-10 cosine ≈ 0.3),
    // which is the HARD case for both index families — real near-dup
    // corpora only prune better. Mean over the panel, not per-query:
    // a single weak query is index-shape noise, a low mean is a bug.
    val qids = Seq(0L, 1L, 7L, 13L, 29L)
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val embs = Tables.embeddings(spark, sf).cache()
      val idx = java.nio.file.Files.createTempDirectory("graft-recall-ivf").toString
      Similarity.writeIvfIndex(embs, "vec_id", "embedding", nCells = 8, path = idx)
      var lsh = 0.0
      var ivf = 0.0
      for (q <- qids) {
        val bf = Similarity.bruteForceTopK(embs, "vec_id", "embedding", q, 10)
          .collect().map(_.getLong(0)).toSet
        lsh += (bf & Similarity.annTopK(embs, "vec_id", "embedding", q, 10)
          .collect().map(_.getLong(0)).toSet).size / 10.0
        val qv = embs.filter(col("vec_id") === q)
          .select(Similarity.asDouble(col("embedding"))).head().getSeq[Double](0).toArray
        ivf += (bf & Similarity.ivfTopKIndexed(spark, idx, "vec_id", "embedding", qv, 10,
          nProbe = 4, excludeId = Some(q)).collect().map(_.getLong(0)).toSet).size / 10.0
      }
      assert(lsh / qids.size >= 0.8, s"$sf: LSH mean recall@10 ${lsh / qids.size} < 0.8")
      assert(ivf / qids.size >= 0.8, s"$sf: IVF mean recall@10 ${ivf / qids.size} < 0.8")
      embs.unpersist()
    }
  }

  test("embedding near-dup pairs: precision 1.0 by construction, recall >= 0.8 vs exact") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001").cache()
    val found = Similarity.lshNearDupPairs(embs, "vec_id", "embedding", threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact ground truth: every pair with cosine >= threshold (O(n²)
    // only in the spec — the operator itself never goes quadratic)
    val withNorm = embs.select(col("vec_id"),
      Similarity.asDouble(col("embedding")).as("v"))
    val a = withNorm.toDF("id_a", "va")
    val b = withNorm.toDF("id_b", "vb")
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("va"), col("vb")))
      .filter(col("cos") >= 0.35)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "ground truth empty — threshold too high for this corpus")
    assert((found -- exact).isEmpty, s"false positives: ${(found -- exact).take(5)}")
    val recall = (found & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"near-dup recall $recall < 0.8 (${exact.size} true pairs)")
    embs.unpersist()
  }

  test("embedding near-dup composes after exact vector dedup: k copies add zero pairs") {
    // 8 exact copies of every vector (key-offset ids) — the k² fan-out
    // trap. Pre-dedup collapses copies to their min-id representative
    // (= the base ids here), so the pair set must be EXACTLY the base
    // corpus's. Without the composition an 8x corpus measured 200 s
    // where the deduped path takes 5.
    val base = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50).cache()
    val dup = (0 until 8).map(i =>
      base.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))).reduce(_ unionByName _)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      Similarity.lshNearDupPairs(df, "vec_id", "embedding", threshold = 0.35)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(dup) === pairSet(base))
    base.unpersist()
  }

  test("persisted LSH probe prunes to the query's bucket dirs and matches the in-memory path") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val idx = java.nio.file.Files.createTempDirectory("graft-lsh-idx").toString
    Similarity.writeLshIndex(embs, "vec_id", "embedding", idx)
    val qv = embs.filter(col("vec_id") === 0L)
      .select(Similarity.asDouble(col("embedding"))).head().getSeq[Double](0).toArray
    val probe = Similarity.annTopKIndexed(spark, idx, "vec_id", "embedding", qv, 10,
      excludeId = Some(0L))
    // same candidate set → byte-identical top-k vs the in-memory path
    val mem = Similarity.annTopK(embs, "vec_id", "embedding", 0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probe.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === mem)
    // the sketch scan reads at most Tables partition dirs, not all 16·Tables
    // AQE hides finished stages (e.g. the broadcast candidate side)
    // behind QueryStageExec leaves — descend through them explicitly
    def scans(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => scans(r.child)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(probe.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths.exists(_.toString.contains("sketches")))
    assert(scan.isDefined, "no sketch scan found in the probe plan")
    val scanned = scan.get.selectedPartitions.partitionCount
    assert(scanned <= Similarity.Tables, s"scanned $scanned partitions")
  }

  test("LSH sketches land each vector in exactly Tables buckets") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = embs.count()
    val sk = Similarity.sketches(embs, "vec_id", "embedding")
    assert(sk.count() === n * Similarity.Tables)
  }

  test("LSH dim is parameterized: non-64-d corpus sketches on its own planes; mismatch raises") {
    // 16-d toy corpus: three tight near-dup clusters around orthogonal
    // directions plus deterministic jitter — near-dups collide in some
    // table with overwhelming probability at 4 bits/table.
    val dim = 16
    val rnd = new scala.util.Random(7)
    val rows = (0 until 30).map { i =>
      val base = Array.fill(dim)(0.0)
      base((i % 3) * 5) = 1.0
      (i.toLong, base.map(x => (x + rnd.nextGaussian() * 0.01).toFloat))
    }
    val embs = rows.toDF("vec_id", "embedding")
    // every vector sketches into exactly Tables buckets at dim=16
    assert(Similarity.sketches(embs, "vec_id", "embedding", dim).count()
      === 30L * Similarity.Tables)
    // near-dup recall on the clustered corpus is 1.0: all same-cluster
    // pairs have cosine ≈ 1 and must be found
    val found = Similarity.lshNearDupPairs(embs, "vec_id", "embedding",
      threshold = 0.9, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      a <- 0 until 30; b <- (a + 1) until 30; if a % 3 == b % 3
    } yield (a.toLong, b.toLong)).toSet
    assert(found === expected)
    // a mismatched declared dim fails loudly instead of truncating
    val ex = intercept[Exception] {
      Similarity.sketches(embs, "vec_id", "embedding", 64).count()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t.getMessage).toSeq ++ Option(t.getCause).toSeq.flatMap(rootMessages)
    assert(rootMessages(ex).exists(_.contains("expected 64-d vector")),
      s"unexpected failure: $ex")
    // and the driver-side probe check matches
    intercept[IllegalArgumentException] {
      Similarity.queryBuckets(Array.fill(dim)(1.0), 64)
    }
  }

  test("semDedup (lloyd blocks) keeps one representative per semantic component; pair join is keyed") {
    // three semantic groups around orthogonal directions (ids
    // interleaved so the k lowest-id seeds span the groups), plus exact
    // copies of id 0 at high ids — copies must collapse via exact
    // edges, paraphrases via in-cell cosine, transitively.
    val dim = 8
    val rnd = new scala.util.Random(11)
    val base = (0 until 30).map { i =>
      val v = Array.fill(dim)(0.0)
      v((i % 3) * 2) = 1.0
      (i.toLong, v.map(x => (x + rnd.nextGaussian() * 0.005).toFloat))
    }
    val copies = Seq(100L, 101L).map(id => (id, base.head._2.clone()))
    val embs = (base ++ copies).toDF("vec_id", "embedding")
    val surv = Similarity.semDedup(embs, "vec_id", "embedding",
      k = 3, iters = 2, threshold = 0.95)
      .collect().map(_.getLong(0)).toSet
    assert(surv === Set(0L, 1L, 2L))
    // the semantic pair join is blocked (keyed on the cluster id) —
    // never a cartesian product
    val reps = Similarity.exactVectorRepresentatives(embs, "vec_id", "embedding")
    val km = graft.ml.KMeansLite.lloyd(reps, "vec_id", "embedding", 3, 2)
    val near = Similarity.blockedPairs(
      reps.join(km.assignment.select("vec_id", "cluster"), "vec_id"),
      "vec_id", "embedding", "cluster", 0.95)
    val plan = near.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"semantic pair join is not keyed:\n$plan")
  }

  test("blocked pair search only compares within blocks") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = Similarity.blockedPairs(embs, "vec_id", "embedding", "label", -1.0)
    val labels = embs.select(col("vec_id"), col("label"))
    val joined = pairs
      .join(labels.toDF("id_a", "la"), "id_a")
      .join(labels.toDF("id_b", "lb"), "id_b")
    assert(joined.filter(col("la") =!= col("lb")).count() === 0)
  }

  test("incremental novelty gate rejects exact base copies, collapses delta dups, keyed join only") {
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.001").cache()
    val base = embs.filter(col("vec_id") < 300)
    // delta = the remaining rows + an exact copy of base vector 5 under
    // a new id + a duplicated pair of copies of base vector 7
    val copies = base.filter(col("vec_id").isin(5L, 7L, 7L))
      .withColumn("vec_id", col("vec_id") + 9000L)
    val delta = embs.filter(col("vec_id") >= 300).unionByName(copies)
    val novel = Similarity.lshNovelVsBase(base, delta, "vec_id", "embedding", 0.35)
    val ids = novel.select("vec_id").collect().map(_.getLong(0)).toSet
    // an exact copy of a base vector shares every bucket and scores
    // cosine 1 — never novel
    assert(!ids.contains(9005L) && !ids.contains(9007L))
    // novel ids all come from the delta
    assert(ids.forall(id => id >= 300))
    // the candidate join is keyed on (table_id, bucket) — no cross shape
    val plan = novel.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"novelty gate is not keyed:\n$plan")
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q167 collapses exact-duplicate vectors and flags label-conflicted groups") {
    // 1000 copies of one vector — 200 of them mislabeled — plus a few
    // distinct vectors. Ungrouped, the copies alone would generate
    // ~10⁶ candidate pairs per LSH table; grouped, the whole corpus is
    // 4 representatives, and the conflicting labels inside the
    // duplicate group surface as intra_conflict.
    val dir = java.nio.file.Files.createTempDirectory("graft-ln").toString
    val base = Array.tabulate(Similarity.Dim)(i => (i + 1).toFloat)
    val copies = (0 until 1000).map(i =>
      (100L + i, base, if (i < 800) 1 else 2)) // 200 mislabels
    def unit(j: Int) = Array.tabulate(Similarity.Dim)(i => if (i == j) 1f else 0f)
    val others = Seq((1L, unit(0), 1), (2L, unit(1), 1), (3L, unit(2), 2))
    (copies ++ others).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q167_label_noise")(spark, dir).collect()
    // rows are keyed by min-id REPRESENTATIVES only (vectors without
    // any bucket collision legitimately produce no row — inner join,
    // unchanged semantics): none of the 999 non-rep copy ids may appear
    assert(out.nonEmpty && out.forall(r => Set(1L, 2L, 3L, 100L)(r.getAs[Long]("vec_id"))),
      out.mkString("\n"))
    val dupRow = out.find(_.getAs[Long]("vec_id") == 100L).get
    assert(dupRow.getAs[Long]("n_members") === 1000L)
    assert(dupRow.getAs[Boolean]("intra_conflict")) // 800×label-1 + 200×label-2
    assert(out.filter(_.getAs[Long]("vec_id") != 100L)
      .forall(r => r.getAs[Long]("n_members") == 1L && !r.getAs[Boolean]("intra_conflict")))
    graft.dedup.Dedup.clearCaches(spark)
  }
}
