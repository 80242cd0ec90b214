package graft

import org.apache.spark.sql.functions._

/** Round-10 operator specs: the dbt generic-test constraint suite
  * (violating fixtures in every vocabulary slot), IVF index upsert,
  * PageRank convergence observability, and the bounded cache ledger.
  */
class RoundTenOpsSpec extends SparkSpec {
  import graft.warehouse.Quality
  import graft.warehouse.Quality.{Relationship, TableChecks}

  test("Quality.checks: each generic test counts its violations on a broken fixture") {
    import spark.implicits._
    // child: one dup composite key (rows 1&2), a null k2 row (exempt
    // from unique, caught by not_null), one bad status, two orphan FKs
    // (one null FK — exempt)
    val child = Seq(
      (1L, Option(10L), "O", Option(100L)),
      (1L, Option(10L), "O", Option(100L)),
      (2L, Option.empty[Long], "F", Option(999L)),
      (3L, Option(30L), "X", Option(888L)),
      (4L, Option(40L), "F", Option.empty[Long]),
    ).toDF("k1", "k2", "status", "fk")
    val parent = Seq(100L).toDF("pk")
    val out = Quality.checks(Seq(
      TableChecks("child", child,
        unique = Seq(Seq("k1", "k2")),
        notNull = Seq("k2"),
        acceptedValues = Seq("status" -> Seq("O", "F")),
        relationships = Seq(Relationship("fk", parent, "parent", "pk"))),
    )).collect().map(r => (r.getString(1), r.getString(2)) ->
      (r.getLong(3), r.getBoolean(4))).toMap
    assert(out(("unique", "k1,k2")) === ((1L, false)),
      "one surplus row beyond the first; the null-key row is exempt")
    assert(out(("not_null", "k2")) === ((1L, false)))
    assert(out(("accepted_values", "status")) === ((1L, false)))
    assert(out(("relationships", "fk->parent.pk")) === ((2L, false)),
      "two non-null orphans; the null FK is exempt")
  }

  test("upsertIvf: delta merges into nearest cells, re-upsert is idempotent, untouched cell dirs stay byte-identical") {
    import spark.implicits._
    import graft.similarity.Similarity
    // two well-separated groups on orthogonal axes; seeds (two lowest
    // ids) land one per group so Lloyd separates them cleanly
    def vec(axis: Int, jitter: Double) =
      Array.tabulate(4)(i => if (i == axis) 1.0f + jitter.toFloat else jitter.toFloat * 0.1f)
    val base = ((0L to 9L).map(i => (i, vec(0, 0.01 * i))) ++
      (10L to 19L).map(i => (i, vec(1, 0.01 * (i - 10))))).toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("graft_r10_ups").toString + "/idx"
    Similarity.writeIvfIndex(base, "vec_id", "embedding", nCells = 2, path = idx)
    def dirState = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(idx), spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(idx + "/vectors"))
        .filter(_.isDirectory).map { d =>
          d.getPath.getName -> fs.listStatus(d.getPath)
            .map(f => (f.getPath.getName, f.getLen, f.getModificationTime)).toSeq.sorted
        }.toMap
    }
    val before = dirState
    // delta: axis-0 vectors only — exactly one cell is touched
    val delta = (100L to 104L).map(i => (i, vec(0, 0.05))).toDF("vec_id", "embedding")
    val reclustered = Similarity.upsertIvf(spark, idx, delta, "vec_id", "embedding")
    assert(!reclustered, "balanced append must not trip the drift guard")
    val after = dirState
    val untouched = before.keys.filter(k => after.get(k).contains(before(k)))
    assert(untouched.size === 1,
      s"exactly one cell dir (the axis-1 cell) must be byte-identical; got $untouched")
    val live = spark.read.parquet(idx + "/vectors")
    assert(live.count() === 25)
    assert(live.select("vec_id").distinct().count() === 25)
    // delta landed in the axis-0 cell: same cell as the axis-0 base ids
    val cellOf = live.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert((100L to 104L).forall(i => cellOf(i) == cellOf(0L)))
    // idempotence: replaying the same delta replaces, never duplicates
    Similarity.upsertIvf(spark, idx, delta, "vec_id", "embedding")
    assert(spark.read.parquet(idx + "/vectors").count() === 25)
    // the merged index serves: a fresh axis-0 query's top neighbors are
    // axis-0 ids (nProbe=2 = all cells, so ranking is exact cosine)
    val top = Similarity.ivfTopKIndexed(spark, idx, "vec_id", "embedding",
      Array(1.0, 0.0, 0.0, 0.0), k = 5, nProbe = 2).collect().map(_.getLong(0))
    assert(top.forall(id => id < 10 || id >= 100), s"axis-0 query got ${top.toSeq}")
  }

  test("upsertIvf: a skewed delta trips the drift guard and the index is rebuilt") {
    import spark.implicits._
    import graft.similarity.Similarity
    def vec(axis: Int, jitter: Double) =
      Array.tabulate(4)(i => if (i == axis) 1.0f + jitter.toFloat else jitter.toFloat * 0.1f)
    val base = ((0L to 9L).map(i => (i, vec(0, 0.01 * i))) ++
      (10L to 19L).map(i => (i, vec(1, 0.01 * (i - 10))))).toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("graft_r10_drift").toString + "/idx"
    Similarity.writeIvfIndex(base, "vec_id", "embedding", nCells = 2, path = idx)
    // 60 new axis-0 vectors: cell sizes become (70, 10) — max/mean = 1.75
    val delta = (100L to 159L).map(i => (i, vec(0, 0.001 * (i - 100)))).toDF("vec_id", "embedding")
    val reclustered = Similarity.upsertIvf(spark, idx, delta, "vec_id", "embedding",
      skewBound = 1.5)
    assert(reclustered, "70/10 split exceeds skewBound 1.5 — must rebuild")
    // rebuilt index is complete and still serves both regions
    val live = spark.read.parquet(idx + "/vectors")
    assert(live.count() === 80)
    assert(spark.read.parquet(idx + "/centroids").count() === 2)
    val top = Similarity.ivfTopKIndexed(spark, idx, "vec_id", "embedding",
      Array(0.0, 1.0, 0.0, 0.0), k = 3, nProbe = 2).collect().map(_.getLong(0))
    assert(top.forall(id => id >= 10 && id <= 19), s"axis-1 query got ${top.toSeq}")
  }

  test("PageRank.runObserved: per-iteration L1 residuals are observable and shrink; settled certifies convergence") {
    import spark.implicits._
    import graft.operators.PageRank
    val metrics = new java.util.concurrent.ConcurrentHashMap[Int, Double]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      private val Res = """graft_pr__res(\d+)_h.*""".r
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach {
          case (Res(i), row) if !row.isNullAt(0) => metrics.put(i.toInt, row.getDouble(0))
          case _ => ()
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      // star graph: center/leaf ranks oscillate toward the fixpoint, so
      // residuals shrink geometrically but are NOT yet under 1e-3
      // relative after 6 iterations — settled must say so honestly
      val star = PageRank.undirected(
        Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst"))
      val out = PageRank.runObserved(star, iters = 6).collect()
      val deadline = System.currentTimeMillis() + 30000
      while (metrics.size < 6 && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(metrics.size >= 6, s"expected 6 residual metrics, got $metrics")
      assert(metrics.get(6) < metrics.get(1),
        s"L1 residual must shrink: ${metrics.get(1)} -> ${metrics.get(6)}")
      assert(metrics.get(6) > 0.0)
      assert(out.length === 5)
      // a regular graph IS the uniform fixpoint: residual 0 from the
      // first iteration, every node settled immediately
      metrics.clear()
      val ring = PageRank.undirected(
        Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"))
      val rout = PageRank.runObserved(ring, iters = 2).collect()
      assert(rout.forall(_.getBoolean(2)), s"uniform graph must settle: ${rout.toSeq}")
      val d2 = System.currentTimeMillis() + 30000
      while (metrics.size < 2 && System.currentTimeMillis() < d2) Thread.sleep(100)
      assert(metrics.get(1) === 0.0 && metrics.get(2) === 0.0,
        s"uniform fixpoint has zero residual, got $metrics")
    } finally spark.listenerManager.unregister(listener)
  }

  test("cache ledger: past the budget the LRU persist is evicted; identical plans touch; eviction is not a correctness event") {
    import spark.implicits._
    import graft.dedup.Dedup
    Dedup.clearCaches(spark)
    val saved = Dedup.maxTracked
    try {
      Dedup.maxTracked = 2
      val base = Dedup.evictionCount
      val a = Dedup.persistTracked(Seq(1, 2).toDF("a"))
      val b = Dedup.persistTracked(Seq(3, 4).toDF("b"))
      // re-registering an identical plan must TOUCH a (move to MRU),
      // not insert a third entry
      Dedup.persistTracked(Seq(1, 2).toDF("a"))
      assert(Dedup.evictionCount === base, "touch must not evict")
      val c = Dedup.persistTracked(Seq(5, 6).toDF("c")) // b is now LRU
      assert(Dedup.evictionCount === base + 1)
      assert(b.storageLevel === org.apache.spark.storage.StorageLevel.NONE,
        "the least-recently-registered persist must be the one evicted")
      assert(a.storageLevel !== org.apache.spark.storage.StorageLevel.NONE,
        "the touched entry must survive")
      assert(c.storageLevel !== org.apache.spark.storage.StorageLevel.NONE)
      // an evicted frame recomputes — eviction is a cost event only
      assert(b.collect().map(_.getInt(0)).sorted.toSeq === Seq(3, 4))
    } finally {
      Dedup.maxTracked = saved
      Dedup.clearCaches(spark)
    }
  }

  test("BoostLite: separable fixture is solved, polarity flips when needed, stumps are partitioning-independent") {
    import spark.implicits._
    import graft.ml.BoostLite
    // y = 1 iff x > 5 — the BASE stump (x <= thr → +1) has error ~1 at
    // thr = 5, so the trainer must pick the FLIPPED polarity
    val rows = (1 to 20).map(i => (i.toDouble, if (i > 5) 1 else 0))
    val cands = Seq("x" -> Seq(3.0, 5.0, 8.0))
    def fit(parts: Int) = BoostLite.train(
      rows.toDF("x", "y").repartition(parts), cands, "y", rounds = 2)
    val m = fit(1)
    assert(m.stumps.head.thr === 5.0 && m.stumps.head.flip,
      s"expected flipped thr=5 stump first, got ${m.stumps.head}")
    assert(m.errors.head < 1e-9, "the separable cut has ~zero weighted error")
    assert(m.stumps === fit(7).stumps,
      "decimal-exact weight sums must make training partitioning-independent")
    // the trained ensemble classifies the fixture perfectly
    val preds = rows.toDF("x", "y")
      .select(col("y"), (BoostLite.score(m.stumps) > 0).as("p")).collect()
    assert(preds.forall(r => (r.getInt(0) == 1) == r.getBoolean(1)))
  }

  test("Bfs.hops: exact distances on a path graph; unreached nodes keep the ceiling") {
    import spark.implicits._
    import graft.operators.Bfs
    // path 1-2-3-4-5 plus a disconnected pair 10-11, symmetrized
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
    val edges = e0.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val d = Bfs.hops(edges, Seq(1L).toDF("id"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> Bfs.Unreached, 10L -> Bfs.Unreached, 11L -> Bfs.Unreached),
      s"got $d")
  }

  test("deleteFromIvf: survivors keep their cells, an emptied cell's dir is dropped, replay is a no-op") {
    import spark.implicits._
    import graft.similarity.Similarity
    def vec(axis: Int, jitter: Double) =
      Array.tabulate(4)(i => if (i == axis) 1.0f + jitter.toFloat else jitter.toFloat * 0.1f)
    val base = ((0L to 9L).map(i => (i, vec(0, 0.01 * i))) ++
      (10L to 19L).map(i => (i, vec(1, 0.01 * (i - 10))))).toDF("vec_id", "embedding")
    val idx = java.nio.file.Files.createTempDirectory("graft_r10_ivfdel").toString + "/idx"
    Similarity.writeIvfIndex(base, "vec_id", "embedding", nCells = 2, path = idx)
    // delete the ENTIRE axis-1 group plus one axis-0 vector
    val del = ((10L to 19L) :+ 3L).toDF("vec_id")
    Similarity.deleteFromIvf(spark, idx, del, "vec_id")
    val live = spark.read.parquet(idx + "/vectors")
    assert(live.count() === 9)
    assert(live.filter(col("vec_id") === 3L || col("vec_id") >= 10L).count() === 0)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(idx), spark.sparkContext.hadoopConfiguration)
    val cellDirs = fs.listStatus(new org.apache.hadoop.fs.Path(idx + "/vectors"))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell=")).map(_.getPath.getName)
    assert(cellDirs.length === 1, s"the emptied axis-1 cell dir must be dropped: ${cellDirs.toSeq}")
    Similarity.deleteFromIvf(spark, idx, del, "vec_id") // no-op replay
    assert(spark.read.parquet(idx + "/vectors").count() === 9)
    val top = Similarity.ivfTopKIndexed(spark, idx, "vec_id", "embedding",
      Array(1.0, 0.0, 0.0, 0.0), k = 3, nProbe = 2).collect().map(_.getLong(0))
    assert(top.forall(id => id < 10 && id != 3L), s"got ${top.toSeq}")
  }

  test("Quality.checks: a clean table passes every constraint") {
    import spark.implicits._
    val t = Seq((1L, "a", "O"), (2L, "b", "F")).toDF("id", "name", "st")
    val p = Seq(1L, 2L, 3L).toDF("pk")
    val out = Quality.checks(Seq(
      TableChecks("t", t,
        unique = Seq(Seq("id")),
        notNull = Seq("name"),
        acceptedValues = Seq("st" -> Seq("O", "F")),
        relationships = Seq(Relationship("id", p, "p", "pk"))),
    )).collect()
    assert(out.length === 4)
    assert(out.forall(r => r.getLong(3) == 0L && r.getBoolean(4)),
      s"expected all pass, got ${out.mkString("; ")}")
  }
}
