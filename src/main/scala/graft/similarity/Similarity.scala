package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Cosine arithmetic is done in double precision with a left-to-right
  * fold (`aggregate` over `zip_with`) so results are bit-reproducible
  * across engines — the DuckDB oracles use the same fold order.
  *
  * Scale path: the brute-force scan is the correctness baseline
  * (O(n·d) per query — fine for one query, wrong for n×n); candidate
  * generation for pair search uses blocked joins (label blocks or
  * random-hyperplane LSH buckets), never a cross product.
  */
object Similarity {

  /** Element-wise double cast — float inputs promote exactly. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Left-fold dot product; both engines accumulate in index order.
    * Native codegen expression — bit-equal to the
    * `aggregate(zip_with(...))` HOF form but with no boxing (see
    * graft.functions.DotProduct).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine against the vector with id `queryId`.
    * The 1-row query side is broadcast; ordering is on rounded
    * similarity with id tie-break for cross-engine determinism.
    */
  def bruteForceTopK(embs: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = embs.filter(col(idCol) === queryId)
      .select(asDouble(col(vecCol)).as("qv"), norm(asDouble(col(vecCol))).as("qn"))
    embs.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        round(dot(asDouble(col(vecCol)), col("qv"))
          / (norm(asDouble(col(vecCol))) * col("qn")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** All pairs within equal `blockCol` values whose cosine ≥ threshold.
    * Blocking keys turn the quadratic pair space into per-block joins —
    * the standard shape for dedup at scale (swap the label for an LSH
    * bucket when no natural block exists).
    */
  def blockedPairs(embs: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    // Norms are computed once per row before the join (O(n·d)), so each
    // pair costs one dot product instead of three; the quotient is the
    // same double as dividing by sqrt(dot)·sqrt(dot) pairwise.
    val withNorm = embs.select(col(blockCol).as("blk"), col(idCol),
      asDouble(col(vecCol)).as("v"), norm(asDouble(col(vecCol))).as("nrm"))
    val a = withNorm.toDF("blk", "id_a", "va", "na")
    val b = withNorm.toDF("blk", "id_b", "vb", "nb")
    a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("blk").as(blockCol), col("id_a"), col("id_b"),
        round(col("cos_sim"), 6).as("cos_sim"))
  }

  /** Cross-set variant of [[blockedPairs]]: every (cand, ref) pair
    * within equal `blockCol` values whose cosine ≥ threshold — the
    * semantic-decontamination primitive (cand = training corpus,
    * ref = eval/benchmark set). Same norm-precompute and keyed-join
    * shape; no `id_a < id_b` dedup because the two sides are disjoint
    * sets, and every qualifying cross pair is evidence.
    */
  def blockedCrossPairs(cand: DataFrame, ref: DataFrame, idCol: String,
      vecCol: String, blockCol: String, threshold: Double): DataFrame = {
    def withNorm(df: DataFrame, id: String) =
      df.select(col(blockCol).as("blk"), col(idCol).as(id),
        asDouble(col(vecCol)).as(s"v_$id"), norm(asDouble(col(vecCol))).as(s"n_$id"))
    withNorm(cand, "id_cand").join(withNorm(ref, "id_ref"), Seq("blk"))
      .withColumn("cos_sim",
        dot(col("v_id_cand"), col("v_id_ref")) / (col("n_id_cand") * col("n_id_ref")))
      .filter(col("cos_sim") >= threshold)
      .select(col("blk").as(blockCol), col("id_cand"), col("id_ref"),
        round(col("cos_sim"), 6).as("cos_sim"))
  }

  // ---- Random-hyperplane LSH ---------------------------------------------

  /** Default hyperplane dimensionality (the test corpus's embedding
    * width). Callers with other widths pass `dim` explicitly — planes
    * are derived from (seed 42, dim) at first use, and a row whose
    * vector length differs from `dim` raises at runtime instead of
    * silently sketching a truncated prefix.
    */
  val Dim = 64
  // 16 tables × 4 bits: recall@10 ≥ 0.8 on the weak-neighbor test
  // corpus (top-10 cosine ≈ 0.3, so per-table collision ≈ p^4 with
  // p ≈ 0.6 — a single table recalls ~13%; the union of 16 recalls
  // ~0.9). On a corpus with real near-dup structure (sim ≥ 0.8) the
  // same parameters prune far harder; recall is the invariant to pin.
  val Tables = 16
  val BitsPerTable = 4
  /** Deterministic hyperplanes per dimensionality, seed 42:
    * Tables×BitsPerTable planes of `dim` gaussians (the 64-d planes are
    * bit-identical to the pre-parameterization ones — same seed, same
    * draw order — so persisted indexes stay valid).
    */
  private val planesCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()
  private def planes(dim: Int): Array[Array[Double]] =
    planesCache.computeIfAbsent(dim, { d =>
      val rnd = new scala.util.Random(42)
      Array.fill(Tables * BitsPerTable)(Array.fill(d)(rnd.nextGaussian()))
    })

  private def planeLit(p: Array[Double]): Column = array(p.map(lit): _*)

  /** The seeded plane matrix, exposed so oracle SQL can embed the same
    * constants: the planes depend only on (seed 42, dim) — never on
    * data — which is what makes the LSH queries oracle-checkable in an
    * external engine at all.
    */
  def hyperplanes(dim: Int = Dim): IndexedSeq[IndexedSeq[Double]] =
    planes(dim).map(_.toIndexedSeq).toIndexedSeq

  /** Row-level dimensionality guard: a vector whose length differs from
    * `dim` must fail loudly, not sketch on a truncated prefix. The
    * check rides in a FILTER (a raise_error projection would be
    * column-pruned away by actions that don't read it, e.g. count()).
    */
  private def dimGuard(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    df.filter(when(size(col(vecCol)) === dim, lit(true))
      .otherwise(raise_error(concat(
        lit(s"graft LSH: expected $dim-d vector in '$vecCol', got length "),
        size(col(vecCol)).cast("string")))))

  /** (id, table_id, bucket) sketch table: bucket = sign bits of the
    * vector against this table's hyperplanes. Pure per-row compute.
    */
  def sketches(embs0: DataFrame, idCol: String, vecCol: String, dim: Int = Dim): DataFrame = {
    val embs = dimGuard(embs0, vecCol, dim)
    val v = asDouble(col(vecCol))
    val tableBuckets = (0 until Tables).map { t =>
      val bits = (0 until BitsPerTable).map { j =>
        when(dot(v, planeLit(planes(dim)(t * BitsPerTable + j))) > 0, 1 << j).otherwise(0)
      }
      struct(lit(t).as("table_id"), bits.reduce(_ + _).as("bucket"))
    }
    embs.select(col(idCol), explode(array(tableBuckets: _*)).as("s"))
      .select(col(idCol), col("s.table_id"), col("s.bucket"))
  }

  /** IVF index: partition vectors by nearest k-means centroid
    * ([[graft.ml.KMeansLite]] — the from-scratch seeded Lloyd's, so the
    * coarse quantizer is bit-reproducible and the ANN path carries no
    * MLlib dependency). Queries probe the `nProbe` nearest centroids
    * and scan only those cells — the inverted-file ANN layout; at
    * warehouse scale each cell is a parquet partition and probing is
    * partition pruning. Returns (indexed rows with a `cell` column,
    * the nCells×d centroid matrix).
    */
  def ivfIndex(embs: DataFrame, idCol: String, vecCol: String,
      nCells: Int, iters: Int = 10): (DataFrame, Array[Array[Double]]) = {
    val km = graft.ml.KMeansLite.lloyd(embs, idCol, vecCol, nCells, iters)
    // re-assign map-only against the trained centroids (k codegen
    // sq_dist folds per row) rather than joining km.assignment back to
    // embs — a corpus-sized shuffle join for something a projection
    // computes in place
    val cell = graft.ml.KMeansLite
      .assign(embs.withColumn("__v", asDouble(col(vecCol))), "__v", km.centroids.toSeq)
    (cell.drop("__v", "dist").withColumnRenamed("cluster", "cell"), km.centroids)
  }

  /** IVF top-k: score only the cells whose centroids are nearest the
    * query vector. nProbe/nCells trades recall for scan fraction.
    */
  def ivfTopK(indexed: DataFrame, centroids: Array[Array[Double]],
      idCol: String, vecCol: String, queryId: Long, k: Int, nProbe: Int = 2): DataFrame = {
    val qRow = indexed.filter(col(idCol) === queryId)
      .select(asDouble(col(vecCol)).as("qv")).head()
    val qv = qRow.getSeq[Double](0).toArray
    // rank probe cells by the same metric the quantizer assigned with
    // (Euclidean), not dot product — mismatched metrics probe the
    // wrong cells for unnormalized vectors
    val cells = centroids.zipWithIndex
      .sortBy { case (c, _) =>
        c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
      }
      .take(nProbe).map(_._2)
    val q = indexed.filter(col(idCol) === queryId)
      .select(asDouble(col(vecCol)).as("qv"), norm(asDouble(col(vecCol))).as("qn"))
    indexed.filter(col("cell").isin(cells: _*) && col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        round(dot(asDouble(col(vecCol)), col("qv"))
          / (norm(asDouble(col(vecCol))) * col("qn")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Persist the IVF layout: vectors land partitioned by `cell` with a
    * (cell, centroid) sidecar, so probing at rest is plain partition
    * pruning — a 1000-executor probe opens nProbe directories, not the
    * table. Refitting per query (what [[ivfIndex]] alone implies) is
    * the wrong plan at scale; build once, probe many.
    */
  def writeIvfIndex(embs: DataFrame, idCol: String, vecCol: String,
      nCells: Int, path: String): Unit = {
    val spark = embs.sparkSession
    import spark.implicits._
    val (indexed, centroids) = ivfIndex(embs, idCol, vecCol, nCells)
    indexed.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("cell").parquet(path + "/vectors")
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path + "/centroids")
  }

  /** Top-k against a persisted IVF index for an external query vector
    * (the ANN serving shape). Reads the centroid sidecar (nCells rows),
    * ranks cells by the index's assignment metric (Euclidean), and
    * scans ONLY the nProbe winning cell partitions.
    */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String, qv: Array[Double], k: Int,
      nProbe: Int = 2, excludeId: Option[Long] = None): DataFrame = {
    val cells = spark.read.parquet(path + "/centroids").collect()
      .map(r => r.getAs[Int]("cell") -> r.getAs[scala.collection.Seq[Double]]("centroid"))
      .sortBy { case (_, c) => c.iterator.zip(qv.iterator).map { case (a, b) => (a - b) * (a - b) }.sum }
      .take(nProbe).map(_._1)
    val qn = math.sqrt(qv.map(x => x * x).sum)
    val qvLit = array(qv.map(lit): _*)
    val base = spark.read.parquet(path + "/vectors")
      .filter(col("cell").isin(cells.toSeq: _*)) // → PartitionFilters at the scan
    excludeId.fold(base)(q => base.filter(col(idCol) =!= q))
      .select(col(idCol),
        round(dot(asDouble(col(vecCol)), qvLit) / (norm(asDouble(col(vecCol))) * qn), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Incremental IVF index maintenance — the daily-append path a real
    * 100 TB embedding store needs next to [[writeIvfIndex]]'s batch
    * build. New vectors are assigned to the NEAREST PERSISTED centroid
    * (map-only: k codegen sq_dist folds per row, no retraining, no
    * shuffle before the write) and merged into their cell partitions
    * via the touched-partition rewrite shared with
    * [[graft.warehouse.Merge.upsertBucketed]]: only the ≤ nProbe-style
    * handful of cell dirs the delta hashes to are read (partition
    * pruning) and swapped; every other cell's files stay
    * byte-identical. Re-ingesting an id with the same vector is
    * idempotent (same assignment ⇒ replaced in place by the id
    * anti-join); CHANGING an id's vector may move it across cells, so
    * callers mutating vectors must delete first — the same contract as
    * any partition-pruned merge whose partition key is derived from
    * the payload.
    *
    * Drift guard: appends skew the quantizer over time (new data
    * drifts from the centroids the cells were built on). After the
    * merge, ONE aggregate computes per-cell sizes; when the largest
    * cell exceeds `skewBound` × the mean, the index is REBUILT from
    * all vectors (fresh Lloyd's at the same nCells) and swapped in via
    * the two-rename pattern. Returns true iff the rebuild ran.
    * Driver traffic: the nCells centroid sidecar, the touched-cell id
    * list (≤ nCells ints), and one scalar stats row — nothing
    * corpus-sized.
    */
  def upsertIvf(spark: org.apache.spark.sql.SparkSession, path: String,
      delta: DataFrame, idCol: String, vecCol: String,
      skewBound: Double = 8.0): Boolean = {
    val centRows = spark.read.parquet(path + "/centroids").orderBy("cell").collect()
    require(centRows.length <= 65536,
      s"upsertIvf($path): ${centRows.length} centroids exceed the driver-side sidecar budget")
    val cents = centRows
      .map(_.getAs[scala.collection.Seq[Double]]("centroid").toArray).toSeq
    val assigned = graft.ml.KMeansLite
      .assign(delta.withColumn("__v", asDouble(col(vecCol))), "__v", cents)
      .drop("__v", "dist").withColumnRenamed("cluster", "cell")
    val live = spark.read.parquet(path + "/vectors")
    val aligned = assigned.select(live.columns.map(col).toSeq: _*)
    // cell ids are bounded by nCells — a scalar-sized collect
    val touched = aligned.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val affected = live.filter(col("cell").isin(touched: _*)) // pruned scan
    val merged = affected.join(aligned.select(idCol), Seq(idCol), "left_anti")
      .unionByName(aligned)
    graft.warehouse.Merge.swapInPartitions(spark, path + "/vectors", merged, "cell")
    // drift check: one aggregate over the index, scalar result (mean is
    // over NON-EMPTY cells — an emptied-out cell is itself drift)
    val st = spark.read.parquet(path + "/vectors")
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .agg(max("n").as("mx"), avg("n").as("mean")).head()
    val recluster = st.getLong(0) > skewBound * st.getDouble(1)
    if (recluster) {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
      val rebuilt = path + ".rebuild"
      // train + stage against the LIVE index (reads finish before the
      // swap), then two-rename the whole index dir into place
      writeIvfIndex(spark.read.parquet(path + "/vectors").drop("cell"),
        idCol, vecCol, nCells = cents.length, path = rebuilt)
      val old = new org.apache.hadoop.fs.Path(
        path + ".old-" + java.util.UUID.randomUUID().toString.take(8))
      fs.rename(new org.apache.hadoop.fs.Path(path), old)
      fs.rename(new org.apache.hadoop.fs.Path(rebuilt),
        new org.apache.hadoop.fs.Path(path))
      fs.delete(old, true)
    }
    recluster
  }

  /** Delete vectors from a persisted IVF index — [[upsertIvf]]'s
    * inverse, completing the index lifecycle (build / append / delete /
    * recluster). The id→cell lookup is one id-column-pruned scan joined
    * against the delete set; only the cell dirs that actually contain
    * deleted ids are rewritten (the same touched-partition swap), a
    * cell emptied entirely is dropped from the layout, untouched dirs
    * stay byte-identical, and re-running the same delete is a no-op.
    * Centroids are untouched: deletion never moves survivors between
    * cells, so the index stays exactly "every remaining vector in its
    * nearest-centroid cell" — the invariant the q340 oracle replays.
    */
  def deleteFromIvf(spark: org.apache.spark.sql.SparkSession, path: String,
      ids: DataFrame, idCol: String): Unit = {
    val del = ids.select(col(ids.columns.head).as("__del_id")).distinct()
    val live = spark.read.parquet(path + "/vectors")
    // cell ids are bounded by nCells — a scalar-sized collect
    val touched = live.join(del, live(idCol) === del("__del_id"))
      .select("cell").distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return
    val affected = live.filter(col("cell").isin(touched: _*)) // pruned scan
    val merged = affected.join(del, affected(idCol) === del("__del_id"), "left_anti")
    val remaining = merged.select("cell").distinct().collect().map(_.getInt(0)).toSet
    graft.warehouse.Merge.swapInPartitions(spark, path + "/vectors", merged, "cell")
    // a fully-emptied cell stages no dir, so the swap leaves its old
    // files in place — drop it explicitly
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    for (c <- touched if !remaining.contains(c))
      fs.delete(new org.apache.hadoop.fs.Path(path + s"/vectors/cell=$c"), true)
  }

  /** The query vector's (table_id, bucket) coordinates, computed in
    * plain Scala from the seeded hyperplanes — no Spark job, so a
    * serving path can prune partitions before any scan starts.
    */
  def queryBuckets(qv: Array[Double], dim: Int = Dim): Seq[(Int, Int)] = {
    require(qv.length == dim,
      s"graft LSH: expected $dim-d query vector, got length ${qv.length}")
    (0 until Tables).map { t =>
      val bucket = (0 until BitsPerTable).map { j =>
        val p = planes(dim)(t * BitsPerTable + j)
        var d = 0.0
        var i = 0
        while (i < dim) { d += p(i) * qv(i); i += 1 }
        if (d > 0) 1 << j else 0
      }.sum
      (t, bucket)
    }
  }

  /** Persist the LSH layout: sketches land partitioned by
    * (table_id, bucket) next to the vectors, so serving a query is
    * partition pruning — read the Tables dirs the query hashes to,
    * never the full sketch table. Build once, probe many (the IVF
    * [[writeIvfIndex]] pattern for the LSH family).
    */
  def writeLshIndex(embs: DataFrame, idCol: String, vecCol: String, path: String,
      dim: Int = Dim): Unit = {
    sketches(embs, idCol, vecCol, dim).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("table_id", "bucket").parquet(path + "/sketches")
    embs.select(col(idCol), col(vecCol)).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path + "/vectors")
  }

  /** Top-k against a persisted LSH index for an external query vector:
    * candidates = ids in the query's Tables bucket dirs (pruned scan),
    * then exact cosine on candidates only. Same candidate set as
    * [[annTopK]] on the same corpus, so recall is identical — only the
    * scan is serving-shaped.
    */
  def annTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String, qv: Array[Double], k: Int,
      excludeId: Option[Long] = None, dim: Int = Dim): DataFrame = {
    val probe = queryBuckets(qv, dim)
      .map { case (t, b) => col("table_id") === t && col("bucket") === b }
      .reduce(_ || _)
    val cand = spark.read.parquet(path + "/sketches")
      .filter(probe) // → PartitionFilters: ≤ Tables dirs scanned
      .select(idCol).distinct()
    val qn = math.sqrt(qv.map(x => x * x).sum)
    val qvLit = array(qv.map(lit): _*)
    val base = spark.read.parquet(path + "/vectors").join(cand, idCol)
    excludeId.fold(base)(q => base.filter(col(idCol) =!= q))
      .select(col(idCol),
        round(dot(asDouble(col(vecCol)), qvLit) / (norm(asDouble(col(vecCol))) * qn), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Embedding-space near-duplicate pairs: candidates share an LSH
    * (table, bucket); the exact cosine filter then makes precision 1.0
    * by construction — only recall is approximate (a near-dup pair is
    * missed iff it collides in no table). The dedup-family shape:
    * pair generation is a keyed join on bucket ids, never O(n²), and
    * hot buckets (boilerplate-like embedding regions) are capped with
    * drops surfaced as observed metrics, like the text dedup family.
    * Pairs feed [[graft.dedup.Clusters.connectedComponents]] the same
    * way Jaccard/SimHash pairs do.
    */
  /** Collapse exact-duplicate vectors to their min-id representative —
    * the embedding analogue of `Dedup.exactRepresentatives`. Grouping
    * is on the raw array (exact float equality); k copies of a vector
    * would otherwise multiply every bucket's pair fan-out by k² (an
    * 8×-replicated corpus measured 200 s vs 5 s with this composition).
    */
  def exactVectorRepresentatives(embs: DataFrame, idCol: String, vecCol: String): DataFrame =
    embs.groupBy(col(vecCol))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col(vecCol))
      // the dedup shuffle is small; re-spread before the 16-table
      // sketch explode (AQE would have coalesced it)
      .repartition(col(idCol))

  /** Member → min-id representative edges over identical vectors (the
    * embedding analogue of `Clusters.exactEdges`): a window over the
    * vector groups, no self-join. Composes with semantic near-dup
    * pairs so components span exact copies AND their paraphrases.
    */
  def exactVectorEdges(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(vecCol))
    embs.select(col(idCol).as("src"), min(col(idCol)).over(w).as("dst"))
      .filter(col("src") =!= col("dst"))
  }

  /** SemDeDup-shaped semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus in embedding space, call two
    * documents semantic duplicates when their cosine within a cluster
    * clears `threshold`, and keep exactly the min-id representative of
    * every connected component. The cluster id is the blocking key —
    * pair generation is the [[blockedPairs]] keyed join, never O(n²) —
    * and exact-duplicate vectors collapse FIRST (the dedup-family
    * composition: k copies would otherwise multiply a block's pair
    * fan-out by k²), re-joining the survivors via [[exactVectorEdges]].
    *
    * `clusterOf` maps the representative table to (idCol, cluster) —
    * [[semDedup]] plugs in the from-scratch Lloyd trainer; the
    * oracle-checked q121 uses a single seeded assignment step so an
    * external engine can replicate the blocks.
    *
    * Returns the surviving rows of `embs`, all columns intact.
    */
  def semDedupSurvivors(embs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, clusterOf: DataFrame => DataFrame): DataFrame = {
    // two consumers (clusterOf and the blocked join) — materialize once
    val reps = graft.dedup.Dedup.persistTracked(
      exactVectorRepresentatives(embs, idCol, vecCol))
    val blocked = reps.join(clusterOf(reps).select(col(idCol), col("cluster")), Seq(idCol))
    val near = blockedPairs(blocked, idCol, vecCol, "cluster", threshold)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val edges = near.unionByName(exactVectorEdges(embs, idCol, vecCol))
    val reps2 = graft.dedup.Clusters
      .connectedComponents(embs.select(idCol), idCol, edges, "src", "dst")
      .filter(col(idCol) === col("cluster_id"))
      .select(idCol)
    embs.join(reps2, Seq(idCol), "left_semi")
  }

  /** One-call SemDeDup with [[graft.ml.KMeansLite]] blocks — the
    * embedding-space sibling of `Dedup.dedupCorpus`. Deterministic end
    * to end: seeded Lloyd's, exact cosine filter, min-label components.
    */
  def semDedup(embs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, threshold: Double): DataFrame =
    semDedupSurvivors(embs, idCol, vecCol, threshold, reps =>
      graft.ml.KMeansLite.lloyd(reps, idCol, vecCol, k, iters).assignment)

  def lshNearDupPairs(embs0: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bucketCap: Int = 2000, preDedup: Boolean = true,
      dim: Int = Dim): DataFrame = {
    // near-dup composes AFTER exact dedup, like the whole dedup family
    val embs = if (preDedup) exactVectorRepresentatives(embs0, idCol, vecCol) else embs0
    // both intermediates have two consumers (withNorm: the id_a and
    // id_b probe joins; sk0: the hot-bucket aggregate and the
    // left-anti side), so persist them like the sibling pair
    // generators — otherwise the 16-table sketch explode and the
    // exact-representative groupBy recompute per consumer
    val withNorm = graft.dedup.Dedup.persistTracked(embs.select(col(idCol),
      asDouble(col(vecCol)).as("v"), norm(asDouble(col(vecCol))).as("nrm")))
    val sk0 = graft.dedup.Dedup.persistTracked(sketches(embs, idCol, vecCol, dim))
    val sk = if (bucketCap > 0) {
      val hot = graft.dedup.Dedup.observeDrops(
        sk0.groupBy("table_id", "bucket").agg(count(lit(1)).as("n"))
          .filter(col("n") > bucketCap),
        "lshNearDupPairs", bucketCap)
      sk0.join(hot.select("table_id", "bucket"), Seq("table_id", "bucket"), "left_anti")
    } else sk0
    // rename BY NAME, not positionally: the USING-column anti join
    // above reorders output to (table_id, bucket, id), so a positional
    // toDF here would silently label table_ids as document ids
    val a = sk.select(col(idCol).as("id_a"), col("table_id"), col("bucket"))
    val b = sk.select(col(idCol).as("id_b"), col("table_id"), col("bucket"))
    // distinct BEFORE the dot products: a pair colliding in k tables
    // must cost one cosine, not k
    val cand = a.join(b, Seq("table_id", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(withNorm.toDF("id_a", "va", "na"), "id_a")
      .join(withNorm.toDF("id_b", "vb", "nb"), "id_b")
      .withColumn("cos_sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6).as("cos_sim"))
  }

  /** Incremental novelty gate (the `Dedup.incrementalNew` shape for the
    * embedding modality): keep only the delta rows that are NOT a
    * semantic near-dup of anything in the base corpus. Delta collapses
    * to exact-vector representatives first (k identical arrivals cost
    * one probe), candidates come from shared LSH buckets — a keyed join
    * of the delta's sketches against the base's, so the delta never
    * scans the base — and the exact cosine filter decides. An exact
    * copy of a base vector shares every bucket and scores cosine 1, so
    * exact duplicates need no separate path.
    *
    * At scale the base side is the PERSISTED sketch index
    * ([[writeLshIndex]]) rather than a recompute; the join shape is
    * identical.
    */
  def lshNovelVsBase(base: DataFrame, delta: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int = Dim): DataFrame = {
    // three consumers (delta sketches, norms, the anti-join output)
    val reps = graft.dedup.Dedup.persistTracked(
      exactVectorRepresentatives(delta, idCol, vecCol))
    val baseSk = sketches(base.select(col(idCol).as("__bid"), col(vecCol)), "__bid", vecCol, dim)
    val cand = sketches(reps, idCol, vecCol, dim)
      .join(baseSk, Seq("table_id", "bucket"))
      .select(col(idCol), col("__bid")).distinct()
    val bn = base.select(col(idCol).as("__bid"),
      asDouble(col(vecCol)).as("bv"), norm(asDouble(col(vecCol))).as("bn"))
    val dn = reps.select(col(idCol),
      asDouble(col(vecCol)).as("dv"), norm(asDouble(col(vecCol))).as("dn"))
    val matched = cand.join(dn, Seq(idCol)).join(bn, Seq("__bid"))
      .filter(dot(col("dv"), col("bv")) / (col("dn") * col("bn")) >= threshold)
      .select(idCol).distinct()
    reps.join(matched, Seq(idCol), "left_anti")
  }

  /** Exact top-k for a BATCH of query vectors in one corpus scan: the
    * serving-throughput shape. One query per scan (the
    * [[bruteForceTopK]] loop) reads the corpus q times; this joins the
    * broadcast query panel once and ranks per query with a window —
    * the corpus is read once regardless of panel size. Panels larger
    * than a broadcast chunk at the caller.
    */
  def bruteForceTopKBatch(embs: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int): DataFrame = {
    val q = embs.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"),
        asDouble(col(vecCol)).as("qv"), norm(asDouble(col(vecCol))).as("qn"))
    val scored = embs.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol),
        round(dot(asDouble(col(vecCol)), col("qv"))
          / (norm(asDouble(col(vecCol))) * col("qn")), 6).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col(idCol))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", idCol, "rk", "cos_sim")
  }

  /** Approximate top-k: candidates = vectors sharing any LSH bucket
    * with the query (union over tables), then exact cosine on the
    * candidate set only. Recall/cost tunes via Tables × BitsPerTable.
    */
  def annTopK(embs: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, dim: Int = Dim): DataFrame = {
    // sketch the ONE query row separately instead of filtering the
    // full sketch table — the corpus is sketched exactly once (the
    // previous shape computed all n×16 hyperplane projections twice)
    val qsk = sketches(embs.filter(col(idCol) === queryId), idCol, vecCol, dim)
      .select(col("table_id"), col("bucket"))
    val candidates = sketches(embs, idCol, vecCol, dim)
      .join(broadcast(qsk), Seq("table_id", "bucket"))
      .filter(col(idCol) =!= queryId)
      .select(idCol).distinct()
    val q = embs.filter(col(idCol) === queryId)
      .select(asDouble(col(vecCol)).as("qv"), norm(asDouble(col(vecCol))).as("qn"))
    embs.join(candidates, idCol)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        round(dot(asDouble(col(vecCol)), col("qv"))
          / (norm(asDouble(col(vecCol))) * col("qn")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
