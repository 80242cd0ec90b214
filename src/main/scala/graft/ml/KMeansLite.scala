package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.SqDist

/** From-scratch distributed Lloyd's k-means over an embedding column —
  * the corpus-organization primitive (topic bucketing, stratified
  * mixture design, IVF coarse quantizers all start here). Scale shape
  * per iteration — the canonical single-stage aggregation Spark's own
  * MLlib k-means uses (public pattern: `runAlgorithmWithWeight`'s
  * per-partition sum/count accumulation):
  *
  *   - the k×d centroid matrix rides to executors as a broadcast
  *     (k·d·8 bytes), each partition assigns rows with tight primitive
  *     loops (bit-identical fold order to the codegen
  *     [[graft.functions.SqDist]]) and emits ONE record of k×d
  *     fixed-point sums + k counts + an SSE scalar;
  *   - there is NO shuffle anywhere in training — the per-partition
  *     partials collect straight to the driver (k·d·partitions longs,
  *     the repo's bounded-scalars rule) and combine exactly;
  *   - the RETURNED assignment is the declarative map-only
  *     [[assign]] (codegen SqDist against literal centroids), so
  *     downstream plans see a scan+project, never a join.
  *
  * Determinism: seeds are the k lowest-id vectors; per-element values
  * round to fixed-point scale 1e9 before summation, so accumulation is
  * integer-exact and ASSOCIATIVE — any partitioning, any combine
  * order, bit-identical model. Overflow of the 64-bit accumulators
  * (≈9.2e9 unit-scale rows per cluster per partition) fails loudly via
  * `Math.addExact` rather than silently wrapping; corpora near that
  * bound should train on a sample, which is standard quantizer
  * practice anyway. Argmin ties break toward the lowest cluster id.
  *
  * The corpus projection is persisted MEMORY_AND_DISK across
  * iterations (the multi-consumer convention; `Dedup.clearCaches`
  * releases it).
  */
object KMeansLite {

  /** Final distributed assignment plus the training trace. `inertia`
    * has one entry per EXECUTED iteration (fixed-point-exact
    * Σ round(dist, 9)) — training early-stops once centroids move less
    * than `tol`, so the trace may be shorter than maxIters; a correct
    * Lloyd's run is non-increasing after each (assign, update) pair.
    */
  final case class KMeansResult(
      assignment: DataFrame,
      centroids: Array[Array[Double]],
      inertia: Seq[Double],
  )

  // ONE ArrayType literal, not array(lit, lit, …): primitive literals
  // inline their values into the generated source, so repeated
  // assignment plans with new centroids would miss the codegen cache
  // and pay a full Janino compile; an array literal rides in the
  // references array and the source stays bit-identical across plans.
  private def centroidLit(c: Array[Double]): Column = typedLit(c)

  /** One assignment step against literal centroids: appends
    * (cluster, dist) to `cols` of `embs`. `vecCol` must already be
    * array<double>. Ties (exactly equal distances) go to the lowest
    * centroid index — `array_position` returns the FIRST match, which
    * is the same row `row_number() OVER (ORDER BY dist, cid)` keeps.
    */
  def assign(embs: DataFrame, vecCol: String, centroids: Seq[Array[Double]]): DataFrame = {
    val dists = array(centroids.map(c => SqDist(col(vecCol), centroidLit(c))): _*)
    embs.withColumn("__d", dists)
      .withColumn("cluster", (array_position(col("__d"), array_min(col("__d"))) - 1).cast("int"))
      .withColumn("dist", array_min(col("__d")))
      .drop("__d")
  }

  /** Fixed-point scale for exact associative accumulation (matches the
    * previous DECIMAL(28,9) SSE contract). */
  private val Scale = 1e9

  /** Lloyd's for up to `iters` iterations from the k lowest-`idCol`
    * seeds, stopping once every centroid moves less than `tol`
    * (Euclidean — the standard convergence rule, deterministic because
    * the movement is a pure function of the data; `tol = 0` forces all
    * `iters`). Empty clusters keep their previous centroid (the
    * standard degenerate-case rule; deterministic).
    */
  def lloyd(embs: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int,
      tol: Double = 1e-4): KMeansResult = {
    require(k >= 1 && iters >= 1, s"k=$k, iters=$iters must be >= 1")
    // Null/empty vectors would have no distance to any centroid (null
    // cluster downstream); exclude them from training and assignment
    // up front.
    val corpus = graft.dedup.Dedup.persistTracked(
      embs.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
        .select(col(idCol).as("__id"),
          transform(col(vecCol), _.cast("double")).as("__v")))

    var centroids: Array[Array[Double]] =
      corpus.orderBy("__id").limit(k).select("__v")
        .collect().map(_.getSeq[Double](0).toArray)
    val d = centroids.headOption.map(_.length).getOrElse(0)
    val inertia = Seq.newBuilder[Double]
    val sc = corpus.sparkSession.sparkContext
    // toRdd reads through the persisted InMemoryRelation — training
    // never re-derives the projection. Column 1 is __v.
    val rows = corpus.queryExecution.toRdd

    var converged = false
    for (_ <- 1 to iters if !converged) {
      val bc = sc.broadcast(centroids)
      // ONE stage, no shuffle: each partition assigns its rows with the
      // same min-length left-fold (a-b)² loop SqDist generates, and
      // emits a single (k×d sums, k counts, sse) record in fixed-point
      // longs — exact, associative, partitioning-independent.
      val partials = rows.mapPartitions { it =>
        val cents = bc.value
        val kk = cents.length
        val sums = Array.ofDim[Long](kk, d)
        val counts = new Array[Long](kk)
        var sse = 0L
        it.foreach { row =>
          val arr = row.getArray(1).toDoubleArray()
          var best = 0
          var bestD = Double.PositiveInfinity
          var c = 0
          while (c < kk) {
            val cent = cents(c)
            val n = math.min(arr.length, cent.length)
            var s = 0.0
            var i = 0
            while (i < n) { val dd = arr(i) - cent(i); s += dd * dd; i += 1 }
            if (s < bestD) { bestD = s; best = c } // strict < keeps the FIRST min
            c += 1
          }
          counts(best) += 1
          sse = Math.addExact(sse, Math.round(bestD * Scale))
          val m = math.min(d, arr.length)
          var i = 0
          while (i < m) {
            sums(best)(i) = Math.addExact(sums(best)(i), Math.round(arr(i) * Scale))
            i += 1
          }
        }
        Iterator.single((sums, counts, sse))
      }.collect() // ≤ #partitions records of k×d longs — bounded
      bc.destroy()

      val sums = Array.ofDim[Long](k, d)
      val counts = new Array[Long](k)
      var sse = 0L
      partials.foreach { case (ps, pc, pe) =>
        var c = 0
        while (c < k) {
          counts(c) = Math.addExact(counts(c), pc(c))
          var i = 0
          while (i < d) { sums(c)(i) = Math.addExact(sums(c)(i), ps(c)(i)); i += 1 }
          c += 1
        }
        sse = Math.addExact(sse, pe)
      }
      inertia += java.math.BigDecimal.valueOf(sse, 9).doubleValue
      val next = centroids.map(_.clone())
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var i = 0
          while (i < d) {
            // exact scale-9 sum ÷ count, like the previous decimal-sum
            // contract; DECIMAL64 division is deterministic
            next(c)(i) = java.math.BigDecimal.valueOf(sums(c)(i), 9)
              .divide(java.math.BigDecimal.valueOf(counts(c)),
                java.math.MathContext.DECIMAL64).doubleValue
            i += 1
          }
        } // empty cluster keeps its previous centroid
        c += 1
      }
      // Movement-based early stop (deterministic — movement is a pure
      // function of the data): every saved iteration is a saved job.
      converged = next.iterator.zip(centroids.iterator).forall { case (a, b) =>
        var s = 0.0
        var i = 0
        while (i < a.length) { val dd = a(i) - b(i); s += dd * dd; i += 1 }
        s < tol * tol
      }
      centroids = next
    }
    // Final assignment is consistent with the RETURNED centroids (one
    // more map-only pass — no extra shuffle).
    KMeansResult(
      assign(corpus, "__v", centroids.toSeq)
        .select(col("__id").as(idCol), col("cluster"), col("dist")),
      centroids, inertia.result())
  }
}
