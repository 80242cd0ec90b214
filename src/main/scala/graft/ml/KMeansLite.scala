package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.SqDist

/** From-scratch distributed Lloyd's k-means over an embedding column —
  * the corpus-organization primitive (topic bucketing, stratified
  * mixture design, IVF coarse quantizers all start here). Scale shape
  * per iteration:
  *
  *   - **assignment** is map-only: the k×d centroid matrix rides to
  *     executors as literal arrays (k·d·8 bytes — trivially broadcast),
  *     each row folds k codegen [[graft.functions.SqDist]] loops and
  *     takes the first argmin. No shuffle, no UDF.
  *   - **update** is one keyed aggregation: a k-group group-by whose
  *     rows carry d per-dimension decimal sums + counts as COLUMNS —
  *     map-side partial aggregation makes the shuffle k·partitions
  *     rows of width O(d), independent of corpus size (and d× fewer
  *     shuffle rows than a posexplode-to-(cluster,dim) shape).
  *   - the ONLY driver-side data ever collected is the k×d centroid
  *     matrix and the per-iteration inertia scalar (the repo's
  *     bounded-scalars rule); assignments stay distributed.
  *
  * Determinism: seeds are the k lowest-id vectors, centroid means and
  * inertia are DECIMAL-summed (associative-exact at any partitioning),
  * and argmin ties break toward the lowest cluster id — a re-run on a
  * different partitioning reproduces the model bit for bit.
  *
  * The corpus projection is persisted MEMORY_AND_DISK across
  * iterations (the multi-consumer convention; `Dedup.clearCaches`
  * releases it).
  */
object KMeansLite {

  /** Final distributed assignment plus the training trace. `inertia`
    * has one entry per iteration (decimal-exact Σ round(dist, 9)); a
    * correct Lloyd's run is non-increasing after each (assign, update)
    * pair.
    */
  final case class KMeansResult(
      assignment: DataFrame,
      centroids: Array[Array[Double]],
      inertia: Seq[Double],
  )

  private def centroidLit(c: Array[Double]): Column = array(c.map(lit): _*)

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

  /** Lloyd's for `iters` iterations from the k lowest-`idCol` seeds.
    * Empty clusters keep their previous centroid (the standard
    * degenerate-case rule; deterministic).
    */
  def lloyd(embs: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): KMeansResult = {
    require(k >= 1 && iters >= 1, s"k=$k, iters=$iters must be >= 1")
    // Null/empty vectors would make every SqDist null (null cluster →
    // NPE in the update loop) or vanish from the posexplode; exclude
    // them from training and assignment up front.
    val corpus = graft.dedup.Dedup.persistTracked(
      embs.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
        .select(col(idCol).as("__id"),
          transform(col(vecCol), _.cast("double")).as("__v")))

    var centroids: Array[Array[Double]] =
      corpus.orderBy("__id").limit(k).select("__v")
        .collect().map(_.getSeq[Double](0).toArray)
    val inertia = Seq.newBuilder[Double]

    val d = centroids.headOption.map(_.length).getOrElse(0)
    for (_ <- 1 to iters) {
      // One pass produces both the trace scalar and the k·d means: a
      // single k-group aggregate carrying d per-dimension decimal sums
      // (NOT a posexplode to (cluster, dim) — that multiplies the
      // shuffle row count by d for no information gain).
      val dimAggs = (0 until d).flatMap { i =>
        val x = element_at(col("__v"), i + 1)
        Seq(sum(x.cast("decimal(28,12)")).as(s"s$i"), count(x).as(s"n$i"))
      }
      val upd = assign(corpus, "__v", centroids.toSeq)
        .groupBy("cluster")
        .agg(sum(round(col("dist"), 9).cast("decimal(28,9)")).as("sse"), dimAggs: _*)
        .collect()
      // Fold per-cluster SSEs in BigDecimal (exact, order-independent):
      // collect() row order follows shuffle-block arrival, so a double
      // fold here could differ across runs and break the bit-for-bit
      // reproducibility contract.
      inertia += upd.iterator
        .map(r => Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO))
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)).doubleValue
      val next = centroids.map(_.clone())
      upd.foreach { r =>
        val c = r.getInt(0)
        var i = 0
        while (i < d) {
          val s = r.getDecimal(2 + 2 * i)
          val n = r.getLong(3 + 2 * i)
          // a dimension with zero non-null entries keeps its previous
          // coordinate (mirrors the empty-cluster rule)
          if (s != null && n > 0)
            next(c)(i) = s.divide(java.math.BigDecimal.valueOf(n),
              java.math.MathContext.DECIMAL64).doubleValue
          i += 1
        }
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
