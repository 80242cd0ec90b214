package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster formation: connected components over the near-dup
  * pair graph — the canonical final step of dedup at scale (pairs say
  * who matches whom; the component says which rows are one document,
  * so curation can keep exactly one representative per component even
  * when A~B and B~C but A and C never paired directly).
  *
  * Algorithm: iterative min-label propagation with pointer jumping.
  * Every vertex starts labeled with itself; each round every vertex
  * takes the minimum of its own label, its neighbors' labels, and its
  * label's label (the pointer jump — chains shorten geometrically, the
  * same shortcutting idea as large-star/small-star, Kiveris et al.,
  * "Connected Components in MapReduce and Beyond"); fixpoint = every
  * vertex carries its component's minimum id. Each round is two keyed
  * joins + one aggregate — all shuffle-bounded, nothing driver-side
  * except the scalar changed-count that decides convergence. Rounds:
  * O(log diameter); near-dup components are dense near-cliques, so
  * 2–3 rounds in practice, and maxIter=20 covers diameters far beyond
  * any real pair graph.
  */
object Clusters {

  /** (idCol, cluster_id) for every vertex; cluster_id = min id in the
    * vertex's connected component (vertices absent from `edges` are
    * their own singleton cluster). At warehouse scale, checkpoint
    * `labels` every ~10 rounds to cut lineage; here maxIter bounds it.
    */
  def connectedComponents(vertices: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, maxIter: Int = 20): DataFrame = {
    // symmetric edge list; self-loops add nothing to propagation. One
    // explode pass, NOT a union of the plan with its own reverse — the
    // union form materializes the (possibly expensive) edge-producing
    // subtree twice
    val sym = edges.select(explode(array(
        struct(col(srcCol).as("src"), col(dstCol).as("dst")),
        struct(col(dstCol).as("src"), col(srcCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .filter(col("src") =!= col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // `cached` is always the handle persist() was called on — the only
    // plan the cache knows; unpersisting a projection of it would be a
    // silent no-op and every round would stay pinned
    var cached = vertices.select(col(idCol).as("id"), col(idCol).as("label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = cached
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val nbrMin = sym.join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(min("label").as("nbr_min"))
      val stepped = labels.join(nbrMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
          col("label").as("prev"))
      // pointer-jump: additionally follow the label one hop
      // (label := label(label); labels are min-monotone so the hop
      // only ever decreases) — chains shorten geometrically, so a
      // path of length n converges in O(log n) rounds instead of n,
      // keeping maxIter=20 exact for any realistic component shape
      val jump = stepped.select(col("id").as("label"), col("label").as("jumped"))
      // carry the previous label through: the convergence count is a
      // filter over the SAME materialized round, not an extra join
      val round = stepped.join(jump, Seq("label"), "left_outer")
        .select(col("id"),
          least(col("label"), coalesce(col("jumped"), col("label"))).as("next"),
          col("prev"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = round.filter(col("next") =!= col("prev")).count()
      cached.unpersist(blocking = false)
      cached = round
      labels = round.select(col("id"), col("next").as("label"))
      converged = changed == 0
      it += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents: not converged after $maxIter rounds — labels may span partial components")
    sym.unpersist(blocking = false)
    // the final round stays persisted (the convergence count already
    // materialized it; unpersisting here would force the caller's
    // action to replay every iteration's lineage) — tracked so
    // Dedup.clearCaches releases it between corpora
    Dedup.track(cached)
    labels.select(col("id").as(idCol), col("label").as("cluster_id"))
  }

  /** Exact-duplicate edges (member → min-id representative of its text
    * group), keyed on fixed-width (xxhash64, length) like
    * [[Dedup.exactRepresentatives]] — a window over the hash groups,
    * no self-join on document bodies. Composes with near-dup pairs so
    * components span exact copies AND their near-duplicates.
    */
  def exactEdges(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(xxhash64(col(textCol)), length(col(textCol)))
    df.select(col(idCol).as("src"), min(col(idCol)).over(w).as("dst"))
      .filter(col("src") =!= col("dst"))
  }
}
