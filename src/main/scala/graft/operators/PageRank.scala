package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative PageRank as a pure keyed-join loop (the Pregel shape
  * re-expressed relationally — no GraphX, no RDDs, no driver-side
  * adjacency).
  *
  * Per iteration the plan is: ranks ⋈ edges on `src`, then a
  * `groupBy(dst)` partial-then-final aggregate of the contributions.
  * The degree-annotated edge list is built ONCE, hash-partitioned by
  * `src`, and persisted — the cached partitioning satisfies the join
  * requirement every iteration, and the previous iteration's
  * `groupBy(dst)` leaves the rank vector hash-partitioned on the
  * same node key, so the steady-state loop pays ONE exchange per
  * iteration (the contribution aggregate) — the minimum a
  * distributed PR step needs once the rank vector no longer fits on
  * one machine.
  *
  * Determinism contract (the repo's never-sum-raw-doubles rule):
  * each contribution `rank/outdeg` is cast to DECIMAL(28,18) before
  * the per-destination sum, so the aggregate is associative-exact
  * and partitioning-independent; everything else is straight-line
  * IEEE double arithmetic, bit-identical across engines. An SQL
  * oracle that unrolls the same iterations hash-matches exactly.
  *
  * Caller contract: `edges` must cover every node on both sides —
  * i.e. no dangling nodes (every node has outdeg ≥ 1 and indeg ≥ 1).
  * Symmetrized (undirected) graphs satisfy this by construction; for
  * a general digraph, symmetrize first or add self-loops, otherwise
  * dangling mass silently leaks (the standard simplified-PR caveat).
  */
object PageRank {

  /** Symmetrize a directed edge list: every (src,dst) also appears as
    * (dst,src). Input need not be distinct; output is.
    */
  def undirected(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    e.unionByName(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** `iters` power iterations of r(v) = (1-d)/N + d·Σ_{u→v} r(u)/deg(u),
    * uniform 1/N start. Returns (id, pr) for every node.
    */
  def run(edges0: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val e = edges0.select(col("src").cast("long"), col("dst").cast("long"))
    val deg = graft.dedup.Dedup.persistTracked(
      e.groupBy("src").agg(count(lit(1)).as("outdeg"))
        .select(col("src").as("id"), col("outdeg")))
    // Degree-annotated edges, hash-partitioned by src BEFORE the
    // persist: every iteration's join reads the cached partitioning
    // instead of re-exchanging the (big) edge side.
    val ed = graft.dedup.Dedup.persistTracked(
      e.join(deg.withColumnRenamed("id", "src"), "src").repartition(col("src")))
    // N is a 1-row broadcast scalar (the C4 cross-scalar idiom), never
    // a driver collect — plan construction launches zero jobs.
    val n = deg.agg(count(lit(1)).as("nn"))

    var ranks = deg.crossJoin(broadcast(n))
      .select(col("id"), (lit(1.0) / col("nn")).as("pr"))
    for (_ <- 1 to iters) {
      ranks = ed.join(ranks, ed("src") === ranks("id"))
        .select(col("dst"), (col("pr") / col("outdeg")).as("c"))
        .groupBy("dst")
        .agg(sum(col("c").cast("decimal(28,18)")).cast("double").as("m"))
        .crossJoin(broadcast(n))
        .select(col("dst").as("id"),
          ((lit(1.0) - lit(damping)) / col("nn") + lit(damping) * col("m")).as("pr"))
    }
    ranks
  }
}
