package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (Kleinberg 1999) hub/authority scoring as a keyed-join power
  * iteration — the same Pregel-shape-as-relational-plan as
  * [[PageRank]]: per half-iteration ONE join of the score vector to
  * the persisted edge list and ONE partial-then-final aggregate on
  * the opposite endpoint.
  *
  * Determinism is stronger than PageRank's decimal-contribution
  * trick: with the standard all-ones start, the UNNORMALIZED scores
  * stay exact integers for every iteration (hub₁ = outdeg,
  * auth₁ = Σ outdeg over in-edges, … — weighted path counts), so the
  * whole fixpoint loop is DECIMAL(38,0) integer arithmetic with no
  * float op anywhere; normalization happens ONCE at the end against
  * a broadcast max scalar. An SQL oracle that unrolls the same
  * iterations hash-matches bit for bit.
  *
  * Scale note: unnormalized scores grow like σ₁^(2k) (σ₁ = top
  * singular value of the adjacency matrix), which is why the sums are
  * DECIMAL(38,0) rather than BIGINT — 38 digits holds k = 2 on a
  * billion-edge graph comfortably. For deep iteration counts on huge
  * graphs, normalize per-iteration instead (and accept the PageRank
  * decimal-cast determinism contract).
  */
object Hits {

  /** `iters` full hub→authority rounds over a directed bipartite-ok
    * edge list (src = hub side, dst = authority side). Returns
    * (hubs: (id, h), auths: (id, a)) with exact unnormalized integer
    * scores as DECIMAL(38,0).
    */
  def run(edges0: DataFrame, iters: Int): (DataFrame, DataFrame) = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    // Scores grow like σ₁^(2k) (scaladoc capacity argument): past k=4
    // even DECIMAL(38,0) can overflow on a large graph, and Spark's
    // non-ANSI decimal sum returns NULL *silently* where DuckDB errors
    // — fail loudly here instead of emitting absent/NULL fixpoints.
    require(iters <= 4,
      s"iters=$iters: unnormalized HITS scores grow like sigma1^(2k); " +
        "DECIMAL(38,0) capacity is only argued to k=4 — normalize per " +
        "iteration (see scaladoc) for deeper fixpoints")
    val e = graft.dedup.Dedup.persistTracked(
      edges0.select(col("src").cast("long"), col("dst").cast("long")).distinct())
    // auth₀ = 1 for every dst ⇒ hub₁ = outdeg, computed directly.
    var hubs = e.groupBy("src")
      .agg(count(lit(1)).cast("decimal(38,0)").as("h"))
    var auths: DataFrame = null
    for (k <- 1 to iters) {
      auths = e.join(hubs, "src")
        .groupBy("dst").agg(sum("h").as("a"))
      if (k < iters)
        hubs = e.join(auths, "dst")
          .groupBy("src").agg(sum("a").as("h"))
    }
    (hubs.select(col("src").as("id"), col("h")),
      auths.select(col("dst").as("id"), col("a")))
  }
}
