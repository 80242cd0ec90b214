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
    *
    * `disjointSides = true` skips the post-union distinct when the
    * caller can PROVE no collision is possible: the input is already
    * distinct AND src/dst draw from disjoint id domains (a bipartite
    * graph — q125/q336 encode customers as 2k, suppliers as 2k+1), so
    * (a,b) and its swap (b,a) can never both occur and the union is
    * distinct by construction. That elides one full-width exchange +
    * dedup over 2·|E| rows; the result is row-identical to the
    * distinct form (guide §2.4: a `distinct` on data that is already
    * unique is an accidental shuffle).
    */
  def undirected(edges: DataFrame, disjointSides: Boolean = false): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val u = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    if (disjointSides) u else u.distinct()
  }

  /** Shared setup: (deg, ed, n) — the persisted degree table, the
    * degree-annotated edge list hash-partitioned by src BEFORE the
    * persist (every iteration's join reads the cached partitioning
    * instead of re-exchanging the big edge side), and the node count
    * as a 1-row broadcastable scalar (the C4 cross-scalar idiom, never
    * a driver collect — plan construction launches zero jobs).
    */
  private def prepare(edges0: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    // `e` feeds BOTH the degree aggregate and the annotated edge list —
    // without a persist the whole edge-producing subtree (typically a
    // corpus-sized join + distinct) executes twice, once per consumer
    // (the q224 `w` / CC `stepped` finding, measured on q125: the
    // duplicated chain was ~2 s of the query)
    val e = graft.dedup.Dedup.persistTracked(
      edges0.select(col("src").cast("long"), col("dst").cast("long")))
    // `mark` (min dst per src) rides the degree aggregate for free: it
    // flags exactly one edge per source (edges are distinct), which is
    // how [[runObserved]] emits one prev-rank carrier row per node
    // without a second pass or a node-sized union branch.
    val deg = graft.dedup.Dedup.persistTracked(
      e.groupBy("src").agg(count(lit(1)).as("outdeg"), min(col("dst")).as("mark"))
        .select(col("src").as("id"), col("outdeg"), col("mark")))
    // (r12 A/B: additionally sortWithinPartitions("src") before the
    // persist — hoping SMJ would skip the per-iteration edge sort —
    // measured NEUTRAL-to-worse, 8.0 → 8.9 s on q125 same-window, so
    // the cached-partitioning-only form stays)
    val ed = graft.dedup.Dedup.persistTracked(
      e.join(deg.withColumnRenamed("id", "src"), "src").repartition(col("src")))
    val n = deg.agg(count(lit(1)).as("nn"))
    (deg, ed, n)
  }

  private def oneStep(ed: DataFrame, n: DataFrame, ranks: DataFrame,
      damping: Double): DataFrame =
    ed.join(ranks, ed("src") === ranks("id"))
      .select(col("dst"), (col("pr") / col("outdeg")).as("c"))
      .groupBy("dst")
      .agg(sum(col("c").cast("decimal(28,18)")).cast("double").as("m"))
      .crossJoin(broadcast(n))
      .select(col("dst").as("id"),
        ((lit(1.0) - lit(damping)) / col("nn") + lit(damping) * col("m")).as("pr"))

  /** `iters` power iterations of r(v) = (1-d)/N + d·Σ_{u→v} r(u)/deg(u),
    * uniform 1/N start. Returns (id, pr) for every node.
    */
  def run(edges0: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val (deg, ed, n) = prepare(edges0)
    var ranks = deg.crossJoin(broadcast(n))
      .select(col("id"), (lit(1.0) / col("nn")).as("pr"))
    for (_ <- 1 to iters) ranks = oneStep(ed, n, ranks, damping)
    ranks
  }

  /** [[run]] with convergence observability — the piece a fixed
    * unrolled iteration count lacks at 100× scale, where you cannot
    * tell whether `iters` sufficed without re-running: each iteration
    * emits its L1 residual Σ|pr_i − pr_{i-1}| as an observed metric
    * (`graft_pr__res<i>_h<semanticHash>` — the [[graft.dedup.Dedup]]
    * observe discipline: the name is a deterministic function of the
    * subtree so CacheManager's identical-plan dedupe keeps firing, and
    * recording it costs no extra job), and the output carries a
    * per-node `settled` flag: |pr − prev_pr| < relTol·pr at the final
    * iteration. FALSE rows mean another iteration would still move
    * that node by more than relTol — the q330 `settled` contract.
    *
    * Plan shape: STILL one exchange per iteration, and `ranks` is
    * referenced exactly ONCE per iteration — both constraints are
    * load-bearing. The previous rank reaches the new one not by a
    * second join but by riding the contribution shuffle: the ONE
    * edge per source flagged by `mark` (min dst, computed for free
    * in the degree aggregate) explodes into its contribution (key =
    * dst) plus a single carrier row (key = src, the source's own
    * pr); every other edge row passes through one-to-one. The SAME
    * groupBy then recovers prev_pr as `max` over the per-node
    * singleton next to the summed contributions, so the shuffle
    * grows by |nodes| rows, not |edges|. Three rejected cuts,
    * measured on the q125 bench (11.5 s same-window reference):
    * joining each iteration against a persisted previous vector
    * (extra join + 5 materialization barriers → 18.6 s), a union
    * referencing `ranks` twice per iteration (lineage doubles per
    * iteration → 2^iters logical subtrees → 42.8 s), and an
    * unconditional 2-way explode (2× pre-aggregate rows → 17.6 s).
    * The residual sum is DECIMAL-cast — associative-exact,
    * partitioning-independent — and pr values are bit-identical to
    * [[run]]'s, so an SQL oracle joining r_i with r_{i-1}
    * reproduces `settled` exactly.
    */
  def runObserved(edges0: DataFrame, iters: Int, damping: Double = 0.85,
      relTol: Double = 1e-3): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val (deg, ed, n) = prepare(edges0)
    var ranks = deg.crossJoin(broadcast(n))
      .select(col("id"), (lit(1.0) / col("nn")).as("pr"))
    var out: DataFrame = null
    val nullD = lit(null).cast("double")
    for (i <- 1 to iters) {
      val contrib = struct(col("dst").as("k"),
        (col("pr") / col("outdeg")).as("c"), nullD.as("p"))
      val carrier = struct(col("src").as("k"), nullD.as("c"), col("pr").as("p"))
      val stepped = ed.join(ranks, ed("src") === ranks("id"))
        .select(explode(when(col("dst") === col("mark"), array(contrib, carrier))
          .otherwise(array(contrib))).as("x"))
        .select(col("x.k").as("dst"), col("x.c").as("c"), col("x.p").as("p"))
        .groupBy("dst")
        .agg(sum(col("c").cast("decimal(28,18)")).cast("double").as("m"),
          max(col("p")).as("__prev")) // carrier copies are bit-identical
        .crossJoin(broadcast(n))
        .select(col("dst").as("id"),
          ((lit(1.0) - lit(damping)) / col("nn") + lit(damping) * col("m")).as("pr"),
          col("__prev"))
      val observed = stepped.observe(
        s"graft_pr__res${i}_h${stepped.queryExecution.analyzed.semanticHash()}",
        sum(abs(col("pr") - col("__prev")).cast("decimal(28,18)"))
          .cast("double").as("l1_residual"))
      out = observed.select(col("id"), col("pr"),
        (abs(col("pr") - col("__prev")) < lit(relTol) * col("pr")).as("settled"))
      ranks = out.select("id", "pr")
    }
    out
  }

  /** Personalized PageRank: teleport mass restricted to the seed set —
    * r(v) = (1-d)·1[seed(v)]/|S| + d·Σ_{u→v} r(u)/deg(u), started from
    * the teleport vector itself. `isSeed` is a boolean Column over
    * `col("id")` and must be a PURE function of the id (no data joins),
    * so the per-iteration teleport term is a map-side expression and
    * each iteration still pays exactly [[run]]'s one exchange. |S| and
    * N ride one broadcast scalar row (never a driver collect); the
    * contribution sum keeps [[run]]'s DECIMAL(28,18) exactness, so an
    * SQL oracle unrolling the same iterations hash-matches. Same
    * caller contract as [[run]] (no dangling nodes).
    */
  def personalized(edges0: DataFrame, isSeed: org.apache.spark.sql.Column,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters=$iters must be >= 1")
    val (deg, ed, n0) = prepare(edges0)
    // (nn, ns) in one broadcastable scalar row
    val n = deg.agg(count(lit(1)).as("nn"),
      sum(when(isSeed, 1L).otherwise(0L)).as("ns"))
    def teleport = when(isSeed, lit(1.0) / col("ns")).otherwise(lit(0.0))
    var ranks = deg.crossJoin(broadcast(n)).select(col("id"), teleport.as("pr"))
    for (_ <- 1 to iters) {
      ranks = ed.join(ranks, ed("src") === ranks("id"))
        .select(col("dst"), (col("pr") / col("outdeg")).as("c"))
        .groupBy("dst")
        .agg(sum(col("c").cast("decimal(28,18)")).cast("double").as("m"))
        .crossJoin(broadcast(n))
        .select(col("dst").as("id"), col("m"), col("ns"))
        .select(col("id"),
          ((lit(1.0) - lit(damping)) * teleport + lit(damping) * col("m")).as("pr"))
    }
    ranks
  }
}

/** Hop distances by unrolled Bellman-Ford relaxation — the
  * shortest-path primitive behind hop plots, effective-diameter
  * estimates, and seed-proximity features, in the same
  * one-exchange-per-round shape as [[PageRank]]: each round relaxes
  * d(v) = min(d(v), min over in-neighbors d(u)+1) with the previous
  * distance riding the SAME groupBy as a carrier row (the `mark`
  * min-dst flag — one carrier per node, so `ranks`-style state is
  * referenced exactly once per round and the lineage stays linear).
  * Distances are exact integers, so the SQL oracle (UNION ALL of the
  * relax and carry rows per round) matches bit for bit.
  */
object Bfs {

  /** Distance ceiling standing in for +∞ (exact integer arithmetic —
    * Int.MaxValue would overflow the +1 relaxation).
    */
  val Unreached = 999999L

  /** `rounds` relaxations from `seeds` (a 1-column id frame, usually a
    * broadcastable handful). Returns (id, d) for EVERY node of
    * `edges0`; nodes farther than `rounds` hops (or disconnected) keep
    * d = [[Unreached]]. Caller contract: every node appears as a
    * src (symmetrized graphs satisfy this by construction).
    */
  def hops(edges0: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    val e = edges0.select(col("src").cast("long"), col("dst").cast("long"))
    val ed = graft.dedup.Dedup.persistTracked(
      e.groupBy("src").agg(min(col("dst")).as("mark"))
        .join(e, "src").repartition(col("src")))
    val s = seeds.select(col(seeds.columns.head).cast("long").as("id"))
      .distinct().withColumn("__s", lit(1))
    var d = ed.select(col("src").as("id")).distinct()
      .join(broadcast(s), Seq("id"), "left_outer")
      .select(col("id"),
        when(col("__s").isNotNull, lit(0L)).otherwise(lit(Unreached)).as("d"))
    for (_ <- 1 to rounds) {
      val relax = struct(col("dst").as("k"), (col("d") + 1L).as("v"))
      val carry = struct(col("src").as("k"), col("d").as("v"))
      d = ed.join(d, ed("src") === d("id"))
        .select(explode(when(col("dst") === col("mark"), array(relax, carry))
          .otherwise(array(relax))).as("x"))
        .groupBy(col("x.k").as("id"))
        .agg(min(col("x.v")).as("d"))
    }
    d
  }
}

/** Triangle counting by degree-ordered orientation (Schank/Wagner
  * forward counting) — the at-scale algorithm, not the naive 3-way
  * self-join. Every undirected edge is oriented ascending by
  * (degree, id), so a triangle a≺b≺c is found exactly once: as the
  * wedge at its lowest-order apex (a→b, a→c) closed by the oriented
  * edge b→c. Wedge fan-out per node is bounded by OUT-degree, which
  * the orientation caps at O(√m) — power-law hubs don't blow up the
  * join. Joins are keyed (wedges on the apex, closure on the (v,w)
  * edge key); values are exact integers; the oriented edge list is
  * persisted once and reused by all three legs.
  */
object Triangles {

  /** Per-node triangle membership counts over canonical undirected
    * edges (`src` < `dst`, pre-deduplicated). Nodes in no triangle
    * are absent. Output: (id, n_tri).
    */
  def perNode(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("sa"), col("dst").cast("long").as("sb"))
    val deg = e.select(col("sa").as("id")).unionByName(e.select(col("sb").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    // one sortable key for the (degree, id) total order; ids must fit
    // 32 bits below a 2^32 degree multiplier
    val ord = deg.select(col("id"), (col("d") * lit(4294967296L) + col("id")).as("ord"))
    val o = e.join(ord.as("oa"), col("sa") === col("oa.id"))
      .join(ord.as("ob"), col("sb") === col("ob.id"))
      .select(
        when(col("oa.ord") < col("ob.ord"), col("sa")).otherwise(col("sb")).as("u"),
        when(col("oa.ord") < col("ob.ord"), col("sb")).otherwise(col("sa")).as("v"),
        greatest(col("oa.ord"), col("ob.ord")).as("ordv"))
    val op = graft.dedup.Dedup.persistTracked(o)
    val tri = op.as("w1").join(op.as("w2"),
        col("w1.u") === col("w2.u") && col("w1.ordv") < col("w2.ordv"))
      .join(op.as("cl"), col("cl.u") === col("w1.v") && col("cl.v") === col("w2.v"))
      .select(col("w1.u").as("a"), col("w1.v").as("b"), col("w2.v").as("c"))
    tri.select(col("a").as("id"))
      .unionByName(tri.select(col("b").as("id")))
      .unionByName(tri.select(col("c").as("id")))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
  }
}
