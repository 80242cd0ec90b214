package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Graph analytics over warehouse entities. Connected components
  * (dedup clustering) live in `dedup.Clusters`; this module holds the
  * rank-propagation side: PageRank over the customer↔supplier
  * purchase graph — "which suppliers sit at the center of the
  * purchase network" is the graph-shaped question the reference's
  * dashboard answers with flat top-N counts (`dashboard.py` top
  * providers), upgraded to structure-aware centrality.
  */
object Graph {

  val all: Seq[Q] = Seq(pagerank, triangles, itemSimilarity, alsRecommend, hits,
    frequentPairs, labelPropagation, clusteringCoefficient, degreePowerLaw,
    textrankKeywords, kcorePeel, bfsHops, personalizedPagerank,
    degreeAssortativity, wccSizes)

  // --- q166: frequent item pairs with lift (association rules) ------------
  // Market-basket mining, the a-priori way: items below min-support 10
  // are pruned BEFORE any pair is generated (the monotonicity
  // guarantee — an infrequent item can't be in a frequent pair), so
  // the self-join on the basket key fans out only over frequent items
  // per basket, never the raw catalog² (the q127 inverted-index
  // stance on transactions). Lift is integer-ratio arithmetic:
  // support·n_tx / (sup_a·sup_b) on exact counts, rounded for
  // presentation. q132's cosine similarity answers "which items sit
  // in similar baskets"; this answers the rules question "which
  // co-occurrences beat independence, with what confidence floor".
  def frequentPairs: Q = Q(
    "q166_frequent_pairs",
    """WITH tx AS (SELECT DISTINCT l_orderkey AS oid, l_partkey AS item FROM lineitem),
      |n AS (SELECT count(DISTINCT oid) AS n_tx FROM tx),
      |freq AS (SELECT item, count(*) AS sup FROM tx GROUP BY item
      |         HAVING count(*) >= 10),
      |ft AS (SELECT tx.oid, tx.item, f.sup FROM tx JOIN freq f USING (item)),
      |p AS (SELECT a.item AS item_a, b.item AS item_b, count(*) AS sup_ab,
      |        max(a.sup) AS sup_a, max(b.sup) AS sup_b
      |      FROM ft a JOIN ft b ON a.oid = b.oid AND a.item < b.item
      |      GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT item_a, item_b, CAST(sup_ab AS BIGINT) AS support,
      |  round(CAST(sup_ab * (SELECT n_tx FROM n) AS DOUBLE)
      |    / (sup_a * sup_b), 6) AS lift
      |FROM p ORDER BY support DESC, item_a, item_b LIMIT 30""".stripMargin,
  ) { (s, dir) =>
    // tx feeds three consumers (n_tx, item supports, the pair join);
    // ft feeds both sides of the basket self-join — persist both
    val tx = graft.dedup.Dedup.persistTracked(Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("oid"), col("l_partkey").as("item")).distinct())
    val n = tx.agg(countDistinct("oid").as("n_tx"))
    // three consumers now (ft's filter + the two post-aggregate
    // support joins) — persist the catalog-sized support table
    val freq = graft.dedup.Dedup.persistTracked(
      tx.groupBy("item").agg(count(lit(1)).as("sup"))
        .filter(col("sup") >= 10))
    val ft = graft.dedup.Dedup.persistTracked(
      tx.join(freq.select("item"), "item")) // catalog-sized: deliberately unhinted
    // supports join AFTER the pair aggregate (guide §2.3 project before
    // the exchange): sup_a/sup_b are functions of the item keys, so
    // carrying them through the basket self-join doubled every pair
    // row's shuffle width for values a catalog-sized join recovers from
    // ≤ |items| aggregated rows
    val pairs = ft.select(col("oid"), col("item").as("item_a"))
      .join(ft.select(col("oid"), col("item").as("item_b")), Seq("oid"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("sup_ab"))
      .filter(col("sup_ab") >= 2)
      .join(freq.select(col("item").as("item_a"), col("sup").as("sup_a")), "item_a")
      .join(freq.select(col("item").as("item_b"), col("sup").as("sup_b")), "item_b")
    pairs.crossJoin(broadcast(n)) // 1-row scalar
      .select(col("item_a"), col("item_b"), col("sup_ab").as("support"),
        round((col("sup_ab") * col("n_tx")).cast("double")
          / (col("sup_a") * col("sup_b")), 6).as("lift"))
      .orderBy(col("support").desc, col("item_a"), col("item_b")).limit(30)
  }

  // --- q157: HITS hubs & authorities ---------------------------------------
  // The directional complement to q125's PageRank: on the
  // customer→supplier purchase graph, hub scores find the customers
  // whose baskets span the influential suppliers, authority scores
  // the suppliers those hub customers concentrate on. Two full
  // power-iteration rounds via operators.Hits — exact DECIMAL(38,0)
  // integer arithmetic end to end (see Hits scaladoc); the only
  // float op is the final normalization against a broadcast max
  // scalar, identical in both engines. Per half-iteration the plan
  // is one keyed join + one partial-agg'd groupBy against the
  // persisted edge list — no adjacency ever leaves the executors.
  def hits: Q = Q(
    "q157_hits",
    """WITH e AS (SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |h1 AS (SELECT src, CAST(count(*) AS DECIMAL(38,0)) AS h FROM e GROUP BY src),
      |a1 AS (SELECT dst, CAST(sum(h) AS DECIMAL(38,0)) AS a
      |       FROM e JOIN h1 USING (src) GROUP BY dst),
      |h2 AS (SELECT src, CAST(sum(a) AS DECIMAL(38,0)) AS h
      |       FROM e JOIN a1 USING (dst) GROUP BY src),
      |a2 AS (SELECT dst, CAST(sum(h) AS DECIMAL(38,0)) AS a
      |       FROM e JOIN h2 USING (src) GROUP BY dst),
      |mh AS (SELECT CAST(max(h) AS DOUBLE) AS m FROM h2),
      |ma AS (SELECT CAST(max(a) AS DOUBLE) AS m FROM a2)
      |SELECT role, id, raw, score FROM (
      |  SELECT 'authority' AS role, dst AS id, CAST(a AS DOUBLE) AS raw,
      |    round(CAST(a AS DOUBLE) / (SELECT m FROM ma), 12) AS score FROM a2
      |  UNION ALL
      |  SELECT 'hub' AS role, src AS id, CAST(h AS DOUBLE) AS raw,
      |    round(CAST(h AS DOUBLE) / (SELECT m FROM mh), 12) AS score FROM h2)
      |ORDER BY role, score DESC, id LIMIT 40""".stripMargin,
  ) { (s, dir) =>
    val edges = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
    val (hubs0, auths0) = graft.operators.Hits.run(edges, iters = 2)
    // each side has two consumers (the max-scalar aggregate and the
    // scored output) — persist, or the whole iteration DAG re-runs
    // per consumer per side
    val hubs = graft.dedup.Dedup.persistTracked(hubs0)
    val auths = graft.dedup.Dedup.persistTracked(auths0)
    def scored(df: DataFrame, c: String, role: String) = {
      val mx = df.agg(max(col(c)).cast("double").as("m"))
      df.crossJoin(broadcast(mx)) // 1-row scalar
        .select(lit(role).as("role"), col("id"),
          col(c).cast("double").as("raw"),
          round(col(c).cast("double") / col("m"), 12).as("score"))
    }
    scored(auths, "a", "authority").unionByName(scored(hubs, "h", "hub"))
      .orderBy(col("role"), col("score").desc, col("id")).limit(40)
  }

  // --- q141: ALS matrix-factorization recommendations ----------------------
  // The model-based half of the recommender family (q132 is the
  // memory-based half): factor the customer×supplier purchase-count
  // matrix with from-scratch distributed ALS-WR (ml.AlsLite — keyed
  // joins only, per-group exact ridge solves, neither factor matrix
  // ever broadcast or collected during training/scoring), then
  // recommend the top-3 UNSEEN suppliers for a bounded 10-customer
  // panel. Candidate generation is panel × items (the q101
  // batch-top-k shape — bounded by the panel, not the catalog) minus
  // seen pairs via anti-join. Training stays spec-gated (AlsSpec:
  // monotone regularized objective, bit-identical factors across
  // partitionings, rank-1 recovery, hand-checked ridge solve) — an
  // iterative factorization has no single-SQL oracle — but SERVING is
  // deterministic given the trained factors, so the q61/q94
  // trained-literal pattern applies: the 10 panel user factors plus
  // the item catalog's factors are emitted as SQL literals
  // (Double.toString round-trips exactly) and DuckDB independently
  // replays candidate generation, the 0.0-seeded left-fold dot
  // product (list_prepend matches aggregate's init), the rank, and
  // the rounding. The two collects are serving-side and bounded: 10
  // user rows + one row per catalog item (suppliers — a catalog, not
  // a fact table; the factor matrix that scales with USERS is never
  // collected).
  def alsRecommend: Q = Q.dynamicOracle("q141_als_recommend") { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ratings = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("u"), col("l_suppkey").as("i"))
      .agg(count(lit(1)).as("r"))
    val m = graft.ml.AlsLite.train(ratings, "u", "i", "r", k = 8, iters = 2, lambda = 0.1,
      traceObjective = false)
    val panel = ratings.select("u").distinct().orderBy("u").limit(10)
    val items = ratings.select("i").distinct()
    val candidates = panel.crossJoin(items) // bounded: 10 × catalog
      .join(ratings.select("u", "i"), Seq("u", "i"), "left_anti")
    val scored = graft.ml.AlsLite.predict(candidates, m.userFactors, m.itemFactors, "u", "i")
    val rk = row_number().over(Window.partitionBy("u").orderBy(col("pred").desc, col("i")))
    val df = scored.withColumn("rk", rk).filter(col("rk") <= 3)
      .select(col("u"), col("i"), round(col("pred"), 6).as("pred"), col("rk"))
      .orderBy("u", "rk")
    def lits(f: DataFrame): String = f
      .select(col("id"), col("f")).collect()
      .map { r =>
        val fs = r.getAs[scala.collection.Seq[Double]]("f")
          .map(java.lang.Double.toString).mkString("[", ", ", "]")
        s"(${r.getLong(0)}, CAST($fs AS DOUBLE[]))"
      }.sorted.mkString(", ")
    val panelUf = m.userFactors.join(panel, m.userFactors("id") === panel("u")).select("id", "f")
    val sql =
      s"""WITH uf(u, f) AS (VALUES ${lits(panelUf)}),
         |itf(i, f) AS (VALUES ${lits(m.itemFactors)}),
         |ratings AS (SELECT o_custkey AS u, l_suppkey AS i, count(*) AS r
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2),
         |panel AS (SELECT DISTINCT u FROM ratings ORDER BY u LIMIT 10),
         |cand AS (SELECT p.u, it.i
         |  FROM panel p CROSS JOIN (SELECT DISTINCT i FROM ratings) it
         |  WHERE NOT EXISTS (SELECT 1 FROM ratings r WHERE r.u = p.u AND r.i = it.i)),
         |scored AS (SELECT c.u, c.i,
         |    list_reduce(list_prepend(0.0, list_transform(range(1, 9),
         |      j -> uf.f[j] * itf.f[j])), (x, y) -> x + y) AS pred
         |  FROM cand c JOIN uf ON uf.u = c.u JOIN itf ON itf.i = c.i),
         |rk AS (SELECT u, i, pred,
         |    row_number() OVER (PARTITION BY u ORDER BY pred DESC, i) AS rk
         |  FROM scored)
         |SELECT u, i, round(pred, 6) AS pred, rk FROM rk WHERE rk <= 3
         |ORDER BY u, rk""".stripMargin
    (df, sql)
  }

  /** Distinct (customer, supplier) purchase pairs — the bipartite
    * incidence both co-purchase queries project through — with the
    * hot-customer cap applied: both consumers self-join this table on
    * the customer key, so a hub customer linked to k suppliers emits
    * O(k²) pairs. [[graft.dedup.Dedup.capHotKeys]] drops customers
    * over [[graft.dedup.Dedup.DefaultHotKeyCap]] from pair generation
    * (observed-metric drop logging, same stance as the shingle df
    * cap); at TPC-H shape no customer approaches the cap (~30 distinct
    * suppliers each), so sf-scale results are unchanged, while an
    * adversarial hub corpus stays bounded (ScaleToolsSpec pins the
    * drop).
    */
  private def custSupp(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.dedup.Dedup.capHotKeys(
      Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sp")).distinct(),
      "c", "custSuppPairs")

  /** The persisted ≥190-shared-customers supplier projection (sa < sb)
    * — the pair join is the dominant cost of the co-purchase graph
    * family, so q131 (triangles), q263 (power law) and q330 (k-core)
    * all build THIS identical plan and CacheManager serves them from
    * one materialization per (JVM, corpus).
    */
  private def coPurchaseEdges(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    // persist BEFORE the self-join: both join sides reference cs, so an
    // un-persisted cs executes the corpus-sized orders⋈lineitem +
    // distinct + hot-cap chain twice when the projection materializes
    // (the q125 `prepare` finding). CacheManager dedupes this entry
    // with q132's identical custSupp persist — one materialization per
    // (session, corpus) either way.
    val cs = graft.dedup.Dedup.persistTracked(custSupp(s, dir))
    graft.dedup.Dedup.persistTracked(cs.as("a").join(cs.as("b"),
        col("a.c") === col("b.c") && col("a.sp") < col("b.sp"))
      .groupBy(col("a.sp").as("sa"), col("b.sp").as("sb"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 190)
      .select("sa", "sb"))
  }

  // def, not val: `val all` above runs at object init, before vals
  // declared below it (the Embeddings.EmbDim rule)
  private def CustSuppSql =
    s"""cs0 AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |hotc AS (SELECT c FROM cs0 GROUP BY c
      |         HAVING count(*) > ${graft.dedup.Dedup.DefaultHotKeyCap}),
      |cs AS (SELECT cs0.c, cs0.sp FROM cs0 WHERE NOT EXISTS (
      |         SELECT 1 FROM hotc WHERE hotc.c = cs0.c))""".stripMargin

  // --- q131: triangle counting, degree-ordered orientation ---------------
  // Triangles in the supplier co-purchase graph (suppliers linked when
  // they share ≥ 190 customers — the projection threshold that keeps
  // the graph sparse). The at-scale algorithm, not the naive 3-way
  // self-join: every edge is ORIENTED ascending by (degree, id), so a
  // triangle a≺b≺c is found exactly once — as the wedge at its
  // lowest-order apex closed by one oriented-edge lookup — and
  // per-node wedge fan-out is bounded by out-degree ≤ O(√m) instead
  // of max degree (Schank/Wagner forward counting; the reason
  // power-law hubs don't blow up the join). All joins are keyed
  // (wedge on apex, closure on the (v,w) edge key); all values exact
  // integers.
  def triangles: Q = Q(
    "q131_triangles",
    s"""WITH $CustSuppSql,
      |e AS (SELECT a.sp AS sa, b.sp AS sb FROM cs a JOIN cs b ON a.c = b.c AND a.sp < b.sp
      |      GROUP BY 1, 2 HAVING count(*) >= 190),
      |deg AS (SELECT id, count(*) AS d FROM
      |        (SELECT sa AS id FROM e UNION ALL SELECT sb AS id FROM e) GROUP BY id),
      |ord AS (SELECT id, d * 4294967296 + id AS ord FROM deg),
      |o AS (SELECT CASE WHEN oa.ord < ob.ord THEN e.sa ELSE e.sb END AS u,
      |        CASE WHEN oa.ord < ob.ord THEN e.sb ELSE e.sa END AS v,
      |        CASE WHEN oa.ord < ob.ord THEN ob.ord ELSE oa.ord END AS ordv
      |      FROM e JOIN ord oa ON e.sa = oa.id JOIN ord ob ON e.sb = ob.id),
      |tri AS (SELECT w1.u AS a, w1.v AS b, w2.v AS c
      |        FROM o w1 JOIN o w2 ON w1.u = w2.u AND w1.ordv < w2.ordv
      |        JOIN o cl ON cl.u = w1.v AND cl.v = w2.v),
      |pern AS (SELECT id, CAST(count(*) AS BIGINT) AS n_tri FROM
      |         (SELECT a AS id FROM tri UNION ALL SELECT b AS id FROM tri
      |          UNION ALL SELECT c AS id FROM tri) GROUP BY id)
      |SELECT id, n_tri FROM pern ORDER BY n_tri DESC, id LIMIT 15""".stripMargin,
  ) { (s, dir) =>
    val e = coPurchaseEdges(s, dir)
    graft.operators.Triangles.perNode(e.select(col("sa").as("src"), col("sb").as("dst")))
      .orderBy(col("n_tri").desc, col("id")).limit(15)
  }

  // --- q132: item-item cosine similarity (co-purchase recommender) --------
  // "Customers who bought from s also bought from t": cosine over the
  // suppliers' binary customer-incidence vectors, sim = |Ca∩Cb| /
  // √(|Ca|·|Cb|). Pair generation is the inverted-index join on the
  // shared customer key (the repo's only sanctioned pair shape —
  // never all-pairs); per-supplier customer counts ride back on a
  // broadcast; top-3 neighbors per supplier via a partitioned window.
  def itemSimilarity: Q = Q(
    "q132_item_similarity",
    s"""WITH $CustSuppSql,
      |cnt AS (SELECT sp, count(*) AS n FROM cs GROUP BY sp),
      |p AS (SELECT a.sp AS sa, b.sp AS sb, count(*) AS shared
      |      FROM cs a JOIN cs b ON a.c = b.c AND a.sp < b.sp GROUP BY 1, 2),
      |sym AS (SELECT sa AS s, sb AS o, shared FROM p
      |        UNION ALL SELECT sb AS s, sa AS o, shared FROM p),
      |sim AS (SELECT s, o, CAST(shared AS BIGINT) AS shared,
      |    CAST(shared AS DOUBLE) / sqrt(CAST(ca.n * cb.n AS DOUBLE)) AS cos
      |  FROM sym JOIN cnt ca ON sym.s = ca.sp JOIN cnt cb ON sym.o = cb.sp),
      |rk AS (SELECT s, o, shared, cos,
      |    row_number() OVER (PARTITION BY s ORDER BY cos DESC, o) AS rk FROM sim)
      |SELECT s, o, shared, round(cos, 6) AS cos, CAST(rk AS BIGINT) AS rk
      |FROM rk WHERE rk <= 3 ORDER BY s, rk""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val cs = graft.dedup.Dedup.persistTracked(custSupp(s, dir))
    val cnt = cs.groupBy(col("sp")).agg(count(lit(1)).as("n"))
    val p = cs.as("a").join(cs.as("b"),
        col("a.c") === col("b.c") && col("a.sp") < col("b.sp"))
      .groupBy(col("a.sp").as("sa"), col("b.sp").as("sb"))
      .agg(count(lit(1)).as("shared"))
    val sym = p.select(col("sa").as("s"), col("sb").as("o"), col("shared"))
      .unionByName(p.select(col("sb").as("s"), col("sa").as("o"), col("shared")))
    val sim = sym
      .join(broadcast(cnt.select(col("sp"), col("n").as("na"))), col("s") === col("sp")).drop("sp")
      .join(broadcast(cnt.select(col("sp"), col("n").as("nb"))), col("o") === col("sp")).drop("sp")
      .select(col("s"), col("o"), col("shared"),
        (col("shared").cast("double") / sqrt((col("na") * col("nb")).cast("double"))).as("cos"))
    sim.withColumn("rk",
        row_number().over(Window.partitionBy("s").orderBy(col("cos").desc, col("o"))))
      .filter(col("rk") <= 3)
      .select(col("s"), col("o"), col("shared"), round(col("cos"), 6).as("cos"),
        col("rk").cast("long").as("rk"))
      .orderBy("s", "rk")
  }

  // --- q125: PageRank centrality over the purchase graph -----------------
  // Nodes: customers (2k) and suppliers (2k+1); edges: "c bought from
  // s", symmetrized so the bipartite walk is well-defined and no mass
  // dangles. Five unrolled power iterations in the oracle replicate
  // operators.PageRank.runObserved exactly: contributions are
  // DECIMAL(28,18)-summed (associative-exact), the rest is
  // bit-identical IEEE double arithmetic, so the hash check covers the
  // whole iteration chain. Convergence observability (the at-scale
  // piece a fixed unrolled count lacks): each iteration emits its L1
  // residual as a graft_pr__res<i> observed metric, and the output's
  // `settled` flag (|r5 − r4| < 1e-3·r5 per node, the q330 contract)
  // is itself oracle-checked via the r5 ⋈ r4 join — so "did 5
  // iterations suffice" is answered by the query, not by faith.
  def pagerank: Q = {
    val iterCtes = (1 to 5).map { i =>
      s"""r$i AS (SELECT g.dst AS id,
         |  (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT nn FROM n)
         |    + CAST(0.85 AS DOUBLE)
         |      * CAST(sum(CAST(r.pr / d.outdeg AS DECIMAL(28,18))) AS DOUBLE) AS pr
         |FROM g JOIN r${i - 1} r ON g.src = r.id JOIN deg d ON g.src = d.id
         |GROUP BY g.dst)""".stripMargin
    }.mkString(",\n")
    Q(
      "q125_pagerank",
      s"""WITH e AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |g AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
         |deg AS (SELECT src AS id, count(*) AS outdeg FROM g GROUP BY src),
         |n AS (SELECT count(*) AS nn FROM deg),
         |r0 AS (SELECT id, CAST(1 AS DOUBLE) / (SELECT nn FROM n) AS pr FROM deg),
         |$iterCtes
         |SELECT r5.id, round(r5.pr, 12) AS pr,
         |  abs(r5.pr - r4.pr) < 0.001 * r5.pr AS settled
         |FROM r5 JOIN r4 ON r5.id = r4.id
         |ORDER BY pr DESC, r5.id LIMIT 20""".stripMargin,
    ) { (s, dir) =>
      // distinct BEFORE symmetrizing (matches the oracle's e CTE):
      // undirected()'s own dedup then runs on 2×|pairs| rows instead
      // of 2×|lineitem| — a 4× smaller shuffle at any scale
      val edges = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      // disjointSides: customer ids are even, supplier ids odd, and
      // `edges` is already distinct — the swap union cannot collide,
      // so the symmetrize skips its redundant distinct (row-identical)
      val ranks = graft.operators.PageRank.runObserved(
        graft.operators.PageRank.undirected(edges, disjointSides = true), iters = 5)
      ranks.select(col("id"), round(col("pr"), 12).as("pr"), col("settled"))
        .orderBy(col("pr").desc, col("id")).limit(20)
    }
  }

  // --- q242: label-propagation communities ---------------------------------
  // Community detection on q131's supplier co-purchase projection
  // (Raghavan et al. 2007): three SYNCHRONOUS rounds where each node
  // adopts the plurality label of neighbors-plus-self (the self-loop
  // is what keeps synchronous LPA from oscillating), ties to the
  // smallest label — fully deterministic, so the whole run unrolls
  // into oracle CTEs. Scale shape per round: one keyed join of the
  // adjacency against the label table, one (node, label) count, one
  // per-node argmax window partitioned by node (never global) — LPA
  // is exactly 3 × (join + aggregate), the cheapest community
  // algorithm that exists at 100 TB, which is why it's the one
  // production graph stacks actually run. The projection reuses the
  // capped shared core (hot customers dropped, ≥ 190 shared-customer
  // threshold keeps the graph sparse).
  def labelPropagation: Q = {
    def roundSql(t: Int): String = {
      val p = t - 1
      s"""n$t AS (SELECT g.src AS id, l$p.lbl AS nl FROM g JOIN l$p ON l$p.id = g.dst),
         |c$t AS (SELECT id, nl, count(*) AS c FROM n$t GROUP BY id, nl),
         |l$t AS (SELECT id, nl AS lbl FROM (
         |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY c DESC, nl) AS rn
         |    FROM c$t) WHERE rn = 1)""".stripMargin
    }
    Q(
      "q242_label_propagation",
      s"""WITH $CustSuppSql,
        |e AS (SELECT a.sp AS sa, b.sp AS sb FROM cs a JOIN cs b ON a.c = b.c AND a.sp < b.sp
        |      GROUP BY 1, 2 HAVING count(*) >= 190),
        |g AS (SELECT sa AS src, sb AS dst FROM e
        |      UNION ALL SELECT sb, sa FROM e
        |      UNION ALL SELECT id, id FROM (SELECT sa AS id FROM e UNION SELECT sb FROM e)),
        |l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM g),
        |${roundSql(1)},
        |${roundSql(2)},
        |${roundSql(3)}
        |SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members
        |FROM l3 GROUP BY lbl ORDER BY n_members DESC, community LIMIT 20""".stripMargin,
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      // persisted for the same both-join-sides reason as coPurchaseEdges
      val cs = graft.dedup.Dedup.persistTracked(custSupp(s, dir))
      val e = cs.as("a").join(cs.as("b"),
          col("a.c") === col("b.c") && col("a.sp") < col("b.sp"))
        .groupBy(col("a.sp").as("sa"), col("b.sp").as("sb"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 190)
        .select("sa", "sb")
      val sym = e.select(col("sa").as("src"), col("sb").as("dst"))
        .union(e.select(col("sb").as("src"), col("sa").as("dst")))
      val nodes = sym.select(col("src").as("id")).distinct()
      val g = graft.dedup.Dedup.persistTracked(
        sym.union(nodes.select(col("id").as("src"), col("id").as("dst"))))
      var l = nodes.withColumn("lbl", col("id"))
      for (_ <- 1 to 3) {
        val joined = g.join(l.withColumnRenamed("id", "nid"), col("dst") === col("nid"))
          .select(col("src").as("id"), col("lbl").as("nl"))
        val ct = joined.groupBy("id", "nl").agg(count(lit(1)).as("c"))
        l = ct.withColumn("rn", row_number().over(
            Window.partitionBy("id").orderBy(col("c").desc, col("nl"))))
          .filter(col("rn") === 1).select(col("id"), col("nl").as("lbl"))
      }
      l.groupBy("lbl").agg(count(lit(1)).as("n_members"))
        .select(col("lbl").as("community"), col("n_members"))
        .orderBy(col("n_members").desc, col("community")).limit(20)
    }
  }

  // --- q263: degree-distribution power-law fit --------------------------------
  // The one-number answer to "is this graph scale-free enough to need
  // the hub caps?": the continuous-approximation MLE exponent
  // α̂ = 1 + n / Σ ln(d / (d_min − ½)) (Clauset–Shalizi–Newman 2009)
  // over the projected co-purchase degree distribution, next to the
  // degree extremes and mean. One edge aggregate → one degree
  // aggregate; ln terms 9-dp decimal-summed; an empty projected graph
  // yields NULL via 0/NULL rather than inventing an exponent.
  // This is the q162 Zipf audit's graph twin: q162 reads token
  // frequencies, this reads the degree sequence the hub-cap stance
  // (CLAUDE.md scale rules) is premised on.
  def degreePowerLaw: Q = Q(
    "q263_degree_powerlaw",
    s"""WITH $CustSuppSql,
      |e AS (SELECT a.sp AS sa, b.sp AS sb FROM cs a JOIN cs b ON a.c = b.c AND a.sp < b.sp
      |      GROUP BY 1, 2 HAVING count(*) >= 190),
      |deg AS (SELECT id, count(*) AS d FROM
      |        (SELECT sa AS id FROM e UNION ALL SELECT sb AS id FROM e) GROUP BY id),
      |mn AS (SELECT min(d) AS dmin FROM deg),
      |t AS (SELECT count(*) AS n, min(d) AS dmin, max(d) AS dmax,
      |    CAST(sum(d) AS BIGINT) AS sd,
      |    CAST(sum(CAST(round(ln(d / (mn.dmin - 0.5)), 9) AS DECIMAL(18,9)))
      |      AS DOUBLE) AS sl
      |  FROM deg CROSS JOIN mn),
      |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
      |SELECT CAST(t.n AS BIGINT) AS n_nodes, ne.n_edges,
      |  CAST(t.dmin AS BIGINT) AS d_min, CAST(t.dmax AS BIGINT) AS d_max,
      |  round(CAST(t.sd AS DOUBLE) / t.n, 4) AS mean_degree,
      |  round(1.0 + t.n / t.sl, 4) AS alpha
      |FROM t CROSS JOIN ne""".stripMargin,
  ) { (s, dir) =>
    val e = coPurchaseEdges(s, dir)
    val deg = e.select(col("sa").as("id")).unionByName(e.select(col("sb").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val mn = deg.agg(min("d").as("dmin"))
    val t = deg.crossJoin(broadcast(mn))
      .agg(count(lit(1)).as("n"), min("d").as("dmin"), max("d").as("dmax"),
        sum("d").cast("long").as("sd"),
        dsum(round(log(col("d") / (col("dmin") - 0.5)), 9), 9).as("sl"))
    val ne = e.agg(count(lit(1)).cast("long").as("n_edges"))
    t.crossJoin(broadcast(ne))
      .select(col("n").cast("long").as("n_nodes"), col("n_edges"),
        col("dmin").cast("long").as("d_min"), col("dmax").cast("long").as("d_max"),
        round(col("sd").cast("double") / col("n"), 4).as("mean_degree"),
        round(lit(1.0) + try_divide(col("n").cast("double"), col("sl")), 4)
          .as("alpha"))
  }

  // --- q259: local clustering coefficient -------------------------------------
  // q131 counts triangle MEMBERSHIP; the clustering coefficient turns
  // it into the local-density ratio community detection and bot/fraud
  // heuristics actually threshold: C(v) = 2·T(v) / (d(v)·(d(v)−1)) —
  // how close v's neighborhood is to a clique. Reuses the same
  // projected supplier graph (≥190 shared customers) and the same
  // degree-ordered forward counting for T(v); degrees come from the
  // edge list, isolated-in-no-triangle nodes get coefficient 0, and
  // degree-1 nodes NULL (0/0 — there is no neighborhood to close).
  // All joins keyed, all counts exact integers; the only division is
  // the final ratio.
  def clusteringCoefficient: Q = Q(
    "q259_clustering_coefficient",
    s"""WITH $CustSuppSql,
      |e AS (SELECT a.sp AS sa, b.sp AS sb FROM cs a JOIN cs b ON a.c = b.c AND a.sp < b.sp
      |      GROUP BY 1, 2 HAVING count(*) >= 190),
      |deg AS (SELECT id, count(*) AS d FROM
      |        (SELECT sa AS id FROM e UNION ALL SELECT sb AS id FROM e) GROUP BY id),
      |ord AS (SELECT id, d * 4294967296 + id AS ord FROM deg),
      |o AS (SELECT CASE WHEN oa.ord < ob.ord THEN e.sa ELSE e.sb END AS u,
      |        CASE WHEN oa.ord < ob.ord THEN e.sb ELSE e.sa END AS v,
      |        CASE WHEN oa.ord < ob.ord THEN ob.ord ELSE oa.ord END AS ordv
      |      FROM e JOIN ord oa ON e.sa = oa.id JOIN ord ob ON e.sb = ob.id),
      |tri AS (SELECT w1.u AS a, w1.v AS b, w2.v AS c
      |        FROM o w1 JOIN o w2 ON w1.u = w2.u AND w1.ordv < w2.ordv
      |        JOIN o cl ON cl.u = w1.v AND cl.v = w2.v),
      |pern AS (SELECT id, CAST(count(*) AS BIGINT) AS n_tri FROM
      |         (SELECT a AS id FROM tri UNION ALL SELECT b AS id FROM tri
      |          UNION ALL SELECT c AS id FROM tri) GROUP BY id)
      |SELECT deg.id, CAST(deg.d AS BIGINT) AS degree,
      |  COALESCE(pern.n_tri, 0) AS n_tri,
      |  round(2.0 * COALESCE(pern.n_tri, 0) / (deg.d * (deg.d - 1)), 4)
      |    AS clustering_coef
      |FROM deg LEFT JOIN pern ON pern.id = deg.id
      |ORDER BY deg.id""".stripMargin,
  ) { (s, dir) =>
    val e = coPurchaseEdges(s, dir)
    val deg = e.select(col("sa").as("id")).unionByName(e.select(col("sb").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val pern = graft.operators.Triangles
      .perNode(e.select(col("sa").as("src"), col("sb").as("dst")))
    deg.join(pern, Seq("id"), "left")
      .select(col("id"), col("d").cast("long").as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round(try_divide(lit(2.0) * coalesce(col("n_tri"), lit(0L)),
          col("d") * (col("d") - 1)), 4).as("clustering_coef"))
      .orderBy("id")
  }

  // --- q278: TextRank keyword extraction --------------------------------------
  // TF-IDF (q108) ranks terms by counting; TextRank ranks them by
  // STRUCTURE — PageRank over the token co-occurrence graph, where a
  // token matters because it neighbors tokens that matter. Nodes are
  // the top-100 non-stopword types (bounded TakeOrdered, the q162
  // stance); edges are adjacent-token pairs between two node tokens,
  // symmetrized; then 4 power iterations through the SAME
  // operators.PageRank used by q125 — one keyed join + one
  // decimal-exact aggregate per iteration over a vocabulary-bounded
  // graph. The corpus-sized work is one term-frequency aggregate and
  // one bigram projection; everything after is ≤100 nodes. The oracle
  // unrolls the identical 4 iterations (the q125 CTE pattern).
  def textrankKeywords: Q = {
    val iterCtes = (1 to 4).map { i =>
      s"""r$i AS (SELECT g.dst AS id,
         |  (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT nn FROM n)
         |    + CAST(0.85 AS DOUBLE)
         |      * CAST(sum(CAST(r.pr / d.outdeg AS DECIMAL(28,18))) AS DOUBLE) AS pr
         |FROM g JOIN r${i - 1} r ON g.src = r.id JOIN deg d ON g.src = d.id
         |GROUP BY g.dst)""".stripMargin
    }.mkString(",\n")
    val stopList = graft.text.TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
    Q(
      "q278_textrank_keywords",
      s"""WITH tf AS (SELECT tok, count(*) AS c FROM
         |    (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         |  GROUP BY tok),
         |top AS (SELECT tok, c FROM tf WHERE tok NOT IN ($stopList)
         |  ORDER BY c DESC, tok LIMIT 100),
         |ids AS (SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS id FROM top),
         |pos AS (SELECT doc_id, CAST(i AS BIGINT) AS i, t[i] AS tok
         |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |       UNNEST(range(1, len(t) + 1)) AS u(i)),
         |e AS (SELECT DISTINCT ia.id AS src, ib.id AS dst
         |  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
         |  JOIN ids ia ON a.tok = ia.tok JOIN ids ib ON b.tok = ib.tok
         |  WHERE ia.id <> ib.id),
         |g AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
         |deg AS (SELECT src AS id, count(*) AS outdeg FROM g GROUP BY src),
         |n AS (SELECT count(*) AS nn FROM deg),
         |r0 AS (SELECT id, CAST(1 AS DOUBLE) / (SELECT nn FROM n) AS pr FROM deg),
         |$iterCtes
         |SELECT i.tok AS keyword, round(r.pr, 12) AS pr
         |FROM r4 r JOIN ids i ON r.id = i.id
         |ORDER BY pr DESC, keyword LIMIT 15""".stripMargin,
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import graft.text.TextAnalysis
      val toks = TextAnalysis.tokens(col("text"))
      val docs = Tables.documents(s, dir)
      val tf = docs.select(explode(toks).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      val top = tf.filter(!col("tok").isInCollection(TextAnalysis.Stopwords))
        .orderBy(col("c").desc, col("tok")).limit(100)
      val ids = graft.dedup.Dedup.persistTracked(top.withColumn("id",
          row_number().over(Window.orderBy(col("c").desc, col("tok"))).cast("long"))
        .select("tok", "id"))
      val bg = docs.filter(size(toks) >= 2)
        .select(toks.as("t"))
        .select(explode(graft.functions.AdjacentPairs(col("t"))).as("p"))
        .select(col("p.a"), col("p.b"))
      val edges = bg
        .join(broadcast(ids.withColumnRenamed("tok", "a")
          .withColumnRenamed("id", "src")), "a")
        .join(broadcast(ids.withColumnRenamed("tok", "b")
          .withColumnRenamed("id", "dst")), "b")
        .filter(col("src") =!= col("dst"))
        .select("src", "dst").distinct()
      val ranks = graft.operators.PageRank.run(
        graft.operators.PageRank.undirected(edges), iters = 4)
      ranks.join(broadcast(ids), ranks("id") === ids("id"))
        .select(col("tok").as("keyword"), round(col("pr"), 12).as("pr"))
        .orderBy(col("pr").desc, col("keyword")).limit(15)
    }
  }

  // --- q330: k-core peeling (k = 3, three rounds) ----------------------------
  // The degeneracy-ordering primitive behind community seeds and
  // graph sparsification: repeatedly delete nodes of degree < 3 and
  // report who remains. Each round is ONE keyed degree aggregate +
  // an induced-subgraph semi-join on the surviving node set — the
  // scale shape of iterative peeling (never an adjacency matrix);
  // rounds are unrolled plan composition over the SAME q131
  // co-purchase projection (suppliers sharing ≥190 customers), each
  // round's edge set persisted because the next round reads it twice
  // (degree + induce). Three rounds bound the plan like Hits'
  // iters<=4; `settled` reports per-node whether the residual degree
  // certifies the 3-core locally (FALSE rows mean another round would
  // still peel). The oracle unrolls all three rounds as CTEs.
  def kcorePeel: Q = Q(
    "q330_kcore_peel",
    s"""WITH $CustSuppSql,
       |ep AS (SELECT a.sp AS sa, b.sp AS sb FROM cs a JOIN cs b ON a.c = b.c AND a.sp < b.sp
       |       GROUP BY 1, 2 HAVING count(*) >= 190),
       |e0 AS (SELECT sa AS src, sb AS dst FROM ep
       |       UNION ALL SELECT sb, sa FROM ep),
       |d1 AS (SELECT src, count(*) AS d FROM e0 GROUP BY src),
       |k1 AS (SELECT src AS id FROM d1 WHERE d >= 3),
       |e1 AS (SELECT e0.src, e0.dst FROM e0
       |       JOIN k1 a ON a.id = e0.src JOIN k1 b ON b.id = e0.dst),
       |d2 AS (SELECT src, count(*) AS d FROM e1 GROUP BY src),
       |k2 AS (SELECT src AS id FROM d2 WHERE d >= 3),
       |e2 AS (SELECT e1.src, e1.dst FROM e1
       |       JOIN k2 a ON a.id = e1.src JOIN k2 b ON b.id = e1.dst),
       |d3 AS (SELECT src, count(*) AS d FROM e2 GROUP BY src),
       |k3 AS (SELECT src AS id FROM d3 WHERE d >= 3),
       |e3 AS (SELECT e2.src, e2.dst FROM e2
       |       JOIN k3 a ON a.id = e2.src JOIN k3 b ON b.id = e2.dst),
       |df AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS degree
       |       FROM e3 GROUP BY src)
       |SELECT id, degree, degree >= 3 AS settled
       |FROM df ORDER BY id""".stripMargin,
  ) { (s, dir) =>
    val ep = coPurchaseEdges(s, dir)
    var e = graft.dedup.Dedup.persistTracked(
      ep.select(col("sa").as("src"), col("sb").as("dst"))
        .unionByName(ep.select(col("sb").as("src"), col("sa").as("dst"))))
    for (_ <- 1 to 3) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= 3).select(col("src").as("id"))
      e = graft.dedup.Dedup.persistTracked(e
        .join(keep.select(col("id").as("src")), "src")
        .join(keep.select(col("id").as("dst")), "dst")
        .select("src", "dst"))
    }
    e.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))
      .select(col("id"), col("degree"), (col("degree") >= 3).as("settled"))
      .orderBy("id")
  }

  // --- q335: BFS hop distribution (hop plot) ---------------------------------
  // The shortest-path primitive the graph family lacked: how far is
  // everything from a landmark — the hop histogram behind effective-
  // diameter estimates and seed-proximity features. Four unrolled
  // Bellman-Ford relaxations (operators.Bfs) from the minimum-id
  // supplier over the SAME persisted ≥190 co-purchase projection the
  // triangle/k-core/power-law queries share; each round is one keyed
  // join + one min aggregate, with the previous distance riding the
  // same shuffle as a mark-flagged carrier row (the q125 carrier
  // discipline — state referenced once, lineage linear). Distances are
  // exact integers, so the unrolled-CTE oracle matches bit for bit;
  // unreached nodes report hop -1 honestly rather than vanishing.
  def bfsHops: Q = {
    def roundSql(i: Int): String =
      s"""r$i AS (SELECT id, min(v) AS d FROM (
         |    SELECT g.dst AS id, r${i - 1}.d + 1 AS v
         |    FROM g JOIN r${i - 1} ON g.src = r${i - 1}.id
         |    UNION ALL SELECT id, d AS v FROM r${i - 1}) GROUP BY id)""".stripMargin
    Q(
      "q335_bfs_hops",
      s"""WITH $CustSuppSql,
         |ep AS (SELECT a.sp AS sa, b.sp AS sb FROM cs a JOIN cs b ON a.c = b.c AND a.sp < b.sp
         |       GROUP BY 1, 2 HAVING count(*) >= 190),
         |g AS (SELECT sa AS src, sb AS dst FROM ep
         |      UNION ALL SELECT sb, sa FROM ep),
         |r0 AS (SELECT DISTINCT src AS id,
         |         CASE WHEN src = (SELECT min(src) FROM g) THEN 0
         |              ELSE ${graft.operators.Bfs.Unreached} END AS d FROM g),
         |${(1 to 4).map(roundSql).mkString(",\n")}
         |SELECT CAST(CASE WHEN d >= ${graft.operators.Bfs.Unreached} THEN -1
         |            ELSE d END AS BIGINT) AS hop,
         |  CAST(count(*) AS BIGINT) AS n_nodes
         |FROM r4 GROUP BY 1 ORDER BY hop""".stripMargin,
    ) { (s, dir) =>
      val ep = coPurchaseEdges(s, dir)
      val g = ep.select(col("sa").as("src"), col("sb").as("dst"))
        .unionByName(ep.select(col("sb").as("src"), col("sa").as("dst")))
      val d = graft.operators.Bfs.hops(g, g.agg(min(col("src"))), rounds = 4)
      d.select(when(col("d") >= graft.operators.Bfs.Unreached, lit(-1L))
          .otherwise(col("d")).as("hop"))
        .groupBy("hop").agg(count(lit(1)).as("n_nodes"))
        .orderBy("hop")
    }
  }

  // --- q336: personalized PageRank (supplier-seeded) --------------------------
  // q125 asks "who is central"; PPR asks "who is central RELATIVE TO a
  // seed set" — the recommendation/expansion primitive (teleport mass
  // restricted to suppliers, the odd node ids of the bipartite
  // purchase graph, so customers rank purely by supplier proximity).
  // operators.PageRank.personalized keeps q125's exact plan budget:
  // the teleport term is a pure map-side function of the id (never a
  // join), |S| and N ride one broadcast scalar row, contributions stay
  // DECIMAL(28,18)-summed — one exchange per iteration, and the
  // 5-iteration unrolled oracle hash-matches bit for bit.
  def personalizedPagerank: Q = {
    val iterCtes = (1 to 5).map { i =>
      s"""r$i AS (SELECT g.dst AS id,
         |  (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
         |    * (CASE WHEN g.dst % 2 = 1 THEN CAST(1 AS DOUBLE) / (SELECT ns FROM n)
         |            ELSE CAST(0 AS DOUBLE) END)
         |    + CAST(0.85 AS DOUBLE)
         |      * CAST(sum(CAST(r.pr / d.outdeg AS DECIMAL(28,18))) AS DOUBLE) AS pr
         |FROM g JOIN r${i - 1} r ON g.src = r.id JOIN deg d ON g.src = d.id
         |GROUP BY g.dst)""".stripMargin
    }.mkString(",\n")
    Q(
      "q336_personalized_pagerank",
      s"""WITH e AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |g AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
         |deg AS (SELECT src AS id, count(*) AS outdeg FROM g GROUP BY src),
         |n AS (SELECT CAST(sum(CASE WHEN id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |        AS ns FROM deg),
         |r0 AS (SELECT id, CASE WHEN id % 2 = 1
         |         THEN CAST(1 AS DOUBLE) / (SELECT ns FROM n)
         |         ELSE CAST(0 AS DOUBLE) END AS pr FROM deg),
         |$iterCtes
         |SELECT id, round(pr, 12) AS pr FROM r5
         |ORDER BY pr DESC, id LIMIT 20""".stripMargin,
    ) { (s, dir) =>
      val edges = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val ranks = graft.operators.PageRank.personalized(
        graft.operators.PageRank.undirected(edges, disjointSides = true),
        isSeed = col("id") % 2 === 1, iters = 5)
      ranks.select(col("id"), round(col("pr"), 12).as("pr"))
        .orderBy(col("pr").desc, col("id")).limit(20)
    }
  }

  // --- q344: degree assortativity --------------------------------------------
  // Newman's r — the one-number answer to "do hubs connect to hubs?"
  // that decides whether the co-purchase graph's heavy tail (q263)
  // concentrates or spreads load. Pearson correlation of endpoint
  // degrees over the symmetrized edge list: two keyed joins annotate
  // each edge with its endpoint degrees, then every moment rides ONE
  // exact integer aggregate (degrees and edge counts are ints; the
  // sums stay < 2^53, so the closed form in doubles is bit-identical
  // across engines). A regular graph has zero degree variance —
  // try_divide/nullif keeps the degenerate corpus NULL in both
  // engines, and the difference-of-products output is znormed.
  def degreeAssortativity: Q = Q(
    "q344_degree_assortativity",
    s"""WITH $CustSuppSql,
       |ep AS (SELECT a.sp AS sa, b.sp AS sb FROM cs a JOIN cs b ON a.c = b.c AND a.sp < b.sp
       |       GROUP BY 1, 2 HAVING count(*) >= 190),
       |g AS (SELECT sa AS src, sb AS dst FROM ep
       |      UNION ALL SELECT sb, sa FROM ep),
       |deg AS (SELECT src AS id, count(*) AS d FROM g GROUP BY src),
       |e AS (SELECT ds.d AS x, dd.d AS y FROM g
       |      JOIN deg ds ON g.src = ds.id JOIN deg dd ON g.dst = dd.id),
       |m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |        CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
       |        CAST(sum(x * y) AS DOUBLE) AS sxy,
       |        CAST(sum(x * x) AS DOUBLE) AS sxx,
       |        CAST(sum(y * y) AS DOUBLE) AS syy
       |      FROM e)
       |SELECT CAST(n AS BIGINT) AS n_edges,
       |  round((n * sxy - sx * sy)
       |    / nullif(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0), 6)
       |    + 0.0 AS assortativity
       |FROM m""".stripMargin,
  ) { (s, dir) =>
    val ep = coPurchaseEdges(s, dir)
    val g = ep.select(col("sa").as("src"), col("sb").as("dst"))
      .unionByName(ep.select(col("sb").as("src"), col("sa").as("dst")))
    val deg = g.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
    val e = g.join(deg.select(col("id").as("src"), col("d").as("x")), "src")
      .join(deg.select(col("id").as("dst"), col("d").as("y")), "dst")
    val m = e.agg(count(lit(1)).cast("double").as("n"),
      sum("x").cast("double").as("sx"), sum("y").cast("double").as("sy"),
      sum(col("x") * col("y")).cast("double").as("sxy"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      sum(col("y") * col("y")).cast("double").as("syy"))
    m.select(col("n").cast("long").as("n_edges"),
      znorm(round(try_divide(col("n") * col("sxy") - col("sx") * col("sy"),
        sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
          * (col("n") * col("syy") - col("sy") * col("sy")))), 6)).as("assortativity"))
  }

  // --- q345: connected-component size distribution ----------------------------
  // The macro-structure readout the per-node families (q125 rank, q330
  // core, q242 communities) presuppose: how many islands does the
  // co-purchase graph actually have, and how big? Components come from
  // dedup.Clusters.connectedComponents — the SAME alternating
  // min-label machinery the dedup families converge with (one keyed
  // join + min aggregate per round, checkpointed, convergence-
  // detected), here pointed at the supplier graph. The oracle is a
  // true WITH RECURSIVE reachability closure (the q264 pattern), so
  // the hash-match certifies full convergence, not a bounded-round
  // approximation.
  def wccSizes: Q = Q(
    "q345_wcc_sizes",
    s"""WITH RECURSIVE $CustSuppSql,
       |ep AS (SELECT a.sp AS sa, b.sp AS sb FROM cs a JOIN cs b ON a.c = b.c AND a.sp < b.sp
       |       GROUP BY 1, 2 HAVING count(*) >= 190),
       |g AS (SELECT sa AS src, sb AS dst FROM ep
       |      UNION ALL SELECT sb, sa FROM ep),
       |verts AS (SELECT DISTINCT src AS id FROM g),
       |reach(id, lab) AS (
       |  SELECT id, id FROM verts
       |  UNION
       |  SELECT e.dst, r.lab FROM reach r JOIN g e ON e.src = r.id),
       |cl AS (SELECT id, min(lab) AS cid FROM reach GROUP BY id),
       |sz AS (SELECT cid, count(*) AS csz FROM cl GROUP BY cid)
       |SELECT CAST(csz AS BIGINT) AS component_size,
       |  CAST(count(*) AS BIGINT) AS n_components
       |FROM sz GROUP BY csz ORDER BY component_size""".stripMargin,
  ) { (s, dir) =>
    val ep = coPurchaseEdges(s, dir)
    val g = ep.select(col("sa").as("src"), col("sb").as("dst"))
      .unionByName(ep.select(col("sb").as("src"), col("sa").as("dst")))
    val verts = g.select(col("src").as("id")).distinct()
    val comp = graft.dedup.Clusters.connectedComponents(verts, "id", g, "src", "dst")
    comp.groupBy("cluster_id").agg(count(lit(1)).as("csz"))
      .groupBy(col("csz").cast("long").as("component_size"))
      .agg(count(lit(1)).as("n_components"))
      .orderBy("component_size")
  }
}
