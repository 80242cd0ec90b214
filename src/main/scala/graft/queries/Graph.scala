package graft.queries

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

  val all: Seq[Q] = Seq(pagerank)

  // --- q125: PageRank centrality over the purchase graph -----------------
  // Nodes: customers (2k) and suppliers (2k+1); edges: "c bought from
  // s", symmetrized so the bipartite walk is well-defined and no mass
  // dangles. Five unrolled power iterations in the oracle replicate
  // operators.PageRank.run exactly: contributions are DECIMAL(28,18)-
  // summed (associative-exact), the rest is bit-identical IEEE double
  // arithmetic, so the hash check covers the whole iteration chain.
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
         |SELECT id, round(pr, 12) AS pr FROM r5
         |ORDER BY pr DESC, id LIMIT 20""".stripMargin,
    ) { (s, dir) =>
      val edges = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      val ranks = graft.operators.PageRank.run(
        graft.operators.PageRank.undirected(edges), iters = 5)
      ranks.select(col("id"), round(col("pr"), 12).as("pr"))
        .orderBy(col("pr").desc, col("id")).limit(20)
    }
  }
}
