package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Rollup (D15 extension) and the documented approximate-at-scale
  * variants of exact operators (SURVEY.md §7.7 item 5): sketch-based
  * distinct counts and percentiles swap in per query when exactness is
  * not contract — single-pass, fixed memory, no exact-dedup shuffle.
  */
object Scale {

  val all: Seq[Q] = Seq(rollup, approxDistinct, approxPercentile, groupingSets)

  // --- ROLLUP with subtotal + grand-total rows ----------------------------
  def rollup: Q = Q(
    "q55_rollup",
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin,
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        dsum(col("o_totalprice")).as("revenue"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("cnt"), col("revenue"))
      .orderBy("status", "priority")
  }

  // --- GROUPING SETS through the spark.sql entry path ----------------------
  // Also demonstrates the SQL surface: the engine's tables register as
  // temp views and ANSI SQL runs against them unchanged.
  def groupingSets: Q = Q(
    "q66_grouping_sets",
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(c_mktsegment, 'ALL') AS segment,
      |  count(*) AS cnt
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY GROUPING SETS ((o_orderstatus), (c_mktsegment), ())
      |ORDER BY status, segment""".stripMargin,
  ) { (s, dir) =>
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    s.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(c_mktsegment, 'ALL') AS segment,
        |  count(*) AS cnt
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY GROUPING SETS ((o_orderstatus), (c_mktsegment), ())
        |ORDER BY status, segment""".stripMargin)
  }

  // --- HyperLogLog distinct (rows-only: sketch values are Spark's own) ----
  def approxDistinct: Q = Q.rowsOnly("q56_approx_distinct") { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_customers"),
        countDistinct(col("o_custkey")).as("exact_customers"))
      .orderBy("o_orderpriority")
  }

  // --- approximate percentile (rows-only) ---------------------------------
  def approxPercentile: Q = Q.rowsOnly("q57_approx_percentile") { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(expr("approx_percentile(o_totalprice, 0.9, 1000)").as("p90_approx"),
        expr("percentile(o_totalprice, 0.9)").as("p90_exact"))
      .orderBy("o_orderpriority")
  }
}
