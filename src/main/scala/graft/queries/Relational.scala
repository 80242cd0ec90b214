package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Core relational operators (SURVEY.md §2.B–§2.H) re-expressed
  * Spark-first over the driver's TPC-H-ish tables.
  *
  * Determinism contract with the DuckDB oracle:
  *   - every double SUM goes through a per-element DECIMAL cast, so the
  *     aggregation is exact and order-independent in both engines;
  *   - averages are computed as exact-decimal-sum / count and rounded,
  *     never as a floating sum whose accumulation order could differ;
  *   - every result has a total ORDER BY (a unique key suffix breaks
  *     ties) so row order matches the oracle byte for byte.
  *
  * Scale notes (100 TB stance): all aggregations are keyed groupBys
  * (map-side partial agg + single shuffle); dimension joins broadcast
  * the small side explicitly; nothing collects to the driver.
  */
object Relational {

  // --- q152: revenue concentration (Pareto shares) -------------------------
  // "What share of revenue do the top 1% / 5% / 10% of customers
  // carry?" — the concentration readout behind every account-tiering
  // decision. Aggregate-first, NO global sort: per-customer totals are
  // one keyed aggregate; the three cut points are exact interpolated
  // percentiles of that table (q11 idiom) riding a 1-row broadcast;
  // shares are conditional DECIMAL sums in ONE pass over the totals.
  // At any scale the only shuffle is the customer aggregate.
  def paretoShare: Q = Q(
    "q152_pareto_share",
    """WITH t AS (SELECT o_custkey,
      |           sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |           FROM orders GROUP BY 1),
      |cut AS (SELECT quantile_cont(CAST(rev AS DOUBLE), 0.99) AS p99,
      |        quantile_cont(CAST(rev AS DOUBLE), 0.95) AS p95,
      |        quantile_cont(CAST(rev AS DOUBLE), 0.90) AS p90 FROM t)
      |SELECT CAST(count(*) AS BIGINT) AS n_cust,
      |  round(CAST(sum(rev) FILTER (WHERE CAST(rev AS DOUBLE) > p99) AS DOUBLE)
      |    / CAST(sum(rev) AS DOUBLE), 6) AS top1_share,
      |  round(CAST(sum(rev) FILTER (WHERE CAST(rev AS DOUBLE) > p95) AS DOUBLE)
      |    / CAST(sum(rev) AS DOUBLE), 6) AS top5_share,
      |  round(CAST(sum(rev) FILTER (WHERE CAST(rev AS DOUBLE) > p90) AS DOUBLE)
      |    / CAST(sum(rev) AS DOUBLE), 6) AS top10_share
      |FROM t, cut""".stripMargin,
  ) { (s, dir) =>
    val t = Tables.orders(s, dir).groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val cut = t.agg(
      expr("percentile(CAST(rev AS DOUBLE), 0.99)").as("p99"),
      expr("percentile(CAST(rev AS DOUBLE), 0.95)").as("p95"),
      expr("percentile(CAST(rev AS DOUBLE), 0.90)").as("p90"))
    def share(p: String) =
      round(sum(when(col("rev").cast("double") > col(p), col("rev"))).cast("double")
        / sum(col("rev")).cast("double"), 6)
    t.crossJoin(broadcast(cut)) // 1-row scalar broadcast
      .agg(count(lit(1)).as("n_cust"), share("p99").as("top1_share"),
        share("p95").as("top5_share"), share("p90").as("top10_share"))
  }

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, paretoShare,
    fullOuterRecon, pctOfParent, benford, rfmSegmentation, slaCompliance)

  // --- q181: Benford first-digit audit -------------------------------------
  // The forensic-accounting screen: naturally occurring amounts follow
  // P(d) = log10(1 + 1/d); fabricated or capped data bends the curve.
  // First digits come from exact integer floor + string head
  // (identical cross-engine — no float log in the digit extraction);
  // expected shares are compile-time literals; per-digit chi-square
  // terms are straight arithmetic on exact counts. One aggregate over
  // the fact table, 9-row output.
  def benford: Q = {
    val expected = (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))
    val expSql = expected.map { case (d, e) => s"WHEN $d THEN $e" }.mkString(" ")
    Q(
      "q181_benford",
      s"""WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
         |  FROM orders WHERE o_totalprice >= 1),
         |n AS (SELECT count(*) AS nn FROM d),
         |o AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY digit)
         |SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
         |  round(CAST(n_obs AS DOUBLE) / nn, 6) AS pct_obs,
         |  round(CASE digit $expSql END, 6) AS pct_expected,
         |  round((CAST(n_obs AS DOUBLE) - nn * (CASE digit $expSql END))
         |    * (CAST(n_obs AS DOUBLE) - nn * (CASE digit $expSql END))
         |    / (nn * (CASE digit $expSql END)), 6) AS chi2_term
         |FROM o, n ORDER BY digit""".stripMargin,
    ) { (s, dir) =>
      val d = Tables.orders(s, dir).filter(col("o_totalprice") >= 1)
        .select(substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
          .cast("int").as("digit"))
      val n = d.agg(count(lit(1)).as("nn"))
      val expCol = expected.foldLeft(lit(null).cast("double")) { case (acc, (dig, e)) =>
        when(col("digit") === dig, lit(e)).otherwise(acc)
      }
      d.groupBy("digit").agg(count(lit(1)).as("n_obs"))
        .crossJoin(broadcast(n)) // 1-row scalar
        .select(col("digit"), col("n_obs"),
          round(col("n_obs").cast("double") / col("nn"), 6).as("pct_obs"),
          round(expCol, 6).as("pct_expected"),
          round((col("n_obs").cast("double") - col("nn") * expCol)
            * (col("n_obs").cast("double") - col("nn") * expCol)
            / (col("nn") * expCol), 6).as("chi2_term"))
        .orderBy("digit")
    }
  }

  // --- q182: RFM customer segmentation -------------------------------------
  // The lifecycle-marketing workhorse: score every customer 1–5 on
  // Recency / Frequency / Monetary and report the segment grid. Per-
  // customer metrics are ONE keyed aggregate (recency anchored to the
  // corpus max date — a broadcast scalar, never current_date); the
  // quintile cuts are exact interpolated percentiles of each metric
  // riding the same 1-row broadcast (the q152 idiom ×3), and scores
  // count strict threshold crossings — so the segment of every
  // customer is a pure function of the data.
  def rfmSegmentation: Q = {
    def cutsSql(m: String) = (1 to 4)
      .map(k => s"quantile_cont(CAST($m AS DOUBLE), ${k * 0.2}) AS ${m}_c$k")
      .mkString(",\n      ")
    def scoreSql(m: String) = (1 to 4)
      .map(k => s"(CASE WHEN CAST($m AS DOUBLE) > ${m}_c$k THEN 1 ELSE 0 END)")
      .mkString(" + ")
    Q(
      "q182_rfm_segmentation",
      s"""WITH mx AS (SELECT max(o_orderdate) AS ref FROM orders),
         |c AS (SELECT o_custkey,
         |    datediff('day', max(o_orderdate), (SELECT ref FROM mx)) AS recency,
         |    count(*) AS frequency,
         |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
         |  FROM orders GROUP BY 1),
         |cut AS (SELECT
         |      ${cutsSql("recency")},
         |      ${cutsSql("frequency")},
         |      ${cutsSql("monetary")}
         |  FROM c),
         |sc AS (SELECT o_custkey, monetary,
         |    5 - (${scoreSql("recency")}) AS r_score,
         |    1 + (${scoreSql("frequency")}) AS f_score,
         |    1 + (${scoreSql("monetary")}) AS m_score
         |  FROM c, cut)
         |SELECT r_score, f_score, m_score,
         |  CAST(count(*) AS BIGINT) AS n_customers,
         |  CAST(sum(monetary) AS DOUBLE) AS total_monetary
         |FROM sc GROUP BY 1, 2, 3
         |ORDER BY r_score, f_score, m_score""".stripMargin,
    ) { (s, dir) =>
      val ord = Tables.orders(s, dir)
      val mx = ord.agg(max("o_orderdate").as("ref"))
      val c = graft.dedup.Dedup.persistTracked(ord.groupBy("o_custkey")
        .agg(max("o_orderdate").as("last_o"), count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("monetary"))
        .crossJoin(broadcast(mx)) // 1-row scalar
        .select(col("o_custkey"),
          datediff(to_date(col("ref")), to_date(col("last_o"))).as("recency"),
          col("frequency"), col("monetary")))
      val cutCols = for {
        m <- Seq("recency", "frequency", "monetary")
        k <- 1 to 4
      } yield expr(s"percentile(CAST($m AS DOUBLE), ${k * 0.2})").as(s"${m}_c$k")
      val cut = c.agg(cutCols.head, cutCols.tail: _*)
      def score(m: String) = (1 to 4)
        .map(k => when(col(m).cast("double") > col(s"${m}_c$k"), 1).otherwise(0))
        .reduce(_ + _)
      c.crossJoin(broadcast(cut)) // 1-row scalar
        .select(col("monetary"),
          (lit(5) - score("recency")).as("r_score"),
          (lit(1) + score("frequency")).as("f_score"),
          (lit(1) + score("monetary")).as("m_score"))
        .groupBy("r_score", "f_score", "m_score")
        .agg(count(lit(1)).as("n_customers"),
          sum("monetary").cast("double").as("total_monetary"))
        .orderBy("r_score", "f_score", "m_score")
    }
  }

  // --- q183: fulfillment SLA compliance ------------------------------------
  // "Are urgent orders actually shipped faster?" — on-time share
  // (ship ≤ 30 days after order) per priority. Integer day-diffs and
  // counts; one fact-dim keyed join + one aggregate.
  def slaCompliance: Q = Q(
    "q183_sla_compliance",
    """SELECT o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n_lineitems,
      |  CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time,
      |  round(CAST(sum(CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30
      |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS on_time_rate
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (s, dir) =>
    val onTime = when(
      datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))) <= 30, 1)
      .otherwise(0)
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lineitems"), sum(onTime).as("n_on_time"),
        round(sum(onTime).cast("double") / count(lit(1)), 6).as("on_time_rate"))
      .orderBy("o_orderpriority")
  }

  // --- q178: percent-of-parent drill-down (region → nation) ---------------
  // The hierarchical share readout every drill-down report needs: each
  // nation's share of its region AND the region's share of the total,
  // in one result. q12 is percent-of-grand-total; this adds the
  // intermediate level. Revenue stays DECIMAL through both rollup
  // levels (leaf sums re-aggregate exactly); the region and total
  // tables are dimension-sized and broadcast.
  def pctOfParent: Q = Q(
    "q178_pct_of_parent",
    """WITH leaf AS (SELECT r_name AS region, n_name AS nation,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2),
      |rg AS (SELECT region, sum(rev) AS rrev FROM leaf GROUP BY 1),
      |t AS (SELECT sum(rev) AS trev FROM leaf)
      |SELECT leaf.region, nation, CAST(rev AS DOUBLE) AS revenue,
      |  round(CAST(rev AS DOUBLE) / CAST(rrev AS DOUBLE), 6) AS pct_of_region,
      |  round(CAST(rrev AS DOUBLE) / CAST(trev AS DOUBLE), 6) AS region_pct_of_total
      |FROM leaf JOIN rg ON leaf.region = rg.region, t
      |ORDER BY leaf.region, nation""".stripMargin,
  ) { (s, dir) =>
    val leaf = graft.dedup.Dedup.persistTracked(Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev")))
    val rg = leaf.groupBy("region").agg(sum("rev").as("rrev"))
    val t = leaf.agg(sum("rev").as("trev"))
    leaf.join(broadcast(rg), "region")
      .crossJoin(broadcast(t)) // 1-row scalar
      .select(col("region"), col("nation"), col("rev").cast("double").as("revenue"),
        round(col("rev").cast("double") / col("rrev").cast("double"), 6)
          .as("pct_of_region"),
        round(col("rrev").cast("double") / col("trev").cast("double"), 6)
          .as("region_pct_of_total"))
      .orderBy("region", "nation")
  }

  // --- q154: period-over-period reconciliation (FULL OUTER join) ----------
  // Year-over-year revenue per customer with churn labeling — the one
  // join type the registry didn't yet exercise. Customers active in
  // only one of the two years surface as unmatched rows on either
  // side (churned/new); FULL OUTER + COALESCE is the canonical shape.
  // Both sides are keyed aggregates of the same fact table, so the
  // join is a same-key shuffle join (sort-merge / shuffled-hash under
  // AQE) — neither side is broadcastable at warehouse scale and the
  // plan must not pretend otherwise. Revenue stays DECIMAL through
  // the join and the delta subtraction, so the result is
  // associative-exact; DOUBLE only at the output boundary.
  def fullOuterRecon: Q = Q(
    "q154_full_outer_recon",
    """WITH a AS (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
      |             count(*) AS n
      |           FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |             AND o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1),
      |b AS (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
      |        count(*) AS n
      |      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      |        AND o_orderdate < TIMESTAMP '1999-01-01' GROUP BY 1)
      |SELECT coalesce(a.o_custkey, b.o_custkey) AS custkey,
      |  CAST(coalesce(a.rev, 0) AS DOUBLE) AS rev_prev,
      |  CAST(coalesce(b.rev, 0) AS DOUBLE) AS rev_curr,
      |  CAST(coalesce(b.rev, 0) - coalesce(a.rev, 0) AS DOUBLE) AS delta,
      |  CAST(coalesce(a.n, 0) AS BIGINT) AS n_prev,
      |  CAST(coalesce(b.n, 0) AS BIGINT) AS n_curr,
      |  CASE WHEN a.o_custkey IS NULL THEN 'new'
      |       WHEN b.o_custkey IS NULL THEN 'churned'
      |       ELSE 'retained' END AS status
      |FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
      |ORDER BY custkey""".stripMargin,
  ) { (s, dir) =>
    def yearRev(yr: Int, ck: String) = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit(s"$yr-01-01").cast("timestamp")
        && col("o_orderdate") < lit(s"${yr + 1}-01-01").cast("timestamp"))
      .groupBy(col("o_custkey").as(ck))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as(s"rev_$ck"),
        count(lit(1)).as(s"n_$ck"))
    val zero = lit(0).cast("decimal(18,2)")
    yearRev(1997, "ck_a").join(yearRev(1998, "ck_b"),
        col("ck_a") === col("ck_b"), "full_outer")
      .select(
        coalesce(col("ck_a"), col("ck_b")).as("custkey"),
        coalesce(col("rev_ck_a"), zero).cast("double").as("rev_prev"),
        coalesce(col("rev_ck_b"), zero).cast("double").as("rev_curr"),
        (coalesce(col("rev_ck_b"), zero) - coalesce(col("rev_ck_a"), zero))
          .cast("double").as("delta"),
        coalesce(col("n_ck_a"), lit(0L)).as("n_prev"),
        coalesce(col("n_ck_b"), lit(0L)).as("n_curr"),
        when(col("ck_a").isNull, "new")
          .when(col("ck_b").isNull, "churned")
          .otherwise("retained").as("status"))
      .orderBy("custkey")
  }

  // --- q01: pricing summary (D1 D4 D9 F1 H7; TPC-H Q1 shape) -------------
  def q01: Q = Q(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  round(sum(l_quantity) / count(*), 2) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
        round(sum(col("l_quantity")) / count(lit(1)), 2).as("avg_qty"),
        count(lit(1)).as("count_order"),
      )
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // --- q02: projection + conjunctive filter (B1 B2 B5) -------------------
  def q02: Q = Q(
    "q02_filter_project",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
      |FROM lineitem
      |WHERE l_quantity >= 45 AND l_discount >= 0.05
      |  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin,
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") >= 45 && col("l_discount") >= 0.05
        && col("l_shipdate").between(lit("1996-01-01").cast("timestamp"), lit("1998-12-31").cast("timestamp")))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
      .orderBy("l_orderkey", "l_linenumber")
  }

  // --- q03: broadcast dim join + agg (C1) --------------------------------
  def q03: Q = Q(
    "q03_segment_revenue",
    """SELECT c_mktsegment,
      |  count(*) AS order_cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin,
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("order_cnt"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("c_mktsegment"))
  }

  // --- q04: multi-way join to nation revenue (C2) ------------------------
  def q04: Q = Q(
    "q04_nation_revenue",
    """SELECT n_name,
      |  count(*) AS lineitem_cnt,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin,
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("lineitem_cnt"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
      )
      .orderBy(col("n_name"))
  }

  // --- q05: left outer join preserving zero groups (C3 D2) ---------------
  def q05: Q = Q(
    "q05_left_join_zero_groups",
    """SELECT n_name,
      |  count(c_custkey) AS customer_cnt,
      |  count(DISTINCT c_mktsegment) AS segment_cnt
      |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin,
  ) { (s, dir) =>
    Tables.nation(s, dir)
      .join(Tables.customer(s, dir), col("n_nationkey") === col("c_nationkey"), "left_outer")
      .groupBy(col("n_name"))
      .agg(count(col("c_custkey")).as("customer_cnt"),
        countDistinct(col("c_mktsegment")).as("segment_cnt"))
      .orderBy(col("n_name"))
  }

  // --- q06: anti-join / NOT EXISTS (C5, incremental-load shape) ----------
  def q06: Q = Q(
    "q06_antijoin",
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= TIMESTAMP '2001-01-01')
      |ORDER BY c_custkey""".stripMargin,
  ) { (s, dir) =>
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
    Tables.customer(s, dir)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  // --- q07: semi-join / EXISTS -------------------------------------------
  def q07: Q = Q(
    "q07_semijoin",
    """SELECT c_custkey, c_mktsegment
      |FROM customer c
      |WHERE EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin,
  ) { (s, dir) =>
    val pOrders = Tables.orders(s, dir).filter(col("o_orderstatus") === "P")
    Tables.customer(s, dir)
      .join(pOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
  }

  // --- q08: top-k (F2 — plans TakeOrderedAndProject, no full sort) -------
  def q08: Q = Q(
    "q08_topk_orders",
    """SELECT o_orderkey, o_totalprice, o_orderdate
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin,
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .select("o_orderkey", "o_totalprice", "o_orderdate")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  // --- q09: exact distinct count per group (D3) --------------------------
  def q09: Q = Q(
    "q09_distinct_count",
    """SELECT c_mktsegment,
      |  count(DISTINCT c_nationkey) AS nation_cnt,
      |  count(*) AS customer_cnt
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin,
  ) { (s, dir) =>
    Tables.customer(s, dir)
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_nationkey")).as("nation_cnt"),
        count(lit(1)).as("customer_cnt"))
      .orderBy(col("c_mktsegment"))
  }

  // --- q10: HAVING (D6) --------------------------------------------------
  def q10: Q = Q(
    "q10_having",
    """SELECT o_custkey, count(*) AS order_cnt
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(*) >= 12
      |ORDER BY o_custkey""".stripMargin,
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("order_cnt"))
      .filter(col("order_cnt") >= 12)
      .orderBy(col("o_custkey"))
  }

  // --- q11: exact interpolated percentile (D7, PERCENTILE_CONT) ----------
  def q11: Q = Q(
    "q11_percentile",
    """SELECT o_orderpriority,
      |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
      |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin,
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
      )
      .orderBy(col("o_orderpriority"))
  }

  // --- q12: percent-of-total via unpartitioned window (E1) ---------------
  def q12: Q = Q(
    "q12_pct_of_total",
    """SELECT o_orderpriority, cnt,
      |  round(cnt * 100.0 / sum(cnt) OVER (), 2) AS pct
      |FROM (SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY o_orderpriority)
      |ORDER BY o_orderpriority""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("pct", round(col("cnt") * 100.0 / sum(col("cnt")).over(Window.partitionBy()), 2))
      .orderBy(col("o_orderpriority"))
  }

  // --- q13: ranked top-n per group (E2-family ranking) -------------------
  def q13: Q = Q(
    "q13_topn_per_group",
    """SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
      |  SELECT c_nationkey, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
      |  FROM customer)
      |WHERE rn <= 3
      |ORDER BY c_nationkey, rn""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("c_nationkey"), col("rn"))
  }

  // --- q14: LEAD next-event gap (E4; readmission-label shape) ------------
  def q14: Q = Q(
    "q14_lead_gap",
    """SELECT user_id, event_id,
      |  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |  epoch_us(CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP))
      |    - epoch_us(CAST(ts AS TIMESTAMP)) AS gap_us
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        (unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts"))).as("gap_us"))
      .orderBy(col("user_id"), col("event_id"))
  }

  // --- q15: CASE-bucketed two-stage cohort agg (D10 H11) -----------------
  def q15: Q = Q(
    "q15_order_cohorts",
    """WITH per_cust AS (
      |  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey)
      |SELECT CASE WHEN cnt = 1 THEN '1: one'
      |            WHEN cnt BETWEEN 2 AND 5 THEN '2: few'
      |            WHEN cnt BETWEEN 6 AND 10 THEN '3: regular'
      |            ELSE '4: frequent' END AS cohort,
      |  count(*) AS customers
      |FROM per_cust
      |GROUP BY 1
      |ORDER BY cohort""".stripMargin,
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      .withColumn("cohort",
        when(col("cnt") === 1, "1: one")
          .when(col("cnt").between(2, 5), "2: few")
          .when(col("cnt").between(6, 10), "3: regular")
          .otherwise("4: frequent"))
      .groupBy(col("cohort")).agg(count(lit(1)).as("customers"))
      .orderBy(col("cohort"))
  }

  // --- q16: stacked single-row metrics via UNION ALL (D11 G1) ------------
  def q16: Q = Q(
    "q16_union_metrics",
    """SELECT 'customers' AS metric, CAST(count(*) AS DOUBLE) AS value FROM customer
      |UNION ALL
      |SELECT 'orders', CAST(count(*) AS DOUBLE) FROM orders
      |UNION ALL
      |SELECT 'distinct_order_customers', CAST(count(DISTINCT o_custkey) AS DOUBLE) FROM orders
      |UNION ALL
      |SELECT 'max_order_price', max(o_totalprice) FROM orders
      |ORDER BY metric""".stripMargin,
  ) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.agg(count(lit(1)).cast("double").as("value")).select(lit("customers").as("metric"), col("value"))
      .unionByName(o.agg(count(lit(1)).cast("double").as("value")).select(lit("orders").as("metric"), col("value")))
      .unionByName(o.agg(countDistinct(col("o_custkey")).cast("double").as("value"))
        .select(lit("distinct_order_customers").as("metric"), col("value")))
      .unionByName(o.agg(max(col("o_totalprice")).as("value")).select(lit("max_order_price").as("metric"), col("value")))
      .orderBy(col("metric"))
  }

  // --- q17: scalar-subquery threshold via cross join (C4 B5 D7) ----------
  def q17: Q = Q(
    "q17_above_p90",
    """WITH p AS (SELECT quantile_cont(o_totalprice, 0.9) AS p90 FROM orders)
      |SELECT o_orderpriority, count(*) AS cnt
      |FROM orders, p
      |WHERE o_totalprice > p90
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin,
  ) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val p90 = o.agg(expr("percentile(o_totalprice, 0.9)").as("p90"))
    o.crossJoin(broadcast(p90))
      .filter(col("o_totalprice") > col("p90"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_orderpriority"))
  }

  // --- q18: monthly time series via date_trunc (H5) ----------------------
  def q18: Q = Q(
    "q18_monthly_revenue",
    """SELECT date_trunc('month', o_orderdate) AS month,
      |  count(*) AS order_cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY 1
      |ORDER BY month""".stripMargin,
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("order_cnt"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("month"))
  }

  // --- q19: multi-key GROUP BY (D5) --------------------------------------
  def q19: Q = Q(
    "q19_multikey_group",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY o_orderstatus, o_orderpriority
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  // --- q20: aggregate-of-expression (D9 H8; noise-impact shape) ----------
  def q20: Q = Q(
    "q20_agg_of_expr",
    """SELECT round(abs(
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |  - CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) / count(*)
      |  ), 2) AS avg_discount_impact
      |FROM lineitem""".stripMargin,
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .agg(round(abs(
        dsum(col("l_extendedprice")) / count(lit(1))
          - dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4) / count(lit(1))),
        2).as("avg_discount_impact"))
  }

  // --- q21: KPI block of independent scalar aggregates (D8) --------------
  def q21: Q = Q(
    "q21_kpi_block",
    """SELECT
      |  (SELECT count(*) FROM customer) AS total_customers,
      |  (SELECT count(*) FROM orders) AS total_orders,
      |  (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM orders) AS total_revenue,
      |  (SELECT round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 2) FROM orders) AS avg_order_value,
      |  (SELECT min(o_orderdate) FROM orders) AS first_order,
      |  (SELECT max(o_orderdate) FROM orders) AS last_order""".stripMargin,
  ) { (s, dir) =>
    val c = Tables.customer(s, dir).agg(count(lit(1)).as("total_customers"))
    val o = Tables.orders(s, dir).agg(
      count(lit(1)).as("total_orders"),
      dsum(col("o_totalprice")).as("total_revenue"),
      round(dsum(col("o_totalprice")) / count(lit(1)), 2).as("avg_order_value"),
      min(col("o_orderdate")).as("first_order"),
      max(col("o_orderdate")).as("last_order"),
    )
    c.crossJoin(o)
  }

  // --- q22: casts + rounding (H6 H7) -------------------------------------
  def q22: Q = Q(
    "q22_casts",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(l_quantity AS INTEGER) AS qty_int,
      |  CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date,
      |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
      |  round(l_extendedprice * l_tax, 2) AS tax_amount
      |FROM lineitem
      |WHERE l_orderkey <= 100
      |ORDER BY l_orderkey, l_linenumber""".stripMargin,
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") <= 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("int").as("qty_int"),
        col("l_shipdate").cast("date").cast("string").as("ship_date"),
        col("l_extendedprice").cast("decimal(18,2)").cast("string").as("price_str"),
        round(col("l_extendedprice") * col("l_tax"), 2).as("tax_amount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }
}
