package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.Transforms
import graft.warehouse.{AggState, Keys, Merge, Quality, Scd2}

/** ETL-layer operators (SURVEY.md §2.A, §2.H): anonymization, age
  * bucketing, validity flags, merge/upsert, surrogate keys, and the
  * differential-privacy noise column.
  */
object Etl {

  val all: Seq[Q] = Seq(sha2Anonymize, ageBucket, validity, mergeUpsert, surrogateKeys, dpLaplace,
    scd2History, columnProfile, histogram, aggStateMerge, histQuantileState,
    streamingHistState, integrityAudit, ivmJoinDelta, tableDiff, columnStats,
    keySkewGini, logCompaction, orderReconciliation, leadtimeTrend, fkDiscovery,
    fdDiscovery, recordLinkage, zorderLayout, linkageClusters, ivmRetract,
    benfordAudit, dbtGenericTests, scd2PitJoin)

  // --- q199: approximate functional-dependency discovery --------------------
  // Schema profiling's other half next to q188's FK inclusion: for
  // candidate column pairs X→Y, the g3 error — the minimum fraction
  // of rows to delete before X determines Y (0 = exact FD). One scan:
  // each row explodes into the BOUNDED pair list (|pairs| = 6 here —
  // never columns², the caller curates candidates), then two keyed
  // aggregates: (pair, x, y) counts → per-(pair, x) keep max → per
  // pair violations / N. Derived columns (year, price band) slot in
  // as just more candidates.
  def fdDiscovery: Q = Q(
    "q199_fd_discovery",
    """WITH base AS (SELECT o_orderstatus AS st, o_orderpriority AS pr,
      |    CAST(year(o_orderdate) AS VARCHAR) AS yr,
      |    CASE WHEN o_totalprice > 1000 THEN 'hi' ELSE 'lo' END AS band
      |  FROM orders),
      |pairs AS (SELECT t.u.pid AS pid, t.u.x AS x, t.u.y AS y FROM base, UNNEST([
      |    {'pid': 'status->priority', 'x': st, 'y': pr},
      |    {'pid': 'priority->status', 'x': pr, 'y': st},
      |    {'pid': 'year->status',     'x': yr, 'y': st},
      |    {'pid': 'status->band',     'x': st, 'y': band},
      |    {'pid': 'band->status',     'x': band, 'y': st},
      |    {'pid': 'year->band',       'x': yr, 'y': band}]) AS t(u)),
      |cxy AS (SELECT pid, x, y, count(*) AS c FROM pairs GROUP BY pid, x, y),
      |cx AS (SELECT pid, x, sum(c) AS tot, max(c) AS keep FROM cxy GROUP BY pid, x),
      |g AS (SELECT pid, CAST(sum(tot) AS BIGINT) AS n,
      |             CAST(sum(tot - keep) AS BIGINT) AS violations,
      |             CAST(count(*) AS BIGINT) AS n_lhs_values
      |      FROM cx GROUP BY pid)
      |SELECT pid, n, n_lhs_values, violations,
      |  round(CAST(violations AS DOUBLE) / n, 6) AS g3_error
      |FROM g ORDER BY pid""".stripMargin,
  ) { (s, dir) =>
    val base = Tables.orders(s, dir).select(
      col("o_orderstatus").as("st"), col("o_orderpriority").as("pr"),
      year(col("o_orderdate")).cast("string").as("yr"),
      when(col("o_totalprice") > 1000, "hi").otherwise("lo").as("band"))
    def cand(pid: String, x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      struct(lit(pid).as("pid"), x.as("x"), y.as("y"))
    val pairs = base.select(explode(array(
        cand("status->priority", col("st"), col("pr")),
        cand("priority->status", col("pr"), col("st")),
        cand("year->status", col("yr"), col("st")),
        cand("status->band", col("st"), col("band")),
        cand("band->status", col("band"), col("st")),
        cand("year->band", col("yr"), col("band")))).as("u"))
      .select(col("u.pid").as("pid"), col("u.x").as("x"), col("u.y").as("y"))
    val cxy = pairs.groupBy("pid", "x", "y").agg(count(lit(1)).as("c"))
    val cx = cxy.groupBy("pid", "x")
      .agg(sum(col("c")).as("tot"), max(col("c")).as("keep"))
    cx.groupBy("pid").agg(sum(col("tot")).as("n"),
        sum(col("tot") - col("keep")).as("violations"),
        count(lit(1)).as("n_lhs_values"))
      .select(col("pid"), col("n"), col("n_lhs_values"), col("violations"),
        round(col("violations").cast("double") / col("n"), 6).as("g3_error"))
      .orderBy("pid")
  }

  // --- q187: monthly fulfillment lead-time trend ----------------------------
  // "Is shipping getting slower?" answered at the percentile level:
  // per order month, p50/p90 of order→ship day gaps. Gaps are exact
  // integer days from one fact join; percentiles are per-group exact
  // interpolation (q11/q165 idiom) over month groups — at 100 TB swap
  // q57's mergeable sketch, same API shape.
  def leadtimeTrend: Q = Q(
    "q187_leadtime_trend",
    """WITH g AS (SELECT date_trunc('month', o_orderdate) AS month,
      |    datediff('day', o_orderdate, l_shipdate) AS lead_days
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |SELECT month, CAST(count(*) AS BIGINT) AS n_lineitems,
      |  round(quantile_cont(CAST(lead_days AS DOUBLE), 0.5), 4) AS p50_days,
      |  round(quantile_cont(CAST(lead_days AS DOUBLE), 0.9), 4) AS p90_days
      |FROM g GROUP BY month ORDER BY month""".stripMargin,
  ) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(date_trunc("month", col("o_orderdate")).as("month"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .as("lead_days"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_lineitems"),
        round(expr("percentile(CAST(lead_days AS DOUBLE), 0.5)"), 4).as("p50_days"),
        round(expr("percentile(CAST(lead_days AS DOUBLE), 0.9)"), 4).as("p90_days"))
      .orderBy("month")
  }

  // --- q188: FK discovery by value-overlap profiling ------------------------
  // The metadata tool that finds join keys nobody documented: for
  // candidate (child.col → parent.col) pairs, the inclusion
  // coefficient |child_values ⊆ parent_values| — 1.0 means a clean
  // FK. Distinct value sets are keyed aggregates; the overlap count
  // is a LEFT SEMI join of the child's distinct values against the
  // parent's — never a row-level join, so the probe cost scales with
  // key cardinality, not table size.
  def fkDiscovery: Q = {
    val pairs = Seq(
      ("orders", "o_custkey", "customer", "c_custkey"),
      ("lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("customer", "c_custkey", "orders", "o_custkey"))
    def sqlOne(ct: String, cc: String, pt: String, pc: String) =
      s"""SELECT '$ct.$cc -> $pt.$pc' AS candidate,
         |  (SELECT count(DISTINCT $cc) FROM $ct) AS n_child_values,
         |  CAST((SELECT count(*) FROM (SELECT DISTINCT $cc FROM $ct) c
         |    WHERE $cc IN (SELECT $pc FROM $pt)) AS BIGINT) AS n_contained,
         |  round(CAST((SELECT count(*) FROM (SELECT DISTINCT $cc FROM $ct) c
         |      WHERE $cc IN (SELECT $pc FROM $pt)) AS DOUBLE)
         |    / (SELECT count(DISTINCT $cc) FROM $ct), 6) AS inclusion""".stripMargin
    Q(
      "q188_fk_discovery",
      s"""${pairs.map { case (ct, cc, pt, pc) => sqlOne(ct, cc, pt, pc) }
        .mkString("\nUNION ALL\n")}
         |ORDER BY candidate""".stripMargin,
    ) { (s, dir) =>
      import org.apache.spark.sql.DataFrame
      def table(t: String): DataFrame = t match {
        case "orders" => Tables.orders(s, dir)
        case "customer" => Tables.customer(s, dir)
        case "lineitem" => Tables.lineitem(s, dir)
        case "part" => Tables.part(s, dir)
        case "supplier" => Tables.supplier(s, dir)
      }
      def one(ct: String, cc: String, pt: String, pc: String): DataFrame = {
        val childVals = table(ct).select(col(cc)).distinct()
        val contained = childVals
          .join(table(pt).select(col(pc)), col(cc) === col(pc), "left_semi")
        childVals.agg(count(lit(1)).as("n_child_values"))
          .crossJoin(contained.agg(count(lit(1)).as("n_contained"))) // 1×1 scalar
          .select(lit(s"$ct.$cc -> $pt.$pc").as("candidate"),
            col("n_child_values"), col("n_contained"),
            round(col("n_contained").cast("double") / col("n_child_values"), 6)
              .as("inclusion"))
      }
      pairs.map { case (ct, cc, pt, pc) => one(ct, cc, pt, pc) }
        .reduce(_ unionByName _).orderBy("candidate")
    }
  }

  // --- q184: fact-vs-detail reconciliation ----------------------------------
  // The "does the header match its lines" audit q159 can't do with
  // counts alone: recompute each order's total from its lineitems
  // (extprice·(1+tax)·(1−discount), the TPC-H identity), compare to
  // o_totalprice, and report the 20 worst absolute discrepancies.
  // Per-line terms round to 4 dp before DECIMAL sums (products of
  // 2-dp factors are doubles; the rounding makes the per-order sum
  // associative-exact), and the diff is decimal subtraction. One
  // keyed aggregate + one keyed join; top-k is TakeOrderedAndProject.
  def orderReconciliation: Q = Q(
    "q184_order_reconciliation",
    """WITH l AS (SELECT l_orderkey,
      |    sum(CAST(round(l_extendedprice * (1 + l_tax) * (1 - l_discount), 4)
      |      AS DECIMAL(18,4))) AS computed
      |  FROM lineitem GROUP BY 1)
      |SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS header_total,
      |  CAST(computed AS DOUBLE) AS line_total,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,4)) - computed AS DOUBLE) AS diff
      |FROM orders JOIN l ON o_orderkey = l_orderkey
      |ORDER BY abs(CAST(CAST(o_totalprice AS DECIMAL(18,4)) - computed AS DOUBLE))
      |  DESC, o_orderkey LIMIT 20""".stripMargin,
  ) { (s, dir) =>
    val l = Tables.lineitem(s, dir).groupBy("l_orderkey")
      .agg(sum(round(col("l_extendedprice") * (lit(1) + col("l_tax"))
        * (lit(1) - col("l_discount")), 4).cast("decimal(18,4)")).as("computed"))
    Tables.orders(s, dir).join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice").cast("double").as("header_total"),
        col("computed").cast("double").as("line_total"),
        (col("o_totalprice").cast("decimal(18,4)") - col("computed"))
          .cast("double").as("diff"))
      .orderBy(abs(col("diff")).desc, col("o_orderkey")).limit(20)
  }

  // --- q179: join-key skew diagnosis (Gini concentration) ------------------
  // The number that answers "does this join need salting": Gini of the
  // per-key row counts for the three hottest join keys. Computed the
  // scale-safe way — per-key counts reduce to a COUNT histogram
  // (distinct frequency values), and the rank-weighted sum uses the
  // closed form over each frequency block (c·start + c(c+1)/2), so
  // the only window runs over distinct frequencies. Integer-exact
  // until the single final division. Pairs with q68's salted join and
  // `warehouse.Skew`: this measures, that mitigates.
  def keySkewGini: Q = {
    val keys = Seq(("lineitem", "l_partkey"), ("lineitem", "l_suppkey"),
      ("orders", "o_custkey"))
    def ctes(t: String, k: String) =
      s"""kc_$k AS (SELECT $k AS key, count(*) AS x FROM $t GROUP BY 1),
         |hx_$k AS (SELECT x, count(*) AS c FROM kc_$k GROUP BY x),
         |cx_$k AS (SELECT x, c, CAST(sum(c) OVER (ORDER BY x) - c AS BIGINT) AS start
         |          FROM hx_$k),
         |g_$k AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(sum(x * c) AS BIGINT) AS sx,
         |    CAST(sum(x * (c * start + (c * (c + 1)) // 2)) AS BIGINT) AS six
         |  FROM cx_$k)""".stripMargin
    def sel(t: String, k: String) =
      s"""SELECT '$t.$k' AS key_name, n AS n_keys, sx AS n_rows,
         |  round(CAST(2 * six AS DOUBLE) / (CAST(n AS DOUBLE) * sx)
         |    - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
         |FROM g_$k""".stripMargin
    Q(
      "q179_key_skew_gini",
      s"""WITH ${keys.map { case (t, k) => ctes(t, k) }.mkString(",\n")}
         |${keys.map { case (t, k) => sel(t, k) }.mkString("\nUNION ALL\n")}
         |ORDER BY key_name""".stripMargin,
    ) { (s, dir) =>
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.expressions.Window
      def one(table: DataFrame, t: String, k: String): DataFrame = {
        val kc = table.groupBy(col(k).as("key")).agg(count(lit(1)).as("x"))
        val hx = kc.groupBy("x").agg(count(lit(1)).as("c"))
        val cx = hx.withColumn("start", sum("c").over(Window.orderBy("x")) - col("c"))
        cx.agg(sum("c").as("n"), sum(col("x") * col("c")).as("sx"),
            sum(col("x") * (col("c") * col("start")
              + expr("(c * (c + 1)) div 2"))).as("six"))
          .select(lit(s"$t.$k").as("key_name"), col("n").as("n_keys"),
            col("sx").as("n_rows"),
            round(lit(2) * col("six").cast("double")
              / (col("n").cast("double") * col("sx"))
              - (col("n") + 1).cast("double") / col("n"), 6).as("gini"))
      }
      Seq(one(Tables.lineitem(s, dir), "lineitem", "l_partkey"),
        one(Tables.lineitem(s, dir), "lineitem", "l_suppkey"),
        one(Tables.orders(s, dir), "orders", "o_custkey"))
        .reduce(_ unionByName _).orderBy("key_name")
    }
  }

  // --- q180: change-log compaction (keep latest per key) -------------------
  // Log-structured ingestion's read-side repair: collapse the event
  // stream to the most recent row per (user, event_type) — the
  // compaction a CDC pipeline runs before serving point lookups.
  // One keyed window (rank over the composite key, newest first,
  // event_id tie-break) — the F-family top-1-per-group shape, never a
  // global sort.
  def logCompaction: Q = Q(
    "q180_log_compaction",
    """WITH r AS (SELECT user_id, event_type, ts, value,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts DESC, event_id DESC) AS rk
      |  FROM events)
      |SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS last_ts_us,
      |  round(CAST(value AS DOUBLE), 2) AS last_value
      |FROM r WHERE rk = 1
      |ORDER BY user_id, event_type""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("last_ts_us"),
        round(col("value").cast("double"), 2).as("last_value"))
      .orderBy("user_id", "event_type")
  }

  // --- q173: snapshot table diff (data-diff) --------------------------------
  // The audit-before-swap every blue/green table publish runs: given
  // the current snapshot and a candidate batch (here derived
  // deterministically — %93 keys deleted, %97 prices bumped, %89 keys
  // re-inserted under new ids), classify every key as
  // added/removed/changed/unchanged and report counts + key ranges.
  // One FULL OUTER keyed join (the q154 shape applied to row
  // versions), reduced to a 4-row report — no row-hash round trip
  // through strings (cross-engine float formatting is not stable;
  // column comparison is).
  def tableDiff: Q = Q(
    "q173_table_diff",
    """WITH orig AS (SELECT o_orderkey AS k, o_totalprice AS v FROM orders),
      |newt AS (
      |  SELECT o_orderkey AS k,
      |    CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1.0
      |         ELSE o_totalprice END AS v
      |  FROM orders WHERE o_orderkey % 93 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 100000000, o_totalprice FROM orders
      |  WHERE o_orderkey % 89 = 0),
      |d AS (SELECT coalesce(o.k, n.k) AS k,
      |        CASE WHEN o.k IS NULL THEN 'added'
      |             WHEN n.k IS NULL THEN 'removed'
      |             WHEN o.v <> n.v THEN 'changed'
      |             ELSE 'unchanged' END AS status
      |      FROM orig o FULL OUTER JOIN newt n ON o.k = n.k)
      |SELECT status, CAST(count(*) AS BIGINT) AS n_rows,
      |  min(k) AS min_key, max(k) AS max_key
      |FROM d GROUP BY status ORDER BY status""".stripMargin,
  ) { (s, dir) =>
    val ord = Tables.orders(s, dir)
    val orig = ord.select(col("o_orderkey").as("ko"), col("o_totalprice").as("vo"))
    val newt = ord.filter(col("o_orderkey") % 93 =!= 0)
      .select(col("o_orderkey").as("kn"),
        when(col("o_orderkey") % 97 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")).as("vn"))
      .unionByName(ord.filter(col("o_orderkey") % 89 === 0)
        .select((col("o_orderkey") + 100000000L).as("kn"),
          col("o_totalprice").as("vn")))
    orig.join(newt, col("ko") === col("kn"), "full_outer")
      .select(coalesce(col("ko"), col("kn")).as("k"),
        when(col("ko").isNull, "added")
          .when(col("kn").isNull, "removed")
          .when(col("vo") =!= col("vn"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_rows"), min("k").as("min_key"), max("k").as("max_key"))
      .orderBy("status")
  }

  // --- q174: optimizer-grade column statistics (NDV + equi-depth) ----------
  // The ANALYZE TABLE output a cost-based optimizer consumes: per
  // column, exact distinct count, min/max, and equi-depth quartile
  // boundaries. Boundaries use the tie-safe integer rule
  // b_k = min{v : 4·cum(v) ≥ k·N} over the VALUE histogram (the q155
  // cumulative trick) — windows run over distinct values, never rows,
  // and values stay DECIMAL(18,2) so both engines bucket identically.
  def columnStats: Q = {
    val cols = Seq("l_quantity", "l_discount", "l_extendedprice")
    def sqlOne(c: String): String =
      s"""SELECT '$c' AS col_name, n, ndv,
         |  CAST(vmin AS DOUBLE) AS vmin, CAST(vmax AS DOUBLE) AS vmax,
         |  ${(1 to 3).map(k =>
            s"(SELECT CAST(min(v) AS DOUBLE) FROM cum_$c WHERE cum * 4 >= n_$c.n * $k) AS q$k")
            .mkString(",\n  ")}
         |FROM n_$c""".stripMargin
    def sqlCtes(c: String): String =
      s"""h_$c AS (SELECT CAST($c AS DECIMAL(18,2)) AS v, count(*) AS c
         |  FROM lineitem GROUP BY 1),
         |cum_$c AS (SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM h_$c),
         |n_$c AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS ndv,
         |  min(v) AS vmin, max(v) AS vmax FROM h_$c)""".stripMargin
    Q(
      "q174_column_stats",
      s"""WITH ${cols.map(sqlCtes).mkString(",\n")}
         |${cols.map(sqlOne).mkString("\nUNION ALL\n")}
         |ORDER BY col_name""".stripMargin,
    ) { (s, dir) =>
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, dir)
      def one(c: String): DataFrame = {
        // histogram feeds the cumulative AND the scalar stats — persist
        val h = graft.dedup.Dedup.persistTracked(
          li.select(col(c).cast("decimal(18,2)").as("v"))
            .groupBy("v").agg(count(lit(1)).as("c")))
        val cum = h.withColumn("cum", sum("c").over(Window.orderBy("v")))
        val n = h.agg(sum("c").as("n"), count(lit(1)).as("ndv"),
          min("v").as("vmin"), max("v").as("vmax"))
        // all three boundaries from ONE pass over the cumulative
        // histogram: min(v | 4·cum ≥ k·N) as conditional mins (min
        // skips the when's nulls — identical to the filter+agg form,
        // which executed the single-partition window 3×)
        val qExprs = (1 to 3).map(k =>
          min(when(col("cum") * 4 >= col("n") * k, col("v")))
            .cast("double").as(s"q$k"))
        val q = cum.crossJoin(broadcast(n.select("n"))) // 1-row scalar
          .agg(qExprs.head, qExprs.tail: _*)
        n.select(lit(c).as("col_name"), col("n"), col("ndv"),
            col("vmin").cast("double").as("vmin"),
            col("vmax").cast("double").as("vmax"))
          .crossJoin(broadcast(q)) // 1×1 scalars
      }
      cols.map(one).reduce(_ unionByName _).orderBy("col_name")
    }
  }

  // --- q163: incremental maintenance of a join view (two-sided delta) ------
  // q126/q135 maintain AGGREGATES incrementally; this maintains a
  // JOIN view: revenue-per-nation over orders⋈customer where BOTH
  // sides received a batch (orders o_orderkey%10=0, customers
  // c_custkey%7=0). The delta rule ΔV = ΔA⋈B_new ∪ A_old⋈ΔB means a
  // refresh only ever joins a delta against the other side — the full
  // fact table is never re-joined, which is the entire point at
  // 100 TB. The query computes the view as old-partials ∪ both delta
  // terms re-aggregated; the oracle computes the full join directly —
  // the hash-match IS the proof of the IVM identity, exact because
  // partial revenue stays DECIMAL until the output boundary.
  def ivmJoinDelta: Q = Q(
    "q163_ivm_join_delta",
    """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY c_nationkey""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.DataFrame
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    val oldOrders = ord.filter(col("o_orderkey") % 10 =!= 0)
    val deltaOrders = ord.filter(col("o_orderkey") % 10 === 0)
    val oldCust = cust.filter(col("c_custkey") % 7 =!= 0)
    val deltaCust = cust.filter(col("c_custkey") % 7 === 0)
    def partial(o: DataFrame, c: DataFrame): DataFrame =
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("pn"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("pr"))
    partial(oldOrders, oldCust)     // the stored view, pre-batch
      .unionByName(partial(deltaOrders, cust))    // ΔA ⋈ B_new
      .unionByName(partial(oldOrders, deltaCust)) // A_old ⋈ ΔB
      .groupBy("c_nationkey")
      .agg(sum("pn").as("n_orders"), sum("pr").cast("double").as("revenue"))
      .orderBy("c_nationkey")
  }

  // --- q311: IVM with retractions (delete batch) ------------------------------
  // q163 maintains the join view under INSERT deltas; real pipelines
  // also delete (GDPR erasure, bad-batch rollback). The standard
  // retraction encoding: the delete batch joins exactly like an
  // insert delta but contributes NEGATIVE (count, sum) rows, the
  // merge is the same keyed re-aggregate, and a group whose count
  // reaches zero DROPS from the view (the subtlety an insert-only
  // rule never exercises). Revenue stays DECIMAL through the
  // subtraction — exact at any partitioning. The oracle recomputes
  // the view from scratch on the surviving rows, so the hash match
  // proves V_old ⊖ (ΔD ⋈ dim) == V(all ∖ ΔD).
  def ivmRetract: Q = Q(
    "q311_ivm_retract",
    """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderkey % 97 <> 0
      |GROUP BY 1 ORDER BY c_nationkey""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.DataFrame
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    def view(o: DataFrame): DataFrame =
      o.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("pn"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("pr"))
    val stored = view(ord) // the pre-batch view
    val retract = view(ord.filter(col("o_orderkey") % 97 === 0))
      .select(col("c_nationkey"), (-col("pn")).as("pn"), (-col("pr")).as("pr"))
    stored.unionByName(retract)
      .groupBy("c_nationkey")
      .agg(sum("pn").as("n_orders"), sum("pr").as("r"))
      .filter(col("n_orders") > 0) // a fully-retracted group leaves the view
      .select(col("c_nationkey"), col("n_orders"),
        col("r").cast("double").as("revenue"))
      .orderBy("c_nationkey")
  }

  // --- q159: star-schema integrity audit -----------------------------------
  // The dbt-style constraint suite run after every load: referential
  // integrity (orphan facts via anti-joins on each FK), key
  // uniqueness, and domain ranges — one row per named check with
  // violation counts and rates. Each FK probe is a keyed LEFT ANTI
  // join (dimension sides broadcast when they fit, AQE shuffles them
  // when they don't — deliberately unhinted); uniqueness is a keyed
  // groupBy; range checks are per-row predicates folded into ONE
  // aggregate per table. Everything reduces to scalar counts before
  // the UNION, so the report itself is bytes regardless of fact-table
  // scale.
  def integrityAudit: Q = Q(
    "q159_integrity_audit",
    """WITH ln AS (SELECT count(*) AS n FROM lineitem),
      |onn AS (SELECT count(*) AS n FROM orders),
      |cn AS (SELECT count(*) AS n FROM customer),
      |checks AS (
      |  SELECT 'lineitem_orphan_order' AS check_name,
      |    CAST((SELECT count(*) FROM lineitem l LEFT JOIN orders o
      |      ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL) AS BIGINT)
      |      AS n_violations,
      |    (SELECT n FROM ln) AS n_checked
      |  UNION ALL SELECT 'lineitem_orphan_part',
      |    CAST((SELECT count(*) FROM lineitem l LEFT JOIN part p
      |      ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL) AS BIGINT),
      |    (SELECT n FROM ln)
      |  UNION ALL SELECT 'lineitem_orphan_supplier',
      |    CAST((SELECT count(*) FROM lineitem l LEFT JOIN supplier s
      |      ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL) AS BIGINT),
      |    (SELECT n FROM ln)
      |  UNION ALL SELECT 'orders_orphan_customer',
      |    CAST((SELECT count(*) FROM orders o LEFT JOIN customer c
      |      ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL) AS BIGINT),
      |    (SELECT n FROM onn)
      |  UNION ALL SELECT 'customer_dup_key',
      |    CAST((SELECT coalesce(sum(cnt - 1), 0) FROM
      |      (SELECT count(*) AS cnt FROM customer GROUP BY c_custkey) g
      |      WHERE cnt > 1) AS BIGINT), (SELECT n FROM cn)
      |  UNION ALL SELECT 'lineitem_bad_quantity',
      |    CAST((SELECT count(*) FROM lineitem
      |      WHERE l_quantity IS NULL OR l_quantity <= 0) AS BIGINT), (SELECT n FROM ln)
      |  UNION ALL SELECT 'lineitem_bad_discount',
      |    CAST((SELECT count(*) FROM lineitem
      |      WHERE l_discount < 0 OR l_discount > 1) AS BIGINT), (SELECT n FROM ln)
      |  UNION ALL SELECT 'orders_nonpositive_total',
      |    CAST((SELECT count(*) FROM orders WHERE o_totalprice <= 0) AS BIGINT),
      |    (SELECT n FROM onn)
      |  UNION ALL SELECT 'orders_after_2000',
      |    CAST((SELECT count(*) FROM orders
      |      WHERE o_orderdate > TIMESTAMP '2000-12-31') AS BIGINT), (SELECT n FROM onn))
      |SELECT check_name, n_violations, n_checked,
      |  round(CAST(n_violations AS DOUBLE) / n_checked, 6) AS violation_rate
      |FROM checks ORDER BY check_name""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.DataFrame
    val li = Tables.lineitem(s, dir)
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    def one(name: String, violations: DataFrame, population: DataFrame): DataFrame =
      violations.agg(count(lit(1)).as("n_violations"))
        .crossJoin(population.agg(count(lit(1)).as("n_checked"))) // 1×1 scalar
        .select(lit(name).as("check_name"), col("n_violations"), col("n_checked"))
    def orphan(name: String, fact: DataFrame, fk: String,
        dim: DataFrame, pk: String): DataFrame =
      one(name, fact.join(dim, fact(fk) === dim(pk), "left_anti"), fact)
    // key-uniqueness: one violation per surplus row beyond the first
    val dupKey = cust.groupBy("c_custkey").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .agg(coalesce(sum(col("cnt") - 1), lit(0L)).as("n_violations"))
      .crossJoin(cust.agg(count(lit(1)).as("n_checked")))
      .select(lit("customer_dup_key").as("check_name"),
        col("n_violations"), col("n_checked"))
    Seq(
      orphan("lineitem_orphan_order", li, "l_orderkey", ord, "o_orderkey"),
      orphan("lineitem_orphan_part", li, "l_partkey", Tables.part(s, dir), "p_partkey"),
      orphan("lineitem_orphan_supplier", li, "l_suppkey",
        Tables.supplier(s, dir), "s_suppkey"),
      orphan("orders_orphan_customer", ord, "o_custkey", cust, "c_custkey"),
      dupKey,
      one("lineitem_bad_quantity",
        li.filter(col("l_quantity").isNull || col("l_quantity") <= 0), li),
      one("lineitem_bad_discount",
        li.filter(col("l_discount") < 0 || col("l_discount") > 1), li),
      one("orders_nonpositive_total", ord.filter(col("o_totalprice") <= 0), ord),
      one("orders_after_2000",
        ord.filter(col("o_orderdate") > lit("2000-12-31").cast("timestamp")), ord),
    ).reduce(_ unionByName _)
      .withColumn("violation_rate",
        round(col("n_violations").cast("double") / col("n_checked"), 6))
      .orderBy("check_name")
  }

  // --- q333: dbt generic-test constraint suite ------------------------------
  // The declarative vocabulary the reference CONFIGURES but never ships
  // (dbt_project.yml:9 sets test-paths; README.md:203-205 and
  // airflow_dags.py:98 invoke `dbt test` against zero test files): the
  // four dbt generic tests — unique / not_null / accepted_values /
  // relationships — as a constraint-suite API (warehouse.Quality.checks)
  // returning one pass/fail audit row per constraint. Where q159 hand-
  // writes each probe, this is the schema.yml form: constraints are
  // DATA, the engine derives the plan — scan-local tests fold into one
  // conditional aggregate per table, each relationship is one keyed
  // LEFT ANTI join reduced to a scalar. The suite includes genuinely
  // failing rows on this corpus ((l_orderkey, l_linenumber) is NOT a
  // lineitem key here — 14k surplus rows at sf0.01), so the pass flag
  // is exercised in both directions and the oracle certifies the
  // violation arithmetic, not just zeros.
  def dbtGenericTests: Q = Q(
    "q333_dbt_generic_tests",
    """WITH checks AS (
      |  SELECT 'customer' AS table_name, 'not_null' AS check_type,
      |    'c_name' AS target,
      |    CAST((SELECT count(*) - count(c_name) FROM customer) AS BIGINT)
      |      AS n_violations
      |  UNION ALL SELECT 'customer', 'relationships',
      |    'c_nationkey->nation.n_nationkey',
      |    CAST((SELECT count(*) FROM customer c
      |      LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) p
      |        ON c.c_nationkey = p.n_nationkey
      |      WHERE c.c_nationkey IS NOT NULL AND p.n_nationkey IS NULL) AS BIGINT)
      |  UNION ALL SELECT 'customer', 'unique', 'c_custkey',
      |    CAST((SELECT count(*) - count(DISTINCT c_custkey) FROM customer
      |      WHERE c_custkey IS NOT NULL) AS BIGINT)
      |  UNION ALL SELECT 'lineitem', 'accepted_values', 'l_linestatus',
      |    CAST((SELECT count(*) FROM lineitem WHERE l_linestatus IS NOT NULL
      |      AND CAST(l_linestatus AS VARCHAR) NOT IN ('O', 'F')) AS BIGINT)
      |  UNION ALL SELECT 'lineitem', 'accepted_values', 'l_returnflag',
      |    CAST((SELECT count(*) FROM lineitem WHERE l_returnflag IS NOT NULL
      |      AND CAST(l_returnflag AS VARCHAR) NOT IN ('A', 'N', 'R')) AS BIGINT)
      |  UNION ALL SELECT 'lineitem', 'not_null', 'l_quantity',
      |    CAST((SELECT count(*) - count(l_quantity) FROM lineitem) AS BIGINT)
      |  UNION ALL SELECT 'lineitem', 'relationships',
      |    'l_orderkey->orders.o_orderkey',
      |    CAST((SELECT count(*) FROM lineitem l
      |      LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) p
      |        ON l.l_orderkey = p.o_orderkey
      |      WHERE l.l_orderkey IS NOT NULL AND p.o_orderkey IS NULL) AS BIGINT)
      |  UNION ALL SELECT 'lineitem', 'relationships',
      |    'l_partkey->part.p_partkey',
      |    CAST((SELECT count(*) FROM lineitem l
      |      LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
      |        ON l.l_partkey = p.p_partkey
      |      WHERE l.l_partkey IS NOT NULL AND p.p_partkey IS NULL) AS BIGINT)
      |  UNION ALL SELECT 'lineitem', 'relationships',
      |    'l_suppkey->supplier.s_suppkey',
      |    CAST((SELECT count(*) FROM lineitem l
      |      LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) p
      |        ON l.l_suppkey = p.s_suppkey
      |      WHERE l.l_suppkey IS NOT NULL AND p.s_suppkey IS NULL) AS BIGINT)
      |  UNION ALL SELECT 'lineitem', 'unique', 'l_orderkey,l_linenumber',
      |    CAST((SELECT count(*) FROM lineitem
      |        WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL)
      |      - (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber
      |          FROM lineitem
      |          WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL) d)
      |      AS BIGINT)
      |  UNION ALL SELECT 'orders', 'accepted_values', 'o_orderstatus',
      |    CAST((SELECT count(*) FROM orders WHERE o_orderstatus IS NOT NULL
      |      AND CAST(o_orderstatus AS VARCHAR) NOT IN ('O', 'F', 'P')) AS BIGINT)
      |  UNION ALL SELECT 'orders', 'not_null', 'o_custkey',
      |    CAST((SELECT count(*) - count(o_custkey) FROM orders) AS BIGINT)
      |  UNION ALL SELECT 'orders', 'not_null', 'o_orderdate',
      |    CAST((SELECT count(*) - count(o_orderdate) FROM orders) AS BIGINT)
      |  UNION ALL SELECT 'orders', 'relationships',
      |    'o_custkey->customer.c_custkey',
      |    CAST((SELECT count(*) FROM orders o
      |      LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) p
      |        ON o.o_custkey = p.c_custkey
      |      WHERE o.o_custkey IS NOT NULL AND p.c_custkey IS NULL) AS BIGINT)
      |  UNION ALL SELECT 'orders', 'unique', 'o_orderkey',
      |    CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders
      |      WHERE o_orderkey IS NOT NULL) AS BIGINT))
      |SELECT table_name, check_type, target, n_violations,
      |  n_violations = 0 AS passed
      |FROM checks ORDER BY table_name, check_type, target""".stripMargin,
  ) { (s, dir) =>
    import graft.warehouse.Quality
    import graft.warehouse.Quality.{Relationship, TableChecks}
    val ord = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    Quality.checks(Seq(
      TableChecks("orders", ord,
        unique = Seq(Seq("o_orderkey")),
        notNull = Seq("o_custkey", "o_orderdate"),
        acceptedValues = Seq("o_orderstatus" -> Seq("O", "F", "P")),
        relationships = Seq(Relationship("o_custkey", cust, "customer", "c_custkey"))),
      TableChecks("lineitem", Tables.lineitem(s, dir),
        unique = Seq(Seq("l_orderkey", "l_linenumber")),
        notNull = Seq("l_quantity"),
        acceptedValues = Seq(
          "l_returnflag" -> Seq("A", "N", "R"),
          "l_linestatus" -> Seq("O", "F")),
        relationships = Seq(
          Relationship("l_orderkey", ord, "orders", "o_orderkey"),
          Relationship("l_partkey", Tables.part(s, dir), "part", "p_partkey"),
          Relationship("l_suppkey", Tables.supplier(s, dir), "supplier", "s_suppkey"))),
      TableChecks("customer", cust,
        unique = Seq(Seq("c_custkey")),
        notNull = Seq("c_name"),
        relationships = Seq(
          Relationship("c_nationkey", Tables.nation(s, dir), "nation", "n_nationkey"))),
    ))
  }

  // --- q341: SCD2 point-in-time join -----------------------------------------
  // The reason SCD2 history (q91) exists at all: joining facts against
  // the dimension state AS OF the fact's own timestamp, not today's.
  // Each lineitem resolves its customer's priority regime at ship
  // time: one hash equi-join on the natural key with the effective
  // interval as a post-join predicate — per key the history is a few
  // versions, so the join fan-out is bounded and ≤1 row survives the
  // interval filter (the standard PIT shape on a key-partitioned
  // join; no window, no sort). Facts shipped before their customer's
  // first version drop out (matched-only semantics, same in both
  // engines). Revenue keeps the scale-4 DECIMAL rule (price × (1 −
  // discount) is exact at 4 dp, not 2).
  def scd2PitJoin: Q = Q(
    "q341_scd2_pit_join",
    """WITH flagged AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
      |    CASE WHEN row_number() OVER w = 1
      |           OR o_orderpriority IS DISTINCT FROM lag(o_orderpriority) OVER w
      |         THEN 1 ELSE 0 END AS chg
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |versioned AS (
      |  SELECT *, sum(chg) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
      |  FROM flagged),
      |hist AS (
      |  SELECT o_custkey, version, min(o_orderdate) AS effective_from,
      |         min(o_orderpriority) AS o_orderpriority,
      |         lead(min(o_orderdate)) OVER (PARTITION BY o_custkey ORDER BY version)
      |           AS effective_to
      |  FROM versioned GROUP BY 1, 2),
      |f AS (SELECT o.o_custkey AS k, l.l_shipdate AS t,
      |        l.l_extendedprice * (1 - l.l_discount) AS rev
      |      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      |SELECT h.o_orderpriority AS priority_at_ship,
      |  CAST(count(*) AS BIGINT) AS n_lines,
      |  round(CAST(sum(CAST(f.rev AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
      |FROM f JOIN hist h ON h.o_custkey = f.k
      |  AND h.effective_from <= f.t
      |  AND (h.effective_to IS NULL OR f.t < h.effective_to)
      |GROUP BY 1 ORDER BY 1""".stripMargin,
  ) { (s, dir) =>
    import graft.warehouse.Scd2
    val ord = Tables.orders(s, dir)
    val hist = Scd2.fromChangeLog(ord, Seq("o_custkey"),
      col("o_orderdate"), Seq(col("o_orderkey")), Seq("o_orderpriority"))
    val facts = Tables.lineitem(s, dir)
      .join(ord.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("k"), col("l_shipdate").as("t"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    facts.join(hist,
        col("o_custkey") === col("k") && col("effective_from") <= col("t") &&
          (col("effective_to").isNull || col("t") < col("effective_to")))
      .groupBy(col("o_orderpriority").as("priority_at_ship"))
      .agg(count(lit(1)).as("n_lines"),
        round(dsum(col("rev"), 4), 2).as("revenue"))
      .orderBy("priority_at_ship")
  }

  // --- q135: incremental quantile maintenance (mergeable histogram) --------
  // q126's refresh contract extended to order statistics: percentiles
  // can't be maintained from the monoid quad, so the stored state is
  // the exactly-mergeable fixed-bin histogram (warehouse.HistState,
  // 50 bins over [0, 500)). The query folds a pre/post-cut delta pair
  // with merge() and estimates p50/p90 from the MERGED state; the
  // oracle recomputes the histogram from the FULL table — so the
  // hash-match is itself the proof that merge(build(old),
  // build(delta)) == build(all), bins and interpolation bit for bit.
  // A refresh at 100 TB shuffles ~|groups|·bins counter rows, never
  // the fact table; the estimate is windows over ≤ 50 rows per group.
  // Shared q135/q143 oracle: the full-table histogram → p50/p90
  // estimate (50 bins over [0, 500)).
  private def histQuantileSql: String =
    """WITH st AS (SELECT event_type,
      |    CAST(least(greatest(floor((value - CAST(0 AS DOUBLE)) / CAST(10 AS DOUBLE)),
      |                        0), 49) AS INT) AS bin,
      |    count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |c AS (SELECT event_type, bin, cnt,
      |    sum(cnt) OVER (PARTITION BY event_type) AS n,
      |    sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum
      |  FROM st),
      |sel AS (SELECT event_type, bin, cnt, n, cum, cum - cnt AS bef FROM c),
      |q50 AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
      |    max(round(CAST(0 AS DOUBLE) +
      |      (bin + (CAST(0.5 AS DOUBLE) * (n - 1) - bef) / cnt) * CAST(10 AS DOUBLE), 6)) AS p50
      |  FROM sel WHERE CAST(0.5 AS DOUBLE) * (n - 1) >= bef
      |    AND CAST(0.5 AS DOUBLE) * (n - 1) < cum GROUP BY event_type),
      |q90 AS (SELECT event_type,
      |    max(round(CAST(0 AS DOUBLE) +
      |      (bin + (CAST(0.9 AS DOUBLE) * (n - 1) - bef) / cnt) * CAST(10 AS DOUBLE), 6)) AS p90
      |  FROM sel WHERE CAST(0.9 AS DOUBLE) * (n - 1) >= bef
      |    AND CAST(0.9 AS DOUBLE) * (n - 1) < cum GROUP BY event_type)
      |SELECT q50.event_type, q50.n, q50.p50, q90.p90
      |FROM q50 JOIN q90 USING (event_type) ORDER BY event_type""".stripMargin

  def histQuantileState: Q = Q(
    "q135_hist_quantile_state",
    histQuantileSql,
  ) { (s, dir) =>
    import graft.warehouse.HistState
    val (lo, hi, bins) = (0.0, 500.0, 50)
    val keys = Seq("event_type")
    val cut = lit("2024-01-16").cast("timestamp")
    val ev = Tables.events(s, dir).select(col("event_type"), col("value"), col("ts"))
    def side(pred: org.apache.spark.sql.Column) =
      HistState.build(ev.filter(pred).drop("ts"), keys, "value", lo, hi, bins)
    val merged = graft.dedup.Dedup.persistTracked(
      HistState.merge(side(col("ts") < cut), side(col("ts") >= cut), keys))
    val n = merged.groupBy("event_type").agg(sum("cnt").as("n"))
    val p50 = HistState.quantile(merged, keys, lo, hi, bins, 0.5)
      .withColumnRenamed("q", "p50")
    val p90 = HistState.quantile(merged, keys, lo, hi, bins, 0.9)
      .withColumnRenamed("q", "p90")
    n.join(p50, keys).join(p90, keys)
      .select(col("event_type"), col("n"), col("p50"), col("p90"))
      .orderBy("event_type")
  }

  // --- q143: streaming histogram-state maintenance -------------------------
  // q135's state maintained by Structured Streaming instead of batch
  // merges: the SAME `HistState.build` call runs over a live stream
  // (keyed streaming aggregation — Spark keeps (group, bin) counters
  // as store state, which is exactly the histogram state table), the
  // drained counters feed the SAME `HistState.quantile`, and the
  // result must hash-match the SAME full-table oracle as q135. One
  // code path, three refresh modes (batch rebuild, delta merge,
  // stream) — the q62/q77 twin pattern applied to the sketch family.
  def streamingHistState: Q = Q(
    "q143_streaming_hist_state",
    histQuantileSql,
  ) { (s, dir) =>
    import graft.warehouse.HistState
    val (lo, hi, bins) = (0.0, 500.0, 50)
    val keys = Seq("event_type")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet") // schema probe only
    val stream = graft.Tables.normalizeEventsTs(
      s.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
      .select(col("event_type"), col("value"))
    val state = HistState.build(stream, keys, "value", lo, hi, bins)
    val sink = s"graft_stream_${System.nanoTime()}"
    val q = state.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val drained = s.table(sink).localCheckpoint(true)
    s.catalog.dropTempView(sink)
    val n = drained.groupBy("event_type").agg(sum("cnt").as("n"))
    val p50 = HistState.quantile(drained, keys, lo, hi, bins, 0.5)
      .withColumnRenamed("q", "p50")
    val p90 = HistState.quantile(drained, keys, lo, hi, bins, 0.9)
      .withColumnRenamed("q", "p90")
    n.join(p50, keys).join(p90, keys)
      .select(col("event_type"), col("n"), col("p50"), col("p90"))
      .orderBy("event_type")
  }

  // --- q126: incremental aggregate-state maintenance ----------------------
  // The warehouse refresh path: the monthly summary table is NOT
  // recomputed from the full fact table — the new partition's partial
  // state folds into the stored state (warehouse.AggState), and the
  // oracle proves merge(build(old), build(delta)) == build(all) bit
  // for bit (counts and DECIMAL sums associative, min/max idempotent).
  // At 100 TB this turns a full-corpus scan per refresh into a
  // delta-sized one.
  def aggStateMerge: Q = Q(
    "q126_agg_state_merge",
    """SELECT o_orderpriority AS priority,
      |  date_trunc('month', o_orderdate) AS month,
      |  CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
      |  min(o_totalprice) AS vmin, max(o_totalprice) AS vmax,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_v
      |FROM orders
      |GROUP BY 1, 2 ORDER BY priority, month""".stripMargin,
  ) { (s, dir) =>
    val keys = Seq("priority", "month")
    val cut = lit("1997-01-01").cast("timestamp")
    val prep = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("priority"),
        date_trunc("month", col("o_orderdate")).as("month"),
        col("o_totalprice").as("v"), col("o_orderdate"))
    def side(pred: org.apache.spark.sql.Column) =
      AggState.build(prep.filter(pred).drop("o_orderdate"), keys, "v")
    val merged = AggState.merge(side(col("o_orderdate") < cut),
      side(col("o_orderdate") >= cut), keys)
    AggState.withAvg(merged)
      .select(col("priority"), col("month"), col("cnt"),
        col("total").cast("double").as("total"), col("vmin"), col("vmax"), col("avg_v"))
      .orderBy("priority", "month")
  }

  // --- q111: equi-width histogram -------------------------------------------
  // 20-bin equi-width histogram of order value — the q93 profile's
  // distribution companion. One scan + one tiny aggregate: bounds ride
  // the broadcast-scalar CROSS pattern, the bin index is pure double
  // arithmetic (identical in both engines), and per-bin revenue uses
  // the decimal-exact dsum. The top edge folds into the last bin via
  // least(), so max(v) rows are counted, not dropped.
  def histogram: Q = Q(
    "q111_histogram",
    """WITH bounds AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders),
      |b AS (
      |  SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 20.0)), 19) AS BIGINT) AS bin,
      |    count(*) AS n, min(lo) AS lo, min(hi) AS hi,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |  FROM orders CROSS JOIN bounds GROUP BY 1)
      |SELECT bin, round(lo + bin * ((hi - lo) / 20.0), 2) AS bin_lo,
      |  CAST(n AS BIGINT) AS n, total
      |FROM b ORDER BY bin""".stripMargin,
  ) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val bounds = o.agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
    o.crossJoin(broadcast(bounds))
      .groupBy(least(floor((col("o_totalprice") - col("lo"))
          / ((col("hi") - col("lo")) / 20.0)), lit(19.0)).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), min("lo").as("lo"), min("hi").as("hi"),
        dsum(col("o_totalprice")).as("total"))
      .select(col("bin"), round(col("lo") + col("bin") * ((col("hi") - col("lo")) / 20.0), 2).as("bin_lo"),
        col("n"), col("total"))
      .orderBy("bin")
  }

  // --- H1: SHA-256 PII anonymization --------------------------------------
  def sha2Anonymize: Q = Q(
    "q29_sha2_anonymize",
    """SELECT c_custkey, sha256(c_name) AS anonymized_name
      |FROM customer
      |ORDER BY c_custkey""".stripMargin,
  ) { (s, dir) =>
    Tables.customer(s, dir)
      .select(col("c_custkey"), Transforms.anonymize(col("c_name")).as("anonymized_name"))
      .orderBy("c_custkey")
  }

  // --- H2+H3: age computation + labeled bucketing -------------------------
  // Order "age" in whole years at a pinned as-of date stands in for the
  // patient date-of-birth → age-group chain (`scripts/etl.py:40-62`).
  def ageBucket: Q = Q(
    "q30_age_bucket",
    """SELECT CASE WHEN age_years < 27 THEN '1: <27y'
      |            WHEN age_years < 29 THEN '2: 27-28y'
      |            WHEN age_years < 31 THEN '3: 29-30y'
      |            ELSE '4: 31y+' END AS age_bucket,
      |  count(*) AS cnt
      |FROM (SELECT CAST(floor(date_diff('day', CAST(o_orderdate AS DATE), DATE '2026-08-12') / 365.25) AS INT) AS age_years
      |      FROM orders)
      |GROUP BY 1
      |ORDER BY age_bucket""".stripMargin,
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .select(floor(datediff(lit("2026-08-12").cast("date"), col("o_orderdate").cast("date")) / 365.25)
        .cast("int").as("age_years"))
      .withColumn("age_bucket",
        when(col("age_years") < 27, "1: <27y")
          .when(col("age_years") < 29, "2: 27-28y")
          .when(col("age_years") < 31, "3: 29-30y")
          .otherwise("4: 31y+"))
      .groupBy("age_bucket").agg(count(lit(1)).as("cnt"))
      .orderBy("age_bucket")
  }

  // --- B7: validity-flag computation --------------------------------------
  def validity: Q = Q(
    "q31_validity_flags",
    """SELECT count(*) AS total,
      |  CAST(sum(CASE WHEN c_custkey IS NOT NULL AND c_name IS NOT NULL
      |                     AND c_nationkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS valid_records,
      |  CAST(sum(CASE WHEN c_custkey IS NOT NULL AND c_name IS NOT NULL
      |                     AND c_nationkey IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS invalid_records
      |FROM customer""".stripMargin,
  ) { (s, dir) =>
    val required = Seq(col("c_custkey"), col("c_name"), col("c_nationkey"))
    Tables.customer(s, dir)
      .withColumn("valid_record", Transforms.validRecord(required))
      .agg(count(lit(1)).as("total"),
        sum(when(col("valid_record"), 1).otherwise(0)).as("valid_records"),
        sum(when(col("valid_record"), 0).otherwise(1)).as("invalid_records"))
  }

  // --- A7+C5: key-based upsert (ON CONFLICT DO UPDATE semantics) ----------
  // existing = pre-2000 orders; incoming = re-stated 1999+ orders with a
  // marker status and adjusted price. Incoming wins on key collision.
  def mergeUpsert: Q = Q(
    "q32_merge_upsert",
    """WITH existing AS (
      |  SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01'),
      |incoming AS (
      |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
      |         o_totalprice + 25.0 AS o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'),
      |merged AS (
      |  SELECT * FROM existing e
      |  WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.o_orderkey = e.o_orderkey)
      |  UNION ALL SELECT * FROM incoming)
      |SELECT o_orderstatus, count(*) AS cnt,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM merged
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin,
  ) { (s, dir) =>
    val orders   = Tables.orders(s, dir)
    val existing = orders.filter(col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
    val incoming = orders.filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") + 25.0)
    Merge.upsert(existing, incoming, Seq("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"),
        dsum(col("o_totalprice")).as("revenue"))
      .orderBy("o_orderstatus")
  }

  // --- E2/§7.3: contiguous surrogate keys without a global window ---------
  def surrogateKeys: Q = Q(
    "q33_surrogate_keys",
    """SELECT n_nationkey, n_name,
      |  row_number() OVER (ORDER BY n_name) AS skey
      |FROM nation
      |ORDER BY n_nationkey""".stripMargin,
  ) { (s, dir) =>
    Keys.addSurrogate(Tables.nation(s, dir), "skey", Seq(col("n_name")))
      .select("n_nationkey", "n_name", "skey")
      .orderBy("n_nationkey")
  }

  // --- q93: one-pass data-quality column profile ---------------------------
  // The load-gate report: completeness, exact distinctness, and value
  // ranges for every audited column, computed in a single aggregation
  // pass (Expand for the multi-column exact distincts) and unpivoted
  // map-side. c_acctbal is profiled through a DECIMAL cast so its
  // min/max strings are engine-portable.
  def columnProfile: Q = {
    val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    def one(c: String, expr: String) =
      s"""SELECT '$c' AS col_name, count(*) AS n_rows, count($expr) AS n_nonnull,
         |  count(DISTINCT $expr) AS n_distinct,
         |  CAST(min($expr) AS VARCHAR) AS min_val, CAST(max($expr) AS VARCHAR) AS max_val
         |FROM customer""".stripMargin
    Q(
      "q93_column_profile",
      (cols.map {
        case "c_acctbal" => one("c_acctbal", "CAST(c_acctbal AS DECIMAL(18,2))")
        case c           => one(c, c)
      }).mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    ) { (s, dir) =>
      Quality.profile(
          Tables.customer(s, dir)
            .withColumn("c_acctbal", col("c_acctbal").cast("decimal(18,2)")),
          cols)
        .orderBy("col_name")
    }
  }

  // --- q91: SCD2 dimension history from a change log ----------------------
  // The reference's dimensions are current-state-only (Postgres upsert);
  // this rebuilds the type-2 history — per customer, each run of orders
  // with the same priority is one versioned interval, a priority change
  // opens the next. One hash shuffle on the key: the change-flag
  // window, per-version aggregation, and interval-closing lead all
  // reuse the o_custkey partitioning.
  def scd2History: Q = Q(
    "q91_scd2_history",
    """WITH flagged AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
      |    CASE WHEN row_number() OVER w = 1
      |           OR o_orderpriority IS DISTINCT FROM lag(o_orderpriority) OVER w
      |         THEN 1 ELSE 0 END AS chg
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |versioned AS (
      |  SELECT *, CAST(sum(chg) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS version
      |  FROM flagged),
      |per_version AS (
      |  SELECT o_custkey, version, min(o_orderdate) AS effective_from,
      |         min(o_orderpriority) AS o_orderpriority
      |  FROM versioned GROUP BY 1, 2)
      |SELECT o_custkey, version, o_orderpriority, effective_from,
      |  lead(effective_from) OVER wv AS effective_to,
      |  CASE WHEN lead(effective_from) OVER wv IS NULL THEN 1 ELSE 0 END AS is_current
      |FROM per_version
      |WINDOW wv AS (PARTITION BY o_custkey ORDER BY version)
      |ORDER BY o_custkey, version""".stripMargin,
  ) { (s, dir) =>
    Scd2.fromChangeLog(Tables.orders(s, dir), Seq("o_custkey"),
        col("o_orderdate"), Seq(col("o_orderkey")), Seq("o_orderpriority"))
      .select("o_custkey", "version", "o_orderpriority",
        "effective_from", "effective_to", "is_current")
      .orderBy("o_custkey", "version")
  }

  // --- H4: differential-privacy Laplace noise (keyed, reproducible) -------
  def dpLaplace: Q = Q(
    "q34_dp_laplace",
    """SELECT o_orderkey,
      |  round(greatest(0.0, o_totalprice
      |    + (-(1.0 / 0.1) * sign(u) * ln(1 - 2 * abs(u)))), 2) AS noised_price
      |FROM (SELECT o_orderkey, o_totalprice,
      |        (CAST((o_orderkey * 2654435761 + 42) % 1000003 AS DOUBLE) + 0.5) / 1000003.0 - 0.5 AS u
      |      FROM orders)
      |ORDER BY o_orderkey""".stripMargin,
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        round(Transforms.laplaceNoisedKeyed(col("o_totalprice"), col("o_orderkey"), 0.1, 42L), 2)
          .as("noised_price"))
      .orderBy("o_orderkey")
  }

  // --- q240: Fellegi-Sunter record linkage ---------------------------------
  // Probabilistic entity resolution — the warehouse op that merges a
  // re-crawled/partner customer feed without shared keys. A dirty
  // twin of `customer` is synthesized deterministically (every 5th
  // name case-mangled, every 11th balance shifted +250 vs the global
  // +0.37 drift, every 7th segment lost), then: BLOCK on
  // (nationkey, 1000-unit balance bucket) — a keyed equi-join, never
  // clean×dirty; SCORE each candidate with Fellegi-Sunter log-
  // likelihood weights ln(m/u) / ln((1−m)/(1−u)) over three field
  // comparators (name equality, segment equality, |Δbal| ≤ 1) with
  // published m/u priors; CLASSIFY at ≥6 link / ≥2 possible. Because
  // the synthetic truth is recoverable (dirty key = clean key + 10⁶),
  // the report grades itself: per-class precision plus the blocking-
  // recall row (true pairs whose +250 shift crossed a block boundary
  // are invisible — production widens blocks with a second pass; the
  // row makes that cost visible). ln terms 9-dp rounded, scores 6-dp;
  // all comparators exact arithmetic.
  /** The q240/q264 Fellegi-Sunter core: deterministically-dirtied twin,
    * blocked candidate pairs, 9-dp log-likelihood scores. Returns
    * (c_custkey, d_key, a_name, a_seg, a_bal, is_true, score).
    */
  private def linkageScores(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val dirty = cust.select(
      (col("c_custkey") + 1000000L).as("d_key"),
      when(col("c_custkey") % 5 === 0, upper(col("c_name"))).otherwise(col("c_name"))
        .as("d_name"),
      col("c_nationkey").as("d_nationkey"),
      (col("c_acctbal") + when(col("c_custkey") % 11 === 0, 250.0).otherwise(0.37))
        .as("d_bal"),
      when(col("c_custkey") % 7 === 0, "UNKNOWN").otherwise(col("c_mktsegment"))
        .as("d_seg"))
    val cand = cust.join(dirty,
      dirty("d_nationkey") === cust("c_nationkey") &&
        floor(dirty("d_bal") / 1000.0).cast("int") === floor(cust("c_acctbal") / 1000.0).cast("int"))
      .select(col("c_custkey"), col("d_key"),
        (col("c_name") === col("d_name")).as("a_name"),
        (col("c_mktsegment") === col("d_seg")).as("a_seg"),
        (abs(col("c_acctbal") - col("d_bal")) <= 1.0).as("a_bal"),
        (col("d_key") - 1000000L === col("c_custkey")).as("is_true"))
    // disagreement priors written as explicit literals (NOT 1−m in
    // Scala: 1−0.8 is 0.19999…96 in binary, the SQL literal 0.2 isn't)
    def w(agree: org.apache.spark.sql.Column,
        m: Double, u: Double, dm: Double, du: Double) =
      round(when(agree, log(lit(m) / lit(u))).otherwise(log(lit(dm) / lit(du))), 9)
    cand.withColumn("score", round(
      w(col("a_name"), 0.8, 0.001, 0.2, 0.999)
        + w(col("a_seg"), 0.86, 0.2, 0.14, 0.8)
        + w(col("a_bal"), 0.91, 0.01, 0.09, 0.99), 6))
  }

  /** The q240/q264 Fellegi-Sunter core as oracle CTEs (through `sc`). */
  private def LinkageSql: String =
    """dirty AS (SELECT c_custkey + 1000000 AS d_key,
      |    CASE WHEN c_custkey % 5 = 0 THEN upper(c_name) ELSE c_name END AS d_name,
      |    c_nationkey AS d_nationkey,
      |    c_acctbal + CASE WHEN c_custkey % 11 = 0 THEN 250.0 ELSE 0.37 END AS d_bal,
      |    CASE WHEN c_custkey % 7 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS d_seg
      |  FROM customer),
      |cand AS (SELECT c.c_custkey, d.d_key,
      |    (c.c_name = d.d_name) AS a_name,
      |    (c.c_mktsegment = d.d_seg) AS a_seg,
      |    (abs(c.c_acctbal - d.d_bal) <= 1.0) AS a_bal,
      |    (d.d_key - 1000000 = c.c_custkey) AS is_true
      |  FROM customer c JOIN dirty d
      |    ON d.d_nationkey = c.c_nationkey
      |   AND CAST(floor(d.d_bal / 1000.0) AS INT) = CAST(floor(c.c_acctbal / 1000.0) AS INT)),
      |sc AS (SELECT *, round(
      |    round(CASE WHEN a_name THEN ln(CAST(0.8 AS DOUBLE) / CAST(0.001 AS DOUBLE))
      |               ELSE ln(CAST(0.2 AS DOUBLE) / CAST(0.999 AS DOUBLE)) END, 9)
      |  + round(CASE WHEN a_seg THEN ln(CAST(0.86 AS DOUBLE) / CAST(0.2 AS DOUBLE))
      |               ELSE ln(CAST(0.14 AS DOUBLE) / CAST(0.8 AS DOUBLE)) END, 9)
      |  + round(CASE WHEN a_bal THEN ln(CAST(0.91 AS DOUBLE) / CAST(0.01 AS DOUBLE))
      |               ELSE ln(CAST(0.09 AS DOUBLE) / CAST(0.99 AS DOUBLE)) END, 9),
      |    6) AS score FROM cand)""".stripMargin

  def recordLinkage: Q = Q(
    "q240_record_linkage",
    s"""WITH $LinkageSql,
      |cls AS (SELECT CASE WHEN score >= 6.0 THEN 'link'
      |               WHEN score >= 2.0 THEN 'possible'
      |               ELSE 'non_link' END AS bucket,
      |    count(*) AS n_pairs,
      |    CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true_pairs
      |  FROM sc GROUP BY 1),
      |nn AS (SELECT count(*) AS n FROM customer)
      |SELECT bucket, CAST(n_pairs AS BIGINT) AS n_pairs, n_true_pairs,
      |  round(CAST(n_true_pairs AS DOUBLE) / n_pairs, 4) AS precision_or_recall
      |FROM cls
      |UNION ALL
      |SELECT 'zz_blocking', CAST(sum(n_pairs) AS BIGINT),
      |  CAST(sum(n_true_pairs) AS BIGINT),
      |  round(CAST(sum(n_true_pairs) AS DOUBLE) / max(nn.n), 4)
      |FROM cls CROSS JOIN nn
      |ORDER BY bucket""".stripMargin,
  ) { (s, dir) =>
    val cust = Tables.customer(s, dir)
    val sc = linkageScores(s, dir)
    val cls = graft.dedup.Dedup.persistTracked(sc
      .groupBy(when(col("score") >= 6.0, "link")
        .when(col("score") >= 2.0, "possible").otherwise("non_link").as("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("is_true"), 1).otherwise(0)).cast("long").as("n_true_pairs")))
    val nn = cust.agg(count(lit(1)).as("n"))
    val perClass = cls.select(col("bucket"), col("n_pairs").cast("long").as("n_pairs"),
      col("n_true_pairs"),
      round(col("n_true_pairs").cast("double") / col("n_pairs"), 4)
        .as("precision_or_recall"))
    val blocking = cls.crossJoin(broadcast(nn))
      .agg(sum("n_pairs").cast("long").as("n_pairs"),
        sum("n_true_pairs").cast("long").as("n_true_pairs"),
        round(sum("n_true_pairs").cast("double") / max(col("n")), 4)
          .as("precision_or_recall"))
      .select(lit("zz_blocking").as("bucket"), col("n_pairs"), col("n_true_pairs"),
        col("precision_or_recall"))
    perClass.union(blocking).orderBy("bucket")
  }

  // --- q264: entity consolidation over the linkage graph ---------------------
  // q240 scores PAIRS; master-data consolidation needs ENTITIES —
  // link pairs can chain (A↔B, B↔C) and a golden record covers the
  // whole chain, so the resolution step is connected components over
  // the score ≥ 6 link graph (the q71 closure machinery on linkage
  // edges instead of near-dup edges). The synthetic truth key makes
  // the audit self-grading: a cluster is PURE when every member maps
  // to one true entity — the over-merge rate falls straight out.
  // Vertices are only the linked records (unlinked rows need no
  // consolidation and never enter the closure); the oracle replays
  // the closure as a recursive CTE (the q195 discipline).
  def linkageClusters: Q = Q(
    "q264_linkage_clusters",
    s"""WITH RECURSIVE $LinkageSql,
      |links AS (SELECT c_custkey AS src, d_key AS dst FROM sc WHERE score >= 6.0),
      |verts AS (SELECT DISTINCT src AS id FROM links
      |          UNION SELECT DISTINCT dst FROM links),
      |edges AS (SELECT src, dst FROM links UNION SELECT dst, src FROM links),
      |reach(id, lab) AS (
      |  SELECT id, id FROM verts
      |  UNION
      |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
      |cl AS (SELECT id, min(lab) AS cid FROM reach GROUP BY id),
      |ag AS (SELECT cid, count(*) AS csz,
      |    count(DISTINCT CASE WHEN id >= 1000000 THEN id - 1000000 ELSE id END) AS ne
      |  FROM cl GROUP BY cid)
      |SELECT CAST(csz AS BIGINT) AS cluster_size,
      |  CAST(count(*) AS BIGINT) AS n_clusters,
      |  CAST(sum(CASE WHEN ne = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pure,
      |  CAST(csz * count(*) AS BIGINT) AS n_records
      |FROM ag GROUP BY csz ORDER BY cluster_size""".stripMargin,
  ) { (s, dir) =>
    import graft.dedup.Clusters
    val links = graft.dedup.Dedup.persistTracked(
      linkageScores(s, dir).filter(col("score") >= 6.0)
        .select(col("c_custkey").as("src"), col("d_key").as("dst")))
    val verts = links.select(col("src").as("id"))
      .union(links.select(col("dst").as("id"))).distinct()
    val edges = links.select("src", "dst")
      .union(links.select(col("dst").as("src"), col("src").as("dst")))
    val comp = Clusters.connectedComponents(verts, "id", edges, "src", "dst")
    val ag = comp
      .withColumn("entity",
        when(col("id") >= 1000000L, col("id") - 1000000L).otherwise(col("id")))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("csz"), countDistinct("entity").as("ne"))
    ag.groupBy("csz")
      .agg(count(lit(1)).cast("long").as("n_clusters"),
        sum(when(col("ne") === 1, 1).otherwise(0)).cast("long").as("n_pure"))
      .select(col("csz").cast("long").as("cluster_size"), col("n_clusters"),
        col("n_pure"), (col("csz") * col("n_clusters")).cast("long").as("n_records"))
      .orderBy("cluster_size")
  }

  // --- q241: Z-order layout audit ------------------------------------------
  // Before rewriting a 100 TB fact table, the layout decision wants
  // NUMBERS: how many files would a point query scan under the
  // current order vs a single-column sort vs Morton (Z-order)
  // interleaving? This audit simulates all three: normalize custkey
  // and order-day to 8 bits (exact integer scaling against the
  // corpus min/max), interleave bits for the Z-value, assign 32
  // files per layout by ntile (the stand-in for the writer's
  // repartitionByRange — the audit, like the write job it prices, is
  // allowed one global sort), collect per-file min/max zone maps, and
  // replay a 16-probe point workload per dimension against them. The
  // punchline rows: a custkey sort prunes custkey probes to 1/32 but
  // scans everything for dates; Z-order prunes BOTH dims several-fold
  // — the quantified case for interleaving. Zone-map checks are
  // exact integer comparisons; the probe×file replay is (96 × 32)
  // rows of driver-free arithmetic.
  def zorderLayout: Q = {
    val zTerms = (0 until 8).map(i =>
      s"(((c8 >> $i) & 1) << ${2 * i}) + (((d8 >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")
    Q(
      "q241_zorder_layout",
      s"""WITH base AS (SELECT o_orderkey, o_custkey,
        |    datediff('day', TIMESTAMP '1992-01-01', o_orderdate) AS day
        |  FROM orders),
        |st AS (SELECT min(o_custkey) AS cmin, max(o_custkey) AS cmax,
        |    min(day) AS dmin, max(day) AS dmax FROM base),
        |e AS (SELECT o_orderkey, o_custkey, day,
        |    ((o_custkey - cmin) * 256) // (cmax - cmin + 1) AS c8,
        |    ((day - dmin) * 256) // (dmax - dmin + 1) AS d8
        |  FROM base CROSS JOIN st),
        |z AS (SELECT *, $zTerms AS zval FROM e),
        |f AS (
        |  SELECT 'a_natural' AS layout,
        |    ntile(32) OVER (ORDER BY o_orderkey) AS file_id, o_custkey, day FROM z
        |  UNION ALL
        |  SELECT 'b_custsort', ntile(32) OVER (ORDER BY o_custkey, o_orderkey),
        |    o_custkey, day FROM z
        |  UNION ALL
        |  SELECT 'c_zorder', ntile(32) OVER (ORDER BY zval, o_orderkey),
        |    o_custkey, day FROM z),
        |zones AS (SELECT layout, file_id,
        |    min(o_custkey) AS clo, max(o_custkey) AS chi,
        |    min(day) AS dlo, max(day) AS dhi
        |  FROM f GROUP BY layout, file_id),
        |probes AS (
        |  SELECT 'custkey' AS dim, cmin + ((cmax - cmin) * i) // 16 AS v
        |  FROM st, UNNEST(range(0, 16)) AS u(i)
        |  UNION ALL
        |  SELECT 'day', dmin + ((dmax - dmin) * i) // 16
        |  FROM st, UNNEST(range(0, 16)) AS u(i))
        |SELECT layout, dim AS query_dim,
        |  round(avg(CASE WHEN (dim = 'custkey' AND v BETWEEN clo AND chi)
        |                   OR (dim = 'day' AND v BETWEEN dlo AND dhi)
        |            THEN 1.0 ELSE 0.0 END), 4) AS files_scanned_frac
        |FROM zones CROSS JOIN probes
        |GROUP BY layout, dim ORDER BY layout, query_dim""".stripMargin,
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val base = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).as("day"))
      val st = base.agg(min("o_custkey").as("cmin"), max("o_custkey").as("cmax"),
        min("day").as("dmin"), max("day").as("dmax"))
      val e = base.crossJoin(broadcast(st))
        .withColumn("c8", expr("div((o_custkey - cmin) * 256, cmax - cmin + 1)"))
        .withColumn("d8", expr("div((day - dmin) * 256, dmax - dmin + 1)"))
      val zval = (0 until 8).map { i =>
        (shiftleft(shiftright(col("c8"), i).bitwiseAND(1), 2 * i)
          + shiftleft(shiftright(col("d8"), i).bitwiseAND(1), 2 * i + 1))
      }.reduce(_ + _)
      val z = graft.dedup.Dedup.persistTracked(e.withColumn("zval", zval))
      def layout(name: String, order: Seq[org.apache.spark.sql.Column]) =
        z.select(lit(name).as("layout"),
          ntile(32).over(Window.orderBy(order: _*)).as("file_id"),
          col("o_custkey"), col("day"))
      val f = layout("a_natural", Seq(col("o_orderkey")))
        .union(layout("b_custsort", Seq(col("o_custkey"), col("o_orderkey"))))
        .union(layout("c_zorder", Seq(col("zval"), col("o_orderkey"))))
      val zones = f.groupBy("layout", "file_id")
        .agg(min("o_custkey").as("clo"), max("o_custkey").as("chi"),
          min("day").as("dlo"), max("day").as("dhi"))
      val probes = s.range(0, 16).crossJoin(broadcast(st))
        .select(lit("custkey").as("dim"),
          (col("cmin") + expr("div((cmax - cmin) * id, 16)")).as("v"))
        .union(s.range(0, 16).crossJoin(broadcast(st))
          .select(lit("day").as("dim"),
            (col("dmin") + expr("div((dmax - dmin) * id, 16)")).as("v")))
      zones.crossJoin(broadcast(probes))
        .groupBy(col("layout"), col("dim").as("query_dim"))
        .agg(round(avg(
          when((col("dim") === "custkey" && col("v").between(col("clo"), col("chi")))
            || (col("dim") === "day" && col("v").between(col("dlo"), col("dhi"))),
            1.0).otherwise(0.0)), 4).as("files_scanned_frac"))
        .orderBy("layout", "query_dim")
    }
  }

  // --- q332: Benford first-digit audit -------------------------------------------
  // The classic fabricated-data screen: naturally-occurring monetary
  // values follow P(d) = log10(1 + 1/d) on the leading digit; a
  // synthetic or truncated feed bends the curve. Per digit 1–9:
  // observed count/share vs the Benford expectation and the χ² term —
  // one scan into a 9-row aggregate, every share an integer ratio,
  // the expectation a 9-dp-rounded literal so both engines compare
  // identical grid points. (The generator's uniform-ish prices FAIL
  // Benford — the audit's point is to say so, and the oracle agrees.)
  def benfordAudit: Q = {
    // the Benford expectation as 9-dp literals shared VERBATIM by both
    // engines — computing log10 in each engine risks a last-ulp libm
    // divergence exactly at a rounding boundary
    val ps = (1 to 9).map(u => u -> BigDecimal(math.log10(1.0 + 1.0 / u))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    Q(
    "q332_benford_audit",
    s"""WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
      |      AS VARCHAR), 1, 1) AS INTEGER) AS digit
      |  FROM orders WHERE o_totalprice >= 1),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
      |o AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY digit),
      |ax AS (SELECT * FROM (VALUES ${ps.map { case (u, p) => s"($u, $p)" }.mkString(", ")})
      |       v(digit, p))
      |SELECT ax.digit, CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
      |  round(CAST(COALESCE(o.n_obs, 0) AS DOUBLE) / n.n, 6) AS obs_share,
      |  round(p, 6) AS exp_share,
      |  round((COALESCE(o.n_obs, 0) - n.n * p) * (COALESCE(o.n_obs, 0) - n.n * p)
      |    / (n.n * p), 6) AS chi2_term
      |FROM ax LEFT JOIN o ON o.digit = ax.digit CROSS JOIN n
      |ORDER BY ax.digit""".stripMargin,
  ) { (s, dir) =>
    import s.implicits._
    val d = Tables.orders(s, dir)
      .filter(col("o_totalprice") >= 1)
      .select(substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
    val o = graft.dedup.Dedup.persistTracked(
      d.groupBy("digit").agg(count(lit(1)).as("n_obs")))
    val n = o.agg(sum(col("n_obs")).cast("long").as("n"))
    val ax = ps.toDF("digit", "p")
    broadcast(ax).join(o, Seq("digit"), "left").crossJoin(broadcast(n))
      .select(col("digit"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        round(coalesce(col("n_obs"), lit(0L)).cast("double") / col("n"), 6)
          .as("obs_share"),
        round(col("p"), 6).as("exp_share"),
        round((coalesce(col("n_obs"), lit(0L)) - col("n") * col("p"))
          * (coalesce(col("n_obs"), lit(0L)) - col("n") * col("p"))
          / (col("n") * col("p")), 6).as("chi2_term"))
      .orderBy("digit")
    }
  }
}
