package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Rollup (D15 extension) and the documented approximate-at-scale
  * variants of exact operators (SURVEY.md §7.7 item 5): sketch-based
  * distinct counts and percentiles swap in per query when exactness is
  * not contract — single-pass, fixed memory, no exact-dedup shuffle.
  */
object Scale {

  val all: Seq[Q] = Seq(rollup, approxDistinct, approxPercentile, groupingSets,
    saltedSkewJoin, cmsHeavyHitters, hllDistinctState, bloomPlanner)

  // --- q136: incremental distinct-count maintenance (mergeable HLL) --------
  // The sketch family's member of the q126/q135 refresh contract:
  // COUNT(DISTINCT) is not mergeable from counts, so the stored state
  // is a per-(event_type, day) Apache DataSketches HLL of user_id
  // (Spark's codegen hll_sketch_agg — fixed memory per group). A
  // monthly refresh unions ONLY the new day's sketches
  // (hll_union_agg, register-wise max — associative, commutative,
  // idempotent), never rescans the fact table. The q56 split oracle:
  // DuckDB's HLL is a different sketch, so the estimate itself can't
  // hash-match — instead the EXACT column hash-matches countDistinct
  // and the estimate is pinned to its published error bound
  // (lgConfigK=12 ⇒ σ ≈ 1.04/√4096 ≈ 1.6%; 6% ≈ 3.7σ — the q56 bar)
  // as `approx_ok`, which the SQL side emits as literal TRUE. A sketch
  // drifting past its guarantee now FAILS the gate instead of hiding
  // behind rows-only. Union-associativity — union(build(days)) ==
  // build(all) register-exact — stays gated in GraphAggStateSpec.
  def hllDistinctState: Q = Q(
    "q136_hll_distinct_state",
    """SELECT event_type,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS approx_ok
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin,
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
    // state table: one
    // sketch per (event_type, day) — the stored granularity
    val state = ev.groupBy("event_type", "day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val monthly = state.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).cast("long").as("approx_users"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    monthly.join(exact, "event_type")
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double")
          / col("exact_users") <= 0.06).as("approx_ok"))
      .orderBy("event_type")
  }

  // --- q112: Count-Min sketch heavy hitters ---------------------------------
  // The third sketch in the family (HLL q56, KLL q57): term frequencies
  // estimated from a 4×4096 Count-Min sketch next to their exact
  // counts. Hash rows are disjoint 3-hex-digit slices of md5(term) —
  // identical in both engines, so the WHOLE sketch is oracle-checkable,
  // not just the exact column; the one-sided error bound (est ≥ exact,
  // over by ≤ vocab_mass/4096 w.h.p.) is spec'd in AnalyticsOpsSpec.
  // Scale shape: counters aggregate the compact (term, n) table, the
  // finished sketch (16k rows) broadcasts to score the panel — at
  // stream scale the same counters come from the raw token stream with
  // fixed memory, which is the point of the sketch.
  def cmsHeavyHitters: Q = Q(
    "q112_cms_heavy_hitters",
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT term, count(*) AS n FROM toks WHERE len(term) > 0 GROUP BY 1),
      |wb AS (SELECT term, n,
      |  substring(md5(term), 1, 3) AS b0, substring(md5(term), 4, 3) AS b1,
      |  substring(md5(term), 7, 3) AS b2, substring(md5(term), 10, 3) AS b3 FROM tf),
      |counters AS (
      |  SELECT 0 AS i, b0 AS bucket, sum(n) AS c FROM wb GROUP BY 2
      |  UNION ALL SELECT 1, b1, sum(n) FROM wb GROUP BY 2
      |  UNION ALL SELECT 2, b2, sum(n) FROM wb GROUP BY 2
      |  UNION ALL SELECT 3, b3, sum(n) FROM wb GROUP BY 2),
      |top AS (SELECT * FROM wb ORDER BY n DESC, term LIMIT 20),
      |melt AS (
      |  SELECT term, n, 0 AS i, b0 AS bucket FROM top
      |  UNION ALL SELECT term, n, 1, b1 FROM top
      |  UNION ALL SELECT term, n, 2, b2 FROM top
      |  UNION ALL SELECT term, n, 3, b3 FROM top)
      |SELECT term, CAST(n AS BIGINT) AS n, CAST(min(c) AS BIGINT) AS cms_est
      |FROM melt JOIN counters USING (i, bucket)
      |GROUP BY term, n ORDER BY n DESC, term""".stripMargin,
  ) { (s, dir) =>
    val toks = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy("term").agg(count(lit(1)).as("n"))
    val wb = tf.select(Seq(col("term"), col("n")) ++
      (0 to 3).map(i => substring(md5(col("term")), 1 + 3 * i, 3).as(s"b$i")): _*)
    val counters = (0 to 3).map { i =>
      wb.groupBy(col(s"b$i").as("bucket")).agg(sum("n").as("c")).select(lit(i).as("i"), col("bucket"), col("c"))
    }.reduce(_ unionByName _)
    val top = wb.orderBy(col("n").desc, col("term")).limit(20)
    val melt = top.select(col("term"), col("n"), explode(array(
        (0 to 3).map(i => struct(lit(i).as("i"), col(s"b$i").as("bucket"))): _*)).as("e"))
      .select(col("term"), col("n"), col("e.i").as("i"), col("e.bucket").as("bucket"))
    melt.join(broadcast(counters), Seq("i", "bucket"))
      .groupBy("term", "n")
      .agg(min("c").cast("long").as("cms_est"))
      .orderBy(col("n").desc, col("term"))
  }

  // --- salted join on a pathologically skewed key -------------------------
  // 90% of events collapse onto key 0 — the shape where one reducer
  // receives the whole table in a plain shuffled join. Skew.saltedJoin
  // spreads the hot key across `factor` reducers; the oracle runs the
  // UNSALTED equivalent, proving the rewrite is result-identical.
  def saltedSkewJoin: Q = Q(
    "q68_salted_skew_join",
    """WITH e AS (
      |  SELECT CASE WHEN event_id % 10 = 0 THEN event_id % 25 ELSE 0 END AS k, value
      |  FROM events)
      |SELECT n.n_name, count(*) AS cnt,
      |  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
      |FROM e JOIN nation n ON n.n_nationkey = e.k
      |GROUP BY n.n_name
      |ORDER BY n.n_name""".stripMargin,
  ) { (s, dir) =>
    val skewed = Tables.events(s, dir).select(
      when(col("event_id") % 10 === 0, col("event_id") % 25).otherwise(0L).as("k"),
      col("value"))
    val dim = Tables.nation(s, dir).select(col("n_nationkey").as("k"), col("n_name"))
    graft.warehouse.Skew.saltedJoin(skewed, dim, "k", factor = 8)
      .groupBy("n_name")
      .agg(count(lit(1)).as("cnt"), dsum(col("value")).as("value_sum"))
      .orderBy("n_name")
  }

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

  // --- HyperLogLog distinct -----------------------------------------------
  // Oracle-checked split: the exact column hash-matches DuckDB value for
  // value; the HLL sketch value is Spark's own, so what the oracle pins
  // is the *bound* — `approx_ok` must be TRUE (|approx−exact|/exact ≤ 6%,
  // the 3σ bound ScaleToolsSpec proves), and the SQL side emits literal
  // TRUE. A sketch drifting past its guarantee now fails the gate
  // instead of hiding behind rows-only.
  def approxDistinct: Q = Q(
    "q56_approx_distinct",
    """SELECT o_orderpriority,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
      |  TRUE AS approx_ok
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin,
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("exact_customers"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx"))
      .select(col("o_orderpriority"), col("exact_customers"),
        (abs(col("approx") - col("exact_customers")).cast("double")
          / col("exact_customers") <= 0.06).as("approx_ok"))
      .orderBy("o_orderpriority")
  }

  // --- approximate percentile ---------------------------------------------
  // Same split as q56: p90_exact hash-matches quantile_cont; the KLL
  // sketch's value is pinned via its bound (accuracy 1000 ⇒ rank error
  // ≤ n/1000 ⇒ well inside 2% relative value error on this data).
  def approxPercentile: Q = Q(
    "q57_approx_percentile",
    """SELECT o_orderpriority,
      |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90_exact,
      |  TRUE AS approx_ok
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin,
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90_exact"),
        expr("approx_percentile(o_totalprice, 0.9, 1000)").as("approx"),
        expr("percentile(o_totalprice, 0.9)").as("exact_raw"))
      .select(col("o_orderpriority"), col("p90_exact"),
        (abs(col("approx") - col("exact_raw")) / col("exact_raw") <= 0.02).as("approx_ok"))
      .orderBy("o_orderpriority")
  }

  // --- q320: bloom-filter sizing planner --------------------------------------
  // Sizes the q92 decontamination filter before anyone builds it: for
  // each target false-positive rate, the optimal bit count
  // m = ⌈−n·ln p / ln²2⌉ and hash count k = ⌊m/n·ln 2 + 0.5⌋ over the
  // corpus's MEASURED distinct-document count (the q39 (xxhash64, len)
  // key), plus the realized FPR (1 − e^(−kn/m))^k those integer
  // choices actually deliver and the filter's MiB footprint. One
  // corpus scan for the scalar n, a 3-row axis, closed-form columns.
  // Transcendental terms are 6/9-dp rounded BEFORE ceil/pow (the q221
  // exp discipline) so both engines step from identical grid points —
  // a raw ceil(libm product) could straddle an integer boundary.
  def bloomPlanner: Q = {
    val fprs = Seq(0.01, 0.001, 0.0001)
    Q(
      "q320_bloom_planner",
      s"""WITH n AS (SELECT count(DISTINCT text) AS n_keys FROM documents),
         |axis AS (SELECT * FROM (VALUES ${fprs.map(p => s"($p)").mkString(", ")}) v(p)),
         |plan AS (SELECT p, n_keys,
         |    CAST(ceil(round(-n_keys * ln(p) / (ln(2) * ln(2)), 6)) AS BIGINT) AS m_bits
         |  FROM axis, n),
         |k AS (SELECT p, n_keys, m_bits,
         |    CAST(floor(round(CAST(m_bits AS DOUBLE) / n_keys * ln(2), 6) + 0.5)
         |      AS BIGINT) AS k_hashes
         |  FROM plan)
         |SELECT p AS target_fpr, CAST(n_keys AS BIGINT) AS n_keys, m_bits, k_hashes,
         |  round(CAST(m_bits AS DOUBLE) / 8 / 1048576, 4) AS mib,
         |  round(pow(1.0 - round(exp(-CAST(k_hashes AS DOUBLE) * n_keys / m_bits), 9),
         |    CAST(k_hashes AS DOUBLE)), 9) AS realized_fpr
         |FROM k ORDER BY target_fpr DESC""".stripMargin,
    ) { (s, dir) =>
      import s.implicits._
      val n = Tables.documents(s, dir)
        .agg(countDistinct(struct(xxhash64(col("text")), length(col("text"))))
          .as("n_keys"))
      val axis = fprs.toDF("p")
      val mBits = ceil(round(-col("n_keys") * log(col("p")) /
        (log(lit(2.0)) * log(lit(2.0))), 6)).cast("long")
      val kH = floor(round(col("m_bits").cast("double") / col("n_keys") *
        log(lit(2.0)), 6) + lit(0.5)).cast("long")
      axis.crossJoin(broadcast(n))
        .withColumn("m_bits", mBits)
        .withColumn("k_hashes", kH)
        .select(col("p").as("target_fpr"), col("n_keys"), col("m_bits"),
          col("k_hashes"),
          round(col("m_bits").cast("double") / 8 / 1048576, 4).as("mib"),
          round(pow(lit(1.0) - round(exp(-col("k_hashes").cast("double") *
            col("n_keys") / col("m_bits")), 9),
            col("k_hashes").cast("double")), 9).as("realized_fpr"))
        .orderBy(col("target_fpr").desc)
    }
  }
}
