package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.privacy.PrivacyEngine

/** Privacy-engine capabilities (SURVEY.md §2.K) registered against the
  * driver tables: `customer` stands in for the patient dimension, with
  * quasi-identifiers (c_nationkey, c_mktsegment) and sensitive
  * attribute c_mktsegment.
  */
object Privacy {
  private val QI2 = Seq("c_nationkey", "c_mktsegment")
  private val QI1 = Seq("c_nationkey")

  val all: Seq[Q] = Seq(kAnonymity, suppress, generalize, ageGeneralize,
    generalizeOrSuppress, lDiversity, tCloseness, auditScore, gdprErasure,
    userLevelDp, dpMedian, randomizedResponse)

  // --- q160: right-to-erasure cascade accounting ---------------------------
  // The dry-run a GDPR deletion job emits before touching storage:
  // given a deletion list (here the deterministic c_custkey % 100 = 0
  // cohort), how many rows does the cascade remove from each table of
  // the star — customers directly, their orders via the FK, the
  // orders' lineitems transitively. Every cascade level is a keyed
  // LEFT SEMI join (the deletion list and the doomed-order keys stay
  // keyed joins, never collected or broadcast by hand — at 100 TB the
  // deletion list itself can be millions of subjects), reduced to
  // per-table scalar counts before the 3-row UNION.
  def gdprErasure: Q = Q(
    "q160_gdpr_erasure",
    """WITH del AS (SELECT c_custkey FROM customer WHERE c_custkey % 100 = 0),
      |doomed AS (SELECT o_orderkey FROM orders JOIN del ON o_custkey = c_custkey),
      |cc AS (SELECT count(*) AS total FROM customer),
      |oc AS (SELECT count(*) AS total FROM orders),
      |lc AS (SELECT count(*) AS total FROM lineitem),
      |rows AS (
      |  SELECT 'customer' AS table_name,
      |    CAST((SELECT count(*) FROM del) AS BIGINT) AS n_deleted,
      |    (SELECT total FROM cc) AS n_before
      |  UNION ALL SELECT 'orders',
      |    CAST((SELECT count(*) FROM doomed) AS BIGINT), (SELECT total FROM oc)
      |  UNION ALL SELECT 'lineitem',
      |    CAST((SELECT count(*) FROM lineitem JOIN doomed
      |      ON l_orderkey = o_orderkey) AS BIGINT), (SELECT total FROM lc))
      |SELECT table_name, n_before, n_deleted,
      |  CAST(n_before - n_deleted AS BIGINT) AS n_after,
      |  round(CAST(n_deleted AS DOUBLE) / n_before, 6) AS pct_deleted
      |FROM rows ORDER BY table_name""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.DataFrame
    val cust = Tables.customer(s, dir)
    val ord = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    val del = cust.filter(col("c_custkey") % 100 === 0).select("c_custkey")
    val doomed = ord.join(del, col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey")
    def one(name: String, deleted: DataFrame, population: DataFrame): DataFrame =
      deleted.agg(count(lit(1)).as("n_deleted"))
        .crossJoin(population.agg(count(lit(1)).as("n_before"))) // 1×1 scalar
        .select(lit(name).as("table_name"), col("n_deleted"), col("n_before"))
    Seq(
      one("customer", del, cust),
      one("orders", doomed, ord),
      one("lineitem",
        li.join(doomed, col("l_orderkey") === col("o_orderkey"), "left_semi"), li),
    ).reduce(_ unionByName _)
      .select(col("table_name"), col("n_before"), col("n_deleted"),
        (col("n_before") - col("n_deleted")).as("n_after"),
        round(col("n_deleted").cast("double") / col("n_before"), 6).as("pct_deleted"))
      .orderBy("table_name")
  }

  // --- K1: k-anonymity report --------------------------------------------
  def kAnonymity: Q = Q(
    "q23_k_anonymity",
    """WITH gs AS (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS group_size
      |  FROM customer GROUP BY 1, 2)
      |SELECT count(*) AS total_groups,
      |  CAST(coalesce(sum(CASE WHEN group_size < 5 THEN 1 END), 0) AS BIGINT) AS violating_groups,
      |  CAST(coalesce(sum(CASE WHEN group_size < 5 THEN group_size END), 0) AS BIGINT) AS affected_rows,
      |  min(group_size) AS min_group_size,
      |  max(group_size) AS max_group_size,
      |  round(CAST(sum(group_size) AS DOUBLE) / count(*), 2) AS avg_group_size,
      |  coalesce(sum(CASE WHEN group_size < 5 THEN 1 END), 0) = 0 AS is_k_anonymous
      |FROM gs""".stripMargin,
  ) { (s, dir) => PrivacyEngine.kAnonymityReport(Tables.customer(s, dir), QI2, 5) }

  // --- K2: suppression enforcement ---------------------------------------
  def suppress: Q = Q(
    "q24_k_anon_suppress",
    """SELECT c_custkey FROM (
      |  SELECT c_custkey,
      |    count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS gs
      |  FROM customer)
      |WHERE gs >= 5
      |ORDER BY c_custkey""".stripMargin,
  ) { (s, dir) =>
    PrivacyEngine.suppress(Tables.customer(s, dir), QI2, 5)
      .select("c_custkey").orderBy("c_custkey")
  }

  // --- K3: generalization enforcement ------------------------------------
  def generalize: Q = Q(
    "q25_k_anon_generalize",
    """SELECT c_custkey,
      |  CASE WHEN count(*) OVER (PARTITION BY c_nationkey, c_mktsegment) < 5
      |       THEN 'OTHER' ELSE c_mktsegment END AS c_mktsegment
      |FROM customer
      |ORDER BY c_custkey""".stripMargin,
  ) { (s, dir) =>
    PrivacyEngine.generalize(Tables.customer(s, dir), QI2, 5, "c_mktsegment", lit("OTHER"))
      .select("c_custkey", "c_mktsegment").orderBy("c_custkey")
  }

  // --- K3 (reference-shaped): age-hierarchy generalization ----------------
  // The reference's label-merging hierarchy (`privacy_engine.py:101-113`)
  // applied to a derived age_group QI: rows in (nation, age_group)
  // groups smaller than k get their bucket coarsened one level.
  def ageGeneralize: Q = Q(
    "q69_age_generalize",
    """WITH base AS (
      |  SELECT c_custkey, c_nationkey,
      |    CASE WHEN age < 18 THEN 'Child (0-17)'
      |         WHEN age < 35 THEN 'Young Adult (18-34)'
      |         WHEN age < 50 THEN 'Adult (35-49)'
      |         WHEN age < 65 THEN 'Middle-Aged (50-64)'
      |         ELSE 'Senior (65+)' END AS age_group
      |  FROM (SELECT c_custkey, c_nationkey, 18 + c_custkey % 72 AS age FROM customer)),
      |sized AS (
      |  SELECT c_custkey, age_group,
      |    count(*) OVER (PARTITION BY c_nationkey, age_group) AS gs
      |  FROM base)
      |SELECT c_custkey,
      |  CASE WHEN gs < 5 THEN
      |    CASE WHEN age_group IN ('Young Adult (18-34)', 'Adult (35-49)', 'Middle-Aged (50-64)')
      |         THEN 'Adult (18-64)' ELSE age_group END
      |  ELSE age_group END AS age_group
      |FROM sized
      |ORDER BY c_custkey""".stripMargin,
  ) { (s, dir) =>
    val base = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"),
      graft.functions.Transforms.ageGroup(lit(18) + col("c_custkey") % 72).as("age_group"))
    PrivacyEngine.generalize(base, Seq("c_nationkey", "age_group"), 5, "age_group",
      PrivacyEngine.ageGroupCoarser(col("age_group")))
      .select("c_custkey", "age_group").orderBy("c_custkey")
  }

  // --- K3 closed-guarantee: generalize, then suppress the residue ---------
  // The age hierarchy is PARTIAL (Child/Unknown/Senior have no coarser
  // bucket), so q69's single pass can leave sub-k groups untouched —
  // output that claims k-anonymity but isn't. This variant re-measures
  // on the generalized QI and suppresses rows still in sub-k groups:
  // k-anonymous by construction. Same QI shuffle key both passes.
  def generalizeOrSuppress: Q = Q(
    "q76_generalize_suppress",
    """WITH base AS (
      |  SELECT c_custkey, c_nationkey,
      |    CASE WHEN age < 18 THEN 'Child (0-17)'
      |         WHEN age < 35 THEN 'Young Adult (18-34)'
      |         WHEN age < 50 THEN 'Adult (35-49)'
      |         WHEN age < 65 THEN 'Middle-Aged (50-64)'
      |         ELSE 'Senior (65+)' END AS age_group
      |  FROM (SELECT c_custkey, c_nationkey, 18 + c_custkey % 72 AS age FROM customer)),
      |sized AS (
      |  SELECT c_custkey, c_nationkey, age_group,
      |    count(*) OVER (PARTITION BY c_nationkey, age_group) AS gs
      |  FROM base),
      |gen AS (
      |  SELECT c_custkey, c_nationkey,
      |    CASE WHEN gs < 5 THEN
      |      CASE WHEN age_group IN ('Young Adult (18-34)', 'Adult (35-49)', 'Middle-Aged (50-64)')
      |           THEN 'Adult (18-64)' ELSE age_group END
      |    ELSE age_group END AS age_group
      |  FROM sized),
      |resized AS (
      |  SELECT c_custkey, age_group,
      |    count(*) OVER (PARTITION BY c_nationkey, age_group) AS gs
      |  FROM gen)
      |SELECT c_custkey, age_group FROM resized
      |WHERE gs >= 5
      |ORDER BY c_custkey""".stripMargin,
  ) { (s, dir) =>
    val base = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"),
      graft.functions.Transforms.ageGroup(lit(18) + col("c_custkey") % 72).as("age_group"))
    PrivacyEngine.generalizeOrSuppress(base, Seq("c_nationkey", "age_group"), 5, "age_group",
      PrivacyEngine.ageGroupCoarser(col("age_group")))
      .select("c_custkey", "age_group").orderBy("c_custkey")
  }

  // --- K4: l-diversity -----------------------------------------------------
  def lDiversity: Q = Q(
    "q26_l_diversity",
    """SELECT c_nationkey,
      |  count(DISTINCT c_mktsegment) AS l_count,
      |  count(*) AS group_size,
      |  count(DISTINCT c_mktsegment) >= 3 AS l_diverse
      |FROM customer
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin,
  ) { (s, dir) =>
    PrivacyEngine.lDiversity(Tables.customer(s, dir), QI1, "c_mktsegment")
      .withColumn("l_diverse", col("l_count") >= 3)
      .orderBy("c_nationkey")
  }

  // --- K5: t-closeness (relational TVD rewrite, SURVEY §2 D14) ------------
  def tCloseness: Q = Q(
    "q27_t_closeness",
    """WITH total AS (SELECT count(*) AS n_total FROM customer),
      |overall AS (
      |  SELECT c_mktsegment,
      |    CAST(count(*) AS DOUBLE) / (SELECT n_total FROM total) AS p_overall
      |  FROM customer GROUP BY 1),
      |groups AS (SELECT c_nationkey, count(*) AS g_tot FROM customer GROUP BY 1),
      |cells AS (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS c_cnt
      |  FROM customer GROUP BY 1, 2)
      |SELECT g.c_nationkey,
      |  round(sum(abs(CAST(coalesce(c.c_cnt, 0) AS DOUBLE) / g.g_tot - o.p_overall)) / 2, 4) AS tvd
      |FROM groups g
      |CROSS JOIN overall o
      |LEFT JOIN cells c
      |  ON c.c_nationkey = g.c_nationkey AND c.c_mktsegment = o.c_mktsegment
      |GROUP BY g.c_nationkey
      |ORDER BY g.c_nationkey""".stripMargin,
  ) { (s, dir) =>
    PrivacyEngine.tCloseness(Tables.customer(s, dir), QI1, "c_mktsegment")
      .orderBy("c_nationkey")
  }

  // --- K6: comprehensive audit score --------------------------------------
  def auditScore: Q = Q(
    "q28_privacy_audit_score",
    """WITH gs AS (
      |  SELECT c_nationkey, count(*) AS group_size
      |  FROM customer GROUP BY 1),
      |k AS (SELECT coalesce(sum(CASE WHEN group_size < 5 THEN 1 END), 0) = 0 AS k_pass FROM gs),
      |ld AS (
      |  SELECT c_nationkey, count(DISTINCT c_mktsegment) AS l_count
      |  FROM customer GROUP BY 1),
      |l AS (SELECT coalesce(sum(CASE WHEN l_count < 3 THEN 1 END), 0) = 0 AS l_pass FROM ld),
      |total AS (SELECT count(*) AS n_total FROM customer),
      |overall AS (
      |  SELECT c_mktsegment,
      |    CAST(count(*) AS DOUBLE) / (SELECT n_total FROM total) AS p_overall
      |  FROM customer GROUP BY 1),
      |groups AS (SELECT c_nationkey, count(*) AS g_tot FROM customer GROUP BY 1),
      |cells AS (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS c_cnt
      |  FROM customer GROUP BY 1, 2),
      |tvds AS (
      |  SELECT g.c_nationkey,
      |    round(sum(abs(CAST(coalesce(c.c_cnt, 0) AS DOUBLE) / g.g_tot - o.p_overall)) / 2, 4) AS tvd
      |  FROM groups g
      |  CROSS JOIN overall o
      |  LEFT JOIN cells c
      |    ON c.c_nationkey = g.c_nationkey AND c.c_mktsegment = o.c_mktsegment
      |  GROUP BY g.c_nationkey),
      |t AS (SELECT coalesce(sum(CASE WHEN tvd > 0.2 THEN 1 END), 0) = 0 AS t_pass FROM tvds)
      |SELECT k_pass, l_pass, t_pass,
      |  round((CAST(k_pass AS INT) + CAST(l_pass AS INT) + CAST(t_pass AS INT)) * 100.0 / 3.0, 2)
      |    AS privacy_score
      |FROM k, l, t""".stripMargin,
  ) { (s, dir) =>
    PrivacyEngine.auditScore(Tables.customer(s, dir), QI1, "c_mktsegment", k = 5, l = 3, t = 0.2)
  }

  // --- q233: user-level DP counts with bounded contribution ----------------
  // q34 noises one RECORD per key — record-level DP. The guarantee a
  // release actually needs is USER-level: one person must not move
  // the histogram by more than the noise hides, however many events
  // they generated. The standard mechanism (Wilson et al., "Differen-
  // tially Private SQL with Bounded User Contribution", VLDB 2020):
  // cap each user at k = 5 events per event_type (row_number over the
  // (user, type) partition, ordered by (ts, event_id) so the kept set
  // is deterministic), count the capped rows, add Laplace(k/ε) noise
  // — sensitivity is now exactly k because a user owns ≤ k rows per
  // group. Noise is the registry's pure-(key, salt) LCG Laplace
  // (keyed on the type's rank among the distinct types, a value both
  // engines derive identically), so the release is reproducible and
  // oracle-checkable while remaining a faithful DP trace. True counts
  // never leave the plan — only the noised value and the mechanism's
  // public parameters (k, ε) are emitted. The per-user window
  // partitions by (user_id, event_type): at 100 TB that shuffle is
  // the per-user history, never a global sort.
  def userLevelDp: Q = Q(
    "q233_userlevel_dp",
    """WITH capped AS (SELECT event_type FROM (
      |    SELECT event_type, row_number() OVER (
      |      PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      |    FROM events) WHERE rn <= 5),
      |c AS (SELECT event_type, count(*) AS n FROM capped GROUP BY event_type),
      |k AS (SELECT event_type, row_number() OVER (ORDER BY event_type) AS kk
      |      FROM (SELECT DISTINCT event_type FROM events)),
      |u AS (SELECT c.event_type, c.n,
      |    (CAST((kk * 2654435761 + 42) % 1000003 AS DOUBLE) + 0.5)
      |      / 1000003.0 - 0.5 AS uu
      |  FROM c JOIN k ON k.event_type = c.event_type)
      |SELECT event_type,
      |  round(greatest(0.0, n + (-(5.0 / 1.0) * sign(uu) * ln(1 - 2 * abs(uu)))), 2)
      |    AS noised_count,
      |  5 AS contribution_cap, 1.0 AS epsilon
      |FROM u ORDER BY event_type""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val rn = row_number().over(Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id"))
    val c = ev.select(col("event_type"), rn.as("rn")).filter(col("rn") <= 5)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val k = ev.select("event_type").distinct()
      .withColumn("kk", row_number().over(
        Window.orderBy("event_type")))
    c.join(broadcast(k), "event_type")
      .select(col("event_type"),
        round(graft.functions.Transforms.laplaceNoisedKeyed(
          col("n").cast("double"), col("kk"), epsilon = 1.0 / 5.0, salt = 42L), 2)
          .as("noised_count"),
        lit(5).as("contribution_cap"), lit(1.0).as("epsilon"))
      .orderBy("event_type")
  }

  // --- q236: DP median via the exponential mechanism -----------------------
  // Laplace noise (q34/q233) handles counts; a MEDIAN release needs
  // the exponential mechanism (McSherry-Talwar): candidates = 50
  // public price boundaries (12k..600k — public domain bounds, not
  // data-derived), utility u(c) = −|rank(c) − n/2| (sensitivity 1),
  // winner drawn ∝ exp(ε·u/2) via the Gumbel-max trick with the
  // registry's pure-(candidate, salt) LCG — the draw is reproducible,
  // so the whole release is oracle-checked while remaining a faithful
  // DP trace. Scale shape: ranks of ALL 50 candidates come from ONE
  // scan (bucketize each row once, 50-row cumulative window), never a
  // candidates×rows join; the argmax runs on the 50-row table. Only
  // the winning boundary and the mechanism's public parameters are
  // emitted.
  def dpMedian: Q = Q(
    "q236_dp_median",
    """WITH cand AS (SELECT CAST(i AS INT) AS i FROM UNNEST(range(0, 50)) AS u(i)),
      |b AS (SELECT least(greatest(CAST(ceil(o_totalprice / 12000.0) AS INT) - 1,
      |        0), 49) AS bkt FROM orders),
      |bc AS (SELECT bkt, count(*) AS c FROM b GROUP BY bkt),
      |nn AS (SELECT count(*) AS n FROM orders),
      |cum AS (SELECT cand.i,
      |    CAST(sum(coalesce(bc.c, 0)) OVER (ORDER BY cand.i) AS BIGINT) AS below
      |  FROM cand LEFT JOIN bc ON bc.bkt = cand.i),
      |g AS (SELECT i, below,
      |    -abs(below - n / 2.0) / 2.0
      |      + -ln(-ln((CAST((i * 2654435761 + 7) % 1000003 AS DOUBLE) + 0.5)
      |                 / 1000003.0)) AS gk
      |  FROM cum CROSS JOIN nn)
      |SELECT CAST(12000 * (i + 1) AS DOUBLE) AS dp_median,
      |  1.0 AS epsilon, 1 AS sensitivity, 50 AS n_candidates
      |FROM g ORDER BY gk DESC, i LIMIT 1""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.orders(s, dir)
    val b = orders.select(
      least(greatest(ceil(col("o_totalprice") / 12000.0).cast("int") - 1, lit(0)), lit(49))
        .as("bkt"))
    val bc = b.groupBy("bkt").agg(count(lit(1)).as("c"))
    val nn = orders.agg(count(lit(1)).as("n"))
    val cand = s.range(0, 50).select(col("id").cast("int").as("i"))
    // 50-row table: the unpartitioned cumulative window is bounded
    val cum = cand.join(broadcast(bc), cand("i") === bc("bkt"), "left_outer")
      .select(col("i"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("below", sum(col("c")).over(Window.orderBy("i")).cast("long"))
    val gk = graft.functions.Transforms.gumbelKey(
      -abs(col("below") - col("n") / 2.0) / 2.0, col("i"), salt = 7L)
    cum.crossJoin(broadcast(nn))
      .select(col("i"), gk.as("gk"))
      .orderBy(col("gk").desc, col("i")).limit(1)
      .select((lit(12000.0) * (col("i") + 1)).as("dp_median"),
        lit(1.0).as("epsilon"), lit(1).as("sensitivity"), lit(50).as("n_candidates"))
  }

  // --- q257: local-DP frequency estimation via randomized response -----------
  // q34/q233/q236 add noise at the AGGREGATE (central DP); randomized
  // response (Warner 1965 — the k-ary generalized form behind RAPPOR)
  // is the LOCAL model: each record perturbs its own category before
  // it ever reaches the collector, and the collector debiases. Each
  // event keeps its true type with p = 0.75, else reports a uniform
  // category; the unbiased estimate inverts the mixing:
  // π̂ = (f_reported − (1−p)/k)/p. The per-record "randomness" is the
  // laplaceNoisedKeyed LCG (a pure (event_id, salt) function, two
  // salts for the two decisions), so both engines replay the exact
  // perturbed table and the oracle checks mechanism AND estimator.
  // One scan perturbs; everything else reduces on the k-row category
  // table. π̂ can round to −0.0 for a rare category (debias
  // subtraction) — znorm per the signed-zero rule.
  def randomizedResponse: Q = Q(
    "q257_randomized_response",
    """WITH dom AS (SELECT t, CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS r
      |  FROM (SELECT DISTINCT event_type AS t FROM events)),
      |k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM dom),
      |ev AS (SELECT d.r AS tr,
      |    ((((event_id % 1000003) * 2654435761 + 7) % 1000003) + 0.5)
      |      / 1000003.0 AS u1,
      |    ((((event_id % 1000003) * 2654435761 + 13) % 1000003) + 0.5)
      |      / 1000003.0 AS u2
      |  FROM events e JOIN dom d ON d.t = e.event_type),
      |rep AS (SELECT tr,
      |    CASE WHEN u1 < 0.75 THEN tr
      |         ELSE 1 + CAST(floor(u2 * k) AS BIGINT) END AS rr
      |  FROM ev CROSS JOIN k),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rep),
      |tc AS (SELECT tr AS r, count(*) AS n_true FROM rep GROUP BY tr),
      |rc AS (SELECT rr AS r, count(*) AS n_rep FROM rep GROUP BY rr),
      |est AS (SELECT dom.t AS event_type,
      |    CAST(coalesce(tc.n_true, 0) AS BIGINT) AS n_true,
      |    CAST(coalesce(rc.n_rep, 0) AS BIGINT) AS n_reported,
      |    (CAST(coalesce(rc.n_rep, 0) AS DOUBLE) / n - 0.25 / k) / 0.75 AS pi,
      |    CAST(coalesce(tc.n_true, 0) AS DOUBLE) / n AS tp
      |  FROM dom LEFT JOIN tc ON tc.r = dom.r LEFT JOIN rc ON rc.r = dom.r
      |  CROSS JOIN k CROSS JOIN n)
      |SELECT event_type, n_true, n_reported,
      |  round(pi, 4) + 0.0 AS pi_hat,
      |  round(abs(pi - tp), 4) AS abs_err
      |FROM est ORDER BY event_type""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    def u(salt: Long) =
      (pmod(pmod(col("event_id"), lit(1000003L)) * lit(2654435761L) + lit(salt),
        lit(1000003L)).cast("double") + 0.5) / 1000003.0
    val dom = Tables.events(s, dir).select(col("event_type").as("t")).distinct()
      .withColumn("r", row_number().over(Window.orderBy("t")).cast("long"))
    val k = dom.agg(count(lit(1)).cast("long").as("k"))
    val rep = graft.dedup.Dedup.persistTracked(
      Tables.events(s, dir).select(col("event_id"), col("event_type"))
        .join(broadcast(dom), col("event_type") === col("t"))
        .crossJoin(broadcast(k))
        .select(col("r").as("tr"),
          when(u(7L) < 0.75, col("r"))
            .otherwise(lit(1L) + floor(u(13L) * col("k")).cast("long")).as("rr")))
    val n = rep.agg(count(lit(1)).cast("long").as("n"))
    val tc = rep.groupBy(col("tr").as("r")).agg(count(lit(1)).as("n_true"))
    val rc = rep.groupBy(col("rr").as("r")).agg(count(lit(1)).as("n_rep"))
    val pi = (coalesce(col("n_rep"), lit(0L)).cast("double") / col("n")
      - lit(0.25) / col("k")) / 0.75
    val tp = coalesce(col("n_true"), lit(0L)).cast("double") / col("n")
    dom.join(tc, Seq("r"), "left").join(rc, Seq("r"), "left")
      .crossJoin(broadcast(k)).crossJoin(broadcast(n))
      .select(col("t").as("event_type"),
        coalesce(col("n_true"), lit(0L)).cast("long").as("n_true"),
        coalesce(col("n_rep"), lit(0L)).cast("long").as("n_reported"),
        znorm(round(pi, 4)).as("pi_hat"),
        round(abs(pi - tp), 4).as("abs_err"))
      .orderBy("event_type")
  }
}
