package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Event-stream analytics in batch form (SURVEY.md §2.I maps streaming
  * to scheduled batch; the Structured Streaming variants of these live
  * in graft.streaming and are spec-tested with MemoryStream).
  */
object Events {

  val all: Seq[Q] = Seq(hourlyWindows, sessionize, jsonExtract, mlFeatures, streamingHourly,
    streamingSessionize, streamingIntervalJoin, rangeJoinClicks, funnel, retention,
    trailingWindow, gapFill, transitions, rateSpike, sessionPaths, trendSlope,
    kaplanMeier, lastTouchAttribution, cohortLtv, streamingLeftOuterJoin,
    seasonalSpike, stickiness, peakConcurrency, funnelLatency, linearAttribution,
    bounceRate, decayedPopularity, diffInDiff, holtForecast, cusumDrift,
    seasonalDecompose, skylineDays, gapRegularity, markovPerplexity,
    sprtMonitor, spectralGap, lateArrivalAudit, dailyTrending, changepoint,
    windowFunnel)

  // --- q347: window funnel (ordered steps within a step window) ---------------
  // q99 counts users who EVER reached each step; the production funnel
  // (ClickHouse's windowFunnel) requires ORDER and RECENCY: view →
  // click → purchase, each step within 24 h of the previous one. The
  // earliest-chain variant keeps it deterministic and relational:
  // t1 = the user's first view; t2 = first click in (t1, t1+24h];
  // t3 = first purchase in (t2, t2+24h] — each step is ONE keyed
  // semi-join + min aggregate against the per-user anchor (bounded
  // fan-out: a user's events of one type), so the chain is 3 keyed
  // aggregates at any scale, never a per-user sort. All comparisons in
  // integer µs (the q176/q324 discipline). Output: users reaching
  // exactly level 0..3 plus conversion share vs level-1 entrants.
  def windowFunnel: Q = {
    val w = 86400000000L // 24 h in µs
    Q(
      "q347_window_funnel",
      s"""WITH ev AS (SELECT user_id, event_type,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
         |u AS (SELECT DISTINCT user_id FROM ev),
         |t1 AS (SELECT user_id, min(t) AS t1 FROM ev
         |       WHERE event_type = 'view' GROUP BY 1),
         |t2 AS (SELECT e.user_id, min(e.t) AS t2 FROM ev e JOIN t1 USING (user_id)
         |       WHERE e.event_type = 'click' AND e.t > t1.t1 AND e.t <= t1.t1 + $w
         |       GROUP BY 1),
         |t3 AS (SELECT e.user_id, min(e.t) AS t3 FROM ev e JOIN t2 USING (user_id)
         |       WHERE e.event_type = 'purchase' AND e.t > t2.t2 AND e.t <= t2.t2 + $w
         |       GROUP BY 1),
         |lv AS (SELECT u.user_id,
         |    CASE WHEN t3.user_id IS NOT NULL THEN 3
         |         WHEN t2.user_id IS NOT NULL THEN 2
         |         WHEN t1.user_id IS NOT NULL THEN 1 ELSE 0 END AS level
         |  FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
         |  LEFT JOIN t3 USING (user_id))
         |SELECT level, CAST(count(*) AS BIGINT) AS n_users,
         |  round(CAST(count(*) AS DOUBLE)
         |    / nullif((SELECT count(*) FROM lv WHERE level >= 1), 0), 6)
         |    AS share_of_entrants
         |FROM lv GROUP BY level ORDER BY level""".stripMargin,
    ) { (s, dir) =>
      val ev = graft.dedup.Dedup.persistTracked(Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t")))
      val u = ev.select("user_id").distinct()
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("t").as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, "user_id")
        .filter(col("t") > col("t1") && col("t") <= col("t1") + w)
        .groupBy("user_id").agg(min("t").as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, "user_id")
        .filter(col("t") > col("t2") && col("t") <= col("t2") + w)
        .groupBy("user_id").agg(min("t").as("t3"))
      val lv = u.join(t1.select(col("user_id"), lit(1).as("l1")), Seq("user_id"), "left_outer")
        .join(t2.select(col("user_id"), lit(1).as("l2")), Seq("user_id"), "left_outer")
        .join(t3.select(col("user_id"), lit(1).as("l3")), Seq("user_id"), "left_outer")
        .select(when(col("l3").isNotNull, 3)
          .when(col("l2").isNotNull, 2)
          .when(col("l1").isNotNull, 1).otherwise(0).as("level"))
      val entrants = lv.filter(col("level") >= 1).agg(count(lit(1)).as("ne"))
      lv.groupBy("level").agg(count(lit(1)).as("n_users"))
        .crossJoin(broadcast(entrants))
        .select(col("level"), col("n_users"),
          // try_divide: a corpus with zero level>=1 entrants must yield
          // NULL (DuckDB's x/NULL), not Infinity (CLAUDE.md rule 8)
          round(try_divide(col("n_users").cast("double"), col("ne")), 6)
            .as("share_of_entrants"))
        .orderBy("level")
    }
  }

  // --- q185: daily bounce rate ----------------------------------------------
  // Share of q49 sessions that never saw a second event, by the day
  // the session started — the engagement-health headline. Reuses the
  // exact q49 session assignment (user-keyed windows, (ts, event_id)
  // tie-break), reduces sessions to (start day, n_events ≥ 2), and
  // the rate is integer counts divided once.
  def bounceRate: Q = Q(
    "q185_bounce_rate",
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
      |           OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT user_id, ts,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      |  FROM e),
      |iv AS (SELECT user_id, sid, CAST(min(ts) AS DATE) AS day,
      |         count(*) AS n_events FROM s GROUP BY 1, 2)
      |SELECT strftime(day, '%Y-%m-%d') AS day,
      |  CAST(count(*) AS BIGINT) AS n_sessions,
      |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounced,
      |  round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS bounce_rate
      |FROM iv GROUP BY day ORDER BY day""".stripMargin,
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val iv = Tables.events(s, dir)
      .withColumn("is_new",
        when(lag(col("ts"), 1).over(w).isNull
          || unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("is_new")).over(wRun))
      .groupBy("user_id", "sid")
      .agg(to_date(min("ts")).as("day"), count(lit(1)).as("n_events"))
    val bounced = when(col("n_events") === 1, 1).otherwise(0)
    iv.groupBy("day")
      .agg(count(lit(1)).as("n_sessions"), sum(bounced).as("n_bounced"),
        round(sum(bounced).cast("double") / count(lit(1)), 6).as("bounce_rate"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_sessions"), col("n_bounced"), col("bounce_rate"))
      .orderBy("day")
  }

  // --- q177: linear multi-touch attribution ---------------------------------
  // The multi-touch counterpart to q139: every click/view in the
  // 7-day pre-purchase window shares the purchase value equally
  // (value/n_touches), touchless purchases stay 'direct'. The
  // touch-match is a keyed user join bounded by the attribution
  // window; per-purchase touch counts are one keyed aggregate; the
  // fractional credits round to 9 dp BEFORE the DECIMAL channel sums,
  // so the split is associative-exact cross-engine even though 1/3 has
  // no finite decimal.
  def linearAttribution: Q = Q(
    "q177_linear_attribution",
    """WITH pu AS (SELECT event_id AS pid, user_id, ts AS pts,
      |    CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events WHERE event_type = 'purchase'),
      |tc AS (SELECT user_id, event_type AS channel, ts FROM events
      |       WHERE event_type IN ('click', 'view')),
      |m AS (SELECT pu.pid, pu.v, tc.channel
      |      FROM pu JOIN tc ON pu.user_id = tc.user_id
      |      WHERE tc.ts < pu.pts AND tc.ts >= pu.pts - INTERVAL 7 DAY),
      |nc AS (SELECT pid, count(*) AS n FROM m GROUP BY pid),
      |credit AS (
      |  SELECT m.channel, m.pid, round(CAST(m.v AS DOUBLE) / nc.n, 9) AS cr
      |  FROM m JOIN nc ON m.pid = nc.pid
      |  UNION ALL
      |  SELECT 'direct', pid, CAST(v AS DOUBLE) FROM pu
      |  WHERE pid NOT IN (SELECT pid FROM nc))
      |SELECT channel, CAST(count(DISTINCT pid) AS BIGINT) AS n_purchases,
      |  round(CAST(sum(CAST(cr AS DECIMAL(18,9))) AS DOUBLE), 4) AS credited_value
      |FROM credit GROUP BY channel ORDER BY channel""".stripMargin,
  ) { (s, dir) =>
    val e = Tables.events(s, dir)
    val pu = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("ts").as("pts"),
        col("value").cast("decimal(18,2)").as("v"))
    val tc = e.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_type").as("channel"), col("ts"))
    // matched touches feed the per-purchase count AND the credit rows
    val m = graft.dedup.Dedup.persistTracked(pu.join(tc, "user_id")
      .filter(col("ts") < col("pts") && col("ts") >= col("pts") - expr("INTERVAL 7 DAY"))
      .select(col("pid"), col("v"), col("channel")))
    val nc = m.groupBy("pid").agg(count(lit(1)).as("n"))
    val credit = m.join(nc, "pid")
      .select(col("channel"), col("pid"),
        round(col("v").cast("double") / col("n"), 9).as("cr"))
      .unionByName(pu.join(nc, Seq("pid"), "left_anti")
        .select(lit("direct").as("channel"), col("pid"),
          col("v").cast("double").as("cr")))
    credit.groupBy("channel")
      .agg(countDistinct("pid").as("n_purchases"),
        round(dsum(col("cr"), 9), 4).as("credited_value"))
      .orderBy("channel")
  }

  // --- q176: funnel stage-transition latency --------------------------------
  // q99 counts WHO converts; this measures HOW LONG conversion takes:
  // per q99-qualified user, first-view → first-subsequent-click and
  // click → purchase gaps, reduced to per-transition n/p50/p90
  // minutes. Gaps are exact integer microseconds (epoch diffs); only
  // the final interpolated percentiles are doubles (the q11 idiom,
  // rounded). Per-stage tables are keyed min-aggregates — the same
  // scale shape as q99.
  def funnelLatency: Q = Q(
    "q176_funnel_latency",
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |      JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |      JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1),
      |g1 AS (SELECT epoch_us(c.t2) - epoch_us(v.t1) AS gap_us
      |       FROM c JOIN v ON c.user_id = v.user_id),
      |g2 AS (SELECT epoch_us(p.t3) - epoch_us(c.t2) AS gap_us
      |       FROM p JOIN c ON p.user_id = c.user_id)
      |SELECT 'view_to_click' AS transition, CAST(count(*) AS BIGINT) AS n_users,
      |  round(quantile_cont(CAST(gap_us AS DOUBLE), 0.5) / 60000000, 4) AS p50_min,
      |  round(quantile_cont(CAST(gap_us AS DOUBLE), 0.9) / 60000000, 4) AS p90_min
      |FROM g1
      |UNION ALL
      |SELECT 'click_to_purchase', CAST(count(*) AS BIGINT),
      |  round(quantile_cont(CAST(gap_us AS DOUBLE), 0.5) / 60000000, 4),
      |  round(quantile_cont(CAST(gap_us AS DOUBLE), 0.9) / 60000000, 4)
      |FROM g2
      |ORDER BY transition""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.DataFrame
    val e = Tables.events(s, dir)
    def first(tpe: String, after: Option[DataFrame], tcol: String): DataFrame = {
      val base = e.filter(col("event_type") === tpe)
      val gated = after match {
        case Some(prev) => base.join(prev, Seq("user_id"))
          .filter(col("ts") > col(prev.columns.last))
        case None => base
      }
      gated.groupBy("user_id").agg(min("ts").as(tcol))
    }
    val v = first("view", None, "t1")
    val c = first("click", Some(v), "t2")
    val p = first("purchase", Some(c), "t3")
    def lat(name: String, cur: DataFrame, prev: DataFrame,
        tc: String, tp: String): DataFrame =
      cur.join(prev, "user_id")
        .select((unix_micros(col(tc)) - unix_micros(col(tp))).as("gap_us"))
        .agg(count(lit(1)).as("n_users"),
          round(expr("percentile(CAST(gap_us AS DOUBLE), 0.5)") / 60000000L, 4)
            .as("p50_min"),
          round(expr("percentile(CAST(gap_us AS DOUBLE), 0.9)") / 60000000L, 4)
            .as("p90_min"))
        .select(lit(name).as("transition"), col("n_users"), col("p50_min"),
          col("p90_min"))
    lat("view_to_click", c, v, "t2", "t1")
      .unionByName(lat("click_to_purchase", p, c, "t3", "t2"))
      .orderBy("transition")
  }

  // --- q172: peak concurrent sessions (interval sweep) ---------------------
  // Capacity planning's question — "how many sessions were open AT
  // ONCE, at the worst moment of each day" — is interval-overlap
  // counting, not an aggregate of any single row. The classic sweep:
  // q49's sessionization yields [start, end] intervals, each clipped
  // interval emits a +1/−1 boundary pair, and concurrency is the
  // running sum over boundaries ordered (ts, +1 before −1) — so
  // touching sessions at the same instant count as overlapping, and
  // equal-delta ties permute prefix sums without changing the max.
  // Scale shape: sessionize windows are keyed by user, the sweep
  // window is keyed by DAY (intervals are clipped at midnight, a
  // bounded ≤2-day explode), so no window ever sees more than one
  // day of boundaries.
  def peakConcurrency: Q = Q(
    "q172_peak_concurrency",
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
      |           OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT user_id, ts,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      |  FROM e),
      |iv AS (SELECT user_id, sid, min(ts) AS st, max(ts) AS en FROM s GROUP BY 1, 2),
      |dd AS (SELECT st, en, CAST(st AS DATE) + CAST(k AS INTEGER) AS day
      |       FROM iv, UNNEST(range(0,
      |         datediff('day', CAST(st AS DATE), CAST(en AS DATE)) + 1)) AS u(k)),
      |cl AS (SELECT day,
      |        greatest(st, CAST(day AS TIMESTAMP)) AS cs,
      |        least(en, CAST(day + 1 AS TIMESTAMP) - INTERVAL 1 MICROSECOND) AS ce
      |      FROM dd),
      |b AS (SELECT day, cs AS ts, 1 AS delta FROM cl
      |      UNION ALL SELECT day, ce, -1 FROM cl),
      |r AS (SELECT day, CAST(sum(delta) OVER (PARTITION BY day ORDER BY ts, delta DESC
      |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc FROM b)
      |SELECT strftime(r.day, '%Y-%m-%d') AS day,
      |  CAST((SELECT count(*) FROM cl WHERE cl.day = r.day) AS BIGINT) AS n_sessions,
      |  CAST(max(conc) AS BIGINT) AS peak
      |FROM r GROUP BY r.day ORDER BY day""".stripMargin,
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val iv = Tables.events(s, dir)
      .withColumn("is_new",
        when(lag(col("ts"), 1).over(w).isNull
          || unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("is_new")).over(wRun))
      .groupBy("user_id", "sid")
      .agg(min("ts").as("st"), max("ts").as("en"))
    // clipped (day, start, end) triples: two consumers (boundary rows
    // + the per-day session count) — persist the bounded explode
    val cl = graft.dedup.Dedup.persistTracked(iv
      .select(col("st"), col("en"),
        explode(sequence(lit(0),
          datediff(to_date(col("en")), to_date(col("st"))))).as("k"))
      .select(expr("date_add(to_date(st), k)").as("day"), col("st"), col("en"))
      .select(col("day"),
        greatest(col("st"), col("day").cast("timestamp")).as("cs"),
        least(col("en"), expr("date_add(day, 1)").cast("timestamp")
          - expr("interval 1 microsecond")).as("ce")))
    val b = cl.select(col("day"), col("cs").as("ts"), lit(1).as("delta"))
      .unionByName(cl.select(col("day"), col("ce").as("ts"), lit(-1).as("delta")))
    val sweep = Window.partitionBy("day").orderBy(col("ts"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peaks = b.withColumn("conc", sum("delta").over(sweep))
      .groupBy("day").agg(max("conc").cast("long").as("peak"))
    val counts = cl.groupBy("day").agg(count(lit(1)).as("n_sessions"))
    peaks.join(counts, "day")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_sessions"), col("peak"))
      .orderBy("day")
  }

  // --- q170: DAU / WAU stickiness ------------------------------------------
  // Rolling 7-day DISTINCT actives — the metric a sum of dailies gets
  // wrong (a user active 5× in a week counts once). The rolling
  // distinct is NOT a window function: each (user, day) activity row
  // fans out to the 7 window-end days it supports (a bounded ×7
  // explode), and WAU is then one exact count-distinct per day — so
  // the plan is explode + keyed aggregate, no per-day re-scan, no
  // corpus-sized window state. Days without a full 7-day lookback are
  // excluded (their WAU would undercount by construction).
  def stickiness: Q = Q(
    "q170_stickiness",
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
      |sp AS (SELECT user_id, day + CAST(x AS INTEGER) AS day
      |       FROM ud, UNNEST(range(0, 7)) AS u(x)),
      |wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM sp GROUP BY day),
      |lo AS (SELECT min(day) AS d0 FROM ud)
      |SELECT strftime(d.day, '%Y-%m-%d') AS day,
      |  CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
      |  round(CAST(dau AS DOUBLE) / wau, 6) AS stickiness
      |FROM dau d JOIN wau w ON d.day = w.day, lo
      |WHERE d.day >= d0 + 6
      |ORDER BY day""".stripMargin,
  ) { (s, dir) =>
    // two consumers (dau + the window-support explode): persist the
    // per-(user, day) activity table
    val ud = graft.dedup.Dedup.persistTracked(Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct())
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"), explode(sequence(lit(0), lit(6))).as("x"), col("day"))
      .select(col("user_id"), expr("date_add(day, x)").as("day"))
      .groupBy("day").agg(countDistinct("user_id").as("wau"))
    val lo = ud.agg(min("day").as("d0"))
    dau.join(wau, "day").crossJoin(broadcast(lo)) // 1-row scalar
      .filter(col("day") >= date_add(col("d0"), 6))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
      .orderBy("day")
  }

  // --- q168: seasonal-adjusted spike detection ------------------------------
  // q113 flags hours above a trailing baseline; this flags DAYS whose
  // count beats 2× the leave-one-out mean of the SAME weekday — so a
  // busy-Monday pattern doesn't alarm every Monday. Leave-one-out
  // makes the spike unable to dilute its own baseline, and the
  // predicate is pure INTEGER cross-multiplication
  // (5·x·(cnt−1) > 6·(sum−x), i.e. ratio > 1.2) — no division near the decision,
  // divisions are presentation-only. Windows run over per-(type, dow)
  // daily aggregates — calendar-sized, aggregate-first.
  def seasonalSpike: Q = Q(
    "q168_seasonal_spike",
    """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |d2 AS (SELECT event_type, day, n, isodow(day) - 1 AS dow FROM daily),
      |base AS (SELECT event_type, dow, CAST(sum(n) AS BIGINT) AS s,
      |           count(*) AS c FROM d2 GROUP BY 1, 2)
      |SELECT d2.event_type, strftime(d2.day, '%Y-%m-%d') AS day,
      |  CAST(n AS BIGINT) AS n,
      |  round(CAST(s - n AS DOUBLE) / (c - 1), 4) AS loo_baseline,
      |  round(CAST(n * (c - 1) AS DOUBLE) / (s - n), 4) AS ratio
      |FROM d2 JOIN base ON d2.event_type = base.event_type AND d2.dow = base.dow
      |WHERE c > 1 AND 5 * n * (c - 1) > 6 * (s - n)
      |ORDER BY d2.event_type, day""".stripMargin,
  ) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", weekday(col("day")))
    val base = daily.groupBy("event_type", "dow")
      .agg(sum("n").as("s"), count(lit(1)).as("c"))
    daily.join(base, Seq("event_type", "dow"))
      .filter(col("c") > 1 && lit(5) * col("n") * (col("c") - 1) > lit(6) * (col("s") - col("n")))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n"),
        round((col("s") - col("n")).cast("double") / (col("c") - 1), 4).as("loo_baseline"),
        round((col("n") * (col("c") - 1)).cast("double") / (col("s") - col("n")), 4)
          .as("ratio"))
      .orderBy("event_type", "day")
  }

  // --- q151: stream-stream LEFT OUTER join (abandonment) --------------------
  // The outer variant of q122 — the shape that answers "which views
  // NEVER converted?" live. Left outer stream-stream joins are the
  // hard case: the null-extended row can only be emitted once the
  // watermark proves no matching purchase can still arrive, so the
  // interval bound + both watermarks aren't just state hygiene — they
  // are what makes the answer DEFINED. Drained result hash-matches
  // the plain batch left join (the q62/q77/q122 twin rule). Unmatched
  // views carry purchase_id −1 / value −1 (COALESCE both engines —
  // null hashing differs across engines, sentinels don't).
  def streamingLeftOuterJoin: Q = Q(
    "q151_stream_left_outer_join",
    """SELECT a.user_id, a.event_id AS view_id,
      |  coalesce(b.event_id, -1) AS purchase_id,
      |  epoch_us(CAST(a.ts AS TIMESTAMP)) AS view_us,
      |  round(coalesce(CAST(b.value AS DOUBLE), -1), 2) AS purchase_value
      |FROM events a LEFT JOIN events b
      |  ON a.user_id = b.user_id
      | AND b.event_type = 'purchase'
      | AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
      | AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
      |WHERE a.event_type = 'view' AND CAST(a.ts AS TIMESTAMP) < TIMESTAMP '2024-01-28'
      |ORDER BY view_id, purchase_id""".stripMargin,
  ) { (s, dir) =>
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet") // schema probe only
    def side(tpe: String, p: String) =
      graft.Tables.normalizeEventsTs(
        s.readStream.schema(raw.schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir))
        .filter(col("event_type") === tpe)
        .select(col("user_id").as(s"${p}_user"), col("event_id").as(s"${p}_id"),
          col("ts").as(s"${p}_ts"), col("value").as(s"${p}_value"))
        .withWatermark(s"${p}_ts", "2 hours")
    // Views after maxTs − watermark − bound can never be PROVEN
    // unmatched before the one-shot stream ends (the watermark stops
    // at maxTs − 2 h), so both engines restrict the view side to a
    // deterministic cutoff the watermark demonstrably clears.
    val joined = side("view", "v")
      .filter(col("v_ts") < lit("2024-01-28").cast("timestamp"))
      .join(side("purchase", "p"),
        expr("v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + interval 30 minutes"),
        "left_outer")
    val sink = s"graft_slo_${System.nanoTime()}"
    // same state-store sizing note as q122: 8 partitions for the drain
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    val out = s.table(sink)
      .select(col("v_user").as("user_id"), col("v_id").as("view_id"),
        coalesce(col("p_id"), lit(-1L)).as("purchase_id"),
        unix_micros(col("v_ts")).as("view_us"),
        round(coalesce(col("p_value").cast("double"), lit(-1.0)), 2).as("purchase_value"))
      .orderBy("view_id", "purchase_id")
      .localCheckpoint(true)
    s.catalog.dropTempView(sink)
    out
  }

  // --- q144: cohort LTV triangle -------------------------------------------
  // The BI companion to retention (q104): customers grouped by
  // first-order month, cumulative revenue per customer tracked by
  // cohort age in months — the LTV curve marketing payback math reads
  // off. Shape: first-order month is one keyed aggregate; the cohort
  // join is keyed on customer (a customer-sized dim is NOT
  // broadcastable at warehouse scale — unhinted, AQE decides);
  // revenue is DECIMAL-exact, the cumulative sum is a per-cohort
  // window over ≤ |ages| rows per cohort (never a global sort);
  // cohort labels emit as ISO strings (the cross-engine date rule).
  def cohortLtv: Q = Q(
    "q144_cohort_ltv",
    """WITH o AS (SELECT o_custkey, date_trunc('month', o_orderdate) AS m, o_totalprice
      |           FROM orders),
      |f AS (SELECT o_custkey, min(m) AS cm FROM o GROUP BY 1),
      |cs AS (SELECT cm, count(*) AS n_cust FROM f GROUP BY 1),
      |base AS (SELECT f.cm, datediff('month', f.cm, o.m) AS age, o.o_totalprice
      |         FROM o JOIN f USING (o_custkey)),
      |agg AS (SELECT cm, CAST(age AS BIGINT) AS age, CAST(count(*) AS BIGINT) AS n_orders,
      |        sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev FROM base GROUP BY 1, 2),
      |cum AS (SELECT cm, age, n_orders,
      |        CAST(sum(rev) OVER (PARTITION BY cm ORDER BY age) * 100 AS BIGINT) AS cents
      |        FROM agg)
      |SELECT strftime(cum.cm, '%Y-%m') AS cohort, age, n_orders,
      |  CAST((cents * 10000) // cs.n_cust AS DOUBLE) / 1000000.0 AS ltv
      |FROM cum JOIN cs ON cum.cm = cs.cm
      |ORDER BY cohort, age""".stripMargin,
  ) { (s, dir) =>
    val o = Tables.orders(s, dir)
      .select(col("o_custkey"), date_trunc("month", col("o_orderdate")).as("m"),
        col("o_totalprice"))
    val f = o.groupBy("o_custkey").agg(min("m").as("cm"))
    val cs = f.groupBy("cm").agg(count(lit(1)).as("n_cust"))
    val base = o.join(f, "o_custkey")
      .select(col("cm"), months_between(col("m"), col("cm")).cast("long").as("age"),
        col("o_totalprice"))
    val agg = base.groupBy("cm", "age")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val w = Window.partitionBy("cm").orderBy("age")
    // the ratio is computed in exact integer micro-units (cents·10⁴
    // div n_cust — identical both engines; a double division rounded
    // at 4 dp sat exactly on half boundaries and flipped per engine);
    // cents·10⁴ ≤ ~2e15 at 100 TB, well inside BIGINT
    agg.withColumn("cents", (sum(col("rev")).over(w) * 100).cast("long"))
      .join(cs, "cm")
      .select(date_format(col("cm"), "yyyy-MM").as("cohort"), col("age"),
        col("n_orders"),
        (expr("cents * 10000 div n_cust").cast("double") / lit(1000000.0)).as("ltv"))
      .orderBy("cohort", "age")
  }

  // --- q139: last-touch attribution ----------------------------------------
  // The marketing-analytics workhorse the funnel (q99) and transition
  // matrix (q109) don't answer: which touch gets CREDIT for each
  // purchase? Last-touch: the user's most recent click/view strictly
  // before the purchase, provided it's within the 7-day lookback —
  // otherwise the purchase is 'direct'. One keyed window per user
  // (ORDER BY ts, event_id — total order, so credit is deterministic
  // under timestamp ties), carrying touch type and touch time as two
  // IGNORE-NULLS last_value calls over the strictly-preceding frame;
  // then a 3-group aggregate of DECIMAL-exact credited revenue. No
  // self-join, no explode — the window shuffles each user's events
  // once, which is the minimum for any per-user attribution.
  def lastTouchAttribution: Q = Q(
    "q139_last_touch_attribution",
    """WITH t AS (SELECT user_id, event_type, ts, event_id, value,
      |    last_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END
      |      IGNORE NULLS) OVER w AS touch_type,
      |    last_value(CASE WHEN event_type IN ('click', 'view') THEN ts END
      |      IGNORE NULLS) OVER w AS touch_ts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |p AS (SELECT CASE WHEN touch_ts IS NOT NULL
      |        AND touch_ts >= ts - INTERVAL 7 DAY THEN touch_type
      |        ELSE 'direct' END AS channel, value
      |      FROM t WHERE event_type = 'purchase')
      |SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS credited_value
      |FROM p GROUP BY channel ORDER BY channel""".stripMargin,
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin("click", "view")
    val t = Tables.events(s, dir)
      .withColumn("touch_type", last(when(isTouch, col("event_type")), true).over(w))
      .withColumn("touch_ts", last(when(isTouch, col("ts")), true).over(w))
    t.filter(col("event_type") === "purchase")
      .select(when(col("touch_ts").isNotNull
          && col("touch_ts") >= col("ts") - expr("INTERVAL 7 DAY"), col("touch_type"))
        .otherwise(lit("direct")).as("channel"), col("value"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        round(dsum(col("value")), 2).as("credited_value"))
      .orderBy("channel")
  }

  // --- q130: Kaplan-Meier survival over session durations ------------------
  // "How long do sessions last?" answered correctly under censoring: a
  // session whose last event is within 30 min of the corpus edge may
  // still be open, so it enters the at-risk counts but never the death
  // counts — the naive histogram systematically understates long
  // sessions. Aggregate-first: q49's sessionization collapses events
  // to sessions, sessions collapse to per-duration-minute (ended, all)
  // counts, and only THAT bounded table (≤ max session minutes rows)
  // sees unpartitioned windows — at-risk via reverse cumulative count,
  // the survival product as exp of a cumulative DECIMAL sum of 9dp-
  // rounded ln(1 − d/n) terms (the q118 never-sum-raw-doubles idiom;
  // a d = n final step zeroes survival via the flag, never ln(0)).
  def kaplanMeier: Q = Q(
    "q130_kaplan_meier",
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
      |           OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id,
      |    ts FROM e),
      |sess AS (SELECT user_id, session_id, min(ts) AS st, max(ts) AS en
      |         FROM s GROUP BY user_id, session_id),
      |g AS (SELECT max(en) AS gmax FROM sess),
      |d AS (SELECT CAST(floor((epoch_us(en) - epoch_us(st)) / 60000000) AS BIGINT) AS t_min,
      |        CASE WHEN en <= gmax - INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ended
      |      FROM sess, g),
      |byt AS (SELECT t_min, CAST(count(*) AS BIGINT) AS n_all,
      |          CAST(sum(ended) AS BIGINT) AS d FROM d GROUP BY t_min),
      |k AS (SELECT t_min, d,
      |    CAST(sum(n_all) OVER () AS BIGINT)
      |      - CAST(coalesce(sum(n_all) OVER (ORDER BY t_min
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
      |  FROM byt),
      |f AS (SELECT t_min, d, n_risk,
      |    CASE WHEN d < n_risk THEN round(ln(1 - d / n_risk), 9) END AS term,
      |    CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS dead
      |  FROM k)
      |SELECT t_min, n_risk, d AS d_ended,
      |  CASE WHEN max(dead) OVER (ORDER BY t_min ROWS UNBOUNDED PRECEDING) = 1 THEN 0.0
      |       ELSE round(exp(coalesce(CAST(sum(CAST(term AS DECIMAL(18,9)))
      |              OVER (ORDER BY t_min ROWS UNBOUNDED PRECEDING) AS DOUBLE), 0)), 6)
      |  END AS surv
      |FROM f ORDER BY t_min""".stripMargin,
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = Tables.events(s, dir)
      .withColumn("is_new",
        when(lag(col("ts"), 1).over(w).isNull
          || unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(wRun))
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
    val gmax = sess.agg(max(col("en")).as("gmax"))
    val durs = sess.crossJoin(broadcast(gmax))
      .select(
        floor((unix_micros(col("en")) - unix_micros(col("st"))) / lit(60000000L))
          .as("t_min"),
        when(col("en") <= col("gmax") - expr("INTERVAL 30 MINUTES"), 1)
          .otherwise(0).as("ended"))
    graft.ml.Stats.kaplanMeier(durs, "t_min", "ended")
      .select(col("t").as("t_min"), col("n_risk"), col("d_ended"), col("surv"))
      .orderBy("t_min")
  }

  // --- q115: top session paths (sequence mining) -----------------------------
  // The most common first-5-event-type paths across q49's 30-min-gap
  // sessions — the "how do users actually move" query. The path
  // string is built per session from a sorted in-group array that is
  // BOUNDED BEFORE COLLECTION: a row_number ≤ 5 filter on the session
  // window drops everything past the fifth event, so a pathological
  // million-event bot session contributes 5 rows to the collect, not
  // a million. Then counted and top-20'd (TakeOrderedAndProject).
  def sessionPaths: Q = Q(
    "q115_session_paths",
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
      |           OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, event_id, event_type, ts,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM e),
      |paths AS (
      |  SELECT array_to_string((list(event_type ORDER BY ts, event_id))[1:5], '>') AS path
      |  FROM s GROUP BY user_id, session_id)
      |SELECT path, count(*) AS n_sessions
      |FROM paths GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = Tables.events(s, dir)
      .withColumn("is_new",
        when(lag(col("ts"), 1).over(w).isNull
          || unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(wRun))
    val wSess = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    sessions.withColumn("rn", row_number().over(wSess))
      .filter(col("rn") <= 5) // bound the per-group array BEFORE collecting
      .groupBy("user_id", "session_id")
      .agg(concat_ws(">",
        transform(
          sort_array(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
          e => e.getField("event_type"))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
  }

  // --- q117: per-group linear trend via integer moments ----------------------
  // Least-squares slope of daily event volume per type, from the four
  // moment sums (Σx, Σy, Σxy, Σx²) — ALL integer arithmetic (x = day
  // index, y = daily count), so the aggregation is associative-exact
  // at any partitioning and the only doubles are the final two
  // divisions. The moments shape is THE scalable regression: one
  // keyed aggregate, no per-group iteration, no solver.
  def trendSlope: Q = Q(
    "q117_trend_slope",
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
      |  FROM events GROUP BY 1, 2),
      |lo AS (SELECT min(day) AS d0 FROM daily),
      |m AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(day - d0) AS BIGINT) AS sx,
      |    CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum((day - d0) * y) AS BIGINT) AS sxy,
      |    CAST(sum((day - d0) * (day - d0)) AS BIGINT) AS sxx
      |  FROM daily CROSS JOIN lo GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n_days,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx), 6) + 0.0 AS slope,
      |  round((sy - CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) * sx) / n, 6) + 0.0 AS intercept
      |FROM m ORDER BY event_type""".stripMargin,
  ) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val lo = daily.agg(min("day").as("d0"))
    val pairs = daily.crossJoin(broadcast(lo))
      .withColumn("x", datediff(col("day"), col("d0")).cast("long"))
    graft.ml.Stats.trendSlope(pairs, "event_type", "x", "y")
      .withColumnRenamed("n", "n_days")
      .orderBy("event_type")
  }

  // --- q113: trailing-baseline rate-spike detection --------------------------
  // Hours where an event type runs >2× its trailing-24-bucket average —
  // the ops-monitoring shape. Aggregate-first again: the ROWS frame
  // slides over hourly buckets (per-type partitions of ~corpus-hours
  // rows), never raw events, and the baseline excludes the current
  // bucket so a spike can't dilute its own threshold. avg of exact
  // counts is one integer-sum division — engine-reproducible.
  def rateSpike: Q = Q(
    "q113_rate_spike",
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, hour, n,
      |    avg(n) OVER (PARTITION BY event_type ORDER BY hour
      |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trailing_avg
      |  FROM hourly)
      |SELECT event_type, strftime(hour, '%Y-%m-%d %H:00') AS hour,
      |  CAST(n AS BIGINT) AS n, round(trailing_avg, 6) AS trailing_avg,
      |  round(n / trailing_avg, 6) AS spike_ratio
      |FROM t WHERE trailing_avg IS NOT NULL AND n > 2.0 * trailing_avg
      |ORDER BY event_type, hour""".stripMargin,
  ) { (s, dir) =>
    val hourly = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("hour").rowsBetween(-24, -1)
    hourly.withColumn("trailing_avg", avg(col("n")).over(w))
      .filter(col("trailing_avg").isNotNull && col("n") > lit(2.0) * col("trailing_avg"))
      .select(col("event_type"), date_format(col("hour"), "yyyy-MM-dd HH:00").as("hour"),
        col("n"), round(col("trailing_avg"), 6).as("trailing_avg"),
        round(col("n") / col("trailing_avg"), 6).as("spike_ratio"))
      .orderBy("event_type", "hour")
  }

  // --- q106: date-spine gap fill + LOCF interpolation -----------------------
  // Sparse daily series (big-ticket orders) densified onto a complete
  // date spine: missing days get 0 counts and a last-observation-
  // carried-forward revenue. The scale shape is aggregate-FIRST: the
  // global-ordered LOCF window runs over the spine (one row per day,
  // thousands at any corpus size), never over raw orders — the only
  // single-partition stage is O(days). Spine bounds arrive as a
  // broadcast scalar row (the q17/q21 CROSS pattern).
  def gapFill: Q = Q(
    "q106_gap_fill",
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |    count(*) AS n_orders
      |  FROM orders WHERE o_totalprice > 450000 GROUP BY 1),
      |bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
      |spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      |          FROM bounds)
      |SELECT strftime(day, '%Y-%m-%d') AS day,
      |  CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
      |  coalesce(revenue, 0.0) AS revenue,
      |  last_value(revenue IGNORE NULLS) OVER (ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revenue_locf
      |FROM spine LEFT JOIN daily USING (day)
      |ORDER BY day""".stripMargin,
  ) { (s, dir) =>
    val daily = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 450000)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
    graft.operators.TimeSeries.gapFillDaily(daily, "day",
      zeroFill = Seq("n_orders"), locf = Seq("revenue"))
  }

  // --- q109: Markov transition matrix over event types ----------------------
  // Per-user next-event pairs (LEAD inside the user partition — the
  // q14 window, never a self-join) aggregated to a from→to count
  // matrix with row-normalized transition probabilities. Counts are
  // exact; p is one integer division per row, identical in both
  // engines. The per-from normalizer is a window over the matrix
  // (≤ |event_type|² rows), not the event stream.
  def transitions: Q = Q(
    "q109_transition_matrix",
    """WITH pairs AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |c AS (SELECT from_type, to_type, count(*) AS n
      |      FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
      |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 6) AS p
      |FROM c ORDER BY from_type, to_type""".stripMargin,
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, dir)
      .select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
    val c = pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val norm = Window.partitionBy("from_type")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    c.select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / sum(col("n")).over(norm), 6).as("p"))
      .orderBy("from_type", "to_type")
  }

  // --- q105: RANGE-interval window frame ------------------------------------
  // Trailing-hour event count per row via a RANGE frame over
  // unix_micros — the window-frame twin of q97's join shape. The frame
  // form is the right tool when EVERY row needs its trailing
  // aggregate; it costs one sort per user partition. The join form
  // (q97) wins when only a filtered slice (errors) needs lookback —
  // it never sorts the full stream. Both are here so the trade is a
  // choice, not a gap.
  def trailingWindow: Q = Q(
    "q105_trailing_window",
    """SELECT event_id, user_id,
      |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
      |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_trailing_1h
      |FROM events
      |ORDER BY event_id""".stripMargin,
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, Window.currentRow)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_trailing_1h"))
      .orderBy("event_id")
  }

  // --- q104: retention cohort matrix ---------------------------------------
  // The classic product-analytics triangle: users cohorted by
  // first-seen week, counted distinct per (cohort, week-offset).
  // Two keyed aggregates over user_id (first-seen + distinct
  // activity) meet in one join; offsets are exact µs arithmetic on
  // UTC-truncated weeks, so both engines derive identical integers.
  def retention: Q = Q(
    "q104_retention",
    """WITH first_seen AS (
      |  SELECT user_id, date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS cohort_week
      |  FROM events GROUP BY 1),
      |activity AS (
      |  SELECT DISTINCT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS week
      |  FROM events)
      |SELECT cohort_week,
      |  CAST((epoch_us(week) - epoch_us(cohort_week)) / 604800000000 AS BIGINT) AS week_offset,
      |  count(*) AS n_users
      |FROM activity JOIN first_seen USING (user_id)
      |GROUP BY 1, 2
      |ORDER BY cohort_week, week_offset""".stripMargin,
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val firstSeen = ev.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val activity = ev.select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    activity.join(firstSeen, "user_id")
      .groupBy(col("cohort_week"),
        ((unix_micros(col("week")) - unix_micros(col("cohort_week"))) / 604800000000L)
          .cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  // --- q97: binned range join (events within a lookback window) -----------
  // "Clicks by the same user in the hour before each error" — the
  // interval-join shape Spark would otherwise plan as a per-key
  // nested loop. RangeJoin.lookback quantizes both sides to
  // window-width bins and equi-joins on (user_id, bin), so the plan is
  // a plain hash join whose fan-out tracks event density, never n².
  def rangeJoinClicks: Q = Q(
    "q97_range_join",
    """SELECT e.event_id, e.user_id, count(*) AS n_clicks
      |FROM events e JOIN events c
      |  ON c.user_id = e.user_id AND c.event_type = 'click'
      | AND c.ts < e.ts
      | AND epoch_us(CAST(c.ts AS TIMESTAMP)) >= epoch_us(CAST(e.ts AS TIMESTAMP)) - 3600000000
      |WHERE e.event_type = 'error'
      |GROUP BY 1, 2
      |ORDER BY e.event_id""".stripMargin,
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
    graft.operators.RangeJoin.lookback(
        ev.filter(col("event_type") === "error").select("event_id", "user_id", "ts"),
        ev.filter(col("event_type") === "click").select("user_id", "ts"),
        "user_id", "ts", windowSec = 3600L)
      .groupBy("event_id", "user_id")
      .agg(count(lit(1)).as("n_clicks"))
      .orderBy("event_id")
  }

  // --- q99: ordered conversion funnel --------------------------------------
  // view → click (after the view) → purchase (after the click), per
  // user; stage counts over the whole corpus. Each stage is a keyed
  // aggregate joined back on user_id — the per-stage min-timestamps
  // reuse one user_id partitioning, and stage k only scans the rows
  // that survived stage k-1's semi join.
  def funnel: Q = Q(
    "q99_funnel",
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |      JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |      JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1)
      |SELECT step, n_users FROM (
      |  SELECT '1_view' AS step, count(*) AS n_users FROM v
      |  UNION ALL SELECT '2_click', count(*) FROM c
      |  UNION ALL SELECT '3_purchase', count(*) FROM p)
      |ORDER BY step""".stripMargin,
  ) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    v.agg(count(lit(1)).as("n_users")).select(lit("1_view").as("step"), col("n_users"))
      .unionByName(c.agg(count(lit(1)).as("n_users"))
        .select(lit("2_click").as("step"), col("n_users")))
      .unionByName(p.agg(count(lit(1)).as("n_users"))
        .select(lit("3_purchase").as("step"), col("n_users")))
      .orderBy("step")
  }

  // --- tumbling-window aggregation (batch form of a streaming window) -----
  def hourlyWindows: Q = Q(
    "q48_event_hourly",
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
      |  count(*) AS cnt,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin,
  ) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        dsum(col("value")).as("value_sum"))
      .orderBy("hour", "event_type")
  }

  // --- sessionization: 30-min inactivity gap splits sessions --------------
  def sessionize: Q = Q(
    "q49_sessionize",
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
      |           OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, event_id, ts,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM e)
      |SELECT user_id, session_id,
      |  epoch_us(min(ts)) AS session_start_us,
      |  epoch_us(max(ts)) AS session_end_us,
      |  count(*) AS n_events
      |FROM s
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin,
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("is_new",
        when(lag(col("ts"), 1).over(w).isNull
          || unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("is_new")).over(wRun))
      .groupBy("user_id", "session_id")
      .agg(unix_micros(min(col("ts"))).as("session_start_us"),
        unix_micros(max(col("ts"))).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_id")
  }

  // --- the SAME hourly aggregation, executed as a Structured Stream -------
  // Reads the events parquet through readStream, aggregates with a
  // watermark, drains with processAllAvailable into a memory sink, and
  // must hash-match the identical batch oracle — streaming and batch
  // are one API with one answer.
  def streamingHourly: Q = Q(
    "q62_streaming_hourly",
    """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
      |  count(*) AS cnt,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin,
  ) { (s, dir) =>
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet") // schema probe only
    val stream = graft.Tables.normalizeEventsTs(
      s.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
      .withWatermark("ts", "2 hours")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        dsum(col("value")).as("value_sum"))
    val sink = s"graft_stream_${System.nanoTime()}"
    val q = stream.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    // detach the result from the memory sink (checkpoint cuts lineage)
    // so the temp view can be dropped instead of leaking per invocation
    val out = s.table(sink).orderBy("hour", "event_type").localCheckpoint(true)
    s.catalog.dropTempView(sink)
    out
  }

  // --- q122: stream-stream interval join (attribution) ---------------------
  // The last Structured Streaming join shape the engine was missing:
  // TWO live streams joined on key + event-time range — purchases
  // attributed to a same-user view within the preceding 30 minutes.
  // Both sides carry watermarks and the join condition bounds p_ts to
  // [v_ts, v_ts + 30 min], which is exactly what lets Spark expire
  // buffered state (a view older than watermark + 30 min can never
  // match again) — unbounded-state stream joins don't survive
  // production. Inner join in append mode; the q62/q77/q88 oracle
  // pattern: the drained stream result must hash-match the plain batch
  // interval join below.
  def streamingIntervalJoin: Q = Q(
    "q122_stream_stream_join",
    """SELECT a.user_id, a.event_id AS view_id, b.event_id AS purchase_id,
      |  epoch_us(CAST(a.ts AS TIMESTAMP)) AS view_us,
      |  epoch_us(CAST(b.ts AS TIMESTAMP)) AS purchase_us,
      |  round(CAST(b.value AS DOUBLE), 2) AS purchase_value
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND a.event_type = 'view' AND b.event_type = 'purchase'
      | AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
      | AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
      |ORDER BY view_id, purchase_id""".stripMargin,
  ) { (s, dir) =>
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet") // schema probe only
    def side(tpe: String, p: String) =
      graft.Tables.normalizeEventsTs(
        s.readStream.schema(raw.schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir))
        .filter(col("event_type") === tpe)
        .select(col("user_id").as(s"${p}_user"), col("event_id").as(s"${p}_id"),
          col("ts").as(s"${p}_ts"), col("value").as(s"${p}_value"))
        .withWatermark(s"${p}_ts", "2 hours")
    val joined = side("view", "v").join(side("purchase", "p"),
      expr("v_user = p_user AND p_ts >= v_ts AND p_ts <= v_ts + interval 30 minutes"))
    val sink = s"graft_ssj_${System.nanoTime()}"
    // a stream-stream join keeps TWO state stores per shuffle partition;
    // at the session's 32 partitions the one-shot drain spends more on
    // state-store file I/O than on rows (measured 7.0 s → 2.5 s). 8 is
    // plenty for the buffered key space here; a production deployment
    // sizes this to its key cardinality, not its core count.
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    val out = s.table(sink)
      .select(col("v_user").as("user_id"), col("v_id").as("view_id"),
        col("p_id").as("purchase_id"),
        unix_micros(col("v_ts")).as("view_us"), unix_micros(col("p_ts")).as("purchase_us"),
        round(col("p_value").cast("double"), 2).as("purchase_value"))
      .orderBy("view_id", "purchase_id")
      .localCheckpoint(true)
    s.catalog.dropTempView(sink)
    out
  }

  // --- q88: sessionization as a Structured Stream --------------------------
  // The q49 gap-sessionize executed with Spark's NATIVE streaming
  // session windows: `session_window(ts, gap)` merges events whose
  // gaps stay under 30 minutes into one growing window with keyed
  // state — the mechanism a live clickstream pipeline would run, here
  // required to hash-match q49's batch oracle exactly (the q62/q77
  // pattern: streaming and batch are one API with one answer).
  // min/max(ts) aggs ride the session merge, so session bounds are
  // event extremes, not the gap-padded window end. The per-user
  // session NUMBERING (q49's running counter) is ordinal over the
  // drained result — a window over the bounded sink table, outside
  // the stream. Complete-mode memory sink is the oracle-harness shape
  // only (q77 note applies): production runs append mode after
  // watermark expiry into a durable sink.
  def streamingSessionize: Q = Q(
    "q88_streaming_sessionize",
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
      |           OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, event_id, ts,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM e)
      |SELECT user_id, session_id,
      |  epoch_us(min(ts)) AS session_start_us,
      |  epoch_us(max(ts)) AS session_end_us,
      |  count(*) AS n_events
      |FROM s
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin,
  ) { (s, dir) =>
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet") // schema probe only
    val stream = graft.Tables.normalizeEventsTs(
      s.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(unix_micros(min(col("ts"))).as("session_start_us"),
        unix_micros(max(col("ts"))).as("session_end_us"),
        count(lit(1)).as("n_events"))
    val sink = s"graft_stream_sess_${System.nanoTime()}"
    val q = stream.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val wNum = Window.partitionBy("user_id").orderBy("session_start_us")
    val out = s.table(sink)
      .select(col("user_id"),
        row_number().over(wNum).cast("long").as("session_id"),
        col("session_start_us"), col("session_end_us"), col("n_events"))
      .orderBy("user_id", "session_id")
      .localCheckpoint(true)
    out.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => graft.dedup.Dedup.trackRdd(lr.rdd)
      case _ => ()
    }
    s.catalog.dropTempView(sink)
    out
  }

  // --- semi-structured JSON extraction (H15 extension) --------------------
  def jsonExtract: Q = Q(
    "q50_json_extract",
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
      |FROM events
      |ORDER BY event_id""".stripMargin,
  ) { (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))
      .orderBy("event_id")
  }

  // --- ML feature engineering (SURVEY §2 E3/E4/J1 shape) ------------------
  // Per-event features: per-user analytic aggregates + a LEAD-derived
  // "next event within 1 day" label — the readmission-label pattern.
  def mlFeatures: Q = Q(
    "q51_ml_features",
    """SELECT event_id, user_id,
      |  count(*) OVER (PARTITION BY user_id) AS user_event_cnt,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id) AS DOUBLE) AS user_value_sum,
      |  max(value) OVER (PARTITION BY user_id) AS user_value_max,
      |  min(value) OVER (PARTITION BY user_id) AS user_value_min,
      |  CASE WHEN epoch_us(lead(CAST(ts AS TIMESTAMP)) OVER
      |              (PARTITION BY user_id ORDER BY ts, event_id))
      |            - epoch_us(CAST(ts AS TIMESTAMP)) <= 86400000000
      |       THEN 1 ELSE 0 END AS next_within_1d
      |FROM events
      |ORDER BY event_id""".stripMargin,
  ) { (s, dir) =>
    val wAll = Window.partitionBy("user_id")
    val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(wAll).as("user_event_cnt"),
        sum(col("value").cast("decimal(18,2)")).over(wAll).cast("double").as("user_value_sum"),
        max(col("value")).over(wAll).as("user_value_max"),
        min(col("value")).over(wAll).as("user_value_min"),
        when(unix_micros(lead(col("ts"), 1).over(wOrd)) - unix_micros(col("ts")) <= 86400000000L, 1)
          .otherwise(0).as("next_within_1d"))
      .orderBy("event_id")
  }

  // --- q243: exponentially time-decayed popularity -------------------------
  // The feature-store freshness primitive: raw counts rank a catalog
  // by lifetime popularity; serving wants exp(−ln2·age/h) half-life
  // weighting (h = 7 days, as-of 2024-01-31) so last week outvotes
  // last month. One scan computes raw and decayed count/value sums
  // simultaneously (9-dp rounded weights, DECIMAL-exact sums — decay
  // weights are the classic float-sum-order trap, a tree reduction
  // vs sequential sum disagree in the last bits); `recency_index` =
  // decayed/raw count is the drift signal (higher = fresher traffic).
  // The whole query is a single keyed aggregate — the 100 TB shape is
  // a map-side partial per (type, partition), |types| rows crossing
  // the wire.
  def decayedPopularity: Q = Q(
    "q243_decayed_popularity",
    """WITH w AS (SELECT event_type, value,
      |    round(exp(-(ln(CAST(2 AS DOUBLE)) / 7.0)
      |      * ((epoch_us(TIMESTAMP '2024-01-31 00:00:00') - epoch_us(ts))
      |         / 86400000000.0)), 9) AS w
      |  FROM events)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  round(CAST(sum(CAST(w AS DECIMAL(18,9))) AS DOUBLE), 4) AS decayed_count,
      |  round(CAST(sum(CAST(round(w * value, 9) AS DECIMAL(18,9))) AS DOUBLE), 4)
      |    AS decayed_value,
      |  round(CAST(sum(CAST(w AS DECIMAL(18,9))) AS DOUBLE) / count(*), 4)
      |    AS recency_index
      |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin,
  ) { (s, dir) =>
    val ref = lit("2024-01-31 00:00:00").cast("timestamp")
    val age = (unix_micros(ref) - unix_micros(col("ts"))) / 86400000000.0
    val w = round(exp(-(log(lit(2.0)) / 7.0) * age), 9)
    Tables.events(s, dir)
      .select(col("event_type"), col("value"), w.as("w"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        round(dsum(col("w"), 9), 4).as("decayed_count"),
        round(dsum(round(col("w") * col("value"), 9), 9), 4).as("decayed_value"),
        round(dsum(col("w"), 9) / count(lit(1)), 4).as("recency_index"))
      .orderBy("event_type")
  }

  // --- q244: difference-in-differences -------------------------------------
  // The quasi-experimental estimate when randomization isn't
  // available (policy shipped at a date, not to a cohort): treatment
  // = the deterministic user_id-parity holdout, post = the Jan 16
  // cut, estimate = (T_post − T_pre) − (C_post − C_pre) on mean event
  // value — the parallel-trends subtraction that removes both the
  // group baseline and the secular time shift (q129's CUPED reduces
  // variance WITHIN a randomized test; DiD identifies the effect
  // without one). All four cell means reduce in ONE aggregate (9-dp
  // DECIMAL value sums ÷ exact counts); the estimate is a cancelling
  // double subtraction → signed-zero-normalized, empty cells NULL
  // via try_divide.
  def diffInDiff: Q = Q(
    "q244_diff_in_diff",
    """WITH c AS (SELECT CAST(user_id % 2 AS INT) AS treat,
      |    CAST(ts >= TIMESTAMP '2024-01-16 00:00:00' AS INT) AS post,
      |    value FROM events),
      |agg AS (SELECT
      |    sum(CASE WHEN treat = 1 AND post = 1 THEN 1 ELSE 0 END) AS n11,
      |    sum(CASE WHEN treat = 1 AND post = 0 THEN 1 ELSE 0 END) AS n10,
      |    sum(CASE WHEN treat = 0 AND post = 1 THEN 1 ELSE 0 END) AS n01,
      |    sum(CASE WHEN treat = 0 AND post = 0 THEN 1 ELSE 0 END) AS n00,
      |    CAST(sum(CASE WHEN treat = 1 AND post = 1
      |      THEN CAST(round(value, 9) AS DECIMAL(18,9)) ELSE 0 END) AS DOUBLE) AS s11,
      |    CAST(sum(CASE WHEN treat = 1 AND post = 0
      |      THEN CAST(round(value, 9) AS DECIMAL(18,9)) ELSE 0 END) AS DOUBLE) AS s10,
      |    CAST(sum(CASE WHEN treat = 0 AND post = 1
      |      THEN CAST(round(value, 9) AS DECIMAL(18,9)) ELSE 0 END) AS DOUBLE) AS s01,
      |    CAST(sum(CASE WHEN treat = 0 AND post = 0
      |      THEN CAST(round(value, 9) AS DECIMAL(18,9)) ELSE 0 END) AS DOUBLE) AS s00
      |  FROM c)
      |SELECT CAST(n11 + n10 AS BIGINT) AS n_treat, CAST(n01 + n00 AS BIGINT) AS n_control,
      |  round(s10 / n10, 6) AS treat_pre, round(s11 / n11, 6) AS treat_post,
      |  round(s00 / n00, 6) AS control_pre, round(s01 / n01, 6) AS control_post,
      |  round((s11 / n11 - s10 / n10) - (s01 / n01 - s00 / n00), 6) + 0.0
      |    AS did_estimate
      |FROM agg""".stripMargin,
  ) { (s, dir) =>
    val c = Tables.events(s, dir)
      .select((col("user_id") % 2).cast("int").as("treat"),
        (col("ts") >= lit("2024-01-16 00:00:00").cast("timestamp")).cast("int").as("post"),
        col("value"))
    def cell(t: Int, p: Int) = (when(col("treat") === t && col("post") === p, 1).otherwise(0),
      sum(when(col("treat") === t && col("post") === p,
        round(col("value"), 9).cast("decimal(18,9)")).otherwise(lit(0).cast("decimal(18,9)")))
        .cast("double"))
    val agg = c.agg(
      sum(cell(1, 1)._1).as("n11"), sum(cell(1, 0)._1).as("n10"),
      sum(cell(0, 1)._1).as("n01"), sum(cell(0, 0)._1).as("n00"),
      cell(1, 1)._2.as("s11"), cell(1, 0)._2.as("s10"),
      cell(0, 1)._2.as("s01"), cell(0, 0)._2.as("s00"))
    def m(sc: String, n: String) = try_divide(col(sc), col(n).cast("double"))
    agg.select((col("n11") + col("n10")).cast("long").as("n_treat"),
      (col("n01") + col("n00")).cast("long").as("n_control"),
      round(m("s10", "n10"), 6).as("treat_pre"), round(m("s11", "n11"), 6).as("treat_post"),
      round(m("s00", "n00"), 6).as("control_pre"), round(m("s01", "n01"), 6).as("control_post"),
      znorm(round((m("s11", "n11") - m("s10", "n10")) - (m("s01", "n01") - m("s00", "n00")), 6))
        .as("did_estimate"))
  }

  // --- q245: Holt linear-trend smoothing + 3-day forecast ------------------
  // q156's EWMA tracks a level; capacity planning needs the TREND too
  // — Holt's double exponential smoothing (α = 0.5, β = 0.3) over the
  // per-type daily mean series, forecasting 3 days out as l + 3b. The
  // recurrence is inherently sequential, but the sequence is the
  // DAILY series, not the event stream: the corpus-scale work is one
  // keyed (type, day) mean aggregate; each type's ≤31-point series
  // then folds in a bounded per-row HOF (l ← αx + (1−α)(l+b),
  // b ← β(l−l_prev) + (1−β)b, every state 9-dp requantized — the
  // q133 trajectory discipline), and DuckDB replays the identical
  // fold via a RECURSIVE CTE stepping the per-type row_number (NOT
  // list_reduce: DuckDB 1.0's struct-accumulator lambda mis-binds
  // fields across steps — measured, not theoretical). Missing days
  // are absent observations (the fold runs over the observed ordered
  // series). The trend is a cancelling subtraction → znormed.
  def holtForecast: Q = Q(
    "q245_holt_forecast",
    """WITH RECURSIVE d AS (SELECT event_type,
      |    datediff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS day, value
      |  FROM events),
      |m AS (SELECT event_type, day,
      |    round(CAST(sum(CAST(round(value, 9) AS DECIMAL(18,9))) AS DOUBLE)
      |      / count(*), 9) AS x
      |  FROM d GROUP BY 1, 2),
      |o AS (SELECT event_type,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn, x
      |  FROM m),
      |nn AS (SELECT event_type, max(rn) AS n FROM o GROUP BY 1),
      |rec AS (
      |  SELECT event_type, 1 AS rn, x AS l, CAST(0.0 AS DOUBLE) AS b
      |  FROM o WHERE rn = 1
      |  UNION ALL
      |  SELECT r.event_type, r.rn + 1,
      |    round(0.5 * o.x + 0.5 * (r.l + r.b), 9),
      |    round(0.3 * (round(0.5 * o.x + 0.5 * (r.l + r.b), 9) - r.l)
      |          + 0.7 * r.b, 9)
      |  FROM rec r JOIN o ON o.event_type = r.event_type AND o.rn = r.rn + 1)
      |SELECT r.event_type, CAST(nn.n AS BIGINT) AS n_days,
      |  round(r.l, 6) AS level, round(r.b, 6) + 0.0 AS trend,
      |  round(r.l + 3 * r.b, 6) + 0.0 AS forecast_3
      |FROM rec r JOIN nn ON nn.event_type = r.event_type AND r.rn = nn.n
      |ORDER BY r.event_type""".stripMargin,
  ) { (s, dir) =>
    val d = Tables.events(s, dir)
      .select(col("event_type"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).as("day"),
        col("value"))
    val mAgg = d.groupBy("event_type", "day")
      .agg(round(dsum(round(col("value"), 9), 9) / count(lit(1)), 9).as("x"))
    val ser = mAgg.groupBy("event_type")
      .agg(transform(array_sort(collect_list(struct(col("day"), col("x")))),
        s => s.getField("x")).as("xs"),
        count(lit(1)).as("n"))
    // bounded per-row fold over the ≤31-point series — the identical
    // recurrence DuckDB's list_reduce replays (seed = first element)
    val hb = aggregate(
      slice(col("xs"), lit(2), greatest(size(col("xs")) - 1, lit(0))),
      struct(element_at(col("xs"), 1).as("a"), lit(0.0).as("b")),
      (acc, x) => {
        val lnew = round(lit(0.5) * x + lit(0.5) * (acc.getField("a") + acc.getField("b")), 9)
        struct(lnew.as("a"),
          round(lit(0.3) * (lnew - acc.getField("a")) + lit(0.7) * acc.getField("b"), 9)
            .as("b"))
      })
    ser.select(col("event_type"), col("n").cast("long").as("n_days"), hb.as("hb"))
      .select(col("event_type"), col("n_days"),
        round(col("hb.a"), 6).as("level"),
        znorm(round(col("hb.b"), 6)).as("trend"),
        znorm(round(col("hb.a") + lit(3) * col("hb.b"), 6)).as("forecast_3"))
      .orderBy("event_type")
  }

  // --- q251: two-sided CUSUM change-point detection -------------------------
  // q113 flags a spike against a trailing average — a LEVEL test that
  // misses slow drifts. CUSUM (Page 1954) accumulates small deviations
  // until they cross a band: S⁺_t = max(0, S⁺_{t-1} + (x_t − μ)),
  // mirrored downward, alarm when either side exceeds 4σ̂. The
  // max(0,·) recursion looks inherently sequential, but it equals
  // C_t − min(0, min_{j≤t} C_j) over the deviation prefix sums C — two
  // ordinary running-min/max window passes, no recursion. Engine
  // parity is integer-exact end to end: deviations are scaled to
  // 1e4·counts minus the 4-dp-scaled mean (one BIGINT per day), so
  // prefix sums, running extrema, and both CUSUM sides are exact
  // integer arithmetic until the final /10⁴ render; σ̂ comes from the
  // (n, Σx, Σx²) integer moments, never a streaming variance. The
  // corpus-scale work is one (type, day) count; windows then order
  // report-sized daily series per type — the q245 partitioning.
  def cusumDrift: Q = Q(
    "q251_cusum_drift",
    """WITH daily AS (SELECT event_type,
      |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT event_type, count(*) AS nd, CAST(sum(n) AS BIGINT) AS sc,
      |    CAST(sum(n * n) AS BIGINT) AS scc FROM daily GROUP BY 1),
      |y AS (SELECT d.event_type, d.day, d.n,
      |    d.n * 10000 - CAST(round(m.sc * 10000.0 / m.nd, 0) AS BIGINT) AS y,
      |    round(sqrt((m.nd * m.scc - m.sc * m.sc)
      |      / (m.nd * (m.nd - 1.0))), 4) AS sd
      |  FROM daily d JOIN m ON m.event_type = d.event_type),
      |c AS (SELECT event_type, day, n, sd,
      |    CAST(sum(y) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS cs
      |  FROM y),
      |r AS (SELECT event_type, day, n, sd, cs,
      |    min(cs) OVER (PARTITION BY event_type ORDER BY day) AS rmin,
      |    max(cs) OVER (PARTITION BY event_type ORDER BY day) AS rmax
      |  FROM c)
      |SELECT event_type, day, n,
      |  round((cs - least(0, rmin)) / 10000.0, 4) AS cusum_up,
      |  round((greatest(0, rmax) - cs) / 10000.0, 4) AS cusum_dn,
      |  ((cs - least(0, rmin)) / 10000.0 > 4 * sd
      |   OR (greatest(0, rmax) - cs) / 10000.0 > 4 * sd) AS alarm
      |FROM r ORDER BY event_type, day""".stripMargin,
  ) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val m = daily.groupBy("event_type").agg(count(lit(1)).as("nd"),
      sum("n").cast("long").as("sc"),
      sum(col("n") * col("n")).cast("long").as("scc"))
    val y = daily.join(broadcast(m), "event_type")
      .select(col("event_type"), col("day"), col("n"),
        (col("n") * lit(10000L)
          - round(col("sc") * 10000.0 / col("nd"), 0).cast("long")).as("y"),
        round(sqrt(try_divide(
          (col("nd") * col("scc") - col("sc") * col("sc")).cast("double"),
          col("nd") * (col("nd") - lit(1.0)))), 4).as("sd"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val r = y.withColumn("cs", sum("y").over(w).cast("long"))
      .withColumn("rmin", min("cs").over(w))
      .withColumn("rmax", max("cs").over(w))
    val up = (col("cs") - least(lit(0L), col("rmin"))) / 10000.0
    val dn = (greatest(lit(0L), col("rmax")) - col("cs")) / 10000.0
    r.select(col("event_type"), col("day"), col("n"),
        round(up, 4).as("cusum_up"), round(dn, 4).as("cusum_dn"),
        (up > lit(4) * col("sd") || dn > lit(4) * col("sd")).as("alarm"))
      .orderBy("event_type", "day")
  }

  // --- q258: seasonal-trend decomposition (STL-lite) -------------------------
  // q168 detects a weekly spike and q245 smooths a trend; this is the
  // decomposition view monitoring actually plots: daily volume split
  // into trend + day-of-week seasonality + remainder (classical
  // additive decomposition — the moving-average core of STL without
  // the loess robustness loop). Trend = centered 7-day mean (NULL on
  // the 3-day edges — a partial window would bias the level);
  // seasonality = per-weekday mean of the detrended series, 4-dp
  // decimal discipline; remainder = what neither explains, the series
  // anomaly hunting actually runs on. The corpus reduces to one row
  // per day FIRST; every window after that is calendar-sized.
  // Weekday alignment pins Monday = 0 in both engines (Spark weekday
  // vs DuckDB isodow − 1); all three decomposition outputs are
  // subtractions → znorm per the signed-zero rule.
  def seasonalDecompose: Q = Q(
    "q258_seasonal_decompose",
    """WITH daily AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |tr AS (SELECT day, n,
      |    CASE WHEN count(*) OVER w = 7
      |         THEN round(avg(n) OVER w, 4) ELSE NULL END AS trend
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |dt AS (SELECT day, n, trend, isodow(day) - 1 AS dow,
      |    round(n - trend, 4) AS detr FROM tr),
      |se AS (SELECT dow,
      |    round(CAST(sum(CAST(detr AS DECIMAL(28,4))) AS DOUBLE)
      |      / count(detr), 4) AS seasonal
      |  FROM dt WHERE detr IS NOT NULL GROUP BY dow)
      |SELECT strftime(dt.day, '%Y-%m-%d') AS day, dt.n,
      |  CAST(dt.dow AS INTEGER) AS dow,
      |  round(dt.trend, 4) + 0.0 AS trend,
      |  round(se.seasonal, 4) + 0.0 AS seasonal,
      |  round(dt.n - dt.trend - se.seasonal, 4) + 0.0 AS remainder
      |FROM dt JOIN se ON se.dow = dt.dow
      |ORDER BY day""".stripMargin,
  ) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(to_date(date_trunc("day", col("ts"))).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy("day").rowsBetween(-3, 3)
    val tr = graft.dedup.Dedup.persistTracked(daily
      .select(col("day"), col("n"),
        when(count(lit(1)).over(w) === 7, round(avg("n").over(w), 4)).as("trend"))
      .withColumn("dow", weekday(col("day")))
      .withColumn("detr", round(col("n") - col("trend"), 4)))
    val se = tr.filter(col("detr").isNotNull)
      .groupBy("dow")
      .agg(round(dsum(col("detr"), 4) / count(col("detr")), 4).as("seasonal"))
    tr.join(broadcast(se), "dow")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
        col("dow").cast("int").as("dow"),
        znorm(round(col("trend"), 4)).as("trend"),
        znorm(round(col("seasonal"), 4)).as("seasonal"),
        znorm(round(col("n") - col("trend") - col("seasonal"), 4)).as("remainder"))
      .orderBy("day")
  }

  // --- q261: Pareto skyline over daily (volume, value) ------------------------
  // The preference-query operator (Börzsönyi et al. 2001) the registry
  // lacked: which days are not DOMINATED — no other day beats them on
  // BOTH event volume and total value? Dominance pruning is the
  // dashboard's "best days" panel and the same primitive multi-
  // objective data selection uses (quality vs length, loss vs
  // diversity). The scale discipline is reduce-first: the corpus
  // collapses to one (day, n, cents) row per day, so the skyline runs
  // on a calendar-sized table where the classic sort-filter algorithm
  // is exact: under strict dominance (beaten on BOTH axes), a day is
  // on the skyline iff its value strictly exceeds the running max
  // value over all strictly-higher-volume days — a RANGE frame
  // ending 1 PRECEDING on the volume ordering, which by construction
  // never lets equal-volume days eliminate each other. Value stays
  // integer cents end to end; no floats anywhere.
  def skylineDays: Q = Q(
    "q261_skyline_days",
    """WITH daily AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |    CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(round(value, 2) AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM events GROUP BY 1),
      |r AS (SELECT day, n, cents,
      |    max(cents) OVER (ORDER BY n DESC RANGE BETWEEN UNBOUNDED PRECEDING
      |      AND 1 PRECEDING) AS best_higher
      |  FROM daily)
      |SELECT day, n, round(cents / 100.0, 2) AS value,
      |  (best_higher IS NULL OR cents > best_higher) AS on_skyline
      |FROM r ORDER BY day""".stripMargin,
  ) { (s, dir) =>
    val daily = Tables.events(s, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value"), 2).cast("decimal(18,2)")) * 100).cast("long")
          .as("cents"))
    // RANGE over n DESC groups equal-volume days together: a day never
    // sees its volume-ties in best_higher, so ties compete on value
    val w = Window.orderBy(col("n").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    daily.withColumn("best_higher", max("cents").over(w))
      .select(col("day"), col("n"), round(col("cents") / 100.0, 2).as("value"),
        (col("best_higher").isNull || col("cents") > col("best_higher"))
          .as("on_skyline"))
      .orderBy("day")
  }

  // --- q266: inter-event gap regularity (bot detection) -----------------------
  // Scraper/bot traffic is too REGULAR: a human's inter-event gaps
  // have a coefficient of variation near 1 (memoryless arrivals),
  // a cron job's is near 0. Per user with ≥5 gaps: CV of the gap
  // distribution from exact integer microsecond moments — gaps are
  // BIGINT µs, squares accumulate in DECIMAL(38,0) (a day-long gap
  // squared already eats 2⁶³ after ~200 events), and the only doubles
  // are the closed-form mean/sd. The corpus-scale work is one lag
  // window inside (user) partitions — the q49 sessionize shape — then
  // a per-user aggregate. Top-20 most-robotic users by (cv, user_id);
  // a constant-gap user hits cv = 0 exactly (integer arithmetic, no
  // ±ulp residue to normalize — but the subtraction-shaped sd is
  // znormed anyway per the rule).
  def gapRegularity: Q = Q(
    "q266_gap_regularity",
    """WITH g AS (SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS gap
      |  FROM events),
      |m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
      |    CAST(sum(gap) AS BIGINT) AS sg,
      |    CAST(sum(CAST(gap AS HUGEINT) * gap) AS DOUBLE) AS sgg
      |  FROM g WHERE gap IS NOT NULL GROUP BY user_id
      |  HAVING count(*) >= 5),
      |c AS (SELECT user_id, n_gaps,
      |    round(CAST(sg AS DOUBLE) / n_gaps / 1000000.0, 4) AS mean_gap_s,
      |    round(sqrt((n_gaps * sgg - CAST(sg AS DOUBLE) * sg)
      |      / (CAST(n_gaps AS DOUBLE) * (n_gaps - 1)))
      |      / (CAST(sg AS DOUBLE) / n_gaps), 4) + 0.0 AS cv
      |  FROM m)
      |SELECT user_id, n_gaps, mean_gap_s, cv, cv < 0.1 AS robotic
      |FROM c ORDER BY cv, user_id LIMIT 20""".stripMargin,
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val us = expr("unix_micros(ts)")
    val g = Tables.events(s, dir)
      .select(col("user_id"), (us - lag(us, 1).over(w)).as("gap"))
      .filter(col("gap").isNotNull)
    val m = g.groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_gaps"),
        sum("gap").cast("long").as("sg"),
        sum(col("gap").cast("decimal(19,0)") * col("gap").cast("decimal(19,0)"))
          .cast("double").as("sgg"))
      .filter(col("n_gaps") >= 5)
    val meanUs = col("sg").cast("double") / col("n_gaps")
    val sd = sqrt((col("n_gaps") * col("sgg") - col("sg").cast("double") * col("sg"))
      / (col("n_gaps").cast("double") * (col("n_gaps") - 1)))
    m.select(col("user_id"), col("n_gaps"),
        round(meanUs / 1000000.0, 4).as("mean_gap_s"),
        znorm(round(sd / meanUs, 4)).as("cv"))
      .withColumn("robotic", col("cv") < 0.1)
      .orderBy("cv", "user_id").limit(20)
  }

  // --- q267: held-out next-event perplexity of the session LM -----------------
  // q109 reports the transition MATRIX; this asks the eval question a
  // sequence model asks of its data: how predictable is the next
  // event, measured properly on HELD-OUT traffic? Train = even
  // user_ids, eval = odd (the q213 deterministic-split discipline):
  // add-1-smoothed transition probabilities fit on training
  // transitions only, scored on eval transitions; per current-state
  // row: mean held-out logprob (9-dp decimal) and its perplexity.
  // Both passes are one lag window + keyed aggregates; the model
  // table is |types|²-bounded and broadcast. Smoothing means unseen
  // eval transitions score ln(1/(row+K)) instead of −∞.
  def markovPerplexity: Q = Q(
    "q267_markov_perplexity",
    """WITH seq AS (SELECT user_id, event_type AS cur,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      |  FROM events),
      |types AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k FROM events),
      |tcnt AS (SELECT cur, nxt, count(*) AS c FROM seq
      |         WHERE nxt IS NOT NULL AND user_id % 2 = 0 GROUP BY cur, nxt),
      |trow AS (SELECT cur, CAST(sum(c) AS BIGINT) AS rn FROM tcnt GROUP BY cur),
      |ev AS (SELECT s.cur, s.nxt FROM seq s
      |       WHERE s.nxt IS NOT NULL AND s.user_id % 2 = 1),
      |sc AS (SELECT ev.cur,
      |    round(ln((COALESCE(tc.c, 0) + 1.0)
      |      / (COALESCE(tr2.rn, 0) + tt.k)), 9) AS lp
      |  FROM ev LEFT JOIN tcnt tc ON tc.cur = ev.cur AND tc.nxt = ev.nxt
      |          LEFT JOIN trow tr2 ON tr2.cur = ev.cur
      |          CROSS JOIN types tt)
      |SELECT cur AS event_type, CAST(count(*) AS BIGINT) AS n_eval,
      |  round(CAST(sum(CAST(lp AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6)
      |    AS mean_logprob,
      |  round(exp(-(CAST(sum(CAST(lp AS DECIMAL(18,9))) AS DOUBLE) / count(*))), 4)
      |    AS perplexity
      |FROM sc GROUP BY cur ORDER BY cur""".stripMargin,
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val seq0 = Tables.events(s, dir)
      .select(col("user_id"), col("event_type").as("cur"),
        lead(col("event_type"), 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull)
    val seq = graft.dedup.Dedup.persistTracked(seq0)
    val types = Tables.events(s, dir)
      .agg(countDistinct("event_type").cast("long").as("k"))
    val tcnt = seq.filter(col("user_id") % 2 === 0)
      .groupBy("cur", "nxt").agg(count(lit(1)).as("c"))
    val trow = tcnt.groupBy("cur").agg(sum("c").cast("long").as("rn"))
    val lp = round(log((coalesce(col("c"), lit(0L)) + 1.0)
      / (coalesce(col("rn"), lit(0L)) + col("k"))), 9)
    val sc = seq.filter(col("user_id") % 2 === 1).select("cur", "nxt")
      .join(broadcast(tcnt), Seq("cur", "nxt"), "left")
      .join(broadcast(trow), Seq("cur"), "left")
      .crossJoin(broadcast(types))
      .select(col("cur"), lp.as("lp"))
    sc.groupBy("cur")
      .agg(count(lit(1)).cast("long").as("n_eval"),
        round(dsum(col("lp"), 9) / count(lit(1)), 6).as("mean_logprob"),
        round(exp(-(dsum(col("lp"), 9) / count(lit(1)))), 4).as("perplexity"))
      .select(col("cur").as("event_type"), col("n_eval"), col("mean_logprob"),
        col("perplexity"))
      .orderBy("event_type")
  }

  // --- q279: SPRT sequential conversion monitor -------------------------------
  // The anytime-valid cousin of q116/q129: Wald's sequential
  // probability ratio test over the daily purchase share, H₀ p=0.15
  // vs H₁ p=0.20 at α=β=0.05. Each day contributes
  // x·ln(p₁/p₀) + (n−x)·ln((1−p₁)/(1−p₀)); the cumulative LLR crosses
  // ±ln 19 the moment the data decide — the monitoring shape that
  // stops an experiment early instead of waiting for a fixed horizon.
  // Per-day terms are 8-dp rounded into DECIMAL before the cumulative
  // window (days-sized, the bounded-window stance), and the decision
  // compares 6-dp-rounded values so an engine ULP on ln can't flip a
  // boundary day. One scan → days-row aggregate → 30-row window.
  def sprtMonitor: Q = Q(
    "q279_sprt_monitor",
    """WITH ev AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events),
      |d AS (SELECT day, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS x
      |  FROM ev GROUP BY day),
      |l AS (SELECT day, n, x,
      |    round(x * ln(0.20 / 0.15) + (n - x) * ln(0.80 / 0.85), 8) AS llr FROM d),
      |c AS (SELECT day, n, x,
      |    CAST(sum(CAST(llr AS DECIMAL(18,8))) OVER (ORDER BY day) AS DOUBLE) AS cum
      |  FROM l)
      |SELECT day, n, x, round(cum, 6) + 0.0 AS cum_llr,
      |  CASE WHEN round(cum, 6) >= round(ln(19.0), 6) THEN 'accept_h1'
      |       WHEN round(cum, 6) <= -round(ln(19.0), 6) THEN 'accept_h0'
      |       ELSE 'continue' END AS decision
      |FROM c ORDER BY day""".stripMargin,
  ) { (s, dir) =>
    val d = Tables.events(s, dir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("y"))
      .groupBy("day")
      .agg(count(lit(1)).cast("long").as("n"), sum("y").cast("long").as("x"))
    val llr = round(col("x") * log(lit(0.20) / 0.15) +
      (col("n") - col("x")) * log(lit(0.80) / 0.85), 8)
    val c = d.withColumn("cum",
      sum(llr.cast("decimal(18,8)")).over(Window.orderBy("day")).cast("double"))
    val bound = round(log(lit(19.0)), 6)
    c.select(col("day"), col("n"), col("x"),
        znorm(round(col("cum"), 6)).as("cum_llr"),
        when(round(col("cum"), 6) >= bound, "accept_h1")
          .when(round(col("cum"), 6) <= -bound, "accept_h0")
          .otherwise("continue").as("decision"))
      .orderBy("day")
  }

  // --- q289: spectral gap / mixing time of the session Markov chain ------------
  // q109 gives the transition matrix, q267 its predictive quality;
  // this asks the DYNAMICS question — how fast does the chain forget
  // its start state? |λ₂| (the SLEM) via 8 power iterations on the
  // zero-sum complement of the stationary direction: start from
  // e_first − 1/k (orthogonal to the all-ones right eigenvector),
  // repeatedly apply xᵀP with L1 renormalization; the last norm
  // before normalizing estimates |λ₂| and mixing ≈ ln 10 / −ln |λ₂|.
  // Everything stays relational and types-bounded: the matrix is a
  // k²-row table (k = event types), each iteration is one keyed join
  // + one k-row aggregate with 12-dp decimal discipline, and the
  // oracle unrolls the identical 8 (matvec, norm, rescale) CTE
  // triples. A chain with λ₂ = 0 nulls out via try_divide.
  def spectralGap: Q = {
    // Each CTE is referenced exactly ONCE downstream (the L1 norm is a
    // window over y_i, never a scalar subquery): a y→l→x triple where
    // x reads y twice doubles the inlined plan per iteration — 2⁸ copies
    // of the corpus window by x8 (measured: the oracle ran minutes
    // instead of ms before this shape).
    val iterCtes = (1 to 7).map { i =>
      s"""y$i AS (SELECT p.to_type AS state,
         |    CAST(sum(CAST(round(x.val * p.p, 12) AS DECIMAL(28,12))) AS DOUBLE) AS val
         |  FROM x${i - 1} x JOIN pm p ON p.from_type = x.state GROUP BY p.to_type),
         |x$i AS (SELECT state, round(val / CAST(sum(CAST(round(abs(val), 12)
         |    AS DECIMAL(28,12))) OVER () AS DOUBLE), 12) AS val FROM y$i)""".stripMargin
    }.mkString(",\n")
    Q(
      "q289_spectral_gap",
      s"""WITH pairs AS (
         |  SELECT event_type AS from_type,
         |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |      AS to_type
         |  FROM events),
         |c AS (SELECT from_type, to_type, count(*) AS n
         |  FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |pm AS (SELECT from_type, to_type,
         |    round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 9) AS p
         |  FROM c),
         |states AS (SELECT from_type AS state,
         |    row_number() OVER (ORDER BY from_type) AS rn,
         |    count(*) OVER () AS k FROM
         |    (SELECT DISTINCT from_type FROM pm)),
         |x0 AS (SELECT state, CAST(k AS BIGINT) AS k,
         |    CASE WHEN rn = 1 THEN 1.0 - 1.0 / k ELSE -1.0 / k END AS val
         |  FROM states),
         |$iterCtes,
         |y8 AS (SELECT max(x.k) AS k,
         |    CAST(sum(CAST(round(abs(yy.val), 12) AS DECIMAL(28,12))) AS DOUBLE) AS l
         |  FROM (SELECT p.to_type AS state,
         |      CAST(sum(CAST(round(x.val * p.p, 12) AS DECIMAL(28,12))) AS DOUBLE)
         |        AS val
         |    FROM x7 x JOIN pm p ON p.from_type = x.state GROUP BY p.to_type) yy
         |  CROSS JOIN (SELECT max(k) AS k FROM x0) x)
         |SELECT CAST(k AS BIGINT) AS n_states,
         |  round(l, 6) AS slem,
         |  round(ln(10.0) / (-ln(nullif(l, 0))), 4) AS mixing_steps
         |FROM y8""".stripMargin,
    ) { (s, dir) =>
      val pairs = Tables.events(s, dir)
        .select(col("event_type").as("from_type"),
          lead("event_type", 1).over(Window.partitionBy("user_id")
            .orderBy("ts", "event_id")).as("to_type"))
        .filter(col("to_type").isNotNull)
      val cnt = pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      val pm = graft.dedup.Dedup.persistTracked(cnt.select(col("from_type"),
        col("to_type"),
        round(col("n").cast("double") /
          sum("n").over(Window.partitionBy("from_type")), 9).as("p")))
      // The corpus-scale work ends at pm (one window + one aggregate);
      // what reaches the driver is the k²-bounded transition matrix
      // (k = event types). The 8 power iterations then run as driver
      // arithmetic with the exact engine semantics (12-dp HALF_UP via
      // BigDecimal.valueOf — bit-identical to Spark's round() on
      // doubles — and scale-12 decimal sums), because a DataFrame
      // formulation of a k-row × 8-iteration loop spends seconds of
      // AQE stage scheduling per iteration (measured 41 s on the
      // ladder; the q219 Bradley-Terry lesson). The DuckDB oracle
      // replays the identical chain from the corpus, so the driver
      // arithmetic is hash-checked end to end.
      import java.math.{BigDecimal => JBD, RoundingMode}
      def rnd(x: Double, sc: Int): Double =
        JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue
      def sumDec12(xs: Iterable[Double]): Double =
        xs.foldLeft(JBD.ZERO)((acc, v) =>
          acc.add(JBD.valueOf(v).setScale(12, RoundingMode.HALF_UP))).doubleValue
      val mat = pm.collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      val statesArr = mat.map(_._1).distinct.sorted
      val kk = statesArr.length
      // the documented driver budget: the collected transition matrix
      // is k² with k = event types. A corpus change that explodes the
      // type vocabulary must fail loudly, not silently collect it
      // (the Hits.require(iters <= 4) precedent).
      require(mat.length <= 10000,
        s"q289: collected transition matrix has ${mat.length} entries " +
          s"(k=$kk states); the driver-arithmetic budget is k^2 <= 10000 — " +
          "a larger state space needs the DataFrame iteration form")
      var xv: Map[String, Double] = statesArr.zipWithIndex.map { case (st, i) =>
        st -> (if (i == 0) 1.0 - 1.0 / kk else -1.0 / kk)
      }.toMap
      var l = Double.NaN
      var dead = false
      for (i <- 1 to 8 if !dead) {
        val yv = mat.groupBy(_._2).map { case (to, es) =>
          to -> sumDec12(es.map { case (from, _, p) => rnd(xv(from) * p, 12) })
        }
        l = sumDec12(yv.values.map(v => rnd(math.abs(v), 12)))
        // l == 0 mid-chain NULLs the SQL via x_i's /0 (DuckDB x/0 =
        // NULL) — dead matches that. On the FINAL iteration there is
        // no x8 division in the SQL: it emits slem = 0.0 and NULLs
        // only mixing_steps (nullif(l,0) inside ln) — do the same.
        if (l == 0.0) { if (i < 8) dead = true }
        else xv = statesArr.map(st => st -> rnd(yv.getOrElse(st, 0.0) / l, 12)).toMap
      }
      import s.implicits._
      val out =
        if (dead) Seq((kk.toLong, Option.empty[Double], Option.empty[Double]))
        else Seq((kk.toLong, Some(rnd(l, 6)),
          // a periodic chain (|λ₂| = 1) has no finite mixing time, and
          // l = 0 has no log: NULL, matching DuckDB's x/0 and
          // ln(nullif(l, 0))
          if (l == 0.0 || -math.log(l) == 0.0) Option.empty[Double]
          else Some(rnd(math.log(10.0) / -math.log(l), 4))))
      out.toDF("n_states", "slem", "mixing_steps")
    }
  }

  // --- q324: late-arrival (watermark) audit -----------------------------------
  // Before choosing `withWatermark` for the streaming jobs, measure
  // what a given allowed-lateness would actually DROP: replaying the
  // feed in ingest order (event_id — the generator's arrival
  // sequence), an event is late iff its event time trails the running
  // max event time of everything that arrived BEFORE it by more than
  // the 10-minute watermark — exactly Structured Streaming's per-batch
  // drop rule. Per event type (the unit a Kafka-partitioned source
  // tracks): totals, late counts/share, and the worst EXCESS beyond
  // the watermark in integer microseconds (hwm − 600s − t_us, i.e.
  // how much LARGER an allowed-lateness would have to be to keep the
  // event — an 11-minute-stale event reads 60s, not 660s; consumers
  // sizing a watermark add their current allowance back; the q176 µs
  // discipline — no float time arithmetic anywhere). One per-type ordered window, one keyed
  // aggregate; the window state is a single running max.
  def lateArrivalAudit: Q = Q(
    "q324_late_arrival_audit",
    """WITH o AS (SELECT event_type, event_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
      |    max(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY event_type
      |      ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      AS hwm
      |  FROM events),
      |l AS (SELECT event_type,
      |    CASE WHEN hwm IS NOT NULL AND t_us < hwm - 600000000 THEN 1 ELSE 0 END
      |      AS is_late,
      |    CASE WHEN hwm IS NOT NULL AND t_us < hwm - 600000000
      |         THEN hwm - 600000000 - t_us END AS late_us
      |  FROM o)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(is_late) AS BIGINT) AS n_late,
      |  round(CAST(sum(is_late) AS BIGINT) / CAST(count(*) AS DOUBLE), 6) AS late_share,
      |  CAST(max(late_us) AS BIGINT) AS excess_lateness_us
      |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin,
  ) { (s, dir) =>
    val wmUs = 600000000L // 10 min
    val w = Window.partitionBy("event_type").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val o = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("t_us"))
      .withColumn("hwm", max(col("t_us")).over(w))
    val isLate = when(col("hwm").isNotNull && col("t_us") < col("hwm") - wmUs, 1)
      .otherwise(0)
    val lateUs = when(col("hwm").isNotNull && col("t_us") < col("hwm") - wmUs,
      col("hwm") - wmUs - col("t_us"))
    o.select(col("event_type"), isLate.as("is_late"), lateUs.as("late_us"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("is_late")).cast("long").as("n_late"),
        round(sum(col("is_late")).cast("long") / count(lit(1)).cast("double"), 6)
          .as("late_share"),
        max(col("late_us")).cast("long").as("excess_lateness_us"))
      .orderBy("event_type")
  }

  // --- q331: single changepoint detection (binary segmentation, round 1) --------
  // CUSUM (q251) raises the alarm; this LOCATES the break: per event
  // type, the split of the daily-count series minimizing
  // SSE_left + SSE_right — the first round of binary segmentation,
  // equivalently the max-likelihood single mean-shift point. Every
  // candidate's SSE comes from integer prefix sums (Σn, Σn² cumulative
  // windows over the ≤days-sized daily table — never a per-candidate
  // rescan); the argmin ranks on the 6-dp-rounded SSE with day
  // tie-break. `var_explained` = 1 − SSE_split/SSE_flat (znormed; a
  // constant series NULLs via the zero flat SSE).
  def changepoint: Q = Q(
    "q331_changepoint",
    """WITH daily AS (SELECT event_type,
      |    strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
      |    CAST(sum(n) AS BIGINT) AS sc, CAST(sum(n * n) AS BIGINT) AS scc
      |  FROM daily GROUP BY 1),
      |pre AS (SELECT event_type, day, n,
      |    CAST(sum(n) OVER w AS BIGINT) AS cs,
      |    CAST(sum(n * n) OVER w AS BIGINT) AS css,
      |    CAST(row_number() OVER w AS BIGINT) AS i
      |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
      |cand AS (SELECT p.event_type, p.day, p.i, m.nd, m.sc, p.cs,
      |    round((p.css - CAST(p.cs AS DOUBLE) * p.cs / p.i)
      |      + ((m.scc - p.css)
      |         - CAST(m.sc - p.cs AS DOUBLE) * (m.sc - p.cs) / (m.nd - p.i)), 6)
      |      AS sse,
      |    round(CAST(m.scc AS DOUBLE) - CAST(m.sc AS DOUBLE) * m.sc / m.nd, 6)
      |      AS sse_flat
      |  FROM pre p JOIN m ON m.event_type = p.event_type WHERE p.i < m.nd),
      |best AS (SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY sse, day) AS rk FROM cand)
      |SELECT event_type, day AS split_day, nd AS n_days,
      |  round(CAST(cs AS DOUBLE) / i, 4) AS mean_before,
      |  round(CAST(sc - cs AS DOUBLE) / (nd - i), 4) AS mean_after,
      |  CASE WHEN sse_flat = 0 THEN NULL
      |       ELSE round(1.0 - sse / sse_flat, 6) + 0.0 END AS var_explained
      |FROM best WHERE rk = 1 ORDER BY event_type""".stripMargin,
  ) { (s, dir) =>
    val daily = graft.dedup.Dedup.persistTracked(Tables.events(s, dir)
      .select(col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n")))
    val m = daily.groupBy("event_type")
      .agg(count(lit(1)).as("nd"), sum(col("n")).as("sc"),
        sum(col("n") * col("n")).as("scc"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val pre = daily
      .withColumn("cs", sum(col("n")).over(w))
      .withColumn("css", sum(col("n") * col("n")).over(w))
      .withColumn("i", row_number().over(w).cast("long"))
    val cand = pre.join(m, "event_type").filter(col("i") < col("nd"))
      .withColumn("sse",
        round((col("css") - col("cs").cast("double") * col("cs") / col("i"))
          + ((col("scc") - col("css"))
            - (col("sc") - col("cs")).cast("double") * (col("sc") - col("cs"))
              / (col("nd") - col("i"))), 6))
      .withColumn("sse_flat",
        round(col("scc").cast("double")
          - col("sc").cast("double") * col("sc") / col("nd"), 6))
    cand.withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy(col("sse"), col("day"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("split_day"), col("nd").as("n_days"),
        round(col("cs").cast("double") / col("i"), 4).as("mean_before"),
        round((col("sc") - col("cs")).cast("double") / (col("nd") - col("i")), 4)
          .as("mean_after"),
        when(col("sse_flat") === 0, lit(null).cast("double"))
          .otherwise(znorm(round(lit(1.0) - col("sse") / col("sse_flat"), 6)))
          .as("var_explained"))
      .orderBy("event_type")
  }

  // --- q328: daily trending event types -----------------------------------------
  // The "what spiked today" dashboard tile: per day, the top-3 event
  // types by count with their share of the day's traffic. One keyed
  // (day, type) aggregate; the ranking window runs over the
  // ≤|types|-row per-day table, never the event stream; day emitted
  // as an ISO string (the registry's cross-engine date convention).
  def dailyTrending: Q = Q(
    "q328_daily_trending",
    """WITH c AS (SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)),
      |      '%Y-%m-%d') AS day,
      |    event_type, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT day, CAST(sum(cnt) AS BIGINT) AS day_total FROM c GROUP BY day),
      |r AS (SELECT c.day, event_type, cnt, day_total,
      |    row_number() OVER (PARTITION BY c.day ORDER BY cnt DESC, event_type) AS rk
      |  FROM c JOIN t ON t.day = c.day)
      |SELECT day, CAST(rk AS BIGINT) AS rk, event_type,
      |  CAST(cnt AS BIGINT) AS cnt,
      |  round(CAST(cnt AS DOUBLE) / day_total, 6) AS day_share
      |FROM r WHERE rk <= 3 ORDER BY day, rk""".stripMargin,
  ) { (s, dir) =>
    val c = Tables.events(s, dir)
      .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .groupBy("day", "event_type").agg(count(lit(1)).as("cnt"))
    val t = c.groupBy("day").agg(sum(col("cnt")).as("day_total"))
    c.join(t, "day")
      .withColumn("rk", row_number().over(
        Window.partitionBy("day").orderBy(col("cnt").desc, col("event_type"))))
      .filter(col("rk") <= 3)
      .select(col("day"), col("rk").cast("long").as("rk"), col("event_type"),
        col("cnt"), round(col("cnt").cast("double") / col("day_total"), 6)
          .as("day_share"))
      .orderBy("day", "rk")
  }
}
