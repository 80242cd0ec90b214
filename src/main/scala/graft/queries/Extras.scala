package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Breadth beyond the reference's own usage (SURVEY.md §2 E5/G2/H16
  * mark these "not used" in the reference): ranking functions, set
  * operations, and string functions — present so a user switching from
  * any SQL warehouse finds the standard surface.
  */
object Extras {

  val all: Seq[Q] = Seq(rankFuncs, setOps, stringFuncs, cube, movingAvg, asofJoin, pivotRevenue,
    ewmaSmoothing, revenueForecast, wowGrowth, theilSen, jackknifeRatio, acf,
    forecastBacktest)

  // --- q339: autocorrelation function (lags 1..7) ----------------------------
  // The diagnostic the forecasting family (q156 EWMA, q186/q245
  // forecasts, q258 seasonal decompose) reads FIRST: sample ACF of
  // daily revenue — r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)² — whose
  // lag-7 spike is what justifies a weekly seasonal model at all.
  // Scale shape: the corpus collapses to the calendar-sized daily
  // series (one keyed aggregate, DECIMAL-exact revenue); the 7 leads
  // are one window pass over that bounded table (the q130 rule), and
  // all 8 moment sums ride ONE aggregate (round-then-widesum:
  // products of ~1e5-scale deviations need DECIMAL(32,6), not the
  // dsum default). ACF is a ratio of cancelling subtractions → 6 dp
  // round, nullif/try_divide on the degenerate-variance corpus, and
  // signed-zero normalization in both engines.
  def acf: Q = {
    val lags = 1 to 7
    def sqlTerm(a: String, b: String) =
      s"CAST(round(($a - mu) * ($b - mu), 6) AS DECIMAL(32,6))"
    Q(
      "q339_acf",
      s"""WITH daily AS (SELECT date_trunc('day', o_orderdate) AS d,
         |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS x
         |  FROM orders GROUP BY 1),
         |m AS (SELECT CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mu
         |      FROM daily),
         |w AS (SELECT x, mu,
         |    ${lags.map(k => s"lead(x, $k) OVER (ORDER BY d) AS l$k").mkString(",\n    ")}
         |  FROM daily, m),
         |a AS (SELECT
         |    CAST(sum(${sqlTerm("x", "x")}) AS DOUBLE) AS den,
         |    ${lags.map(k =>
            s"CAST(sum(CASE WHEN l$k IS NOT NULL THEN ${sqlTerm("x", s"l$k")} END) AS DOUBLE) AS n$k")
            .mkString(",\n    ")}
         |  FROM w)
         |${lags.map(k =>
            s"SELECT CAST($k AS BIGINT) AS lag, round(n$k / nullif(den, 0), 6) + 0.0 AS acf FROM a")
            .mkString("\nUNION ALL ")}
         |ORDER BY lag""".stripMargin,
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.orders(s, dir)
        .groupBy(date_trunc("day", col("o_orderdate")).as("d"))
        .agg(dsum(col("o_totalprice")).as("x"))
      val m = daily.agg((dsum(col("x")) / count(lit(1))).as("mu"))
      // bounded table: the calendar-sized series makes the global
      // window legal (q130 rule); everything corpus-sized happened in
      // the daily aggregate above
      val w0 = Window.orderBy("d")
      val w = daily.crossJoin(broadcast(m)).select(
        Seq(col("x"), col("mu")) ++
          lags.map(k => lead(col("x"), k).over(w0).as(s"l$k")): _*)
      def wsum(c: org.apache.spark.sql.Column) =
        sum(c.cast("decimal(32,6)")).cast("double")
      def term(b: org.apache.spark.sql.Column) =
        round((col("x") - col("mu")) * (b - col("mu")), 6)
      val aggs = wsum(term(col("x"))).as("den") +:
        lags.map(k => wsum(when(col(s"l$k").isNotNull, term(col(s"l$k")))).as(s"n$k"))
      val a = w.agg(aggs.head, aggs.tail: _*)
      a.select(explode(array(lags.map(k =>
          struct(lit(k).cast("long").as("lag"), col(s"n$k").as("num"))): _*)).as("e"),
          col("den"))
        .select(col("e.lag").as("lag"),
          znorm(round(try_divide(col("e.num"), col("den")), 6)).as("acf"))
        .orderBy("lag")
    }
  }

  // --- q350: rolling-origin forecast backtest ---------------------------------
  // q186/q245 FIT models; this BACKTESTS them the way forecasting is
  // actually evaluated: walk the daily series and score each day's
  // one-step-ahead prediction from three reference models — naive
  // (yesterday), seasonal-naive (same weekday last week), drift
  // (yesterday + last week's mean daily change) — reporting MAE and
  // MAPE per model. Any candidate model must beat these three or it
  // ships nothing. Scale shape: the corpus collapses to the
  // calendar-sized exact-cents daily series; three lags ride one
  // window pass (q339 rule); all six error sums land in ONE aggregate
  // (round-then-DECIMAL-sum; naive/seasonal errors are exact 2-dp
  // dollars, drift's /7 term rounds at 6 dp first).
  def forecastBacktest: Q = {
    def sqlErr(f: String) = s"CAST(round(abs(y - ($f)) / 100.0, 6) AS DECIMAL(18,6))"
    def sqlApe(f: String) = s"CAST(round(abs(y - ($f)) / y, 9) AS DECIMAL(18,9))"
    Q(
      "q350_forecast_backtest",
      s"""WITH daily AS (SELECT date_trunc('day', o_orderdate) AS d,
         |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
         |      AS DOUBLE) AS y
         |  FROM orders GROUP BY 1),
         |w AS (SELECT y, lag(y, 1) OVER (ORDER BY d) AS l1,
         |        lag(y, 7) OVER (ORDER BY d) AS l7,
         |        lag(y, 8) OVER (ORDER BY d) AS l8
         |      FROM daily),
         |e AS (SELECT * FROM w WHERE l8 IS NOT NULL AND y > 0),
         |a AS (SELECT count(*) AS n,
         |    CAST(sum(${sqlErr("l1")}) AS DOUBLE) AS mae_naive,
         |    CAST(sum(${sqlErr("l7")}) AS DOUBLE) AS mae_snaive,
         |    CAST(sum(${sqlErr("l1 + (l1 - l8) / 7.0")}) AS DOUBLE) AS mae_drift,
         |    CAST(sum(${sqlApe("l1")}) AS DOUBLE) AS ape_naive,
         |    CAST(sum(${sqlApe("l7")}) AS DOUBLE) AS ape_snaive,
         |    CAST(sum(${sqlApe("l1 + (l1 - l8) / 7.0")}) AS DOUBLE) AS ape_drift
         |  FROM e)
         |SELECT 'drift' AS model, round(mae_drift / n, 2) AS mae,
         |  round(ape_drift / n, 6) AS mape FROM a
         |UNION ALL SELECT 'naive', round(mae_naive / n, 2), round(ape_naive / n, 6) FROM a
         |UNION ALL SELECT 'seasonal_naive', round(mae_snaive / n, 2),
         |  round(ape_snaive / n, 6) FROM a
         |ORDER BY model""".stripMargin,
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.orders(s, dir)
        .groupBy(date_trunc("day", col("o_orderdate")).as("d"))
        .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100).cast("long")
          .cast("double").as("y"))
      val w0 = Window.orderBy("d") // calendar-bounded series (q339 rule)
      val e = daily.select(col("y"),
          lag(col("y"), 1).over(w0).as("l1"),
          lag(col("y"), 7).over(w0).as("l7"),
          lag(col("y"), 8).over(w0).as("l8"))
        .filter(col("l8").isNotNull && col("y") > 0)
      def err(f: org.apache.spark.sql.Column) =
        sum(round(abs(col("y") - f) / 100.0, 6).cast("decimal(18,6)")).cast("double")
      def ape(f: org.apache.spark.sql.Column) =
        sum(round(abs(col("y") - f) / col("y"), 9).cast("decimal(18,9)")).cast("double")
      val drift = col("l1") + (col("l1") - col("l8")) / 7.0
      val a = e.agg(count(lit(1)).as("n"),
        err(col("l1")).as("mae_naive"), err(col("l7")).as("mae_snaive"),
        err(drift).as("mae_drift"),
        ape(col("l1")).as("ape_naive"), ape(col("l7")).as("ape_snaive"),
        ape(drift).as("ape_drift"))
      a.select(explode(array(
          struct(lit("drift").as("model"),
            round(col("mae_drift") / col("n"), 2).as("mae"),
            round(col("ape_drift") / col("n"), 6).as("mape")),
          struct(lit("naive").as("model"),
            round(col("mae_naive") / col("n"), 2).as("mae"),
            round(col("ape_naive") / col("n"), 6).as("mape")),
          struct(lit("seasonal_naive").as("model"),
            round(col("mae_snaive") / col("n"), 2).as("mae"),
            round(col("ape_snaive") / col("n"), 6).as("mape")))).as("r"))
        .select("r.*").orderBy("model")
    }
  }

  // --- q189: week-over-week growth ------------------------------------------
  // The simplest trend readout dashboards lead with: weekly revenue,
  // absolute delta, and growth rate vs the prior week. Revenue stays
  // DECIMAL through the lag and subtraction (delta exact); the only
  // float op is the final ratio. Window over the calendar-sized
  // weekly aggregate (both engines truncate weeks to ISO Monday).
  def wowGrowth: Q = Q(
    "q189_wow_growth",
    """WITH w AS (SELECT date_trunc('week', o_orderdate) AS week,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1),
      |l AS (SELECT week, rev, lag(rev) OVER (ORDER BY week) AS prev FROM w)
      |SELECT week, CAST(rev AS DOUBLE) AS revenue,
      |  CAST(rev - prev AS DOUBLE) AS delta,
      |  round(CAST(rev - prev AS DOUBLE) / CAST(prev AS DOUBLE), 6) AS wow_growth
      |FROM l WHERE prev IS NOT NULL ORDER BY week""".stripMargin,
  ) { (s, dir) =>
    val w = Tables.orders(s, dir)
      .groupBy(date_trunc("week", col("o_orderdate")).as("week"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    w.withColumn("prev", lag("rev", 1).over(Window.orderBy("week")))
      .filter(col("prev").isNotNull)
      .select(col("week"), col("rev").cast("double").as("revenue"),
        (col("rev") - col("prev")).cast("double").as("delta"),
        round((col("rev") - col("prev")).cast("double")
          / col("prev").cast("double"), 6).as("wow_growth"))
      .orderBy("week")
  }

  // --- q186: linear-trend revenue forecast ---------------------------------
  // The q117 regression put to work: fit daily revenue (as exact
  // integer CENTS over integer day indexes — every moment sum is
  // BIGINT, no decimal drift) and extrapolate the next 7 days. The
  // corpus reduces to one calendar-sized daily aggregate; the fit is
  // a 1-row scalar; the forecast explodes 7 rows from it. Doubles
  // appear only in the closed-form slope/intercept and the final
  // rounding — identical in both engines.
  def revenueForecast: Q = Q(
    "q186_revenue_forecast",
    """WITH daily AS (SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |lo AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
      |m AS (SELECT count(*) AS n,
      |    CAST(sum(datediff('day', d0, day)) AS BIGINT) AS sx,
      |    CAST(sum(cents) AS BIGINT) AS sy,
      |    CAST(sum(datediff('day', d0, day) * cents) AS BIGINT) AS sxy,
      |    CAST(sum(datediff('day', d0, day) * datediff('day', d0, day)) AS BIGINT) AS sxx
      |  FROM daily, lo),
      |fit AS (SELECT n, sx, sy,
      |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
      |      / (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) AS slope
      |  FROM m),
      |f2 AS (SELECT slope, (sy - slope * sx) / n AS intercept FROM fit)
      |SELECT strftime(d1 + CAST(k AS INTEGER), '%Y-%m-%d') AS day,
      |  round((intercept + slope * (datediff('day', d0, d1) + k)) / 100, 2)
      |    + 0.0 AS forecast
      |FROM f2, lo, UNNEST(range(1, 8)) AS u(k)
      |ORDER BY day""".stripMargin,
  ) { (s, dir) =>
    val daily = Tables.orders(s, dir)
      .groupBy(to_date(date_trunc("day", col("o_orderdate"))).as("day"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100).cast("long")
        .as("cents"))
    val lo = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val m = daily.crossJoin(broadcast(lo)) // 1-row scalar
      .select(datediff(col("day"), col("d0")).cast("long").as("x"), col("cents"),
        col("d0"), col("d1"))
      .groupBy("d0", "d1")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("cents").as("sy"),
        sum(col("x") * col("cents")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    // moment COMBINATION in DECIMAL(38,0) (HUGEINT in the oracle):
    // n·Σxy reaches ~6e19 at sf0.1 — past Long.MaxValue — and ANSI
    // long arithmetic threw the moment the bench's noop action stopped
    // letting count() prune the forecast column (the round-10
    // bench-honesty work surfaced this: the sf0.01 gate never grows
    // the moments that far). Both engines round the same exact integer
    // to double, so the slope stays bit-identical.
    def big(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val slope = try_divide(
      (big(col("n")) * big(col("sxy")) - big(col("sx")) * big(col("sy"))).cast("double"),
      (big(col("n")) * big(col("sxx")) - big(col("sx")) * big(col("sx"))).cast("double"))
    m.select(col("d0"), col("d1"), slope.as("slope"),
        ((col("sy") - slope * col("sx")) / col("n")).as("intercept"))
      .select(col("d0"), col("d1"), col("slope"), col("intercept"),
        explode(sequence(lit(1), lit(7))).as("k"))
      .select(date_format(expr("date_add(d1, k)"), "yyyy-MM-dd").as("day"),
        znorm(round((col("intercept")
          + col("slope") * (datediff(col("d1"), col("d0")) + col("k"))) / 100, 2))
          .as("forecast"))
      .orderBy("day")
  }

  // --- q253: Theil–Sen robust trend ------------------------------------------
  // q117/q186 fit by least squares, which one corrupted month (a
  // backfill gap, a currency bug) can bend arbitrarily; Theil–Sen —
  // the median of all pairwise slopes — has a 29% breakdown point and
  // is the robust-regression standard for monitoring series. The
  // corpus reduces FIRST to monthly revenue in exact integer cents
  // (the q186 discipline), so the pairwise slope table is
  // calendar²-sized (~84 months → ~3.5k rows) at ANY fact-table scale;
  // each slope is an integer-ratio double rounded to 6 dp, the median
  // is the q11 interpolated percentile on those bit-identical values,
  // and the OLS slope from integer moments rides along so the output
  // itself exposes robust-vs-LSQ disagreement. Intercept = median
  // residual at the fitted slope (the full Theil–Sen estimator).
  def theilSen: Q = Q(
    "q253_theil_sen",
    """WITH monthly AS (SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mx,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |lo AS (SELECT min(mx) AS m0 FROM monthly),
      |d AS (SELECT mx - m0 AS x, cents FROM monthly, lo),
      |sl AS (SELECT round((b.cents - a.cents) / CAST(b.x - a.x AS DOUBLE) / 100, 6)
      |      AS slope
      |  FROM d a JOIN d b ON a.x < b.x),
      |ts AS (SELECT quantile_cont(slope, 0.5) AS ts_slope,
      |    CAST(count(*) AS BIGINT) AS n_pairs FROM sl),
      |ic AS (SELECT quantile_cont(round(d.cents / 100.0 - ts.ts_slope * d.x, 4), 0.5)
      |      AS ts_icept, max(ts.ts_slope) AS ts_slope, max(ts.n_pairs) AS n_pairs,
      |    CAST(count(*) AS BIGINT) AS n_months
      |  FROM d CROSS JOIN ts),
      |m AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(cents) AS BIGINT) AS sy,
      |    CAST(sum(x * cents) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx FROM d)
      |SELECT ic.n_months, ic.n_pairs,
      |  round(ic.ts_slope, 6) + 0.0 AS ts_slope,
      |  round(ic.ts_icept, 4) + 0.0 AS ts_intercept,
      |  round(CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE)
      |    / (m.n * m.sxx - m.sx * m.sx) / 100, 6) + 0.0 AS ols_slope
      |FROM ic CROSS JOIN m""".stripMargin,
  ) { (s, dir) =>
    val monthly = Tables.orders(s, dir)
      .groupBy((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("mx"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100).cast("long")
        .as("cents"))
    val lo = monthly.agg(min("mx").as("m0"))
    val d = graft.dedup.Dedup.persistTracked(monthly.crossJoin(broadcast(lo))
      .select((col("mx") - col("m0")).as("x"), col("cents")))
    val sl = d.select(col("x").as("xa"), col("cents").as("ca"))
      .join(d.select(col("x").as("xb"), col("cents").as("cb")), col("xa") < col("xb"))
      .select(round((col("cb") - col("ca")) / (col("xb") - col("xa")).cast("double")
        / 100, 6).as("slope"))
    val ts = sl.agg(expr("percentile(slope, 0.5)").as("ts_slope"),
      count(lit(1)).cast("long").as("n_pairs"))
    val ic = d.crossJoin(broadcast(ts))
      .agg(expr("percentile(round(cents / 100.0 - ts_slope * x, 4), 0.5)").as("ts_icept"),
        max("ts_slope").as("ts_slope"), max("n_pairs").as("n_pairs"),
        count(lit(1)).cast("long").as("n_months"))
    val m = d.agg(count(lit(1)).as("n"), sum("x").cast("long").as("sx"),
      sum("cents").cast("long").as("sy"),
      sum(col("x") * col("cents")).cast("long").as("sxy"),
      sum(col("x") * col("x")).cast("long").as("sxx"))
    ic.crossJoin(broadcast(m))
      .select(col("n_months"), col("n_pairs"),
        znorm(round(col("ts_slope"), 6)).as("ts_slope"),
        znorm(round(col("ts_icept"), 4)).as("ts_intercept"),
        znorm(round(try_divide((col("n") * col("sxy") - col("sx") * col("sy"))
            .cast("double"),
          col("n") * col("sxx") - col("sx") * col("sx")) / 100, 6)).as("ols_slope"))
  }

  // --- q156: EWMA smoothing over the daily revenue series -----------------
  // Exponentially weighted trailing average (α = 1/2, 4 lags) — the
  // monitoring smoother that reacts faster than q64's flat moving
  // average. The α = 1/2 weights are INTEGER after scaling by 8
  // (8,4,2,1), so the weighted numerator stays exact DECIMAL through
  // lag and addition; the only float op is the final normalization by
  // the constant 15 on bit-identical doubles. The window runs over the
  // daily aggregate (calendar-sized — the corpus reduces to ≤ one row
  // per day before any window state exists), so the unpartitioned
  // ORDER BY is safe at any fact-table scale.
  def ewmaSmoothing: Q = Q(
    "q156_ewma",
    """WITH daily AS (SELECT date_trunc('day', o_orderdate) AS day,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1),
      |lagged AS (SELECT day, rev,
      |    lag(rev, 1) OVER (ORDER BY day) AS x1,
      |    lag(rev, 2) OVER (ORDER BY day) AS x2,
      |    lag(rev, 3) OVER (ORDER BY day) AS x3,
      |    row_number() OVER (ORDER BY day) AS rn
      |  FROM daily)
      |SELECT day, CAST(rev AS DOUBLE) AS revenue,
      |  round(CAST(rev * 8 + x1 * 4 + x2 * 2 + x3 AS DOUBLE) / 15.0, 2) AS ewma
      |FROM lagged WHERE rn >= 4
      |ORDER BY day""".stripMargin,
  ) { (s, dir) =>
    val daily = Tables.orders(s, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val w = Window.orderBy("day")
    daily
      .withColumn("x1", lag("rev", 1).over(w))
      .withColumn("x2", lag("rev", 2).over(w))
      .withColumn("x3", lag("rev", 3).over(w))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") >= 4)
      .select(col("day"), col("rev").cast("double").as("revenue"),
        round((col("rev") * 8 + col("x1") * 4 + col("x2") * 2 + col("x3"))
          .cast("double") / 15.0, 2).as("ewma"))
      .orderBy("day")
  }

  // --- q98: pivot (long → wide) --------------------------------------------
  // Market segment × order priority revenue matrix. The pivot values
  // are declared explicitly, so Spark skips the extra distinct-values
  // job and the plan is ONE partial-agg'd groupBy — a pivot with
  // unknown values would first scan the table to enumerate columns.
  def pivotRevenue: Q = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    def clean(p: String) = "p_" + p.toLowerCase.replaceAll("[^a-z0-9]+", "_")
    Q(
      "q98_pivot_revenue",
      s"""SELECT c_mktsegment,
         |${prios.map(p =>
            s"  CAST(sum(CASE WHEN o_orderpriority = '$p' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS ${clean(p)}")
            .mkString(",\n")}
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin,
    ) { (s, dir) =>
      val joined = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      val wide = joined.groupBy("c_mktsegment")
        .pivot("o_orderpriority", prios)
        .agg(dsum(col("o_totalprice")))
      prios.foldLeft(wide)((df, p) => df.withColumnRenamed(p, clean(p)))
        .orderBy("c_mktsegment")
    }
  }

  // --- E5: rank / dense_rank / ntile --------------------------------------
  def rankFuncs: Q = Q(
    "q58_rank_funcs",
    """SELECT c_nationkey, c_custkey,
      |  rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  ntile(4) OVER w AS quartile
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
      |ORDER BY c_nationkey, rnk, c_custkey""".stripMargin,
  ) { (s, dir) =>
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_custkey"),
        rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"))
      .orderBy("c_nationkey", "rnk", "c_custkey")
  }

  // --- G2: EXCEPT / INTERSECT ---------------------------------------------
  def setOps: Q = Q(
    "q59_set_ops",
    """WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
      |machinery AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY'),
      |building AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING')
      |SELECT 'machinery_non_buyers' AS setname, count(*) AS cnt
      |FROM (SELECT k FROM machinery EXCEPT SELECT k FROM buyers)
      |UNION ALL
      |SELECT 'machinery_and_building_buyers', count(*)
      |FROM (SELECT k FROM machinery INTERSECT SELECT k FROM building)
      |ORDER BY setname""".stripMargin,
  ) { (s, dir) =>
    val buyers = Tables.orders(s, dir).select(col("o_custkey").as("k")).distinct()
    val machinery = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey").as("k"))
    val building = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
    machinery.except(buyers).agg(count(lit(1)).as("cnt"))
      .select(lit("machinery_non_buyers").as("setname"), col("cnt"))
      .unionByName(machinery.intersect(building).agg(count(lit(1)).as("cnt"))
        .select(lit("machinery_and_building_buyers").as("setname"), col("cnt")))
      .orderBy("setname")
  }

  // --- D15: CUBE over two dimensions --------------------------------------
  def cube: Q = Q(
    "q63_cube",
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS cnt
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin,
  ) { (s, dir) =>
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"), col("cnt"))
      .orderBy("status", "priority")
  }

  // --- E5 frames: trailing moving aggregate with an explicit ROWS frame ---
  def movingAvg: Q = Q(
    "q64_moving_window",
    """SELECT user_id, event_id,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_sum,
      |  count(*) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS trailing_n
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("trailing_sum"),
        count(lit(1)).over(w).as("trailing_n"))
      .orderBy("user_id", "event_id")
  }

  // --- as-of join (union-sort-window composition; DuckDB native oracle) ---
  // For each purchase, the user's most recent prior-or-simultaneous
  // signup value.
  def asofJoin: Q = Q(
    "q65_asof_join",
    """SELECT p.event_id, p.user_id, s.value AS signup_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      |  ON p.user_id = s.user_id AND CAST(p.ts AS TIMESTAMP) >= CAST(s.ts AS TIMESTAMP)
      |ORDER BY p.event_id""".stripMargin,
  ) { (s, dir) =>
    val events = Tables.events(s, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("value").as("signup_value"))
    graft.operators.AsOfJoin.join(purchases, signups, "user_id", "ts", Seq("signup_value"))
      .select("event_id", "user_id", "signup_value")
      .orderBy("event_id")
  }

  // --- H16: string functions ----------------------------------------------
  def stringFuncs: Q = Q(
    "q60_string_funcs",
    """SELECT c_custkey,
      |  upper(c_name) AS upper_name,
      |  substring(c_name, 1, 8) AS prefix8,
      |  length(c_name) AS name_len,
      |  c_name LIKE '%1%' AS has_one,
      |  concat(c_mktsegment, '#', CAST(c_nationkey AS VARCHAR)) AS seg_nation
      |FROM customer
      |ORDER BY c_custkey""".stripMargin,
  ) { (s, dir) =>
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        upper(col("c_name")).as("upper_name"),
        substring(col("c_name"), 1, 8).as("prefix8"),
        length(col("c_name")).as("name_len"),
        col("c_name").like("%1%").as("has_one"),
        concat(col("c_mktsegment"), lit("#"), col("c_nationkey").cast("string")).as("seg_nation"))
      .orderBy("c_custkey")
  }

  // --- q285: jackknife standard error of a ratio metric -------------------------
  // Ratio metrics (revenue per unit here) have no closed-form SE; the
  // delete-one-group jackknife over nations gives one without
  // resampling the corpus: R₍ᵢ₎ = (Sy−yᵢ)/(Sx−xᵢ) from per-nation
  // DECIMAL-exact totals (the "sum minus group" trick — 25 leave-outs
  // cost ONE aggregate pass, not 25), then
  // var = (g−1)/g · Σ(R₍ᵢ₎−R̄)². Group moments run over the 25-row
  // nation table; leave-out ratios are 9-dp rounded into DECIMAL
  // before the across-group moments, squares 12-dp. The CI bounds are
  // cancelling subtractions → znorm'd.
  def jackknifeRatio: Q = Q(
    "q285_jackknife_ratio",
    """WITH g AS (SELECT n_name,
      |    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |      AS DOUBLE) AS y,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS x
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS gn,
      |    CAST(sum(CAST(round(y, 4) AS DECIMAL(18,4))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(round(x, 2) AS DECIMAL(18,2))) AS DOUBLE) AS sx FROM g),
      |lo AS (SELECT n_name, round((sy - y) / (sx - x), 9) AS ri
      |  FROM g CROSS JOIN tot),
      |mo AS (SELECT CAST(sum(CAST(ri AS DECIMAL(18,9))) AS DOUBLE)
      |    / (SELECT gn FROM tot) AS rbar FROM lo),
      |vv AS (SELECT CAST(sum(CAST(round((ri - rbar) * (ri - rbar), 12)
      |    AS DECIMAL(28,12))) AS DOUBLE) AS ss FROM lo CROSS JOIN mo)
      |SELECT gn AS n_groups, round(sy / sx, 6) AS ratio,
      |  round(sqrt((gn - 1.0) / gn * ss), 6) AS jack_se,
      |  round(sy / sx - 1.96 * sqrt((gn - 1.0) / gn * ss), 6) + 0.0 AS ci_lo,
      |  round(sy / sx + 1.96 * sqrt((gn - 1.0) / gn * ss), 6) + 0.0 AS ci_hi
      |FROM tot CROSS JOIN vv""".stripMargin,
  ) { (s, dir) =>
    val g = graft.dedup.Dedup.persistTracked(Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("y"),
        dsum(col("l_quantity")).as("x")))
    val tot = g.agg(count(lit(1)).cast("long").as("gn"),
      dsum(round(col("y"), 4), 4).as("sy"), dsum(round(col("x"), 2)).as("sx"))
    val lo = graft.dedup.Dedup.persistTracked(g.crossJoin(broadcast(tot))
      .select(col("gn"), col("sy"), col("sx"),
        round((col("sy") - col("y")) / (col("sx") - col("x")), 9).as("ri")))
    val mo = lo.groupBy("gn", "sy", "sx")
      .agg((sum(col("ri").cast("decimal(18,9)")).cast("double") / col("gn")).as("rbar"))
    val vv = lo.join(broadcast(mo), Seq("gn", "sy", "sx"))
      .groupBy("gn", "sy", "sx")
      .agg(sum(round((col("ri") - col("rbar")) * (col("ri") - col("rbar")), 12)
        .cast("decimal(28,12)")).cast("double").as("ss"))
    val se = sqrt((col("gn") - 1.0) / col("gn") * col("ss"))
    vv.select(col("gn").as("n_groups"),
      round(col("sy") / col("sx"), 6).as("ratio"),
      round(se, 6).as("jack_se"),
      znorm(round(col("sy") / col("sx") - lit(1.96) * se, 6)).as("ci_lo"),
      znorm(round(col("sy") / col("sx") + lit(1.96) * se, 6)).as("ci_hi"))
  }
}
