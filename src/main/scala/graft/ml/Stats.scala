package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed statistics primitives: drift detection, ranking
  * metrics, independence diagnostics, and trend fitting as reusable
  * library calls (the q107/q116/q117/q119 engines). Common design
  * rules: aggregate-first (windows run over bounded bin/group tables,
  * never raw rows), scalars ride broadcast one-row joins, and every
  * order-sensitive reduction is exact-integer or DECIMAL so results
  * are reproducible at any partitioning.
  */
object Stats {

  /** Equi-width bin index over broadcast (lo, hi) scalar columns,
    * top edge folded into the last bin. A degenerate sample (every
    * value equal → zero width, where the division would yield NaN and
    * a null bin) collapses to bin 0 instead of crashing.
    */
  private def binIndex(v: org.apache.spark.sql.Column, bins: Int): org.apache.spark.sql.Column =
    when(col("hi") === col("lo"), lit(0L))
      .otherwise(least(floor((v - col("lo")) / ((col("hi") - col("lo")) / bins.toDouble)),
        lit((bins - 1).toDouble)).cast("long"))

  /** Two-sample Kolmogorov-Smirnov sup-distance over a binned ECDF.
    * `flagCol` must be 1 for sample A rows, 0 for sample B. Exact KS
    * needs a global sort of every distinct value — one fat partition
    * at warehouse scale; `bins` equi-width buckets bound the
    * cumulative window at `bins` rows and the resolution loss at one
    * bin width per ECDF step. Returns one row (n_a, n_b, ks_stat).
    */
  def ksBinned(src: DataFrame, valueCol: String, flagCol: String, bins: Int = 200): DataFrame = {
    val v = col(valueCol)
    val bounds = src.agg(min(v).as("lo"), max(v).as("hi"))
    val binned = src.crossJoin(broadcast(bounds))
      .groupBy(binIndex(v, bins).as("bin"))
      .agg(sum(col(flagCol)).as("ca"), sum(lit(1) - col(flagCol)).as("cb"))
    val tot = binned.agg(sum("ca").as("n_a"), sum("cb").as("n_b"))
    val w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned.select(sum(col("ca")).over(w).as("cum_a"), sum(col("cb")).over(w).as("cum_b"))
    cum.crossJoin(broadcast(tot))
      .groupBy("n_a", "n_b")
      .agg(round(max(abs(col("cum_a").cast("double") / col("n_a")
        - col("cum_b").cast("double") / col("n_b"))), 6).as("ks_stat"))
  }

  /** Exact Mann-Whitney AUC without a global sort: the two-level
    * distributed prefix sum. Scores bucket into `bins` coarse bins;
    * the below-count for each distinct score = coarse-bin prefix (a
    * ≤ `bins`-row window) + within-bin prefix (a partitioned window).
    * 2U = Σ ca·(2·below + cb) keeps every intermediate an exact
    * integer — the one double division happens at the end. `labelCol`
    * is 1 for positives. Returns one row (n_pos, n_neg, auc),
    * tie-corrected (average-rank equivalent).
    */
  def aucBinned(src: DataFrame, scoreCol: String, labelCol: String, bins: Int = 256): DataFrame = {
    val v = col(scoreCol)
    val bounds = src.agg(min(v).as("lo"), max(v).as("hi"))
    val pv = src.crossJoin(broadcast(bounds))
      .groupBy(binIndex(v, bins).as("g"), v.as("v"))
      .agg(sum(col(labelCol)).as("ca"), sum(lit(1) - col(labelCol)).as("cb"))
    val wBin = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, -1)
    val binpfx = pv.groupBy("g").agg(sum("cb").as("cbg"))
      .select(col("g"), coalesce(sum(col("cbg")).over(wBin), lit(0L)).as("cb_bins_below"))
    val wFine = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val fine = pv.withColumn("cb_in_bin_below", coalesce(sum(col("cb")).over(wFine), lit(0L)))
    fine.join(broadcast(binpfx), "g")
      .agg(sum("ca").as("n_pos"), sum("cb").as("n_neg"),
        sum(col("ca") * (lit(2) * (col("cb_bins_below") + col("cb_in_bin_below")) + col("cb")))
          .as("u2"))
      .select(col("n_pos"), col("n_neg"),
        round(col("u2").cast("double") / (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Chi-square contingency CELLS for an independence diagnostic
    * between two categorical columns: observed, expected, and per-cell
    * χ² contribution. Cells — not the summed statistic — keep every
    * output a deterministic function of exact integers; sum the cells
    * where accumulation order is under control. Marginals are two tiny
    * broadcast aggregates off the shared contingency base.
    */
  def chiSquareCells(src: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val obs = src.groupBy(col(rowCol), col(colCol)).agg(count(lit(1)).as("o"))
    val rowt = obs.groupBy(rowCol).agg(sum("o").as("rt"))
    val colt = obs.groupBy(colCol).agg(sum("o").as("ct"))
    val tot = obs.agg(sum("o").as("t"))
    val expected = col("rt").cast("double") * col("ct") / col("t")
    obs.join(broadcast(rowt), rowCol).join(broadcast(colt), colCol).crossJoin(broadcast(tot))
      .select(col(rowCol), col(colCol), col("o"),
        round(expected, 6).as("expected"),
        round(pow(col("o") - expected, 2) / expected, 6).as("cell_chi2"))
  }

  /** Per-group least-squares line over integer (x, y) pairs via the
    * four moment sums (Σx, Σy, Σxy, Σx²) — all integer arithmetic, so
    * the aggregation is associative-exact at any partitioning; the
    * only doubles are the final two divisions. One keyed aggregate,
    * no per-group iteration, no solver. Returns
    * (groupCol, n, slope, intercept) with slope/intercept rounded 6dp.
    */
  def trendSlope(pairs: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val m = pairs
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        sum(col(xCol)).as("sx"), sum(col(yCol)).as("sy"),
        sum(col(xCol) * col(yCol)).as("sxy"), sum(col(xCol) * col(xCol)).as("sxx"))
    val slope = try_divide((col("n") * col("sxy") - col("sx") * col("sy")).cast("double"),
      col("n") * col("sxx") - col("sx") * col("sx"))
    m.select(col(groupCol), col("n"),
      graft.queries.znorm(round(slope, 6)).as("slope"),
      graft.queries.znorm(round((col("sy") - slope * col("sx")) / col("n"), 6)).as("intercept"))
  }

  /** Kaplan-Meier survival curve under right-censoring. Input: one row
    * per subject with an integer duration `tCol` and `endedCol` = 1 if
    * the terminal event was observed, 0 if censored. Aggregate-first:
    * subjects collapse to per-duration (events, total) counts and only
    * that bounded table (≤ #distinct durations rows) sees the
    * unpartitioned windows — at-risk as a reverse cumulative count,
    * the survival product as exp of a cumulative DECIMAL(18,9) sum of
    * 9dp-rounded ln(1 − d/n) terms (associative-exact, the
    * never-sum-raw-doubles rule). A final d = n step zeroes survival
    * through the flag rather than evaluating ln(0). Returns
    * (t, n_risk, d_ended, surv) ordered by t.
    */
  def kaplanMeier(subjects: DataFrame, tCol: String, endedCol: String): DataFrame = {
    val byt = subjects.groupBy(col(tCol).as("t"))
      .agg(count(lit(1)).as("n_all"), sum(col(endedCol)).as("d"))
    val wAll = Window.orderBy("t")
    val wPrev = wAll.rowsBetween(Window.unboundedPreceding, -1)
    val wCum = wAll.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byt
      .withColumn("n_risk",
        sum(col("n_all")).over(wAll.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          - coalesce(sum(col("n_all")).over(wPrev), lit(0L)))
      .withColumn("term",
        when(col("d") < col("n_risk"), round(log(lit(1) - col("d") / col("n_risk")), 9)))
      .withColumn("dead", when(col("d") >= col("n_risk"), 1).otherwise(0))
      .select(col("t"), col("n_risk"), col("d").as("d_ended"),
        when(max(col("dead")).over(wCum) === 1, lit(0.0))
          .otherwise(round(exp(coalesce(
            sum(col("term").cast("decimal(18,9)")).over(wCum).cast("double"), lit(0))), 6))
          .as("surv"))
  }

  /** CUPED covariate adjustment (Deng et al., WSDM'13): one-row
    * (n, xbar, theta) with θ = cov(x,y)/var(x) from pooled DECIMAL
    * moment sums over the (pre-metric x, experiment-metric y) table.
    * Broadcast it and adjust per row as y − θ·(x − x̄): variance the
    * pre-period already explains cancels, the adjusted grand mean is
    * exactly the raw grand mean (Σ(x − x̄) = 0). x and y must carry
    * ≤ 2dp (sums are DECIMAL(18,2) per the dsum contract).
    */
  def cupedTheta(users: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol); val y = col(yCol)
    users.agg(count(lit(1)).as("n"),
      sum(x.cast("decimal(18,2)")).cast("double").as("sx"),
      sum(y.cast("decimal(18,2)")).cast("double").as("sy"),
      sum((x * y).cast("decimal(28,4)")).cast("double").as("sxy"),
      sum((x * x).cast("decimal(28,4)")).cast("double").as("sxx"))
      .select(col("n"), (col("sx") / col("n")).as("xbar"),
        ((col("sxy") - col("sx") * col("sy") / col("n"))
          / (col("sxx") - col("sx") * col("sx") / col("n"))).as("theta"))
  }
}
