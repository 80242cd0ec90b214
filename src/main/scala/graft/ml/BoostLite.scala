package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** From-scratch discrete AdaBoost over decision stumps — the boosting
  * member of the engine-native trainer family (RF/iforest via trees,
  * LogRegLite linear, KMeansLite clustering, AlsLite factorization).
  * Freund & Schapire 1997, the decision-stump special case every
  * tabular-quality-gate pipeline reaches for when one linear cut
  * isn't enough and a forest is too heavy.
  *
  * Scale shape per round — ONE map-side-combined aggregation: the
  * candidate stump grid is caller-curated and bounded (the q199
  * candidates stance), each candidate's weighted error is one
  * conditional-sum column in a single wide aggregate (|candidates|+1
  * DECIMAL sums, partial aggregation everywhere), so the driver sees
  * |candidates|+1 numbers per round and picks the argmin in plain
  * Scala. The weight update is a map-only projection chained onto the
  * persisted feature frame — lineage grows by one projection per
  * round, never a join.
  *
  * Determinism: row weights are rounded to 12 dp after every
  * multiplicative update, so the per-candidate error sums are
  * associative-exact DECIMAL(18,12) folds — any partitioning,
  * bit-identical stumps. Serving (h = ±1 per stump, score = Σ α·h) is
  * straight-line arithmetic on literals, which is what lets a DuckDB
  * oracle replay the trained model exactly (the q53 trained-literal
  * pattern); training itself stays spec-gated like the other trainers.
  */
object BoostLite {

  /** One trained stump: vote +alpha when `feature <= thr` (or the
    * flipped polarity), -alpha otherwise.
    */
  final case class Stump(feature: String, thr: Double, flip: Boolean, alpha: Double)

  /** Trained ensemble plus the per-round chosen weighted error trace
    * (each entry < 0.5 by polarity choice; non-increasing is NOT
    * guaranteed round-to-round — that's boosting, not GD).
    */
  final case class BoostResult(stumps: Seq[Stump], errors: Seq[Double])

  /** h(x) ∈ {+1, -1} as a pure codegen column. NULL features vote -1
    * (the "fails the cut" side) in both polarities' base test.
    */
  private def h(c: Column, thr: Double, flip: Boolean): Column = {
    val base = when(c <= lit(thr), lit(1)).otherwise(lit(-1))
    if (flip) base * lit(-1) else base
  }

  /** Ensemble margin Σ α_t·h_t(x), rounded to 9 dp — the shared
    * train/serve scoring path (stumps ride as literals; plan = scan +
    * project).
    */
  def score(stumps: Seq[Stump]): Column =
    round(stumps.map(st => h(col(st.feature), st.thr, st.flip) * lit(st.alpha))
      .reduce(_ + _), 9)

  /** Candidate-grid ceiling for the one-pass histogram trainer: 2^16
    * pattern cells is still a bounded driver-side table, 2^17 is not
    * the contract this repo wants to creep toward.
    */
  private val HistMaxCands = 16

  /** Train `rounds` stumps. `candidates` = (feature, thresholds) grid
    * — bounded by contract; `labelCol` must be 0/1 or boolean.
    *
    * For grids of ≤ [[HistMaxCands]] candidates (every registered
    * caller) training is ONE corpus aggregate: because every stump the
    * argmin can ever pick comes from the fixed grid, the histogram of
    * per-row misclassification patterns — one bit per candidate,
    * ≤ 2^|grid| integer-count cells — is a sufficient statistic for
    * ALL rounds, and the driver replays the per-round DECIMAL(32,12)
    * weighted-error sums exactly on those cells (row weights are pure
    * functions of the chosen-stump bits, so each cell has ONE weight;
    * Σ dec₁₂(w_cell)·n_cell is the same exact rational the per-row
    * decimal sum produced, hence the same double after the cast).
    * Measured on q337: 5 round-aggregates + a persisted feature frame
    * → one count aggregate, 11.3 s → ~3 s at sf0.1 same-window.
    * Larger grids keep the per-round wide-aggregate path — a 2^n cell
    * table is only a sufficient statistic you can afford when n is
    * small. RoundTenOpsSpec pins the trained stumps (including
    * partitioning-independence); BoostHistogramSpec pins histogram ≡
    * wide-path equality on a randomized fixture.
    */
  def train(df: DataFrame, candidates: Seq[(String, Seq[Double])],
      labelCol: String, rounds: Int): BoostResult = {
    val cands = candidates.flatMap { case (f, ts) => ts.map(f -> _) }
    require(cands.nonEmpty && cands.length <= 256,
      s"BoostLite: ${cands.length} candidate stumps exceed the driver-row budget (256)")
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    if (cands.length <= HistMaxCands) trainHistogram(df, cands, labelCol, rounds)
    else trainWide(df, candidates, cands, labelCol, rounds)
  }

  /** Spark's `round(x, 12)` / `cast(x as decimal(32,12))` semantics on
    * a double, replicated bit-for-bit (BigDecimal.valueOf = the
    * Double.toString shortest representation, HALF_UP — the same
    * contract CharEntropy documents for round(x, 9)).
    */
  private def dec12(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(12, java.math.RoundingMode.HALF_UP)

  private[graft] def trainHistogram(df: DataFrame, cands: Seq[(String, Double)],
      labelCol: String, rounds: Int): BoostResult = {
    val y = col(labelCol).cast("int").cast("double") * 2 - 1
    // bit j set ⇔ candidate j's BASE polarity misclassifies the row.
    // NULL labels get their OWN cell (-1): the wide path contributes
    // them to no error sum and always applies the correct-side weight
    // factor (h ≠ NULL is NULL ⇒ both whens fall through), which a
    // flipped stump would NOT do for genuine pattern-0 rows — so the
    // two must not share a cell.
    val bits = cands.zipWithIndex.map { case ((f, thr), j) =>
      when(h(col(f).cast("double"), thr, flip = false) =!= y, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val pattern = when(y.isNull, lit(-1L)).otherwise(bits)
    val hist: Array[(Long, Long)] = df.select(pattern.as("__pat"))
      .groupBy("__pat").agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1) // fixed driver fold order (counts are exact anyway)
    val cellW = Array.fill(hist.length)(1.0)
    val stumps = Seq.newBuilder[Stump]
    val errs = Seq.newBuilder[Double]
    for (_ <- 1 to rounds) {
      // the wide path's per-candidate DECIMAL(32,12) sums, replayed
      // exactly: every row of a cell carries the same weight
      val errSums = Array.fill(cands.length)(java.math.BigDecimal.ZERO)
      var wTot = java.math.BigDecimal.ZERO
      var c = 0
      while (c < hist.length) {
        val (pat, n) = hist(c)
        val contrib = dec12(cellW(c)).multiply(java.math.BigDecimal.valueOf(n))
        wTot = wTot.add(contrib) // total includes NULL-label rows, like wsum(__w)
        if (pat != -1L) { // NULL-label cell contributes to no error sum
          var j = 0
          while (j < cands.length) {
            if ((pat & (1L << j)) != 0L) errSums(j) = errSums(j).add(contrib)
            j += 1
          }
        }
        c += 1
      }
      val wTotD = wTot.doubleValue
      var best = -1; var bestErr = Double.MaxValue; var bestFlip = false
      var j = 0
      while (j < cands.length) {
        val e = errSums(j).doubleValue / wTotD
        if (e < bestErr) { best = j; bestErr = e; bestFlip = false }
        if (1.0 - e < bestErr) { best = j; bestErr = 1.0 - e; bestFlip = true }
        j += 1
      }
      val e = math.min(math.max(bestErr, 1e-12), 1.0 - 1e-12)
      val alpha = 0.5 * math.log((1.0 - e) / e)
      val (bf, bthr) = cands(best)
      stumps += Stump(bf, bthr, bestFlip, alpha)
      errs += e
      // round(w · e^{±α}, 12) per cell — the wide path's per-row
      // chained projection, collapsed onto the pattern cells. The
      // chosen stump's MISCLASSIFICATION bit for a cell is the base
      // bit XOR the flip.
      val up = math.exp(alpha); val down = math.exp(-alpha)
      c = 0
      while (c < hist.length) {
        if (hist(c)._1 == -1L) { // NULL-label cell: always correct-side
          cellW(c) = dec12(cellW(c) * down).doubleValue
          c += 1
        } else {
          val baseMiss = (hist(c)._1 & (1L << best)) != 0L
          val miss = baseMiss ^ bestFlip
          cellW(c) = dec12(cellW(c) * (if (miss) up else down)).doubleValue
          c += 1
        }
      }
    }
    BoostResult(stumps.result(), errs.result())
  }

  /** The per-round wide-aggregate path (one conditional DECIMAL sum
    * per candidate per round) — the general trainer for grids too
    * large for a 2^|grid| histogram.
    */
  private[graft] def trainWide(df: DataFrame, candidates: Seq[(String, Seq[Double])],
      cands: Seq[(String, Double)], labelCol: String, rounds: Int): BoostResult = {
    val featNames = candidates.map(_._1).distinct
    val feats = graft.dedup.Dedup.persistTracked(
      df.select((featNames.map(c => col(c).cast("double").as(c)) :+
        (col(labelCol).cast("int").cast("double") * 2 - 1).as("__y")): _*))

    var wdf = feats.withColumn("__w", lit(1.0))
    val stumps = Seq.newBuilder[Stump]
    val errs = Seq.newBuilder[Double]
    for (_ <- 1 to rounds) {
      // one wide aggregate: per-candidate misclassified weight + total.
      // DECIMAL(32,12), not the dsum default (18,12): weights are
      // UNNORMALIZED and grow by e^alpha per misclassified round, so
      // totals reach ~n·e^(alpha·rounds) — 1e20 of headroom covers
      // ~8 rounds on a 1e6-row frame with room to spare, while the
      // 12 dp floor still resolves the shrunk side (e^-15 ≈ 3e-7).
      def wsum(c: Column) = sum(c.cast("decimal(32,12)")).cast("double")
      val aggs = cands.zipWithIndex.map { case ((f, thr), j) =>
        wsum(when(h(col(f), thr, flip = false) =!= col("__y"), col("__w"))
          .otherwise(lit(0.0))).as(s"__e$j")
      } :+ wsum(col("__w")).as("__wt")
      val row = wdf.agg(aggs.head, aggs.tail: _*).head()
      val wTot = row.getDouble(cands.length)
      // argmin over both polarities; ties to the lowest candidate index
      // and base polarity — deterministic
      var best = -1; var bestErr = Double.MaxValue; var bestFlip = false
      var j = 0
      while (j < cands.length) {
        val e = row.getDouble(j) / wTot
        if (e < bestErr) { best = j; bestErr = e; bestFlip = false }
        if (1.0 - e < bestErr) { best = j; bestErr = 1.0 - e; bestFlip = true }
        j += 1
      }
      val e = math.min(math.max(bestErr, 1e-12), 1.0 - 1e-12)
      val alpha = 0.5 * math.log((1.0 - e) / e)
      val (bf, bthr) = cands(best)
      stumps += Stump(bf, bthr, bestFlip, alpha)
      errs += e
      // multiplicative reweight, re-rounded so next round's sums stay
      // associative-exact; e^{±alpha} are two literals
      val hb = h(col(bf), bthr, bestFlip)
      wdf = wdf.withColumn("__w",
        round(col("__w") * when(hb =!= col("__y"), lit(math.exp(alpha)))
          .otherwise(lit(math.exp(-alpha))), 12))
    }
    BoostResult(stumps.result(), errs.result())
  }
}
