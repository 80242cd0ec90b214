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

  /** Train `rounds` stumps. `candidates` = (feature, thresholds) grid
    * — bounded by contract; `labelCol` must be 0/1 or boolean.
    */
  def train(df: DataFrame, candidates: Seq[(String, Seq[Double])],
      labelCol: String, rounds: Int): BoostResult = {
    val cands = candidates.flatMap { case (f, ts) => ts.map(f -> _) }
    require(cands.nonEmpty && cands.length <= 256,
      s"BoostLite: ${cands.length} candidate stumps exceed the driver-row budget (256)")
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
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
