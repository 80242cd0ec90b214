package graft.privacy

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy auditing and enforcement (SURVEY.md §2.K; reference
  * `privacy_engine.py:41-318`), re-expressed relationally.
  *
  * The reference runs these checks in pandas on a collected frame; here
  * every check is a keyed aggregation that shuffles once on the
  * quasi-identifier columns and never collects to the driver, so the
  * same code runs at 100 TB: group cardinality is bounded by the QI
  * domain, not the row count.
  */
object PrivacyEngine {

  /** Group sizes over quasi-identifiers (k-anonymity primitive K1). */
  def groupSizes(df: DataFrame, qi: Seq[String]): DataFrame =
    df.groupBy(qi.map(col): _*).agg(count(lit(1)).as("group_size"))

  /** K1: one-row k-anonymity report (`privacy_engine.py:41-75`). */
  def kAnonymityReport(df: DataFrame, qi: Seq[String], k: Int): DataFrame =
    groupSizes(df, qi).agg(
      count(lit(1)).as("total_groups"),
      coalesce(sum(when(col("group_size") < k, 1)), lit(0)).as("violating_groups"),
      coalesce(sum(when(col("group_size") < k, col("group_size"))), lit(0)).as("affected_rows"),
      min(col("group_size")).as("min_group_size"),
      max(col("group_size")).as("max_group_size"),
      round(sum(col("group_size")).cast("double") / count(lit(1)), 2).as("avg_group_size"),
      (coalesce(sum(when(col("group_size") < k, 1)), lit(0)) === 0).as("is_k_anonymous"),
    )

  /** K2: enforcement by suppression — drop rows in QI groups smaller
    * than k (`privacy_engine.py:77-99`). Window count, no join.
    */
  def suppress(df: DataFrame, qi: Seq[String], k: Int): DataFrame = {
    val w = Window.partitionBy(qi.map(col): _*)
    df.withColumn("__gs", count(lit(1)).over(w))
      .filter(col("__gs") >= k)
      .drop("__gs")
  }

  /** K3: enforcement by generalization — replace `colName` with
    * `coarser` in QI groups smaller than k (`privacy_engine.py:101-122`,
    * which coarsens age_group labels).
    *
    * Single-pass by design (reference fidelity): when `coarser` is a
    * partial hierarchy (e.g. [[ageGroupCoarser]] passes maximal
    * buckets through unchanged), sub-k groups whose label cannot
    * coarsen further come out unmodified, so the result is NOT
    * guaranteed k-anonymous. When the guarantee matters, use
    * [[generalizeOrSuppress]], which closes the gap by suppression.
    */
  def generalize(df: DataFrame, qi: Seq[String], k: Int, colName: String, coarser: Column): DataFrame = {
    val w = Window.partitionBy(qi.map(col): _*)
    df.withColumn("__gs", count(lit(1)).over(w))
      .withColumn(colName, when(col("__gs") < k, coarser).otherwise(col(colName)))
      .drop("__gs")
  }

  /** K3 with a closed guarantee: coarsen sub-k groups, then re-measure
    * on the generalized QI and suppress rows still in sub-k groups
    * (labels with no coarser bucket, or groups that stay small even
    * merged). Two window passes over the same QI shuffle key — the
    * second reuses the first's partitioning — so the guarantee costs
    * one extra windowed count, not a join. Output is k-anonymous on
    * `qi` by construction.
    */
  def generalizeOrSuppress(df: DataFrame, qi: Seq[String], k: Int,
      colName: String, coarser: Column): DataFrame =
    suppress(generalize(df, qi, k, colName, coarser), qi, k)

  /** The reference's age-group hierarchy as the default coarser
    * (`privacy_engine.py:101-113`: adjacent adult buckets merge into
    * one 'Adult' super-bucket), transposed onto
    * [[graft.functions.Transforms.ageGroup]]'s labels.
    *
    * Reference-fidelity caveat: the reference's bare else-branch sends
    * EVERY non-adult label to its senior bucket — which would relabel
    * 'Child (0-17)' and 'Unknown' rows as seniors. As a library default
    * that is a misleading generalization, so here only the adult
    * hierarchy coarsens; Child/Unknown (already maximal buckets in this
    * hierarchy) and Senior pass through unchanged.
    */
  def ageGroupCoarser(ageGroup: Column): Column =
    when(ageGroup.isin("Young Adult (18-34)", "Adult (35-49)", "Middle-Aged (50-64)"),
      lit("Adult (18-64)"))
      .otherwise(ageGroup)

  /** K4: l-diversity — distinct sensitive values per QI group
    * (`privacy_engine.py:124-166`). Exact countDistinct; at 100 TB
    * swap for approx_count_distinct per documented scale variant.
    */
  def lDiversity(df: DataFrame, qi: Seq[String], sensitive: String): DataFrame =
    df.groupBy(qi.map(col): _*)
      .agg(countDistinct(col(sensitive)).as("l_count"), count(lit(1)).as("group_size"))

  /** K5: t-closeness — total-variation distance between each QI group's
    * sensitive-value distribution and the overall distribution
    * (`privacy_engine.py:168-237`, "simplified EMD").
    *
    * Relational rewrite (SURVEY §2 D14): cell counts ⨝ group totals ⨯
    * overall distribution, summing |p_group − p_overall| / 2 — missing
    * (group, value) cells contribute p_overall via the left join's
    * coalesce(0). The group × sensitive-domain cross join is bounded by
    * category cardinality, not data size.
    */
  def tCloseness(df: DataFrame, qi: Seq[String], sensitive: String): DataFrame = {
    val total   = df.agg(count(lit(1)).as("n_total"))
    val overall = df.groupBy(col(sensitive)).agg(count(lit(1)).as("s_cnt"))
      .crossJoin(broadcast(total))
      .select(col(sensitive), (col("s_cnt").cast("double") / col("n_total")).as("p_overall"))
    val groups  = df.groupBy(qi.map(col): _*).agg(count(lit(1)).as("g_tot"))
    val cells   = df.groupBy((qi :+ sensitive).map(col): _*).agg(count(lit(1)).as("c_cnt"))
    groups
      .crossJoin(broadcast(overall))
      .join(cells, qi :+ sensitive, "left_outer")
      .withColumn("p_group", coalesce(col("c_cnt"), lit(0L)).cast("double") / col("g_tot"))
      .groupBy(qi.map(col): _*)
      .agg(round(sum(abs(col("p_group") - col("p_overall"))) / 2.0, 4).as("tvd"))
  }

  /** K6: comprehensive audit — one row, 0–100 score = mean of pass
    * flags × 100 (`privacy_engine.py:239-289`).
    */
  def auditScore(df: DataFrame, qi: Seq[String], sensitive: String,
      k: Int = 5, l: Int = 3, t: Double = 0.2): DataFrame = {
    val kPass = kAnonymityReport(df, qi, k).select(col("is_k_anonymous").as("k_pass"))
    val lPass = lDiversity(df, qi, sensitive)
      .agg((coalesce(sum(when(col("l_count") < l, 1)), lit(0)) === 0).as("l_pass"))
    val tPass = tCloseness(df, qi, sensitive)
      .agg((coalesce(sum(when(col("tvd") > t, 1)), lit(0)) === 0).as("t_pass"))
    kPass.crossJoin(lPass).crossJoin(tPass)
      .withColumn("privacy_score", round(
        (col("k_pass").cast("int") + col("l_pass").cast("int") + col("t_pass").cast("int"))
          * lit(100.0) / 3.0, 2))
  }

  /** K7: differential-privacy budget ledger (`privacy_engine.py:291-318`).
    * Driver-side state by design — it tracks queries, not data.
    */
  final class PrivacyBudget(val cap: Double = 1.0) {
    private var entries: Vector[(String, Double)] = Vector.empty
    def spend(query: String, epsilon: Double): Boolean = synchronized {
      if (spent + epsilon > cap) false
      else { entries :+= (query, epsilon); true }
    }
    def spent: Double = entries.map(_._2).sum
    def remaining: Double = math.max(0.0, cap - spent)
    def ledger: Seq[(String, Double)] = entries
  }
}
