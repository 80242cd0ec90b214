package graft

import org.apache.spark.sql.functions._
import graft.privacy.PrivacyEngine

/** K1–K7 on a hand-computed micro-set (FIXTURES.md §4). */
class PrivacyEngineSpec extends SparkSpec {
  import spark.implicits._

  // QI group sizes: A→4 (violates k=5), B→5, C→6.
  private def df = (
    Seq.fill(4)("A").zipWithIndex.map { case (g, i) => (g, s"s${i % 2}") } ++     // 2 distinct sensitive
      Seq.fill(5)("B").zipWithIndex.map { case (g, i) => (g, s"s${i % 3}") } ++   // 3 distinct
      Seq.fill(6)("C").zipWithIndex.map { case (g, i) => (g, s"s${i % 3}") }      // 3 distinct
  ).toDF("qi", "sensitive")

  test("k-anonymity report counts violating groups and affected rows") {
    val r = PrivacyEngine.kAnonymityReport(df, Seq("qi"), k = 5).head()
    assert(r.getAs[Long]("total_groups") === 3)
    assert(r.getAs[Long]("violating_groups") === 1)
    assert(r.getAs[Long]("affected_rows") === 4)
    assert(r.getAs[Long]("min_group_size") === 4)
    assert(r.getAs[Long]("max_group_size") === 6)
    assert(!r.getAs[Boolean]("is_k_anonymous"))
  }

  test("suppression leaves every remaining group >= k") {
    val out = PrivacyEngine.suppress(df, Seq("qi"), k = 5)
    assert(out.count() === 11) // A's 4 rows dropped
    val minSize = out.groupBy("qi").count().agg(min("count")).head().getLong(0)
    assert(minSize >= 5)
  }

  test("generalization coarsens only small groups") {
    val out = PrivacyEngine.generalize(df, Seq("qi"), k = 5, "qi", lit("ANY"))
    val byQi = out.groupBy("qi").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byQi === Map("ANY" -> 4L, "B" -> 5L, "C" -> 6L))
  }

  test("generalizeOrSuppress closes the partial-hierarchy gap: output is k-anonymous") {
    // coarser that CANNOT fix group A (passes 'A' through, like
    // ageGroupCoarser passes Child/Unknown/Senior): plain generalize
    // leaves A's 4 rows sub-k; the OrSuppress variant must drop them
    val passThrough = col("qi") // identity hierarchy: nothing coarsens
    val leaky = PrivacyEngine.generalize(df, Seq("qi"), k = 5, "qi", passThrough)
    assert(leaky.groupBy("qi").count().agg(min("count")).head().getLong(0) < 5)
    val out = PrivacyEngine.generalizeOrSuppress(df, Seq("qi"), k = 5, "qi", passThrough)
    assert(out.groupBy("qi").count().agg(min("count")).head().getLong(0) >= 5)
    assert(out.count() === 11)
  }

  test("l-diversity counts distinct sensitive values per group") {
    val l = PrivacyEngine.lDiversity(df, Seq("qi"), "sensitive")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(l === Map("A" -> 2L, "B" -> 3L, "C" -> 3L))
  }

  test("t-closeness TVD is 0 for a group matching the overall distribution") {
    // Two groups with identical sensitive distributions → overall equals both → tvd 0.
    val even = Seq(("X", "a"), ("X", "b"), ("Y", "a"), ("Y", "b")).toDF("qi", "sensitive")
    val tvd = PrivacyEngine.tCloseness(even, Seq("qi"), "sensitive")
      .agg(max("tvd")).head().getDouble(0)
    assert(tvd === 0.0)
  }

  test("t-closeness TVD is 1 for a fully skewed group") {
    // X only has 'a', Y only 'b'; overall is 50/50 → tvd = 0.5 each.
    val skew = Seq(("X", "a"), ("X", "a"), ("Y", "b"), ("Y", "b")).toDF("qi", "sensitive")
    val tvds = PrivacyEngine.tCloseness(skew, Seq("qi"), "sensitive")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(tvds === Map("X" -> 0.5, "Y" -> 0.5))
  }

  test("privacy budget ledger enforces the cap") {
    val b = new PrivacyEngine.PrivacyBudget(cap = 1.0)
    assert(b.spend("q1", 0.4) && b.spend("q2", 0.5))
    assert(!b.spend("q3", 0.2)) // would exceed 1.0
    assert(b.spent === 0.9 && math.abs(b.remaining - 0.1) < 1e-9)
    assert(b.ledger.map(_._1) === Seq("q1", "q2"))
  }
}
