package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomFilters

/** Bloom build/probe: no false negatives, bounded false positives. */
class BloomFiltersSpec extends SparkSpec {
  import spark.implicits._

  test("every built value probes true (no false negatives)") {
    val vals = (1 to 2000).map(i => s"item-$i").toDF("v")
    val bf = BloomFilters.build(vals, col("v"), expectedItems = 2000L, numBits = 40000L)
    assert(vals.filter(!BloomFilters.mightContain(bf, col("v"))).isEmpty)
  }

  test("false-positive rate stays near the configured bound") {
    val inSet  = (1 to 2000).map(i => s"item-$i").toDF("v")
    val outSet = (1 to 20000).map(i => s"other-$i").toDF("v")
    val bf = BloomFilters.build(inSet, col("v"), expectedItems = 2000L, numBits = 40000L)
    // 20 bits/item ≈ 0.05% fpp at optimal k; allow a generous 2%
    val fp = outSet.filter(BloomFilters.mightContain(bf, col("v"))).count()
    assert(fp <= 400, s"false positives: $fp / 20000")
  }

  test("probe is a codegen'd predicate, not a UDF") {
    val vals = Seq("a", "b").toDF("v")
    val bf = BloomFilters.build(vals, col("v"), 10L, 1000L)
    val p = vals.filter(BloomFilters.mightContain(bf, col("v")))
      .queryExecution.executedPlan
    p.toString // force analysis
    assert(!p.toString.contains("BatchEvalPython") && !p.toString.toLowerCase.contains("udf"))
  }
}
