package graft

import org.apache.spark.sql.functions._
import graft.export.Exporters

class ExportCacheSpec extends SparkSpec {
  import spark.implicits._

  test("csv export round-trips with header") {
    val dir = java.nio.file.Files.createTempDirectory("graft-exp").toString
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Exporters.csv(df, s"$dir/out", single = true)
    val back = spark.read.option("header", "true").csv(s"$dir/out")
    assert(back.count() === 2 && back.columns.toSeq === Seq("id", "v"))
  }

  test("json export round-trips values") {
    val dir = java.nio.file.Files.createTempDirectory("graft-exp2").toString
    val df = Seq((1, 2.5), (2, 3.5)).toDF("id", "x")
    Exporters.json(df, s"$dir/out")
    val back = spark.read.json(s"$dir/out")
    assert(back.agg(sum("x")).head().getDouble(0) === 6.0)
  }

  test("reportJson writes nested structures") {
    val p = java.nio.file.Files.createTempFile("graft-rep", ".json").toString
    Exporters.reportJson(Map("score" -> 87.5, "passes" -> Map("k" -> true), "qi" -> Seq("a", "b")), p)
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(p))
    assert(txt.contains("\"score\": 87.5") && txt.contains("\"k\": true") && txt.contains("[\"a\", \"b\"]"))
  }

  test("query cache honors TTL with an injected clock") {
    var now = 0L
    val cache = new QueryCache(ttlSeconds = 300, clock = () => now)
    var builds = 0
    def build = { builds += 1; spark.range(10).toDF() }
    cache.get("k")(build); cache.get("k")(build)
    assert(builds === 1 && cache.hits === 1)
    now = 301 * 1000
    cache.get("k")(build)
    assert(builds === 2 && cache.misses === 2)
    cache.invalidate("k")
    cache.get("k")(build)
    assert(builds === 3)
  }

  test("approximate variants land near the exact answers") {
    // q56/q57 now emit the bound check themselves (`approx_ok`, pinned
    // TRUE by the DuckDB oracle); this spec asserts every group passes
    // — HLL++ at rsd=0.02 has a 3σ ≈ 6% relative error bound, and
    // approx_percentile at accuracy 1000 stays within 2% here.
    val ad = graft.queries.Scale.approxDistinct.fn(spark, "/root/testdata/sf0.001")
    assert(ad.filter(!col("approx_ok")).count() === 0)
    val ap = graft.queries.Scale.approxPercentile.fn(spark, "/root/testdata/sf0.001")
    assert(ap.filter(!col("approx_ok")).count() === 0)
  }
}
