package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-9 warehouse/curation additions on
  * crafted fixtures — the math/behavior itself, complementing the
  * cross-engine oracle: q311 must DROP a fully-retracted group, q313
  * must report zero residual PII after its own redaction, q315's
  * banding curve must be monotone (more bands ⇒ lower implied
  * threshold ⇒ higher expected recall).
  */
class RoundNineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q311: a fully-retracted group drops from the maintained view") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_ivm").toString
    Seq((1, 10), (2, 20)).toDF("c_custkey", "c_nationkey")
      .write.parquet(s"$dir/customer.parquet")
    // nation 10's orders are ALL in the delete batch (o_orderkey % 97
    // == 0); nation 20 keeps two of three
    Seq((97L, 1, 100.0), (194L, 1, 50.0),
      (1L, 2, 10.0), (2L, 2, 20.0), (291L, 2, 30.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val out = queries.Etl.ivmRetract.fn(spark, dir).collect()
    assert(out.length === 1, "fully-retracted nation must drop from the view")
    assert(out.head.getInt(0) === 20)
    assert(out.head.getLong(1) === 2L)
    assert(out.head.getDouble(2) === 30.0)
  }

  test("q313: the audit reports planted PII before and ZERO residual after") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_pii").toString
    (1L to 6L).map(i => (i, "alpha beta gamma", "en", s"s${i % 2}"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val rows = queries.Curation.redactionAudit.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("email", "phone"))
    for ((p, r) <- rows) {
      assert(r.getLong(r.fieldIndex("hits_before")) >= 6L, s"$p before")
      assert(r.getLong(r.fieldIndex("hits_after")) === 0L, s"$p residual")
    }
  }

  test("q315: more bands lowers the implied threshold and raises expected recall") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_lsh").toString
    // two near-dup pairs (~0.6 Jaccard) + unrelated docs
    val a = (1 to 12).map(i => s"tok$i").mkString(" ")
    val a2 = ((1 to 9).map(i => s"tok$i") ++ Seq("x1", "x2", "x3")).mkString(" ")
    val b = (20 to 32).map(i => s"tok$i").mkString(" ")
    val b2 = ((20 to 29).map(i => s"tok$i") ++ Seq("y1", "y2", "y3")).mkString(" ")
    val c = (50 to 70).map(i => s"tok$i").mkString(" ")
    Seq((1L, a), (2L, a2), (3L, b), (4L, b2), (5L, c))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val out = queries.Text.lshBandPlanner.fn(spark, dir).collect()
      .sortBy(_.getLong(0))
    assert(out.length === 5)
    val thresholds = out.map(_.getDouble(out.head.fieldIndex("implied_threshold")))
    assert(thresholds.sliding(2).forall { case Array(x, y) => y < x },
      s"implied threshold must fall with bands: ${thresholds.toSeq}")
    val recalls = out.map(_.getDouble(out.head.fieldIndex("exp_recall_at_05")))
    assert(recalls.sliding(2).forall { case Array(x, y) => y >= x },
      s"expected recall must not fall with bands: ${recalls.toSeq}")
    graft.dedup.Dedup.clearCaches(spark)
  }
}
