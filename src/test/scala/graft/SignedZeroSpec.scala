package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Degenerate-corpus gate for the slope/correlation/difference family.
  *
  * Round 7's one red row (q192) was a signed-zero divergence: on a
  * corpus with a CONSTANT vocabulary the regression numerator
  * n·Σxy − Σx·Σy cancels to a tiny residual that rounds to -0.0 in one
  * engine and +0.0 in the other — invisible to `==` (IEEE says they're
  * equal) but fatal to the driver's hash. The fix is the `znorm`
  * convention (`+ 0.0` after the final round, in BOTH engines); this
  * spec pins it by running every cancel-capable query against corpora
  * engineered to make the numerators vanish, then bit-comparing the
  * outputs: no double column may contain raw bits 0x8000000000000000L.
  */
class SignedZeroSpec extends SparkSpec {
  import spark.implicits._

  private val NegZeroBits = java.lang.Double.doubleToRawLongBits(-0.0)

  /** Assert no double column of `df` carries a -0.0 bit pattern. */
  private def assertNoNegZero(name: String, df: DataFrame): Unit = {
    val rows = df.collect()
    assert(rows.nonEmpty, s"$name: degenerate corpus produced no rows")
    val doubleCols = df.schema.fields.filter(_.dataType == DoubleType).map(_.name)
    for (r <- rows; c <- doubleCols; if !r.isNullAt(r.fieldIndex(c))) {
      val v = r.getDouble(r.fieldIndex(c))
      assert(java.lang.Double.doubleToRawLongBits(v) != NegZeroBits,
        s"$name.$c emitted -0.0 (value renders as $v) — missing znorm")
    }
  }

  /** One fixture dir holding every table the family reads, each shaped
    * so the relevant statistic cancels to zero:
    *  - documents: every doc is the SAME text → constant vocabulary
    *    (q192 β numerator), uniform term frequencies (q162 slope),
    *    constant quality/entropy scores (q198 rank variance).
    *  - embeddings: ONE label (q200 H(label) = -0.0 exposure) and dims
    *    whose pairwise products cancel: dim1 = ±1 alternating,
    *    dim2 = ∓1 (correlations hit exactly ±1/0 boundaries).
    *  - events: one type, identical daily counts → q117 slope 0.
    *  - orders: identical daily revenue → q186 flat forecast.
    */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_negzero").toString
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    (1L to 16L).map(i => (i, text, "en", s"s${i % 2}"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$d/documents.parquet")
    // 8 dims: dims 1/2 alternate ±1 in lockstep (perfectly
    // anti-correlated), dims 3..8 constant zero (moment sums cancel;
    // q175 guards NULL-variance dims, q200 sees a one-sided bucket)
    (1L to 16L).map { i =>
      val s = if (i % 2 == 0) 1.0f else -1.0f
      (i, Array(s, -s, 0f, 0f, 0f, 0f, 0f, 0f), 1)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    (1L to 40L).map { i =>
      val day = (i - 1) % 10
      (i, java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"),
        i % 4, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    (1L to 40L).map { i =>
      val day = (i - 1) % 10
      (i, i % 4, "F", 100.0, java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 00:00:00"), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")
    d
  }

  test("q192 heaps growth: constant vocabulary yields +0.0 beta, never -0.0") {
    val out = queries.Corpus.heapsGrowth.fn(spark, dir)
    assertNoNegZero("q192", out)
    // the degenerate corpus really does cancel: β must be exactly zero
    assert(out.select("beta").as[Double].collect().forall(_ == 0.0))
  }

  test("q162 zipf slope: uniform term frequencies cancel the slope") {
    val out = queries.Corpus.zipfSlope.fn(spark, dir)
    assertNoNegZero("q162", out)
    assert(out.select("slope").as[Double].head() == 0.0)
  }

  test("q117 trend slope: identical daily counts cancel slope") {
    val out = queries.Events.trendSlope.fn(spark, dir)
    assertNoNegZero("q117", out)
    assert(out.select("slope").as[Double].head() == 0.0)
  }

  test("q186 forecast: flat revenue forecasts without -0.0") {
    assertNoNegZero("q186", queries.Extras.revenueForecast.fn(spark, dir))
  }

  test("q175 dim correlation: cancelling moments emit no -0.0") {
    assertNoNegZero("q175", queries.Embeddings.dimCorrelation.fn(spark, dir))
  }

  test("q193 centroid drift: degenerate sources emit no -0.0") {
    assertNoNegZero("q193", queries.Embeddings.sourceCentroidDrift.fn(spark, dir))
  }

  test("q198 scorer agreement: constant scores emit no -0.0") {
    assertNoNegZero("q198", queries.Text.scorerAgreement.fn(spark, dir))
  }

  test("q200 info gain: single label makes H(label) -0.0 without znorm") {
    val out = queries.Ml.infoGain.fn(spark, dir)
    assertNoNegZero("q200", out)
    // one label → H(label) = 0 and every gain = 0: the exact -0.0 trap
    assert(out.select("h_label").as[Double].collect().forall(_ == 0.0))
    assert(out.select("info_gain").as[Double].collect().forall(_ == 0.0))
  }

  test("znorm canonicalizes -0.0 and preserves nonzero values") {
    val r = Seq((-0.0, 1.5, -2.25)).toDF("a", "b", "c")
      .select(queries.znorm(col("a")).as("a"), queries.znorm(col("b")).as("b"),
        queries.znorm(col("c")).as("c")).head()
    assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) == 0L)
    assert(r.getDouble(1) == 1.5 && r.getDouble(2) == -2.25)
  }
}
