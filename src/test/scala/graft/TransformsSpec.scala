package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.functions.Transforms

/** H1–H4/B7 scalar transforms (reference `scripts/etl.py:35-72`). */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  test("age is calendar-exact and birthday-aware") {
    // asOf 2026-08-12: a 2000-08-12 DOB just turned 26; 2000-08-13 is still 25.
    val df = Seq(
      ("2000-08-12", 26), ("2000-08-13", 25), ("2000-08-11", 26),
      ("2026-08-01", 0), ("1936-02-29", 90),
    ).toDF("dob", "expected")
      .withColumn("age", Transforms.age(col("dob").cast("date"), lit("2026-08-12").cast("date")))
    assert(df.filter(col("age") =!= col("expected")).count() === 0)
    // Feb-29 DOB on Feb-28 of a non-leap year: birthday not reached yet
    // ((2,28) < (2,29) in the reference's tuple compare) — the
    // months_between formulation got this wrong
    val leap = Seq(("1996-02-29", 29), ("1996-02-28", 30)).toDF("dob", "expected")
      .withColumn("age", Transforms.age(col("dob").cast("date"), lit("2026-02-28").cast("date")))
    assert(leap.filter(col("age") =!= col("expected")).count() === 0)
  }

  test("ageGroup buckets match reference labels at boundaries") {
    val cases = Seq(
      (0, "Child (0-17)"), (17, "Child (0-17)"), (18, "Young Adult (18-34)"),
      (34, "Young Adult (18-34)"), (35, "Adult (35-49)"), (49, "Adult (35-49)"),
      (50, "Middle-Aged (50-64)"), (64, "Middle-Aged (50-64)"), (65, "Senior (65+)"),
      (90, "Senior (65+)"),
    ).toDF("age", "expected")
      .withColumn("grp", Transforms.ageGroup(col("age")))
    assert(cases.filter(col("grp") =!= col("expected")).count() === 0)
    val nullCase = Seq(Option.empty[Int]).toDF("age")
      .select(Transforms.ageGroup(col("age"))).head().getString(0)
    assert(nullCase === "Unknown")
  }

  test("anonymize is a 64-hex sha256 digest") {
    val h = Seq("John Smith").toDF("name")
      .select(Transforms.anonymize(col("name"))).head().getString(0)
    assert(h.length === 64 && h.matches("[0-9a-f]+"))
    // deterministic
    val h2 = Seq("John Smith").toDF("name")
      .select(Transforms.anonymize(col("name"))).head().getString(0)
    assert(h === h2)
  }

  test("laplace noise clamps at zero and has ~1/epsilon scale") {
    val eps = 0.1
    val df = spark.range(20000).select(lit(1000.0).as("v"), col("id"))
      .select(Transforms.laplaceNoised(col("v"), eps, seed = 7).as("noised"), col("v"))
    val stats = df.agg(
      min("noised").as("mn"),
      avg(abs(col("noised") - col("v"))).as("mean_abs")).head()
    assert(stats.getDouble(0) >= 0.0)
    // E|Laplace(1/eps)| = 1/eps = 10; loose 3-sigma-ish band
    assert(stats.getDouble(1) > 7 && stats.getDouble(1) < 13)
  }

  test("keyed laplace noise is a pure function of (key, salt)") {
    val a = spark.range(100).select(col("id"),
      Transforms.laplaceNoisedKeyed(lit(500.0), col("id"), 0.1).as("n"))
    val b = spark.range(100).repartition(7).select(col("id"),
      Transforms.laplaceNoisedKeyed(lit(500.0), col("id"), 0.1).as("n"))
    assert(a.join(b, "id").filter(a("n") =!= b("n")).count() === 0)
  }

  test("validRecord is the conjunction of not-null checks") {
    val df = Seq(
      (Some(1), Some("a"), true),
      (None, Some("b"), false),
      (Some(3), None, false),
    ).toDF("k", "v", "expected")
      .withColumn("valid", Transforms.validRecord(Seq(col("k"), col("v"))))
    assert(df.filter(col("valid") =!= col("expected")).count() === 0)
  }

  test("CharEntropy matches hand-computed fixtures, code points, and the aggregate form") {
    import graft.functions.CharEntropy
    import java.math.{BigDecimal => JBD, RoundingMode}
    def r9(d: Double): Double = JBD.valueOf(d).setScale(9, RoundingMode.HALF_UP).doubleValue

    // "aab": p(a)=2/3, p(b)=1/3; terms rounded at 9 dp then summed AS
    // DECIMALS (double addition of the rounded terms is 1 ulp off —
    // exactly the error the decimal discipline exists to kill)
    val negAab = JBD.valueOf(r9(2.0 / 3 * math.log(2.0 / 3)))
      .add(JBD.valueOf(r9(1.0 / 3 * math.log(1.0 / 3)))).doubleValue
    val rows = Seq("aab", "aaaa", "", "𝄞a").toDF("text")
      .select(col("text"), CharEntropy(col("text")).as("e"))
      .select(col("text"), col("e.n_chars"), col("e.distinct_chars"), col("e.negent"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows("aab") === ((3L, 2L, negAab)))
    assert(rows("aaaa") === ((4L, 1L, 0.0))) // single symbol: p=1, ln 1 = 0
    assert(rows("") === ((0L, 0L, 0.0)))
    // the clef is one supplementary code point (a surrogate PAIR in
    // UTF-16) — counted once, like DuckDB's len()
    assert(rows("𝄞a")._1 === 2L)
    assert(rows("𝄞a")._2 === 2L)

    // bit-equality with the explode + DECIMAL-sum formulation the
    // oracle uses, over real corpus docs
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    val viaExpr = docs.select(col("doc_id"), CharEntropy(col("text")).getField("negent").as("x"))
    val viaAgg = docs
      .select(col("doc_id"), explode(sequence(lit(1), length(col("text")))).as("i"), col("text"))
      .select(col("doc_id"), expr("substring(text, i, 1)").as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .groupBy("doc_id")
      .agg(graft.queries.dsum(
        round((col("c") / col("n")) * log(col("c") / col("n")), 9), 9).as("x"))
    val joined = viaExpr.as("a").join(viaAgg.as("b"), "doc_id")
      .filter(col("a.x") =!= col("b.x"))
    assert(joined.count() === 0)
  }
}
