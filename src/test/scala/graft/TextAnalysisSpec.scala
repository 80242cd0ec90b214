package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token and stopword counting") {
    val df = Seq("the cat sat on the mat").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.stopwordCount(TextAnalysis.tokens(col("text"))).as("s"),
      TextAnalysis.avgTokenLen(col("text")).as("avg")).head()
    assert(r.getInt(0) === 6)
    assert(r.getInt(1) === 2) // 'the' twice
    assert(math.abs(r.getDouble(2) - 17.0 / 6) < 1e-12)
  }

  test("quality score bounds and monotonicity in stopword density") {
    val df = Seq(
      "alpha beta gamma delta epsilon zeta",  // no stopwords
      "the a of and to in is it the a of and" // all stopwords
    ).toDF("text").select(TextAnalysis.qualityScore(col("text")).as("q"))
    val Array(q1, q2) = df.collect().map(_.getDouble(0))
    assert(q1 > q2)
    assert(q1 <= 1.0 && q2 >= 0.0)
  }

  test("lzPhraseCount: empty text counts 0 phrases (DuckDB string_split parity)") {
    // Spark's split("", "") yields [""] while DuckDB's string_split
    // yields [] — the unguarded fold counted 1 phrase on an empty doc.
    val r = Seq(("", "ab"), ("abcabc", "x")).toDF("t", "u")
      .select(TextAnalysis.lzPhraseCount(col("t"), 240).as("n")).collect()
    // "abcabc" parses a|b|c|ab|c(partial) = 5 phrases
    assert(r.map(_.getInt(0)).toSeq === Seq(0, 5))
  }

  test("lzPhraseCount: null text stays null") {
    val r = Seq(Tuple1(Option.empty[String])).toDF("t")
      .select(TextAnalysis.lzPhraseCount(col("t"), 240).as("n")).head()
    assert(r.isNullAt(0))
  }

  test("langId picks the marker-dominant language with fixed tie-break") {
    val cases = Seq(
      ("the cat and the dog is here", "en"),
      ("el gato y la casa de madrid", "es"),
      ("der hund und die katze das haus", "de"),
      ("le chat et les maisons du paris", "fr"),
      ("xyzzy plugh quux", "und"),
    ).toDF("text", "expected")
      .withColumn("pred", TextAnalysis.langId(col("text")))
    assert(cases.filter(col("pred") =!= col("expected")).count() === 0)
  }
}
