package graft

import org.apache.spark.sql.functions._

/** Pins the round-12 compiled text expressions bit-equal to the
  * interpreted higher-order-function formulations they replaced:
  *  - graft.functions.WordNGrams vs
  *    `transform(sequence(1, size-n+1), i -> concat_ws(" ", slice))`
  *    (+ array_distinct for the shingle variant),
  *  - graft.functions.AdjacentPairs vs the struct-pair transform,
  *  - graft.functions.LzPhraseCount vs the delimited-string LZ78 fold
  *    (including the '|'-in-text containment quirk the oracle
  *    replays).
  * Corpora cover empty tokens from double spaces, unicode, '|'
  * characters, docs shorter than the window, and a seeded random mix.
  */
class CodegenTextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus: Seq[String] = {
    val rnd = new scala.util.Random(20513)
    val vocab = Vector("a", "b", "ab", "", "λ", "日本", "the", "x|y", "|")
    val random = (1 to 150).map { _ =>
      (1 to (1 + rnd.nextInt(25))).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    }
    Seq("a b c d e", "x x x", "a  b  c", "one", "a b",
      "日本 語 日本 語", "p | q | r") ++ random
  }

  private def assertColsEqual(df: org.apache.spark.sql.DataFrame,
      expected: org.apache.spark.sql.Column,
      actual: org.apache.spark.sql.Column, label: String): Unit = {
    val bad = df.select(expected.as("e"), actual.as("a"))
      .filter(not(col("e") <=> col("a"))).collect()
    assert(bad.isEmpty, s"$label mismatches: ${bad.take(3).mkString("; ")}")
  }

  test("WordNGrams (plain) matches transform+slice+concat_ws") {
    val df = corpus.toDF("text")
    val t = split(col("text"), " ")
    for (n <- Seq(2, 3, 5, 8)) {
      // the HOF form is only defined for size >= n (the callers' guard)
      val guarded = df.filter(size(t) >= n)
      val hof = transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n))))
      assertColsEqual(guarded, hof,
        graft.functions.WordNGrams(t, n, distinct = false), s"ngrams n=$n")
      // short arrays yield empty (the explode-equivalent contract)
      val short = df.filter(size(t) < n)
        .select(size(graft.functions.WordNGrams(t, n, distinct = false)).as("sz"))
        .filter(col("sz") =!= 0).collect()
      assert(short.isEmpty, s"n=$n: short doc produced non-empty n-grams")
    }
  }

  test("WordNGrams (distinct) matches array_distinct of the HOF form") {
    val df = corpus.toDF("text")
    val t = split(col("text"), " ")
    for (n <- Seq(2, 3)) {
      val guarded = df.filter(size(t) >= n)
      val hof = array_distinct(transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))))
      assertColsEqual(guarded, hof,
        graft.functions.WordNGrams(t, n, distinct = true), s"shingles n=$n")
    }
  }

  test("AdjacentPairs matches the struct-pair transform") {
    val df = corpus.toDF("text")
    val t = split(col("text"), " ")
    val hof = transform(sequence(lit(1), size(t) - 1),
      i => struct(element_at(t, i).as("a"), element_at(t, i + 1).as("b")))
    assertColsEqual(df.filter(size(t) >= 2), hof,
      graft.functions.AdjacentPairs(t), "adjacent pairs")
  }

  test("LzPhraseCount matches the delimited-string fold") {
    val df = (corpus ++ Seq("", "aaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "abababababababab", "x|x||x|||x", "日本日本日本語語語")).toDF("text")
    val cap = 240
    val chars = split(substring(col("text"), 1, cap), "")
    val fold = aggregate(
      chars,
      struct(lit("|").as("d"), lit("").as("cur"), lit(0).as("cnt")),
      (acc, c) => {
        val cand = concat(acc.getField("cur"), c)
        when(acc.getField("d").contains(concat(lit("|"), cand, lit("|"))),
          struct(acc.getField("d").as("d"), cand.as("cur"),
            acc.getField("cnt").as("cnt")))
          .otherwise(struct(concat(acc.getField("d"), cand, lit("|")).as("d"),
            lit("").as("cur"), (acc.getField("cnt") + 1).as("cnt")))
      },
      acc => acc.getField("cnt") +
        when(acc.getField("cur") =!= "", 1).otherwise(0))
    val hof = when(length(col("text")) === 0, lit(0)).otherwise(fold)
    assertColsEqual(df, hof,
      graft.text.TextAnalysis.lzPhraseCount(col("text"), cap), "lz78")
  }
}
