package graft

import org.apache.spark.sql.functions._

/** Pins graft.functions.TokenAutocorr (q205's compiled per-row token
  * statistics) bit-equal to the higher-order-function formulation it
  * replaced: m_p = |{i : t[i] = t[i+p]}| for p = 1..3 and
  * sumsq = Σ c_t² over the row's distinct tokens. The corpora cover
  * the edge shapes the fold history cared about: empty strings from
  * double spaces, periodic loops, all-identical tokens, short arrays
  * (n < lag), unicode, and a seeded random mix.
  */
class TokenAutocorrSpec extends SparkSpec {
  import spark.implicits._

  private def hofStats(textCol: String) = {
    val t = split(col(textCol), " ")
    val n = size(t)
    val sumsq = aggregate(array_sort(t),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("acc")),
      (st, x) => when(x === st.getField("prev"),
          struct(x.as("prev"), (st.getField("run") + 1L).as("run"),
            st.getField("acc").as("acc")))
        .otherwise(struct(x.as("prev"), lit(1L).as("run"),
          (st.getField("acc") + st.getField("run") * st.getField("run")).as("acc"))),
      st => st.getField("acc") + st.getField("run") * st.getField("run"))
    def m(p: Int) = size(filter(sequence(lit(1), n - (p - 1) - 1),
      i => element_at(t, i) === element_at(t, i + p))).cast("long")
    (m(1), m(2), m(3), sumsq)
  }

  private def corpus: Seq[String] = {
    val rnd = new scala.util.Random(20512)
    val vocab = Vector("a", "b", "ab", "", "λ", "日本", "the", "x1")
    val random = (1 to 200).map { _ =>
      (1 to (1 + rnd.nextInt(30))).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    }
    Seq(
      "a b a b a b a b",            // period-2 loop
      "x x x x x x",                // constant
      "a  b  c  d",                 // double spaces -> empty tokens
      "a b c",                      // n = 3 (below the q205 filter; lags still defined)
      "a", "", " ",                 // degenerate
      "日本 語 日本 語 日本"          // unicode period-2
    ) ++ random
  }

  test("TokenAutocorr matches the HOF formulation bit-for-bit") {
    // the HOF lag filters are only well-defined for n >= 4 (q205's own
    // filter — element_at would range-error below that); the compiled
    // expression's short-array behavior is pinned by the eval test
    val df = corpus.toDF("text")
      .filter(org.apache.spark.sql.functions.size(
        split(col("text"), " ")) >= 4)
    val (m1, m2, m3, sumsq) = hofStats("text")
    val st = graft.functions.TokenAutocorr(split(col("text"), " "))
    val bad = df.select(
        m1.as("e1"), m2.as("e2"), m3.as("e3"), sumsq.as("es"),
        st.getField("m1").as("a1"), st.getField("m2").as("a2"),
        st.getField("m3").as("a3"), st.getField("sumsq").as("as"))
      .filter(col("e1") =!= col("a1") || col("e2") =!= col("a2") ||
        col("e3") =!= col("a3") || col("es") =!= col("as"))
      .collect()
    assert(bad.isEmpty, s"mismatches: ${bad.take(5).mkString("; ")}")
  }

  test("TokenAutocorr interpreted eval agrees with codegen") {
    // eval path (nullSafeEval) vs the codegen path exercised above
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("a", "b", "a", "b", "a").map(
        org.apache.spark.unsafe.types.UTF8String.fromString))
    val r = graft.functions.TokenAutocorr.stats(arr)
    assert(r.getLong(0) == 0L) // lag 1
    assert(r.getLong(1) == 3L) // lag 2 ("a b a b a": i=1..3 all match)
    assert(r.getLong(2) == 0L) // lag 3
    assert(r.getLong(3) == 9L + 4L) // c_a=3, c_b=2
  }
}
