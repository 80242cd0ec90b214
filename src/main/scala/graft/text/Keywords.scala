package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics text scoring: TF-IDF keyword extraction and
  * bigram-language-model fluency — both pure keyed dataflows (explode →
  * aggregate → join back), reusable on any (id, text) table.
  */
object Keywords {

  /** Top-k characteristic terms per document by smoothed TF-IDF
    * (ln((N+1)/(df+1)) + 1, the sklearn-style smooth idf). tf is a
    * (doc, term) aggregate over the token explode, df a (term)
    * aggregate over tf, the per-doc top-k a partitioned window. The df
    * join is deliberately unhinted: vocab is usually ≪ corpus and AQE
    * broadcasts it, but a web-crawl vocab can exceed executor memory —
    * a forced broadcast would OOM where a shuffled term join degrades
    * gracefully. Returns (idCol, rk, term, tfidf).
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = docs.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("s", col("tf").cast("double")
        * (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0))
    val w = Window.partitionBy(idCol).orderBy(col("s").desc, col("term"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col(idCol), col("rk"), col("term"), round(col("s"), 6).as("tfidf"))
  }

  /** Per-doc mean bigram log-probability under the corpus's own MLE
    * bigram model — the KenLM-shaped fluency signal (gibberish and
    * boilerplate-mangled docs score low; every doc bigram exists in
    * the model because the corpus contains the doc, so MLE needs no
    * smoothing). Three keyed aggregates off ONE persisted bigram
    * explode; c1/c2 joins unhinted (a corpus-scale bigram vocabulary
    * is not safely broadcastable). ln terms are rounded to 9dp and
    * summed as DECIMAL so the per-doc mean is associative-exact.
    * Returns (idCol, n_bigrams, avg_logprob).
    */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // NOT Dedup.wordShingles — that array_distincts per doc; the LM
    // counts every occurrence
    val bg = graft.dedup.Dedup.persistTracked(
      docs.filter(size(toks) >= 2)
        .select(col(idCol), explode(
          graft.functions.WordNGrams(toks, 2, distinct = false)).as("bigram"))
        .withColumn("w1", element_at(split(col("bigram"), " "), 1)))
    val c2 = bg.groupBy("bigram").agg(count(lit(1)).as("n2"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("n1"))
    // resolve p(w2|w1) on the VOCAB-sized tables first (w1 is a pure
    // function of bigram), so the occurrence table is joined once,
    // not twice — the expensive side of this plan is bg, not c1/c2
    val probs = c2.withColumn("w1", element_at(split(col("bigram"), " "), 1))
      .join(c1, "w1")
      .select(col("bigram"),
        round(log(col("n2").cast("double") / col("n1")), 9)
          .cast("decimal(18,9)").as("term"))
    bg.join(probs, "bigram")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("term")).cast("double") / count(lit(1)), 6).as("avg_logprob"))
  }
}
