package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge LEARNING (Sennrich et al. 2016,
  * arXiv:1508.07909) — the tokenizer-training half of the pipeline
  * (q79's BPE-ish segmentation is the serving half). Scale shape:
  *
  *   - training runs on the WORD-FREQUENCY table, not the corpus: one
  *     corpus-sized aggregation up front ([[wordVocab]]), then every
  *     iteration touches only |vocab| rows — corpus-size-independent,
  *     which is the published algorithm's own trick.
  *   - per iteration: adjacent-pair counts are a `zip_with` explode +
  *     keyed sum (map-side combined), the argmax is a 1-row
  *     TakeOrderedAndProject collect (count desc, then lexicographic —
  *     deterministic), and the merge applies as a pure column fold
  *     (`aggregate` HOF) — no UDF, no driver data beyond the winning
  *     pair.
  *   - each round's segmentation persists MEMORY_AND_DISK and the
  *     previous round unpersists, so lineage stays one fold deep.
  *
  * Counts are integral (exact at any partitioning), so training is
  * bit-deterministic end to end.
  */
object BpeTrainer {

  final case class Merge(rank: Int, left: String, right: String, weighted_count: Long)

  /** (word, n) frequency table over a lowercased `[^a-z0-9']+`
    * tokenization — the one corpus-sized pass. */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "[^a-z0-9']+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** Left-to-right non-overlapping application of ONE merge (a, b) to a
    * symbol array — the standard BPE apply rule, as a fold: append each
    * symbol unless it is `b` and the accumulator ends in `a`, in which
    * case the tail `a` is replaced by the merged symbol.
    */
  def mergeOnce(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Adjacent symbol pairs of each row, weighted by `n` (overlapping
    * pairs count, per the published counting rule). */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("n"),
      explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("n")).as("cnt"))

  /** Learn up to `merges` merges from a (word, n) vocabulary. Stops
    * early when no adjacent pair remains. Ties break on
    * (count desc, left asc, right asc).
    */
  def train(vocab0: DataFrame, merges: Int): Seq[Merge] = {
    require(merges >= 1, s"merges=$merges must be >= 1")
    var vocab = graft.dedup.Dedup.persistTracked(
      vocab0.select(col("n"), split(col("word"), "").as("syms")))
    // the round-r pair-count job is what materializes round r's persist,
    // so round r-1's cache can drop right after it — no dedicated
    // materialization job per round, lineage still stays one fold deep
    var prev: Option[DataFrame] = None
    val out = Seq.newBuilder[Merge]
    var done = false
    for (r <- 1 to merges if !done) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      prev.foreach(_.unpersist())
      prev = Some(vocab)
      if (top.isEmpty) done = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += Merge(r, a, b, cnt)
        vocab = graft.dedup.Dedup.persistTracked(
          vocab.withColumn("syms", mergeOnce(col("syms"), a, b)))
      }
    }
    out.result()
  }

  /** Segment a text column with an already-learned merge list (the
    * serving side): char split, then the merges fold in rank order —
    * pure column expressions, applied per row in one pass over the
    * data, no state.
    */
  def segment(textWords: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(split(textWords, "")) {
      (syms, m) => mergeOnce(syms, m.left, m.right)
    }
}
