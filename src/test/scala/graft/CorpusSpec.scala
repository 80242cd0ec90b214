package graft

import org.apache.spark.sql.functions._
import graft.queries.Corpus

/** Semantic checks for the corpus-shaping operators (q85–q90) on
  * crafted corpora — the oracle pins cross-engine equality; these pin
  * the semantics themselves (chunk coverage/overlap, boilerplate
  * thresholds, mixture rates, prefix grouping).
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  /** Write a synthetic documents table and return its dir (the Q
    * contract reads `$dir/documents.parquet`).
    */
  private def corpusDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def words(n: Int, tag: String = "w"): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("chunking covers every token, overlaps by 8, and short docs stay whole") {
    val dir = corpusDir(Seq(
      (1L, words(100), "en", "s0"),   // ceil((100-32)/24)+1 = 4 chunks
      (2L, words(7), "en", "s0"),     // shorter than one window: 1 chunk
      (3L, words(32), "en", "s0")))   // exactly one window: 1 chunk
    val out = Corpus.chunkOverlap.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).length === 4 && byDoc(2L).length === 1 && byDoc(3L).length === 1)
    // chunk i starts at token i*24: consecutive full chunks share 8 tokens
    val c = byDoc(1L).sortBy(_._2).map(_._3.split(" ").toSeq)
    assert(c(0).takeRight(8) === c(1).take(8))
    // the union of chunk tokens is exactly the document
    assert(c.flatten.distinct.sorted === (0 until 100).map(i => s"w$i").sorted)
    // the final partial chunk reports its true token count: 100-3*24=28
    assert(byDoc(1L).sortBy(_._2).last._4 === 28L)
    assert(byDoc(2L).head._4 === 7L)
  }

  test("boilerplate trigrams need >=5 distinct docs; unique docs score zero") {
    val boiler = "call to action now " // shared 4-token run => 2 boilerplate trigrams
    val rows = (1L to 6L).map(i => (i, boiler + words(6, s"u$i"), "en", "s0")) :+
      (9L, words(10, "z"), "en", "s0")
    val out = Corpus.boilerplateNgrams.fn(spark, corpusDir(rows))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // each templated doc: 8 trigrams, of which "call to action" and
    // "to action now" occur in 6 >= 5 docs; the spill into u-words is
    // per-doc unique
    (1L to 6L).foreach { i => assert(out(i) === ((8L, 2L)), s"doc $i: ${out(i)}") }
    assert(out(9L) === ((8L, 0L)))
  }

  test("boilerplate threshold is strict: 4 docs sharing a trigram is not boilerplate") {
    val rows = (1L to 4L).map(i => (i, "call to action " + words(5, s"u$i"), "en", "s0"))
    val out = Corpus.boilerplateNgrams.fn(spark, corpusDir(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.values.forall(_ === 0L))
  }

  test("vocab ranks bigrams by corpus frequency with a deterministic tie order") {
    val rows = Seq(
      (1L, "red fox red fox red fox", "en", "s0"), // "red fox" x3, "fox red" x2
      (2L, "blue cat blue cat", "en", "s0"))       // "blue cat" x2, "cat blue" x1
    val out = Corpus.ngramVocab.fn(spark, corpusDir(rows))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.head === (("red fox", 3L)))
    // count-2 tie breaks lexicographically: "blue cat" before "fox red"
    assert(out.slice(1, 3) === Seq(("blue cat", 2L), ("fox red", 2L)))
  }

  test("prefix groups collect template instances across sources") {
    val prefix = words(8, "p") // 8 shared tokens
    val rows = Seq(
      (3L, prefix + " tail one", "en", "srcA"),
      (7L, prefix + " other words entirely", "en", "srcB"),
      (5L, prefix + " third variant", "en", "srcA"),
      (9L, words(10, "q"), "en", "srcA")) // unique prefix → no group
    val out = Corpus.prefixGroups.fn(spark, corpusDir(rows)).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === prefix)
    assert(r.getLong(1) === 3L && r.getLong(2) === 2L && r.getLong(3) === 3L)
  }

  test("temperature mixture keeps the smallest language whole and flattens the rest") {
    // 4 docs of "mn", 64 of "big": p_big = sqrt(4/64) = 1/4
    val rows = (1L to 4L).map(i => (i, words(10), "mn", "s0")) ++
      (101L to 164L).map(i => (i, words(10), "big", "s0"))
    val out = graft.queries.Curation.temperatureMixture.fn(spark, corpusDir(rows))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("mn") === 4) // p = 1: every doc of the min lang survives
    // 64 docs sampled at 1/4: md5-uniform keeps the expectation loose
    // but the flattening must bite (strictly fewer than all, more than none)
    assert(byLang("big") > 4 && byLang("big") < 40, byLang.toString)
    // determinism: the same corpus yields the same sample
    val again = graft.queries.Curation.temperatureMixture.fn(spark, corpusDir(rows))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === again.toSeq)
  }
}
