package graft

import org.apache.spark.sql.functions._
import graft.text.BpeTrainer

/** BPE merge learning: hand-checked merges on the Sennrich-style
  * fixture, determinism, prefix stability, and the apply rule.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // newest×5, lower×2, low×3, widest×1 — small enough to hand-compute:
  //   iter1 pair counts: (w,e) 5+2=7 beats (e,s)/(s,t) 6 → merge (w,e) 7
  //   iter2: (s,t) 6 (newest 5 + widest 1) → merge (s,t) 6
  //   iter3: four pairs tie at 5 — (e,we),(l,o),(n,e),(we,st) — and the
  //   (count desc, left, right) tie-break picks (e,we)
  private def fixtureVocab = Seq(
    ("newest", 5L), ("lower", 2L), ("low", 3L), ("widest", 1L),
  ).toDF("word", "n")

  test("learned merges match the hand-computed sequence") {
    val merges = BpeTrainer.train(fixtureVocab, 3)
    assert(merges.map(m => (m.left, m.right, m.weighted_count)) ===
      Seq(("w", "e", 7L), ("s", "t", 6L), ("e", "we", 5L)))
    assert(merges.map(_.rank) === Seq(1, 2, 3))
  }

  test("training is deterministic and partitioning-independent") {
    val a = BpeTrainer.train(fixtureVocab, 3)
    val b = BpeTrainer.train(fixtureVocab.repartition(7), 3)
    assert(a === b)
  }

  test("an M-merge run extends an (M-1)-merge run (prefix stability)") {
    val m2 = BpeTrainer.train(fixtureVocab, 2)
    val m3 = BpeTrainer.train(fixtureVocab, 3)
    assert(m3.take(2) === m2)
  }

  test("mergeOnce applies left-to-right without overlap") {
    val df = Seq("aaaa", "abab", "newest").toDF("w")
      .select(col("w"), split(col("w"), "").as("syms"))
    val out = df.select(col("w"), BpeTrainer.mergeOnce(col("syms"), "a", "a").as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("aaaa") === Seq("aa", "aa")) // not aa,a,a and not overlap
    assert(out("abab") === Seq("a", "b", "a", "b")) // untouched
    assert(out("newest") === Seq("n", "e", "w", "e", "s", "t"))
  }

  test("segment applies a learned merge list in rank order") {
    val merges = BpeTrainer.train(fixtureVocab, 3)
    val segs = Seq("newest", "lowest").toDF("w")
      .select(col("w"), BpeTrainer.segment(col("w"), merges).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // newest: chars → (w,e) → n,e,we,s,t → (s,t) → n,e,we,st → (e,we) → n,ewe,st
    assert(segs("newest") === Seq("n", "ewe", "st"))
    // lowest: l,o,w,e,s,t → (w,e) → l,o,we,s,t → (s,t) → l,o,we,st (no e before we)
    assert(segs("lowest") === Seq("l", "o", "we", "st"))
  }

  test("corpus training runs end to end and stays bounded") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = BpeTrainer.train(BpeTrainer.wordVocab(docs, "text"), 5)
    assert(merges.size === 5)
    // counts are monotonically non-increasing in rank: a later merge
    // can never have been a strictly better choice earlier
    assert(merges.sliding(2).forall {
      case Seq(x, y) => y.weighted_count <= x.weighted_count
      case _ => true
    })
    graft.dedup.Dedup.clearCaches(spark)
  }
}
