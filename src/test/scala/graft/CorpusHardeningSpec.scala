package graft

import org.apache.spark.sql.functions._
import graft.queries.{Corpus, Curation, Embeddings, Text}

/** Semantic pins for the round-8 corpus-hardening family (q205–q214)
  * on crafted fixtures — the oracle pins cross-engine equality; these
  * pin the semantics themselves (periodicity flags, survival
  * monotonicity, weight accounting, coverage arithmetic, fold
  * determinism, leakage detection, quantization error bounds).
  */
class CorpusHardeningSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_hard").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def embDir(rows: Seq[(Long, Array[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_hard_emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q205: a strict period-3 loop is flagged; varied text is not") {
    // period 3: ac3 = 1.0 against a 1/3 unigram baseline (2× = 0.667 <
    // 1.0 → flagged). A period-2 alternation would sit exactly AT the
    // 2× baseline (ac2 = 1.0, baseline 0.5) — by design not flagged:
    // two tokens at 50/50 is what a coin-flip corpus looks like.
    val loop = (0 until 21).map(i => Seq("aa", "bb", "cc")(i % 3)).mkString(" ")
    val varied = (1 to 20).map(i => s"w$i").mkString(" ")
    val dir = corpusDir(Seq((1L, loop, "en", "s0"), (2L, varied, "en", "s0")))
    val out = Text.tokenAutocorrelation.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // period-3 loop: every lag-3 comparison matches, lag-1/2 never
    assert(out(1L).getDouble(4) === 1.0)  // ac3
    assert(out(1L).getDouble(2) === 0.0 && out(1L).getDouble(3) === 0.0)
    assert(out(1L).getInt(6) === 1, "loop must be flagged periodic")
    // all-distinct tokens: zero matches at every lag, never flagged
    assert(out(2L).getDouble(2) === 0.0 && out(2L).getInt(6) === 0)
  }

  test("q207: survival is monotone non-increasing and starts at the full corpus") {
    val dir = corpusDir(Seq(
      (1L, ("the a of and " * 12).trim, "en", "s0"),   // stopword-heavy → low quality
      (2L, (1 to 60).map(i => s"u$i").mkString(" "), "en", "s0"), // long, no stopwords → high
      (3L, "one two three", "en", "s0")))
    val rows = Curation.qualitySurvivalCurve.fn(spark, dir).collect()
    assert(rows.length === 10)
    val docs = rows.map(_.getLong(1))
    assert(docs.head === 3L, "threshold 0.0 keeps everything")
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b }, docs.mkString(","))
    // the high-quality doc must survive a 0.9 cut the others fail
    assert(docs.last === 1L)
  }

  test("q208: a text duplicated k times contributes one doc's worth of tokens") {
    val t = "alpha beta gamma delta" // 4 tokens
    val dir = corpusDir(Seq(
      (1L, t, "en", "srcA"), (2L, t, "en", "srcA"), (3L, t, "en", "srcB"),
      (4L, "unique words here now", "en", "srcB")))
    val out = Curation.dupWeightedTokens.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    // srcA: two copies of a 3-way dup → 2 docs × 4 tokens raw, 4·(2/3) eff
    assert(out("srcA").getLong(2) === 8L)
    assert(math.abs(out("srcA").getDouble(3) - 8.0 / 3.0) < 1e-4)
    // srcB: one copy (4/3 eff) + one unique (4 eff)
    assert(out("srcB").getLong(2) === 8L)
    assert(math.abs(out("srcB").getDouble(3) - (4.0 / 3.0 + 4.0)) < 1e-4)
  }

  test("q212: coverage targets resolve to exact smallest vocabularies") {
    // freqs: x appears 8, y 6, z 4, w 2 → total 20; desc cum: 8,14,18,20
    val dir = corpusDir(Seq(
      (1L, Seq.fill(8)("x").mkString(" "), "en", "s0"),
      (2L, Seq.fill(6)("y").mkString(" "), "en", "s0"),
      (3L, Seq.fill(4)("z").mkString(" "), "en", "s0"),
      (4L, Seq.fill(2)("w").mkString(" "), "en", "s0")))
    val out = Corpus.vocabCoverageCurve.fn(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(50) === ((2L, 14L)), out.toString)  // need 10 → {x,y} = 14
    assert(out(75) === ((3L, 18L)))                // need 15 → {x,y,z} = 18
    assert(out(90) === ((3L, 18L)))                // need 18 → {x,y,z} covers exactly
    assert(out(95) === ((4L, 20L)))                // need 19 → all four
  }

  test("q213: folds are a deterministic partition covering every doc") {
    val dir = corpusDir((1L to 40L).map(i =>
      (i, (1 to 10).map(j => s"t${i}_$j").mkString(" "), "en", s"s${i % 2}")))
    val a = Curation.splitAssignment.fn(spark, dir).collect()
    val b = Curation.splitAssignment.fn(spark, dir).collect()
    assert(a.toSeq === b.toSeq, "assignment must be deterministic")
    assert(a.map(_.getLong(2)).sum === 40L, "folds must cover every doc exactly once")
    assert(a.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("q214: near-dup pairs split across folds are flagged; exact dups never are") {
    // craft a near-dup pair (J≥0.5, different bytes → md5 differs) and
    // search for fold-crossing instances among suffix variants
    val base = (1 to 30).map(i => s"c$i").mkString(" ")
    val rows = (1L to 6L).map(i => (i, s"$base tail$i", "en", "s0")) :+
      (100L, "totally different text entirely", "en", "s0") :+
      (101L, "totally different text entirely", "en", "s0") // exact dup of 100
    val dir = corpusDir(rows)
    graft.dedup.Dedup.clearCaches(spark)
    val out = Curation.splitLeakage.fn(spark, dir).collect()
    // the suffix-variant cluster spans folds unless md5 luck puts all
    // six in one fold (p ≈ 0.9^5) — accept either, but the exact-dup
    // pair (same text → same fold) must NEVER appear
    assert(!out.map(_.getLong(0)).contains(100L),
      "exact duplicates co-assign by construction and cannot leak")
    out.foreach { r => assert(r.getLong(2) >= 2L && r.getLong(1) >= 2L) }
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q216: cluster-aware folds never split a near-dup cluster") {
    val base = (1 to 30).map(i => s"k$i").mkString(" ")
    val rows = (1L to 6L).map(i => (i, s"$base tail$i", "en", "s0")) ++
      (50L to 69L).map(i => (i, (1 to 20).map(j => s"x${i}_$j").mkString(" "), "en", "s1"))
    val dir = corpusDir(rows)
    graft.dedup.Dedup.clearCaches(spark)
    // the fold function applied per cluster must agree for every member:
    // recompute memberships and check each cluster lands in ONE fold of
    // the q216 totals (doc counts partition the corpus)
    val out = Curation.clusterAwareSplit.fn(spark, dir).collect()
    assert(out.map(_.getLong(1)).sum === 26L, "folds must partition the corpus")
    // and the leakage audit under cluster-aware assignment is empty by
    // construction: every member shares the representative's fold, so
    // re-running q214's span check against THESE folds finds nothing —
    // verified structurally: clusters counted in exactly one fold row
    val clusters = out.map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(clusters.values.sum >= 21L, s"singleton clusters must all appear: $clusters")
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q217: recall curve is exact-complete at k where LSH candidates cover") {
    // identical vectors bucket identically: with every corpus vector in
    // the panel's buckets, recall must be 1.0 at every k
    val dir = embDir((0L to 11L).map(i => (i, Array.fill(64)(1.0f), 0)))
    val out = Embeddings.annRecallCurve.fn(spark, dir).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getDouble(2) === 1.0 && r.getDouble(3) === 1.0,
        s"k=${r.getInt(0)}: identical vectors must give recall 1.0, got $r")
    }
  }

  test("q206: signature estimate is exact on identical shingle sets") {
    // two docs sharing ALL shingles (exact dup collapses — so use
    // near-identical with one swapped tail token to keep both)
    val base = (1 to 40).map(i => s"m$i").mkString(" ")
    val dir = corpusDir(Seq(
      (1L, base + " endone", "en", "s0"),
      (2L, base + " endtwo", "en", "s0")))
    graft.dedup.Dedup.clearCaches(spark)
    val out = Text.minhashCalibration.fn(spark, dir).collect()
    assert(out.nonEmpty, "the near-identical pair must collide in some band")
    // J = 38/42 ≈ 0.905 → single pair lands in the top bucket with a
    // high estimate; bias magnitude bounded by the k=32 resolution
    val top = out.last
    assert(top.getLong(1) === 1L)
    assert(top.getDouble(3) >= 0.5, s"est ${top.getDouble(3)} implausibly low")
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q209: quantization error is bounded by half a step; constant-zero dim is exact") {
    val dir = embDir(Seq(
      (1L, Array(1.0f, 0f, 0.5f, 0f, 0f, 0f, 0f, 0f), 0),
      (2L, Array(-1.0f, 0f, 0.25f, 0f, 0f, 0f, 0f, 0f), 1)))
    val out = Embeddings.int8QuantAudit.fn(spark, dir).collect()
    out.foreach { r =>
      val (absmax, mae) = (r.getDouble(1), r.getDouble(3))
      // + 5e-7: the reported mae is ROUNDED to 6 dp (can round up past
      // the analytic half-step bound by half an ulp of the rounding)
      assert(mae <= absmax / 127.0 / 2.0 + 5e-7,
        s"dim ${r.getInt(0)}: max err $mae exceeds half-step of $absmax")
    }
    val dim2 = out.find(_.getInt(0) == 2).get
    assert(dim2.getDouble(2) === 0.0 && dim2.getDouble(3) === 0.0)
  }

  test("q210: energy shares sum to ~1 and the curve is non-decreasing") {
    val dir = embDir((1L to 10L).map(i =>
      (i, Array.tabulate(8)(d => ((i * (d + 1)) % 7).toFloat), i.toInt % 2)))
    val rows = Embeddings.dimEnergyCurve.fn(spark, dir).collect()
    assert(rows.length === 8)
    val cum = rows.map(_.getDouble(4))
    assert(cum.zip(cum.tail).forall { case (a, b) => b >= a - 1e-9 })
    assert(math.abs(cum.last - 1.0) < 1e-3, s"cum share ends at ${cum.last}")
    // ranked by variance: shares non-increasing
    val sh = rows.map(_.getDouble(3))
    assert(sh.zip(sh.tail).forall { case (a, b) => a >= b - 1e-9 })
  }

  test("q211: degenerate sources bracket the diversity statistics") {
    val dir = corpusDir(Seq(
      (1L, Seq.fill(20)("same").mkString(" "), "en", "mono"),
      (2L, (1 to 20).map(i => s"d$i").mkString(" "), "en", "rich")))
    val out = Text.lexicalDiversity.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val mono = out("mono")
    assert(mono.getLong(2) === 1L && mono.getDouble(6) === 1.0) // 1 type, Simpson 1
    val rich = out("rich")
    assert(rich.getDouble(4) === 1.0 && rich.getDouble(5) === 1.0
      && rich.getDouble(6) === 0.0) // TTR 1, hapax 1, Simpson 0
  }
}
