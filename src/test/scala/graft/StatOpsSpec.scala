package graft

import org.apache.spark.sql.functions._
import graft.queries.{Curation, Ml, Text}

/** Semantic pins for the round-8 statistics/curation wave (q269–q274)
  * on crafted fixtures. The driver oracle pins cross-engine equality;
  * these pin the math itself: the LZ78 fold against a from-scratch
  * reference, W₁ on point-mass distributions, a hand-computed average
  * precision, Otsu's closed form on a two-level histogram, shrinkage
  * monotonicity in n, and the permutation test's null behavior
  * (including the +0.0 canonical zero).
  */
class StatOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stat").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Reference LZ78 phrase count (the q269 contract, independently). */
  private def lz78(t: String): Int = {
    val dict = scala.collection.mutable.Set[String]()
    var cur = ""; var n = 0
    t.foreach { c =>
      val cand = cur + c
      if (dict.contains(cand)) cur = cand
      else { dict += cand; n += 1; cur = "" }
    }
    n + (if (cur.nonEmpty) 1 else 0)
  }

  test("q269: fold matches reference LZ78; repetition is flagged, prose is not") {
    val rep = Seq.fill(60)("ab").mkString(" ")         // highly compressible
    val prose = "the quick brown fox jumps over a lazy dog near the old riverbank " +
      "while seven wizards boxed quietly in 1942 watching pale dusk settle"
    val dir = corpusDir(Seq(
      (1L, rep, "en", "s0"), (2L, prose, "en", "s0"),
      (3L, "abcabcabc", "en", "s0")))
    val out = Text.lzCompressibility.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    Seq(1L -> rep, 2L -> prose, 3L -> "abcabcabc").foreach { case (id, t) =>
      val scored = t.take(240)
      assert(out(id).getLong(1) === scored.length.toLong)
      assert(out(id).getLong(2) === lz78(scored).toLong, s"doc $id phrase count")
    }
    assert(out(1L).getBoolean(4), "repetitive doc must be flagged")
    assert(!out(2L).getBoolean(4), "natural prose must not be flagged")
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q270: W1 between point masses is their quality gap; identical sources → 0") {
    // sA docs: 50 distinct non-stop tokens → q = 1.0; sB docs: 25 → q = 0.75.
    val hi = (1 to 50).map(i => s"tok$i").mkString(" ")
    val lo = (1 to 25).map(i => s"tok$i").mkString(" ")
    val dir = corpusDir(Seq(
      (1L, hi, "en", "sA"), (2L, hi, "en", "sA"),
      (3L, lo, "en", "sB"), (4L, lo, "en", "sB")))
    val out = Ml.wassersteinDrift.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    // each source vs the other point mass: W1 = |1.0 − 0.75|
    assert(math.abs(out("sA") - 0.25) < 1e-9)
    assert(math.abs(out("sB") - 0.25) < 1e-9)
    // a third source identical to the pooled rest of itself: single-value corpus
    val dir2 = corpusDir(Seq(
      (1L, hi, "en", "sA"), (2L, hi, "en", "sB")))
    val out2 = Ml.wassersteinDrift.fn(spark, dir2).collect()
    out2.foreach(r => assert(r.getDouble(2) === 0.0))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q271: hand-computed AP on a 4-doc ranking") {
    def distinctToks(n: Int, p: String) = (1 to n).map(i => s"$p$i").mkString(" ")
    def repeated(d: Int, reps: Int, p: String) =
      (1 to d).flatMap(i => Seq.fill(reps)(s"$p$i")).mkString(" ")
    val dir = corpusDir(Seq(
      (1L, distinctToks(50, "a"), "xx", "s0"),  // q=1.0, rel=1
      (2L, repeated(10, 4, "b"), "xx", "s0"),   // q=0.9, rel=0 (frac .25)
      (3L, distinctToks(30, "c"), "xx", "s0"),  // q=0.8, rel=1
      (4L, repeated(5, 4, "d"), "xx", "s0")))   // q=0.7, rel=0
    val r = Ml.averagePrecision.fn(spark, dir).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 4L && r(0).getLong(2) === 2L)
    // ranking rel pattern 1,0,1,0 → AP = (1/2)(1/1 + 2/3)
    assert(math.abs(r(0).getDouble(3) - 0.833333) < 1e-6)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q272: two-level histogram gives Otsu's closed form at the split") {
    val hi = (1 to 50).map(i => s"tok$i").mkString(" ")      // q = 1.0
    val lo = Seq.fill(50)("the").mkString(" ")               // q = 0.5
    val dir = corpusDir(
      (1L to 5L).map(i => (i, hi, "en", "s0")) ++
        (6L to 10L).map(i => (i, lo, "en", "s0")))
    val rows = Curation.otsuThreshold.fn(spark, dir).collect()
    assert(rows.length === 1) // the cn<n frontier of a 2-value histogram
    assert(rows(0).getDouble(0) === 0.5)
    // σ²_b = ω0·ω1·(μ0−μ1)² = 0.5·0.5·0.25
    assert(math.abs(rows(0).getDouble(1) - 0.0625) < 1e-9)
    assert(rows(0).getBoolean(2))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q273: shrinkage pulls small sources harder and stays between raw and prior") {
    val pass = (1 to 50).map(i => s"tok$i").mkString(" ")    // q = 1.0 ≥ .75
    val fail = Seq.fill(50)("the").mkString(" ")             // q = 0.5 < .75
    def docs(src: String, nPass: Int, nFail: Int, base: Long) =
      (0 until nPass).map(i => (base + i, pass, "en", src)) ++
        (0 until nFail).map(i => (base + nPass + i, fail, "en", src))
    val dir = corpusDir(
      docs("s1", 5, 5, 0L) ++ docs("s2", 9, 1, 100L) ++ docs("s3", 2, 0, 200L))
    val out = Curation.ebShrinkage.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val m = (0.5 + 0.9 + 1.0) / 3.0
    out.values.foreach { r =>
      val raw = r.getDouble(3); val shrunk = r.getDouble(4)
      assert(shrunk >= math.min(raw, m) - 1e-6 && shrunk <= math.max(raw, m) + 1e-6,
        s"shrunk between raw and prior mean: $r")
    }
    // smaller n → smaller weight on own data
    assert(out("s3").getDouble(5) < out("s1").getDouble(5))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q275: Hill alpha on a known geometric frequency ladder") {
    // counts a:8 b:4 c:2 d:1 → m=4, x_min=1, k=3, slog = ln8+ln4+ln2 = 6·ln2
    val text = (Seq.fill(8)("aaa") ++ Seq.fill(4)("bbb") ++
      Seq.fill(2)("ccc") ++ Seq("ddd")).mkString(" ")
    val dir = corpusDir(Seq((1L, text, "en", "s0")))
    val r = queries.Corpus.hillTailIndex.fn(spark, dir).collect()(0)
    assert(r.getLong(0) === 3L && r.getLong(1) === 1L)
    val slog = BigDecimal(math.log(8.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP) +
      BigDecimal(math.log(4.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP) +
      BigDecimal(math.log(2.0)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    assert(math.abs(r.getDouble(2) - 3.0 / slog.toDouble) < 1e-6)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q276: twin docs read as full self-overlap, disjoint docs as zero") {
    val twin = "a1 a2 a3 a4 a5"
    val dir = corpusDir(Seq(
      (1L, twin, "en", "sT"), (2L, twin, "en", "sT"),
      (3L, "b1 b2 b3 b4", "en", "sD"), (4L, "c1 c2 c3 c4", "en", "sD")))
    val out = queries.Corpus.selfOverlapDiversity.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("sT").getDouble(2) === 1.0 && out("sT").getDouble(3) === 1.0)
    assert(out("sD").getDouble(2) === 0.0 && out("sD").getDouble(3) === 0.0)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q277: Flesch closed form on a two-word sentence") {
    // "aa bb." → words=2, sents=1, vowel groups=1
    // flesch = 206.835 − 1.015·2 − 84.6·0.5 = 162.505
    val dir = corpusDir(Seq((1L, "aa bb.", "en", "s0")))
    val r = Text.readability.fn(spark, dir).collect()(0)
    assert(r.getLong(1) === 1L)
    assert(math.abs(r.getDouble(2) - 162.505) < 1e-9)
    assert(r.getDouble(3) === 0.0)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q278: symmetric components give uniform PageRank mass") {
    // two disjoint symmetric pairs → 4 nodes, PR = 1/4 each
    val dir = corpusDir(Seq(
      (1L, "alpha beta alpha beta", "en", "s0"),
      (2L, "gamma delta gamma delta", "en", "s0")))
    val out = queries.Graph.textrankKeywords.fn(spark, dir).collect()
    assert(out.length === 4)
    out.foreach(r => assert(math.abs(r.getDouble(1) - 0.25) < 1e-9, s"row $r"))
    // deterministic tiebreak: alphabetical within equal pr
    assert(out.map(_.getString(0)).toSeq ===
      Seq("alpha", "beta", "delta", "gamma"))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q279: cumulative LLR and decisions recompute from the emitted day counts") {
    val rows = queries.Events.sprtMonitor.fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val lnUp = math.log(0.20 / 0.15); val lnDn = math.log(0.80 / 0.85)
    var cum = BigDecimal(0)
    rows.foreach { r =>
      val n = r.getLong(1); val x = r.getLong(2)
      val llr = BigDecimal(x * lnUp + (n - x) * lnDn)
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      cum += llr
      val rounded = cum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - rounded) < 1e-9, s"cum at ${r.getString(0)}")
      val bound = BigDecimal(math.log(19.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val expect = if (rounded >= bound) "accept_h1"
        else if (rounded <= -bound) "accept_h0" else "continue"
      assert(r.getString(4) === expect)
    }
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q280: greedy covers the big doc first, skips dominated docs") {
    val dir = corpusDir(Seq(
      (1L, "a b c d e f g", "en", "s0"),  // 5 trigrams
      (2L, "a b c d e f", "en", "s0"),    // 4 trigrams, subset of doc 1
      (3L, "p q r", "en", "s0")))         // 1 disjoint trigram
    val out = queries.Curation.facilityLocation.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 1L, 5L), (2L, 3L, 1L)),
      "dominated doc 2 contributes nothing once doc 1 is in")
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q281: a rigid template slot reads entropy +0.0, a free slot reads > 0") {
    val docs = (1L to 4L).map { i =>
      // position 1 always "greet"; position 2 varies per doc; pad to 10 tokens
      (i, s"greet name$i " + (1 to 8).map(j => s"w${i}_$j").mkString(" "), "en", "s0")
    }
    val out = queries.Text.positionalEntropy.fn(spark, corpusDir(docs)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size === 10)
    val e1 = out(1L).getDouble(3)
    assert(e1 === 0.0)
    assert(java.lang.Double.doubleToRawLongBits(e1) === 0L, "canonical +0.0")
    assert(out(1L).getLong(2) === 1L)
    assert(out(2L).getDouble(3) > 1.0 && out(2L).getLong(2) === 4L)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q282: McNemar counts the discordant cells with continuity correction") {
    val dir = corpusDir(Seq(
      (1L, (1 to 50).map(i => s"a$i").mkString(" "), "en", "s0"),       // f1=1 f2=1
      (2L, (1 to 10).flatMap(i => Seq.fill(4)(s"b$i")).mkString(" "), "en", "s0"), // f1=1 f2=0
      (3L, (1 to 20).map(i => s"c$i").mkString(" "), "en", "s0"),       // f1=0 f2=1
      (4L, Seq.fill(50)("the").mkString(" "), "en", "s0")))             // f1=0 f2=0
    val r = queries.Text.mcnemarGates.fn(spark, dir).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((1L, 1L, 1L, 1L)))
    // chi2 = (|1-1|-1)^2 / 2 = 0.5
    assert(r.getDouble(5) === 0.5)
    assert(!r.getBoolean(6))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q283: perfect lang↔source coupling gives V = 1, independence gives V = 0") {
    val t = (1 to 10).map(i => s"t$i").mkString(" ")
    val coupled = corpusDir(Seq(
      (1L, t, "en", "sA"), (2L, t, "en", "sA"),
      (3L, t, "de", "sB"), (4L, t, "de", "sB")))
    val r1 = queries.Ml.cramersV.fn(spark, coupled).collect()(0)
    assert(r1.getDouble(4) === 1.0)
    val indep = corpusDir(Seq(
      (1L, t, "en", "sA"), (2L, t, "de", "sA"),
      (3L, t, "en", "sB"), (4L, t, "de", "sB")))
    val r2 = queries.Ml.cramersV.fn(spark, indep).collect()(0)
    assert(r2.getDouble(4) === 0.0)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q285: jackknife CI brackets the ratio with a nonnegative SE") {
    val r = queries.Extras.jackknifeRatio.fn(spark, "/root/testdata/sf0.001")
      .collect()(0)
    assert(r.getLong(0) === 25L)
    val (ratio, se, lo, hi) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(se >= 0.0)
    assert(lo <= ratio && ratio <= hi)
    assert(math.abs((hi - lo) - 2 * 1.96 * se) < 1e-4)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q288: gains are monotone to 1.0 and lift recomputes from the counts") {
    val rows = queries.Ml.cumulativeGains.fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val gains = rows.map(_.getDouble(3))
    assert(gains.zip(gains.tail).forall { case (a, b) => a <= b })
    assert(math.abs(gains.last - 1.0) < 1e-9)
    // lift_d ≡ (cum_pos/cum_docs)/(np/n) from the emitted per-decile counts
    val n = rows.map(_.getLong(1)).sum.toDouble
    val np = rows.map(_.getLong(2)).sum.toDouble
    var cd = 0L; var cp = 0L
    rows.foreach { r =>
      cd += r.getLong(1); cp += r.getLong(2)
      assert(math.abs(r.getDouble(4) - (cp.toDouble / cd) / (np / n)) < 1e-6,
        s"lift at decile ${r.getLong(0)}")
      assert(math.abs(r.getDouble(3) - cp / np) < 1e-6)
    }
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q284: JS is +0.0 on twins, ln 2 on disjoint vocabularies") {
    val dir = corpusDir(Seq(
      (1L, "a1 a2 a3 a4", "en", "sA"), (2L, "a1 a2 a3 a4", "en", "sB"),
      (3L, "z1 z2 z3 z4", "en", "sC")))
    val out = queries.Corpus.jsDivergencePairs.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val ab = out(("sA", "sB"))
    assert(ab === 0.0)
    assert(java.lang.Double.doubleToRawLongBits(ab) === 0L, "canonical +0.0")
    assert(math.abs(out(("sA", "sC")) - math.log(2.0)) < 1e-6)
    assert(math.abs(out(("sB", "sC")) - math.log(2.0)) < 1e-6)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q289: SLEM estimate sits in [0,1) with a positive mixing time") {
    val r = queries.Events.spectralGap.fn(spark, "/root/testdata/sf0.001").collect()(0)
    assert(r.getLong(0) === 5L)
    val slem = r.getDouble(1)
    assert(slem >= 0.0 && slem < 1.0, s"slem=$slem")
    assert(r.getDouble(2) > 0.0)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q290: order-statistic expectations on a two-value source") {
    val hi = (1 to 25).flatMap(i => Seq.fill(2)(s"tok$i")).mkString(" ") // 50 toks → q=1.0
    val lo = Seq.fill(50)("the").mkString(" ")                          // q=0.5
    val dir = corpusDir(Seq(
      (1L, hi, "en", "s0"), (2L, hi, "en", "s0"),
      (3L, lo, "en", "s0"), (4L, lo, "en", "s0")))
    val r = queries.Curation.bestOfN.fn(spark, dir).collect()(0)
    assert(math.abs(r.getDouble(2) - 0.75) < 1e-9)                       // mean
    assert(math.abs(r.getDouble(3) - (0.5 * 0.0625 + 1.0 * 0.9375)) < 1e-6)
    val p16 = math.pow(0.5, 16)
    assert(math.abs(r.getDouble(4) - (0.5 * p16 + 1.0 * (1 - p16))) < 1e-6)
    // selection headroom is monotone in n
    assert(r.getDouble(2) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(4))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q292: constant difference gives zero spread and empty tails") {
    // 50 tokens, 25 distinct ×2 → quality 1.0, distinct frac 0.5, d = 0.5 exactly
    val t = (1 to 25).flatMap(i => Seq.fill(2)(s"tok$i")).mkString(" ")
    val dir = corpusDir((1L to 4L).map(i => (i, t, "en", "s0")))
    val r = queries.Text.blandAltman.fn(spark, dir).collect()(0)
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(1) === 0.5)
    assert(r.getDouble(2) === 0.0)
    assert(r.getDouble(3) === 0.5 && r.getDouble(4) === 0.5)
    assert(r.getDouble(5) === 0.0)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q293: length ladder puts one doc per decile, shares telescope to 1") {
    val docs = (1 to 10).map { i =>
      (i.toLong, (1 to 10 * i).map(j => s"w$j").mkString(" "), "en", "s0")
    }
    val rows = queries.Corpus.tokenLorenz.fn(spark, corpusDir(docs)).collect()
    assert(rows.length === 10)
    rows.foreach(r => assert(r.getLong(1) === 1L))
    assert(rows.head.getLong(2) === 100L)  // decile 0 = the longest doc
    assert(math.abs(rows.head.getDouble(3) - 100.0 / 550.0) < 1e-6)
    assert(math.abs(rows.last.getDouble(4) - 1.0) < 1e-9)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q294: influence is the signed pull of each source on the corpus mean") {
    val hi = (1 to 25).flatMap(i => Seq.fill(2)(s"tok$i")).mkString(" ") // q=1.0
    val lo = Seq.fill(50)("the").mkString(" ")                           // q=0.5
    val dir = corpusDir(Seq(
      (1L, hi, "en", "sA"), (2L, hi, "en", "sA"),
      (3L, lo, "en", "sB"), (4L, lo, "en", "sB")))
    val out = queries.Curation.sourceInfluence.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("sA").getDouble(2) === 1.0 && out("sA").getDouble(3) === 0.5)
    assert(math.abs(out("sA").getDouble(4) - 0.25) < 1e-9)
    assert(math.abs(out("sB").getDouble(4) + 0.25) < 1e-9)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q291: hand-computed EM chain on a two-doc split") {
    // train (doc 0): "x y x y" → p1(y)=1/2, p2(y|x)=1; eval (doc 1): "x y"
    // λ1 = (λ0·1)/(λ0·1+(1−λ0)·½) = 2/3; λ2 = (2/3)/(2/3+1/6) = 0.8
    val dir = corpusDir(Seq(
      (0L, "x y x y", "en", "s0"), (1L, "x y", "en", "s0")))
    val r = queries.Corpus.deletedInterpolation.fn(spark, dir).collect()(0)
    assert(r.getLong(0) === 1L)
    assert(math.abs(r.getDouble(1) - 2.0 / 3.0) < 1e-6)
    assert(math.abs(r.getDouble(2) - 0.8) < 1e-6)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q295: a deterministic alternation has zero conditional entropy") {
    val dir = corpusDir(Seq(
      (1L, Seq.fill(20)("a b").mkString(" "), "en", "s0"),
      (2L, Seq.fill(20)("a b").mkString(" "), "en", "s0")))
    val r = queries.Corpus.bigramRedundancy.fn(spark, dir).collect()(0)
    val hc = r.getDouble(3)
    assert(hc === 0.0)
    assert(java.lang.Double.doubleToRawLongBits(hc) === 0L, "canonical +0.0")
    assert(r.getDouble(4) === 1.0)
    assert(math.abs(r.getDouble(2) - math.log(2.0)) < 1e-6) // uniform 2-type corpus
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q296: the water level lands in its closed-form bracket") {
    // avail 10/20/70, budget 50 → level 20, allocations 10+20+20
    def doc(id: Long, n: Int, src: String) =
      (id, (1 to n).map(j => s"${src}w$j").mkString(" "), "en", src)
    val dir = corpusDir(Seq(doc(1L, 10, "sA"), doc(2L, 20, "sB"), doc(3L, 70, "sC")))
    val out = queries.Curation.waterFilling.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    out.values.foreach(r => assert(r.getDouble(4) === 20.0))
    assert(out("sA").getDouble(2) === 10.0 && out("sA").getBoolean(3))
    assert(out("sB").getDouble(2) === 20.0 && out("sB").getBoolean(3))
    assert(out("sC").getDouble(2) === 20.0 && !out("sC").getBoolean(3))
    val allocated = out.values.map(_.getDouble(2)).sum
    assert(allocated === 50.0, "allocations exhaust the budget")
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q297: pure, mixed, and marker-free docs are counted apart") {
    val dir = corpusDir(Seq(
      (1L, Seq.fill(5)("the and of is").mkString(" "), "en", "sP"),  // pure en
      (2L, "the and of is der die das und", "en", "sM"),             // en+de mix
      (3L, "zz1 zz2 zz3 zz4 zz5", "zh", "sU")))                      // no markers
    val out = queries.Text.languageMix.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("sP").getLong(3) === 0L)
    assert(out("sM").getLong(3) === 1L && out("sM").getDouble(4) === 1.0)
    assert(out("sU").getLong(2) === 1L && out("sU").getLong(3) === 0L)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q298: twin sources sit at Delta 0, a different style reads > 0") {
    val styleA = "the the the and of is " + (1 to 10).map(i => s"a$i").mkString(" ")
    val styleB = (1 to 16).map(i => s"b$i").mkString(" ")
    val dir = corpusDir(Seq(
      (1L, styleA, "en", "sA"), (2L, styleA, "en", "sA2"),
      (3L, styleB, "en", "sB")))
    val out = queries.Corpus.burrowsDelta.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out(("sA", "sA2")) === 0.0)
    assert(out(("sA", "sB")) > 0.5)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q299: a copied mid-corpus doc contributes zero novelty") {
    val base = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = (0 to 9).map { i =>
      val text = if (i == 5) base else (1 to 10).map(j => s"d${i}w$j").mkString(" ")
      (i.toLong, text, "en", "s0")
    }.updated(0, (0L, base, "en", "s0"))
    val rows = queries.Corpus.noveltyCurve.fn(spark, corpusDir(docs)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!rows.contains(5L), "decile 5 (the copy) adds nothing new")
    assert(rows(0L).getLong(1) === 8L)  // 8 trigrams of the 10-token base doc
    val last = rows.values.maxBy(_.getLong(0))
    assert(math.abs(last.getDouble(3) - 1.0) < 1e-9)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q300: the fold finds the exact longest run") {
    val dir = corpusDir(Seq(
      (1L, "a a a b c", "en", "s0"),
      (2L, "x x x x x x y", "en", "s0"),
      (3L, "p q r s", "en", "s0")))
    val out = queries.Text.maxTokenRun.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(2) === 3L && !out(1L).getBoolean(3))
    assert(out(2L).getLong(2) === 6L && out(2L).getBoolean(3))
    assert(out(3L).getLong(2) === 1L && !out(3L).getBoolean(3))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q301: a constant corpus has no defined correlations; a varied one stays in [-1,1]") {
    val t = (1 to 30).map(i => s"w$i").mkString(" ")
    val flat = corpusDir((1L to 3L).map(i => (i, t, "en", "s0")))
    val rc = queries.Ml.signalCorrelation.fn(spark, flat).collect()
    assert(rc.length === 6)
    rc.foreach(r => assert(r.isNullAt(2), s"zero-variance pair must be NULL: $r"))
    val varied = queries.Ml.signalCorrelation.fn(spark, "/root/testdata/sf0.001")
      .collect()
    assert(varied.length === 6)
    varied.foreach { r =>
      assert(!r.isNullAt(2) && math.abs(r.getDouble(2)) <= 1.0 + 1e-9, s"$r")
    }
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q302: a separable gate peaks at J = 1 with TPR 1 / FPR 0") {
    // relevant docs (all-distinct tokens) all outscore irrelevant ones
    val hi = (1 to 50).map(i => s"a$i").mkString(" ")       // q=1.0, rel=1
    val lo = (1 to 10).flatMap(i => Seq.fill(4)(s"b$i")).mkString(" ") // q=0.9, rel=0
    val dir = corpusDir(Seq(
      (1L, hi, "en", "s0"), (2L, hi, "en", "s0"),
      (3L, lo, "en", "s0"), (4L, lo, "en", "s0")))
    val rows = queries.Ml.youdenThreshold.fn(spark, dir).collect()
    val best = rows.filter(_.getBoolean(4))
    assert(best.length === 1)
    assert(best(0).getDouble(0) === 1.0)    // the separating threshold
    assert(best(0).getDouble(1) === 1.0 && best(0).getDouble(2) === 0.0)
    assert(best(0).getDouble(3) === 1.0)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q274: identical groups give obs_diff +0.0 and p-value 1") {
    val t = (1 to 40).map(i => s"tok$i").mkString(" ")
    val dir = corpusDir(
      (1L to 8L).map(i => (i, t, if (i % 2 == 0) "en" else "de", "s0")))
    val r = Ml.permutationTest.fn(spark, dir).collect()(0)
    val obs = r.getDouble(2)
    assert(obs === 0.0)
    assert(java.lang.Double.doubleToRawLongBits(obs) === 0L, "canonical +0.0")
    assert(r.getLong(3) === 64L)
    assert(r.getLong(4) === 64L)  // every null gap |d| ≥ 0 = obs
    assert(r.getDouble(5) === 1.0)
    graft.dedup.Dedup.clearCaches(spark)
  }
}
