package graft

import org.apache.spark.sql.functions._
import graft.queries.{Corpus, Curation, Embeddings, Preference, Text}

/** Semantic pins for the round-8 additions q219–q227 on crafted
  * fixtures. The DuckDB oracle pins cross-engine equality; these pin
  * the semantics themselves: Bradley-Terry ordering and normalization,
  * the Wilson small-sample rank flip, diminishing-returns accounting,
  * contamination grading, Naive-Bayes separability, power-iteration
  * eigenvector recovery, dispersion extremes, kappa's perfect-
  * agreement and degenerate paths, and CDC chunking's insertion
  * robustness (the property fixed windows lack).
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def embDir(rows: Seq[(Long, Array[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pipe_emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** doc_id lands in the q81/q222/q223 eval split. */
  private def isEvalId(id: Long): Boolean = md5hex(id.toString).take(4) < "28f5"

  // quality = min(1, n/50)·0.5 + (1 − stopRatio)·0.5; all-distinct
  // non-stopword tokens make it a pure length function
  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("q219: Bradley-Terry orders a dominance chain and normalizes to 1") {
    // spaced id pairs so only intended battles form (the synthesis
    // pairs EVERY adjacent id); A beats B ×2, A beats C ×2, B beats C ×2
    val dir = corpusDir(Seq(
      (10L, words("a", 40), "en", "srcA"), (11L, words("b", 10), "en", "srcB"),
      (20L, words("c", 40), "en", "srcA"), (21L, words("d", 10), "en", "srcB"),
      (30L, words("e", 40), "en", "srcA"), (31L, words("f", 10), "en", "srcC"),
      (40L, words("g", 40), "en", "srcA"), (41L, words("h", 10), "en", "srcC"),
      (50L, words("i", 40), "en", "srcB"), (51L, words("j", 10), "en", "srcC"),
      (60L, words("k", 40), "en", "srcB"), (61L, words("l", 10), "en", "srcC")))
    val rows = Preference.bradleyTerry.fn(spark, dir).collect()
    val byId = rows.map(r => r.getAs[String]("source") -> r).toMap
    assert(byId("srcA").getAs[Long]("wins") === 4L)
    assert(byId("srcA").getAs[Long]("losses") === 0L)
    assert(byId("srcB").getAs[Long]("wins") === 2L)
    assert(byId("srcC").getAs[Long]("losses") === 4L)
    val p = rows.map(r => r.getAs[String]("source") -> r.getAs[Double]("bt_strength")).toMap
    assert(p("srcA") > p("srcB") && p("srcB") > p("srcC"),
      s"BT must order the dominance chain: $p")
    assert(math.abs(p.values.sum - 1.0) < 1e-5, s"strengths normalize: ${p.values.sum}")
  }

  test("q220: Wilson lower bound demotes a 1-game 100% record below an 8/10 one") {
    // srcA beats srcB once; srcA vs srcC ten times, 8 wins — the naive
    // rate ranks B-battles first (1.0 > 0.8), Wilson flips the order
    val base = Seq((100L, words("a", 40), "en", "srcA"), (101L, words("b", 10), "en", "srcB"))
    val cWins = Seq(2, 5) // battle indices srcC wins (A loses)
    val ac = (0 until 10).flatMap { k =>
      val (la, lc) = if (cWins.contains(k)) (10, 40) else (40, 10)
      Seq((200L + 10 * k, words(s"p$k", la), "en", "srcA"),
        (201L + 10 * k, words(s"q$k", lc), "en", "srcC"))
    }
    val dir = corpusDir(base ++ ac)
    val rows = Preference.wilsonHeadToHead.fn(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("opponent")) -> r).toMap
    val ab = rows(("srcA", "srcB"))
    val ac2 = rows(("srcA", "srcC"))
    assert(ab.getAs[Double]("win_rate") === 1.0 && ab.getAs[Long]("games") === 1L)
    assert(ac2.getAs[Double]("win_rate") === 0.8 && ac2.getAs[Long]("games") === 10L)
    assert(ab.getAs[Double]("wilson_lb") < ac2.getAs[Double]("wilson_lb"),
      "1/1 must bound below 8/10")
    assert(ab.getAs[Int]("rank_rate") === 1 && ab.getAs[Int]("rank_lb") === 2)
    assert(ab.getAs[Boolean]("conservative_flip") && ac2.getAs[Boolean]("conservative_flip"))
  }

  test("q221: a duplicated source draws more budget but buys less value per token") {
    // srcU: 8 unique 30-token docs; srcD: 2 unique docs × 4 copies
    val u = (0 until 8).map(i => (300L + i, words(s"u$i", 30), "en", "srcU"))
    val d = (0 until 8).map(i => (400L + i, words(s"d${i % 2}", 30), "en", "srcD"))
    val dir = corpusDir(u ++ d)
    val rows = Curation.dataConstrainedEpochs.fn(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val (su, sd) = (rows("srcU"), rows("srcD"))
    assert(su.getAs[Long]("raw_tokens") === 240L && su.getAs[Long]("uniq_tokens") === 240L)
    assert(sd.getAs[Long]("raw_tokens") === 240L && sd.getAs[Long]("uniq_tokens") === 60L)
    // equal raw mass → equal allocation; scarce-unique side repeats more
    assert(su.getAs[Long]("alloc_tokens") === sd.getAs[Long]("alloc_tokens"))
    assert(sd.getAs[Double]("epochs") > 3 * su.getAs[Double]("epochs"))
    assert(sd.getAs[Double]("value_ratio") < su.getAs[Double]("value_ratio"),
      "repetition must be priced below fresh data")
    rows.values.foreach { r =>
      assert(r.getAs[Double]("effective_tokens") <= r.getAs[Long]("alloc_tokens") + 1e-6)
    }
  }

  test("q222: contamination grades full, partial, and zero shingle overlap") {
    val evalIds = (1L to 400L).filter(isEvalId)
    val trainIds = (1L to 400L).filterNot(isEvalId)
    val (e1, e2, e3) = (evalIds(0), evalIds(1), evalIds(2))
    val shared = words("s", 12) // 10 shingles, all shared with train doc
    // partial: first 5 tokens shared with a train doc (3 shared shingles
    // of its 8), rest novel
    val partial = (1 to 5).map(i => s"s$i").mkString(" ") + " " + words("nv", 5)
    val dir = corpusDir(Seq(
      (e1, shared, "en", "srcA"),
      (e2, partial, "en", "srcA"),
      (e3, words("zz", 10), "en", "srcA"),
      (trainIds(0), shared, "en", "srcB"),
      (trainIds(1), words("tt", 20), "en", "srcB")))
    val rows = Text.contaminationFraction.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(e1).getAs[Double]("overlap_frac") === 1.0)
    assert(rows(e1).getAs[Boolean]("contaminated"))
    val pf = rows(e2).getAs[Double]("overlap_frac")
    assert(pf > 0.0 && pf < 1.0, s"partial overlap must grade between: $pf")
    assert(rows(e2).getAs[Long]("n_hit") === 3L)
    assert(rows(e3).getAs[Double]("overlap_frac") === 0.0)
    assert(!rows(e3).getAs[Boolean]("contaminated"))
  }

  test("q223: Naive Bayes recovers a disjoint-vocabulary source split exactly") {
    val evalIds = (1L to 600L).filter(isEvalId)
    val trainIds = (1L to 600L).filterNot(isEvalId)
    // two sources with disjoint vocabularies, every token df ≥ 5
    val aText = "apple avocado apricot almond apple avocado apricot almond"
    val bText = "birch beech basil barley birch beech basil barley"
    val train = trainIds.take(12).zipWithIndex.map { case (id, i) =>
      if (i % 2 == 0) (id, aText, "en", "srcA") else (id, bText, "en", "srcB")
    }
    val eval = Seq(
      (evalIds(0), "apple almond avocado", "en", "srcA"),
      (evalIds(1), "basil birch barley", "en", "srcB"),
      (evalIds(2), "apricot apple", "en", "srcA"))
    val dir = corpusDir(train ++ eval)
    val rows = Text.nbSourceClassifier.fn(spark, dir).collect()
      .map(r => (r.getAs[String]("true_source"), r.getAs[String]("pred_source")) ->
        r.getAs[Long]("n_docs")).toMap
    assert(rows === Map(("srcA", "srcA") -> 2L, ("srcB", "srcB") -> 1L),
      s"confusion must be diagonal: $rows")
  }

  test("q224: power iteration recovers the dominant direction of rank-1 data") {
    // x_i = t_i · w for w = (0.6, 0.8, 0, 0): after centering the data
    // stays rank-1 along w, so loadings → ±w and the share → 1
    val ts = Seq(-3f, -1f, 0f, 2f, 5f, -2f, 4f, 1f)
    val vecs = ts.zipWithIndex.map { case (t, i) =>
      (i.toLong, Array(0.6f * t, 0.8f * t, 0f, 0f), 0)
    }
    val dir = embDir(vecs)
    val rows = Embeddings.pcaPower.fn(spark, dir).collect()
      .map(r => r.getAs[Int]("dim") -> r).toMap
    val l1 = rows(1).getAs[Double]("loading")
    val l2 = rows(2).getAs[Double]("loading")
    assert(math.abs(math.abs(l1) - 0.6) < 1e-3, s"dim1 loading $l1")
    assert(math.abs(math.abs(l2) - 0.8) < 1e-3, s"dim2 loading $l2")
    assert(l1 * l2 > 0, "loadings carry one consistent sign")
    assert(math.abs(rows(3).getAs[Double]("loading")) < 1e-6)
    assert(math.abs(rows(1).getAs[Double]("top_var_share") - 1.0) < 1e-3)
  }

  test("q225: dispersion extremes — collapsed, antipodal, singleton, zero-norm") {
    val dir = embDir(Seq(
      // label 0: three copies of one direction (+ a zero vector, excluded)
      (1L, Array(1f, 0f, 0f, 0f), 0), (2L, Array(2f, 0f, 0f, 0f), 0),
      (3L, Array(5f, 0f, 0f, 0f), 0), (4L, Array(0f, 0f, 0f, 0f), 0),
      // label 1: antipodal pair
      (5L, Array(0f, 1f, 0f, 0f), 1), (6L, Array(0f, -1f, 0f, 0f), 1),
      // label 2: singleton
      (7L, Array(0f, 0f, 3f, 0f), 2)))
    val rows = Embeddings.embeddingDispersion.fn(spark, dir).collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    assert(rows(0).getAs[Long]("n_vecs") === 3L, "zero-norm vector excluded")
    assert(math.abs(rows(0).getAs[Double]("mean_resultant") - 1.0) < 1e-6)
    assert(math.abs(rows(0).getAs[Double]("avg_pair_cos") - 1.0) < 1e-6)
    assert(math.abs(rows(1).getAs[Double]("mean_resultant")) < 1e-6)
    assert(math.abs(rows(1).getAs[Double]("avg_pair_cos") + 1.0) < 1e-6)
    assert(rows(2).isNullAt(rows(2).fieldIndex("avg_pair_cos")),
      "singleton pairwise mean is undefined")
  }

  test("q226: kappa hits 1 on coinciding filters and 0 against a constant one") {
    // doc i = the k_i = 6+6i cyclic letter-pairs over a k_i-letter
    // alphabet: token count AND char diversity both grow with i, so the
    // quality and entropy median splits coincide → κ = 1; tokens are
    // all-distinct per doc → repetition is 0 everywhere → a constant
    // filter agrees exactly as often as chance predicts (po = pe) →
    // κ = 0, and the cancelling subtraction exercises the signed-zero
    // normalization
    val pool = "bcdefghijklmnopqrstuvwxyzBCDEFGHIJKLMNOPQRSTUVWXYZ"
    val dir = corpusDir((1 to 6).map { i =>
      val k = 6 + 6 * i
      val text = (0 until k)
        .map(j => s"${pool(j)}${pool((j + 1) % k)}").mkString(" ")
      (i.toLong, text, "en", "s0")
    })
    val rows = Text.filterKappa.fn(spark, dir).collect()
      .map(r => (r.getAs[String]("filter_a"), r.getAs[String]("filter_b")) -> r).toMap
    val qe = rows(("quality", "entropy"))
    assert(qe.getAs[Double]("agree_rate") === 1.0)
    assert(qe.getAs[Double]("kappa") === 1.0)
    val qr = rows(("quality", "repetition"))
    val er = rows(("entropy", "repetition"))
    assert(qr.getAs[Double]("kappa") === 0.0, "constant filter ⇒ κ = 0, not -0.0")
    assert(er.getAs[Double]("kappa") === 0.0)
    assert(java.lang.Double.doubleToRawLongBits(qr.getAs[Double]("kappa")) === 0L,
      "the cancelled numerator must normalize to +0.0")
  }

  test("q228: Good-Turing counts hapaxes and Chao1 NULLs without doubletons") {
    val dir = corpusDir(Seq(
      (1L, "x1 x1 x2 x2 x3", "en", "srcX"),  // n1=1, n2=2 → chao1 = 3.25
      (2L, "y1 y1 y2 y2", "en", "srcY"),     // n1=0 → p_unseen 0, chao1 = V
      (3L, "z1 z2", "en", "srcZ")))          // n2=0 → chao1 undefined
    val rows = Corpus.goodTuring.fn(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val x = rows("srcX")
    assert(x.getAs[Long]("n_tokens") === 5L && x.getAs[Long]("vocab") === 3L)
    assert(x.getAs[Long]("n1") === 1L && x.getAs[Long]("n2") === 2L)
    assert(x.getAs[Double]("p_unseen") === 0.2)
    assert(x.getAs[Double]("chao1_vocab") === 3.25)
    assert(rows("srcY").getAs[Double]("p_unseen") === 0.0)
    assert(rows("srcY").getAs[Double]("chao1_vocab") === 2.0)
    val z = rows("srcZ")
    assert(z.isNullAt(z.fieldIndex("chao1_vocab")), "n2=0 ⇒ Chao1 undefined")
  }

  test("q229: burstiness separates a clumped term from a uniformly spread one") {
    // "fn" once in every doc → Poisson-flat, VMR = 0 (the cancelled
    // variance must normalize to +0.0); "ct" 4× in one doc → VMR = 3
    val dir = corpusDir(Seq(
      (1L, "fn ct ct ct ct", "en", "s0"),
      (2L, "fn pad", "en", "s0"),
      (3L, "fn pad", "en", "s0"),
      (4L, "fn pad", "en", "s0")))
    val rows = Corpus.tokenBurstiness.fn(spark, dir).collect()
      .map(r => r.getAs[String]("tok") -> r).toMap
    assert(rows("ct").getAs[Int]("rank") === 1, "count tie breaks by token")
    assert(rows("ct").getAs[Double]("vmr") === 3.0)
    assert(rows("ct").getAs[Double]("repeat_rate") === 0.75)
    assert(rows("fn").getAs[Double]("vmr") === 0.0)
    assert(java.lang.Double.doubleToRawLongBits(rows("fn").getAs[Double]("vmr")) === 0L)
    assert(rows("fn").getAs[Double]("repeat_rate") === 0.0)
    assert(rows("fn").getAs[Long]("doc_freq") === 4L)
  }

  test("q227: content-defined chunks realign after a prefix insertion") {
    // find a boundary token (md5 starts '0') and filler tokens that
    // are not boundaries — chunk structure is then fully determined
    val bnd = (1 to 10000).map(i => s"t$i").find(t => md5hex(t).startsWith("0")).get
    def plain(p: String, n: Int) =
      (1 to n).map(i => s"$p$i").filterNot(t => md5hex(t).startsWith("0"))
    val fill = plain("w", 40).take(9)
    assert(fill.size === 9)
    // T = f0 f1 f2 BND f3 f4 f5 BND f6 f7 f8 → chunks [f0 f1 f2],
    // [BND f3 f4 f5], [BND f6 f7 f8]
    val t = Seq(fill(0), fill(1), fill(2), bnd, fill(3), fill(4), fill(5),
      bnd, fill(6), fill(7), fill(8)).mkString(" ")
    val zz = plain("zz", 50).head
    val dir = corpusDir(Seq(
      (1L, t, "en", "s1"),
      (2L, s"$zz $t", "en", "s2"))) // prefix insertion
    val rows = Corpus.cdcChunks.fn(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // both docs cut into 3 chunks; the two boundary-started chunks
    // realign despite the shifted prefix — only the head chunk differs
    assert(rows("s1").getAs[Long]("n_chunks") === 3L)
    assert(rows("s2").getAs[Long]("n_chunks") === 3L)
    assert(rows("s1").getAs[Long]("shared_chunks") === 2L)
    assert(rows("s2").getAs[Long]("shared_chunks") === 2L)
    assert(rows("s1").getAs[Long]("shared_tokens") === 8L)
    assert(rows("s1").getAs[Double]("shared_token_frac") === math.rint(8.0 / 11 * 10000) / 10000)
  }
}
