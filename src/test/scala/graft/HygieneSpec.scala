package graft

import org.apache.spark.sql.functions._
import graft.queries.{Corpus, Curation, Embeddings, Etl, Events, Privacy, Search, Text}

/** Semantic pins for the round-8 hygiene/audit family (q230–q235) on
  * crafted fixtures — the oracle pins cross-engine equality; these pin
  * the semantics: rule boundaries, novelty accounting, agreement
  * degeneracies, contribution capping, drift detection, and the
  * diversity/relevance trade MMR exists to make.
  */
class HygieneSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_hyg").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def embDir(rows: Seq[(Long, Array[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_hyg_emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q230: each rule fails exactly the doc built to fail it") {
    // pass-all: 30 varied tokens incl. 2 stopwords, mean word len ~4
    val good = ("the a " + (1 to 28).map(i => f"tok$i%02d").mkString(" "))
    // too short: 10 tokens (r_len), but varied enough for other rules
    val short = "the a zero ones twos three fours five sixes seven"
    // dominated: one token 20/28 ≈ 0.71 share → fails r_dom AND r_uniq
    val dom = ("the a " + Seq.fill(20)("spam").mkString(" ") + " " +
      (1 to 6).map(i => s"pad$i").mkString(" "))
    val dir = corpusDir(Seq(
      (1L, good, "en", "sGood"), (2L, short, "en", "sShort"), (3L, dom, "en", "sDom")))
    val out = Text.gopherRules.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("sGood").getDouble(7) === 1.0, "pass_all for the clean doc")
    assert(out("sShort").getDouble(2) === 0.0, "pass_len fails the 10-token doc")
    assert(out("sShort").getDouble(7) === 0.0)
    assert(out("sDom").getDouble(6) === 0.0, "pass_dom fails the spam doc")
    assert(out("sDom").getDouble(5) === 0.0, "pass_uniq fails the spam doc")
    assert(out("sDom").getDouble(2) === 1.0, "length rule alone is fine")
  }

  test("q231: duplicated corpus has novelty 1.0 in batch 0 and 0.0 after") {
    val text = (1 to 12).map(i => s"w$i").mkString(" ")
    val dir = corpusDir((0L until 10L).map(i => (i, text, "en", "s0")))
    val out = Corpus.batchNovelty.fn(spark, dir).collect()
    assert(out.length === 10)
    assert(out.head.getInt(0) === 0 && out.head.getDouble(3) === 1.0)
    out.tail.foreach { r =>
      assert(r.getDouble(3) === 0.0, s"batch ${r.getInt(0)} must be all-seen")
      assert(r.getLong(1) === out.head.getLong(1), "same distinct shingles per batch")
    }
  }

  test("q231: fully novel batches stay at novelty 1.0") {
    val dir = corpusDir((0L until 10L).map(i =>
      (i, (1 to 12).map(j => s"b${i}w$j").mkString(" "), "en", "s0")))
    val out = Corpus.batchNovelty.fn(spark, dir).collect()
    assert(out.forall(_.getDouble(3) === 1.0))
  }

  test("q232: unanimity NULLs kappa (Pe = 1); perfect split agreement gives 1.0") {
    // en: every doc passes all three raters (60 varied tokens, quality
    // ≥ 0.9, unique fraction 1.0) → p = 1, Pe = 1 → kappa NULL
    val pass = (1 to 60).map(i => f"tok$i%02d").mkString(" ")
    // fr: half pass all, half fail all (stopword-only 10-token doc:
    // quality < 0.9, short, low uniqueness) → raters agree perfectly
    // on every doc but split the corpus → kappa = 1
    val fail = "the the the the the a a a a a"
    val dir = corpusDir(
      (1L to 4L).map(i => (i, pass, "en", "s0")) ++
        (5L to 6L).map(i => (i, pass, "fr", "s0")) ++
        (7L to 8L).map(i => (i, fail, "fr", "s0")))
    val out = Text.fleissKappa.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("en").isNullAt(4), "unanimous corpus has undefined kappa")
    assert(out("en").getDouble(2) === 1.0)
    assert(out("fr").getDouble(4) === 1.0, "perfect agreement on a split corpus")
  }

  test("q233: a hyperactive user is capped at 5 contributions per type") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hyg_ev").toString
    // user 1: 100 'click' events; user 2: one — capped count = 6
    val rows = (1L to 100L).map(i =>
      (i, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1L, "click", 1.0, "{}")) :+
      (101L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 2L, "click", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = Privacy.userLevelDp.fn(spark, dir).collect()
    assert(out.length === 1)
    // replay the mechanism: capped n = 6, key rank kk = 1, b = k/ε = 5
    val h = ((1L * 2654435761L + 42L) % 1000003L).toDouble
    val u = (h + 0.5) / 1000003.0 - 0.5
    val expected = BigDecimal(math.max(0.0, 6.0 + -5.0 * math.signum(u) * math.log(1 - 2 * math.abs(u))))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head.getDouble(1) === expected)
    // DP sanity: the release moved off the true count but stays within
    // plausible Laplace(5) range of it
    assert(math.abs(out.head.getDouble(1) - 6.0) < 5.0 * math.log(1000003.0))
  }

  test("q234: an untouched dim reads stable, a shifted dim reads shifted") {
    // 40 vectors; dim 0 is i%7 in both halves (stable), dim 1 jumps by
    // +100 in the second half (every current row lands in the clamp
    // bin) → PSI far above 0.25
    val rows = (0L until 40L).map { i =>
      val shift = if (i >= 20) 100f else 0f
      (i, Array((i % 7).toFloat, (i % 5).toFloat + shift), 0)
    }
    val out = Embeddings.embeddingPsi.fn(spark, embDir(rows)).collect()
    val byDim = out.map(r => r.getInt(0) -> r).toMap
    assert(byDim(0).getString(2) === "stable")
    assert(byDim(0).getDouble(1) < 0.1)
    assert(byDim(1).getString(2) === "shifted")
    assert(byDim(1).getDouble(1) > 0.25)
  }

  test("q235: MMR prefers a diverse lower-rel hit over a near-duplicate") {
    // query 0 with two near-identical high-rel candidates (3, 4) and a
    // moderately relevant diverse one (5): pure rel ranks 3,4,5 but
    // MMR's round 2 penalizes 4 by its ~1.0 sim to the already-picked
    // 3 and takes 5 instead. vec_ids 1,2 exist because the query panel
    // is (0,1,2); their rankings aren't asserted.
    // 3 and 4 sit on the same side of the query's orthogonal axis
    // (sim(3,4) ≈ 1); 5 mirrors to the other side: same relevance
    // (≈ 0.9) but only ≈ 0.64 similarity to 3, so round 2 reads
    // 0.7·0.9 − 0.3·0.64 ≈ 0.44 for 5 vs 0.63 − 0.3 ≈ 0.33 for 4.
    def v(x: Float, y: Float, z: Float) = Array(x, y, z)
    val rows = Seq(
      (0L, v(1f, 0f, 0f), 0), (1L, v(0f, 1f, 0f), 0), (2L, v(0f, 0f, 1f), 0),
      (3L, v(0.91f, 0.414f, 0f), 0),  // rel ≈ .910
      (4L, v(0.90f, 0.436f, 0f), 0),  // rel ≈ .900, near-dup of 3
      (5L, v(0.90f, -0.436f, 0f), 0), // rel ≈ .900, diverse mirror
      (6L, v(-1f, 0f, 0f), 0))        // anti-correlated filler
    val out = Search.mmrRerank.fn(spark, embDir(rows)).collect()
      .filter(_.getLong(0) == 0L).sortBy(_.getInt(1))
    assert(out.head.getLong(2) === 3L, "rank 1 is pure relevance")
    assert(out(1).getLong(2) === 5L,
      s"rank 2 must be the diverse hit, got ${out(1).getLong(2)}")
    assert(out(2).getLong(2) === 4L, "the near-dup drops to rank 3")
    // scores are monotone non-increasing only within what MMR promises:
    // each round's winner beat that round's alternatives, so just pin
    // the count and rel of the top pick
    assert(out.length === 5)
  }

  test("q236: the exponential mechanism lands inside the high-utility band") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hyg_ord").toString
    // 100 orders at ~66k (bucket 5), 100 at ~246k (bucket 20): every
    // candidate in [5, 20) splits the corpus exactly in half (utility
    // 0); all others sit at utility -100 — a 50-nat log-weight gap no
    // bounded Gumbel draw can cross
    ((1L to 100L).map(i => (i, i % 4, "F", 66000.0, java.sql.Date.valueOf("2024-01-01"), "1-URGENT")) ++
      (101L to 200L).map(i => (i, i % 4, "F", 246000.0, java.sql.Date.valueOf("2024-01-01"), "1-URGENT")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val out = Privacy.dpMedian.fn(spark, dir).collect()
    assert(out.length === 1)
    val med = out.head.getDouble(0)
    assert(med > 12000.0 * 5 && med <= 12000.0 * 20, s"dp median $med")
    // full mechanism replay: the winner is the zero-utility candidate
    // with the largest deterministic Gumbel key
    val expected = (5 until 20).map { i =>
      val h = ((i.toLong * 2654435761L + 7L) % 1000003L).toDouble
      val g = -math.log(-math.log((h + 0.5) / 1000003.0))
      (g, i)
    }.maxBy(x => (x._1, -x._2))._2
    assert(med === 12000.0 * (expected + 1))
  }

  test("q237: a language the gate decimates is flagged by the four-fifths rule") {
    val good = (1 to 60).map(i => f"tok$i%02d").mkString(" ")
    val bad = "the the a a of of to to in in"
    val dir = corpusDir(
      (1L to 4L).map(i => (i, good, "en", "s0")) ++
        (5L to 8L).map(i => (i, bad, "fr", "s0")))
    val out = Curation.filterParity.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("en").getDouble(3) === 1.0)
    assert(out("en").getDouble(4) === 1.0 && !out("en").getBoolean(5))
    assert(out("fr").getDouble(3) === 0.0)
    assert(out("fr").getDouble(4) === 0.0 && out("fr").getBoolean(5))
  }

  test("q238: a 1:3 token skew prices as weights 2 and 2/3; balance gives ESS 1") {
    val doc = (1 to 25).map(i => s"w$i").mkString(" ")
    val skew = corpusDir(Seq((1L, doc, "en", "sA")) ++
      (2L to 4L).map(i => (i, doc, "en", "sB")))
    val rows = Curation.importanceReweight.fn(spark, skew).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("sA").getDouble(4) === 2.0)
    assert(rows("sB").getDouble(4) === 0.6667)
    val ess = rows("TOTAL").getDouble(5)
    assert(ess > 0.0 && ess < 1.0, s"skew must cost effective sample size, got $ess")
    val flat = corpusDir(Seq((1L, doc, "en", "sA"), (2L, doc, "en", "sB")))
    val fr = Curation.importanceReweight.fn(spark, flat).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(fr("TOTAL").getDouble(5) === 1.0, "uniform mixture has full ESS")
    assert(fr("sA").getDouble(4) === 1.0)
  }

  test("q239: the planted outlier ranks first; zero-variance dims are excluded") {
    // dim 2 is constant (zero variance — must drop out of d); vec 9
    // sits far outside the cluster on dims 0/1
    val rows = (0L until 9L).map(i =>
      (i, Array((i % 3).toFloat, (i % 2).toFloat, 5f), 0)) :+
      ((9L, Array(50f, -40f, 5f), 0))
    val out = Embeddings.mahalanobisOod.fn(spark, embDir(rows)).collect()
    assert(out.head.getInt(0) === 1 && out.head.getLong(1) === 9L)
    assert(out.head.getDouble(2) > out(1).getDouble(2) * 10,
      "the outlier must dominate the next distance")
    // md2_per_dim divides by the 2 informative dims, not 3
    val r0 = out.head
    assert(math.abs(r0.getDouble(3) - r0.getDouble(2) / 2.0) < 1e-6)
  }

  test("q240: clean twins link, a mangled name degrades to possible, strangers don't link") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hyg_cust").toString
    // keys 1..4: untouched twins (all three fields agree → link);
    // key 5: %5 mangles the dirty name → possible; all share nation 0
    // and balance bucket 0, so every clean×dirty pair is a candidate
    (1L to 5L).map(i => (i, s"Customer#$i", 0, 100.0 + 10 * i, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val out = Etl.recordLinkage.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("link").getLong(1) === 4 && out("link").getDouble(3) === 1.0)
    assert(out("possible").getLong(1) === 1 && out("possible").getLong(2) === 1,
      "the name-mangled twin must fall to possible, not vanish")
    assert(out("non_link").getLong(2) === 0, "no true pair may score below 2")
    assert(out("zz_blocking").getDouble(3) === 1.0, "tight balances never cross blocks")
  }

  test("q241: z-order prunes both dimensions; a single-column sort prunes only its own") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hyg_zord").toString
    // 1024 orders: custkey 0..1023, day decorrelated via (i*37)%1024,
    // natural order scrambled via (i*613)%1024 (613 coprime to 1024)
    (0L until 1024L).map { i =>
      ((i * 613) % 1024, i, "F", 100.0,
        java.sql.Timestamp.valueOf(java.time.LocalDateTime.of(1992, 1, 1, 0, 0)
          .plusDays((i * 37) % 1024)), "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val out = Etl.zorderLayout.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // the single-column sort is perfect on its own dim, blind on the other
    assert(out(("b_custsort", "custkey")) <= 2.0 / 32 + 0.01)
    assert(out(("b_custsort", "day")) > 0.8)
    // z-order beats natural on BOTH dims — the case for interleaving
    assert(out(("c_zorder", "custkey")) < out(("a_natural", "custkey")))
    assert(out(("c_zorder", "day")) < out(("a_natural", "day")))
    assert(out(("c_zorder", "day")) < out(("b_custsort", "day")))
  }

  test("q242: two disconnected co-purchase triangles converge to two communities") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hyg_lpa").toString
    // 190 customers buy from suppliers {1,2,3}, another 190 from
    // {4,5,6}: every within-group supplier pair clears the >=190
    // shared-customer projection threshold, no cross edge exists
    val custs = (1L to 190L).map(c => (c, Seq(1L, 2L, 3L))) ++
      (201L to 390L).map(c => (c, Seq(4L, 5L, 6L)))
    custs.map { case (c, _) => (c, c, "F", 100.0,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    custs.flatMap { case (c, sps) => sps.map(sp => (c, sp)) }
      .toDF("l_orderkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = graft.queries.Graph.labelPropagation.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 4L -> 3L),
      "each triangle adopts its smallest supplier id as the community label")
  }

  test("q243: a 7-day-old event carries exactly half the weight of a fresh one") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hyg_dec").toString
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-31 00:00:00"), 1L, "click", 10.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-24 00:00:00"), 1L, "click", 10.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = Events.decayedPopularity.fn(spark, dir).collect()
    assert(out.length === 1)
    assert(out.head.getDouble(2) === 1.5)   // 1.0 + 0.5
    assert(out.head.getDouble(3) === 15.0)  // 10 + 5
    assert(out.head.getDouble(4) === 0.75)
  }

  test("q244: hand-built cells recover DiD = 1; an empty cell NULLs the estimate") {
    def ev(id: Long, uid: Long, day: Int, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00"), uid, "click", v, "{}")
    val dir = java.nio.file.Files.createTempDirectory("graft_hyg_did").toString
    // treat (uid 1): pre mean 1, post mean 3; control (uid 0): 1 -> 2
    Seq(ev(1, 1, 1, 1.0), ev(2, 1, 20, 3.0), ev(3, 0, 1, 1.0), ev(4, 0, 20, 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = Events.diffInDiff.fn(spark, dir).collect().head
    assert(out.getDouble(6) === 1.0, s"DiD, got ${out.getDouble(6)}")
    assert(out.getDouble(2) === 1.0 && out.getDouble(3) === 3.0)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_hyg_did2").toString
    Seq(ev(1, 1, 1, 1.0), ev(3, 0, 1, 1.0), ev(4, 0, 20, 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir2/events.parquet")
    val out2 = Events.diffInDiff.fn(spark, dir2).collect().head
    assert(out2.isNullAt(6), "missing treat-post cell must NULL the estimate")
  }

  test("q245: a flat series holds level with +0.0 trend; a ramp learns its slope") {
    def ev(id: Long, day: Int, typ: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), 1L, typ, v, "{}")
    val dir = java.nio.file.Files.createTempDirectory("graft_hyg_holt").toString
    val rows = (1 to 20).map(d => ev(d, d, "flat", 7.5)) ++
      (1 to 20).map(d => ev(100 + d, d, "ramp", d.toDouble))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = Events.holtForecast.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("flat").getDouble(2) === 7.5)
    assert(out("flat").getDouble(3) === 0.0)
    assert(java.lang.Double.doubleToRawLongBits(out("flat").getDouble(3)) === 0L,
      "flat trend must be +0.0, not -0.0")
    assert(out("flat").getDouble(4) === 7.5)
    // the ramp's learned trend approaches the true slope 1/day and the
    // 3-day forecast extrapolates ahead of the level
    assert(out("ramp").getDouble(3) > 0.5, s"trend ${out("ramp").getDouble(3)}")
    assert(out("ramp").getDouble(4) > out("ramp").getDouble(2))
  }
}
