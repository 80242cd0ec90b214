package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-9 warehouse/curation additions on
  * crafted fixtures — the math/behavior itself, complementing the
  * cross-engine oracle: q311 must DROP a fully-retracted group, q313
  * must report zero residual PII after its own redaction, q315's
  * banding curve must be monotone (more bands ⇒ lower implied
  * threshold ⇒ higher expected recall).
  */
class RoundNineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q311: a fully-retracted group drops from the maintained view") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_ivm").toString
    Seq((1, 10), (2, 20)).toDF("c_custkey", "c_nationkey")
      .write.parquet(s"$dir/customer.parquet")
    // nation 10's orders are ALL in the delete batch (o_orderkey % 97
    // == 0); nation 20 keeps two of three
    Seq((97L, 1, 100.0), (194L, 1, 50.0),
      (1L, 2, 10.0), (2L, 2, 20.0), (291L, 2, 30.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val out = queries.Etl.ivmRetract.fn(spark, dir).collect()
    assert(out.length === 1, "fully-retracted nation must drop from the view")
    assert(out.head.getInt(0) === 20)
    assert(out.head.getLong(1) === 2L)
    assert(out.head.getDouble(2) === 30.0)
  }

  test("q313: the audit reports planted PII before and ZERO residual after") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_pii").toString
    (1L to 6L).map(i => (i, "alpha beta gamma", "en", s"s${i % 2}"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val rows = queries.Curation.redactionAudit.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === Set("email", "phone"))
    for ((p, r) <- rows) {
      assert(r.getLong(r.fieldIndex("hits_before")) >= 6L, s"$p before")
      assert(r.getLong(r.fieldIndex("hits_after")) === 0L, s"$p residual")
    }
  }

  test("q315: more bands lowers the implied threshold and raises expected recall") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_lsh").toString
    // two near-dup pairs (~0.6 Jaccard) + unrelated docs
    val a = (1 to 12).map(i => s"tok$i").mkString(" ")
    val a2 = ((1 to 9).map(i => s"tok$i") ++ Seq("x1", "x2", "x3")).mkString(" ")
    val b = (20 to 32).map(i => s"tok$i").mkString(" ")
    val b2 = ((20 to 29).map(i => s"tok$i") ++ Seq("y1", "y2", "y3")).mkString(" ")
    val c = (50 to 70).map(i => s"tok$i").mkString(" ")
    Seq((1L, a), (2L, a2), (3L, b), (4L, b2), (5L, c))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val out = queries.Text.lshBandPlanner.fn(spark, dir).collect()
      .sortBy(_.getLong(0))
    assert(out.length === 5)
    val thresholds = out.map(_.getDouble(out.head.fieldIndex("implied_threshold")))
    assert(thresholds.sliding(2).forall { case Array(x, y) => y < x },
      s"implied threshold must fall with bands: ${thresholds.toSeq}")
    val recalls = out.map(_.getDouble(out.head.fieldIndex("exp_recall_at_05")))
    assert(recalls.sliding(2).forall { case Array(x, y) => y >= x },
      s"expected recall must not fall with bands: ${recalls.toSeq}")
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q316: each canonicalization rung exposes its duplicate class") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_canon").toString
    // d1/d2 differ only in case+punctuation (the canon rung's catch);
    // d3/d4 are token permutations (the bag rung's catch)
    Seq((1L, "Hello, World!"), (2L, "hello world"),
      (3L, "alpha beta"), (4L, "beta alpha"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val out = queries.Text.canonDedupLadder.fn(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(r.fieldIndex("d_raw")) === 4L)
    assert(r.getLong(r.fieldIndex("d_canon")) === 3L, "canon must merge d1/d2")
    assert(r.getLong(r.fieldIndex("d_bag")) === 3L, "bag must merge d3/d4")
    assert(r.getLong(r.fieldIndex("canon_extra")) === 1L)
    assert(r.getLong(r.fieldIndex("bag_extra")) === 1L)
  }

  test("q317: dup pair mass is c_a*c_b across sources and C(c,2) within") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_dupsrc").toString
    // T1: 2 copies in A (1 within-A pair); T2: 1 in A + 2 in B
    // (2 cross pairs, 1 within-B pair); one unique doc in C
    Seq((1L, "t one", "A"), (2L, "t one", "A"),
      (3L, "t two", "A"), (4L, "t two", "B"), (5L, "t two", "B"),
      (6L, "solo", "C"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val out = queries.Text.dupSourceMatrix.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(r.fieldIndex("n_dup_pairs")), r.getLong(r.fieldIndex("n_groups")))).toMap
    assert(out.size === 6, "full 3-source upper-triangular axis incl. zeros")
    assert(out(("A", "A")) === ((1L, 1L)))
    assert(out(("A", "B")) === ((2L, 1L)))
    assert(out(("B", "B")) === ((1L, 1L)))
    assert(out(("A", "C")) === ((0L, 0L)))
    assert(out(("B", "C")) === ((0L, 0L)))
    assert(out(("C", "C")) === ((0L, 0L)))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q318: the histogram cut selects the top-quality stratum at 2x budget") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_budget").toString
    // 4 docs of 50 non-stopword tokens (quality 1.0) + 4 docs of 50
    // stopwords (quality 0.5): total 400 tokens, budget 100, so the
    // quality-1.0 stratum (200 tokens) alone crosses the budget.
    val good = (1 to 50).map(i => s"w$i").mkString(" ")
    val bad = Array.fill(50)("the").mkString(" ")
    val rows = (1L to 4L).map(i => (i, good)) ++ (5L to 8L).map(i => (i, bad))
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val out = queries.Curation.budgetQualityCut.fn(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getDouble(r.fieldIndex("cutoff")) === 1.0)
    assert(r.getLong(r.fieldIndex("n_docs_sel")) === 4L)
    assert(r.getLong(r.fieldIndex("tokens_sel")) === 200L)
    assert(r.getLong(r.fieldIndex("budget_tokens")) === 100L)
    assert(r.getDouble(r.fieldIndex("utilization")) === 2.0)
    assert(r.getDouble(r.fieldIndex("mean_q_sel")) === 1.0)
    assert(r.getDouble(r.fieldIndex("mean_q_rest")) === 0.5)
    assert(r.getDouble(r.fieldIndex("q_lift")) === 0.5)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q319: single-source shard entropy is canonical +0.0; 50/50 shard is ln 2") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_mix").toString
    // 1000-token docs, 2000-token shards: shard 0 = d1,d2 (both sA),
    // shard 1 = d3 (sA) + d4 (sB)
    val body = (1 to 1000).map(i => s"t$i").mkString(" ")
    Seq((1L, "sA"), (2L, "sA"), (3L, "sA"), (4L, "sB"))
      .toDF("doc_id", "source")
      .withColumn("text", lit(body))
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val out = queries.Curation.shardMixingAudit.fn(spark, dir).collect()
    assert(out.length === 2)
    val s0 = out(0); val s1 = out(1)
    assert(s0.getLong(s0.fieldIndex("n_sources")) === 1L)
    val e0 = s0.getDouble(s0.fieldIndex("source_entropy"))
    assert(e0 === 0.0 &&
      java.lang.Double.doubleToRawLongBits(e0) === 0L,
      "single-source entropy must be canonical +0.0")
    assert(s1.getLong(s1.fieldIndex("n_sources")) === 2L)
    assert(math.abs(s1.getDouble(s1.fieldIndex("source_entropy")) - math.log(2.0)) < 1e-8)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q320: bloom plan matches the closed form and realized fpr tracks target") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_bloom").toString
    (1L to 100L).map(i => (i, s"unique doc body $i"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val out = queries.Scale.bloomPlanner.fn(spark, dir).collect()
      .map(r => r.getDouble(0) -> r).toMap
    assert(out.keySet === Set(0.01, 0.001, 0.0001))
    val r = out(0.01)
    // n=100, p=0.01: m = ceil(100*ln(100)/ln^2 2) = 959, k = round(m/n*ln2) = 7
    assert(r.getLong(r.fieldIndex("m_bits")) === 959L)
    assert(r.getLong(r.fieldIndex("k_hashes")) === 7L)
    val fpr = r.getDouble(r.fieldIndex("realized_fpr"))
    assert(fpr > 0.005 && fpr < 0.0125, s"realized fpr $fpr should track 0.01")
  }

  test("q322: separated sources yield a large F; identical sources cancel to +0.0") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_anova").toString
    // source A: quality-1.0 docs; source B: quality-0.5 docs → SSW=0,
    // SSB>0 → F is NULL-guarded infinite? No: SSW=0 → try_divide NULL
    val good = (1 to 50).map(i => s"w$i").mkString(" ")
    val bad = Array.fill(50)("the").mkString(" ")
    ((1L to 4L).map(i => (i, good, "A")) ++ (5L to 8L).map(i => (i, bad, "B")))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val r = queries.Curation.anovaSources.fn(spark, dir).collect().head
    assert(r.getLong(r.fieldIndex("k_sources")) === 2L)
    assert(r.isNullAt(r.fieldIndex("f_stat")), "zero within-variance must NULL F")
    assert(r.getDouble(r.fieldIndex("eta_sq")) === 1.0)
    // identical sources: SSB cancels → F = +0.0 (bit-checked), eta 0
    val dir2 = java.nio.file.Files.createTempDirectory("graft_r9_anova2").toString
    ((1L to 4L).map(i => (i, if (i % 2 == 0) good else bad, "A")) ++
      (5L to 8L).map(i => (i, if (i % 2 == 0) good else bad, "B")))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir2/documents.parquet")
    val r2 = queries.Curation.anovaSources.fn(spark, dir2).collect().head
    val f2 = r2.getDouble(r2.fieldIndex("f_stat"))
    assert(f2 === 0.0 && java.lang.Double.doubleToRawLongBits(f2) === 0L,
      "balanced identical sources must give canonical +0.0 F")
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q324: an 11-minute-stale event is late by exactly 60s; in-order feed is clean") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_late").toString
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 06:$min%02d:00")
    val rows = Seq(
      // type a: strictly in-order → zero late
      (1L, t(0), 1L, "a", 1.0, "{}"), (2L, t(5), 1L, "a", 1.0, "{}"),
      (3L, t(10), 1L, "a", 1.0, "{}"),
      // type b: hwm reaches 06:20, then an event stamped 06:09 arrives
      // → 09:00 < 20:00 − 10:00 fails by 60s... it IS late by 60s
      (4L, t(0), 2L, "b", 1.0, "{}"), (5L, t(20), 2L, "b", 1.0, "{}"),
      (6L, t(9), 2L, "b", 1.0, "{}"),
      // type c: 10 minutes behind exactly = NOT late (strict <)
      (7L, t(20), 3L, "c", 1.0, "{}"), (8L, t(10), 3L, "c", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = queries.Events.lateArrivalAudit.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(out("a").fieldIndex("n_late")) === 0L)
    assert(out("b").getLong(out("b").fieldIndex("n_late")) === 1L)
    assert(out("b").getLong(out("b").fieldIndex("excess_lateness_us")) === 60000000L)
    assert(out("c").getLong(out("c").fieldIndex("n_late")) === 0L,
      "exactly-at-watermark events are kept (strict <)")
  }

  test("q323: probe cost is monotone in nprobe and reaches full scan at k") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_ivf").toString
    // 8 well-separated singleton-axis groups with unequal sizes
    val sizes = Seq(8, 6, 5, 4, 3, 3, 2, 1)
    var id = 0L
    val rows = sizes.zipWithIndex.flatMap { case (n, g) =>
      (0 until n).map { j =>
        id += 1
        val v = Array.fill(8)(0f); v(g) = 1f; v((g + 1) % 8) = 0.001f * (j + 1)
        (id, v, g)
      }
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = queries.Embeddings.ivfProbePlanner.fn(spark, dir).collect()
      .sortBy(_.getLong(0))
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 8L))
    val means = out.map(r => r.getDouble(r.fieldIndex("mean_candidates")))
    assert(means.sliding(2).forall { case Array(x, y) => y >= x },
      s"probe cost must be monotone: ${means.toSeq}")
    val last = out.last
    assert(last.getDouble(last.fieldIndex("scan_fraction")) === 1.0,
      "probing all k cells must scan the whole corpus")
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q325: tau=1 reproduces raw shares; cooling flattens the mixture") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_temp").toString
    ((1L to 8L).map(i => (i, "alpha beta gamma", "en")) ++
      (9L to 10L).map(i => (i, "uno dos tres", "fr")))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val out = queries.Curation.temperatureSweep.fn(spark, dir).collect()
      .sortBy(_.getDouble(0))
    assert(out.length === 4)
    val at1 = out.last
    assert(at1.getDouble(0) === 1.0)
    assert(at1.getDouble(at1.fieldIndex("max_share")) === 0.8)
    assert(at1.getDouble(at1.fieldIndex("upsample_min")) === 1.0,
      "tau=1 is natural sampling: no upsampling of the smallest language")
    val eff = out.map(r => r.getDouble(r.fieldIndex("eff_langs")))
    assert(eff.sliding(2).forall { case Array(x, y) => y <= x },
      s"cooling tau must flatten the mixture: ${eff.toSeq}")
    val up = out.map(r => r.getDouble(r.fieldIndex("upsample_min")))
    assert(up.sliding(2).forall { case Array(x, y) => y <= x },
      s"upsampling of the tail must grow as tau cools: ${up.toSeq}")
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q326: packing admits a rank-prefix and cuts exactly at the budget") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_pack").toString
    // 8 vectors; panel = 4 smallest ids; every doc is 60 tokens, so
    // each query fits exactly 2 hits in the 150-token context
    val rows = (1L to 8L).map { i =>
      val v = Array.fill(8)(0f); v(0) = 1f; v(1) = 0.01f * i
      (i, v, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val body = (1 to 60).map(i => s"t$i").mkString(" ")
    (1L to 8L).map(i => (i, body, "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val out = queries.Embeddings.contextPack.fn(spark, dir).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(1L, 2L, 3L, 4L))
    for ((_, rs) <- byQ) {
      val inc = rs.filter(_.getBoolean(rs.head.fieldIndex("included")))
      assert(inc.map(_.getLong(rs.head.fieldIndex("rk"))).sorted.toSeq === Seq(1L, 2L),
        "exactly the top-2 hits fit 150 tokens")
      assert(inc.map(_.getLong(rs.head.fieldIndex("cum_tok"))).max === 120L)
    }
  }

  test("q327: the data card reports dup share and dominant language exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_card").toString
    Seq((1L, "alpha beta gamma", "en", "A"), (2L, "alpha beta gamma", "en", "A"),
      (3L, "delta epsilon zeta", "fr", "A"),
      (4L, "unique text here", "en", "B"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val out = queries.Curation.sourceDatacard.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert(a.getLong(a.fieldIndex("n_docs")) === 3L)
    assert(a.getLong(a.fieldIndex("n_tokens")) === 9L)
    assert(a.getDouble(a.fieldIndex("dup_share")) === 0.333333)
    assert(a.getString(a.fieldIndex("top_lang")) === "en")
    assert(a.getDouble(a.fieldIndex("top_lang_share")) === 0.666667)
    val b = out("B")
    assert(b.getDouble(b.fieldIndex("dup_share")) === 0.0)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q328: per-day top-3 ranks by count with type tie-break") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_trend").toString
    var id = 0L
    val rows = Seq("a" -> 3, "b" -> 2, "c" -> 1, "d" -> 1).flatMap { case (t, n) =>
      (1 to n).map { _ =>
        id += 1
        (id, java.sql.Timestamp.valueOf("2024-03-05 10:00:00"), 1L, t, 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = queries.Events.dailyTrending.fn(spark, dir).collect()
    assert(out.length === 3)
    assert(out.map(_.getString(2)).toSeq === Seq("a", "b", "c"),
      "count order with lexicographic tie-break (c before d)")
    assert(out.head.getString(0) === "2024-03-05")
    assert(out.head.getDouble(out.head.fieldIndex("day_share")) ===
      math.rint(3.0 / 7.0 * 1e6) / 1e6)
  }

  test("q329: a centroid vector hubs every top-5 list") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_hub").toString
    // vector 1 sits at the center; 2..7 sit on distinct orthogonal
    // offsets, so each is closer to the hub than to any sibling
    val hub = { val v = Array.fill(8)(0f); v(0) = 1f; v }
    val rows = (1L, hub, 0) +: (2L to 7L).map { i =>
      val v = Array.fill(8)(0f); v(0) = 1f; v((i - 1).toInt) = 0.6f
      (i, v, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = queries.Embeddings.hubnessAudit.fn(spark, dir).collect()
    val top = out.head
    assert(top.getLong(0) === 1L, "the centroid must rank as the top hub")
    assert(top.getLong(top.fieldIndex("n5")) === 6L,
      "the hub appears in all six other top-5 lists")
    assert(top.getDouble(top.fieldIndex("hub_ratio")) === 1.2)
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q330: the pendant peels in round one; the 4-clique settles as the 3-core") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_core").toString
    // customers 1..190 buy from suppliers 1..4 (every clique pair
    // shares 190 customers); customers 191..380 buy from {1, 5} only,
    // so supplier 5 hangs off the clique by one edge
    val orders = (1L to 380L).map(c => (c, c)) // o_orderkey = o_custkey
    val li = (1L to 190L).flatMap(c => (1L to 4L).map(sp => (c, sp))) ++
      (191L to 380L).flatMap(c => Seq((c, 1L), (c, 5L)))
    orders.toDF("o_orderkey", "o_custkey").write.parquet(s"$dir/orders.parquet")
    li.toDF("l_orderkey", "l_suppkey").write.parquet(s"$dir/lineitem.parquet")
    val out = queries.Graph.kcorePeel.fn(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L),
      "only the clique survives; the pendant supplier 5 peels in round 1")
    assert(out.forall(r => r.getLong(r.fieldIndex("degree")) === 3L))
    assert(out.forall(_.getBoolean(out.head.fieldIndex("settled"))))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q331: a clean mean shift is located exactly with var_explained 1") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_cpt").toString
    var id = 0L
    // type a: 2/day for days 1-5, then 8/day for days 6-10; type b constant
    val rows = (1 to 10).flatMap { d =>
      val n = if (d <= 5) 2 else 8
      (1 to n).map { _ =>
        id += 1
        (id, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 09:00:00"), 1L, "a", 1.0, "{}")
      }
    } ++ (1 to 10).flatMap { d =>
      (1 to 3).map { _ =>
        id += 1
        (id, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 09:00:00"), 1L, "b", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = queries.Events.changepoint.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getString(a.fieldIndex("split_day")) === "2024-01-05")
    assert(a.getDouble(a.fieldIndex("mean_before")) === 2.0)
    assert(a.getDouble(a.fieldIndex("mean_after")) === 8.0)
    assert(a.getDouble(a.fieldIndex("var_explained")) === 1.0)
    assert(out("b").isNullAt(out("b").fieldIndex("var_explained")),
      "a constant series has zero flat SSE and must NULL, not divide")
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q332: first-digit counts, Benford expectations, and zero-digit rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_benford").toString
    // 30 prices with digit 1, 10 with digit 2, none elsewhere
    val rows = (1L to 30L).map(i => (i, 19.5)) ++ (31L to 40L).map(i => (i, 250.0))
    rows.toDF("o_orderkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val out = queries.Etl.benfordAudit.fn(spark, dir).collect()
    assert(out.length === 9, "all nine digits report, observed or not")
    val byD = out.map(r => r.getInt(0) -> r).toMap
    assert(byD(1).getLong(byD(1).fieldIndex("n_obs")) === 30L)
    assert(byD(2).getLong(byD(2).fieldIndex("n_obs")) === 10L)
    assert(byD(9).getLong(byD(9).fieldIndex("n_obs")) === 0L)
    assert(byD(1).getDouble(byD(1).fieldIndex("obs_share")) === 0.75)
    assert(byD(1).getDouble(byD(1).fieldIndex("exp_share")) === 0.30103)
    assert(out.forall(r => r.getDouble(r.fieldIndex("chi2_term")) >= 0.0))
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q321: antipodal label centroids score -1, coincident ones +1") {
    val dir = java.nio.file.Files.createTempDirectory("graft_r9_conf").toString
    val rows = (0 until 3).flatMap { g =>
      (0 until 4).map { j =>
        val v = Array.fill(8)(0f)
        v(0) = if (g == 1) -1f else 1f // labels 0 and 2 coincide; 1 is antipodal
        (g * 4L + j + 1L, v, g)
      }
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = queries.Embeddings.labelConfusionMatrix.fn(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(r.fieldIndex("centroid_cos"))).toMap
    assert(out.size === 3)
    assert(out((0, 1)) === -1.0)
    assert(out((0, 2)) === 1.0)
    assert(out((1, 2)) === -1.0)
    graft.dedup.Dedup.clearCaches(spark)
  }
}
