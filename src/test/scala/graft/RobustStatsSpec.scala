package graft

import org.apache.spark.sql.functions._
import graft.queries.{Corpus, Embeddings, Etl, Events, Extras, Graph, Ml, Privacy, Text}

/** Semantic pins for the robust-stats/LM family (q252–q256) on crafted
  * fixtures: Mann–Whitney direction and degenerate-σ behavior,
  * Theil–Sen's outlier immunity vs OLS, Kneser–Ney probabilities
  * against hand arithmetic, the watermark detector against a
  * brute-force PRF replay, and the k-center greedy invariants.
  */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_rs").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q252: a quality-shifted source is significant; a uniform corpus NULLs z") {
    // source hi: long stopword-free docs (quality 1.0); source lo:
    // stopword-heavy shorts. One-vs-rest ranks must flag both
    // directions with opposite signs.
    val hi = (1 to 60).map(i => s"u$i").mkString(" ")
    val lo = "the a of and the a of and the a"
    val dir = corpusDir(
      (1L to 12L).map(i => (i, hi, "en", "hi")) ++
        (13L to 24L).map(i => (i, lo, "en", "lo")))
    val out = Ml.rankSumDrift.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("hi").getDouble(3) > 1.96 && out("hi").getBoolean(4))
    assert(out("lo").getDouble(3) < -1.96 && out("lo").getBoolean(4))
    assert(out("hi").getDouble(3) === -out("lo").getDouble(3),
      "two-group one-vs-rest tests mirror each other")

    // all docs identical → every rank ties → σ² = 0 → z is NULL, not ∞
    val dir2 = corpusDir((1L to 10L).map(i =>
      (i, hi, "en", if (i <= 5) "a" else "b")))
    Ml.rankSumDrift.fn(spark, dir2).collect().foreach { r =>
      assert(r.isNullAt(3), s"z must be NULL on a tie-only corpus: $r")
    }
  }

  test("q253: Theil–Sen ignores the spike month that bends OLS") {
    // 24 months of exactly linear revenue (100 + 10·x dollars) with one
    // 100× spike: the pairwise-slope median stays on the line.
    val ts = (0 until 24).map { x =>
      val dollars = if (x == 12) 50000.0 else 100.0 + 10.0 * x
      (x.toLong, 1L, "O", dollars,
        java.sql.Timestamp.valueOf(f"2023-${x % 12 + 1}%02d-15 00:00:00"
          .replace("2023", (2023 + x / 12).toString)), "1-URGENT")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_ord").toString
    ts.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val r = Extras.theilSen.fn(spark, dir).collect()(0)
    assert(r.getLong(0) === 24 && r.getLong(1) === 276)
    assert(r.getDouble(2) === 10.0, s"robust slope stays 10: $r")
    assert(r.getDouble(4) > 20.0, s"OLS must be bent by the spike: $r")
  }

  test("q254: Kneser–Ney matches hand arithmetic and normalizes over continuations") {
    // corpus bigrams: (a,b)×2, (a,c)×1 → P(b|a) = (2−.75)/3 + (.75·2/3)·(1/2)
    // = 2/3; P(c|a) = .25/3 + .5·.5 = 1/3 — the two sum to 1.
    val dir = corpusDir(Seq(
      (1L, "a b", "en", "s0"), (2L, "a b", "en", "s0"), (3L, "a c", "en", "s0")))
    val out = Corpus.knBigramLm.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    def kn(p: Double) = {
      val lp = BigDecimal(math.log(p)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      BigDecimal(lp.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out(1L).getLong(1) === 1)
    assert(out(1L).getDouble(2) === kn(2.0 / 3), s"P(b|a): ${out(1L)}")
    assert(out(3L).getDouble(2) === kn(1.0 / 3), s"P(c|a): ${out(3L)}")
  }

  test("q255: green counts match a brute-force PRF replay; natural frac ≈ γ") {
    val P = 1000000007L
    def poly(t: String): Long =
      t.foldLeft(0L)((h, c) => (h * 131 + c.toLong) % P)
    def green(w1: String, w2: String): Boolean =
      (poly(w1) * 1103578351L + poly(w2) * 2057594173L) % P < 250000001L
    val texts = Seq(
      (1L, (1 to 40).map(i => s"w$i").mkString(" ")),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val dir = corpusDir(texts.map { case (id, t) => (id, t, "en", "s0") })
    val out = Text.watermarkDetect.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    texts.foreach { case (id, t) =>
      val toks = t.split(" ")
      val expected = toks.sliding(2).count(p => green(p(0), p(1)))
      assert(out(id).getLong(2) === expected.toLong,
        s"doc $id green replay: ${out(id)}")
      assert(out(id).getLong(1) === (toks.length - 1).toLong)
      // a ~40-token natural doc can't clear the z > 4 bar unless green
      // frac is wildly above γ; pin the flag against the replayed z
      val n = toks.length - 1
      val z = (expected - 0.25 * n) / math.sqrt(n * 0.25 * 0.75)
      assert(out(id).getBoolean(5) === (z > 4.0))
    }
  }

  test("q256: k-center picks farthest points and selection distances never increase") {
    // 1-D line embedded in dim 4: seed = id 0 at x = 0; farthest is
    // x = 100 (id 3), then x = 50 (id 2), then the midpoints.
    val xs = Seq(0f, 1f, 50f, 100f, 25f, 75f, 99f, 2f, 49f, 51f)
    val rows = xs.zipWithIndex.map { case (x, i) =>
      (i.toLong, Array(x, 0f, 0f, 0f), 0)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Embeddings.kcenterCoreset.fn(spark, dir).collect()
    assert(out.length === 8)
    assert(out(0).getLong(1) === 0L && out(0).isNullAt(2))
    assert(out(1).getLong(1) === 3L && out(1).getDouble(2) === 10000.0)
    assert(out(2).getLong(1) === 2L && out(2).getDouble(2) === 2500.0)
    // greedy invariant: the covering radius is non-increasing
    val dists = out.tail.map(_.getDouble(2))
    assert(dists.zip(dists.tail).forall { case (a, b) => a >= b },
      dists.mkString(","))
  }

  test("q257: the perturbed table matches an LCG replay and the estimator debiases") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_ev").toString
    val types = Seq("a", "b", "c", "d")
    // skewed truth: 40 a, 30 b, 20 c, 10 d
    val rows = (1L to 100L).map { id =>
      val t = if (id <= 40) "a" else if (id <= 70) "b" else if (id <= 90) "c" else "d"
      (id, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), id % 9, t, 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    def u(id: Long, salt: Long): Double =
      (((id % 1000003L) * 2654435761L + salt) % 1000003L + 0.5) / 1000003.0
    val trueRank = rows.map { case (id, _, _, t, _, _) => id -> (types.indexOf(t) + 1) }
    val reported = trueRank.map { case (id, tr) =>
      if (u(id, 7) < 0.75) tr else 1 + math.floor(u(id, 13) * 4).toInt
    }
    val expRep = types.indices.map(i => reported.count(_ == i + 1).toLong)
    val out = Privacy.randomizedResponse.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    types.zipWithIndex.foreach { case (t, i) =>
      assert(out(t).getLong(2) === expRep(i), s"replayed report count for $t")
      // estimator replay: π̂ = (f − 0.25/k)/0.75 at 4 dp
      val pi = (expRep(i) / 100.0 - 0.25 / 4) / 0.75
      val exp = BigDecimal(pi).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(t).getDouble(3) === (if (exp == 0.0) 0.0 else exp))
    }
    // the debiased estimates sum to 1 exactly (before rounding)
    val s = types.map(t => out(t).getDouble(3)).sum
    assert(math.abs(s - 1.0) < 5e-4, s"estimates sum to 1: $s")
  }

  test("q258: a pure weekly pattern decomposes to zero remainder") {
    // 28 days: Mondays get 17 events, other days 10 → trend = 11
    // (every 7-day window holds one Monday), seasonal = +6/−1,
    // remainder = 0 away from the 3-day edges.
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_stl").toString
    var id = 0L
    val rows = (1 to 28).flatMap { d =>
      val date = java.time.LocalDate.of(2024, 1, d) // 2024-01-01 is a Monday
      val n = if (date.getDayOfWeek.getValue == 1) 17 else 10
      (1 to n).map { _ =>
        id += 1
        (id, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 06:00:00"), id % 5, "a", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = Events.seasonalDecompose.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size === 28)
    assert(out("2024-01-01").isNullAt(3), "edge days have no trend")
    (4 to 25).foreach { d =>
      val r = out(f"2024-01-$d%02d")
      assert(r.getDouble(3) === 11.0, s"trend day $d: $r")
      assert(r.getDouble(4) === (if (r.getInt(2) == 0) 6.0 else -1.0), s"seasonal: $r")
      assert(r.getDouble(5) === 0.0, s"remainder must vanish on day $d: $r")
    }
  }

  test("q260: the histogram algebra matches a brute-force O(n²) tau-b") {
    val texts = Seq(
      "the a of short", "alpha beta gamma delta epsilon zeta",
      (1 to 30).map(i => s"w$i").mkString(" "),
      "the the the the the", "mixed bag of a few tokens here",
      (1 to 30).map(i => s"w$i").mkString(" ")) // duplicate scores on purpose
    val dir = corpusDir(texts.zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong, t, "en", "s0")
    })
    // brute force from the same per-doc scores the engine computes
    val sc = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        round(graft.text.TextAnalysis.qualityScore(col("text")), 4).as("sq"),
        round(-graft.functions.CharEntropy(col("text")).getField("negent"), 4).as("se"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    var conc = 0L; var disc = 0L; var tx = 0L; var ty = 0L
    for (i <- sc.indices; j <- i + 1 until sc.length) {
      val dx = java.lang.Double.compare(sc(i)._1, sc(j)._1)
      val dy = java.lang.Double.compare(sc(i)._2, sc(j)._2)
      if (dx == 0) tx += 1
      if (dy == 0) ty += 1
      if (dx != 0 && dy != 0) { if (dx == dy) conc += 1 else disc += 1 }
    }
    val n0 = sc.length.toLong * (sc.length - 1) / 2
    val expTau = (conc - disc).toDouble / math.sqrt((n0 - tx).toDouble * (n0 - ty))
    val r = Text.kendallTau.fn(spark, dir).collect()(0)
    assert(r.getLong(0) === sc.length.toLong)
    assert(r.getDouble(2) === conc.toDouble && r.getDouble(3) === disc.toDouble)
    assert(r.getDouble(4) ===
      BigDecimal(expTau).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q261: strict dominance prunes; volume ties never eliminate each other") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_sky").toString
    var id = 0L
    // day 1: 3 events × $10; day 2: 2 × $5 (dominated by day 1);
    // day 3: 3 × $2 (volume-ties day 1, lower value → still skyline);
    // day 4: 1 × $50 (fewer events, higher value → skyline)
    def day(d: Int, n: Int, v: Double) = (1 to n).map { _ =>
      id += 1
      (id, java.sql.Timestamp.valueOf(f"2024-01-0$d%d 06:00:00"), id, "a", v, "{}")
    }
    (day(1, 3, 10.0) ++ day(2, 2, 5.0) ++ day(3, 3, 2.0) ++ day(4, 1, 50.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = Events.skylineDays.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(out("2024-01-01") && !out("2024-01-02"))
    assert(out("2024-01-03"), "a volume tie must not eliminate")
    assert(out("2024-01-04"))
  }

  test("q262: identical sources give MMD² = 0; a shifted source separates") {
    val base = (0 until 10).map(i => Array(1f, 0.1f * i, 0f, 0f))
    val far = (0 until 10).map(i => Array(0f, 0f, 5f + i, 0f))
    // sources a and b share the SAME vector multiset; c is shifted
    val docs = (0 until 30).map { i =>
      val src = if (i < 10) "a" else if (i < 20) "b" else "c"
      (i.toLong, s"text $i", "en", src)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_mmd").toString
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val vecs = (0 until 30).map { i =>
      val v = if (i < 10) base(i) else if (i < 20) base(i - 10) else far(i - 20)
      (i.toLong, v, 0)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = Embeddings.mmdSources.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    // the UNBIASED estimator is slightly negative on identical samples
    // (within-sums exclude the diagonal, the cross-sum can't) — near
    // zero is the correct expectation, not exactly zero
    assert(math.abs(out(("a", "b"))) < 0.01,
      s"identical distributions: ${out(("a", "b"))}")
    assert(out(("a", "c")) > 0.5, s"shifted source must separate: ${out(("a", "c"))}")
    assert(out(("b", "c")) === out(("a", "c")), "same sample → same discrepancy")
  }

  test("q263: the projected graph's fitted exponent is finite and ordered") {
    val r = Graph.degreePowerLaw.fn(spark, "/root/testdata/sf0.01").collect()(0)
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    assert(r.getLong(2) <= r.getLong(3))
    assert(r.getDouble(4) >= r.getLong(2).toDouble
      && r.getDouble(4) <= r.getLong(3).toDouble)
    assert(r.getDouble(5) > 1.0, s"CSN alpha is > 1 by construction: $r")
  }

  test("q265: a line scores lower intrinsic dimension than a plane") {
    val rnd = new scala.util.Random(7)
    // irregular spacing (a uniform grid has d1 = d2 → degenerate μ)
    val docsRows = (0 until 60).map { i =>
      (i.toLong, s"text $i", "en", if (i < 30) "line" else "plane")
    }
    val vecs = (0 until 60).map { i =>
      val v =
        if (i < 30) Array(rnd.nextFloat() * 10, 0f, 0f, 0f)
        else Array(rnd.nextFloat() * 10, rnd.nextFloat() * 10, 0f, 0f)
      (i.toLong, v, 0)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_twonn").toString
    docsRows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    vecs.toDF("vec_id", "embedding", "label").write.parquet(s"$dir/embeddings.parquet")
    val out = Embeddings.twoNnDimension.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val line = out("line").getDouble(3)
    val plane = out("plane").getDouble(3)
    assert(line < plane, s"line ID $line must be below plane ID $plane")
    assert(line > 0.5 && line < 2.0, s"1-D manifold: $line")
    assert(out("line").getLong(1) === 30)
  }

  test("q266: a metronome user is robotic; an irregular one is not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_gap").toString
    var id = 0L
    def ev(u: Long, sec: Long) = {
      id += 1
      (id, java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
        .plusSeconds(sec)), u, "a", 1.0, "{}")
    }
    val metronome = (0 until 10).map(i => ev(1L, i * 60L))        // exact 60 s
    val human = Seq(0L, 7L, 110L, 145L, 530L, 600L, 1800L, 1913L, 2000L, 3600L)
      .map(sec => ev(2L, sec))
    (metronome ++ human)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = Events.gapRegularity.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(3) === 0.0 && out(1L).getBoolean(4),
      s"constant gaps → cv 0: ${out(1L)}")
    assert(out(2L).getDouble(3) > 0.1 && !out(2L).getBoolean(4))
    assert(out(1L).getDouble(2) === 60.0)
  }

  test("q267: a deterministic session grammar is predictable on held-out users") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_mkv").toString
    var id = 0L
    // every user walks a->b->a->b...; user 9 injects one unseen a->c
    val rows = (1L to 10L).flatMap { u =>
      val types = (0 until 8).map(i => if (i % 2 == 0) "a" else "b") ++
        (if (u == 9L) Seq("c") else Seq())
      types.zipWithIndex.map { case (t, i) =>
        id += 1
        (id, java.sql.Timestamp.valueOf(f"2024-01-01 0${i}%d:00:00"), u, t, 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = Events.markovPerplexity.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    // b->a is near-deterministic in training → low held-out perplexity
    assert(out("a").getDouble(3) < 3.0, s"a's successors predictable: ${out("a")}")
    assert(out("b").getDouble(3) < 3.0)
    // the unseen b->c transition is finite-scored (smoothing), no NULLs
    out.values.foreach(r => assert(!r.isNullAt(2) && !r.isNullAt(3)))
  }

  test("q268: Chapman estimates the duplicated corpus's distinct mass") {
    val texts = (0 until 50).map(i => s"unique document number $i body")
    val dir = corpusDir((0 until 100).map(i =>
      ((i + 1).toLong, texts(i % 50), "en", "s0")))
    val r = Corpus.captureRecapture.fn(spark, dir).collect()(0)
    assert(r.getLong(4) === 50, "true distinct")
    assert(r.getLong(2) <= math.min(r.getLong(0), r.getLong(1)))
    val est = r.getDouble(3)
    assert(est > 20 && est < 200, s"estimate in a sane band: $est")
    // replay the estimator from the reported sample counts (unrounded)
    val raw = (r.getLong(0) + 1.0) * (r.getLong(1) + 1.0) / (r.getLong(2) + 1.0) - 1.0
    assert(est === BigDecimal(raw).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getDouble(5) === BigDecimal((raw - 50) / 50)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q264: chained false links over-merge into one impure 4-cluster") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rs_link").toString
    // customers 1 and 2 are indistinguishable to the comparators →
    // their dirty twins cross-link and the component has 2 entities;
    // customer 8 is unique → a pure (record, twin) pair.
    Seq(
      (1L, "Alice", 1, 100.00, "AUTOMOBILE"),
      (2L, "Alice", 1, 100.10, "AUTOMOBILE"),
      (8L, "Bob", 2, 500.00, "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val out = Etl.linkageClusters.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(2L).getLong(1) === 1 && out(2L).getLong(2) === 1,
      s"one pure pair: ${out.values.mkString(";")}")
    assert(out(4L).getLong(1) === 1 && out(4L).getLong(2) === 0,
      "the over-merged cluster is impure")
  }
}
