package graft

import org.apache.spark.sql.functions._
import graft.queries.{Corpus, Curation, Embeddings, Events, Text}

/** Semantic pins for the round-8 audit/fingerprint family
  * (q246–q251) on crafted fixtures — the oracle pins cross-engine
  * equality; these pin the guarantees themselves: the winnowing
  * collision guarantee, the conformal flag semantics, LOF's relative-
  * density ordering, corpus-level MinHash vs exact Jaccard at the
  * extremes, Shapley efficiency/symmetry, and CUSUM's change-point
  * timing.
  */
class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_audit").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def embDir(rows: Seq[(Long, Array[Float], Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_audit_emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q246: winnowing guarantees a shared fingerprint for any shared 8-token run") {
    // w + k − 1 = 8: two docs sharing an 8-token run MUST share a
    // fingerprint (the run contains a full window of 5 k-gram hashes,
    // and both docs select the same minimum inside it).
    val run = (1 to 8).map(i => s"x$i").mkString(" ")
    val dir = corpusDir(Seq(
      (1L, s"$run a1 a2 a3 a4", "en", "s0"),
      (2L, s"b1 b2 b3 b4 $run", "en", "s0"),
      (3L, (1 to 12).map(i => s"c$i").mkString(" "), "en", "s0"),
      (4L, s"$run a1 a2 a3 a4", "en", "s1"))) // exact twin of doc 1
    val out = Text.winnowing.fn(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size === 4)
    // every doc: 12 tokens → 9 grams, 5 windows → 1 ≤ n_fp ≤ 5
    out.values.foreach { r =>
      assert(r.getLong(1) === 9)
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 5, s"density bound: $r")
    }
    assert(out(1L).getLong(4) >= 1, "doc 1 must share a fingerprint with doc 2/4")
    assert(out(2L).getLong(4) >= 1, "doc 2 must share a fingerprint with doc 1")
    assert(out(3L).getLong(4) === 0, "disjoint doc shares nothing")
    // exact twins share their whole fingerprint set
    assert(out(4L).getLong(4) === out(4L).getLong(2))
  }

  test("q247: conformal threshold flags far vectors, passes in-distribution ones") {
    // ids ≡ 0,1 (mod 5) calibrate: 9 at e1 (score 0) and one at 0.9·e1
    // (score 0.01) → n_cal = 10, k = ⌈11·0.9⌉ = 10 → q̂ = 0.01.
    val e1 = Array(1f, 0f, 0f, 0f)
    val near = Array(0.9f, 0f, 0f, 0f)
    val far = Array(0f, 1f, 0f, 0f)
    val rows = (0L until 25L).map { id =>
      val isCal = id % 5 < 2
      if (id == 21L) (id, near, 0)
      else if (isCal) (id, e1, 0)
      else if (id % 5 == 4) (id, far, 1) // every 5th test vector is OOD
      else (id, e1, 0)
    }
    val out = Embeddings.conformalOod.fn(spark, embDir(rows)).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out(0).getLong(2) === 0, "in-distribution test vectors never flagged")
    assert(out(1).getLong(2) === out(1).getLong(1), "all far vectors flagged")
    assert(out(1).getDouble(3) === 1.0)
    // centroid is pulled 1% toward `near`, so cal scores are ~0 and 0.0097²·…;
    // the threshold must sit strictly between in-dist and OOD scores
    val qHat = out(0).getDouble(4)
    assert(qHat > 0.0 && qHat < 1.0, s"q_hat=$qHat")
    assert(out(0).getLong(5) === 10, "n_cal")
  }

  test("q248: LOF ranks the isolated vector first with score > 1") {
    // six near-parallel vectors + one orthogonal outlier, same label
    val rows = (0 until 6).map { i =>
      (i.toLong, Array(1f, 0.01f * (i + 1), 0f, 0f), 0)
    } :+ (6L, Array(0f, 0f, 1f, 0f), 0)
    val out = Embeddings.lofOutliers.fn(spark, embDir(rows)).collect()
    assert(out.head.getLong(0) === 6L, "outlier ranks first")
    assert(out.head.getDouble(4) > 1.0, s"outlier LOF must exceed 1: ${out.head}")
    // cluster members sit at their neighbourhood's own density
    out.tail.foreach(r => assert(r.getDouble(4) < out.head.getDouble(4)))
    // exact copies collapse to one representative carrying multiplicity
    val dup = rows ++ Seq((7L, Array(1f, 0.01f, 0f, 0f), 0),
      (8L, Array(1f, 0.01f, 0f, 0f), 0))
    val out2 = Embeddings.lofOutliers.fn(spark, embDir(dup)).collect()
    val rep = out2.find(_.getLong(0) == 0L).get
    assert(rep.getLong(2) === 3L, s"multiplicity of the collapsed group: $rep")
    assert(!out2.exists(r => r.getLong(0) == 7L || r.getLong(0) == 8L))
  }

  test("q249: identical sources → Jaccard 1 (est agrees); disjoint → 0") {
    val shared = (1 to 30).map(i => s"w$i").mkString(" ")
    val other = (1 to 30).map(i => s"z$i").mkString(" ")
    val dir = corpusDir(Seq(
      (1L, shared, "en", "s0"), (2L, shared, "en", "s1"),
      (3L, other, "en", "s2")))
    val out = Corpus.sourceMinhash.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val twin = out(("s0", "s1"))
    assert(twin.getDouble(5) === 1.0 && twin.getDouble(6) === 1.0)
    assert(twin.getDouble(7) === 0.0, "no estimator error on identical sets")
    val dis = out(("s0", "s2"))
    assert(dis.getLong(4) === 0 && dis.getDouble(5) === 0.0)
  }

  test("q250: Shapley is efficient and splits symmetric filters equally") {
    // 4 docs fail ONLY length; 2 docs fail stop AND uniq together;
    // 4 docs pass everything → φ_len = 4, φ_stop = φ_uniq = 1,
    // Σφ = v(all) = 6.
    val lenFail = (d: Int) =>
      ("the a " + (1 to 8).map(i => s"w${d}_$i").mkString(" ")) // 10 toks
    val bothFail = "w " * 24 + "w" // 25 identical non-stopword tokens
    val passAll = (d: Int) =>
      ("the a " + (1 to 28).map(i => s"p${d}_$i").mkString(" ")) // 30 toks
    val dir = corpusDir(
      (1 to 4).map(d => (d.toLong, lenFail(d), "en", "s0")) ++
        Seq((5L, bothFail, "en", "s0"), (6L, bothFail, "en", "s0")) ++
        (7 to 10).map(d => (d.toLong, passAll(d), "en", "s0")))
    val out = Curation.filterShapley.fn(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("len").getDouble(3) === 4.0)
    assert(out("stop").getDouble(3) === 1.0)
    assert(out("uniq").getDouble(3) === 1.0)
    // efficiency: Σφ = v(all) = 6 exactly; the 4-dp-rounded shares sum
    // to 1 within rounding (0.6667 + 2·0.1667)
    assert(out.values.map(_.getDouble(3)).sum === 6.0)
    val shareSum = out.values.map(_.getDouble(4)).sum
    assert(math.abs(shareSum - 1.0) < 2e-4, s"share sum $shareSum")
    assert(out("len").getLong(1) === 4 && out("stop").getLong(1) === 2)
  }

  test("q251: CUSUM stays silent before a level shift and alarms after it") {
    // 10 days at 2/day then 10 days at 8/day: μ = 5 (the global mean
    // straddles both regimes), so the DOWN side accumulates 3/day from
    // day 1 — S⁻(d) = 3d — and the UP side accumulates 3/day after the
    // shift — S⁺(10+i) = 3i. With 4σ̂ = 12.31…, the two-sided alarm
    // first fires on the down side at day 5 (15 > 12.31) and stays on
    // through day 20 (S⁻ decays as S⁺ rises; they cross at 15 > 4σ̂).
    val dir = java.nio.file.Files.createTempDirectory("graft_audit_ev").toString
    var id = 0L
    val rows = (1 to 20).flatMap { d =>
      val perDay = if (d <= 10) 2 else 8
      (1 to perDay).map { _ =>
        id += 1
        (id, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 06:00:00"), id % 7,
          "a", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = Events.cusumDrift.fn(spark, dir).collect()
      .map(r => r.getString(1) -> r).toMap
    assert(out.size === 20)
    (1 to 10).foreach { d =>
      val r = out(f"2024-01-$d%02d")
      assert(r.getDouble(3) === 0.0, s"pre-shift S+ must be 0 on day $d")
      assert(r.getDouble(4) === 3.0 * d, s"S- ramps 3/day, day $d")
    }
    (1 to 4).foreach { d =>
      assert(!out(f"2024-01-$d%02d").getBoolean(5), s"no alarm on day $d")
    }
    assert(out("2024-01-05").getBoolean(5), "down-side alarm at 3·5 = 15 > 4σ̂")
    assert(out("2024-01-14").getDouble(3) === 12.0)
    assert(out("2024-01-15").getDouble(3) === 15.0)
    assert(out("2024-01-20").getDouble(3) === 30.0)
    assert(out("2024-01-20").getDouble(4) === 0.0)
    assert(out("2024-01-20").getBoolean(5))
  }
}
