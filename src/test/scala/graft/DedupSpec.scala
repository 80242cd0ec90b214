package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.functions.RollingHash
import graft.text.TextAnalysis

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog again and again today"
  private val nearDup = base.replace("today", "tonight")
  private val other = "completely different words describing nothing in common with anything"

  private def docs = Seq((0L, base), (1L, base), (2L, nearDup), (3L, other))
    .toDF("doc_id", "text")

  test("exact dedup keeps min id and counts copies") {
    val out = Dedup.exact(docs, Seq("text"), "doc_id")
      .orderBy("keep_doc_id")
      .collect().map(r => (r.getAs[Long]("keep_doc_id"), r.getAs[Long]("copies")))
    assert(out.toSeq === Seq((0L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("wordShingles builds n-2 distinct 3-grams") {
    val sh = Seq(("a b c d")).toDF("text")
      .select(Dedup.wordShingles(TextAnalysis.tokens(col("text")), 3).as("sh"))
      .head().getSeq[String](0)
    assert(sh === Seq("a b c", "b c d"))
  }

  test("jaccard pairs: identical docs = 1.0, near-dups high, unrelated absent") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.3, preDedup = false)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(pairs((0L, 1L)) === 1.0)
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) > 0.5 && pairs((0L, 2L)) < 1.0)
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("prefix-filtered jaccard equals the full inverted-index result exactly") {
    val corpus = Tables.documents(spark, "/root/testdata/sf0.01")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val full = Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = t)
        .orderBy("id_a", "id_b").collect().toSeq
      val pref = Dedup.jaccardPairsPrefix(corpus, "doc_id", "text", threshold = t)
        .orderBy("id_a", "id_b").collect().toSeq
      assert(pref === full, s"t=$t: prefix filter changed the result")
    }
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("prefix filter indexes only a (1-t) fraction of each doc's shingles") {
    import org.apache.spark.sql.expressions.Window
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val sh = Dedup.shingleTable(
      Dedup.exactRepresentatives(corpus, "doc_id", "text"), "doc_id", "text", 3)
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh_h"))
    val total = sh.count()
    // replicate the prefix rule to measure its selectivity
    val dfs = sh.groupBy("sh_h").agg(count(lit(1)).as("__df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("__df"), col("sh_h"))
    val t = 0.8
    val kept = sh.join(dfs, "sh_h")
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .filter(col("__rk") <= col("__n") - ceil(lit(t) * col("__n") - lit(1e-9)) + 1)
      .count()
    assert(kept < total / 2, s"prefix kept $kept of $total at t=$t")
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("preDedup collapses exact copies before the pair join") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.contains((0L, 1L)))        // identical copy handled by exact dedup
    assert(pairs.contains((0L, 2L)))          // near-dup survives via representative
  }

  test("minhash + LSH finds the planted duplicates") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", preDedup = false)
    assert(sigs.head().getSeq[Long](1).length === Dedup.NumPerms)
    val cand = Dedup.lshCandidates(sigs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("est_jaccard")).toMap
    assert(cand((0L, 1L)) === 1.0)          // identical docs: identical signatures
    assert(cand.contains((0L, 2L)))          // near-dup pair surfaces as candidate
  }

  test("simhash: identical docs collide at hamming 0, near-dups within 3") {
    val sh = Dedup.simhash(docs, "doc_id", "text", preDedup = false)
    val pairs = Dedup.simhashPairs(sh, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Int]("hamming")).toMap
    assert(pairs((0L, 1L)) === 0)
    assert(pairs.get((0L, 2L)).forall(_ <= 3))
  }

  test("simhashPoly (oracle-replicable hash family) behaves like a simhash") {
    val sh = Dedup.simhashPoly(docs, "doc_id", "text", preDedup = false)
    val pairs = Dedup.simhashPairs(sh, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Int]("hamming")).toMap
    assert(pairs((0L, 1L)) === 0) // identical docs: identical signatures
    // signatures use all 64 bits (bit signs are universal rehashes of
    // the ~30-bit polynomial hash, not its raw — biased — high bits)
    val sig = sh.filter(org.apache.spark.sql.functions.col("doc_id") === 0L)
      .head().getLong(1)
    assert(sig != 0L && java.lang.Long.bitCount(sig) > 8 && java.lang.Long.bitCount(sig) < 56)
  }

  test("simhash default composes after exact dedup: copies collapse to representatives") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
    assert(sh.count() === 3) // 0 (rep of 0,1), 2, 3 — copy id 1 is gone
    val pairs = Dedup.simhashPairs(sh, "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.contains((0L, 1L))) // exact copy handled by exact dedup, not the band join
  }

  test("dfCap drops boilerplate shingles from the pair join") {
    // six distinct docs whose ONLY shared shingle is the boilerplate
    // tail "shared shingle base" (df = 6)
    val boiler = (0 until 6).map(i => (i.toLong, s"u$i v$i w$i shared shingle base"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.jaccardPairs(boiler, "doc_id", "text", threshold = 0.1, dfCap = 0)
    assert(uncapped.count() === 15) // all C(6,2) pairs via the hot shingle
    val capped = Dedup.jaccardPairs(boiler, "doc_id", "text", threshold = 0.1, dfCap = 5)
    assert(capped.count() === 0) // hot shingle dropped → no pair survives
  }

  test("LSH and simhash bucket caps drop degenerate buckets") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", preDedup = false)
    // ids 0 and 1 are identical → every band bucket they occupy has ≥ 2
    // docs; bucketCap = 1 kills all multi-doc buckets → no candidates
    assert(Dedup.lshCandidates(sigs, "doc_id", bucketCap = 1).count() === 0)
    val sh = Dedup.simhash(docs, "doc_id", "text", preDedup = false)
    assert(Dedup.simhashPairs(sh, "doc_id", bucketCap = 1).count() === 0)
  }

  test("constructing capped pair plans launches zero Spark jobs") {
    // the hot-key caps used to run an eager count() at plan-build time;
    // drop reporting is now an observed metric, so building the
    // DataFrame must not execute anything
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val p1 = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.3)
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
      val p2 = Dedup.lshCandidates(sigs, "doc_id")
      val p3 = Dedup.simhashPairs(Dedup.simhash(docs, "doc_id", "text"), "doc_id")
      // deterministic drain (no fixed sleep, which could false-pass
      // under load): the listener bus is FIFO, so a marker job started
      // AFTER plan construction bounds the window — once its start
      // event lands, any construction-launched job's would have too
      // RDD action, not a SQL count: exactly one job always (AQE splits
      // a SQL count into shuffle-stage + result-stage jobs)
      spark.sparkContext.parallelize(Seq(1), 1).count()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (jobs.get() < 1 && System.nanoTime() < deadline) Thread.sleep(10)
      assert(jobs.get() === 1, s"plan construction ran ${jobs.get() - 1} jobs")
      // the caps are still enforced when the plans DO run
      assert(p1.count() >= 1 && p2.count() >= 1 && p3.count() >= 0)
      assert(jobs.get() > 1)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("exactRepresentatives groups on fixed-width (hash, length) keys, same result") {
    val long1 = ("lorem ipsum dolor sit amet " * 200) + "alpha"
    val long2 = ("lorem ipsum dolor sit amet " * 200) + "beta" // same length ballpark, ≠ content
    val df = Seq((10L, long1), (3L, long1), (7L, long2), (1L, "short doc"))
      .toDF("doc_id", "text")
    val reps = Dedup.exactRepresentatives(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(reps === Map(3L -> long1, 7L -> long2, 1L -> "short doc"))
  }

  test("stress corpus: capped candidate counts stay within n·cap (the 100 TB bound)") {
    // the adversarial duplicate-heavy shape of tools/make_stress.py:
    // every distinct text has 8 exact copies, and all docs share one
    // boilerplate sentence — uncapped, the boilerplate shingles alone
    // would fan out C(250,2) ≈ 31k pairs and exact copies would square it
    val nBase = 250L
    val cap = 20
    val stress = spark.range(nBase * 8)
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          lit("all stress documents share this exact boilerplate sentence"),
          concat(lit("unique"), col("id") % nBase),
          concat(lit("payload"), (col("id") % nBase) * 7),
          concat(lit("tail"), (col("id") % nBase) * 13)).as("text"))
    val bound = nBase * cap
    val jac = Dedup.jaccardPairs(stress, "doc_id", "text", threshold = 0.0, dfCap = cap)
    assert(jac.count() <= bound)
    val sigs = Dedup.minhashSignatures(stress, "doc_id", "text")
    assert(Dedup.lshCandidates(sigs, "doc_id", bucketCap = cap).count() <= bound)
    val sh = Dedup.simhash(stress, "doc_id", "text")
    assert(Dedup.simhashPairs(sh, "doc_id", maxHamming = 3, bucketCap = cap).count() <= bound)
    Dedup.clearCaches(spark)
  }

  test("componentsOf memoizes one closure run per (corpus plan, threshold)") {
    Dedup.clearCaches(spark)
    val a = Dedup.componentsOf(docs, "doc_id", "text", 0.5)
    // the labels are right (0,1 exact copies; 2 a near-dup of both; 3 alone)
    val labs = a.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labs === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L))
    // an EQUIVALENT but distinct plan hits the memo: same handle, so the
    // q71/q75/q190 trio pays for one label-propagation loop per sweep
    val b = Dedup.componentsOf(docs, "doc_id", "text", 0.5)
    assert(a eq b)
    // a different threshold is a different pair graph: miss
    val c = Dedup.componentsOf(docs, "doc_id", "text", 0.9)
    assert(!(a eq c))
    // clearCaches releases the backing checkpoint blocks, so it must
    // also invalidate the memo — a fresh call recomputes
    Dedup.clearCaches(spark)
    val d = Dedup.componentsOf(docs, "doc_id", "text", 0.5)
    assert(!(a eq d))
    assert(d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === labs)
    Dedup.clearCaches(spark)
  }

  test("rolling hash: deterministic, content-sensitive, codegen == eval") {
    val out = docs.select(col("doc_id"), RollingHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) === out(1L))
    assert(out(0L) !== out(2L))
    assert(out(0L) === RollingHash.hashBytes(base.getBytes("UTF-8")))
  }

  test("poly token hash: native expression bit-equals the HOF fold") {
    import spark.implicits._
    // empty string, single char, typical shingles, digits/punct, and a
    // BMP non-ASCII char — the q42/q43 cross-engine family contract
    val strs = Seq("", "a", "the quick brown", "w1 w2 w3", "x_9,y!", "café")
    val df = strs.toDF("s").select(
      Dedup.polyTokenHash(col("s")).as("native"),
      Dedup.polyTokenHashHof(col("s")).as("hof"))
    df.collect().foreach { r =>
      assert(r.getLong(0) === r.getLong(1), s"mismatch on ${r}")
    }
    // interpreted eval path (no codegen) agrees too
    assert(graft.functions.PolyTokenHash.hashString(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc"))
      === ((("a".codePointAt(0) * 131L + 'b') % 1000000007L) * 131L + 'c') % 1000000007L)
  }
}
