package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Deduplication for training-data pipelines: exact, n-gram Jaccard,
  * MinHash+LSH, and SimHash — each expressed as keyed dataflow
  * (explode → shuffle-on-key → join), never an O(n²) cross product,
  * so the same plans run at 100 TB.
  *
  * Multi-consumer intermediates are persisted (Spark's CacheManager
  * dedupes identical plans, so repeated calls on the same input reuse
  * one entry); long-lived sessions processing many distinct corpora
  * should call [[clearCaches]] between batches. Lazy localCheckpoint
  * was tried and abandoned: under AQE's concurrent stage submission it
  * re-materializes the subtree per stage, with pathological blowups.
  *
  * Hot-key bounds: real web corpora contain boilerplate shingles shared
  * by millions of documents; a self-join bucket on such a key is
  * quadratic. Pair generation therefore caps document frequency
  * ([[jaccardPairs]] `dfCap`) and LSH bucket size ([[lshCandidates]] /
  * [[simhashPairs]] `bucketCap`) by default, logging what was dropped —
  * pass 0 to opt out explicitly.
  */
object Dedup {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Default document-frequency / bucket-size bound. A key this hot is
    * boilerplate, not signal: it contributes ≤ cap² pairs instead of
    * n_docs², and near-dup pairs that share *only* boilerplate are the
    * pairs we want to miss.
    */
  val DefaultHotKeyCap = 1000

  // Persist handles created by this object, so cleanup releases exactly
  // our intermediates and nothing else in the session cache. The ledger
  // is SIZE-BOUNDED: a long-lived session sweeping many corpora used to
  // grow the tracked set without limit until a manual clearCaches —
  // past `maxTracked` live handles the least-recently-REGISTERED one is
  // evicted (unpersisted; any plan still referencing it just recomputes,
  // so eviction is never a correctness event). Keyed by the analyzed
  // plan's semanticHash so re-persisting an identical plan TOUCHES the
  // existing entry (CacheManager dedupes those to one cache entry
  // anyway) instead of double-counting it. Evictions are driver-side
  // ledger events, not plan metrics, so they surface through the logger
  // + [[evictionCount]] rather than an observed metric.
  private val ledger = new java.util.LinkedHashMap[
    (org.apache.spark.sql.SparkSession, Int), DataFrame](16, 0.75f, true)

  /** Upper bound on live tracked persists (override with
    * -Dgraft.cache.maxTracked=N; spec-tunable). Generous by default —
    * the bound exists to cap unattended growth, not to fight the
    * within-run reuse that makes shared intermediates pay.
    */
  @volatile private[graft] var maxTracked: Int =
    sys.props.get("graft.cache.maxTracked").map(_.toInt).getOrElse(256)

  private val evictions = new java.util.concurrent.atomic.AtomicLong(0)

  /** Total LRU evictions forced by the [[maxTracked]] budget. */
  private[graft] def evictionCount: Long = evictions.get

  // Hot-key drop reporting is attached as an observed metric on the
  // capped plan, so *constructing* a pairs DataFrame launches no Spark
  // job (an eager count here used to run one at plan-build time); the
  // warning fires from a QueryExecutionListener when an action actually
  // executes the plan. The metric name must be DETERMINISTIC in the
  // subtree (op/cap + the child plan's semantic hash): a per-call nonce
  // would make two otherwise-identical dedup plans differ, and the
  // CacheManager's identical-plan dedupe — which lets q67 reuse q40's
  // persisted shingle table — stops firing (measured 1.7 s → 4.6 s).
  // Spark allows duplicate observe names when the plans are identical
  // (the CTE/self-join rule), so equal subtrees composing into one
  // query stay legal, and distinct subtrees get distinct hashes.
  private val listenerSessions =
    java.util.concurrent.ConcurrentHashMap.newKeySet[org.apache.spark.sql.SparkSession]()

  private[graft] def observeDrops(hot: DataFrame, what: String, cap: Int): DataFrame = {
    val spark = hot.sparkSession
    if (listenerSessions.add(spark))
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_dedup__") && row.getLong(0) > 0)
              log.warn(s"${name.stripPrefix("graft_dedup__")}: dropping ${row.getLong(0)} hot keys over the cap")
          }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
      })
    hot.observe(
      s"graft_dedup__${what}_cap${cap}_h${hot.queryExecution.analyzed.semanticHash()}",
      count(lit(1)).as("n_hot"))
  }

  /** Drops every row whose `keyCol` value occurs more than `cap` times
    * — the generic hot-key bound behind the shingle df cap, applied
    * before any self-join pair generation: a key with k rows yields
    * O(k²) pairs, so an uncapped hub (a customer in every supplier's
    * ledger, a boilerplate shingle) turns a keyed join quadratic. The
    * dropped-key count surfaces as an observed metric (no job at plan
    * time); pass the result straight into the self-join.
    */
  private[graft] def capHotKeys(df: DataFrame, keyCol: String, what: String,
      cap: Int = DefaultHotKeyCap): DataFrame = {
    val hot = observeDrops(
      df.groupBy(keyCol).agg(count(lit(1)).as("__df"))
        .filter(col("__df") > cap).select(keyCol),
      what, cap)
    df.join(hot, Seq(keyCol), "left_anti")
  }

  /** MEMORY_AND_DISK persist registered for [[clearCaches]] release —
    * the repo-wide convention for multi-consumer intermediates
    * (graft-visible so the similarity/query layers share the same
    * lifecycle instead of leaking untracked persists).
    */
  private[graft] def persistTracked(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    track(p)
    p
  }

  /** Register an already-persisted handle in the bounded ledger for
    * [[clearCaches]] / LRU release.
    */
  private[dedup] def track(df: DataFrame): Unit = ledger.synchronized {
    val prev = ledger.put((df.sparkSession, df.queryExecution.analyzed.semanticHash()), df)
    // The key is a 32-bit semanticHash: a collision between two
    // genuinely different plans would otherwise silently drop the
    // displaced handle, letting its cache blocks escape both LRU
    // eviction and clearCaches until session end.
    if (prev != null && (prev ne df)
        && !prev.queryExecution.analyzed.sameResult(df.queryExecution.analyzed)) {
      prev.unpersist(blocking = false)
      log.warn("cache ledger semanticHash collision: unpersisted displaced intermediate")
    }
    while (ledger.size > maxTracked) {
      val it = ledger.entrySet().iterator()
      val eldest = it.next()
      it.remove()
      eldest.getValue.unpersist(blocking = false)
      evictions.incrementAndGet()
      log.warn(s"cache ledger over budget ($maxTracked live persists): " +
        s"evicted LRU intermediate h${eldest.getKey._2} (recomputable, not a data loss)")
    }
  }

  private val trackedRdds =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()

  /** Register a checkpoint-backed RDD (a [[Clusters]] converged label
    * table) whose blocks [[clearCaches]] should drop. Checkpointed RDDs
    * cannot recompute, so release only happens via the explicit
    * between-corpora clearCaches call, never mid-query.
    */
  private[graft] def trackRdd(rdd: org.apache.spark.rdd.RDD[_]): Unit = trackedRdds.add(rdd)

  private val clearHooks =
    new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Register a callback run by every [[clearCaches]] — for
    * module-local memos (trained-model caches like the shared
    * BoostLite train) that must drop with the corpus: a bench pass
    * reusing the previous pass's training would hide real plan cost.
    */
  private[graft] def onClearCaches(f: () => Unit): Unit = clearHooks.add(f)

  /** Release cached dedup intermediates — only the handles this object
    * persisted, leaving unrelated session cache entries alone. Also
    * invalidates the [[componentsOf]] memo: its handles are backed by
    * checkpoint blocks released here, which cannot recompute.
    */
  def clearCaches(spark: org.apache.spark.sql.SparkSession): Unit = {
    ledger.synchronized {
      ledger.values().forEach(_.unpersist(blocking = false))
      ledger.clear()
    }
    var r = trackedRdds.poll()
    while (r != null) { r.unpersist(blocking = false); r = trackedRdds.poll() }
    componentsMemo.clear()
    clearHooks.forEach(_.apply())
  }

  // One label-propagation run per (session, corpus plan, threshold):
  // q71/q75/q190 all need the same exact ∪ near-dup components, and
  // while CacheManager's identical-plan dedupe shares the persisted
  // shingle/pair tables among them, the ITERATIVE closure loop
  // (checkpoint-backed, outside the plan cache) would re-run per
  // query. Keyed by the analyzed plan's semanticHash — deterministic,
  // computed without launching a job — so a corpus re-read from the
  // same source hits; NOT by DataFrame identity.
  private val componentsMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, Int, String, String, Double), DataFrame]()

  /** Connected components of the exact-duplicate ∪ near-dup-Jaccard
    * edge graph over `df`: one (idCol, cluster_id = min id in the
    * component) row per document. Memoized — repeated calls on an
    * equivalent corpus plan return the SAME converged handle, so a
    * sweep running q71 then q75 then q190 pays for one closure loop
    * (DedupSpec pins this). [[clearCaches]] invalidates between
    * corpora.
    */
  def componentsOf(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5): DataFrame = {
    val key = (df.sparkSession, df.queryExecution.analyzed.semanticHash(),
      idCol, textCol, threshold)
    componentsMemo.computeIfAbsent(key, _ => {
      val near = jaccardPairs(df, idCol, textCol, threshold)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val edges = near.unionByName(Clusters.exactEdges(df, idCol, textCol))
      Clusters.connectedComponents(df.select(idCol), idCol, edges, "src", "dst")
    })
  }

  /** Exact dedup: hash-groupBy on the content columns, keeping the
    * minimum id per group. One shuffle on the content hash.
    */
  def exact(df: DataFrame, contentCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(contentCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_" + idCol), count(lit(1)).as("copies"))

  /** Word n-gram shingles (distinct, first-occurrence order) of a
    * token array — the compiled graft.functions.WordNGrams expression
    * (bit-equal to the interpreted
    * `array_distinct(transform(sequence, slice+concat_ws))` it
    * replaced; WordNGramsSpec). Rows with fewer than n tokens yield an
    * EMPTY array; callers historically filter size >= n first and/or
    * explode the result, where empty contributes zero rows either way.
    */
  def wordShingles(toks: Column, n: Int): Column =
    graft.functions.WordNGrams(toks, n, distinct = true)

  /** (id, shingle) long table — the inverted-index form. */
  def shingleTable(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    df.filter(size(TextAnalysis.tokens(col(textCol))) >= n)
      .select(col(idCol), explode(wordShingles(TextAnalysis.tokens(col(textCol)), n)).as("shingle"))

  /** Exact n-gram Jaccard near-dup pairs via inverted-index self-join:
    * pairs sharing ≥1 shingle get |A∩B| from the join, |A| and |B| from
    * per-doc counts. At web scale add a document-frequency cap on
    * shingles (drop shingles appearing in > dfCap docs) to bound the
    * join fan-out; dfCap <= 0 disables it.
    */
  /** Collapse exact-duplicate texts to their min-id representative.
    * Near-dup detection composes AFTER exact dedup: k identical copies
    * would otherwise multiply the pair join's fan-out by k² — the
    * dominant cost on real dup-heavy corpora.
    *
    * The grouping key is `(xxhash64(text), length(text))`, not the raw
    * text: the dedup shuffle then sorts/compares fixed-width 12-byte
    * keys instead of full document bodies, with the text carried as a
    * value (`min_by` id ties the representative to the min-id row).
    * Equal (hash, len) on unequal text is a 2⁻⁶⁴ event — the standard
    * content-hash dedup contract.
    */
  def exactRepresentatives(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(xxhash64(col(textCol)).as("__th"), length(col(textCol)).as("__tl"))
      .agg(min(col(idCol)).as(idCol), min_by(col(textCol), col(idCol)).as(textCol))
      .select(col(idCol), col(textCol))
      // the dedup shuffle is tiny, so AQE coalesces it to ~1 partition;
      // re-spread before the 100x shingle explode that follows, or that
      // explode runs single-threaded
      .repartition(col(idCol))

  /** Shared pair-generation core for the set-overlap family: shingle,
    * df-cap, hash, inverted-index self-join — returns
    * (id_a, id_b, inter, n_a, n_b) for every co-shingling pair.
    */
  private def overlapCounts(df: DataFrame, idCol: String, textCol: String,
      n: Int, dfCap: Int, preDedup: Boolean, opName: String): DataFrame = {
    val base = if (preDedup) exactRepresentatives(df, idCol, textCol) else df
    val sh0 = shingleTable(base, idCol, textCol, n)
    val sh = if (dfCap > 0) {
      val hot = observeDrops(
        sh0.groupBy("shingle").agg(count(lit(1)).as("df")).filter(col("df") > dfCap),
        opName, dfCap)
      sh0.join(hot, Seq("shingle"), "left_anti")
    } else sh0
    // Join on the 8-byte shingle hash, not the string: cheaper shuffle
    // and compare. The hashed table feeds three consumers (sizes + both
    // join sides), so materialize it once; at warehouse scale this
    // becomes an explicit intermediate table instead of a cache.
    val hashed = persistTracked(
      sh.select(col(idCol), xxhash64(col("shingle")).as("sh_h")))
    val sizes = hashed.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    val a = hashed.toDF("id_a", "sh_h")
    val b = hashed.toDF("id_b", "sh_h")
    a.join(b, Seq("sh_h")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(sizes.toDF("id_a", "n_a"), "id_a")
      .join(sizes.toDF("id_b", "n_b"), "id_b")
  }

  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3, dfCap: Int = DefaultHotKeyCap,
      preDedup: Boolean = true): DataFrame =
    overlapCounts(df, idCol, textCol, n, dfCap, preDedup, "jaccardPairs")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))

  /** Asymmetric-overlap (containment) pairs: containment(A→B) =
    * |A∩B| / |A| — flags a short document embedded in a longer one
    * (quotes, boilerplate-wrapped reposts), where symmetric Jaccard
    * stays far below any dedup threshold because the union is
    * dominated by the longer side. Keeps pairs whose LARGER direction
    * reaches the threshold; emits both directions plus Jaccard so the
    * caller can see which regime caught the pair. Same inverted-index
    * machinery (and scale story) as [[jaccardPairs]].
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3, dfCap: Int = DefaultHotKeyCap,
      preDedup: Boolean = true): DataFrame =
    overlapCounts(df, idCol, textCol, n, dfCap, preDedup, "containmentPairs")
      .withColumn("cont_a", col("inter").cast("double") / col("n_a"))
      .withColumn("cont_b", col("inter").cast("double") / col("n_b"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("cont_a"), 4).as("cont_a"), round(col("cont_b"), 4).as("cont_b"),
        round(col("inter").cast("double")
          / (col("n_a") + col("n_b") - col("inter")), 4).as("jaccard"))

  /** [[jaccardPairs]] with PPJoin-style prefix filtering (Chaudhuri et
    * al. 2006; Xiao et al. 2008) — the same EXACT result, with
    * candidate generation restricted to each document's rarest
    * shingles: in the global (df, hash) canonical order, a pair with
    * Jaccard ≥ t must share a shingle within each side's first
    * |X| − ⌈t·|X|⌉ + 1 shingles, so only that prefix (a (1−t) fraction of
    * the index) enters the self-join. At t = 0.8 the pair join
    * processes ~20% of the inverted index — the standard set-similarity
    * scale lever on top of the df cap. Candidates are verified exactly
    * against the full sets (two keyed joins), so the output equals
    * [[jaccardPairs]] bit for bit (DedupSpec pins it; q142 proves it
    * against the q40 oracle).
    */
  def jaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, n: Int = 3, dfCap: Int = DefaultHotKeyCap,
      preDedup: Boolean = true): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold=$threshold")
    val base = if (preDedup) exactRepresentatives(df, idCol, textCol) else df
    val sh0 = shingleTable(base, idCol, textCol, n)
    val sh = if (dfCap > 0) {
      val hot = observeDrops(
        sh0.groupBy("shingle").agg(count(lit(1)).as("df")).filter(col("df") > dfCap),
        "jaccardPairsPrefix", dfCap)
      sh0.join(hot, Seq("shingle"), "left_anti")
    } else sh0
    val hashed = persistTracked(
      sh.select(col(idCol), xxhash64(col("shingle")).as("sh_h")))
    val sizes = hashed.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    val dfs = hashed.groupBy("sh_h").agg(count(lit(1)).as("__df"))
    // Rank each doc's shingles in the global rarest-first order; the
    // ε guard keeps ⌈t·n⌉ from rounding up on exact products (a too-
    // short prefix would silently LOSE pairs — DedupSpec pins equality)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__df"), col("sh_h"))
    val prefix = persistTracked(hashed.join(dfs, "sh_h")
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))))
      .filter(col("__rk") <=
        col("__n") - ceil(lit(threshold) * col("__n") - lit(1e-9)) + 1)
      .select(col(idCol), col("sh_h"), col("__n")))
    // PPJoin length filter (lossless): J(A,B) ≥ t ⇒ |min| ≥ ⌈t·|max|⌉
    // (I ≤ |min| and J ≤ |min|/|max|) — prunes cross-length candidates
    // before the distinct and the verification fan-out
    val cand = prefix.toDF("id_a", "sh_h", "__na")
      .join(prefix.toDF("id_b", "sh_h", "__nb"), Seq("sh_h"))
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("__na"), col("__nb")) >=
        ceil(lit(threshold) * greatest(col("__na"), col("__nb")) - lit(1e-9)))
      .select("id_a", "id_b").distinct()
    // exact verification against the FULL sets: two keyed joins
    val inter = cand
      .join(hashed.toDF("id_a", "sh_h"), "id_a")
      .join(hashed.toDF("id_b", "sh_h"), Seq("id_b", "sh_h"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("id_a", "n_a"), "id_a")
      .join(sizes.toDF("id_b", "n_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ---- MinHash + LSH ------------------------------------------------------

  val NumPerms = 32
  val MinhashPrime = 2147483647L // 2^31 − 1
  // Deterministic permutation parameters, seed 42.
  private val (permA, permB) = {
    val rnd = new scala.util.Random(42)
    (Array.fill(NumPerms)(1L + rnd.nextInt(Int.MaxValue - 2)),
      Array.fill(NumPerms)(rnd.nextInt(Int.MaxValue - 1).toLong))
  }

  /** [[minhashSignatures]] with the engine-portable hash family (the
    * simhashPoly convention): shingle hash = [[polyTokenHash]] char
    * fold mod [[PolyPrime]], permutation i = (h·a_i + b_i) mod
    * PolyPrime with the seed-42 constants — every value recomputable
    * by a SQL oracle bit-for-bit (q206's DuckDB twin). Same plan
    * shape: one shingle explode, one k-min groupBy (map-side
    * combined). The xxhash64 default stays the production path.
    */
  def minhashSignaturesPoly(df: DataFrame, idCol: String, textCol: String, n: Int = 3,
      preDedup: Boolean = true): DataFrame = {
    val base = if (preDedup) exactRepresentatives(df, idCol, textCol) else df
    val hashed = shingleTable(base, idCol, textCol, n)
      .select(col(idCol), polyTokenHash(col("shingle")).as("h"))
    val mins = (0 until NumPerms).map { i =>
      min(pmod(col("h") * permA(i) + permB(i), lit(PolyPrime))).as(s"m$i")
    }
    hashed.groupBy(idCol).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until NumPerms).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** The seed-42 (a_i, b_i) permutation constants, for SQL oracle
    * generation (data-independent — the embeddable-literal rule).
    */
  def minhashPerms: Seq[(Long, Long)] =
    (0 until NumPerms).map(i => (permA(i), permB(i)))

  /** MinHash signatures: explode shingles, hash once per shingle, then
    * one groupBy computing all k permutation minima map-side (partial
    * aggregation makes the shuffle k longs per doc, not per shingle).
    * Returns (idCol, sig: array<long>[k]).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, n: Int = 3,
      preDedup: Boolean = true): DataFrame = {
    val base = if (preDedup) exactRepresentatives(df, idCol, textCol) else df
    val hashed = shingleTable(base, idCol, textCol, n)
      .select(col(idCol), pmod(xxhash64(col("shingle")), lit(MinhashPrime)).as("h"))
    val mins = (0 until NumPerms).map { i =>
      min(pmod(col("h") * permA(i) + permB(i), lit(MinhashPrime))).as(s"m$i")
    }
    hashed.groupBy(idCol).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until NumPerms).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH banding: k perms → `bands` bands of k/bands rows; docs collide
    * when any band hash matches. Candidate generation is a self-join on
    * (band_id, band_hash) — shuffle-bounded by bucket sizes, never n².
    * Buckets holding more than `bucketCap` docs (degenerate bands —
    * boilerplate-dominated signatures) are dropped with a logged count,
    * bounding any single bucket's pair fan-out at cap²; 0 opts out.
    * est_jaccard = fraction of matching signature components.
    */
  def lshCandidates(sigs0: DataFrame, idCol: String, bands: Int = 8,
      bucketCap: Int = DefaultHotKeyCap): DataFrame = {
    // three consumers (band explode + two sig joins): materialize once
    val sigs = persistTracked(sigs0)
    val r = NumPerms / bands
    val bandCols = transform(sequence(lit(0), lit(bands - 1)),
      j => struct(j.as("band_id"), xxhash64(concat_ws(",", j, slice(col("sig"), j * r + 1, lit(r)))).as("band_hash")))
    val exploded0 = sigs.select(col(idCol), explode(bandCols).as("b"))
      .select(col(idCol), col("b.band_id"), col("b.band_hash"))
    val exploded = if (bucketCap > 0) {
      val hot = observeDrops(exploded0.groupBy("band_id", "band_hash")
        .agg(count(lit(1)).as("sz")).filter(col("sz") > bucketCap),
        "lshCandidates", bucketCap)
      // USING-join output reorders columns (using cols first): reselect
      // by name so the positional toDF renames below stay correct
      exploded0.join(hot, Seq("band_id", "band_hash"), "left_anti")
        .select(col(idCol), col("band_id"), col("band_hash"))
    } else exploded0
    val cand = exploded.toDF("id_a", "band_id", "band_hash")
      .join(exploded.toDF("id_b", "band_id", "band_hash"), Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(sigs.select(col(idCol).as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col(idCol).as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard", round(
        aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / NumPerms, 4))
      .select("id_a", "id_b", "est_jaccard")
  }

  // ---- SimHash ------------------------------------------------------------

  /** 64-bit SimHash over word tokens: per-token hash, bit j of the
    * signature is the sign of Σ_tokens sign_j(token). One explode + one
    * groupBy; the 64 bit-sums partial-aggregate map-side.
    *
    * Composes after exact dedup by default (like [[jaccardPairs]] /
    * [[minhashSignatures]]): k identical copies share one signature and
    * would otherwise multiply the band join's fan-out by k².
    *
    * Defaults use xxhash64 with bit j read straight off the hash; the
    * hooks exist so [[simhashPoly]] can swap in an engine-portable hash
    * family (xxhash64 exists only in Spark, so the default signature
    * cannot be recomputed by an external SQL oracle).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      preDedup: Boolean = true,
      tokenHash: Column => Column = xxhash64(_),
      bitSign: (Column, Int) => Column =
        (h, j) => when(h.bitwiseAND(lit(1L << j)) =!= 0, 1).otherwise(-1)): DataFrame = {
    val base = if (preDedup) exactRepresentatives(df, idCol, textCol) else df
    val tok = base.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .select(col(idCol), tokenHash(col("t")).as("h"))
    val bitSums = (0 until 64).map(j => sum(bitSign(col("h"), j)).as(s"b$j"))
    tok.groupBy(idCol).agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until 64).map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce((x, y) => x.bitwiseOR(y)).as("simhash"))
  }

  // ---- oracle-replicable SimHash hash family ------------------------------
  // Per-token hash: the q43 polynomial fold h = (h·131 + byte) mod P
  // (P = 1e9+7) over the token's characters — pure integer arithmetic
  // any ANSI engine can replicate. Per-bit sign: a seeded universal
  // rehash sign_j(h) = [(a_j·h + b_j) mod P < P/2] ? +1 : −1; all
  // products stay < 2^62, so 64-bit signed arithmetic never overflows
  // in either engine.

  val PolyPrime = 1000000007L
  val PolyHalf: Long = PolyPrime / 2 // 500000003
  /** Seeded per-bit universal-hash coefficients (a_j ∈ [1, 2^31), b_j ∈ [0, 2^31)). */
  val (simhashBitA, simhashBitB) = {
    val rnd = new scala.util.Random(4242)
    (Array.fill(64)(1L + rnd.nextInt(Int.MaxValue - 2)),
      Array.fill(64)(rnd.nextInt(Int.MaxValue - 1).toLong))
  }

  /** Polynomial token hash (ASCII corpus contract, like q43: ascii(c)
    * equals the UTF-8 byte). Native codegen expression — bit-equal to
    * the HOF fold `aggregate(split(t, ""), 0L, pmod(h·131+ascii(c), P))`
    * (DedupSpec pins the equality incl. empty strings) but one local
    * loop instead of a regex split into a materialized char array per
    * token; measured ~1.4× on the q246/q255 scan paths (min-of-3 A/B
    * at sf0.1; the join-dominated q206/q249 shapes sit within noise).
    */
  def polyTokenHash(t: Column): Column = graft.functions.PolyTokenHash(t)

  /** The original HOF formulation, kept as the cross-checkable
    * reference for [[polyTokenHash]]'s equality pin. */
  private[graft] def polyTokenHashHof(t: Column): Column =
    aggregate(split(t, ""), lit(0L),
      (h, c) => pmod(h * lit(131L) + ascii(c).cast("long"), lit(PolyPrime)))

  /** SimHash whose signature an external SQL oracle can recompute
    * bit-for-bit (see q42's DuckDB twin). Same plan shape as the
    * xxhash64 default — one explode, one 64-sum groupBy.
    */
  def simhashPoly(df: DataFrame, idCol: String, textCol: String,
      preDedup: Boolean = true): DataFrame =
    simhash(df, idCol, textCol, preDedup,
      tokenHash = polyTokenHash,
      bitSign = (h, j) =>
        when(pmod(h * lit(simhashBitA(j)) + lit(simhashBitB(j)), lit(PolyPrime)) < lit(PolyHalf), 1)
          .otherwise(-1))

  /** Near-dup pairs with Hamming distance ≤ maxHamming, found by
    * banding the 64-bit signature into 4×16-bit keys (any exact-band
    * match is a candidate — guaranteed complete for maxHamming ≤ 3 by
    * pigeonhole; a recall/efficiency trade-off above that). Buckets
    * larger than `bucketCap` are dropped like in [[lshCandidates]];
    * the Hamming filter runs BEFORE the cross-band `.distinct()` so
    * the dedup shuffle carries only surviving pairs.
    */
  def simhashPairs(sh: DataFrame, idCol: String, maxHamming: Int = 3,
      bucketCap: Int = DefaultHotKeyCap): DataFrame = {
    // parent plan is the 64-way bit-sum aggregate; three consumers
    // below (bucket sizes + both self-join sides) → materialize once
    val banded0 = persistTracked(sh.select(col(idCol), col("simhash"),
      explode(array((0 until 4).map(k =>
        struct(lit(k).as("band_id"),
          col("simhash").bitwiseAND(lit(0xffffL << (16 * k))).as("band_val"))): _*)).as("b"))
      .select(col(idCol), col("simhash"), col("b.band_id"), col("b.band_val")))
    val banded = if (bucketCap > 0) {
      val hot = observeDrops(banded0.groupBy("band_id", "band_val")
        .agg(count(lit(1)).as("sz")).filter(col("sz") > bucketCap),
        "simhashPairs", bucketCap)
      // reselect by name: USING-join output order differs from banded0's
      banded0.join(hot, Seq("band_id", "band_val"), "left_anti")
        .select(col(idCol), col("simhash"), col("band_id"), col("band_val"))
    } else banded0
    banded.toDF("id_a", "sh_a", "band_id", "band_val")
      .join(banded.toDF("id_b", "sh_b", "band_id", "band_val"), Seq("band_id", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Incremental exact dedup: of the incoming batch, keep one min-id
    * representative per text that does NOT already exist in the
    * corpus — the every-crawl-cycle op of a growing training corpus.
    * Both sides join on the fixed-width (xxhash64, length) key, so the
    * existing corpus ships 12-byte keys, never document bodies, and
    * the incoming batch dedups within itself in the same pass. At
    * warehouse scale the existing-key table is a materialized
    * by-product of the last cycle, not a rescan.
    */
  def incrementalNew(existing: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val key = Seq(xxhash64(col(textCol)).as("__th"), length(col(textCol)).as("__tl"))
    val existingKeys = existing.select(key: _*).distinct()
    incoming
      .select(col(idCol), col(textCol), key(0), key(1))
      .join(existingKeys, Seq("__th", "__tl"), "left_anti")
      .groupBy(col("__th"), col("__tl"))
      .agg(min(col(idCol)).as(idCol), min_by(col(textCol), col(idCol)).as(textCol))
      .select(col(idCol), col(textCol))
  }

  /** One-call corpus dedup: exact-duplicate edges ∪ near-dup pairs →
    * connected components → keep the min-id representative of every
    * cluster. Transitive by construction (A~B~C keeps ONE survivor even
    * though A,C never paired) — the composition q75 runs, exposed as
    * the library entry point. Returns the surviving rows of `df`, all
    * columns intact.
    *
    * `pairs` defaults to exact n-gram Jaccard; swap in
    * [[lshCandidates]]/[[simhashPairs]]-derived edges (or
    * embedding-space pairs from `similarity.Similarity.lshNearDupPairs`)
    * for other modalities — anything producing (id_a, id_b) columns.
    */
  def dedupCorpus(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5,
      pairs: Option[DataFrame] = None): DataFrame = {
    val comp = pairs match {
      // default pair law → the memoized components handle (shared with
      // q71/q190 and any other caller on the same corpus)
      case None => componentsOf(df, idCol, textCol, threshold)
      case Some(p) =>
        val near = p.select(col("id_a").as("src"), col("id_b").as("dst"))
        val edges = near.unionByName(Clusters.exactEdges(df, idCol, textCol))
        Clusters.connectedComponents(df.select(idCol), idCol, edges, "src", "dst")
    }
    val reps = comp.filter(col(idCol) === col("cluster_id")).select(idCol)
    df.join(reps, Seq(idCol), "left_semi")
  }
}
