package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.dedup.{Clusters, Dedup}
import graft.text.TextAnalysis

/** Corpus-curation operators beyond pair generation: duplicate-cluster
  * formation (connected components), deterministic eval-split sampling,
  * token-budget shard packing, and PII redaction — the steps between
  * "pairs found" and "training shards written" in an LLM data pipeline.
  */
object Curation {

  val all: Seq[Q] = Seq(dedupClusters, hashSample, packShards, piiRedact, curationV2,
    balancedMixture, temperatureMixture, sourceQuota, weightedSample, dsirResample,
    quantileNormalize, curationFunnel, mixtureAllocation, dupClusterSizes,
    clusterSurvivors, clusterSourceMix, dedupSavings, qualitySurvivalCurve,
    dupWeightedTokens, splitAssignment, splitLeakage, clusterAwareSplit,
    dataConstrainedEpochs, filterParity, importanceReweight, filterShapley,
    otsuThreshold, ebShrinkage, facilityLocation, bestOfN, sourceInfluence,
    waterFilling, neymanAllocation, powerAnalysis, redactionAudit,
    budgetQualityCut, shardMixingAudit, anovaSources, temperatureSweep,
    sourceDatacard)

  // --- q190: duplicate-cluster size distribution ----------------------------
  // The dedup-mass audit over q71's components: how many clusters of
  // each size, and how many documents they hold — the number that
  // says whether duplication is a long tail of pairs or a few huge
  // boilerplate families (which decides cap/rep-pick strategy). Two
  // keyed aggregates on top of the same edges→components pipeline;
  // the oracle extends q71's recursive-CTE closure with the size
  // histogram.
  def dupClusterSizes: Q = Q(
    "q190_dup_cluster_sizes",
    """WITH RECURSIVE
      |dd AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM dd),
      |sh0 AS (SELECT DISTINCT doc_id, shingle FROM toks,
      |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
      |       WHERE len(t) >= 3),
      |hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000),
      |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |near AS (SELECT id_a, id_b FROM pairs
      |         JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      |         WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
      |exacts AS (SELECT d.doc_id AS id_a, r.doc_id AS id_b
      |           FROM documents d JOIN dd r ON d.text = r.text AND d.doc_id <> r.doc_id),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM near
      |          UNION SELECT id_b, id_a FROM near
      |          UNION SELECT id_a, id_b FROM exacts
      |          UNION SELECT id_b, id_a FROM exacts),
      |reach(id, lab) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
      |cl AS (SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id),
      |cs AS (SELECT cluster_id, count(*) AS csz FROM cl GROUP BY 1)
      |SELECT csz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
      |  CAST(csz * count(*) AS BIGINT) AS n_docs
      |FROM cs GROUP BY csz ORDER BY cluster_size""".stripMargin,
  ) { (s, dir) =>
    Dedup.componentsOf(Tables.documents(s, dir), "doc_id", "text", 0.5)
      .groupBy("cluster_id").agg(count(lit(1)).as("csz"))
      .groupBy("csz").agg(count(lit(1)).as("n_clusters"))
      .select(col("csz").as("cluster_size"), col("n_clusters"),
        (col("csz") * col("n_clusters")).as("n_docs"))
      .orderBy("cluster_size")
  }

  // --- q195: quality-max cluster survivor selection -------------------------
  // The rep-pick policy on top of q71's components: real pipelines
  // rarely keep the MIN-ID duplicate — they keep the best one (longest
  // text here; any deterministic quality score slots in). One keyed
  // window per cluster over the components table (cluster-sized
  // partitions, bounded by the q71 cap chain), emitting the keep-list
  // with member counts. Shares the memoized `Dedup.componentsOf`
  // handle with q71/q75/q190 — the survivor pass adds one join and
  // one window to the already-computed components, not a re-cluster.
  def clusterSurvivors: Q = Q(
    "q195_cluster_survivors",
    """WITH RECURSIVE
      |dd AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM dd),
      |sh0 AS (SELECT DISTINCT doc_id, shingle FROM toks,
      |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
      |       WHERE len(t) >= 3),
      |hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000),
      |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |near AS (SELECT id_a, id_b FROM pairs
      |         JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      |         WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
      |exacts AS (SELECT d.doc_id AS id_a, r.doc_id AS id_b
      |           FROM documents d JOIN dd r ON d.text = r.text AND d.doc_id <> r.doc_id),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM near
      |          UNION SELECT id_b, id_a FROM near
      |          UNION SELECT id_a, id_b FROM exacts
      |          UNION SELECT id_b, id_a FROM exacts),
      |reach(id, lab) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
      |cl AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id),
      |lw AS (SELECT cl.cluster_id, cl.doc_id, len(d.text) AS l,
      |    row_number() OVER (PARTITION BY cl.cluster_id
      |      ORDER BY len(d.text) DESC, cl.doc_id) AS rk,
      |    count(*) OVER (PARTITION BY cl.cluster_id) AS n_members
      |  FROM cl JOIN documents d ON d.doc_id = cl.doc_id)
      |SELECT cluster_id, doc_id AS survivor_doc,
      |  CAST(n_members AS BIGINT) AS n_members, CAST(l AS BIGINT) AS survivor_len
      |FROM lw WHERE rk = 1 ORDER BY cluster_id""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val withLen = Dedup.componentsOf(docs, "doc_id", "text", 0.5)
      .join(docs.select(col("doc_id"), length(col("text")).cast("long").as("l")), "doc_id")
    withLen
      .withColumn("rk", row_number().over(
        Window.partitionBy("cluster_id").orderBy(col("l").desc, col("doc_id"))))
      .withColumn("n_members", count(lit(1)).over(Window.partitionBy("cluster_id")))
      .filter(col("rk") === 1)
      .select(col("cluster_id"), col("doc_id").as("survivor_doc"),
        col("n_members"), col("l").as("survivor_len"))
      .orderBy("cluster_id")
  }

  // --- q197: duplicate-cluster source-mix audit -----------------------------
  // Is duplication WITHIN sources (mirrored scrapes, re-crawls) or
  // ACROSS them (syndication, aggregators)? Decides whether dedup can
  // shard per-source (cheap) or must run globally (q71's shape). Over
  // the shared components handle: non-singleton clusters bucketed by
  // (size, distinct sources), one keyed aggregate each — nothing
  // rescans text. Complements q190's size histogram with the
  // source-spread axis.
  def clusterSourceMix: Q = Q(
    "q197_cluster_source_mix",
    """WITH RECURSIVE
      |dd AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM dd),
      |sh0 AS (SELECT DISTINCT doc_id, shingle FROM toks,
      |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
      |       WHERE len(t) >= 3),
      |hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000),
      |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |near AS (SELECT id_a, id_b FROM pairs
      |         JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      |         WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
      |exacts AS (SELECT d.doc_id AS id_a, r.doc_id AS id_b
      |           FROM documents d JOIN dd r ON d.text = r.text AND d.doc_id <> r.doc_id),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM near
      |          UNION SELECT id_b, id_a FROM near
      |          UNION SELECT id_a, id_b FROM exacts
      |          UNION SELECT id_b, id_a FROM exacts),
      |reach(id, lab) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
      |cl AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id),
      |per AS (SELECT cl.cluster_id, count(*) AS csz,
      |               count(DISTINCT d.source) AS nsrc
      |        FROM cl JOIN documents d ON d.doc_id = cl.doc_id
      |        GROUP BY cl.cluster_id HAVING count(*) >= 2)
      |SELECT csz AS cluster_size, CAST(nsrc AS BIGINT) AS n_sources,
      |  CAST(count(*) AS BIGINT) AS n_clusters
      |FROM per GROUP BY csz, nsrc ORDER BY cluster_size, n_sources""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    Dedup.componentsOf(docs, "doc_id", "text", 0.5)
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("csz"), countDistinct(col("source")).as("nsrc"))
      .filter(col("csz") >= 2)
      .groupBy("csz", "nsrc").agg(count(lit(1)).as("n_clusters"))
      .select(col("csz").as("cluster_size"), col("nsrc").as("n_sources"),
        col("n_clusters"))
      .orderBy("cluster_size", "n_sources")
  }

  // --- q203: per-source dedup savings report ---------------------------------
  // The accounting line every dedup run owes its owner: token and doc
  // counts before vs after (exact + near-dup components, min-id
  // survivors — q71's convention, where cluster_id IS the surviving
  // doc id), by source. Two keyed aggregates over the shared
  // components handle joined to per-doc token counts; nothing rescans
  // text beyond the one token-count projection.
  def dedupSavings: Q = Q(
    "q203_dedup_savings",
    """WITH RECURSIVE
      |dd AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM dd),
      |sh0 AS (SELECT DISTINCT doc_id, shingle FROM toks,
      |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
      |       WHERE len(t) >= 3),
      |hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000),
      |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |near AS (SELECT id_a, id_b FROM pairs
      |         JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      |         WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
      |exacts AS (SELECT d.doc_id AS id_a, r.doc_id AS id_b
      |           FROM documents d JOIN dd r ON d.text = r.text AND d.doc_id <> r.doc_id),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM near
      |          UNION SELECT id_b, id_a FROM near
      |          UNION SELECT id_a, id_b FROM exacts
      |          UNION SELECT id_b, id_a FROM exacts),
      |reach(id, lab) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
      |cl AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id),
      |dt AS (SELECT doc_id, source, len(string_split(text, ' ')) AS ntok FROM documents),
      |agg AS (SELECT dt.source,
      |    count(*) AS docs_before,
      |    CAST(sum(ntok) AS BIGINT) AS tokens_before,
      |    count(*) FILTER (WHERE cl.doc_id = cl.cluster_id) AS docs_after,
      |    CAST(coalesce(sum(ntok) FILTER (WHERE cl.doc_id = cl.cluster_id), 0)
      |      AS BIGINT) AS tokens_after
      |  FROM dt JOIN cl ON cl.doc_id = dt.doc_id GROUP BY dt.source)
      |SELECT source, CAST(docs_before AS BIGINT) AS docs_before,
      |  CAST(docs_after AS BIGINT) AS docs_after, tokens_before, tokens_after,
      |  round(1.0 - CAST(tokens_after AS DOUBLE) / tokens_before, 6) AS token_savings
      |FROM agg ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val dt = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).as("ntok"))
    Dedup.componentsOf(docs, "doc_id", "text", 0.5)
      .join(dt, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("docs_before"),
        sum(col("ntok")).as("tokens_before"),
        count(when(col("doc_id") === col("cluster_id"), 1)).as("docs_after"),
        coalesce(sum(when(col("doc_id") === col("cluster_id"), col("ntok"))), lit(0L))
          .as("tokens_after"))
      .select(col("source"), col("docs_before"), col("docs_after"),
        col("tokens_before"), col("tokens_after"),
        round(lit(1.0) - col("tokens_after").cast("double") / col("tokens_before"), 6)
          .as("token_savings"))
      .orderBy("source")
  }

  // --- q169: token-budget mixture allocation (waterfilling) ----------------
  // q83/q87 choose WHICH docs enter a mixture; this sizes the mixture
  // first: given a token budget (half the corpus) and an equal
  // per-language target, scarce languages contribute everything they
  // have and the leftover redistributes to abundant ones pro rata to
  // their remaining headroom — one waterfilling round, the closed
  // form mixing pipelines actually run before sampling. ALL integer
  // arithmetic (floor-div allocations, cross-multiplied shares) over
  // a languages-sized aggregate; the corpus is touched by exactly one
  // keyed token-count aggregate.
  def mixtureAllocation: Q = Q(
    "q169_mixture_allocation",
    """WITH avail AS (SELECT lang,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail
      |  FROM documents GROUP BY lang),
      |tot AS (SELECT CAST(sum(avail) AS BIGINT) AS total,
      |          count(*) AS n_langs FROM avail),
      |t AS (SELECT (total // 2) AS budget,
      |        (total // 2) // n_langs AS target FROM tot),
      |a1 AS (SELECT lang, avail, least(avail, target) AS alloc1 FROM avail, t),
      |lo AS (SELECT CAST((SELECT budget FROM t) - sum(alloc1) AS BIGINT) AS leftover,
      |         CAST(sum(avail - alloc1) AS BIGINT) AS headroom FROM a1)
      |SELECT lang, avail, (SELECT target FROM t) AS target,
      |  CAST(alloc1 + CASE WHEN headroom > 0
      |    THEN leftover * (avail - alloc1) // headroom ELSE 0 END AS BIGINT) AS alloc,
      |  round(CAST(alloc1 + CASE WHEN headroom > 0
      |      THEN leftover * (avail - alloc1) // headroom ELSE 0 END AS DOUBLE)
      |    / avail, 6) AS fill_rate
      |FROM a1, lo
      |ORDER BY lang""".stripMargin,
  ) { (s, dir) =>
    // the corpus-touching aggregate has four downstream consumers
    // (t, a1, and through a1 the leftover scalars) — persist the
    // languages-sized result so the corpus is scanned exactly once
    val avail = Dedup.persistTracked(Tables.documents(s, dir)
      .groupBy("lang")
      .agg(sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("avail")))
    val t = avail.agg(sum("avail").as("total"), count(lit(1)).as("n_langs"))
      .select(expr("total div 2").as("budget"),
        expr("(total div 2) div n_langs").as("target"))
    val a1 = avail.crossJoin(broadcast(t)) // languages × 1-row scalar
      .select(col("lang"), col("avail"), col("target"),
        least(col("avail"), col("target")).as("alloc1"))
    val lo = a1.agg(sum("alloc1").as("allocated"),
      sum(col("avail") - col("alloc1")).as("headroom"))
    val lo2 = lo.crossJoin(broadcast(t))
      .select((col("budget") - col("allocated")).as("leftover"), col("headroom"))
    a1.crossJoin(broadcast(lo2)) // 1-row scalar
      .select(col("lang"), col("avail"), col("target"),
        (col("alloc1") + when(col("headroom") > 0,
          expr("leftover * (avail - alloc1) div headroom")).otherwise(lit(0L)))
          .as("alloc"),
        round((col("alloc1") + when(col("headroom") > 0,
          expr("leftover * (avail - alloc1) div headroom")).otherwise(lit(0L)))
          .cast("double") / col("avail"), 6).as("fill_rate"))
      .orderBy("lang")
  }

  // --- q221: data-constrained epoch planning --------------------------------
  // q169 sizes a mixture assuming tokens are interchangeable; this
  // prices REPETITION: when the budget exceeds a source's unique mass,
  // extra epochs buy exponentially less (the "Scaling Data-Constrained
  // Language Models" decay shape — repeated data asymptotes at roughly
  // R* ≈ 15 epochs' worth of fresh-data value). Per source: raw vs
  // unique token mass (unique = exact-dedup survivors, counted on the
  // (xxhash64, len) key — bodies never ship), a 3×unique total budget
  // allocated pro rata to raw mass, the implied epoch count, and the
  // effective fresh-token value U·R*·(1 − e^(−E/R*)). `value_ratio` is
  // the planner's verdict: how much of each source's allocation buys
  // signal rather than memorization. One corpus scan into a
  // sources-sized aggregate; the BIGINT cross-multiplication is the
  // q169 idiom (widen to DECIMAL(38,0) at warehouse scale). The exp()
  // term is 9-dp rounded before use (the q133 sigmoid parity idiom).
  def dataConstrainedEpochs: Q = Q(
    "q221_data_constrained",
    """WITH u AS (SELECT source, text, max(len(string_split(text, ' '))) AS ntok,
      |         count(*) AS copies
      |       FROM documents GROUP BY source, text),
      |a AS (SELECT source, CAST(sum(ntok * copies) AS BIGINT) AS raw_tokens,
      |        CAST(sum(ntok) AS BIGINT) AS uniq_tokens
      |      FROM u GROUP BY source),
      |tot AS (SELECT CAST(sum(raw_tokens) AS BIGINT) AS traw,
      |          CAST(3 * sum(uniq_tokens) AS BIGINT) AS budget FROM a),
      |b AS (SELECT source, raw_tokens, uniq_tokens,
      |        CAST(budget * raw_tokens // traw AS BIGINT) AS alloc_tokens
      |      FROM a CROSS JOIN tot),
      |e AS (SELECT source, raw_tokens, uniq_tokens, alloc_tokens,
      |        round(CAST(alloc_tokens AS DOUBLE) / uniq_tokens, 4) AS epochs,
      |        round(uniq_tokens * 15.0 * (1.0 - round(exp(
      |          -(CAST(alloc_tokens AS DOUBLE) / uniq_tokens) / 15.0), 9)), 2)
      |          AS effective_tokens
      |      FROM b)
      |SELECT source, raw_tokens, uniq_tokens, alloc_tokens, epochs,
      |  effective_tokens,
      |  round(effective_tokens / alloc_tokens, 4) AS value_ratio
      |FROM e ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val u = docs
      .groupBy(col("source"), xxhash64(col("text")).as("h"), length(col("text")).as("l"))
      .agg(max(TextAnalysis.tokenCount(col("text"))).as("ntok"),
        count(lit(1)).as("copies"))
    val a = Dedup.persistTracked(u.groupBy("source")
      .agg(sum(col("ntok") * col("copies")).cast("long").as("raw_tokens"),
        sum(col("ntok")).cast("long").as("uniq_tokens")))
    val tot = a.agg(sum(col("raw_tokens")).cast("long").as("traw"),
      (lit(3) * sum(col("uniq_tokens"))).cast("long").as("budget"))
    val b = a.crossJoin(broadcast(tot))
      .select(col("source"), col("raw_tokens"), col("uniq_tokens"),
        expr("budget * raw_tokens div traw").cast("long").as("alloc_tokens"))
    val epochsE = col("alloc_tokens").cast("double") / col("uniq_tokens")
    val eff = round(col("uniq_tokens") * 15.0 *
      (lit(1.0) - round(exp(-epochsE / 15.0), 9)), 2)
    b.select(col("source"), col("raw_tokens"), col("uniq_tokens"), col("alloc_tokens"),
        round(epochsE, 4).as("epochs"), eff.as("effective_tokens"),
        round(eff / col("alloc_tokens"), 4).as("value_ratio"))
      .orderBy("source")
  }

  // --- q158: curation-funnel waterfall -------------------------------------
  // The audit every data team runs before a training launch: how many
  // documents survive each successive gate (length → quality → exact
  // dedup), where did the volume go. Per-doc boolean gate flags are
  // computed in ONE pass (the dedup flag is a keyed min-per-text join,
  // the q39 idiom — no window over corpus-sized partitions), reduced
  // to a single counts row, then unpivoted with `stack` into the
  // 4-row waterfall — so the corpus is scanned once and the window
  // (for the drop deltas) runs over 4 rows, not over docs.
  def curationFunnel: Q = Q(
    "q158_curation_funnel",
    s"""WITH m AS (SELECT text, min(doc_id) AS mn FROM documents GROUP BY text),
       |f AS (SELECT d.doc_id,
       |    len(string_split(text, ' ')) >= 10 AS g1,
       |    (least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0) * 0.5
       |      + (1.0 - CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stop))) AS DOUBLE)
       |          / len(string_split(text, ' '))) * 0.5) >= 0.6 AS g2,
       |    d.doc_id = m.mn AS g3
       |  FROM documents d JOIN m USING (text)),
       |agg AS (SELECT count(*) AS c0,
       |    CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
       |    CAST(sum(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
       |    CAST(sum(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END) AS BIGINT) AS c3
       |  FROM f),
       |s AS (SELECT 0 AS stage_id, 'total' AS stage, c0 AS n_pass, c0 FROM agg
       |  UNION ALL SELECT 1, 'min_length', c1, c0 FROM agg
       |  UNION ALL SELECT 2, 'quality', c2, c0 FROM agg
       |  UNION ALL SELECT 3, 'exact_dedup', c3, c0 FROM agg)
       |SELECT stage_id, stage, n_pass,
       |  CAST(coalesce(lag(n_pass) OVER (ORDER BY stage_id) - n_pass, 0) AS BIGINT) AS n_drop,
       |  round(CAST(n_pass AS DOUBLE) / c0, 6) AS pct_retained
       |FROM s ORDER BY stage_id""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val mins = docs.groupBy("text").agg(min("doc_id").as("mn"))
    val f = docs.join(mins, "text")
      .select(
        (TextAnalysis.tokenCount(col("text")) >= 10).as("g1"),
        (TextAnalysis.qualityScore(col("text")) >= 0.6).as("g2"),
        (col("doc_id") === col("mn")).as("g3"))
    val agg = f.agg(count(lit(1)).as("c0"),
      sum(when(col("g1"), 1).otherwise(0)).as("c1"),
      sum(when(col("g1") && col("g2"), 1).otherwise(0)).as("c2"),
      sum(when(col("g1") && col("g2") && col("g3"), 1).otherwise(0)).as("c3"))
    val st = agg.select(
      expr("stack(4, 0, 'total', c0, 1, 'min_length', c1, " +
        "2, 'quality', c2, 3, 'exact_dedup', c3) as (stage_id, stage, n_pass)"),
      col("c0"))
    st.select(col("stage_id"), col("stage"), col("n_pass"),
        coalesce(lag("n_pass", 1).over(Window.orderBy("stage_id")) - col("n_pass"),
          lit(0L)).as("n_drop"),
        round(col("n_pass").cast("double") / col("c0"), 6).as("pct_retained"))
      .orderBy("stage_id")
  }

  // --- q155: cross-source quantile normalization ---------------------------
  // Quality scores are not comparable across sources (a "long" web doc
  // and a "long" code file sit at different absolute lengths), so
  // mixing pipelines normalize per-source before applying one global
  // gate. Each doc gets its within-source decile and its global decile
  // — tie-safe integer math throughout: decile = ⌊10·|{v' < v}|/N⌋
  // from a cumulative count over the VALUE histogram, never an
  // interpolated percentile (whose float rounding could flip a bucket
  // between engines) and never a per-row global row_number. The
  // windows run over histograms (distinct score values, bounded by
  // the score's range), not over docs, so the unpartitioned global
  // window is calendar-sized, not corpus-sized; the per-doc work is
  // two hash joins on the score value and one broadcast.
  def quantileNormalize: Q = Q(
    "q155_quantile_normalize",
    """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      |n AS (SELECT count(*) AS nn FROM d),
      |hg AS (SELECT n_chars, count(*) AS c FROM d GROUP BY 1),
      |hg2 AS (SELECT n_chars,
      |          CAST(sum(c) OVER (ORDER BY n_chars) - c AS BIGINT) AS lt FROM hg),
      |hs AS (SELECT source, n_chars, count(*) AS c FROM d GROUP BY 1, 2),
      |sn AS (SELECT source, CAST(sum(c) AS BIGINT) AS sc FROM hs GROUP BY 1),
      |hs2 AS (SELECT source, n_chars,
      |          CAST(sum(c) OVER (PARTITION BY source ORDER BY n_chars) - c AS BIGINT) AS slt
      |        FROM hs)
      |SELECT doc_id, d.source, d.n_chars,
      |  CAST((slt * 10) // sc AS BIGINT) AS src_decile,
      |  CAST((lt * 10) // (SELECT nn FROM n) AS BIGINT) AS global_decile
      |FROM d
      |  JOIN hg2 ON d.n_chars = hg2.n_chars
      |  JOIN hs2 ON d.source = hs2.source AND d.n_chars = hs2.n_chars
      |  JOIN sn ON d.source = sn.source
      |ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    val d = Tables.documents(s, dir).select("doc_id", "source", "n_chars")
    val n = d.agg(count(lit(1)).as("nn"))
    val hg = d.groupBy("n_chars").agg(count(lit(1)).as("c"))
    val hg2 = hg
      .withColumn("lt", sum("c").over(Window.orderBy("n_chars")) - col("c"))
      .select("n_chars", "lt")
    val hs = d.groupBy("source", "n_chars").agg(count(lit(1)).as("c"))
    val sn = hs.groupBy("source").agg(sum("c").as("sc"))
    val hs2 = hs
      .withColumn("slt",
        sum("c").over(Window.partitionBy("source").orderBy("n_chars")) - col("c"))
      .select("source", "n_chars", "slt")
    d.join(hg2, "n_chars")
      .join(hs2, Seq("source", "n_chars"))
      .join(broadcast(sn), "source")
      .crossJoin(broadcast(n)) // 1-row scalar
      .select(col("doc_id"), col("source"), col("n_chars"),
        expr("(slt * 10) div sc").as("src_decile"),
        expr("(lt * 10) div nn").as("global_decile"))
      .orderBy("doc_id")
  }

  // --- q134: DSIR importance resampling -------------------------------------
  // Data Selection via Importance Resampling (Xie et al. 2023): score
  // every raw doc by how target-like its unigram distribution is —
  // logw(d) = Σ_w c_{d,w}·(ln p̂_target(w) − ln p̂_raw(w)) over a
  // bounded vocabulary with add-one smoothing — then draw a
  // without-replacement sample ∝ exp(logw) via Gumbel top-k (seeded,
  // the q110 idiom). Scale shape: ONE token explode feeds per-doc term
  // counts; the vocabulary is bounded (top-300 by total count) so the
  // λ_w = ln-ratio table broadcasts; the per-doc weight is a keyed
  // join + DECIMAL-summed aggregate; the sample is a
  // TakeOrderedAndProject. No all-pairs shape, no driver data — the
  // λ table is the only collect-free broadcast. ln terms round to 9 dp
  // before the exact sum (the never-sum-raw-doubles rule), which is
  // also what makes the whole chain — counts, smoothing, weights,
  // Gumbel keys — replicate bit-for-bit in the DuckDB oracle.
  def dsirResample: Q = Q(
    "q134_dsir_resample",
    """WITH tokc AS (SELECT doc_id, tok, count(*) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY doc_id, tok),
      |cls AS (SELECT doc_id, source, source IN ('src0', 'src1', 'src2') AS tgt
      |        FROM documents),
      |tc AS (SELECT t.tok,
      |         sum(CASE WHEN c2.tgt THEN t.c ELSE 0 END) AS tcnt,
      |         sum(CASE WHEN c2.tgt THEN 0 ELSE t.c END) AS rcnt
      |       FROM tokc t JOIN cls c2 USING (doc_id) GROUP BY t.tok),
      |vocab AS (SELECT tok, tcnt, rcnt FROM tc ORDER BY tcnt + rcnt DESC, tok LIMIT 300),
      |tot AS (SELECT sum(tcnt) AS tt, sum(rcnt) AS tr FROM vocab),
      |lam AS (SELECT tok,
      |    round(ln(CAST(tcnt + 1 AS DOUBLE) / CAST(tt + 300 AS DOUBLE)), 9)
      |  - round(ln(CAST(rcnt + 1 AS DOUBLE) / CAST(tr + 300 AS DOUBLE)), 9) AS lam
      |  FROM vocab, tot),
      |logw AS (SELECT t.doc_id,
      |    CAST(sum(CAST(round(CAST(t.c AS DOUBLE) * l.lam, 9) AS DECIMAL(18,9)))
      |         AS DOUBLE) AS lw
      |  FROM tokc t JOIN lam l USING (tok) JOIN cls c2 USING (doc_id)
      |  WHERE NOT c2.tgt GROUP BY t.doc_id),
      |g AS (SELECT doc_id, lw, lw + (-ln(-ln(
      |        (((doc_id % 1000003) * 2654435761 + 7) % 1000003 + 0.5) / 1000003.0)))
      |      AS s FROM logw)
      |SELECT g.doc_id, d.source, round(g.lw, 6) AS logw, round(g.s, 6) AS score
      |FROM g JOIN documents d ON d.doc_id = g.doc_id
      |ORDER BY g.s DESC, g.doc_id LIMIT 50""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val tokc = Dedup.persistTracked(
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c")))
    val cls = docs.select(col("doc_id"), col("source"),
      col("source").isin("src0", "src1", "src2").as("tgt"))
    val tc = tokc.join(cls.select("doc_id", "tgt"), "doc_id")
      .groupBy("tok")
      .agg(sum(when(col("tgt"), col("c")).otherwise(lit(0))).as("tcnt"),
        sum(when(col("tgt"), lit(0)).otherwise(col("c"))).as("rcnt"))
    val vocab = tc.orderBy((col("tcnt") + col("rcnt")).desc, col("tok")).limit(300)
    val tot = vocab.agg(sum("tcnt").as("tt"), sum("rcnt").as("tr"))
    val lam = vocab.crossJoin(broadcast(tot)) // 1-row scalar broadcast
      .select(col("tok"),
        (round(log((col("tcnt") + 1).cast("double") / (col("tt") + 300).cast("double")), 9)
          - round(log((col("rcnt") + 1).cast("double") / (col("tr") + 300).cast("double")), 9))
          .as("lam"))
    val logw = tokc.join(broadcast(lam), "tok")
      .join(cls.select("doc_id", "tgt"), "doc_id")
      .filter(!col("tgt"))
      .groupBy("doc_id")
      .agg(dsum(round(col("c").cast("double") * col("lam"), 9), 9).as("lw"))
    logw.select(col("doc_id"), col("lw"),
        graft.functions.Transforms.gumbelKey(col("lw"), col("doc_id"), 7L).as("s"))
      .join(docs.select("doc_id", "source"), "doc_id")
      .orderBy(col("s").desc, col("doc_id")).limit(50)
      .select(col("doc_id"), col("source"), round(col("lw"), 6).as("logw"),
        round(col("s"), 6).as("score"))
  }

  // --- q110: deterministic weighted sampling (Efraimidis–Spirakis) ----------
  // Weighted sampling without replacement as a top-k: each doc gets
  // key ln(u)/w (u a pure (doc_id, salt) uniform via the q34 LCG, w =
  // n_chars), and the k largest keys are the sample — the A-ES
  // algorithm in log domain, so inclusion probability tracks weight
  // with no sequential pass. Engine-reproducible for the same reason
  // q34 is: u is exact integer arithmetic, and ln/divide agree across
  // engines at the tested precision. At scale this is a
  // TakeOrderedAndProject (per-partition heaps + driver merge of k),
  // never a full sort.
  def weightedSample: Q = Q(
    "q110_weighted_sample",
    """WITH scored AS (
      |  SELECT doc_id, n_chars,
      |    ln((((doc_id % 1000003) * 2654435761 + 42) % 1000003 + 0.5) / 1000003.0)
      |      / n_chars AS s
      |  FROM documents)
      |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, round(s, 9) AS score
      |FROM scored ORDER BY s DESC, doc_id LIMIT 100""".stripMargin,
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"),
        graft.functions.Transforms.weightedSampleKey(col("doc_id"), col("n_chars"), 42L).as("s"))
      .orderBy(col("s").desc, col("doc_id"))
      .limit(100)
      .select(col("doc_id"), col("n_chars"), round(col("s"), 9).as("score"))
  }

  // --- q100: per-source quota cap -------------------------------------------
  // The Common-Crawl-style per-domain cap: no source may contribute
  // more than `cap` docs, survivors chosen by deterministic md5 rank
  // (stable across runs and cluster sizes, unlike sample()). Skew is
  // the whole problem here — a megasite with 10⁹ docs would put 10⁹
  // rows through one reducer's window — so the exact window runs on a
  // PRE-FILTERED candidate set: per-source counts (tiny, broadcast)
  // size an md5-space threshold at 4× the cap's share, keeping a
  // downward-closed ~4·cap-row prefix of each source's hash order.
  // The filter can't change the answer (it keeps a prefix of exactly
  // the order the window ranks by, with vanishing odds of < cap
  // survivors — P ≈ e^(−1.5·cap)), so the oracle is the plain window.
  def sourceQuota: Q = Q(
    "q100_source_quota",
    """SELECT doc_id, source FROM (
      |  SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 40
      |ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    val cap = 40
    val docs = Tables.documents(s, dir)
    val rates = docs.groupBy("source").agg(count(lit(1)).as("__n"))
      .withColumn("__frac", least(lit(1.0), lit(4.0 * cap) / col("__n")))
    // lexicographic hex md5 order == numeric order of its 32-bit prefix
    val h32 = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.join(broadcast(rates), "source")
      .filter(h32 < (col("__frac") * lit(4294967296L)).cast("long"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  // --- q71: connected-components duplicate clusters ------------------------
  // Pairs say who matches whom; the component says which docs are ONE
  // document (A~B, B~C ⇒ {A,B,C} even though A,C never paired). Edges =
  // exact-duplicate edges (member → representative) ∪ near-dup Jaccard
  // pairs over representatives; the oracle recomputes the same
  // components via a recursive-CTE transitive closure.
  def dedupClusters: Q = Q(
    "q71_dedup_clusters",
    """WITH RECURSIVE
      |dd AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM dd),
      |sh0 AS (SELECT DISTINCT doc_id, shingle FROM toks,
      |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
      |       WHERE len(t) >= 3),
      |hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000),
      |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |near AS (SELECT id_a, id_b FROM pairs
      |         JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      |         WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
      |exacts AS (SELECT d.doc_id AS id_a, r.doc_id AS id_b
      |           FROM documents d JOIN dd r ON d.text = r.text AND d.doc_id <> r.doc_id),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM near
      |          UNION SELECT id_b, id_a FROM near
      |          UNION SELECT id_a, id_b FROM exacts
      |          UNION SELECT id_b, id_a FROM exacts),
      |reach(id, lab) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id)
      |SELECT id AS doc_id, min(lab) AS cluster_id
      |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    Dedup.componentsOf(Tables.documents(s, dir), "doc_id", "text", 0.5)
      .orderBy("doc_id")
  }

  // --- q72: deterministic hash sampling ------------------------------------
  // Eval-holdout selection must be a pure function of the key — stable
  // across engines, retries, partitionings, and corpus growth (a doc is
  // in or out forever, no RNG state). Keep rows whose md5(key) prefix
  // falls below the fraction threshold: '28f5' / 16^4 ≈ 16%. Pure
  // per-row filter — no shuffle, no sort, embarrassingly parallel.
  def hashSample: Q = Q(
    "q72_hash_sample",
    """SELECT doc_id FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '28f5'
      |ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .filter(substring(md5(col("doc_id").cast("string")), 1, 4) < "28f5")
      .select("doc_id").orderBy("doc_id")
  }

  // --- q73: token-budget shard packing -------------------------------------
  // Assign docs to training shards of ~2000 tokens by running token
  // offset, partitioned by language (shards are homogeneous per lang
  // and the window state is bounded per partition — the scale-safe
  // shape; an unpartitioned ORDER BY would serialize the corpus
  // through one task). shard = floor(start_offset / budget).
  def packShards: Q = Q(
    "q73_pack_shards",
    """SELECT doc_id, lang,
      |  CAST(floor((CAST(sum(len(string_split(text, ' '))) OVER
      |      (PARTITION BY lang ORDER BY doc_id) AS BIGINT)
      |    - len(string_split(text, ' '))) / 2000.0) AS BIGINT) AS shard
      |FROM documents
      |ORDER BY lang, doc_id""".stripMargin,
  ) { (s, dir) =>
    val ntok = TextAnalysis.tokenCount(col("text"))
    val w = Window.partitionBy("lang").orderBy("doc_id")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        floor((sum(ntok).over(w) - ntok) / 2000.0).cast("long").as("shard"))
      .orderBy("lang", "doc_id")
  }

  // --- q75: cluster-aware curation v2 --------------------------------------
  // The end-to-end pipeline with TRANSITIVE dedup: q67 drops the non-rep
  // side of each near-dup pair, so a chain A~B~C keeps two survivors
  // (A and C never paired). Here the connected component decides: keep
  // exactly the min-id representative per cluster, then quality-gate,
  // split train/eval by the deterministic md5 rule, and pack each
  // (lang, split) stream into ~2000-token shards by running offset —
  // every stage a keyed join, window, or per-row filter; nothing
  // driver-side.
  def curationV2: Q = Q(
    "q75_curation_v2",
    s"""WITH RECURSIVE
       |dd AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
       |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM dd),
       |sh0 AS (SELECT DISTINCT doc_id, shingle FROM toks,
       |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
       |       WHERE len(t) >= 3),
       |hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000),
       |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |near AS (SELECT id_a, id_b FROM pairs
       |         JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
       |         WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
       |exacts AS (SELECT d.doc_id AS id_a, r.doc_id AS id_b
       |           FROM documents d JOIN dd r ON d.text = r.text AND d.doc_id <> r.doc_id),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM near
       |          UNION SELECT id_b, id_a FROM near
       |          UNION SELECT id_a, id_b FROM exacts
       |          UNION SELECT id_b, id_a FROM exacts),
       |reach(id, lab) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
       |clusters AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id),
       |reps AS (SELECT d.doc_id, d.lang, d.text FROM documents d
       |         JOIN clusters c ON d.doc_id = c.doc_id AND d.doc_id = c.cluster_id),
       |gated AS (SELECT doc_id, lang, text FROM reps
       |          WHERE least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0) * 0.5
       |            + (1.0 - CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stop))) AS DOUBLE)
       |                / len(string_split(text, ' '))) * 0.5 >= 0.6),
       |assigned AS (SELECT doc_id, lang, text,
       |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '28f5'
       |              THEN 'eval' ELSE 'train' END AS split
       |         FROM gated)
       |SELECT doc_id, lang, split,
       |  CAST(floor((CAST(sum(len(string_split(text, ' '))) OVER
       |      (PARTITION BY lang, split ORDER BY doc_id) AS BIGINT)
       |    - len(string_split(text, ' '))) / 2000.0) AS BIGINT) AS shard
       |FROM assigned
       |ORDER BY lang, split, doc_id""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    // exact ∪ near edges → components → min-id representative per
    // cluster, via the library's one-call entry point
    val survivors = Dedup.dedupCorpus(docs, "doc_id", "text", threshold = 0.5)
    val ntok = TextAnalysis.tokenCount(col("text"))
    val w = Window.partitionBy("lang", "split").orderBy("doc_id")
    survivors
      .filter(TextAnalysis.qualityScore(col("text")) >= 0.6)
      .withColumn("split",
        when(substring(md5(col("doc_id").cast("string")), 1, 4) < "28f5", "eval")
          .otherwise("train"))
      .select(col("doc_id"), col("lang"), col("split"),
        floor((sum(ntok).over(w) - ntok) / 2000.0).cast("long").as("shard"))
      .orderBy("lang", "split", "doc_id")
  }

  private def stop = graft.text.TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  // --- q83: deterministic domain-balanced downsampling ---------------------
  // Mixture control: downsample every language stream to the smallest
  // language's size, so the training mixture is uniform across
  // domains. Selection is rank-by-md5 within each language — a pure
  // function of the corpus (stable across engines, retries, and
  // partitionings, like q72), not an RNG draw. The per-lang window
  // ranks a bounded partition; the min count is a broadcast scalar
  // join, so nothing global ever sorts.
  def balancedMixture: Q = Q(
    "q83_balanced_mixture",
    """WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
      |target AS (SELECT min(n) AS m FROM counts),
      |ranked AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      |  FROM documents)
      |SELECT doc_id, lang FROM ranked, target
      |WHERE rk <= m
      |ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val target = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("m"))
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs.select(col("doc_id"), col("lang"), row_number().over(w).as("rk"))
      .crossJoin(broadcast(target))
      .filter(col("rk") <= col("m"))
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  // --- q87: temperature-weighted source mixture ----------------------------
  // Between "keep everything" and q83's hard equalization sits
  // temperature sampling: language l is kept with probability
  // p_l = (min_count / count_l)^(1-α), α = 0.5 — the square-root
  // flattening used for multilingual pretraining mixes. The keep
  // decision must be a pure function of the key (the registry's
  // determinism rule: anything stochastic derives from (key, salt)), so
  // the uniform draw is the doc's md5 prefix compared against the
  // language's probability rendered as a 6-hex-digit threshold
  // ('%06x' of floor(p·16^6) — 6-char-vs-6-char compare is numeric
  // order; p = 1 renders as 'g', lexicographically above every hex
  // digit, i.e. keep-all). Plan shape: tiny per-lang rate table
  // broadcast against a map-only filter — at 100 TB, one pass, no
  // shuffle before the output sort.
  def temperatureMixture: Q = Q(
    "q87_temperature_mixture",
    """WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
      |target AS (SELECT min(n) AS mn FROM counts),
      |rates AS (
      |  SELECT lang, pow(CAST(mn AS DOUBLE) / n, 0.5) AS p FROM counts, target),
      |thr AS (
      |  SELECT lang, CASE WHEN p >= 1.0 THEN 'g'
      |    ELSE printf('%06x', CAST(floor(p * 16777216) AS BIGINT)) END AS t
      |  FROM rates)
      |SELECT d.doc_id, d.lang FROM documents d JOIN thr ON d.lang = thr.lang
      |WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6) < thr.t
      |ORDER BY d.doc_id""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val target = counts.agg(min(col("n")).as("mn"))
    val thr = counts.crossJoin(broadcast(target))
      .withColumn("p", pow(col("mn").cast("double") / col("n"), 0.5))
      .select(col("lang"),
        when(col("p") >= 1.0, lit("g"))
          .otherwise(format_string("%06x", floor(col("p") * 16777216).cast("long")))
          .as("t"))
    docs.join(broadcast(thr), "lang")
      .filter(substring(md5(col("doc_id").cast("string")), 1, 6) < col("t"))
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  // --- q74: PII redaction ---------------------------------------------------
  // Scrub emails and phone-shaped digit runs before training. The query
  // injects deterministic PII derived from doc_id so the redaction is
  // exercised on every row (the corpus itself is lorem-ish), then both
  // engines must produce byte-identical scrubbed text — pinning that
  // the regex semantics (char classes, greed, replace-all) agree.
  def piiRedact: Q = Q(
    "q74_pii_redact",
    """SELECT doc_id,
      |  regexp_replace(
      |    regexp_replace(
      |      text || ' contact user' || CAST(doc_id AS VARCHAR)
      |        || '@mail.example.com or call +1-555-'
      |        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
      |      '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
      |    '\+?[0-9][0-9-]{6,}', '<PHONE>', 'g') AS redacted
      |FROM documents
      |ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    val withPii = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or call +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        regexp_replace(
          regexp_replace(withPii, "[a-z0-9._]+@[a-z0-9.]+", "<EMAIL>"),
          "\\+?[0-9][0-9-]{6,}", "<PHONE>").as("redacted"))
      .orderBy("doc_id")
  }

  // --- q313: redaction audit (verify the control, not just run it) -------------
  // Defense-in-depth for q74: after the redaction pass, SCAN the
  // output with the same PII patterns and report per-pattern hit
  // counts before vs after — the audit row a compliance review asks
  // for ("prove the scrubber caught everything it claims to catch").
  // hits_after must be zero for every covered pattern; a regression in
  // either engine's regex semantics (or a pattern edit that stops
  // matching its own redaction witness) turns the row red. Per-row
  // regexp counting inside codegen, one scan, a 2-row report.
  def redactionAudit: Q = Q(
    "q313_redaction_audit",
    """WITH w AS (SELECT
      |    text || ' contact user' || CAST(doc_id AS VARCHAR)
      |      || '@mail.example.com or call +1-555-'
      |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
      |  FROM documents),
      |r AS (SELECT raw,
      |    regexp_replace(
      |      regexp_replace(raw, '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
      |      '\+?[0-9][0-9-]{6,}', '<PHONE>', 'g') AS red
      |  FROM w),
      |c AS (SELECT
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(len(regexp_extract_all(raw, '[a-z0-9._]+@[a-z0-9.]+'))) AS BIGINT)
      |      AS email_before,
      |    CAST(sum(len(regexp_extract_all(red, '[a-z0-9._]+@[a-z0-9.]+'))) AS BIGINT)
      |      AS email_after,
      |    CAST(sum(len(regexp_extract_all(raw, '\+?[0-9][0-9-]{6,}'))) AS BIGINT)
      |      AS phone_before,
      |    CAST(sum(len(regexp_extract_all(red, '\+?[0-9][0-9-]{6,}'))) AS BIGINT)
      |      AS phone_after
      |  FROM r)
      |SELECT 'email' AS pattern, n_docs, email_before AS hits_before,
      |  email_after AS hits_after FROM c
      |UNION ALL
      |SELECT 'phone', n_docs, phone_before, phone_after FROM c
      |ORDER BY pattern""".stripMargin,
  ) { (s, dir) =>
    val emailRe = "[a-z0-9._]+@[a-z0-9.]+"
    val phoneRe = "\\+?[0-9][0-9-]{6,}"
    val raw = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or call +1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    val red = regexp_replace(
      regexp_replace(raw, emailRe, "<EMAIL>"), phoneRe, "<PHONE>")
    def hits(c: org.apache.spark.sql.Column, re: String) =
      size(regexp_extract_all(c, lit(re), lit(0))).cast("long")
    val c = Tables.documents(s, dir)
      .select(hits(raw, emailRe).as("eb"), hits(red, emailRe).as("ea"),
        hits(raw, phoneRe).as("pb"), hits(red, phoneRe).as("pa"))
      .agg(count(lit(1)).as("n_docs"),
        sum("eb").as("email_before"), sum("ea").as("email_after"),
        sum("pb").as("phone_before"), sum("pa").as("phone_after"))
    c.select(lit("email").as("pattern"), col("n_docs"),
        col("email_before").as("hits_before"), col("email_after").as("hits_after"))
      .unionByName(c.select(lit("phone").as("pattern"), col("n_docs"),
        col("phone_before").as("hits_before"), col("phone_after").as("hits_after")))
      .orderBy("pattern")
  }

  private def stopSql = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  /** The q36 composite quality score as SQL (both halves of every
    * survival/threshold query must derive it identically).
    */
  private def qualitySql(toks: String) =
    s"least(1.0, CAST(len($toks) AS DOUBLE) / 50.0) * 0.5 " +
      s"+ (1.0 - CAST(len(list_filter($toks, x -> x IN ($stopSql))) AS DOUBLE) / len($toks)) * 0.5"

  // --- q207: quality-threshold survival curve --------------------------------
  // "Where do we set the quality cutoff?" answered with data: docs and
  // tokens surviving at every candidate threshold 0.0..0.9. NOT a
  // 10× scan (or a threshold-cross-join blowup): each doc buckets
  // ONCE at floor(10·quality) — q ≥ k/10 ⟺ floor(10q) ≥ k exactly,
  // integer against integer — the corpus reduces to an ≤11-row bucket
  // table, and the curve is a reverse-cumulative join over that.
  // Shares are integer-count ratios; the quality double is the q36
  // expression, identical in both engines.
  def qualitySurvivalCurve: Q = Q(
    "q207_quality_survival",
    s"""WITH d AS (SELECT string_split(text, ' ') AS toks FROM documents),
       |q AS (SELECT CAST(floor((${qualitySql("toks")}) * 10) AS INTEGER) AS b,
       |         len(toks) AS ntok FROM d),
       |bk AS (SELECT b, count(*) AS docs, CAST(sum(ntok) AS BIGINT) AS toks
       |       FROM q GROUP BY b),
       |tot AS (SELECT CAST(sum(docs) AS BIGINT) AS td, CAST(sum(toks) AS BIGINT) AS tt
       |        FROM bk),
       |th AS (SELECT CAST(k AS INTEGER) AS k FROM UNNEST(range(0, 10)) AS u(k))
       |SELECT round(k / 10.0, 1) AS threshold,
       |  CAST(sum(bk.docs) AS BIGINT) AS n_docs,
       |  CAST(sum(bk.toks) AS BIGINT) AS n_tokens,
       |  round(CAST(sum(bk.docs) AS DOUBLE) / max(td), 4) AS doc_share,
       |  round(CAST(sum(bk.toks) AS DOUBLE) / max(tt), 4) AS token_share
       |FROM th JOIN bk ON bk.b >= th.k CROSS JOIN tot
       |GROUP BY k ORDER BY threshold""".stripMargin,
  ) { (s, dir) =>
    val q = Tables.documents(s, dir)
      .select(floor(TextAnalysis.qualityScore(col("text")) * 10).cast("int").as("b"),
        size(TextAnalysis.tokens(col("text"))).as("ntok"))
    val bk = Dedup.persistTracked(
      q.groupBy("b").agg(count(lit(1)).as("docs"), sum(col("ntok")).cast("long").as("toks")))
    val tot = bk.agg(sum(col("docs")).as("td"), sum(col("toks")).as("tt"))
    val th = s.range(0, 10).select(col("id").cast("int").as("k"))
    th.join(bk, bk("b") >= th("k")).crossJoin(broadcast(tot))
      .groupBy("k")
      .agg(sum(col("docs")).as("n_docs"), sum(col("toks")).as("n_tokens"),
        round(sum(col("docs")).cast("double") / max(col("td")), 4).as("doc_share"),
        round(sum(col("toks")).cast("double") / max(col("tt")), 4).as("token_share"))
      .select(round(col("k") / 10.0, 1).as("threshold"),
        col("n_docs"), col("n_tokens"), col("doc_share"), col("token_share"))
      .orderBy("threshold")
  }

  // --- q208: duplication-aware sampling weights ------------------------------
  // The "don't let the crawler vote twice" accounting: every doc
  // carries sampling weight 1/copies of its exact-duplicate group, so
  // a text duplicated k× contributes one doc's worth of mass no
  // matter which sources hold the copies. Per-source EFFECTIVE token
  // mass vs raw mass — the duplication-inflation number a mixture
  // designer corrects by. The group join meets on the (xxhash64,
  // length) fixed-width key (bodies never ship — the
  // exactRepresentatives contract); weights are 6-dp rounded rationals
  // DECIMAL-summed. Distinct from q203 (survivor counting): this is
  // the soft-weighting view where every copy stays but counts
  // fractionally.
  def dupWeightedTokens: Q = Q(
    "q208_dup_weighted_tokens",
    """WITH g AS (SELECT text, count(*) AS copies FROM documents GROUP BY text),
      |d AS (SELECT d.source, len(string_split(d.text, ' ')) AS ntok, g.copies
      |      FROM documents d JOIN g ON g.text = d.text)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(ntok) AS BIGINT) AS raw_tokens,
      |  CAST(sum(CAST(round(CAST(ntok AS DOUBLE) / copies, 6) AS DECIMAL(18,6)))
      |    AS DOUBLE) AS effective_tokens,
      |  round(CAST(sum(ntok) AS DOUBLE)
      |    / CAST(sum(CAST(round(CAST(ntok AS DOUBLE) / copies, 6) AS DECIMAL(18,6)))
      |        AS DOUBLE), 4) AS inflation
      |FROM d GROUP BY source ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val keyed = docs.select(col("source"),
      size(TextAnalysis.tokens(col("text"))).as("ntok"),
      xxhash64(col("text")).as("h"), length(col("text")).as("l"))
    val g = docs.select(xxhash64(col("text")).as("h"), length(col("text")).as("l"))
      .groupBy("h", "l").agg(count(lit(1)).as("copies"))
    val eff = sum(round(col("ntok").cast("double") / col("copies"), 6)
      .cast("decimal(18,6)")).cast("double")
    keyed.join(g, Seq("h", "l"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).cast("long").as("raw_tokens"),
        eff.as("effective_tokens"),
        round(sum(col("ntok")).cast("double") / eff, 4).as("inflation"))
      .orderBy("source")
  }

  // --- q213: deterministic content-hash split assignment ---------------------
  // The 90/5/5 train/val/test split done the reproducible way: the
  // split is a pure function of CONTENT (md5(text) — the q87
  // hex-threshold idiom), so re-runs, re-shuffles, and re-crawls
  // assign every copy of a text to the same fold and the assignment
  // needs no stored state. Per-(split, source) doc/token mass plus
  // the within-source doc share — the balance audit that catches a
  // source whose content skews a fold. Pure per-row map + one keyed
  // aggregate.
  def splitAssignment: Q = Q(
    "q213_split_assignment",
    """WITH a AS (SELECT source, len(string_split(text, ' ')) AS ntok,
      |    CASE WHEN substr(md5(text), 1, 6) < 'e66666' THEN 'train'
      |         WHEN substr(md5(text), 1, 6) < 'f33333' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents),
      |src AS (SELECT source, count(*) AS sd FROM a GROUP BY source)
      |SELECT a.split, a.source, count(*) AS n_docs,
      |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
      |  round(CAST(count(*) AS DOUBLE) / max(sd), 4) AS source_doc_share
      |FROM a JOIN src ON src.source = a.source
      |GROUP BY a.split, a.source ORDER BY a.split, a.source""".stripMargin,
  ) { (s, dir) =>
    val a = Tables.documents(s, dir)
      .select(col("source"), size(TextAnalysis.tokens(col("text"))).as("ntok"),
        splitOf(col("text")).as("split"))
    val src = a.groupBy("source").agg(count(lit(1)).as("sd"))
    a.join(broadcast(src), "source")
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).cast("long").as("n_tokens"),
        round(count(lit(1)).cast("double") / max(col("sd")), 4).as("source_doc_share"))
      .orderBy("split", "source")
  }

  /** q213/q214's content-hash fold: md5 first-6-hex against the
    * 0.9/0.95 thresholds (0.9·16⁶ = 15099494 = 0xe66666). Exact
    * duplicates co-assign BY CONSTRUCTION (same text → same hash).
    */
  private def splitOf(text: org.apache.spark.sql.Column) =
    when(substring(md5(text), 1, 6) < "e66666", "train")
      .when(substring(md5(text), 1, 6) < "f33333", "val")
      .otherwise("test")

  // --- q216: cluster-aware split assignment -----------------------------------
  // The FIX for the leakage q214 exposes: the fold hashes the CLUSTER
  // REPRESENTATIVE's text (cluster_id IS the min-id member — the q71
  // convention), so every member of a near-dup cluster co-assigns and
  // fold leakage is zero BY CONSTRUCTION (still stateless and
  // reproducible: content in, fold out). Per-fold doc/token/cluster
  // mass — the numbers that replace q213's once a corpus cares about
  // paraphrase contamination. One keyed join from the shared memoized
  // components handle to the representatives' texts, then a fold-keyed
  // rollup; the oracle replays closure + representative hash + CASE.
  def clusterAwareSplit: Q = Q(
    "q216_cluster_split",
    """WITH RECURSIVE
      |dd AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM dd),
      |sh0 AS (SELECT DISTINCT doc_id, shingle FROM toks,
      |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
      |       WHERE len(t) >= 3),
      |hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000),
      |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |near AS (SELECT id_a, id_b FROM pairs
      |         JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      |         WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
      |exacts AS (SELECT d.doc_id AS id_a, r.doc_id AS id_b
      |           FROM documents d JOIN dd r ON d.text = r.text AND d.doc_id <> r.doc_id),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM near
      |          UNION SELECT id_b, id_a FROM near
      |          UNION SELECT id_a, id_b FROM exacts
      |          UNION SELECT id_b, id_a FROM exacts),
      |reach(id, lab) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
      |cl AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id),
      |rf AS (SELECT r.doc_id AS cluster_id,
      |    CASE WHEN substr(md5(r.text), 1, 6) < 'e66666' THEN 'train'
      |         WHEN substr(md5(r.text), 1, 6) < 'f33333' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM documents r JOIN (SELECT DISTINCT cluster_id FROM cl) c
      |    ON r.doc_id = c.cluster_id),
      |a AS (SELECT rf.split, cl.cluster_id, cl.doc_id,
      |        len(string_split(d.text, ' ')) AS ntok
      |      FROM cl JOIN rf USING (cluster_id)
      |      JOIN documents d ON d.doc_id = cl.doc_id),
      |tot AS (SELECT count(*) AS td FROM documents)
      |SELECT split, count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens,
      |  CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
      |  round(CAST(count(*) AS DOUBLE) / max(td), 4) AS doc_share
      |FROM a CROSS JOIN tot GROUP BY split ORDER BY split""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val cl = Dedup.componentsOf(docs, "doc_id", "text", 0.5)
    // fold of the representative's text (cluster_id is a doc_id)
    val rf = docs.select(col("doc_id").as("cluster_id"), splitOf(col("text")).as("split"))
      .join(cl.select("cluster_id").distinct(), "cluster_id")
    val tot = docs.agg(count(lit(1)).as("td"))
    cl.join(rf, "cluster_id")
      .join(docs.select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).as("ntok")), "doc_id")
      .crossJoin(broadcast(tot))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).cast("long").as("n_tokens"),
        countDistinct(col("cluster_id")).as("n_clusters"),
        round(count(lit(1)).cast("double") / max(col("td")), 4).as("doc_share"))
      .orderBy("split")
  }

  // --- q214: split-leakage audit over near-dup clusters ----------------------
  // The eval-contamination hole q213's content hash CANNOT close: a
  // near-duplicate pair (J ≥ 0.5, different bytes) hashes to
  // different folds, putting a paraphrase of a training doc in the
  // test set. This emits exactly those clusters — near-dup components
  // (the shared memoized Dedup.componentsOf handle) whose members
  // span >1 fold — with their fold list; the downstream fix is
  // cluster-aware assignment (split by cluster_id, not text). Output
  // is bounded by leaky clusters; the oracle independently replays
  // the recursive closure (q195's CTE) plus the fold CASE.
  def splitLeakage: Q = Q(
    "q214_split_leakage",
    """WITH RECURSIVE
      |dd AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM dd),
      |sh0 AS (SELECT DISTINCT doc_id, shingle FROM toks,
      |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
      |       WHERE len(t) >= 3),
      |hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000),
      |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |near AS (SELECT id_a, id_b FROM pairs
      |         JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      |         WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
      |exacts AS (SELECT d.doc_id AS id_a, r.doc_id AS id_b
      |           FROM documents d JOIN dd r ON d.text = r.text AND d.doc_id <> r.doc_id),
      |edges AS (SELECT id_a AS src, id_b AS dst FROM near
      |          UNION SELECT id_b, id_a FROM near
      |          UNION SELECT id_a, id_b FROM exacts
      |          UNION SELECT id_b, id_a FROM exacts),
      |reach(id, lab) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id),
      |cl AS (SELECT id AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY id),
      |f AS (SELECT cl.cluster_id, cl.doc_id,
      |    CASE WHEN substr(md5(d.text), 1, 6) < 'e66666' THEN 'train'
      |         WHEN substr(md5(d.text), 1, 6) < 'f33333' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM cl JOIN documents d ON d.doc_id = cl.doc_id)
      |SELECT cluster_id, count(*) AS n_members,
      |  CAST(count(DISTINCT split) AS BIGINT) AS n_splits,
      |  array_to_string(list_sort(list_distinct(list(split))), ',') AS splits
      |FROM f GROUP BY cluster_id
      |HAVING count(DISTINCT split) > 1
      |ORDER BY cluster_id""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    Dedup.componentsOf(docs, "doc_id", "text", 0.5)
      .join(docs.select(col("doc_id"), splitOf(col("text")).as("split")), "doc_id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"),
        countDistinct(col("split")).as("n_splits"),
        concat_ws(",", sort_array(collect_set(col("split")))).as("splits"))
      .filter(col("n_splits") > 1)
      .orderBy("cluster_id")
  }

  // --- q237: filter disparate-impact audit ---------------------------------
  // A quality gate tuned on the majority language silently decimates
  // the others — the fairness failure mode of every learned/heuristic
  // filter. The audit is the EEOC four-fifths rule applied per
  // language: pass rate of the median-threshold quality gate (q226's
  // fq), the best-passing language as reference, disparate-impact
  // ratio rate/max_rate, and a `below_four_fifths` flag. One scan
  // scores the corpus, the median rides back as a 1-row broadcast,
  // rates reduce per language, and the max is a second 1-row
  // broadcast — nothing wider than |languages| past the scan. The
  // ratio-of-rates is exact-count division; 0/0 (an empty gate)
  // NULLs via try_divide.
  def filterParity: Q = Q(
    "q237_filter_parity",
    s"""WITH sc AS (SELECT lang,
       |    round(${CurationSqlFragments.qualitySql}, 4) AS sq
       |  FROM documents),
       |med AS (SELECT quantile_cont(sq, 0.5) AS mq FROM sc),
       |r AS (SELECT lang, count(*) AS n,
       |    CAST(sum(CASE WHEN sq >= mq THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
       |  FROM sc CROSS JOIN med GROUP BY lang),
       |mx AS (SELECT max(CAST(n_pass AS DOUBLE) / n) AS max_rate FROM r)
       |SELECT lang, CAST(n AS BIGINT) AS n_docs, n_pass,
       |  round(CAST(n_pass AS DOUBLE) / n, 4) AS pass_rate,
       |  round((CAST(n_pass AS DOUBLE) / n) / max_rate, 4) AS di_ratio,
       |  ((CAST(n_pass AS DOUBLE) / n) / max_rate < 0.8) AS below_four_fifths
       |FROM r CROSS JOIN mx ORDER BY lang""".stripMargin,
  ) { (s, dir) =>
    val sc = Dedup.persistTracked(Tables.documents(s, dir)
      .select(col("lang"), round(TextAnalysis.qualityScore(col("text")), 4).as("sq")))
    val med = sc.agg(expr("percentile(sq, 0.5)").as("mq"))
    val r = sc.crossJoin(broadcast(med))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(when(col("sq") >= col("mq"), 1).otherwise(0)).cast("long").as("n_pass"))
    val mx = r.agg(max(col("n_pass").cast("double") / col("n")).as("max_rate"))
    val rate = col("n_pass").cast("double") / col("n")
    r.crossJoin(broadcast(mx))
      .select(col("lang"), col("n").cast("long").as("n_docs"), col("n_pass"),
        round(rate, 4).as("pass_rate"),
        round(try_divide(rate, col("max_rate")), 4).as("di_ratio"),
        (try_divide(rate, col("max_rate")) < 0.8).as("below_four_fifths"))
      .orderBy("lang")
  }

  // --- q238: importance reweighting toward a target mixture ----------------
  // When resampling (q83/q87/q134) isn't allowed — every doc must
  // stay, e.g. a fixed eval pool — the mixture is corrected by
  // WEIGHTS instead: per-source w = target share / observed token
  // share (target = uniform over sources), and the price of the skew
  // is Kish's effective sample size (Σw)²/Σw² over docs, reported as
  // an ESS fraction of the corpus. One (source, token-mass) aggregate
  // plus a doc-count scan; the per-source weight joins back only into
  // the sources-bounded Kish sums (Σw = Σ_s n_s·w_s, Σw² = Σ_s
  // n_s·w_s² — never a per-doc pass), all DECIMAL-summed at 9 dp.
  // The TOTAL row carries the ESS verdict next to the per-source
  // weight table.
  def importanceReweight: Q = Q(
    "q238_importance_reweight",
    """WITH tm AS (SELECT source, count(*) AS n_docs,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(sum(toks) AS BIGINT) AS t, count(*) AS k,
      |               CAST(sum(n_docs) AS BIGINT) AS nd FROM tm),
      |w AS (SELECT source, n_docs, toks,
      |    round(CAST(toks AS DOUBLE) / t, 6) AS obs_share,
      |    round((1.0 / k) / (CAST(toks AS DOUBLE) / t), 9) AS weight
      |  FROM tm CROSS JOIN tot),
      |kish AS (SELECT
      |    CAST(sum(CAST(round(n_docs * weight, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sw,
      |    CAST(sum(CAST(round(n_docs * weight * weight, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sww
      |  FROM w)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs, toks, obs_share,
      |  round(weight, 4) AS weight, CAST(NULL AS DOUBLE) AS ess_frac
      |FROM w
      |UNION ALL
      |SELECT 'TOTAL', nd, t, 1.0, CAST(NULL AS DOUBLE),
      |  round((sw * sw / sww) / nd, 4)
      |FROM tot CROSS JOIN kish
      |ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    val tm = Tables.documents(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextAnalysis.tokens(col("text")))).cast("long").as("toks"))
    val tot = tm.agg(sum("toks").cast("long").as("t"), count(lit(1)).as("k"),
      sum("n_docs").cast("long").as("nd"))
    val w = Dedup.persistTracked(tm.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("toks"),
        round(col("toks").cast("double") / col("t"), 6).as("obs_share"),
        round((lit(1.0) / col("k")) / (col("toks").cast("double") / col("t")), 9)
          .as("weight")))
    val kish = w.agg(
      dsum(round(col("n_docs") * col("weight"), 9), 9).as("sw"),
      dsum(round(col("n_docs") * col("weight") * col("weight"), 9), 9).as("sww"))
    val perSource = w.select(col("source"), col("n_docs").cast("long").as("n_docs"),
      col("toks"), col("obs_share"), round(col("weight"), 4).as("weight"),
      lit(null).cast("double").as("ess_frac"))
    val total = broadcast(tot).crossJoin(broadcast(kish))
      .select(lit("TOTAL").as("source"), col("nd").as("n_docs"), col("t").as("toks"),
        lit(1.0).as("obs_share"), lit(null).cast("double").as("weight"),
        round((col("sw") * col("sw") / col("sww")) / col("nd"), 4).as("ess_frac"))
    perSource.union(total).orderBy("source")
  }

  // --- q250: exact Shapley attribution over quality filters -----------------
  // q226 (κ) and q237 (parity) audit filters pairwise and per-group;
  // this answers the budgeting question — how much of the total
  // removal does each gate actually OWN once overlaps are split
  // fairly? The coalition game v(S) = docs removed by applying the
  // filters in S (a doc is removed when it fails ANY filter in S),
  // over three q230 gopher rules: length in [20,80], ≥2 stopwords,
  // unique-token fraction ≥ 0.4. With n = 3 the Shapley value is a
  // closed form over the 2³ pass-count cells — φ_len = [2(N−p_len) +
  // (p_stop−p_ls) + (p_uniq−p_lu) + 2(p_su−p_lsu)]/6 — so the whole
  // query is ONE corpus scan reducing to eight integer sums (map-side
  // combined, nothing wider than a row of counters crosses the
  // shuffle at any corpus size), then per-filter arithmetic on that
  // 1-row frame. Every intermediate is an exact integer; the only
  // division is the final /6 and the share — no float-order or
  // signed-zero exposure anywhere (a monotone game has φ ≥ 0).
  // Efficiency (Σφ = v(N)) holds by construction and the oracle
  // recomputes the identical closed form from the corpus.
  def filterShapley: Q = Q(
    "q250_filter_shapley",
    s"""WITH d AS (SELECT
       |    CASE WHEN len(t) BETWEEN 20 AND 80 THEN 1 ELSE 0 END AS f1,
       |    CASE WHEN len(list_filter(t, x -> x IN (${TextSqlFragments.stopList}))) >= 2
       |         THEN 1 ELSE 0 END AS f2,
       |    CASE WHEN 5 * len(list_distinct(t)) >= 2 * len(t) THEN 1 ELSE 0 END AS f3
       |  FROM (SELECT string_split(text, ' ') AS t FROM documents)),
       |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(f1) AS BIGINT) AS p1, CAST(sum(f2) AS BIGINT) AS p2,
       |    CAST(sum(f3) AS BIGINT) AS p3,
       |    CAST(sum(f1 * f2) AS BIGINT) AS p12,
       |    CAST(sum(f1 * f3) AS BIGINT) AS p13,
       |    CAST(sum(f2 * f3) AS BIGINT) AS p23,
       |    CAST(sum(f1 * f2 * f3) AS BIGINT) AS p123 FROM d),
       |s AS (
       |  SELECT 'len' AS filter, n - p1 AS removed_solo, p23 - p123 AS removed_last,
       |    2 * (n - p1) + (p2 - p12) + (p3 - p13) + 2 * (p23 - p123) AS num,
       |    n - p123 AS v_all FROM c
       |  UNION ALL
       |  SELECT 'stop', n - p2, p13 - p123,
       |    2 * (n - p2) + (p1 - p12) + (p3 - p23) + 2 * (p13 - p123), n - p123 FROM c
       |  UNION ALL
       |  SELECT 'uniq', n - p3, p12 - p123,
       |    2 * (n - p3) + (p1 - p13) + (p2 - p23) + 2 * (p12 - p123), n - p123 FROM c)
       |SELECT filter, removed_solo, removed_last,
       |  round(num / 6.0, 4) AS shapley,
       |  round(num / (6.0 * v_all), 4) AS shapley_share
       |FROM s ORDER BY filter""".stripMargin,
  ) { (s, dir) =>
    val t = TextAnalysis.tokens(col("text"))
    val d = Tables.documents(s, dir).select(
      when(size(t).between(20, 80), 1).otherwise(0).as("f1"),
      when(TextAnalysis.stopwordCount(t) >= 2, 1).otherwise(0).as("f2"),
      when(lit(5) * size(array_distinct(t)) >= lit(2) * size(t), 1).otherwise(0).as("f3"))
    val c = d.agg(count(lit(1)).as("n"),
      sum("f1").cast("long").as("p1"), sum("f2").cast("long").as("p2"),
      sum("f3").cast("long").as("p3"),
      sum(col("f1") * col("f2")).cast("long").as("p12"),
      sum(col("f1") * col("f3")).cast("long").as("p13"),
      sum(col("f2") * col("f3")).cast("long").as("p23"),
      sum(col("f1") * col("f2") * col("f3")).cast("long").as("p123"))
    def row(name: String, solo: org.apache.spark.sql.Column,
        last: org.apache.spark.sql.Column, num: org.apache.spark.sql.Column) =
      struct(lit(name).as("filter"), solo.as("removed_solo"), last.as("removed_last"),
        num.as("num"), (col("n") - col("p123")).as("v_all"))
    val rows = c.select(explode(array(
        row("len", col("n") - col("p1"), col("p23") - col("p123"),
          lit(2) * (col("n") - col("p1")) + (col("p2") - col("p12"))
            + (col("p3") - col("p13")) + lit(2) * (col("p23") - col("p123"))),
        row("stop", col("n") - col("p2"), col("p13") - col("p123"),
          lit(2) * (col("n") - col("p2")) + (col("p1") - col("p12"))
            + (col("p3") - col("p23")) + lit(2) * (col("p13") - col("p123"))),
        row("uniq", col("n") - col("p3"), col("p12") - col("p123"),
          lit(2) * (col("n") - col("p3")) + (col("p1") - col("p13"))
            + (col("p2") - col("p23")) + lit(2) * (col("p12") - col("p123")))))
        .as("s"))
      .select(col("s.*"))
    rows.select(col("filter"), col("removed_solo"), col("removed_last"),
        round(col("num") / 6.0, 4).as("shapley"),
        round(try_divide(col("num").cast("double"), lit(6.0) * col("v_all")), 4)
          .as("shapley_share"))
      .orderBy("filter")
  }

  // --- q272: Otsu threshold selection on the quality histogram ---------------
  // Every fixed quality cutoff in this registry (q67's 0.5, q207's
  // bands) is a hand-picked constant; Otsu's criterion picks the
  // cutoff FROM the data — the threshold maximizing between-class
  // variance ω₀ω₁(μ₀−μ₁)², the two-class separation a bimodal
  // quality distribution (boilerplate vs natural text) exhibits.
  // Quality is 4-dp quantized onto the 1e-4 integer grid, so the
  // whole curve reduces to cumulative integer moments over the score
  // histogram: σ²_b = (cumS·N − S·cumN)² / (N²·cumN·(N−cumN)), with
  // the cancelling numerator kept EXACT in DECIMAL(38,0) before the
  // one double division. Windows run over the ≤10⁴-row histogram,
  // never the corpus. The argmax is emitted as a flag on 6-dp-rounded
  // variance (ties flag both rows in both engines) rather than a
  // float argmax that could pick different rows cross-engine.
  def otsuThreshold: Q = Q(
    "q272_otsu_threshold",
    s"""WITH sc AS (SELECT CAST(round((${CurationSqlFragments.qualitySql}) * 10000)
       |    AS BIGINT) AS qi FROM documents),
       |hist AS (SELECT qi, count(*) AS c FROM sc GROUP BY qi),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
       |    CAST(sum(qi * c) AS BIGINT) AS s FROM hist),
       |cum AS (SELECT qi,
       |    CAST(sum(c) OVER (ORDER BY qi) AS BIGINT) AS cn,
       |    CAST(sum(qi * c) OVER (ORDER BY qi) AS BIGINT) AS cs
       |  FROM hist),
       |v AS (SELECT qi, cn, n,
       |    CAST(CAST(cs AS DECIMAL(38,0)) * n - CAST(s AS DECIMAL(38,0)) * cn
       |      AS DOUBLE) AS dnum
       |  FROM cum CROSS JOIN tot WHERE cn < n),
       |sb AS (SELECT qi, round(dnum * dnum /
       |    (CAST(n AS DOUBLE) * n * cn * (n - cn)) / 100000000.0, 6) AS sigma_b
       |  FROM v),
       |mx AS (SELECT max(sigma_b) AS m FROM sb)
       |SELECT round(qi / 10000.0, 4) AS threshold, sigma_b,
       |  sigma_b = m AS is_best
       |FROM sb CROSS JOIN mx ORDER BY threshold""".stripMargin,
  ) { (s, dir) =>
    val sc = Tables.documents(s, dir)
      .select(round(TextAnalysis.qualityScore(col("text")) * 10000)
        .cast("long").as("qi"))
    val hist = Dedup.persistTracked(sc.groupBy("qi").agg(count(lit(1)).as("c")))
    val tot = hist.agg(sum("c").cast("long").as("n"),
      sum(col("qi") * col("c")).cast("long").as("s"))
    val w = Window.orderBy("qi")
    val cum = hist
      .withColumn("cn", sum("c").over(w).cast("long"))
      .withColumn("cs", sum(col("qi") * col("c")).over(w).cast("long"))
      .select("qi", "cn", "cs")
    val dnum = (col("cs").cast("decimal(38,0)") * col("n") -
      col("s").cast("decimal(38,0)") * col("cn")).cast("double")
    val v = cum.crossJoin(broadcast(tot)).filter(col("cn") < col("n"))
      .select(col("qi"), col("cn"), col("n"), dnum.as("dnum"))
    val sb = Dedup.persistTracked(v.select(col("qi"),
      round(col("dnum") * col("dnum") /
        (col("n").cast("double") * col("n") * col("cn") * (col("n") - col("cn")))
        / 100000000.0, 6).as("sigma_b")))
    val mx = sb.agg(max("sigma_b").as("m"))
    sb.crossJoin(broadcast(mx))
      .select(round(col("qi") / 10000.0, 4).as("threshold"), col("sigma_b"),
        (col("sigma_b") === col("m")).as("is_best"))
      .orderBy("threshold")
  }

  // --- q273: empirical-Bayes shrinkage of per-source pass rates --------------
  // Small sources produce noisy quality-pass rates; ranking or
  // quota-ing on the raw rate rewards luck. The beta-binomial
  // empirical-Bayes fix: fit (α, β) to the across-source rate spread
  // by method of moments (K = m(1−m)/v − 1, α = mK), then shrink each
  // source toward the prior mean with weight n/(n+K) — exactly the
  // estimator a mixture planner should feed q169/q83. Per-source
  // rates are 6-dp-rounded before the 20-row moment pass so the
  // across-source mean/variance are DECIMAL-exact; the prior solve
  // and the shrunk rates are closed-form doubles with identical
  // shapes in both engines. A degenerate corpus (all sources equal →
  // v = 0) NULLs K via try_divide rather than inventing a prior.
  def ebShrinkage: Q = Q(
    "q273_eb_shrinkage",
    s"""WITH d AS (SELECT source,
       |    CASE WHEN round(${CurationSqlFragments.qualitySql}, 4) >= 0.75
       |         THEN 1 ELSE 0 END AS pass
       |  FROM documents),
       |r AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(pass) AS BIGINT) AS x,
       |    CAST(round(CAST(sum(pass) AS DOUBLE) / count(*), 6) AS DECIMAL(18,6)) AS rr
       |  FROM d GROUP BY source),
       |mom AS (SELECT CAST(count(*) AS BIGINT) AS k_src,
       |    CAST(sum(rr) AS DOUBLE) / count(*) AS m,
       |    CAST(sum(rr * rr) AS DOUBLE) / count(*)
       |      - (CAST(sum(rr) AS DOUBLE) / count(*))
       |        * (CAST(sum(rr) AS DOUBLE) / count(*)) AS v
       |  FROM r),
       |pri AS (SELECT m, (m * (1.0 - m)) / v - 1.0 AS kk FROM mom)
       |SELECT source, n AS n_docs, x AS n_pass,
       |  round(CAST(x AS DOUBLE) / n, 6) AS raw_rate,
       |  round((x + m * kk) / (n + kk), 6) AS shrunk_rate,
       |  round(CAST(n AS DOUBLE) / (n + kk), 6) AS weight
       |FROM r CROSS JOIN pri ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    val d = Tables.documents(s, dir)
      .select(col("source"),
        when(round(TextAnalysis.qualityScore(col("text")), 4) >= 0.75, 1)
          .otherwise(0).as("pass"))
    val r = Dedup.persistTracked(d.groupBy("source")
      .agg(count(lit(1)).cast("long").as("n"), sum("pass").cast("long").as("x"))
      .withColumn("rr", round(col("x").cast("double") / col("n"), 6)
        .cast("decimal(18,6)")))
    val m = sum("rr").cast("double") / count(lit(1))
    val mom = r.agg(count(lit(1)).cast("long").as("k_src"), m.as("m"),
      (sum(col("rr") * col("rr")).cast("double") / count(lit(1)) -
        m * m).as("v"))
    val pri = mom.select(col("m"),
      (try_divide(col("m") * (lit(1.0) - col("m")), col("v")) - 1.0).as("kk"))
    r.crossJoin(broadcast(pri))
      .select(col("source"), col("n").as("n_docs"), col("x").as("n_pass"),
        round(col("x").cast("double") / col("n"), 6).as("raw_rate"),
        round(try_divide(col("x") + col("m") * col("kk"), col("n") + col("kk")), 6)
          .as("shrunk_rate"),
        round(try_divide(col("n").cast("double"), col("n") + col("kk")), 6)
          .as("weight"))
      .orderBy("source")
  }

  // --- q280: greedy max-coverage (facility-location) doc selection ------------
  // The diversity-subset selector dual to q256's k-center: pick K
  // docs that together COVER the most distinct trigrams — the
  // submodular facility-location objective whose greedy is
  // (1−1/e)-optimal, used to seed eval sets / dedup exemplars with
  // maximum n-gram coverage. Per round the plan is one anti-join
  // against the covered-shingle set plus one doc-keyed count — K
  // corpus passes total, all keyed, covered shingles never leave the
  // cluster; only the per-round argmax row reaches the driver (the
  // q256 scalar-collect budget). Ties break on doc_id; the oracle
  // unrolls the identical K rounds as (gain, argmax, cover) CTE
  // triples, so the data-dependent greedy chain is replayed
  // independently.
  def facilityLocation: Q = {
    val K = 5
    // each greedy round is a full keyed corpus pass (anti-join +
    // count) and the oracle unrolls K CTE triples — K is a round
    // BUDGET, not a tunable. Fail loudly if an edit inflates it
    // (the Hits.require(iters <= 4) precedent).
    require(K <= 8,
      s"q280: K=$K greedy rounds = K corpus passes and K unrolled " +
        "oracle CTE rounds; the documented budget is K <= 8")
    val roundCtes = (2 to K).map { r =>
      val exclude = (1 until r).map(i => s"SELECT doc_id FROM s$i")
        .mkString(" UNION ALL ")
      s"""g$r AS (SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS gain
         |  FROM sh LEFT JOIN c${r - 1} cc ON sh.shingle = cc.shingle
         |  WHERE cc.shingle IS NULL AND sh.doc_id NOT IN ($exclude)
         |  GROUP BY sh.doc_id),
         |s$r AS (SELECT doc_id, gain FROM g$r ORDER BY gain DESC, doc_id LIMIT 1),
         |c$r AS (SELECT shingle FROM c${r - 1}
         |  UNION SELECT sh.shingle FROM sh JOIN s$r USING (doc_id))""".stripMargin
    }.mkString(",\n")
    val sel = (1 to K).map(r =>
      s"SELECT $r AS sel_rank, doc_id, gain FROM s$r").mkString(" UNION ALL ")
    Q(
      "q280_facility_location",
      s"""WITH dd AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, shingle FROM dd,
         |    UNNEST(list_transform(range(1, len(t) - 1),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
         |  WHERE len(t) >= 3),
         |g1 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain FROM sh GROUP BY doc_id),
         |s1 AS (SELECT doc_id, gain FROM g1 ORDER BY gain DESC, doc_id LIMIT 1),
         |c1 AS (SELECT DISTINCT sh.shingle FROM sh JOIN s1 USING (doc_id)),
         |$roundCtes
         |SELECT CAST(sel_rank AS BIGINT) AS sel_rank, doc_id, gain FROM ($sel)
         |ORDER BY sel_rank""".stripMargin,
    ) { (s, dir) =>
      val t = TextAnalysis.tokens(col("text"))
      val sh = Dedup.persistTracked(Tables.documents(s, dir)
        .filter(size(t) >= 3)
        .select(col("doc_id"), t.as("t"))
        .select(col("doc_id"),
          explode(graft.functions.WordNGrams(col("t"), 3, distinct = false)).as("shingle"))
        .distinct())
      val picks = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      var uncovered = sh
      var checkpointed: org.apache.spark.sql.DataFrame = null
      for (r <- 1 to K) {
        val gains = if (picks.isEmpty) uncovered
          else uncovered.filter(!col("doc_id").isin(picks.map(_._2).toSeq: _*))
        val best = gains.groupBy("doc_id").agg(count(lit(1)).as("gain"))
          .orderBy(col("gain").desc, col("doc_id")).limit(1).collect()
        if (best.nonEmpty) {
          val row = best(0)
          picks += ((r.toLong, row.getLong(0), row.getLong(1)))
          val cov = sh.filter(col("doc_id") === row.getLong(0)).select("shingle")
          // EAGER lineage cut per greedy round (the
          // Clusters.connectedComponents idiom): without it round r
          // re-executes all r−1 anti-joins from the persisted base —
          // O(K²) scans; with it each round is one anti-join over the
          // previous round's materialized survivors. Previous round's
          // blocks are dropped once the new one exists.
          val next = uncovered.join(cov, Seq("shingle"), "left_anti")
            .localCheckpoint(true)
          if (checkpointed != null)
            graft.dedup.Clusters.releaseCheckpoint(checkpointed)
          checkpointed = next
          uncovered = next
        }
      }
      if (checkpointed != null)
        graft.dedup.Clusters.releaseCheckpoint(checkpointed)
      import s.implicits._
      picks.toSeq.toDF("sel_rank", "doc_id", "gain").orderBy("sel_rank")
    }
  }

  // --- q290: best-of-n sampling yield per source -------------------------------
  // The BoN question a preference/rejection-sampling pipeline asks of
  // each source: if I draw n docs and keep the best by quality, what
  // score do I expect? E[max of n] has the exact order-statistic form
  // Σ_v v·(F(v)ⁿ − F(v⁻)ⁿ) on the 4-dp score histogram — no sampling,
  // no corpus sort, just per-source cumulative counts over the
  // bounded histogram and 9-dp decimal term sums. Reported for
  // n = 1 (the mean — a built-in sanity check), 4, and 16: the spread
  // between them is the selection headroom curation can still buy.
  def bestOfN: Q = Q(
    "q290_best_of_n",
    s"""WITH sc AS (SELECT source,
       |    round(${CurationSqlFragments.qualitySql}, 4) AS sq FROM documents),
       |hist AS (SELECT source, sq, CAST(count(*) AS BIGINT) AS c
       |  FROM sc GROUP BY 1, 2),
       |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY source),
       |cum AS (SELECT h.source, h.sq, h.c, ns.n,
       |    CAST(sum(h.c) OVER (PARTITION BY h.source ORDER BY h.sq) AS BIGINT) AS cc
       |  FROM hist h JOIN ns ON ns.source = h.source),
       |terms AS (SELECT source, n,
       |    round(sq * (pow(CAST(cc AS DOUBLE) / n, 1)
       |      - pow(CAST(cc - c AS DOUBLE) / n, 1)), 9) AS t1,
       |    round(sq * (pow(CAST(cc AS DOUBLE) / n, 4)
       |      - pow(CAST(cc - c AS DOUBLE) / n, 4)), 9) AS t4,
       |    round(sq * (pow(CAST(cc AS DOUBLE) / n, 16)
       |      - pow(CAST(cc - c AS DOUBLE) / n, 16)), 9) AS t16
       |  FROM cum)
       |SELECT source, max(n) AS n_docs,
       |  round(CAST(sum(CAST(t1 AS DECIMAL(18,9))) AS DOUBLE), 6) AS e_best_of_1,
       |  round(CAST(sum(CAST(t4 AS DECIMAL(18,9))) AS DOUBLE), 6) AS e_best_of_4,
       |  round(CAST(sum(CAST(t16 AS DECIMAL(18,9))) AS DOUBLE), 6) AS e_best_of_16
       |FROM terms GROUP BY source ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    val sc = Tables.documents(s, dir)
      .select(col("source"), round(TextAnalysis.qualityScore(col("text")), 4).as("sq"))
    val hist = sc.groupBy("source", "sq").agg(count(lit(1)).cast("long").as("c"))
    val ns = hist.groupBy("source").agg(sum("c").cast("long").as("n"))
    val cum = hist.join(ns, "source")
      .withColumn("cc", sum("c")
        .over(Window.partitionBy("source").orderBy("sq")).cast("long"))
    def term(nn: Int) = round(col("sq") *
      (pow(col("cc").cast("double") / col("n"), nn) -
        pow((col("cc") - col("c")).cast("double") / col("n"), nn)), 9)
    cum.select(col("source"), col("n"),
        term(1).as("t1"), term(4).as("t4"), term(16).as("t16"))
      .groupBy("source")
      .agg(max("n").as("n_docs"),
        round(sum(col("t1").cast("decimal(18,9)")).cast("double"), 6)
          .as("e_best_of_1"),
        round(sum(col("t4").cast("decimal(18,9)")).cast("double"), 6)
          .as("e_best_of_4"),
        round(sum(col("t16").cast("decimal(18,9)")).cast("double"), 6)
          .as("e_best_of_16"))
      .orderBy("source")
  }

  // --- q294: leave-one-source-out influence on corpus quality ------------------
  // The source-ablation readout: how much does dropping each source
  // move the corpus mean quality? All 20 leave-outs from ONE
  // aggregate pass via the sum-minus-group identity (the q285
  // jackknife trick on means): mean₋ₛ = (S−sₛ)/(N−nₛ) from
  // DECIMAL-exact per-source sums. influence > 0 ⇒ the source pulls
  // the corpus mean UP. The cancelling subtraction is znorm'd.
  def sourceInfluence: Q = Q(
    "q294_source_influence",
    s"""WITH sc AS (SELECT source,
       |    round(${CurationSqlFragments.qualitySql}, 4) AS sq FROM documents),
       |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(sq AS DECIMAL(18,4))) AS DOUBLE) AS sm
       |  FROM sc GROUP BY source),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
       |    CAST(sum(CAST(round(sm, 4) AS DECIMAL(18,4))) AS DOUBLE) AS ss FROM g)
       |SELECT source, n AS n_docs,
       |  round(sm / n, 6) AS mean_source,
       |  round((ss - sm) / (nn - n), 6) AS mean_without,
       |  round(ss / nn - (ss - sm) / (nn - n), 6) + 0.0 AS influence
       |FROM g CROSS JOIN tot ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    val sc = Tables.documents(s, dir)
      .select(col("source"), round(TextAnalysis.qualityScore(col("text")), 4).as("sq"))
    val g = Dedup.persistTracked(sc.groupBy("source")
      .agg(count(lit(1)).cast("long").as("n"), dsum(col("sq"), 4).as("sm")))
    val tot = g.agg(sum("n").cast("long").as("nn"),
      dsum(round(col("sm"), 4), 4).as("ss"))
    g.crossJoin(broadcast(tot))
      .select(col("source"), col("n").as("n_docs"),
        round(col("sm") / col("n"), 6).as("mean_source"),
        round((col("ss") - col("sm")) / (col("nn") - col("n")), 6)
          .as("mean_without"),
        znorm(round(col("ss") / col("nn") -
          (col("ss") - col("sm")) / (col("nn") - col("n")), 6)).as("influence"))
      .orderBy("source")
  }

  // --- q296: exact water-filling token allocation ------------------------------
  // q169 allocates by one uniform-target pass plus a leftover round;
  // water-filling computes the EXACT level: the cap c with
  // Σ min(tokᵢ, c) = budget (here half the corpus) — the max-min-fair
  // allocation every mixture planner converges toward. The level has
  // a closed form per saturation bracket: with sources sorted by
  // token count, c = (B − cum₍ᵣ₎)/(k − r) for the unique r where
  // tok᚛ᵣ᚜ ≤ c < tok᚛ᵣ₊₁᚜ — found by one window pass over the
  // sources-sized table (B < total always holds since B = total//2),
  // no iteration, no driver logic. Allocations compare integer avail
  // against the 6-dp-rounded level so both engines carve identically.
  def waterFilling: Q = Q(
    "q296_water_filling",
    """WITH avail AS (SELECT source,
      |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(sum(tok) AS BIGINT) AS total,
      |    CAST(count(*) AS BIGINT) AS k,
      |    CAST(sum(tok) // 2 AS BIGINT) AS b FROM avail),
      |rk AS (SELECT source, tok,
      |    row_number() OVER (ORDER BY tok, source) AS rn,
      |    CAST(coalesce(sum(tok) OVER (ORDER BY tok, source
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS cumprev,
      |    CAST(coalesce(lag(tok) OVER (ORDER BY tok, source), 0) AS BIGINT)
      |      AS prevtok
      |  FROM avail),
      |lvl AS (SELECT round(CAST(b - cumprev AS DOUBLE) / (k - rn + 1), 6) AS c
      |  FROM rk CROSS JOIN tot
      |  WHERE prevtok <= CAST(b - cumprev AS DOUBLE) / (k - rn + 1)
      |    AND CAST(b - cumprev AS DOUBLE) / (k - rn + 1) < tok)
      |SELECT source, tok AS tokens_avail,
      |  round(least(CAST(tok AS DOUBLE), c), 6) AS allocated,
      |  tok <= c AS saturated, c AS water_level
      |FROM avail CROSS JOIN lvl ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    val avail = Dedup.persistTracked(Tables.documents(s, dir)
      .select(col("source"), size(TextAnalysis.tokens(col("text"))).as("nt"))
      .groupBy("source").agg(sum("nt").cast("long").as("tok")))
    val tot = avail.agg(sum("tok").cast("long").as("total"),
      count(lit(1)).cast("long").as("k"),
      expr("sum(tok) div 2").cast("long").as("b"))
    val w = Window.orderBy("tok", "source")
    val rk = avail
      .withColumn("rn", row_number().over(w))
      .withColumn("cumprev", coalesce(sum("tok").over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).cast("long"))
      .withColumn("prevtok", coalesce(lag("tok", 1).over(w), lit(0L)).cast("long"))
    val cRaw = (col("b") - col("cumprev")).cast("double") /
      (col("k") - col("rn") + 1)
    val lvl = rk.crossJoin(broadcast(tot))
      .filter(col("prevtok") <= cRaw && cRaw < col("tok"))
      .select(round(cRaw, 6).as("c"))
    avail.crossJoin(broadcast(lvl))
      .select(col("source"), col("tok").as("tokens_avail"),
        round(least(col("tok").cast("double"), col("c")), 6).as("allocated"),
        (col("tok") <= col("c")).as("saturated"), col("c").as("water_level"))
      .orderBy("source")
  }

  /** Per-source quality-score moments shared by the q308/q309
    * experimental-design pair: count, DECIMAL-exact Σq (4-dp grid) and
    * Σq² (scale 8 — products of 4-dp values are exact there), plus the
    * sample standard deviation in q292's moment form. One scan, one
    * sources-sized aggregate.
    */
  private def qualityMoments(s: SparkSession, dir: String): DataFrame = {
    val sc = Tables.documents(s, dir)
      .select(col("source"), round(TextAnalysis.qualityScore(col("text")), 4).as("sq"))
    sc.groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(col("sq").cast("decimal(18,4)")).cast("double").as("s1"),
        sum((col("sq") * col("sq")).cast("decimal(28,8)")).cast("double").as("s2"))
      .select(col("source"), col("n"),
        sqrt((col("s2") - col("s1") / col("n") * col("s1")) / (col("n") - 1)).as("sd"))
  }

  /** The same moments as oracle CTEs (through `v(source, n, sd)`). */
  private def qualityMomentsSql: String =
    s"""sc AS (SELECT source, round(${CurationSqlFragments.qualitySql}, 4) AS sq
       |  FROM documents),
       |m AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(sq AS DECIMAL(18,4))) AS DOUBLE) AS s1,
       |    CAST(sum(CAST(sq * sq AS DECIMAL(28,8))) AS DOUBLE) AS s2
       |  FROM sc GROUP BY source),
       |v AS (SELECT source, n, sqrt((s2 - s1 / n * s1) / (n - 1)) AS sd FROM m)""".stripMargin

  // --- q308: Neyman allocation for a stratified eval set -----------------------
  // Eval-set design as a first-class pipeline op: allocate a fixed
  // labeling/eval budget (1000 docs) across sources ∝ N_h·σ_h — the
  // Neyman-optimal stratified design (minimum-variance estimate of
  // corpus quality for a fixed budget), so high-variance sources get
  // proportionally more eval slots than proportional sampling would
  // give them. Per-source weights are 4-dp rounded before the DECIMAL
  // total (an unordered float Σ across sources would be partitioning-
  // dependent), shares 6-dp; the integer allocation is floor(share ×
  // budget) on the exact 6-dp DECIMAL grid — no float boundary can
  // move a slot. A single-doc source has no variance: its weight is 0
  // (nothing to measure), sd_quality NULL via the n−1 division.
  def neymanAllocation: Q = Q(
    "q308_neyman_allocation",
    s"""WITH $qualityMomentsSql,
       |w AS (SELECT source, n, sd, round(n * coalesce(sd, 0), 4) AS wh FROM v),
       |t AS (SELECT CAST(sum(CAST(wh AS DECIMAL(18,4))) AS DOUBLE) AS tw FROM w)
       |SELECT source, n AS n_docs, round(sd, 6) AS sd_quality,
       |  round(wh / tw, 6) + 0.0 AS alloc_share,
       |  CAST(floor(CAST(round(wh / tw, 6) AS DECIMAL(18,6)) * 1000) AS BIGINT)
       |    AS n_alloc
       |FROM w CROSS JOIN t ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    val v = qualityMoments(s, dir)
    val w = v.select(col("source"), col("n"), col("sd"),
      round(col("n") * coalesce(col("sd"), lit(0.0)), 4).as("wh"))
    val t = w.agg(dsum(col("wh"), 4).as("tw"))
    val share = round(col("wh") / col("tw"), 6)
    w.crossJoin(broadcast(t))
      .select(col("source"), col("n").as("n_docs"),
        round(col("sd"), 6).as("sd_quality"),
        znorm(share).as("alloc_share"),
        floor(share.cast("decimal(18,6)") * 1000).cast("long").as("n_alloc"))
      .orderBy("source")
  }

  // --- q309: A/B power analysis per source --------------------------------------
  // Before a curation change ships, the owner asks: can this source's
  // quality even MEASURE a δ = 0.01 lift? Standard two-sample power
  // closed form n = ⌈2σ²(z_{1−α/2}+z_{power})²/δ²⌉ per arm (α = 0.05,
  // power = 0.8; z constants as shared literals so both engines run
  // the identical doubles). `powered` says whether the source itself
  // holds enough docs to run the test — the go/no-go column. Same
  // one-scan moments as q308.
  def powerAnalysis: Q = {
    val zsum = "2.801585" // z_0.975 + z_0.8 = 1.959964 + 0.841621
    val delta = "0.01"
    Q(
      "q309_power_analysis",
      s"""WITH $qualityMomentsSql
         |SELECT source, n AS n_docs, round(sd, 6) AS sd_quality,
         |  CAST(ceil(2 * sd * sd * ($zsum * $zsum) / ($delta * $delta)) AS BIGINT)
         |    AS n_required,
         |  CAST(ceil(2 * sd * sd * ($zsum * $zsum) / ($delta * $delta)) AS BIGINT)
         |    <= n AS powered
         |FROM v ORDER BY source""".stripMargin,
    ) { (s, dir) =>
      val nReq = ceil(lit(2.0) * col("sd") * col("sd")
        * (lit(zsum.toDouble) * lit(zsum.toDouble))
        / (lit(delta.toDouble) * lit(delta.toDouble))).cast("long")
      qualityMoments(s, dir)
        .select(col("source"), col("n").as("n_docs"),
          round(col("sd"), 6).as("sd_quality"),
          nReq.as("n_required"), (nReq <= col("n")).as("powered"))
        .orderBy("source")
    }
  }

  // --- q318: token-budget quality cut ----------------------------------------
  // "Keep the best docs until the token budget is full" without a
  // corpus sort: the q247 histogram-cumsum trick on the 4-dp quality
  // grid. One scan builds the (score → docs, tokens) histogram; the
  // cumulative window runs over that bounded table (≤10⁴ rows at any
  // corpus size, never doc-count rows); the cutoff is the largest
  // score whose score-descending cumulative token mass reaches the
  // budget (25% of corpus tokens), and the report re-aggregates the
  // SAME histogram — three passes over a tiny table after one corpus
  // scan. Mean qualities are DECIMAL(18,4)·count products (exact on
  // the grid); an empty rest side (cutoff = min score) yields NULL in
  // both engines; the selected−rest lift is znormed.
  def budgetQualityCut: Q = Q(
    "q318_budget_quality_cut",
    s"""WITH q AS (SELECT round((${CurationSqlFragments.qualitySql}), 4) AS sc,
       |    len(string_split(text, ' ')) AS w FROM documents),
       |h AS (SELECT sc, count(*) AS docs, CAST(sum(w) AS BIGINT) AS toks
       |      FROM q GROUP BY sc),
       |t AS (SELECT CAST(sum(toks) AS BIGINT) AS total,
       |             CAST(sum(docs) AS BIGINT) AS ndocs,
       |             CAST(floor(CAST(sum(toks) AS BIGINT) / 4.0) AS BIGINT) AS budget
       |      FROM h),
       |c AS (SELECT sc, CAST(sum(toks) OVER (ORDER BY sc DESC) AS BIGINT) AS cum
       |      FROM h),
       |thr AS (SELECT max(sc) AS cutoff FROM c, t WHERE cum >= budget)
       |SELECT cutoff,
       |  CAST(sum(CASE WHEN sc >= cutoff THEN docs END) AS BIGINT) AS n_docs_sel,
       |  CAST(sum(CASE WHEN sc >= cutoff THEN toks END) AS BIGINT) AS tokens_sel,
       |  budget AS budget_tokens, total AS total_tokens,
       |  round(CAST(sum(CASE WHEN sc >= cutoff THEN toks END) AS BIGINT)
       |    / CAST(budget AS DOUBLE), 6) AS utilization,
       |  round(CAST(sum(CASE WHEN sc >= cutoff
       |      THEN CAST(sc AS DECIMAL(18,4)) * docs END) AS DOUBLE)
       |    / CAST(sum(CASE WHEN sc >= cutoff THEN docs END) AS DOUBLE), 6)
       |    AS mean_q_sel,
       |  round(CAST(sum(CASE WHEN sc < cutoff
       |      THEN CAST(sc AS DECIMAL(18,4)) * docs END) AS DOUBLE)
       |    / CAST(sum(CASE WHEN sc < cutoff THEN docs END) AS DOUBLE), 6)
       |    AS mean_q_rest,
       |  round(CAST(sum(CASE WHEN sc >= cutoff
       |        THEN CAST(sc AS DECIMAL(18,4)) * docs END) AS DOUBLE)
       |      / CAST(sum(CASE WHEN sc >= cutoff THEN docs END) AS DOUBLE)
       |    - CAST(sum(CASE WHEN sc < cutoff
       |        THEN CAST(sc AS DECIMAL(18,4)) * docs END) AS DOUBLE)
       |      / CAST(sum(CASE WHEN sc < cutoff THEN docs END) AS DOUBLE), 6) + 0.0
       |    AS q_lift
       |FROM h, t, thr
       |GROUP BY cutoff, budget, total""".stripMargin,
  ) { (s, dir) =>
    val h = Dedup.persistTracked(Tables.documents(s, dir)
      .select(round(TextAnalysis.qualityScore(col("text")), 4).as("sc"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("w"))
      .groupBy("sc")
      .agg(count(lit(1)).as("docs"), sum(col("w")).as("toks")))
    val tot = h.agg(sum(col("toks")).as("total"), sum(col("docs")).as("ndocs"))
      .select(col("total"), col("ndocs"),
        floor(col("total") / lit(4.0)).cast("long").as("budget"))
    val cum = h
      .withColumn("cum", sum(col("toks")).over(Window.orderBy(col("sc").desc)))
    val thr = cum.crossJoin(broadcast(tot))
      .filter(col("cum") >= col("budget"))
      .agg(max(col("sc")).as("cutoff"))
    def dq = col("sc").cast("decimal(18,4)") * col("docs")
    val selQ = sum(when(col("sc") >= col("cutoff"), dq)).cast("double") /
      sum(when(col("sc") >= col("cutoff"), col("docs"))).cast("double")
    val restQ = sum(when(col("sc") < col("cutoff"), dq)).cast("double") /
      sum(when(col("sc") < col("cutoff"), col("docs"))).cast("double")
    h.crossJoin(broadcast(thr)).crossJoin(broadcast(tot))
      .groupBy("cutoff", "budget", "total")
      .agg(
        sum(when(col("sc") >= col("cutoff"), col("docs"))).as("n_docs_sel"),
        sum(when(col("sc") >= col("cutoff"), col("toks"))).as("tokens_sel"),
        round(sum(when(col("sc") >= col("cutoff"), col("toks"))).cast("double") /
          col("budget").cast("double"), 6).as("utilization"),
        round(selQ, 6).as("mean_q_sel"),
        round(restQ, 6).as("mean_q_rest"),
        znorm(round(selQ - restQ, 6)).as("q_lift"))
      .select(col("cutoff"), col("n_docs_sel"), col("tokens_sel"),
        col("budget").as("budget_tokens"), col("total").as("total_tokens"),
        col("utilization"), col("mean_q_sel"), col("mean_q_rest"), col("q_lift"))
  }

  // --- q319: shard source-mixing audit ---------------------------------------
  // Is the training shuffle actually mixed? Sequential shard packing
  // (q73's running-offset assignment) preserves crawl order, so a
  // shard can end up all-one-source — the data-loader pathology that
  // makes per-batch gradients source-correlated. Per (lang, shard):
  // doc/token mass, distinct sources, and the source-distribution
  // entropy (9-dp p·ln p terms DECIMAL-summed, the q306 discipline;
  // single-source shards hit the −0.0 cancellation and are znormed).
  // Work = q73's per-lang window + two keyed aggregates; the entropy
  // reduction runs on the (lang, shard, source) table, ≤ sources× the
  // shard count, never corpus-wide state.
  def shardMixingAudit: Q = Q(
    "q319_shard_mixing",
    """WITH a AS (SELECT doc_id, lang, source,
      |    len(string_split(text, ' ')) AS w,
      |    CAST(floor((CAST(sum(len(string_split(text, ' '))) OVER
      |        (PARTITION BY lang ORDER BY doc_id) AS BIGINT)
      |      - len(string_split(text, ' '))) / 2000.0) AS BIGINT) AS shard
      |  FROM documents),
      |g AS (SELECT lang, shard, source, count(*) AS c, CAST(sum(w) AS BIGINT) AS toks
      |      FROM a GROUP BY lang, shard, source),
      |n AS (SELECT lang, shard, CAST(sum(c) AS BIGINT) AS n_docs,
      |             CAST(sum(toks) AS BIGINT) AS n_tokens,
      |             count(*) AS n_sources
      |      FROM g GROUP BY lang, shard),
      |e AS (SELECT g.lang, g.shard,
      |    CAST(sum(CAST(round((CAST(c AS DOUBLE) / n_docs)
      |        * ln(CAST(c AS DOUBLE) / n_docs), 9) AS DECIMAL(18,9))) AS DOUBLE) AS s
      |  FROM g JOIN n ON n.lang = g.lang AND n.shard = g.shard
      |  GROUP BY g.lang, g.shard)
      |SELECT n.lang, n.shard, n.n_docs, n.n_tokens,
      |  CAST(n.n_sources AS BIGINT) AS n_sources,
      |  round(-e.s, 9) + 0.0 AS source_entropy
      |FROM n JOIN e ON e.lang = n.lang AND e.shard = n.shard
      |ORDER BY n.lang, n.shard""".stripMargin,
  ) { (s, dir) =>
    val ntok = TextAnalysis.tokenCount(col("text"))
    val w = Window.partitionBy("lang").orderBy("doc_id")
    val g = Dedup.persistTracked(Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"), ntok.cast("long").as("w"))
      .withColumn("shard",
        floor((sum(col("w")).over(w) - col("w")) / 2000.0).cast("long"))
      .groupBy("lang", "shard", "source")
      .agg(count(lit(1)).as("c"), sum(col("w")).as("toks")))
    val n = g.groupBy("lang", "shard")
      .agg(sum(col("c")).as("n_docs"), sum(col("toks")).as("n_tokens"),
        count(lit(1)).as("n_sources"))
    val p = col("c").cast("double") / col("n_docs")
    val e = g.join(n.select("lang", "shard", "n_docs"), Seq("lang", "shard"))
      .groupBy("lang", "shard")
      .agg(dsum(round(p * log(p), 9), 9).as("s"))
    n.join(e, Seq("lang", "shard"))
      .select(col("lang"), col("shard"), col("n_docs"), col("n_tokens"),
        col("n_sources"), znorm(round(-col("s"), 9)).as("source_entropy"))
      .orderBy("lang", "shard")
  }

  // --- q322: one-way ANOVA across sources -------------------------------------
  // "Do the sources differ in quality AT ALL" — the omnibus test run
  // before q273's pairwise permutation machinery is worth pointing at
  // anything: F = (SSB/(k−1))/(SSW/(n−k)) and effect size η² = SSB/SST
  // over the 4-dp quality signal. Per-source (n, Σq, Σq²) moments are
  // DECIMAL-exact from one scan (the q308 idiom); SST comes from the
  // independently decimal-summed GLOBAL moments, and SSB's Σ_h S_h²/n_h
  // is 9-dp-rounded per source then DECIMAL-summed — a raw float Σ
  // across sources would be partitioning-dependent. Degenerate corpora
  // (one source, zero within-variance) NULL via try_divide; the
  // subtraction-born SSB/SSW are znormed.
  def anovaSources: Q = Q(
    "q322_anova_sources",
    s"""WITH sc AS (SELECT source, round((${CurationSqlFragments.qualitySql}), 4) AS sq
       |  FROM documents),
       |m AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(sq AS DECIMAL(18,4))) AS DOUBLE) AS s1
       |  FROM sc GROUP BY source),
       |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(sq AS DECIMAL(18,4))) AS DOUBLE) AS s1,
       |    CAST(sum(CAST(sq * sq AS DECIMAL(28,8))) AS DOUBLE) AS s2
       |  FROM sc),
       |b AS (SELECT CAST(count(*) AS BIGINT) AS k,
       |    CAST(sum(CAST(round(s1 * s1 / n, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sb
       |  FROM m),
       |f AS (SELECT k, g.n,
       |    round(sb - s1 * s1 / g.n, 9) + 0.0 AS ssb,
       |    round((s2 - s1 * s1 / g.n) - (sb - s1 * s1 / g.n), 9) + 0.0 AS ssw,
       |    round(s2 - s1 * s1 / g.n, 9) + 0.0 AS sst
       |  FROM b, g)
       |SELECT k AS k_sources, n AS n_docs,
       |  CAST(k - 1 AS BIGINT) AS df_between, CAST(n - k AS BIGINT) AS df_within,
       |  CASE WHEN ssw / (n - k) = 0 THEN NULL
       |       ELSE round((ssb / (k - 1)) / (ssw / (n - k)), 6) + 0.0 END AS f_stat,
       |  CASE WHEN sst = 0 THEN NULL
       |       ELSE round(ssb / sst, 6) + 0.0 END AS eta_sq
       |FROM f""".stripMargin,
  ) { (s, dir) =>
    val sc = Dedup.persistTracked(Tables.documents(s, dir)
      .select(col("source"),
        round(TextAnalysis.qualityScore(col("text")), 4).as("sq")))
    val m = sc.groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(col("sq").cast("decimal(18,4)")).cast("double").as("s1"))
    val g = sc.agg(count(lit(1)).as("n"),
      sum(col("sq").cast("decimal(18,4)")).cast("double").as("s1"),
      sum((col("sq") * col("sq")).cast("decimal(28,8)")).cast("double").as("s2"))
    val b = m.agg(count(lit(1)).as("k"),
      sum(round(col("s1") * col("s1") / col("n"), 9).cast("decimal(28,9)"))
        .cast("double").as("sb"))
    val f = b.crossJoin(broadcast(g))
      .select(col("k"), col("n"),
        znorm(round(col("sb") - col("s1") * col("s1") / col("n"), 9)).as("ssb"),
        znorm(round((col("s2") - col("s1") * col("s1") / col("n"))
          - (col("sb") - col("s1") * col("s1") / col("n")), 9)).as("ssw"),
        znorm(round(col("s2") - col("s1") * col("s1") / col("n"), 9)).as("sst"))
    f.select(col("k").as("k_sources"), col("n").as("n_docs"),
      (col("k") - 1).as("df_between"), (col("n") - col("k")).as("df_within"),
      znorm(round(try_divide(col("ssb") / (col("k") - 1),
        col("ssw") / (col("n") - col("k"))), 6)).as("f_stat"),
      znorm(round(try_divide(col("ssb"), col("sst")), 6)).as("eta_sq"))
  }

  // --- q325: temperature-sweep mixture planner --------------------------------
  // q87 EXECUTES one temperature; this prices the whole dial before
  // anyone samples: for each α in the mT5/XLM-R sweep, the implied
  // language shares w_l ∝ n_l^α and the numbers that decide the choice
  // — effective language count exp(H(w)) (how many languages the
  // mixture "really" trains on), the dominant share, and the smallest
  // language's upsampling factor w_min·N/n_min (how many epochs of the
  // low-resource tail the mixture implies — the overfitting risk
  // number). One corpus scan to the languages-sized count table; the
  // sweep is a langs×4 axis. pow terms 9-dp rounded then
  // DECIMAL-summed (a float Σ across langs would be order-dependent);
  // the min-n language is tie-broken by name.
  def temperatureSweep: Q = {
    val taus = Seq(0.25, 0.5, 0.75, 1.0)
    Q(
      "q325_temperature_sweep",
      s"""WITH counts AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
         |  FROM documents GROUP BY lang),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM counts),
         |mn AS (SELECT lang AS min_lang, n AS min_n FROM counts
         |       ORDER BY n, lang LIMIT 1),
         |axis AS (SELECT * FROM (VALUES ${taus.map(t => s"($t)").mkString(", ")}) v(tau)),
         |terms AS (SELECT tau, lang, n, round(pow(CAST(n AS DOUBLE), tau), 9) AS t
         |  FROM counts CROSS JOIN axis),
         |z AS (SELECT tau, CAST(sum(CAST(t AS DECIMAL(28,9))) AS DOUBLE) AS z
         |  FROM terms GROUP BY tau),
         |w AS (SELECT terms.tau, lang, n, t / z AS w FROM terms JOIN z ON z.tau = terms.tau),
         |agg AS (SELECT w.tau,
         |    CAST(sum(CAST(round(w * ln(w), 9) AS DECIMAL(18,9))) AS DOUBLE) AS s,
         |    round(max(w), 6) AS max_share, round(min(w), 6) AS min_share
         |  FROM w GROUP BY w.tau),
         |up AS (SELECT w.tau, round(w.w * nn / min_n, 4) AS upsample_min
         |  FROM w JOIN mn ON w.lang = min_lang CROSS JOIN tot)
         |SELECT agg.tau, round(exp(-s), 4) AS eff_langs,
         |  max_share, min_share, upsample_min
         |FROM agg JOIN up ON up.tau = agg.tau
         |ORDER BY agg.tau""".stripMargin,
    ) { (s, dir) =>
      import s.implicits._
      val counts = Dedup.persistTracked(Tables.documents(s, dir)
        .groupBy("lang").agg(count(lit(1)).as("n")))
      val tot = counts.agg(sum(col("n")).as("nn"))
      val mnRow = counts.orderBy(col("n"), col("lang")).limit(1)
        .select(col("lang").as("min_lang"), col("n").as("min_n"))
      val axis = taus.toDF("tau")
      val terms = counts.crossJoin(broadcast(axis))
        .select(col("tau"), col("lang"), col("n"),
          round(pow(col("n").cast("double"), col("tau")), 9).as("t"))
      val z = terms.groupBy("tau")
        .agg(sum(col("t").cast("decimal(28,9)")).cast("double").as("z"))
      val w = Dedup.persistTracked(terms.join(z, "tau")
        .select(col("tau"), col("lang"), col("n"), (col("t") / col("z")).as("w")))
      val agg = w.groupBy("tau")
        .agg(dsum(round(col("w") * log(col("w")), 9), 9).as("s"),
          round(max(col("w")), 6).as("max_share"),
          round(min(col("w")), 6).as("min_share"))
      val up = w.join(broadcast(mnRow), col("lang") === col("min_lang"))
        .crossJoin(broadcast(tot))
        .select(col("tau"),
          round(col("w") * col("nn") / col("min_n"), 4).as("upsample_min"))
      agg.join(up, "tau")
        .select(col("tau"), round(exp(-col("s")), 4).as("eff_langs"),
          col("max_share"), col("min_share"), col("upsample_min"))
        .orderBy("tau")
    }
  }

  // --- q327: per-source data card -----------------------------------------------
  // The datasheet row a corpus release ships per source: volume (docs,
  // tokens), mean quality, exact-duplicate share, and the dominant
  // language with its share — the one-glance summary every other
  // audit drills into. One corpus scan feeds a per-source aggregate
  // (counts, DECIMAL quality sum, distinct (xxhash64, len) content
  // keys) plus a (source, lang)-bounded argmax window for the
  // dominant language; integer ratios divide once at the end.
  def sourceDatacard: Q = Q(
    "q327_source_datacard",
    s"""WITH base AS (SELECT source, lang, text,
       |    round((${CurationSqlFragments.qualitySql}), 4) AS sq,
       |    len(string_split(text, ' ')) AS w FROM documents),
       |m AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(w) AS BIGINT) AS n_tokens,
       |    CAST(sum(CAST(sq AS DECIMAL(18,4))) AS DOUBLE) AS s1,
       |    count(DISTINCT text) AS d_raw
       |  FROM base GROUP BY source),
       |lc AS (SELECT source, lang, count(*) AS c FROM base GROUP BY source, lang),
       |tl AS (SELECT source, lang AS top_lang, c FROM (
       |    SELECT *, row_number() OVER (PARTITION BY source
       |      ORDER BY c DESC, lang) AS rk FROM lc) WHERE rk = 1)
       |SELECT m.source, n_docs, n_tokens,
       |  round(s1 / n_docs, 6) AS mean_quality,
       |  round(CAST(n_docs - d_raw AS DOUBLE) / n_docs, 6) AS dup_share,
       |  top_lang, round(CAST(c AS DOUBLE) / n_docs, 6) AS top_lang_share
       |FROM m JOIN tl ON tl.source = m.source
       |ORDER BY m.source""".stripMargin,
  ) { (s, dir) =>
    val base = Dedup.persistTracked(Tables.documents(s, dir)
      .select(col("source"), col("lang"),
        round(TextAnalysis.qualityScore(col("text")), 4).as("sq"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("w"),
        struct(xxhash64(col("text")), length(col("text"))).as("k")))
    val m = base.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_tokens"),
        sum(col("sq").cast("decimal(18,4)")).cast("double").as("s1"),
        countDistinct(col("k")).as("d_raw"))
    val lc = base.groupBy("source", "lang").agg(count(lit(1)).as("c"))
    val tl = lc.withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(col("c").desc, col("lang"))))
      .filter(col("rk") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("c"))
    m.join(tl, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("s1") / col("n_docs"), 6).as("mean_quality"),
        round((col("n_docs") - col("d_raw")).cast("double") / col("n_docs"), 6)
          .as("dup_share"),
        col("top_lang"),
        round(col("c").cast("double") / col("n_docs"), 6).as("top_lang_share"))
      .orderBy("source")
  }
}

/** SQL fragments shared by Curation-family oracles. */
private[queries] object CurationSqlFragments {
  /** q36's composite quality over the raw text column. */
  def qualitySql: String = TextSqlFragments.qualitySql("string_split(text, ' ')")
}
