package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.dedup.Dedup
import graft.functions.{BloomFilters, RollingHash}
import graft.text.TextAnalysis

/** Training-data pipeline operators over the `documents` corpus: text
  * analysis, exact/fuzzy deduplication, fingerprinting.
  */
object Text {

  val all: Seq[Q] = Seq(tokenCount, textQuality, langId, corpusStats, dedupExact,
    ngramJaccard, minhashLsh, simhashPairs, rollingFingerprint, md5Fingerprint,
    corpusCuration, streamingDedup, bpeishTokens, decontaminate, repetition,
    incrementalDedup, decontaminateBloom, dupSpans, streamingIncrementalDedup,
    editDistancePairs, tfidfKeywords, bpeMergeTraining, tfidfCosinePairs,
    ngramJaccardPrefix, perplexityFilter, contextLengthPlanner, containmentPairs,
    charEntropy, scorerAgreement, streamingQualityFilter, tokenizerFertility,
    dupSpanIslands, tokenAutocorrelation, lexicalDiversity, minhashCalibration,
    streamingNearDupGate, contaminationFraction, filterKappa, nbSourceClassifier,
    gopherRules, fleissKappa, winnowing, watermarkDetect, kendallTau,
    lzCompressibility, readability, positionalEntropy, mcnemarGates, blandAltman,
    languageMix, maxTokenRun, substringDedupGlobal, dedupThresholdSweep,
    contextWaste, dupPairExplanation, lshBandPlanner, canonDedupLadder,
    dupSourceMatrix)

  // --- q171: containment (asymmetric-overlap) pairs ------------------------
  // The dedup-family member Jaccard can't see: a short document
  // embedded verbatim in a longer one scores |A∩B|/|A∪B| ≈ |A|/|B|
  // (arbitrarily low) but containment |A∩B|/|A| = 1. Same df-capped
  // inverted-index join as q40 via the shared Dedup.overlapCounts
  // core; the gate is on the LARGER direction, and both directions +
  // Jaccard are emitted so the report shows which pairs only
  // containment caught.
  def containmentPairs: Q = Q(
    "q171_containment_pairs",
    """WITH dd AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM dd),
      |sh0 AS (SELECT DISTINCT doc_id, shingle FROM toks,
      |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
      |       WHERE len(t) >= 3),
      |hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000),
      |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  round(CAST(inter AS DOUBLE) / sa.n, 4) AS cont_a,
      |  round(CAST(inter AS DOUBLE) / sb.n, 4) AS cont_b,
      |  round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 4) AS jaccard
      |FROM pairs
      |JOIN sz sa ON sa.doc_id = id_a
      |JOIN sz sb ON sb.doc_id = id_b
      |WHERE greatest(CAST(inter AS DOUBLE) / sa.n, CAST(inter AS DOUBLE) / sb.n) >= 0.6
      |ORDER BY id_a, id_b""".stripMargin,
  ) { (s, dir) =>
    Dedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text", threshold = 0.6)
      .orderBy("id_a", "id_b")
  }

  // --- q165: context-length planning profile -------------------------------
  // The query behind every max_seq_len decision: per source, how long
  // are the documents in tokens — min/p50/p90/p99/max — so truncation
  // loss vs padding waste can be budgeted before packing (q153/q73).
  // One keyed aggregate per source; the exact interpolated percentiles
  // are the q11 idiom applied per group (at 100 TB swap in q57's
  // approx_percentile — same API shape, sketch-mergeable).
  def contextLengthPlanner: Q = Q(
    "q165_context_length",
    """WITH d AS (SELECT source, len(string_split(text, ' ')) AS ntok FROM documents)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(min(ntok) AS BIGINT) AS min_tokens,
      |  round(quantile_cont(CAST(ntok AS DOUBLE), 0.5), 4) AS p50,
      |  round(quantile_cont(CAST(ntok AS DOUBLE), 0.9), 4) AS p90,
      |  round(quantile_cont(CAST(ntok AS DOUBLE), 0.99), 4) AS p99,
      |  CAST(max(ntok) AS BIGINT) AS max_tokens
      |FROM d GROUP BY source ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("source"), TextAnalysis.tokenCount(col("text")).as("ntok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        min("ntok").cast("long").as("min_tokens"),
        round(expr("percentile(CAST(ntok AS DOUBLE), 0.5)"), 4).as("p50"),
        round(expr("percentile(CAST(ntok AS DOUBLE), 0.9)"), 4).as("p90"),
        round(expr("percentile(CAST(ntok AS DOUBLE), 0.99)"), 4).as("p99"),
        max("ntok").cast("long").as("max_tokens"))
      .orderBy("source")
  }

  // --- q148: perplexity filter (cross-entropy vs reference LM) -------------
  // The CCNet move q118 builds toward: score EVERY doc's cross-entropy
  // under a bigram LM trained on the TARGET domain only (src0–2, the
  // q134 convention) — high perplexity = unlike the reference corpus =
  // filter candidate. p(w2|w1) = c2/c1 when the bigram is in the
  // model, else stupid backoff 0.4·(c1(w2)+1)/(T+V) (add-one unigram
  // over prefix positions — never zero, so ln stays finite). Shape:
  // one bigram explode; model joins are LEFT keyed joins on the
  // bigram/unigram keys (a corpus-scale LM is NOT broadcastable —
  // unhinted, AQE decides); T/V are 1-row broadcast scalars; ln terms
  // round to 9 dp into DECIMAL per-doc means. Fully oracle-checked —
  // training counts, backoff, and ranking replicate in DuckDB.
  def perplexityFilter: Q = Q(
    "q148_perplexity_filter",
    """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
      |bg AS (SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2
      |       FROM toks, UNNEST(range(1, len(t))) AS u(i) WHERE len(t) >= 2),
      |tgt AS (SELECT w1, w2 FROM bg WHERE source IN ('src0', 'src1', 'src2')),
      |c2 AS (SELECT w1, w2, count(*) AS c2 FROM tgt GROUP BY 1, 2),
      |c1 AS (SELECT w1, count(*) AS c1 FROM tgt GROUP BY 1),
      |tv AS (SELECT CAST(sum(c1) AS DOUBLE) AS tt, CAST(count(*) AS DOUBLE) AS vv FROM c1),
      |terms AS (SELECT bg.doc_id, bg.source,
      |    CASE WHEN m.c2 IS NOT NULL
      |      THEN round(ln(CAST(m.c2 AS DOUBLE) / p.c1), 9)
      |      ELSE round(ln((CAST(0.4 AS DOUBLE) * (coalesce(u.c1, 0) + 1)) / (tv.tt + tv.vv)), 9)
      |    END AS lp
      |  FROM bg
      |  LEFT JOIN c2 m ON bg.w1 = m.w1 AND bg.w2 = m.w2
      |  LEFT JOIN c1 p ON bg.w1 = p.w1
      |  LEFT JOIN c1 u ON bg.w2 = u.w1, tv)
      |SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  round(-(CAST(sum(CAST(lp AS DECIMAL(18,9))) AS DOUBLE) / count(*)), 6) AS ce
      |FROM terms GROUP BY doc_id, source
      |ORDER BY ce DESC, doc_id LIMIT 20""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val bg = graft.dedup.Dedup.persistTracked(
      docs.select(col("doc_id"), col("source"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(1), size(col("t")) - 1)).as("i"), col("t"))
        .select(col("doc_id"), col("source"),
          element_at(col("t"), col("i")).as("w1"),
          element_at(col("t"), col("i") + 1).as("w2")))
    val tgt = bg.filter(col("source").isin("src0", "src1", "src2")).select("w1", "w2")
    val c2 = tgt.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = tgt.groupBy("w1").agg(count(lit(1)).as("c1"))
    val tv = c1.agg(sum("c1").cast("double").as("tt"), count(lit(1)).cast("double").as("vv"))
    val terms = bg
      .join(c2.toDF("w1", "w2", "c2"), Seq("w1", "w2"), "left")
      .join(c1.toDF("w1", "c1p"), Seq("w1"), "left")
      .join(c1.toDF("w2", "c1u"), Seq("w2"), "left")
      .crossJoin(broadcast(tv)) // 1-row scalar broadcast
      .select(col("doc_id"), col("source"),
        when(col("c2").isNotNull, round(log(col("c2").cast("double") / col("c1p")), 9))
          .otherwise(round(log((lit(0.4) * (coalesce(col("c1u"), lit(0L)) + lit(1)))
            / (col("tt") + col("vv"))), 9)).as("lp"))
    terms.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_bigrams"),
        round(-(dsum(col("lp"), 9) / count(lit(1))), 6).as("ce"))
      .orderBy(col("ce").desc, col("doc_id")).limit(20)
  }

  // --- q142: prefix-filtered exact Jaccard pairs ---------------------------
  // q40's computation through the PPJoin-style scale path: candidates
  // come only from each doc's rarest-shingle prefix (length
  // |X| − ⌈t·|X|⌉ + 1 in the global (df, hash) order — a lossless
  // filter for Jaccard ≥ t) plus the lossless length filter,
  // exact-verified against the full sets. The oracle is q40's plain
  // inverted-index SQL at the same threshold, so a green hash IS the
  // machine-checked proof that prefix filtering lost nothing.
  // Runs at t = 0.8, the prefix filter's DESIGN POINT: the prefix is
  // then ~20% of each set and lands on the rare tail, so candidates
  // collapse to near-true-pairs. At t = 0.5 the prefix is half of
  // every set and the verification fan-out EXCEEDS the plain join's
  // direct aggregation — measured head-to-head in BENCH_NOTES
  // (round 7); below ~0.7, use q40's shape.
  def ngramJaccardPrefix: Q = Q(
    "q142_ngram_jaccard_prefix",
    """WITH dd AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM dd),
      |sh0 AS (SELECT DISTINCT doc_id, shingle FROM toks,
      |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
      |       WHERE len(t) >= 3),
      |hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000),
      |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 4) AS jaccard
      |FROM pairs
      |JOIN sz sa ON sa.doc_id = id_a
      |JOIN sz sb ON sb.doc_id = id_b
      |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.8
      |ORDER BY id_a, id_b""".stripMargin,
  ) { (s, dir) =>
    Dedup.jaccardPairsPrefix(Tables.documents(s, dir), "doc_id", "text", threshold = 0.8)
      .orderBy("id_a", "id_b")
  }

  // --- q140: TF-IDF sparse-cosine document pairs ---------------------------
  // The sparse-vector member of the similarity family (dense ANN =
  // q45+, token-set Jaccard = q40, character edit = q102): document
  // pairs ranked by cosine over TF-IDF-weighted token vectors. Pair
  // generation is the inverted-index join on the token key — and the
  // df cap (≤ 100) that standard sparse-cosine systems apply to drop
  // ubiquitous terms is ALSO the scale bound: per-token fan-out is
  // ≤ C(100,2) regardless of corpus size, and dropped terms carry
  // ~zero idf anyway. Norms are per-doc keyed aggregates joined back
  // UNhinted (a corpus-scale norm table is not broadcastable); dot
  // products and norms are DECIMAL-exact sums of 9-dp terms, so the
  // whole chain — tf, smoothed idf, weights, cosine — replicates in
  // the oracle. Cosine lives in the capped subspace by construction
  // (documented; both engines identical).
  def tfidfCosinePairs: Q = Q(
    "q140_tfidf_cosine_pairs",
    """WITH tokc AS (SELECT doc_id, tok, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY doc_id, tok),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      |dft AS (SELECT tok, count(*) AS df FROM tokc GROUP BY tok),
      |wt AS (SELECT t.doc_id, t.tok,
      |    CAST(t.tf AS DOUBLE) * round(ln(n.n / df), 9) AS w
      |  FROM tokc t JOIN dft USING (tok), n WHERE df <= 100),
      |nrm AS (SELECT doc_id,
      |    sqrt(CAST(sum(CAST(round(w * w, 9) AS DECIMAL(18,9))) AS DOUBLE)) AS nrm
      |  FROM wt GROUP BY doc_id),
      |dot AS (SELECT a.doc_id AS da, b.doc_id AS db,
      |    CAST(sum(CAST(round(a.w * b.w, 9) AS DECIMAL(18,9))) AS DOUBLE) AS dot
      |  FROM wt a JOIN wt b ON a.tok = b.tok AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |c AS (SELECT da, db, round(dot / (x.nrm * y.nrm), 6) AS cos
      |  FROM dot JOIN nrm x ON da = x.doc_id JOIN nrm y ON db = y.doc_id)
      |SELECT da, db, cos FROM c ORDER BY cos DESC, da, db LIMIT 25""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val tokc = graft.dedup.Dedup.persistTracked(
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf")))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n"))
    val dft = tokc.groupBy("tok").agg(count(lit(1)).as("df"))
    val wt = graft.dedup.Dedup.persistTracked(
      tokc.join(dft, "tok").filter(col("df") <= 100)
        .crossJoin(broadcast(nDocs)) // 1-row scalar broadcast
        .select(col("doc_id"), col("tok"),
          (col("tf").cast("double") * round(log(col("n") / col("df")), 9)).as("w")))
    val nrm = wt.groupBy("doc_id")
      .agg(sqrt(dsum(round(col("w") * col("w"), 9), 9)).as("nrm"))
    val dot = wt.as("a").join(wt.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(dsum(round(col("a.w") * col("b.w"), 9), 9).as("dot"))
    dot.join(nrm.select(col("doc_id").as("da"), col("nrm").as("na")), "da")
      .join(nrm.select(col("doc_id").as("db"), col("nrm").as("nb")), "db")
      .select(col("da"), col("db"), round(col("dot") / (col("na") * col("nb")), 6).as("cos"))
      .orderBy(col("cos").desc, col("da"), col("db")).limit(25)
  }

  // --- q123: BPE merge training (tokenizer learning) -----------------------
  // The tokenizer-TRAINING operator (Sennrich et al. 2016): learn the
  // top-8 merge rules over the corpus word-frequency table.
  // Oracle-checked by UNROLLING the training loop — the q125/q133/q157
  // fixed-iteration pattern: each round is a (pair-count, argmax,
  // merge-apply) CTE triple, so DuckDB independently replays the full
  // data-dependent iteration chain (round 6 already selects a pair
  // containing round 1's merged symbol, so the chain is genuinely
  // exercised). The merge application — a list fold whose accumulator
  // is a symbol LIST — can't use DuckDB 1.0's list_reduce directly
  // (accumulator must share the element type), so the symbol list is
  // encoded as a '|'-delimited VARCHAR: string_split's leading ''
  // self-primes the fold, "last symbol == a" is ends_with(acc, '|'+a)
  // (the '|' boundary makes it exact), and merging appends b — the
  // same left-to-right non-overlapping rule as BpeTrainer.mergeOnce
  // ('|' never occurs inside a symbol: the alphabet is [a-z0-9']).
  // BpeSpec still gates the algorithm (hand-computed fixture merges,
  // partitioning bit-determinism, prefix stability).
  def bpeMergeTraining: Q = {
    val nMerges = 8
    val roundCtes = (1 to nMerges).map { r =>
      s"""p$r AS (SELECT s[i] AS a, s[i+1] AS b, CAST(sum(n) AS BIGINT) AS cnt
         |  FROM (SELECT n, string_split(enc, '|') AS s FROM v${r - 1}),
         |       UNNEST(range(2, len(s))) AS u(i)
         |  GROUP BY 1, 2),
         |m$r AS (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
         |v$r AS (SELECT n, list_reduce(string_split(enc, '|'),
         |    (acc, x) -> CASE WHEN x = m.b AND ends_with(acc, '|' || m.a)
         |      THEN acc || m.b ELSE acc || '|' || x END) AS enc
         |  FROM v${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")
    val unionAll = (1 to nMerges)
      .map(r => s"SELECT $r AS r, a, b, cnt FROM m$r").mkString("\nUNION ALL ")
    Q(
      "q123_bpe_merge_training",
      s"""WITH v0 AS (SELECT '|' || array_to_string(string_split(word, ''), '|') AS enc, n FROM
         |  (SELECT word, CAST(count(*) AS BIGINT) AS n FROM
         |    (SELECT unnest(string_split_regex(lower(text), '[^a-z0-9'']+')) AS word FROM documents)
         |   WHERE len(word) > 0 GROUP BY word)),
         |$roundCtes
         |SELECT r AS rank, a AS "left", b AS "right", cnt AS weighted_count FROM (
         |$unionAll
         |) ORDER BY rank""".stripMargin,
    ) { (s, dir) =>
      import s.implicits._
      graft.text.BpeTrainer
        .train(graft.text.BpeTrainer.wordVocab(Tables.documents(s, dir), "text"), nMerges)
        .toDF().orderBy("rank")
    }
  }

  private def stop = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  // --- token counting ------------------------------------------------------
  def tokenCount: Q = Q(
    "q35_token_count",
    """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, length(text) AS text_len
      |FROM documents
      |ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        length(col("text")).as("text_len"))
      .orderBy("doc_id")
  }

  // --- quality scoring -----------------------------------------------------
  def textQuality: Q = Q(
    "q36_text_quality",
    s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
       |SELECT doc_id,
       |  len(toks) AS n_tokens,
       |  round(CAST(len(list_filter(toks, x -> x IN ($stop))) AS DOUBLE) / len(toks), 4) AS stop_ratio,
       |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks), 4) AS avg_token_len,
       |  round(least(1.0, CAST(len(toks) AS DOUBLE) / 50.0) * 0.5
       |    + (1.0 - CAST(len(list_filter(toks, x -> x IN ($stop))) AS DOUBLE) / len(toks)) * 0.5, 4) AS quality
       |FROM t
       |ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    val toks = TextAnalysis.tokens(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(toks).as("n_tokens"),
        round(TextAnalysis.stopwordCount(toks).cast("double") / size(toks), 4).as("stop_ratio"),
        round(TextAnalysis.avgTokenLen(col("text")), 4).as("avg_token_len"),
        round(TextAnalysis.qualityScore(col("text")), 4).as("quality"))
      .orderBy("doc_id")
  }

  // --- heuristic language ID ----------------------------------------------
  def langId: Q = Q(
    "q37_lang_id",
    """WITH sc AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split(text, ' '), x -> x IN ('the','and','of','is'))) AS s_en,
      |    len(list_filter(string_split(text, ' '), x -> x IN ('el','la','de','y'))) AS s_es,
      |    len(list_filter(string_split(text, ' '), x -> x IN ('der','die','das','und'))) AS s_de,
      |    len(list_filter(string_split(text, ' '), x -> x IN ('le','les','du','et'))) AS s_fr
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN s_en + s_es + s_de + s_fr = 0 THEN 'und'
      |       WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
      |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
      |       WHEN s_de >= s_fr THEN 'de'
      |       ELSE 'fr' END AS lang_pred
      |FROM sc
      |ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")
  }

  // --- corpus-level stats --------------------------------------------------
  def corpusStats: Q = Q(
    "q38_corpus_stats",
    """SELECT count(*) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |  round(CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*), 2) AS avg_tokens,
      |  count(DISTINCT lang) AS n_langs,
      |  count(DISTINCT source) AS n_sources
      |FROM documents""".stripMargin,
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("total_tokens"),
        round(sum(TextAnalysis.tokenCount(col("text")).cast("long")).cast("double") / count(lit(1)), 2).as("avg_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"))
  }

  // --- exact dedup ---------------------------------------------------------
  def dedupExact: Q = Q(
    "q39_dedup_exact",
    """SELECT min(doc_id) AS keep_doc_id, count(*) AS copies
      |FROM documents
      |GROUP BY text
      |ORDER BY keep_doc_id""".stripMargin,
  ) { (s, dir) =>
    Dedup.exact(Tables.documents(s, dir), Seq("text"), "doc_id")
      .select("keep_doc_id", "copies")
      .orderBy("keep_doc_id")
  }

  // --- exact n-gram Jaccard near-dups (inverted-index join) ---------------
  def ngramJaccard: Q = Q(
    "q40_ngram_jaccard",
    """WITH dd AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM dd),
      |sh0 AS (SELECT DISTINCT doc_id, shingle FROM toks,
      |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
      |       WHERE len(t) >= 3),
      |hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000),
      |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 4) AS jaccard
      |FROM pairs
      |JOIN sz sa ON sa.doc_id = id_a
      |JOIN sz sb ON sb.doc_id = id_b
      |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin,
  ) { (s, dir) =>
    Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text", threshold = 0.5)
      .orderBy("id_a", "id_b")
  }

  // --- MinHash + LSH recall invariant (oracle-checked twin) ----------------
  // The LSH banding guarantee made driver-visible: every exact-Jaccard
  // pair at the q40 threshold must appear among the LSH candidate pairs
  // (recall 1.0 — the SimilaritySpec/DedupSpec claim). The query emits
  // the set difference exact ∖ candidates; the oracle computes the
  // expected answer — empty — so a single missed pair turns the row
  // red with the pair named. The xxhash64 signatures themselves stay
  // engine-internal; only the invariant is cross-checked.
  def minhashLsh: Q = Q(
    "q41_minhash_lsh",
    """SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b
      |WHERE FALSE""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b")
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text")
    val cands = Dedup.lshCandidates(sigs, "doc_id").select("id_a", "id_b")
    exact.join(cands, Seq("id_a", "id_b"), "left_anti")
      .orderBy("id_a", "id_b")
  }

  // --- SimHash near-dups (oracle-checked via the poly hash family) ---------
  // Dedup.simhashPoly's signature is pure 64-bit integer arithmetic
  // (q43's polynomial token hash + seeded universal-rehash bit signs),
  // so DuckDB recomputes the signatures bit-for-bit and the full pair
  // set — banding, bucket cap, Hamming ≤ 3 via bit_count(xor) — is
  // hash-checked. The xxhash64 default variant remains the production
  // path (Dedup.simhash); this query pins the family's semantics.
  def simhashPairs: Q = {
    val P = Dedup.PolyPrime
    val bitSums = (0 until 64).map(j =>
      s"SUM(CASE WHEN (h * ${Dedup.simhashBitA(j)} + ${Dedup.simhashBitB(j)}) % $P" +
        s" < ${Dedup.PolyHalf} THEN 1 ELSE -1 END) AS b$j").mkString(", ")
    val sigExpr = (0 until 64).map { j =>
      // 1<<63 overflows DuckDB's left shift; bit 63 is the sign bit
      val bit = if (j == 63) "CAST(-9223372036854775808 AS BIGINT)" else s"(1::BIGINT << $j)"
      s"CASE WHEN b$j > 0 THEN $bit ELSE 0::BIGINT END"
    }.mkString(" | ")
    val masks = (0 until 4).map(k => 0xffffL << (16 * k)).mkString(", ")
    Q(
      "q42_simhash",
      s"""WITH dd AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM dd),
         |th AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
         |         list_transform(string_split(t, ''), c -> CAST(ascii(c) AS BIGINT))),
         |         (h, b) -> (h * 131 + b) % $P) AS h FROM tok),
         |bits AS (SELECT doc_id, $bitSums FROM th GROUP BY doc_id),
         |sig AS (SELECT doc_id, $sigExpr AS simhash FROM bits),
         |banded AS (SELECT doc_id, simhash, band_id,
         |             simhash & ([$masks])[band_id + 1] AS band_val
         |           FROM sig, UNNEST([0, 1, 2, 3]) AS u(band_id)),
         |hot AS (SELECT band_id, band_val FROM banded
         |        GROUP BY 1, 2 HAVING count(*) > 1000),
         |bd AS (SELECT * FROM banded b WHERE NOT EXISTS (
         |         SELECT 1 FROM hot h
         |         WHERE h.band_id = b.band_id AND h.band_val = b.band_val)),
         |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |            CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
         |          FROM bd a JOIN bd b
         |            ON a.band_id = b.band_id AND a.band_val = b.band_val
         |           AND a.doc_id < b.doc_id
         |          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3)
         |SELECT id_a, id_b, hamming FROM pairs ORDER BY id_a, id_b""".stripMargin,
    ) { (s, dir) =>
      val sh = Dedup.simhashPoly(Tables.documents(s, dir), "doc_id", "text")
      Dedup.simhashPairs(sh, "doc_id", maxHamming = 3)
        .orderBy("id_a", "id_b")
    }
  }

  // --- rolling-hash fingerprint (native codegen Expression) ---------------
  // Oracle: the polynomial h = (h·131 + byte) mod 1e9+7 re-expressed as
  // a DuckDB list fold. ascii(char) == UTF-8 byte holds because the
  // corpus is ASCII (verified max codepoint 121); non-ASCII corpora
  // would need a byte-level fold instead.
  def rollingFingerprint: Q = Q(
    "q43_rolling_fingerprint",
    """SELECT doc_id, list_reduce(
      |  list_prepend(CAST(0 AS BIGINT),
      |    list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
      |  (h, b) -> (h * 131 + b) % 1000000007) AS fingerprint
      |FROM documents
      |ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), RollingHash(col("text")).as("fingerprint"))
      .orderBy("doc_id")
  }

  // --- end-to-end corpus curation -----------------------------------------
  // The training-data pipeline composition: quality gate → near-dup
  // removal (drop every non-representative side of a ≥0.5-Jaccard
  // pair) → per-language survivor counts. One declarative plan.
  def corpusCuration: Q = Q(
    "q67_corpus_curation",
    s"""WITH dd AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
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
       |dropped AS (
       |  SELECT DISTINCT id_b AS doc_id FROM pairs
       |  JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
       |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
       |quality AS (
       |  SELECT doc_id, lang,
       |    least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0) * 0.5
       |      + (1.0 - CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stop))) AS DOUBLE)
       |          / len(string_split(text, ' '))) * 0.5 AS q
       |  FROM documents)
       |SELECT lang, count(*) AS kept_docs
       |FROM quality
       |WHERE q >= 0.6
       |  AND doc_id IN (SELECT doc_id FROM dd)
       |  AND doc_id NOT IN (SELECT doc_id FROM dropped)
       |GROUP BY lang
       |ORDER BY lang""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    // representatives computed once, shared by pair generation (which
    // would otherwise re-dedup internally) and the survivor filter
    val reps = Dedup.exactRepresentatives(docs, "doc_id", "text")
    val dropped = Dedup.jaccardPairs(reps, "doc_id", "text", threshold = 0.5, preDedup = false)
      .select(col("id_b").as("doc_id")).distinct()
    docs
      .join(reps.select("doc_id"), Seq("doc_id"), "left_semi")
      .join(dropped, Seq("doc_id"), "left_anti")
      .filter(TextAnalysis.qualityScore(col("text")) >= 0.6)
      .groupBy("lang").agg(count(lit(1)).as("kept_docs"))
      .orderBy("lang")
  }

  // --- q77: exact dedup as a Structured Stream ----------------------------
  // The SAME exact-dedup aggregation executed over readStream with
  // keyed streaming state, drained into a memory sink, and required to
  // hash-match the identical batch oracle (the q62 pattern applied to
  // dedup): the streaming ingest path of a training-data pipeline can
  // dedup incrementally with one code path and one answer. State is
  // one (hash, len) → (min_id, count) row per distinct text — the
  // fixed-width key keeps streaming state small, exactly like the
  // batch representative path.
  //
  // The complete-mode MEMORY sink is the ORACLE-HARNESS shape only:
  // it accumulates the whole dedup state driver-side, which a real
  // ingest path must never do — production would run update mode into
  // a durable keyed sink (the bucket-scoped ingestMerge in
  // EventStreams is that path). The checkpointed result is registered
  // with Dedup.trackRdd so clearCaches releases its blocks between
  // corpora instead of pinning them until GC.
  def streamingDedup: Q = Q(
    "q77_streaming_dedup",
    """SELECT min(doc_id) AS keep_doc_id, count(*) AS copies
      |FROM documents
      |GROUP BY text
      |ORDER BY keep_doc_id""".stripMargin,
  ) { (s, dir) =>
    val raw = s.read.parquet(s"$dir/documents.parquet") // schema probe only
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .groupBy(xxhash64(col("text")).as("__th"), length(col("text")).as("__tl"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("copies"))
    val sink = s"graft_stream_dedup_${System.nanoTime()}"
    val q = stream.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val out = s.table(sink).select("keep_doc_id", "copies")
      .orderBy("keep_doc_id").localCheckpoint(true)
    out.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Dedup.trackRdd(lr.rdd)
      case _ => ()
    }
    s.catalog.dropTempView(sink)
    out
  }

  // --- q201: streaming quality filter ---------------------------------------
  // The ingest-time quality gate: documents stream in, per-row
  // heuristic quality AND the codegen [[graft.functions.CharEntropy]]
  // entropy proxy are computed inside the stream, and only docs over
  // both thresholds pass. Entirely stateless (pure per-row
  // expressions — the q191 rewrite is what makes the entropy side
  // streamable at all), so it runs in append mode with no state
  // store; the oracle is the batch twin, proving the streaming plan
  // computes bit-identical values.
  def streamingQualityFilter: Q = Q(
    "q201_streaming_quality_filter",
    s"""WITH chars AS (
       |  SELECT doc_id, substring(text, CAST(i AS INTEGER), 1) AS ch
       |  FROM documents, UNNEST(range(1, len(text) + 1)) AS u(i)
       |  WHERE len(text) >= 1),
       |cc AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch),
       |cn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM cc GROUP BY doc_id),
       |ent AS (SELECT cc.doc_id, round(-CAST(sum(CAST(
       |    round((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n), 9)
       |    AS DECIMAL(18,9))) AS DOUBLE), 6) AS entropy_nats
       |  FROM cc JOIN cn USING (doc_id) GROUP BY cc.doc_id),
       |q AS (SELECT doc_id,
       |    round(least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0) * 0.5
       |      + (1.0 - CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stop)))
       |          AS DOUBLE) / len(string_split(text, ' '))) * 0.5, 4) AS quality
       |  FROM documents)
       |SELECT q.doc_id, q.quality, ent.entropy_nats
       |FROM q JOIN ent ON ent.doc_id = q.doc_id
       |WHERE q.quality > 0.9 AND ent.entropy_nats > 2.8
       |ORDER BY q.doc_id""".stripMargin,
  ) { (s, dir) =>
    val raw = s.read.parquet(s"$dir/documents.parquet") // schema probe only
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"),
        round(TextAnalysis.qualityScore(col("text")), 4).as("quality"),
        round(-graft.functions.CharEntropy(col("text")).getField("negent"), 6)
          .as("entropy_nats"))
      .filter(col("quality") > 0.9 && col("entropy_nats") > 2.8)
    val sink = s"graft_stream_quality_${System.nanoTime()}"
    val q = stream.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = s.table(sink).select("doc_id", "quality", "entropy_nats")
      .orderBy("doc_id").localCheckpoint(true)
    out.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Dedup.trackRdd(lr.rdd)
      case _ => ()
    }
    s.catalog.dropTempView(sink)
    out
  }

  // --- q84: incremental dedup against an existing corpus -------------------
  // The every-crawl-cycle shape: split the table at doc_id 250 into
  // "existing corpus" and "incoming batch"; of the incoming docs, keep
  // one min-id representative per text not already present. Both sides
  // meet on fixed-width (hash, length) keys — the existing corpus
  // never ships document bodies.
  def incrementalDedup: Q = Q(
    "q84_incremental_dedup",
    """WITH existing AS (SELECT DISTINCT text FROM documents WHERE doc_id < 250),
      |inc AS (SELECT min(doc_id) AS doc_id, text FROM documents
      |        WHERE doc_id >= 250 GROUP BY text)
      |SELECT doc_id, text FROM inc
      |WHERE text NOT IN (SELECT text FROM existing)
      |ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    Dedup.incrementalNew(
      docs.filter(col("doc_id") < 250),
      docs.filter(col("doc_id") >= 250),
      "doc_id", "text")
      .orderBy("doc_id")
  }

  // --- q202: tokenizer fertility by language --------------------------------
  // The multilingual tokenizer-budget audit: how many subword tokens
  // (q79's GPT-2-shaped estimate) and characters a language pays per
  // whitespace word. High-fertility languages burn context window and
  // training budget; this per-lang roll-up is the number tokenizer
  // RFCs quote. Pure per-row expressions into one keyed aggregate —
  // integer sums, exact; divisions are presentation-only.
  def tokenizerFertility: Q = Q(
    "q202_tokenizer_fertility",
    """WITH d AS (SELECT lang,
      |    len(string_split(text, ' ')) AS n_ws,
      |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS n_sub,
      |    length(replace(text, ' ', '')) AS n_ch
      |  FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_ws) AS BIGINT) AS n_ws_tokens,
      |  CAST(sum(n_sub) AS BIGINT) AS n_subwords,
      |  round(CAST(sum(n_sub) AS DOUBLE) / sum(n_ws), 6) AS subwords_per_word,
      |  round(CAST(sum(n_ch) AS DOUBLE) / sum(n_ws), 6) AS chars_per_word,
      |  round(CAST(sum(n_ch) AS DOUBLE) / sum(n_sub), 6) AS chars_per_subword
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
  ) { (s, dir) =>
    val d = Tables.documents(s, dir).select(col("lang"),
      size(split(col("text"), " ")).as("n_ws"),
      size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]', 0)")).as("n_sub"),
      length(regexp_replace(col("text"), " ", "")).as("n_ch"))
    d.groupBy("lang").agg(count(lit(1)).as("n_docs"),
        sum(col("n_ws")).as("n_ws_tokens"), sum(col("n_sub")).as("n_subwords"),
        round(sum(col("n_sub")).cast("double") / sum(col("n_ws")), 6).as("subwords_per_word"),
        round(sum(col("n_ch")).cast("double") / sum(col("n_ws")), 6).as("chars_per_word"),
        round(sum(col("n_ch")).cast("double") / sum(col("n_sub")), 6).as("chars_per_subword"))
      .orderBy("lang")
  }

  // --- q79: BPE-ish token estimation --------------------------------------
  // Whitespace tokens under-count what a subword tokenizer produces;
  // the standard cheap estimate splits letter runs, single digits, and
  // individual punctuation marks (the GPT-2 pre-tokenizer shape,
  // minus merges). Pure per-row regexp — no shuffle except the output
  // sort — and byte-identical across engines (Java and RE2 agree on
  // this pattern class, pinned the same way q74 pins regexp_replace).
  def bpeishTokens: Q = Q(
    "q79_bpeish_tokens",
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_ws,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS n_bpeish,
      |  round(CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS DOUBLE)
      |    / len(string_split(text, ' ')), 4) AS tokens_per_word
      |FROM documents
      |ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    // group index 0 (whole match) must be explicit: Spark's default is
    // group 1, which throws on a pattern with no capture groups
    val bpe = size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"), lit(0)))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_ws"),
        bpe.as("n_bpeish"),
        round(bpe.cast("double") / TextAnalysis.tokenCount(col("text")), 4).as("tokens_per_word"))
      .orderBy("doc_id")
  }

  // --- q81: eval-set decontamination --------------------------------------
  // The standard train/test hygiene op: a training doc sharing any
  // n-gram shingle with the held-out eval set (the q72 deterministic
  // sample) is contaminated and must be flagged before training.
  // Shape at scale: the eval shingle set is sample-sized → broadcast;
  // the train side joins on the shingle key and aggregates per doc —
  // the corpus never shuffles on anything except the small join key.
  def decontaminate: Q = Q(
    "q81_decontaminate",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM toks,
      |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
      |       WHERE len(t) >= 3),
      |eval AS (SELECT doc_id FROM documents
      |         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '28f5'),
      |esh AS (SELECT DISTINCT shingle FROM sh JOIN eval USING (doc_id))
      |SELECT s.doc_id, count(*) AS n_overlap
      |FROM sh s JOIN esh USING (shingle)
      |WHERE s.doc_id NOT IN (SELECT doc_id FROM eval)
      |GROUP BY 1
      |ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    // eval membership is a pure per-row predicate on doc_id, so the
    // train/eval split pushes below the shingle explode: no membership
    // join at all, and the eval side explodes ~15% of docs, not 100%
    val docs = Tables.documents(s, dir)
    val isEval = substring(md5(col("doc_id").cast("string")), 1, 4) < "28f5"
    val evalShingles = Dedup.shingleTable(docs.filter(isEval), "doc_id", "text")
      .select("shingle").distinct()
    Dedup.shingleTable(docs.filter(!isEval), "doc_id", "text")
      .join(broadcast(evalShingles), Seq("shingle"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
      .orderBy("doc_id")
  }

  // --- q92: bloom-prefiltered decontamination ------------------------------
  // q81's shape breaks when the eval shingle set outgrows an exact
  // broadcast (a 1M-doc eval suite is ~100M shingles — too many exact
  // strings to ship, but its bloom BITSET is a few hundred MB at most,
  // and here a literal). Two-phase: a codegen'd might_contain predicate
  // (built distributed in one partial-agg pass, embedded as a literal)
  // drops non-overlapping train shingles per-row BEFORE any shuffle;
  // the survivors — hit-rate-sized, not corpus-sized — are then
  // exact-verified against the true shingle set, so false positives
  // cannot reach the output and the result is byte-identical to the
  // all-exact plan the oracle runs.
  def decontaminateBloom: Q = Q(
    "q92_bloom_decontaminate",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM toks,
      |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
      |       WHERE len(t) >= 3),
      |eval AS (SELECT doc_id FROM documents
      |         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '147a'),
      |esh AS (SELECT DISTINCT shingle FROM sh JOIN eval USING (doc_id))
      |SELECT s.doc_id, count(*) AS n_overlap
      |FROM sh s JOIN esh USING (shingle)
      |WHERE s.doc_id NOT IN (SELECT doc_id FROM eval)
      |GROUP BY 1
      |ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    // same split-below-the-explode shape as q81 (membership is a pure
    // doc_id predicate — no join)
    val docs = Tables.documents(s, dir)
    val isEval = substring(md5(col("doc_id").cast("string")), 1, 4) < "147a"
    // two consumers (bloom build is an action, exact verify reuses it)
    val evalShingles = Dedup.persistTracked(
      Dedup.shingleTable(docs.filter(isEval), "doc_id", "text")
        .select("shingle").distinct())
    val bf = BloomFilters.build(evalShingles, col("shingle"),
      expectedItems = 100 * 1000L, numBits = 1000 * 1000L)
    Dedup.shingleTable(docs.filter(!isEval), "doc_id", "text")
      .filter(BloomFilters.mightContain(bf, col("shingle"))) // pre-shuffle prune
      .join(broadcast(evalShingles), Seq("shingle"))         // kill false positives
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
      .orderBy("doc_id")
  }

  // --- q95: cross-document duplicate-span detection ------------------------
  // The windowed approximation of suffix-array substring dedup
  // (/root/reference has no analogue; the signal is the "Deduplicating
  // Training Data" one): an 8-token window appearing in ≥2 DISTINCT
  // docs marks boilerplate/quotation spans that survive document-level
  // dedup. Positions count (a doc quoting a span twice has 2 spans,
  // but within-doc repeats alone never mark a span duplicated — that's
  // q82's job). Shape at scale: windows meet on a PAIR of independent
  // xxhash64 keys (plain + salted — 128 fingerprint bits: a single
  // 64-bit key starts merging unrelated windows by birthday collision
  // at the ≳2³² distinct windows a 100-TB corpus holds; the pair
  // pushes that past 2⁶⁴, see COVERAGE.md); the span table shuffles
  // ONCE on the hash pair (the dup-set aggregate and the membership
  // join reuse the exchange); per-doc rollup is the only other
  // shuffle.
  def dupSpans: Q = Q(
    "q95_dup_spans",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |w AS (SELECT doc_id, win FROM toks,
      |      UNNEST(list_transform(range(1, len(t) - 6),
      |        i -> array_to_string(t[i:i+7], ' '))) AS u(win)
      |      WHERE len(t) >= 8),
      |dup AS (SELECT win, 1 AS is_dup FROM w GROUP BY win
      |        HAVING count(DISTINCT doc_id) >= 2)
      |SELECT doc_id, count(*) AS n_spans,
      |  CAST(sum(coalesce(is_dup, 0)) AS BIGINT) AS n_dup_spans,
      |  round(CAST(sum(coalesce(is_dup, 0)) AS DOUBLE) / count(*), 4) AS dup_ratio
      |FROM w LEFT JOIN dup USING (win)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    val toks = TextAnalysis.tokens(col("text"))
    // all window positions — NOT array_distinct'd like shingleTable.
    // The window string is built ONCE inside the (interpreted) HOF
    // lambda and both pair hashes run in the codegen'd Project after
    // the explode — hashing inside the lambda would rebuild the
    // 8-token concat per hash and evaluate both interpreted (measured
    // ~35% of q95's wall time at sf0.1).
    val wins = Dedup.persistTracked(
      Tables.documents(s, dir)
        .filter(size(toks) >= 8)
        .select(col("doc_id"),
          explode(graft.functions.WordNGrams(toks, 8, distinct = false)).as("win"))
        .select(col("doc_id"), xxhash64(col("win")).as("h1"),
          xxhash64(lit("graft_w2"), col("win")).as("h2")))
    val dup = wins.groupBy("h1", "h2")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h1"), col("h2"), lit(1).as("is_dup"))
    wins.join(dup, Seq("h1", "h2"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("is_dup"), lit(0))).as("n_dup_spans"),
        round(sum(coalesce(col("is_dup"), lit(0))).cast("double") / count(lit(1)), 4)
          .as("dup_ratio"))
      .orderBy("doc_id")
  }

  // --- q204: maximal duplicated-span extraction ------------------------------
  // q95 counts duplicated 8-token windows; this emits the REMOVAL
  // PLAN: adjacent duplicated window positions merged into maximal
  // spans (the exact-substring-dedup output shape — the token ranges
  // a cut pass deletes). Classic gaps-and-islands: island key =
  // position − row_number within the doc's duplicated positions; the
  // window runs per doc over its duplicated positions only (bounded
  // by doc length), never corpus-wide. Carries positions through the
  // explode (q95's table drops them), so the two queries share the
  // scan shape but not the persisted subtree. Windows meet on the
  // q95 (plain, salted) xxhash64 pair — here a collision would shift
  // EMITTED span boundaries, not just counts, so the 128-bit key is
  // load-bearing for the removal plan's correctness at corpus scale.
  def dupSpanIslands: Q = Q(
    "q204_dup_span_islands",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |w AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
      |        array_to_string(t[i:i+7], ' ') AS win
      |      FROM toks, UNNEST(range(1, len(t) - 6)) AS u(i)
      |      WHERE len(t) >= 8),
      |dup AS (SELECT win FROM w GROUP BY win
      |        HAVING count(DISTINCT doc_id) >= 2),
      |dpos AS (SELECT doc_id, i FROM w JOIN dup USING (win)),
      |isl AS (SELECT doc_id, i,
      |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
      |  FROM dpos)
      |SELECT doc_id, min(i) AS span_start, max(i) + 7 AS span_end,
      |  CAST(count(*) AS BIGINT) AS n_windows,
      |  max(i) + 7 - min(i) + 1 AS span_tokens
      |FROM isl GROUP BY doc_id, grp
      |ORDER BY doc_id, span_start""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val toks = TextAnalysis.tokens(col("text"))
    // q95's explode-then-hash shape (window string built once in the
    // lambda, pair hashes codegen'd post-explode), position carried
    // through posexplode
    val wins = Dedup.persistTracked(
      Tables.documents(s, dir)
        .filter(size(toks) >= 8)
        .select(col("doc_id"),
          posexplode(graft.functions.WordNGrams(toks, 8, distinct = false))
            .as(Seq("p", "win")))
        .select(col("doc_id"), (col("p") + 1).cast("long").as("i"),
          xxhash64(col("win")).as("h1"),
          xxhash64(lit("graft_w2"), col("win")).as("h2")))
    val dup = wins.groupBy("h1", "h2")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select("h1", "h2")
    wins.join(dup, Seq("h1", "h2"))
      .withColumn("grp",
        col("i") - row_number().over(Window.partitionBy("doc_id").orderBy("i")))
      .groupBy("doc_id", "grp")
      .agg(min(col("i")).as("span_start"), (max(col("i")) + 7).as("span_end"),
        count(lit(1)).as("n_windows"),
        (max(col("i")) + 7 - min(col("i")) + 1).as("span_tokens"))
      .select("doc_id", "span_start", "span_end", "n_windows", "span_tokens")
      .orderBy("doc_id", "span_start")
  }

  // --- q303: exact-substring GLOBAL dedup (cleaned-doc emission) --------------
  // q95 counts duplicated windows and q204 emits per-doc removal spans;
  // this is the terminal member of the family — the Lee et al. 2021
  // "Deduplicating Training Data" cut pass itself, corpus-wide: every
  // 8-token window that occurs ≥2 times anywhere (cross-doc OR
  // within-doc) keeps exactly ONE canonical occurrence (the minimal
  // (doc_id, position), encoded as one BIGINT key so the argmin is a
  // plain MIN aggregate) and every other occurrence is cut. Cut
  // windows explode to covered token positions, positions merge into
  // maximal islands (gaps-and-islands per doc, bounded by doc length),
  // and each doc emits its post-cut shape: kept/cut token counts, cut
  // span count, and the first 12 kept tokens as a content witness (so
  // the oracle pins WHAT survived, not just how much). Shape at scale:
  // one shuffle on the 128-bit window-hash pair (count + canonical
  // MIN in the same aggregate, membership join reuses the exchange),
  // one ≤8× explode of cut windows only, per-doc rollups keyed by
  // doc_id; the token-array rebuild is per-row bounded arithmetic.
  // Docs shorter than 8 tokens have no windows and pass through
  // uncut. The xxhash64 pair is load-bearing exactly as in q204: a
  // collision would merge unrelated windows and move a cut.
  def substringDedupGlobal: Q = Q(
    "q303_substring_dedup",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |w AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
      |        doc_id * 1000000 + CAST(i AS BIGINT) AS ok,
      |        array_to_string(t[i:i+7], ' ') AS win
      |      FROM toks, UNNEST(range(1, len(t) - 6)) AS u(i)
      |      WHERE len(t) >= 8),
      |g AS (SELECT win, count(*) AS cnt, min(ok) AS own FROM w GROUP BY win),
      |cuts AS (SELECT w.doc_id, w.i FROM w JOIN g USING (win)
      |         WHERE g.cnt >= 2 AND w.ok <> g.own),
      |cov AS (SELECT DISTINCT doc_id, CAST(p AS BIGINT) AS p
      |        FROM cuts, UNNEST(range(i, i + 8)) AS v(p)),
      |isl AS (SELECT doc_id, p,
      |    p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
      |  FROM cov),
      |spn AS (SELECT doc_id, CAST(count(DISTINCT grp) AS BIGINT) AS n_cut_spans
      |        FROM isl GROUP BY doc_id),
      |cv AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS cut,
      |         list_sort(list(p)) AS cps
      |       FROM cov GROUP BY doc_id)
      |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(cv.cut, 0) AS BIGINT) AS cut_tokens,
      |  CAST(len(t.t) - coalesce(cv.cut, 0) AS BIGINT) AS kept_tokens,
      |  coalesce(spn.n_cut_spans, 0) AS n_cut_spans,
      |  coalesce(array_to_string(list_transform(
      |    (list_filter(range(1, len(t.t) + 1),
      |       x -> NOT list_contains(coalesce(cv.cps, []), x)))[1:12],
      |    x -> t.t[x]), ' '), '') AS cleaned_prefix
      |FROM toks t LEFT JOIN cv USING (doc_id) LEFT JOIN spn USING (doc_id)
      |ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val toks = TextAnalysis.tokens(col("text"))
    val docs = Dedup.persistTracked(Tables.documents(s, dir)
      .select(col("doc_id"), toks.as("t"), size(toks).cast("long").as("n")))
    // q204's explode-then-hash shape, plus the canonical-occurrence key
    val wins = Dedup.persistTracked(docs
      .filter(col("n") >= 8)
      .select(col("doc_id"),
        posexplode(graft.functions.WordNGrams(col("t"), 8, distinct = false))
          .as(Seq("p", "win")))
      .select(col("doc_id"), (col("p") + 1).cast("long").as("i"),
        (col("doc_id") * 1000000L + col("p") + 1L).as("ok"),
        xxhash64(col("win")).as("h1"),
        xxhash64(lit("graft_w2"), col("win")).as("h2")))
    val g = wins.groupBy("h1", "h2")
      .agg(count(lit(1)).as("cnt"), min(col("ok")).as("own"))
      .filter(col("cnt") >= 2)
    val cuts = wins.join(g, Seq("h1", "h2")).filter(col("ok") =!= col("own"))
      .select(col("doc_id"), col("i"))
    val cov = Dedup.persistTracked(cuts
      .select(col("doc_id"), explode(sequence(col("i"), col("i") + 7)).as("p"))
      .distinct())
    val spn = cov
      .withColumn("grp",
        col("p") - row_number().over(Window.partitionBy("doc_id").orderBy("p")))
      .groupBy("doc_id")
      .agg(count_distinct(col("grp")).as("n_cut_spans"))
    val cv = cov.groupBy("doc_id")
      .agg(count(lit(1)).as("cut"), sort_array(collect_list(col("p"))).as("cps"))
    // cut and uncut docs emit as INNER ∪ ANTI against the cut-doc
    // table rather than one left-outer join: the left-outer form has
    // unique right keys, so a count-only consumer (the bench action)
    // lets Catalyst eliminate the joins and "measures" a bare doc
    // scan — the union's cardinality genuinely depends on the dedup
    // computation, so no action can skip it
    val withCuts = docs.join(cv.join(spn, Seq("doc_id")), Seq("doc_id"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        col("cut").as("cut_tokens"),
        (col("n") - col("cut")).as("kept_tokens"),
        col("n_cut_spans"),
        concat_ws(" ", transform(
          slice(array_except(sequence(lit(1L), col("n")), col("cps")), 1, 12),
          x => element_at(col("t"), x.cast("int")))).as("cleaned_prefix"))
    val noCuts = docs.join(cv.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n").as("n_tokens"),
        lit(0L).as("cut_tokens"), col("n").as("kept_tokens"),
        lit(0L).as("n_cut_spans"),
        concat_ws(" ", slice(col("t"), 1, 12)).as("cleaned_prefix"))
    withCuts.unionByName(noCuts).orderBy("doc_id")
  }

  // --- q307: dedup threshold sensitivity sweep ---------------------------------
  // The report every dedup run owes its owner before anyone picks a
  // threshold: pair yield and affected-doc count at each candidate
  // Jaccard cut, from ONE inverted-index pair table (built once at the
  // loosest threshold, swept with per-threshold filters over the
  // bounded pair set — never re-paired per cut). Comparisons use the
  // 4-dp-rounded Jaccard both engines already emit (q40's grid), so no
  // float boundary can flip a count; thresholds with zero pairs still
  // report (LEFT join from the threshold axis).
  def dedupThresholdSweep: Q = {
    val ths = Seq(0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
    Q(
      "q307_dedup_threshold_sweep",
      s"""WITH dd AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
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
         |j AS (SELECT id_a, id_b,
         |    round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 4) AS jac
         |  FROM pairs
         |  JOIN sz sa ON sa.doc_id = id_a
         |  JOIN sz sb ON sb.doc_id = id_b
         |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.3),
         |th AS (SELECT CAST(unnest([${ths.mkString(", ")}]) AS DOUBLE) AS threshold),
         |e AS (SELECT t.threshold, j.id_a, j.id_b FROM j JOIN th t
         |      ON j.jac >= t.threshold),
         |p AS (SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs FROM e GROUP BY 1),
         |d AS (SELECT threshold, CAST(count(DISTINCT doc) AS BIGINT) AS n_docs
         |      FROM (SELECT threshold, unnest([id_a, id_b]) AS doc FROM e) GROUP BY 1)
         |SELECT t.threshold, coalesce(p.n_pairs, 0) AS n_pairs,
         |  coalesce(d.n_docs, 0) AS n_docs
         |FROM th t LEFT JOIN p USING (threshold) LEFT JOIN d USING (threshold)
         |ORDER BY threshold""".stripMargin,
    ) { (s, dir) =>
      import s.implicits._
      val pairs = Dedup.persistTracked(
        Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text", threshold = 0.3))
      val th = ths.toDF("threshold")
      val e = pairs.crossJoin(broadcast(th))
        .filter(col("jaccard") >= col("threshold"))
      val p = e.groupBy("threshold").agg(count(lit(1)).as("n_pairs"))
      val d = e.select(col("threshold"),
          explode(array(col("id_a"), col("id_b"))).as("doc")).distinct()
        .groupBy("threshold").agg(count(lit(1)).as("n_docs"))
      th.join(p, Seq("threshold"), "left_outer")
        .join(d, Seq("threshold"), "left_outer")
        .select(col("threshold"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"))
        .orderBy("threshold")
    }
  }

  // --- q310: context-length waste planner ---------------------------------------
  // q165 reports length percentiles; this prices the actual decision —
  // for each candidate max_seq_len, what fraction of corpus tokens is
  // LOST to truncation and what fraction of sequence slots is WASTED
  // on padding under the simple one-doc-per-sequence policy (the
  // baseline q153's spanning packer is judged against). ALL integer
  // arithmetic until the two final ratios: one corpus scan of token
  // counts crossed with the 4-row candidate axis, exact min/max sums.
  def contextWaste: Q = {
    val ls = Seq(64, 128, 256, 512)
    Q(
      "q310_context_waste",
      s"""WITH d AS (SELECT len(string_split(text, ' ')) AS ntok FROM documents),
         |l AS (SELECT unnest([${ls.mkString(", ")}]) AS seq_len),
         |m AS (SELECT seq_len, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(ntok) AS BIGINT) AS corpus_tokens,
         |    CAST(sum(CASE WHEN ntok > seq_len THEN 1 ELSE 0 END) AS BIGINT)
         |      AS docs_truncated,
         |    CAST(sum(least(ntok, seq_len)) AS BIGINT) AS tokens_kept,
         |    CAST(sum(greatest(ntok - seq_len, 0)) AS BIGINT) AS tokens_lost
         |  FROM d CROSS JOIN l GROUP BY seq_len)
         |SELECT CAST(seq_len AS BIGINT) AS seq_len, n_docs, docs_truncated,
         |  tokens_kept, tokens_lost,
         |  CAST(tokens_lost * 1000000 // corpus_tokens AS DOUBLE) / 1e6
         |    AS truncated_share,
         |  CAST((n_docs * seq_len - tokens_kept) * 1000000
         |    // (n_docs * seq_len) AS DOUBLE) / 1e6 AS padding_share
         |FROM m ORDER BY seq_len""".stripMargin,
    ) { (s, dir) =>
      import s.implicits._
      val d = Tables.documents(s, dir)
        .select(TextAnalysis.tokenCount(col("text")).cast("long").as("ntok"))
      val l = ls.map(_.toLong).toDF("seq_len")
      d.crossJoin(broadcast(l))
        .groupBy("seq_len")
        .agg(count(lit(1)).as("n_docs"),
          sum("ntok").as("corpus_tokens"),
          sum(when(col("ntok") > col("seq_len"), 1).otherwise(0)).cast("long")
            .as("docs_truncated"),
          sum(least(col("ntok"), col("seq_len"))).as("tokens_kept"),
          sum(greatest(col("ntok") - col("seq_len"), lit(0L))).as("tokens_lost"))
        // shares land on the exact 1e-6 grid by INTEGER division (the
        // q221 div idiom): a float `round` here hits half-boundary
        // divergence because n_docs·seq_len is 2^a·5^b-shaped, so
        // ratios terminate in decimal and sit exactly on .5 ulps
        .select(col("seq_len"), col("n_docs"), col("docs_truncated"),
          col("tokens_kept"), col("tokens_lost"),
          (expr("tokens_lost * 1000000 div corpus_tokens").cast("double") / 1e6)
            .as("truncated_share"),
          (expr("(n_docs * seq_len - tokens_kept) * 1000000 div (n_docs * seq_len)")
            .cast("double") / 1e6).as("padding_share"))
        .orderBy("seq_len")
    }
  }

  // --- q314: near-dup pair explanation (rarest shared evidence) ----------------
  // The debugging op behind every dedup false-positive report: for
  // each q40-threshold pair, the 3 RAREST shared shingles (global
  // document frequency ascending) — rare shared 3-grams explain a
  // match; common ones are just register. The pair set is the bounded
  // q40 output, shared shingles come from two keyed joins of the pair
  // table against the capped inverted index (fan-out ≤ pair count ×
  // doc length), df is one keyed aggregate joined back, and the top-3
  // window partitions per pair — bounded everywhere. Strings stay the
  // join key here (they ARE the output payload; the hash-pair
  // optimization q40 uses has nothing to carry).
  def dupPairExplanation: Q = Q(
    "q314_dup_pair_explain",
    """WITH dd AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM dd),
      |sh0 AS (SELECT DISTINCT doc_id, shingle FROM toks,
      |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
      |       WHERE len(t) >= 3),
      |hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000),
      |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |dfq AS (SELECT shingle, CAST(count(*) AS BIGINT) AS shingle_df FROM sh GROUP BY 1),
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |near AS (SELECT id_a, id_b FROM pairs
      |         JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
      |         WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
      |shared AS (SELECT n.id_a, n.id_b, a.shingle
      |           FROM near n JOIN sh a ON a.doc_id = n.id_a
      |                       JOIN sh b ON b.doc_id = n.id_b
      |                        AND b.shingle = a.shingle),
      |rk AS (SELECT id_a, id_b, shingle, shingle_df,
      |    row_number() OVER (PARTITION BY id_a, id_b
      |      ORDER BY shingle_df, shingle) AS rk
      |  FROM shared JOIN dfq USING (shingle))
      |SELECT id_a, id_b, CAST(rk AS BIGINT) AS rk, shingle, shingle_df
      |FROM rk WHERE rk <= 3
      |ORDER BY id_a, id_b, rk""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val base = Dedup.exactRepresentatives(docs, "doc_id", "text")
    val sh0 = Dedup.shingleTable(base, "doc_id", "text", 3)
    val hot = sh0.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > 1000).select("shingle")
    val sh = Dedup.persistTracked(sh0.join(hot, Seq("shingle"), "left_anti"))
    val dfq = sh.groupBy("shingle").agg(count(lit(1)).as("shingle_df"))
    // pairs come from THIS index (one build feeds pairing, df, and the
    // evidence joins through the persist) rather than a second
    // jaccardPairs-internal hashed index — measured ~40% of the query
    // explicit aliases, never positional toDF — a positional rename of
    // a join-bearing plan collapses id_a/id_b to one attribute (the
    // q206 self-join trap)
    val shA = sh.select(col("doc_id").as("id_a"), col("shingle"))
    val shB = sh.select(col("doc_id").as("id_b"), col("shingle"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = shA.join(shB, "shingle").filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sz.select(col("doc_id").as("id_b"), col("n").as("n_b")), "id_b")
      .filter(col("inter").cast("double")
        / (col("n_a") + col("n_b") - col("inter")) >= 0.5)
      .select("id_a", "id_b")
    val shared = pairs.join(shA, "id_a").join(shB, Seq("id_b", "shingle"))
    val w = Window.partitionBy("id_a", "id_b")
      .orderBy(col("shingle_df"), col("shingle"))
    shared.join(dfq, "shingle")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("id_a", "id_b", "rk", "shingle", "shingle_df")
      .orderBy("id_a", "id_b", "rk")
  }

  // --- q315: LSH banding planner grounded on the measured pair histogram --------
  // q206 measures the s-curve the CHOSEN banding produces; this picks
  // the banding — for every (bands, rows) factorization of the
  // 16-component signature, the expected candidate recall over the
  // corpus's ACTUAL ≥0.5-Jaccard pairs and the expected false-candidate
  // mass from its measured [0.3, 0.5) pairs, using the collision
  // closed form p(s) = 1 − (1 − s^r)^b on each pair's 4-dp Jaccard.
  // One bounded pair table (built once at the 0.3 floor) × a 5-row
  // axis; per-pair terms 9-dp rounded then DECIMAL-summed. The planner
  // conditions on pairs ≥ 0.3 by construction (below the floor the
  // index never pairs them) — stated so nobody reads exp_fp as an
  // absolute count.
  def lshBandPlanner: Q = {
    val brs = Seq((1, 16), (2, 8), (4, 4), (8, 2), (16, 1))
    Q(
      "q315_lsh_band_planner",
      s"""WITH dd AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
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
         |j AS (SELECT round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 4) AS jac
         |  FROM pairs JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
         |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.3),
         |axis AS (SELECT * FROM (VALUES ${brs.map { case (b, r) => s"($b, $r)" }.mkString(", ")}) v(b, r)),
         |p AS (SELECT b, r, jac,
         |    round(1.0 - pow(1.0 - pow(jac, r), b), 9) AS pc
         |  FROM j CROSS JOIN axis)
         |SELECT CAST(b AS BIGINT) AS bands, CAST(r AS BIGINT) AS rows_per_band,
         |  round(pow(1.0 / b, 1.0 / r), 4) AS implied_threshold,
         |  CAST(sum(CASE WHEN jac >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_true_pairs,
         |  round(CAST(sum(CASE WHEN jac >= 0.5
         |      THEN CAST(pc AS DECIMAL(18,9)) ELSE CAST(0 AS DECIMAL(18,9)) END)
         |    AS DOUBLE) / nullif(sum(CASE WHEN jac >= 0.5 THEN 1 ELSE 0 END), 0), 6)
         |    AS exp_recall_at_05,
         |  round(CAST(sum(CASE WHEN jac < 0.5
         |      THEN CAST(pc AS DECIMAL(18,9)) ELSE CAST(0 AS DECIMAL(18,9)) END)
         |    AS DOUBLE), 2) AS exp_fp_candidates
         |FROM p GROUP BY b, r ORDER BY bands""".stripMargin,
    ) { (s, dir) =>
      import s.implicits._
      val j = Dedup.persistTracked(
        Dedup.jaccardPairs(Tables.documents(s, dir), "doc_id", "text", threshold = 0.3)
          .select(col("jaccard").as("jac")))
      val axis = brs.toDF("b", "r")
      val p = j.crossJoin(broadcast(axis))
        .select(col("b"), col("r"), col("jac"),
          round(lit(1.0) - pow(lit(1.0) - pow(col("jac"), col("r")), col("b")), 9)
            .as("pc"))
      p.groupBy("b", "r")
        .agg(
          sum(when(col("jac") >= 0.5, 1).otherwise(0)).cast("long").as("n_true_pairs"),
          round(try_divide(
            sum(when(col("jac") >= 0.5, col("pc").cast("decimal(18,9)"))
              .otherwise(lit(0).cast("decimal(18,9)"))).cast("double"),
            sum(when(col("jac") >= 0.5, 1).otherwise(0)).cast("double")), 6)
            .as("exp_recall_at_05"),
          round(sum(when(col("jac") < 0.5, col("pc").cast("decimal(18,9)"))
            .otherwise(lit(0).cast("decimal(18,9)"))).cast("double"), 2)
            .as("exp_fp_candidates"))
        .select(col("b").cast("long").as("bands"),
          col("r").cast("long").as("rows_per_band"),
          round(pow(lit(1.0) / col("b"), lit(1.0) / col("r")), 4).as("implied_threshold"),
          col("n_true_pairs"), col("exp_recall_at_05"), col("exp_fp_candidates"))
        .orderBy("bands")
    }
  }

  // --- q205: token autocorrelation (loop-spam detector) ---------------------
  // The degenerate-generation signal q82's distinct-3-gram ratio can't
  // see: text looping with PERIOD structure ("a b a b a b") shows
  // elevated token self-match rates at small lags. For lags 1–3,
  // ac_p = |{i : t[i] = t[i+p]}| / (n − p), judged against the doc's
  // own unigram collision baseline Σ(c_t/n)² — random token order
  // matches the baseline, periodic loops exceed it. PURE PER-ROW
  // higher-order-function arithmetic (every count is an integer over
  // the row's own array, the divisions are integer-derived doubles —
  // bit-identical across engines); no explode, no shuffle before the
  // output sort. The O(n·distinct) baseline scan is bounded by doc
  // length, the right cost model for a per-doc quality gate at any
  // corpus size.
  def tokenAutocorrelation: Q = Q(
    "q205_token_autocorr",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |base AS (SELECT doc_id, t, len(t) AS n,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(list_distinct(t),
      |        x -> CAST(len(list_filter(t, y -> y = x)) AS BIGINT)
      |           * CAST(len(list_filter(t, y -> y = x)) AS BIGINT))),
      |      (a, b) -> a + b) AS sumsq
      |  FROM toks WHERE len(t) >= 4),
      |ac AS (SELECT doc_id, n, sumsq,
      |    len(list_filter(range(1, n - 0), i -> t[i] = t[i+1])) AS m1,
      |    len(list_filter(range(1, n - 1), i -> t[i] = t[i+2])) AS m2,
      |    len(list_filter(range(1, n - 2), i -> t[i] = t[i+3])) AS m3
      |  FROM base)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_tok,
      |  round(CAST(m1 AS DOUBLE) / (n - 1), 4) AS ac1,
      |  round(CAST(m2 AS DOUBLE) / (n - 2), 4) AS ac2,
      |  round(CAST(m3 AS DOUBLE) / (n - 3), 4) AS ac3,
      |  round(CAST(sumsq AS DOUBLE) / (CAST(n AS BIGINT) * n), 4) AS baseline,
      |  CASE WHEN greatest(CAST(m1 AS DOUBLE) / (n - 1), CAST(m2 AS DOUBLE) / (n - 2),
      |                     CAST(m3 AS DOUBLE) / (n - 3))
      |            > 2.0 * (CAST(sumsq AS DOUBLE) / (CAST(n AS BIGINT) * n))
      |       THEN 1 ELSE 0 END AS is_periodic
      |FROM ac ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    val t = TextAnalysis.tokens(col("text"))
    val n = size(t)
    // All four per-row integers (lag-1/2/3 self-match counts + Σc²)
    // come from ONE native codegen expression — see
    // graft.functions.TokenAutocorr for the interpreted-HOF history
    // (two fused HOF designs measured SLOWER than three filter
    // passes; the compiled single pass beats them all: 13.1 s →
    // 2.2 s at sf0.1 same-window). Same integers, untouched oracle;
    // TokenAutocorrSpec pins bit equality against the HOF form.
    def ac(p: Int) = col(s"m$p").cast("double") / (col("n_tok") - p)
    val baseline = col("sumsq").cast("double") / (col("n_tok") * col("n_tok"))
    Tables.documents(s, dir)
      .filter(n >= 4)
      .select(col("doc_id"), n.cast("long").as("n_tok"),
        graft.functions.TokenAutocorr(t).as("st"))
      .select(col("doc_id"), col("n_tok"), col("st.sumsq").as("sumsq"),
        col("st.m1").as("m1"), col("st.m2").as("m2"), col("st.m3").as("m3"))
      .select(col("doc_id"), col("n_tok"),
        round(ac(1), 4).as("ac1"), round(ac(2), 4).as("ac2"), round(ac(3), 4).as("ac3"),
        round(baseline, 4).as("baseline"),
        when(greatest(ac(1), ac(2), ac(3)) > lit(2.0) * baseline, 1).otherwise(0)
          .as("is_periodic"))
      .orderBy("doc_id")
  }

  // --- q211: per-source lexical diversity -----------------------------------
  // The vocabulary-health triple a source-quality dashboard leads
  // with: type-token ratio (template farms repeat a tiny vocabulary),
  // hapax share (scraped boilerplate has almost none; natural text
  // ~40-60% of TYPES appear once), and Simpson's repeat-rate
  // Σc(c−1)/(N(N−1)) (the probability two random tokens from the
  // source are the same type — high = degenerate). One token explode
  // into a (source, tok) keyed aggregate (map-side combined), then a
  // source-keyed rollup; every statistic is integer-moment-exact, the
  // divisions are the only doubles. Output is sources-sized.
  def lexicalDiversity: Q = Q(
    "q211_lexical_diversity",
    """WITH tc AS (SELECT source, tok, count(*) AS c FROM
      |    (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY source, tok),
      |m AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    count(*) AS n_types,
      |    CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax,
      |    CAST(sum(c * (c - 1)) AS BIGINT) AS rep2
      |  FROM tc GROUP BY source)
      |SELECT source, n_tokens, CAST(n_types AS BIGINT) AS n_types, n_hapax,
      |  round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS type_token_ratio,
      |  round(CAST(n_hapax AS DOUBLE) / n_types, 6) AS hapax_share,
      |  round(CAST(rep2 AS DOUBLE) / (n_tokens * (n_tokens - 1)), 6) AS simpson_repeat
      |FROM m ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    val tc = Tables.documents(s, dir)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    tc.groupBy("source")
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_types"),
        count(when(col("c") === 1, lit(1))).as("n_hapax"),
        sum(col("c") * (col("c") - 1)).as("rep2"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        round(col("n_types").cast("double") / col("n_tokens"), 6).as("type_token_ratio"),
        round(col("n_hapax").cast("double") / col("n_types"), 6).as("hapax_share"),
        round(col("rep2").cast("double") / (col("n_tokens") * (col("n_tokens") - 1)), 6)
          .as("simpson_repeat"))
      .orderBy("source")
  }

  // --- q206: MinHash estimator calibration ----------------------------------
  // "Can we trust est_jaccard?" answered with data instead of the
  // k=32 binomial theory: for every LSH band-collision candidate
  // pair, the signature estimate (matching components / 32) is scored
  // against the EXACT shingle Jaccard, bucketed by exact-J decile —
  // per-bucket bias and MAE are the curve that justifies (or indicts)
  // a production threshold. Runs entirely on the portable poly hash
  // family (Dedup.minhashSignaturesPoly) so DuckDB re-derives
  // signatures, banding (band key = the 4 component VALUES — no band
  // hash needed), the 1000-cap on hot band buckets, candidate pairs,
  // both scores, and the bucket stats bit-for-bit. Pre-dedup'd,
  // keyed-join-only, bucket- and df-capped — the q41/q40 scale
  // stances compose unchanged.
  def minhashCalibration: Q = {
    val P = Dedup.PolyPrime
    val perms = Dedup.minhashPerms
    val minsSql = perms.zipWithIndex
      .map { case ((a, b), i) => s"MIN((h * $a + $b) % $P) AS m$i" }.mkString(",\n      ")
    val bands = 8
    val r = Dedup.NumPerms / bands
    val bandedSql = (0 until bands).map { j =>
      val bv = (0 until r).map(k => s"m${j * r + k}").mkString(" || ',' || ")
      s"SELECT doc_id, $j AS band_id, $bv AS bv FROM sig"
    }.mkString("\n      UNION ALL ")
    val estSql = (0 until Dedup.NumPerms)
      .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    Q(
      "q206_minhash_calibration",
      s"""WITH dd AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
         |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM dd),
         |sh0 AS (SELECT DISTINCT doc_id, shingle FROM toks,
         |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
         |       WHERE len(t) >= 3),
         |hot AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 1000),
         |sh AS (SELECT * FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)),
         |th AS (SELECT doc_id, shingle, list_reduce(list_prepend(CAST(0 AS BIGINT),
         |         list_transform(string_split(shingle, ''), c -> CAST(ascii(c) AS BIGINT))),
         |         (h, b) -> (h * 131 + b) % $P) AS h FROM sh),
         |sig AS (SELECT doc_id, $minsSql FROM th GROUP BY doc_id),
         |banded AS ($bandedSql),
         |hotb AS (SELECT band_id, bv FROM banded GROUP BY band_id, bv
         |         HAVING count(*) > 1000),
         |bd AS (SELECT b.* FROM banded b LEFT JOIN hotb
         |       ON hotb.band_id = b.band_id AND hotb.bv = b.bv
         |       WHERE hotb.band_id IS NULL),
         |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |         FROM bd x JOIN bd y ON x.band_id = y.band_id AND x.bv = y.bv
         |           AND x.doc_id < y.doc_id),
         |est AS (SELECT id_a, id_b, round(CAST($estSql AS DOUBLE) / ${Dedup.NumPerms}, 4) AS est
         |        FROM cand JOIN sig a ON a.doc_id = id_a JOIN sig b ON b.doc_id = id_b),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |jac AS (SELECT id_a, id_b,
         |          round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 4) AS j
         |        FROM pairs JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b),
         |scored AS (SELECT est.id_a, est.id_b, est.est, coalesce(jac.j, 0.0) AS j
         |           FROM est LEFT JOIN jac ON jac.id_a = est.id_a AND jac.id_b = est.id_b),
         |bk AS (SELECT CAST(floor(j * 10) AS INTEGER) AS b, est, j FROM scored)
         |SELECT round(b / 10.0, 1) AS j_lo, count(*) AS n_pairs,
         |  round(CAST(sum(CAST(j AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS mean_exact,
         |  round(CAST(sum(CAST(est AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS mean_est,
         |  round(CAST(sum(CAST(est AS DECIMAL(18,4))) AS DOUBLE) / count(*)
         |    - CAST(sum(CAST(j AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) + 0.0 AS bias,
         |  round(CAST(sum(CAST(round(abs(est - j), 4) AS DECIMAL(18,4))) AS DOUBLE)
         |    / count(*), 6) AS mae
         |FROM bk GROUP BY b ORDER BY j_lo""".stripMargin,
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val sigs = Dedup.persistTracked(
        Dedup.minhashSignaturesPoly(docs, "doc_id", "text"))
      // band value = the r component VALUES joined (portable — no band
      // hash); built per band id via slice
      val banded = sigs.select(col("doc_id"), explode(transform(
          sequence(lit(0), lit(bands - 1)),
          j => struct(j.as("band_id"),
            concat_ws(",", transform(slice(col("sig"), j * r + 1, lit(r)),
              v => v.cast("string"))).as("bv")))).as("u"))
        .select(col("doc_id"), col("u.band_id"), col("u.bv"))
      val hotb = Dedup.observeDrops(
        banded.groupBy("band_id", "bv").agg(count(lit(1)).as("sz"))
          .filter(col("sz") > 1000), "minhashCalibration", 1000)
        .select("band_id", "bv")
      // both pair-join sides read the capped table: persist once.
      // Explicit aliases on the self-join — a positional-toDF rename
      // of this anti-join-bearing plan resolves id_a/id_b to ONE
      // attribute after relation dedup (id_a < id_b then always
      // false → silently empty candidates; caught by the oracle)
      val bd = Dedup.persistTracked(banded.join(hotb, Seq("band_id", "bv"), "left_anti"))
      val lhs = bd.select(col("doc_id").as("id_a"), col("band_id"), col("bv")).alias("L")
      val rhs = bd.select(col("doc_id").as("id_b"), col("band_id"), col("bv")).alias("R")
      val cand = lhs.join(rhs, col("L.band_id") === col("R.band_id")
          && col("L.bv") === col("R.bv") && col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      val est = cand
        .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
        .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
        .select(col("id_a"), col("id_b"), round(
          aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
            .cast("double") / Dedup.NumPerms, 4).as("est"))
      val jac = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.0)
        .withColumnRenamed("jaccard", "j")
      val scored = est.join(jac, Seq("id_a", "id_b"), "left_outer")
        .select(col("est"), coalesce(col("j"), lit(0.0)).as("j"))
      val d4 = (c: org.apache.spark.sql.Column) => sum(c.cast("decimal(18,4)")).cast("double")
      scored.groupBy(floor(col("j") * 10).cast("int").as("b"))
        .agg(count(lit(1)).as("n_pairs"),
          round(d4(col("j")) / count(lit(1)), 6).as("mean_exact"),
          round(d4(col("est")) / count(lit(1)), 6).as("mean_est"),
          znorm(round(d4(col("est")) / count(lit(1))
            - d4(col("j")) / count(lit(1)), 6)).as("bias"),
          round(d4(round(abs(col("est") - col("j")), 4)) / count(lit(1)), 6).as("mae"))
        .select(round(col("b") / 10.0, 1).as("j_lo"), col("n_pairs"),
          col("mean_exact"), col("mean_est"), col("bias"), col("mae"))
        .orderBy("j_lo")
    }
  }

  // --- q96: streaming incremental dedup (stream-static anti join) ----------
  // The production ingest shape q84 runs in batch: the incoming crawl
  // arrives as a STREAM, the existing corpus is a static table, and
  // Structured Streaming's stream-static left_anti join drops
  // already-present texts before the stateful min-id aggregation. Both
  // sides meet on fixed-width (hash, length) keys — the corpus never
  // ships bodies into the stream. Hash-matches the batch oracle.
  def streamingIncrementalDedup: Q = Q(
    "q96_streaming_incremental_dedup",
    """WITH existing AS (SELECT DISTINCT text FROM documents WHERE doc_id < 300),
      |inc AS (SELECT text, min(doc_id) AS keep_doc_id, count(*) AS copies
      |        FROM documents WHERE doc_id >= 300 GROUP BY text)
      |SELECT keep_doc_id, copies FROM inc
      |WHERE text NOT IN (SELECT text FROM existing)
      |ORDER BY keep_doc_id""".stripMargin,
  ) { (s, dir) =>
    val raw = s.read.parquet(s"$dir/documents.parquet") // schema probe only
    val existingKeys = Tables.documents(s, dir)
      .filter(col("doc_id") < 300)
      .select(xxhash64(col("text")).as("__th"), length(col("text")).as("__tl"))
      .distinct()
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .filter(col("doc_id") >= 300)
      .select(col("doc_id"), xxhash64(col("text")).as("__th"), length(col("text")).as("__tl"))
      .join(existingKeys, Seq("__th", "__tl"), "left_anti") // stream-static
      .groupBy("__th", "__tl")
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("copies"))
    val sink = s"graft_stream_incdedup_${System.nanoTime()}"
    val q = stream.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    // memory sink is harness-only (bounded: one row per new text at
    // sf scale); a real ingest would use update mode + a durable sink
    val out = s.table(sink).select("keep_doc_id", "copies")
      .orderBy("keep_doc_id").localCheckpoint(true)
    out.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Dedup.trackRdd(lr.rdd)
      case _ => ()
    }
    s.catalog.dropTempView(sink)
    out
  }

  // --- q215: streaming near-dup ingest gate ---------------------------------
  // q96 drops EXACT re-crawls at the door; this quarantines NEAR-dups
  // the same way: the incoming stream computes each document's
  // 32-perm MinHash signature as a PURE PER-ROW expression (shingle
  // hashes once via a HOF transform, then per-perm array_min — no
  // explode-and-groupBy, which is what makes the signature stateless
  // and therefore streamable), bands it, and stream-static-joins the
  // 8 band values against the corpus' DISTINCT band index. Output =
  // the quarantine list: incoming docs colliding with the corpus in
  // ≥1 band, with the collision count (8 = near-certain dup, 1 =
  // borderline → route to exact verification). Poly hash family
  // throughout, so the batch-twin oracle re-derives both signature
  // sets, the banding, and the join bit-for-bit — the streamed values
  // are proven, not trusted. The only stream state is the final
  // per-doc count; everything upstream is append-mode-shaped.
  def streamingNearDupGate: Q = {
    val P = Dedup.PolyPrime
    val perms = Dedup.minhashPerms
    val bands = 8
    val r = Dedup.NumPerms / bands
    def sigCtes(src: String, sfx: String): String = {
      val mins = perms.zipWithIndex
        .map { case ((a, b), i) => s"MIN((h * $a + $b) % $P) AS m$i" }.mkString(", ")
      s"""sh$sfx AS (SELECT DISTINCT doc_id, shingle FROM
         |    (SELECT doc_id, string_split(text, ' ') AS t FROM $src) x,
         |    UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
         |    WHERE len(t) >= 3),
         |th$sfx AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(string_split(shingle, ''), c -> CAST(ascii(c) AS BIGINT))),
         |    (h, b) -> (h * 131 + b) % $P) AS h FROM sh$sfx),
         |sig$sfx AS (SELECT doc_id, $mins FROM th$sfx GROUP BY doc_id),
         |band$sfx AS (${(0 until bands).map { j =>
             val bv = (0 until r).map(k => s"m${j * r + k}").mkString(" || ',' || ")
             s"SELECT doc_id, $j AS band_id, $bv AS bv FROM sig$sfx"
           }.mkString("\n  UNION ALL ")})""".stripMargin
    }
    Q(
      "q215_streaming_neardup_gate",
      s"""WITH corp AS (SELECT min(doc_id) AS doc_id, text FROM documents
         |             WHERE doc_id < 300 GROUP BY text),
         |inc AS (SELECT doc_id, text FROM documents WHERE doc_id >= 300),
         |${sigCtes("corp", "c")},
         |bc AS (SELECT DISTINCT band_id, bv FROM bandc),
         |${sigCtes("inc", "i")}
         |SELECT bandi.doc_id, count(*) AS n_band_hits
         |FROM bandi JOIN bc USING (band_id, bv)
         |GROUP BY bandi.doc_id
         |ORDER BY doc_id""".stripMargin,
    ) { (s, dir) =>
      // static side: the corpus band index (exact-representative
      // collapse changes nothing — identical texts band identically
      // and the index is DISTINCT)
      val corpBands = Dedup.minhashSignaturesPoly(
          Tables.documents(s, dir).filter(col("doc_id") < 300), "doc_id", "text")
        .select(explode(transform(sequence(lit(0), lit(bands - 1)),
          j => struct(j.as("band_id"),
            concat_ws(",", transform(slice(col("sig"), j * r + 1, lit(r)),
              v => v.cast("string"))).as("bv")))).as("u"))
        .select(col("u.band_id"), col("u.bv")).distinct()
      // per-row signature: shingle poly-hashes once, then 32 array_min
      // scans — bounded by doc length, zero pre-aggregation state
      val t = TextAnalysis.tokens(col("text"))
      val hs = transform(Dedup.wordShingles(t, 3), sh => Dedup.polyTokenHash(sh))
      def bvCol(j: Int) = concat_ws(",", (0 until r).map { k =>
        val (a, b) = perms(j * r + k)
        array_min(transform(col("__hs"), h => pmod(h * a + b, lit(P)))).cast("string")
      }: _*)
      val raw = s.read.parquet(s"$dir/documents.parquet") // schema probe only
      val stream = s.readStream.schema(raw.schema)
        .option("pathGlobFilter", "documents.parquet").parquet(dir)
        .filter(col("doc_id") >= 300 && size(t) >= 3)
        .select(col("doc_id"), hs.as("__hs"))
        .select(col("doc_id"), explode(array((0 until bands).map(j =>
          struct(lit(j).as("band_id"), bvCol(j).as("bv"))): _*)).as("u"))
        .select(col("doc_id"), col("u.band_id"), col("u.bv"))
        .join(corpBands, Seq("band_id", "bv")) // stream-static inner
        .groupBy("doc_id").agg(count(lit(1)).as("n_band_hits"))
      val sink = s"graft_stream_neardup_${System.nanoTime()}"
      val q = stream.writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      val out = s.table(sink).select("doc_id", "n_band_hits")
        .orderBy("doc_id").localCheckpoint(true)
      out.queryExecution.analyzed.collectLeaves().foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD => Dedup.trackRdd(lr.rdd)
        case _ => ()
      }
      s.catalog.dropTempView(sink)
      out
    }
  }

  // --- q102: edit-distance near-dup pairs ----------------------------------
  // The character-level dedup modality the shingle family can't see
  // cheaply: small in-place edits (typo drift, template fill-ins)
  // barely move levenshtein but can break many shingles. Composes
  // after exact dedup like every pair generator; blocking on the
  // xxhash64 of the first two tokens turns the quadratic pair space
  // into per-block joins (the standard record-linkage shape — an edit
  // inside the blocking key is a recall miss by design, the same
  // trade every blocked matcher makes). Distances compute on a
  // 60-char prefix so the per-pair cost is bounded, and both engines
  // agree byte-for-byte (classic Levenshtein in Spark and DuckDB).
  def editDistancePairs: Q = Q(
    "q102_edit_distance_pairs",
    """WITH reps AS (SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
      |b AS (SELECT doc_id, substr(text, 1, 60) AS pfx,
      |        array_to_string(string_split(text, ' ')[1:2], ' ') AS blk
      |      FROM reps WHERE len(string_split(text, ' ')) >= 2)
      |SELECT a.doc_id AS id_a, c.doc_id AS id_b,
      |       levenshtein(a.pfx, c.pfx) AS dist
      |FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
      |WHERE levenshtein(a.pfx, c.pfx) <= 10
      |ORDER BY id_a, id_b""".stripMargin,
  ) { (s, dir) =>
    val toks = TextAnalysis.tokens(col("text"))
    val b = Dedup.exactRepresentatives(Tables.documents(s, dir), "doc_id", "text")
      .filter(size(toks) >= 2)
      .select(col("doc_id"), substring(col("text"), 1, 60).as("pfx"),
        xxhash64(concat_ws(" ", slice(toks, 1, 2))).as("blkh"))
    val a = b.select(col("doc_id").as("id_a"), col("pfx").as("pfx_a"), col("blkh"))
    val c = b.select(col("doc_id").as("id_b"), col("pfx").as("pfx_b"), col("blkh"))
    a.join(c, Seq("blkh"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("pfx_a"), col("pfx_b")))
      .filter(col("dist") <= 10)
      .select("id_a", "id_b", "dist")
      .orderBy("id_a", "id_b")
  }

  // --- q82: intra-document repetition ratio --------------------------------
  // The Gopher-style repetition quality rule: fraction of a document's
  // 3-gram occurrences that are repeats (1 − distinct/total). Heavily
  // templated or looping text scores high and gets filtered before
  // training. Pure per-row expression — no explode, no shuffle except
  // the output sort.
  def repetition: Q = Q(
    "q82_repetition",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id, len(t) - 2 AS total,
      |  len(list_distinct(list_transform(range(1, len(t) - 1),
      |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS dist
      |  FROM toks WHERE len(t) >= 3)
      |SELECT doc_id,
      |  round(1.0 - CAST(dist AS DOUBLE) / total, 4) AS rep_ratio
      |FROM sh
      |ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    val toks = TextAnalysis.tokens(col("text"))
    // distinct 3-gram count via the compiled WordNGrams (same strings,
    // same first-occurrence distinct); the TOTAL 3-gram count is
    // size(t) − 2 by construction (transform preserved length), so the
    // raw n-gram array is never materialized at all
    Tables.documents(s, dir)
      .filter(size(toks) >= 3)
      .select(col("doc_id"),
        round(lit(1.0) -
          size(graft.functions.WordNGrams(toks, 3, distinct = true)).cast("double")
            / (size(toks) - 2), 4).as("rep_ratio"))
      .orderBy("doc_id")
  }

  // --- q108: TF-IDF keyword extraction -------------------------------------
  // Top-3 characteristic terms per document by smoothed TF-IDF
  // (ln((N+1)/(df+1)) + 1 — the sklearn-style smooth idf). Everything
  // is keyed: tf is a (doc, term) aggregate over the token explode, df
  // a (term) aggregate over tf, and the per-doc top-3 a partitioned
  // window — no global sort, no collect. The df join is deliberately
  // UNhinted: vocab is usually ≪ corpus and AQE broadcasts it, but a
  // web-crawl vocab (typos, ids) can exceed executor memory, and a
  // forced broadcast would OOM where a shuffled term join degrades
  // gracefully. Only the one-row doc-count scalar is force-broadcast. Tokenization is the q35 whitespace split so
  // the whole text family agrees on what a token is.
  def tfidfKeywords: Q = Q(
    "q108_tfidf_keywords",
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE len(term) > 0 GROUP BY 1, 2),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*) AS n FROM documents),
      |scored AS (
      |  SELECT doc_id, term,
      |    CAST(tf AS DOUBLE) * (ln((n + 1.0) / (df + 1.0)) + 1.0) AS s,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY CAST(tf AS DOUBLE) * (ln((n + 1.0) / (df + 1.0)) + 1.0) DESC, term) AS rk
      |  FROM tf JOIN df USING (term) CROSS JOIN n)
      |SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, round(s, 6) AS tfidf
      |FROM scored WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
  ) { (s, dir) =>
    graft.text.Keywords.tfidfTopTerms(Tables.documents(s, dir), "doc_id", "text", k = 3)
      .orderBy("doc_id", "rk")
  }

  // --- md5 fingerprint (oracle-checked) -----------------------------------
  def md5Fingerprint: Q = Q(
    "q44_md5_fingerprint",
    """SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id""",
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .orderBy("doc_id")
  }

  // --- q198: quality-scorer rank agreement (Spearman) -----------------------
  // Before swapping one quality filter for another, measure whether
  // they RANK the corpus the same way: Spearman ρ between the q36
  // heuristic score and the q191 entropy proxy. Both scores are
  // 4-dp-quantized first, so ranking never needs a corpus-length
  // sort: average ranks come from a running sum over the DISTINCT
  // score values (a bounded table — ≤10⁴/≤10⁵ rows at any corpus
  // size), joined back to docs; the Pearson-on-ranks moments are
  // exact (ranks are .5-quantized, products ≤2 fractional digits,
  // DECIMAL(28,4) sums). At 10¹⁰ docs the Σr² moment outgrows
  // DECIMAL(28,4) — widen to (38,4) there; the SHAPE (bounded rank
  // table, keyed joins, one aggregate) is the scale story.
  def scorerAgreement: Q = Q(
    "q198_scorer_agreement",
    s"""WITH chars AS (
       |  SELECT doc_id, substring(text, CAST(i AS INTEGER), 1) AS ch
       |  FROM documents, UNNEST(range(1, len(text) + 1)) AS u(i)
       |  WHERE len(text) >= 1),
       |cc AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch),
       |cn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM cc GROUP BY doc_id),
       |ent AS (SELECT cc.doc_id, round(-CAST(sum(CAST(
       |    round((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n), 9)
       |    AS DECIMAL(18,9))) AS DOUBLE), 4) AS se
       |  FROM cc JOIN cn USING (doc_id) GROUP BY cc.doc_id),
       |qual AS (SELECT doc_id,
       |    round(least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0) * 0.5
       |      + (1.0 - CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stop)))
       |          AS DOUBLE) / len(string_split(text, ' '))) * 0.5, 4) AS sq
       |  FROM documents),
       |sc AS (SELECT q.doc_id, q.sq, e.se FROM qual q JOIN ent e USING (doc_id)),
       |fq AS (SELECT sq, count(*) AS c FROM sc GROUP BY sq),
       |rq AS (SELECT sq, sum(c) OVER (ORDER BY sq) - c + (c + 1) / 2.0 AS rq FROM fq),
       |fe AS (SELECT se, count(*) AS c FROM sc GROUP BY se),
       |re AS (SELECT se, sum(c) OVER (ORDER BY se) - c + (c + 1) / 2.0 AS re FROM fe),
       |rk AS (SELECT sc.doc_id, rq.rq AS x, re.re AS y FROM sc
       |       JOIN rq USING (sq) JOIN re USING (se)),
       |m AS (SELECT count(*) AS n,
       |    CAST(sum(CAST(x AS DECIMAL(28,4))) AS DOUBLE) AS sx,
       |    CAST(sum(CAST(y AS DECIMAL(28,4))) AS DOUBLE) AS sy,
       |    CAST(sum(CAST(x * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
       |    CAST(sum(CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
       |    CAST(sum(CAST(y * y AS DECIMAL(28,4))) AS DOUBLE) AS syy
       |  FROM rk)
       |SELECT CAST(n AS BIGINT) AS n_docs,
       |  round((n * sxy - sx * sy)
       |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0 AS spearman_rho
       |FROM m""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    // both scores are per-row expressions (the entropy via the codegen
    // CharEntropy pass) — no explode, no join between them
    val sc = Dedup.persistTracked(docs.filter(length(col("text")) >= 1)
      .select(col("doc_id"),
        round(TextAnalysis.qualityScore(col("text")), 4).as("sq"),
        round(-graft.functions.CharEntropy(col("text")).getField("negent"), 4).as("se")))
    // rank tables run their windows over DISTINCT quantized scores —
    // bounded rows, so the single-partition window is fine at scale
    def ranks(scoreCol: String, rankCol: String) =
      sc.groupBy(scoreCol).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(Window.orderBy(scoreCol)))
        .select(col(scoreCol), (col("cum") - col("c") + (col("c") + 1) / 2.0).as(rankCol))
    val rk = sc
      .join(broadcast(ranks("sq", "x")), "sq")
      .join(broadcast(ranks("se", "y")), "se")
    val m = rk.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(28,4)")).cast("double").as("sx"),
      sum(col("y").cast("decimal(28,4)")).cast("double").as("sy"),
      sum((col("x") * col("y")).cast("decimal(28,4)")).cast("double").as("sxy"),
      sum((col("x") * col("x")).cast("decimal(28,4)")).cast("double").as("sxx"),
      sum((col("y") * col("y")).cast("decimal(28,4)")).cast("double").as("syy"))
    m.select(col("n").as("n_docs"),
      znorm(round(try_divide(col("n") * col("sxy") - col("sx") * col("sy"),
        sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
          * (col("n") * col("syy") - col("sy") * col("sy")))), 6)).as("spearman_rho"))
  }

  // --- q191: character-entropy quality proxy -------------------------------
  // The compression-ratio quality signal (CCNet/RefinedWeb filter
  // machine-generated or repetitive text by how well it compresses)
  // without the compressor: Shannon entropy of the per-doc character
  // distribution — boilerplate and template spam sit far below natural
  // text. A document's characters all live in its own row, so this is
  // a PURE PER-ROW map: the native codegen
  // [[graft.functions.CharEntropy]] expression computes counts and
  // the 9-dp-rounded −p·ln p term sum in one local pass (scaled-long
  // decimal arithmetic, bit-identical to the oracle's explode +
  // DECIMAL-sum formulation) — zero exchanges before the final sort,
  // where the first implementation shuffled one row per character.
  def charEntropy: Q = Q(
    "q191_char_entropy",
    """WITH chars AS (
      |  SELECT doc_id, substring(text, CAST(i AS INTEGER), 1) AS ch
      |  FROM documents, UNNEST(range(1, len(text) + 1)) AS u(i)
      |  WHERE len(text) >= 1),
      |cc AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch),
      |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
      |             CAST(count(*) AS BIGINT) AS distinct_chars FROM cc GROUP BY doc_id),
      |h AS (SELECT cc.doc_id,
      |    CAST(sum(CAST(round((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n), 9)
      |      AS DECIMAL(18,9))) AS DOUBLE) AS negent
      |  FROM cc JOIN n USING (doc_id) GROUP BY cc.doc_id)
      |SELECT h.doc_id, n.n AS n_chars_counted, n.distinct_chars,
      |  round(-negent, 6) AS entropy_nats
      |FROM h JOIN n USING (doc_id)
      |ORDER BY h.doc_id""".stripMargin,
  ) { (s, dir) =>
    Tables.documents(s, dir)
      // the oracle's WHERE len >= 1 emits no row for empty docs
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"), graft.functions.CharEntropy(col("text")).as("e"))
      .select(col("doc_id"), col("e.n_chars").as("n_chars_counted"),
        col("e.distinct_chars").as("distinct_chars"),
        round(-col("e.negent"), 6).as("entropy_nats"))
      .orderBy("doc_id")
  }

  // --- q222: graded eval contamination fraction ----------------------------
  // q81 answers "which TRAIN docs touch the eval set" (a binary flag
  // for removal); this answers the question an eval owner asks in the
  // other direction: per EVAL doc, what fraction of its distinct
  // 3-gram shingles occur anywhere in the train split — the graded
  // "dirtiness" score the GPT-3 appendix reports per benchmark, which
  // decides whether an eval number needs a clean-subset rerun.
  // Orientation flips the scale shape too: the TRAIN shingle set is
  // corpus-sized, so unlike q81 nothing broadcasts — the eval shingles
  // (sample-sized) meet the distinct train index in a keyed LEFT join
  // on the shingle and reduce per doc. `contaminated` is the ≥50%
  // gate as an integer cross-multiplication (no float threshold).
  def contaminationFraction: Q = Q(
    "q222_contamination_frac",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM toks,
      |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
      |       WHERE len(t) >= 3),
      |eval AS (SELECT doc_id FROM documents
      |         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '28f5'),
      |tsh AS (SELECT DISTINCT shingle, 1 AS hitm FROM sh
      |        WHERE doc_id NOT IN (SELECT doc_id FROM eval)),
      |esh AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN eval USING (doc_id))
      |SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
      |  CAST(sum(COALESCE(t.hitm, 0)) AS BIGINT) AS n_hit,
      |  round(CAST(sum(COALESCE(t.hitm, 0)) AS DOUBLE) / count(*), 4) AS overlap_frac,
      |  (sum(COALESCE(t.hitm, 0)) * 2 >= count(*)) AS contaminated
      |FROM esh e LEFT JOIN tsh t ON t.shingle = e.shingle
      |GROUP BY e.doc_id
      |ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    // split is a per-row doc_id predicate pushed below both explodes
    // (the q81 idiom) — no membership join
    val isEval = substring(md5(col("doc_id").cast("string")), 1, 4) < "28f5"
    val tsh = Dedup.shingleTable(docs.filter(!isEval), "doc_id", "text")
      .select("shingle").distinct().withColumn("hitm", lit(1))
    Dedup.shingleTable(docs.filter(isEval), "doc_id", "text")
      .join(tsh, Seq("shingle"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hitm"), lit(0))).cast("long").as("n_hit"))
      .select(col("doc_id"), col("n_shingles"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_shingles"), 4).as("overlap_frac"),
        (col("n_hit") * 2 >= col("n_shingles")).as("contaminated"))
      .orderBy("doc_id")
  }

  // --- q226: filter-agreement kappa ----------------------------------------
  // q198 asks whether two scorers RANK the corpus alike; this asks the
  // operational question: do the DECISIONS agree once each score is
  // thresholded — Cohen's κ (chance-corrected agreement) between the
  // three standing gates (quality, char entropy, low repetition), each
  // thresholded at its own corpus MEDIAN so the 2×2 tables are
  // balanced by construction and the constant is data-derived, not
  // arbitrary. κ near 0 means a second filter adds real information;
  // κ near 1 means it's redundant. One corpus scan computes all three
  // per-doc scores (entropy via the codegen CharEntropy pass), the
  // medians ride back as a 1-row broadcast, and all twelve 2×2 cells
  // reduce in ONE aggregate — the three output rows are literal
  // selects from that single row. κ's numerator is a cancelling
  // subtraction → signed-zero-normalized, and pe = 1 (degenerate
  // all-agree corpus) NULLs via try_divide, per the CLAUDE.md rule.
  // Domain = docs with ≥3 tokens (where all three scores exist).
  def filterKappa: Q = Q(
    "q226_filter_kappa",
    s"""WITH base AS (SELECT doc_id, text, string_split(text, ' ') AS t
       |    FROM documents WHERE len(string_split(text, ' ')) >= 3),
       |chars AS (SELECT doc_id, substring(text, CAST(i AS INTEGER), 1) AS ch
       |  FROM base, UNNEST(range(1, len(text) + 1)) AS u(i)),
       |cc AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch),
       |cn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM cc GROUP BY doc_id),
       |ent AS (SELECT cc.doc_id, round(-CAST(sum(CAST(
       |    round((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n), 9)
       |    AS DECIMAL(18,9))) AS DOUBLE), 4) AS se
       |  FROM cc JOIN cn USING (doc_id) GROUP BY cc.doc_id),
       |sc AS (SELECT b.doc_id,
       |    round(${TextSqlFragments.qualitySql("t")}, 4) AS sq,
       |    e.se,
       |    round(1.0 - CAST(len(list_distinct(list_transform(range(1, len(t) - 1),
       |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS DOUBLE)
       |      / (len(t) - 2), 4) AS rr
       |  FROM base b JOIN ent e ON e.doc_id = b.doc_id),
       |med AS (SELECT quantile_cont(sq, 0.5) AS mq, quantile_cont(se, 0.5) AS me,
       |          quantile_cont(rr, 0.5) AS mr FROM sc),
       |fl AS (SELECT (sq >= mq) AS fq, (se >= me) AS fe, (rr <= mr) AS fr
       |       FROM sc CROSS JOIN med),
       |agg AS (SELECT count(*) AS n,
       |    sum(CASE WHEN fq AND fe THEN 1 ELSE 0 END) AS qe_a,
       |    sum(CASE WHEN fq AND NOT fe THEN 1 ELSE 0 END) AS qe_b,
       |    sum(CASE WHEN NOT fq AND fe THEN 1 ELSE 0 END) AS qe_c,
       |    sum(CASE WHEN NOT fq AND NOT fe THEN 1 ELSE 0 END) AS qe_d,
       |    sum(CASE WHEN fq AND fr THEN 1 ELSE 0 END) AS qr_a,
       |    sum(CASE WHEN fq AND NOT fr THEN 1 ELSE 0 END) AS qr_b,
       |    sum(CASE WHEN NOT fq AND fr THEN 1 ELSE 0 END) AS qr_c,
       |    sum(CASE WHEN NOT fq AND NOT fr THEN 1 ELSE 0 END) AS qr_d,
       |    sum(CASE WHEN fe AND fr THEN 1 ELSE 0 END) AS er_a,
       |    sum(CASE WHEN fe AND NOT fr THEN 1 ELSE 0 END) AS er_b,
       |    sum(CASE WHEN NOT fe AND fr THEN 1 ELSE 0 END) AS er_c,
       |    sum(CASE WHEN NOT fe AND NOT fr THEN 1 ELSE 0 END) AS er_d
       |  FROM fl)
       |SELECT * FROM (
       |  SELECT 'entropy' AS filter_a, 'repetition' AS filter_b,
       |    CAST(n AS BIGINT) AS n_docs,
       |    round(CAST(er_a + er_d AS DOUBLE) / n, 4) AS agree_rate,
       |    round((CAST(er_a + er_d AS DOUBLE) / n
       |        - ((er_a+er_b)*(er_a+er_c) + (er_c+er_d)*(er_b+er_d)) / (CAST(n AS DOUBLE)*n))
       |      / (1.0 - ((er_a+er_b)*(er_a+er_c) + (er_c+er_d)*(er_b+er_d)) / (CAST(n AS DOUBLE)*n)),
       |      4) + 0.0 AS kappa
       |  FROM agg
       |  UNION ALL
       |  SELECT 'quality', 'entropy', CAST(n AS BIGINT),
       |    round(CAST(qe_a + qe_d AS DOUBLE) / n, 4),
       |    round((CAST(qe_a + qe_d AS DOUBLE) / n
       |        - ((qe_a+qe_b)*(qe_a+qe_c) + (qe_c+qe_d)*(qe_b+qe_d)) / (CAST(n AS DOUBLE)*n))
       |      / (1.0 - ((qe_a+qe_b)*(qe_a+qe_c) + (qe_c+qe_d)*(qe_b+qe_d)) / (CAST(n AS DOUBLE)*n)),
       |      4) + 0.0
       |  FROM agg
       |  UNION ALL
       |  SELECT 'quality', 'repetition', CAST(n AS BIGINT),
       |    round(CAST(qr_a + qr_d AS DOUBLE) / n, 4),
       |    round((CAST(qr_a + qr_d AS DOUBLE) / n
       |        - ((qr_a+qr_b)*(qr_a+qr_c) + (qr_c+qr_d)*(qr_b+qr_d)) / (CAST(n AS DOUBLE)*n))
       |      / (1.0 - ((qr_a+qr_b)*(qr_a+qr_c) + (qr_c+qr_d)*(qr_b+qr_d)) / (CAST(n AS DOUBLE)*n)),
       |      4) + 0.0
       |  FROM agg)
       |ORDER BY filter_a, filter_b""".stripMargin,
  ) { (s, dir) =>
    val toks = TextAnalysis.tokens(col("text"))
    val rawSh = graft.functions.WordNGrams(toks, 3, distinct = false)
    val sc = Dedup.persistTracked(Tables.documents(s, dir)
      .filter(size(toks) >= 3)
      .select(col("doc_id"),
        round(TextAnalysis.qualityScore(col("text")), 4).as("sq"),
        round(-graft.functions.CharEntropy(col("text")).getField("negent"), 4).as("se"),
        round(lit(1.0) - size(array_distinct(rawSh)).cast("double") / (size(toks) - 2), 4)
          .as("rr")))
    val med = sc.agg(expr("percentile(sq, 0.5)").as("mq"),
      expr("percentile(se, 0.5)").as("me"), expr("percentile(rr, 0.5)").as("mr"))
    val fl = sc.crossJoin(broadcast(med))
      .select((col("sq") >= col("mq")).as("fq"), (col("se") >= col("me")).as("fe"),
        (col("rr") <= col("mr")).as("fr"))
    def cell(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      sum(when(x && y, 1).otherwise(0))
    val agg = fl.agg(count(lit(1)).as("n"),
      cell(col("fq"), col("fe")).as("qe_a"), cell(col("fq"), !col("fe")).as("qe_b"),
      cell(!col("fq"), col("fe")).as("qe_c"), cell(!col("fq"), !col("fe")).as("qe_d"),
      cell(col("fq"), col("fr")).as("qr_a"), cell(col("fq"), !col("fr")).as("qr_b"),
      cell(!col("fq"), col("fr")).as("qr_c"), cell(!col("fq"), !col("fr")).as("qr_d"),
      cell(col("fe"), col("fr")).as("er_a"), cell(col("fe"), !col("fr")).as("er_b"),
      cell(!col("fe"), col("fr")).as("er_c"), cell(!col("fe"), !col("fr")).as("er_d"))
    val aggP = Dedup.persistTracked(agg)
    def row(la: String, lb: String, p: String) = {
      val (a, b, c, d) = (col(s"${p}_a"), col(s"${p}_b"), col(s"${p}_c"), col(s"${p}_d"))
      val po = (a + d).cast("double") / col("n")
      val pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (col("n").cast("double") * col("n"))
      aggP.select(lit(la).as("filter_a"), lit(lb).as("filter_b"),
        col("n").cast("long").as("n_docs"),
        round(po, 4).as("agree_rate"),
        znorm(round(try_divide(po - pe, lit(1.0) - pe), 4)).as("kappa"))
    }
    row("quality", "entropy", "qe")
      .union(row("quality", "repetition", "qr"))
      .union(row("entropy", "repetition", "er"))
      .orderBy("filter_a", "filter_b")
  }

  // --- q223: multinomial Naive Bayes source classifier ----------------------
  // The fastText-shaped curation classifier on TOKEN features (q133's
  // logreg classifies embeddings): train add-one-smoothed multinomial
  // NB on the train split's (source, token) counts, score the held-out
  // split, emit the confusion matrix — the "does provenance leak into
  // surface form" audit that decides whether a source filter can be
  // learned. Everything is counts: the model is ln((c_st+1)/(N_s+V))
  // over a df-capped vocabulary (count ≥ 5 — at web scale cap to
  // top-K by frequency; the cap bounds the model table), priors are
  // doc shares, and scoring is ONE keyed join of exploded eval tokens
  // against the model followed by a per-(doc, candidate) DECIMAL sum
  // of 9-dp ln terms — bit-reproducible, so argmax (score desc, then
  // source asc on exact ties) matches across engines. Eval docs with
  // zero in-vocab tokens drop out (no evidence, no prediction).
  // The per-doc argmax window ranks |sources| rows per doc, never the
  // corpus.
  def nbSourceClassifier: Q = Q(
    "q223_nb_source_classifier",
    """WITH eval AS (SELECT doc_id FROM documents
      |         WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '28f5'),
      |tr AS (SELECT doc_id, source, text FROM documents
      |       WHERE doc_id NOT IN (SELECT doc_id FROM eval)),
      |tt AS (SELECT t.source, tok FROM tr t,
      |       UNNEST(string_split(t.text, ' ')) AS u(tok)),
      |voc AS (SELECT tok FROM tt GROUP BY tok HAVING count(*) >= 5),
      |vsz AS (SELECT count(*) AS v FROM voc),
      |c AS (SELECT source, tok, count(*) AS c FROM tt JOIN voc USING (tok)
      |      GROUP BY source, tok),
      |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM c GROUP BY source),
      |srcs AS (SELECT source, count(*) AS nd FROM tr GROUP BY source),
      |ndt AS (SELECT CAST(sum(nd) AS BIGINT) AS ndt FROM srcs),
      |model AS (SELECT n.source, v.tok,
      |    round(ln((COALESCE(c.c, 0) + 1.0) / (n.ns + vsz.v)), 9) AS lp
      |  FROM ns n CROSS JOIN voc v CROSS JOIN vsz
      |  LEFT JOIN c ON c.source = n.source AND c.tok = v.tok),
      |prior AS (SELECT s.source, round(ln(CAST(s.nd AS DOUBLE) / ndt.ndt), 9) AS lp0
      |  FROM srcs s CROSS JOIN ndt),
      |ed AS (SELECT d.doc_id, d.source, d.text FROM documents d JOIN eval USING (doc_id)),
      |et AS (SELECT doc_id, source AS true_source, tok FROM ed,
      |       UNNEST(string_split(text, ' ')) AS u(tok)),
      |sc AS (SELECT e.doc_id, e.true_source, m.source AS cand,
      |    CAST(sum(CAST(m.lp AS DECIMAL(28,9))) AS DOUBLE) + max(p.lp0) AS score
      |  FROM et e JOIN model m ON m.tok = e.tok
      |  JOIN prior p ON p.source = m.source
      |  GROUP BY e.doc_id, e.true_source, m.source),
      |pred AS (SELECT doc_id, true_source, cand AS pred_source,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
      |  FROM sc)
      |SELECT true_source, pred_source, CAST(count(*) AS BIGINT) AS n_docs
      |FROM pred WHERE rn = 1
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val isEval = substring(md5(col("doc_id").cast("string")), 1, 4) < "28f5"
    val tr = docs.filter(!isEval)
    val tt = tr.select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val voc = Dedup.persistTracked(
      tt.groupBy("tok").agg(count(lit(1)).as("ctot")).filter(col("ctot") >= 5)
        .select("tok"))
    val vsz = voc.agg(count(lit(1)).as("v"))
    // vocab join deliberately unhinted (the q108 stance): AQE
    // broadcasts a small vocab, a web-scale one stays a shuffle join
    val c = Dedup.persistTracked(
      tt.join(voc, "tok").groupBy("source", "tok").agg(count(lit(1)).as("c")))
    val ns = c.groupBy("source").agg(sum(col("c")).cast("long").as("ns"))
    val srcs = tr.groupBy("source").agg(count(lit(1)).as("nd"))
    val ndt = srcs.agg(sum(col("nd")).cast("long").as("ndt"))
    val model = voc.crossJoin(broadcast(ns)).crossJoin(broadcast(vsz))
      .join(c, Seq("source", "tok"), "left")
      .select(col("source"), col("tok"),
        round(log((coalesce(col("c"), lit(0L)) + lit(1.0)) / (col("ns") + col("v"))), 9)
          .as("lp"))
    val prior = srcs.crossJoin(broadcast(ndt))
      .select(col("source"), round(log(col("nd").cast("double") / col("ndt")), 9).as("lp0"))
    val et = docs.filter(isEval)
      .select(col("doc_id"), col("source").as("true_source"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val sc = et.join(model, "tok")
      .join(broadcast(prior), "source")
      .groupBy("doc_id", "true_source", "source")
      .agg((sum(col("lp").cast("decimal(28,9)")).cast("double") + max(col("lp0")))
        .as("score"))
    val rn = row_number().over(
      Window.partitionBy("doc_id").orderBy(col("score").desc, col("source")))
    sc.withColumn("rn", rn).filter(col("rn") === 1)
      .select(col("true_source"), col("source").as("pred_source"))
      .groupBy("true_source", "pred_source")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("true_source", "pred_source")
  }

  // --- q230: Gopher-style quality-rule battery -----------------------------
  // The rule-based pre-filter every web-scale curation pipeline runs
  // BEFORE any learned scorer (Gopher §A.1.1 / RedPajama-v2 quality
  // signals): a battery of cheap structural rules, reported as
  // per-source pass rates so the mixture owner sees which source a
  // rule would decimate. Five rules over one token pass: length in
  // [20, 80] tokens, mean word length in [3, 6], ≥ 2 stopwords,
  // unique-token fraction ≥ 0.4, dominant-token share ≤ 0.12. Every
  // rule is evaluated in INTEGER arithmetic (mean-word-length bounds
  // become 3·wc ≤ chars−wc+1 ≤ 6·wc; ratio gates cross-multiply), so
  // engine float semantics can't flip a boundary doc. One scan, one
  // 20-row aggregate — no shuffle wider than the source dimension.
  // The per-doc dominant-token count is O(distinct·wc) list ops
  // inside codegen, bounded by the tokenizer, not the corpus.
  def gopherRules: Q = Q(
    "q230_gopher_rules",
    s"""WITH d AS (SELECT source, string_split(text, ' ') AS t, len(text) AS c
       |  FROM documents),
       |r AS (SELECT source,
       |  CASE WHEN len(t) BETWEEN 20 AND 80 THEN 1 ELSE 0 END AS r_len,
       |  CASE WHEN 3 * len(t) <= c - len(t) + 1 AND c - len(t) + 1 <= 6 * len(t)
       |       THEN 1 ELSE 0 END AS r_mwl,
       |  CASE WHEN len(list_filter(t, x -> x IN (${TextSqlFragments.stopList}))) >= 2
       |       THEN 1 ELSE 0 END AS r_stop,
       |  CASE WHEN 5 * len(list_distinct(t)) >= 2 * len(t) THEN 1 ELSE 0 END AS r_uniq,
       |  CASE WHEN 25 * list_max(list_transform(list_distinct(t),
       |         x -> len(list_filter(t, y -> y = x)))) <= 3 * len(t)
       |       THEN 1 ELSE 0 END AS r_dom
       |  FROM d)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  round(CAST(sum(r_len) AS DOUBLE) / count(*), 4) AS pass_len,
       |  round(CAST(sum(r_mwl) AS DOUBLE) / count(*), 4) AS pass_mwl,
       |  round(CAST(sum(r_stop) AS DOUBLE) / count(*), 4) AS pass_stop,
       |  round(CAST(sum(r_uniq) AS DOUBLE) / count(*), 4) AS pass_uniq,
       |  round(CAST(sum(r_dom) AS DOUBLE) / count(*), 4) AS pass_dom,
       |  round(CAST(sum(r_len * r_mwl * r_stop * r_uniq * r_dom) AS DOUBLE)
       |    / count(*), 4) AS pass_all
       |FROM r GROUP BY source ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    val t = TextAnalysis.tokens(col("text"))
    val d = Tables.documents(s, dir)
      .select(col("source"), t.as("t"), length(col("text")).as("c"))
    val wc = size(col("t"))
    val domCount = array_max(transform(array_distinct(col("t")),
      x => size(filter(col("t"), y => y === x))))
    def b(c: org.apache.spark.sql.Column) = when(c, 1).otherwise(0)
    val r = d.select(col("source"),
      b(wc.between(20, 80)).as("r_len"),
      b((lit(3) * wc <= col("c") - wc + 1) && (col("c") - wc + 1 <= lit(6) * wc))
        .as("r_mwl"),
      b(TextAnalysis.stopwordCount(col("t")) >= 2).as("r_stop"),
      b(lit(5) * size(array_distinct(col("t"))) >= lit(2) * wc).as("r_uniq"),
      b(lit(25) * domCount <= lit(3) * wc).as("r_dom"))
    def rate(c: String) = round(sum(col(c)).cast("double") / count(lit(1)), 4)
    r.groupBy("source").agg(
        count(lit(1)).cast("long").as("n_docs"),
        rate("r_len").as("pass_len"), rate("r_mwl").as("pass_mwl"),
        rate("r_stop").as("pass_stop"), rate("r_uniq").as("pass_uniq"),
        rate("r_dom").as("pass_dom"),
        round(sum(col("r_len") * col("r_mwl") * col("r_stop") * col("r_uniq") *
          col("r_dom")).cast("double") / count(lit(1)), 4).as("pass_all"))
      .orderBy("source")
  }

  // --- q232: Fleiss' kappa across three binary raters ----------------------
  // q226 answers pairwise redundancy (Cohen's κ per filter pair); this
  // is the m-rater generalization a labeling pipeline reports when
  // SEVERAL gates vote on the same doc: Fleiss' κ over three binary
  // raters (quality ≥ 0.9, length ≥ 50 tokens, unique-token fraction
  // ≥ 0.45), per language. With m = 3 raters the per-item agreement
  // P_i = (v(v−1) + (3−v)(2−v))/6 for v pass-votes, the chance
  // agreement Pe = p² + (1−p)² from the pooled pass share p — all
  // counts and exact integer ratios except the final statistic, which
  // follows the registry's decimal-sum + znorm + try_divide
  // discipline (a unanimous language has Pe = 1 → NULL, and the
  // numerator is a cancelling subtraction). One scan, one
  // languages-row aggregate; the ratio gates cross-multiply so no
  // float compare sits on a rule boundary.
  def fleissKappa: Q = Q(
    "q232_fleiss_kappa",
    s"""WITH d AS (SELECT lang, string_split(text, ' ') AS t FROM documents),
       |v AS (SELECT lang,
       |    (CASE WHEN round(${TextSqlFragments.qualitySql("t")}, 4) >= 0.9
       |          THEN 1 ELSE 0 END)
       |    + (CASE WHEN len(t) >= 50 THEN 1 ELSE 0 END)
       |    + (CASE WHEN 20 * len(list_distinct(t)) >= 9 * len(t)
       |            THEN 1 ELSE 0 END) AS v
       |  FROM d),
       |g AS (SELECT lang, count(*) AS n, CAST(sum(v) AS BIGINT) AS sv,
       |    CAST(sum(CAST(round((v * (v - 1) + (3 - v) * (2 - v)) / 6.0, 9)
       |      AS DECIMAL(18,9))) AS DOUBLE) AS sp
       |  FROM v GROUP BY lang),
       |k AS (SELECT lang, n, sv, sp / n AS pbar,
       |    CAST(sv AS DOUBLE) / (3 * n) AS p FROM g)
       |SELECT lang, CAST(n AS BIGINT) AS n_docs,
       |  round(p, 4) AS p_pass, round(pbar, 6) AS p_bar,
       |  round((pbar - (p * p + (1 - p) * (1 - p)))
       |    / (1 - (p * p + (1 - p) * (1 - p))), 4) + 0.0 AS kappa
       |FROM k ORDER BY lang""".stripMargin,
  ) { (s, dir) =>
    val t = TextAnalysis.tokens(col("text"))
    val d = Tables.documents(s, dir).select(col("lang"), col("text"), t.as("t"))
    def b(c: org.apache.spark.sql.Column) = when(c, 1).otherwise(0)
    val v = d.select(col("lang"),
      (b(round(TextAnalysis.qualityScore(col("text")), 4) >= 0.9)
        + b(size(col("t")) >= 50)
        + b(lit(20) * size(array_distinct(col("t"))) >= lit(9) * size(col("t"))))
        .as("v"))
    val g = v.groupBy("lang").agg(
      count(lit(1)).as("n"), sum(col("v")).as("sv"),
      dsum(round((col("v") * (col("v") - 1) + (lit(3) - col("v")) * (lit(2) - col("v")))
        / 6.0, 9), 9).as("sp"))
    val k = g.select(col("lang"), col("n"), col("sv"),
      (col("sp") / col("n")).as("pbar"),
      (col("sv").cast("double") / (lit(3) * col("n"))).as("p"))
    val pe = col("p") * col("p") + (lit(1) - col("p")) * (lit(1) - col("p"))
    k.select(col("lang"), col("n").cast("long").as("n_docs"),
        round(col("p"), 4).as("p_pass"), round(col("pbar"), 6).as("p_bar"),
        znorm(round(try_divide(col("pbar") - pe, lit(1) - pe), 4)).as("kappa"))
      .orderBy("lang")
  }

  // --- q246: winnowing fingerprint selection --------------------------------
  // The q95/q204 span family hashes EVERY k-gram window; winnowing
  // (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the MOSS algorithm)
  // is how fingerprint indexes stay affordable at 100 TB: per sliding
  // window of w consecutive k-gram hashes keep only the minimum
  // (rightmost on ties), which guarantees any shared run of w+k−1
  // tokens still collides while storing ~2/(w+1) of the hashes. The
  // rightmost-tie argmin needs no struct fold: hashes are packed as
  // h·2²⁰ + (2²⁰−1−pos), so one array_min per window IS the tie rule,
  // and decode is exact because dividing by a power of two is lossless
  // in doubles. Hashes use the q43 polynomial fold (h < 2³⁰, so the
  // packing never overflows) — the engine-portable family, letting
  // DuckDB replay selection bit for bit. All selection is per-row
  // array arithmetic (zero shuffles); only the winnowed ~n/3
  // fingerprints explode into the corpus index, which then reduces
  // by two keyed aggregates — the scan:index ratio a production
  // fingerprint store banks on. Output per doc: gram/fingerprint
  // counts, observed density (expected ≈ 2/(w+1) = 0.333), and how
  // many of its fingerprints appear in ≥2 docs.
  def winnowing: Q = {
    val P = Dedup.PolyPrime
    Q(
      "q246_winnowing",
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
         |  WHERE len(string_split(text, ' ')) >= 8),
         |g AS (SELECT doc_id, list_transform(range(0, len(t) - 3), i ->
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split(array_to_string(t[i+1:i+4], ' '), ''),
         |        c -> CAST(ascii(c) AS BIGINT))),
         |      (h, b) -> (h * 131 + b) % $P) * 1048576
         |    + (1048575 - i)) AS enc FROM d),
         |f AS (SELECT doc_id, len(enc) AS n_grams,
         |    list_distinct(list_transform(range(0, len(enc) - 4),
         |      p -> list_min(enc[p+1:p+5]))) AS fps FROM g),
         |fph AS (SELECT DISTINCT doc_id, n_grams, e // 1048576 AS h
         |  FROM (SELECT doc_id, n_grams, UNNEST(fps) AS e FROM f)),
         |dfh AS (SELECT h, count(DISTINCT doc_id) AS df FROM fph GROUP BY h),
         |sh AS (SELECT fph.doc_id, count(*) AS n_shared
         |  FROM fph JOIN dfh ON dfh.h = fph.h AND dfh.df >= 2 GROUP BY fph.doc_id)
         |SELECT f.doc_id, CAST(f.n_grams AS BIGINT) AS n_grams,
         |  CAST(len(f.fps) AS BIGINT) AS n_fp,
         |  round(CAST(len(f.fps) AS DOUBLE) / f.n_grams, 4) AS density,
         |  COALESCE(CAST(sh.n_shared AS BIGINT), 0) AS n_shared
         |FROM f LEFT JOIN sh ON sh.doc_id = f.doc_id
         |ORDER BY f.doc_id""".stripMargin,
    ) { (s, dir) =>
      val K = 4; val W = 5; val M = 1048576L
      val toks = TextAnalysis.tokens(col("text"))
      val d = Tables.documents(s, dir)
        .filter(size(toks) >= K + W - 1)
        .select(col("doc_id"), toks.as("t"))
      val enc = transform(sequence(lit(0), size(col("t")) - K),
        i => Dedup.polyTokenHash(concat_ws(" ", slice(col("t"), i + 1, lit(K)))) * M
          + (lit(M - 1) - i))
      val f = Dedup.persistTracked(d
        .select(col("doc_id"), enc.as("enc"))
        .select(col("doc_id"), size(col("enc")).as("n_grams"),
          array_distinct(transform(sequence(lit(0), size(col("enc")) - W),
            p => array_min(slice(col("enc"), p + 1, lit(W))))).as("fps")))
      val fph = Dedup.persistTracked(
        f.select(col("doc_id"), explode(col("fps")).as("e"))
          .select(col("doc_id"), (col("e") / M).cast("long").as("h"))
          .distinct())
      val dfh = fph.groupBy("h").agg(countDistinct("doc_id").as("df"))
      val sh = fph.join(dfh.filter(col("df") >= 2), "h")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      f.select(col("doc_id"), col("n_grams").cast("long").as("n_grams"),
          size(col("fps")).cast("long").as("n_fp"))
        .join(sh, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"), col("n_fp"),
          round(col("n_fp").cast("double") / col("n_grams"), 4).as("density"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"))
        .orderBy("doc_id")
    }
  }

  // --- q260: Kendall τ-b between quality scorers -------------------------------
  // q198's Spearman ρ measures monotone agreement through ranks; τ-b
  // is the concordance view (P(concordant) − P(discordant)) with the
  // tie-corrected denominator — more robust to outlier ranks and the
  // statistic reviewers usually ask for alongside ρ. Pair counting
  // never touches doc pairs: both scores are 4-dp quantized, so all
  // O(n²) pair sums collapse onto the JOINT (sq, se) cell histogram —
  // concordant/discordant from a cell-pair join bounded by the value
  // GRID (corpus-size-independent), tie terms from the marginal
  // histograms. Products of cell counts accumulate in DECIMAL(38,0)
  // (two 100-TB cells multiply past BIGINT); the closed form moves to
  // doubles only at the end, identically in both engines, NULLing on
  // a zero-variance scorer via the 0/0 rule.
  def kendallTau: Q = {
    val stop = TextSqlFragments.stopList
    Q(
      "q260_kendall_tau",
      s"""WITH chars AS (
         |  SELECT doc_id, substring(text, CAST(i AS INTEGER), 1) AS ch
         |  FROM documents, UNNEST(range(1, len(text) + 1)) AS u(i)
         |  WHERE len(text) >= 1),
         |cc AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch),
         |cn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM cc GROUP BY doc_id),
         |ent AS (SELECT cc.doc_id, round(-CAST(sum(CAST(
         |    round((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n), 9)
         |    AS DECIMAL(18,9))) AS DOUBLE), 4) AS se
         |  FROM cc JOIN cn USING (doc_id) GROUP BY cc.doc_id),
         |qual AS (SELECT doc_id,
         |    round(${TextSqlFragments.qualitySql("string_split(text, ' ')")}, 4) AS sq
         |  FROM documents),
         |sc AS (SELECT q.doc_id, q.sq, e.se FROM qual q JOIN ent e USING (doc_id)),
         |cells AS (SELECT sq, se, count(*) AS c FROM sc GROUP BY sq, se),
         |cd AS (SELECT
         |    CAST(sum(CASE WHEN a.se < b.se
         |      THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS DOUBLE) AS conc,
         |    CAST(sum(CASE WHEN a.se > b.se
         |      THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS DOUBLE) AS disc
         |  FROM cells a JOIN cells b ON a.sq < b.sq),
         |mx AS (SELECT CAST(sum(CAST(c AS HUGEINT) * (c - 1) / 2) AS DOUBLE) AS tx
         |  FROM (SELECT sq, CAST(sum(c) AS BIGINT) AS c FROM cells GROUP BY sq)),
         |my AS (SELECT CAST(sum(CAST(c AS HUGEINT) * (c - 1) / 2) AS DOUBLE) AS ty
         |  FROM (SELECT se, CAST(sum(c) AS BIGINT) AS c FROM cells GROUP BY se)),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(count(DISTINCT (sq, se)) AS BIGINT) AS n_cells FROM sc)
         |SELECT n AS n_docs, n_cells, conc AS concordant, disc AS discordant,
         |  round((conc - disc) / sqrt((CAST(n AS DOUBLE) * (n - 1) / 2 - tx)
         |    * (CAST(n AS DOUBLE) * (n - 1) / 2 - ty)), 4) + 0.0 AS tau_b
         |FROM cd CROSS JOIN mx CROSS JOIN my CROSS JOIN nn""".stripMargin,
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val sc = Dedup.persistTracked(docs.filter(length(col("text")) >= 1)
        .select(col("doc_id"),
          round(TextAnalysis.qualityScore(col("text")), 4).as("sq"),
          round(-graft.functions.CharEntropy(col("text")).getField("negent"), 4)
            .as("se")))
      val cells = Dedup.persistTracked(
        sc.groupBy("sq", "se").agg(count(lit(1)).as("c")))
      def dprod(cond: org.apache.spark.sql.Column) =
        sum(when(cond, col("ca").cast("decimal(19,0)") * col("cb").cast("decimal(19,0)"))
          .otherwise(lit(0).cast("decimal(38,0)"))).cast("double")
      val cd = cells.select(col("sq").as("qa"), col("se").as("ea"), col("c").as("ca"))
        .join(cells.select(col("sq").as("qb"), col("se").as("eb"), col("c").as("cb")),
          col("qa") < col("qb"))
        .agg(dprod(col("ea") < col("eb")).as("conc"),
          dprod(col("ea") > col("eb")).as("disc"))
      def tieTerm(keyCol: String, out: String) =
        cells.groupBy(keyCol).agg(sum("c").cast("long").as("c"))
          .agg(sum((col("c").cast("decimal(19,0)") * (col("c") - 1) / 2)
            .cast("decimal(38,0)")).cast("double").as(out))
      val nn = sc.agg(count(lit(1)).cast("long").as("n"),
        countDistinct(col("sq"), col("se")).cast("long").as("n_cells"))
      val n0 = col("n").cast("double") * (col("n") - 1) / 2
      cd.crossJoin(broadcast(tieTerm("sq", "tx")))
        .crossJoin(broadcast(tieTerm("se", "ty")))
        .crossJoin(broadcast(nn))
        .select(col("n").as("n_docs"), col("n_cells"),
          col("conc").as("concordant"), col("disc").as("discordant"),
          znorm(round(try_divide(col("conc") - col("disc"),
            sqrt((n0 - col("tx")) * (n0 - col("ty")))), 4)).as("tau_b"))
    }
  }

  // --- q255: statistical watermark detection ---------------------------------
  // Corpora increasingly contain machine text, and green-list
  // watermarks (Kirchenbauer et al. 2023) are the detectable kind: a
  // watermarking sampler seeds a PRF with the previous token and
  // boosts a γ-fraction "green" vocabulary subset, so watermarked text
  // shows a green-token excess a one-proportion z-test exposes:
  // z = (g − γn)/√(nγ(1−γ)). The detector needs no model — only the
  // PRF — so it runs as pure per-row arithmetic: both tokens of each
  // bigram position hash through the q43 polynomial family, the
  // position is green when (h_prev·A + h_tok·B) mod P < γ·P
  // (products stay < 2⁶², no overflow in either engine), and per-doc
  // counts reduce map-side. Natural text sits near γ = 0.25 and
  // |z| small; z > 4 (the paper's operating point) flags a doc.
  // Zero shuffles beyond the per-doc aggregate; the whole detector
  // would stream over 100 TB at scan speed.
  def watermarkDetect: Q = {
    val P = Dedup.PolyPrime
    val GA = 1103578351L // seeded PRF coefficients, documented constants
    val GB = 2057594173L
    val T = 250000001L // floor(0.25 · P) + 1 boundary: green ⇔ mix < T
    val poly = (e: String) =>
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))),
         |      (h, b) -> (h * 131 + b) % $P)""".stripMargin
    Q(
      "q255_watermark_detect",
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |bg AS (SELECT doc_id, ${poly("string_split(bigram, ' ')[1]")} AS h1,
         |    ${poly("string_split(bigram, ' ')[2]")} AS h2 FROM toks,
         |  UNNEST(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
         |    AS u(bigram)
         |  WHERE len(t) >= 2),
         |g AS (SELECT doc_id, count(*) AS n,
         |    CAST(sum(CASE WHEN (h1 * $GA + h2 * $GB) % $P < $T THEN 1 ELSE 0 END)
         |      AS BIGINT) AS ng
         |  FROM bg GROUP BY doc_id)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_scored, ng AS n_green,
         |  round(CAST(ng AS DOUBLE) / n, 4) AS green_frac,
         |  round((ng - 0.25 * n) / sqrt(n * 0.25 * 0.75), 4) + 0.0 AS z,
         |  (ng - 0.25 * n) / sqrt(n * 0.25 * 0.75) > 4.0 AS flagged
         |FROM g ORDER BY doc_id""".stripMargin,
    ) { (s, dir) =>
      val toks = TextAnalysis.tokens(col("text"))
      val bg = Tables.documents(s, dir)
        .filter(size(toks) >= 2)
        .select(col("doc_id"), toks.as("t"))
        .select(col("doc_id"),
          explode(graft.functions.AdjacentPairs(col("t"))).as("b"))
        .select(col("doc_id"), Dedup.polyTokenHash(col("b.a")).as("h1"),
          Dedup.polyTokenHash(col("b.b")).as("h2"))
      val z = (col("ng") - lit(0.25) * col("n")) /
        sqrt(col("n") * lit(0.25) * lit(0.75))
      bg.groupBy("doc_id")
        .agg(count(lit(1)).as("n"),
          sum(when((col("h1") * GA + col("h2") * GB) % P < T, 1).otherwise(0))
            .cast("long").as("ng"))
        .select(col("doc_id"), col("n").as("n_scored"), col("ng").as("n_green"),
          round(col("ng").cast("double") / col("n"), 4).as("green_frac"),
          znorm(round(z, 4)).as("z"), (z > 4.0).as("flagged"))
        .orderBy("doc_id")
    }
  }

  // --- q269: LZ78 phrase compressibility filter ------------------------------
  // The compression-ratio quality gate production curators run (Dolma/
  // RedPajama filter highly-compressible pages — repeated boilerplate
  // compresses far below natural text): an exact LZ78 phrase count
  // over each document's first 240 chars, as a pure codegen'd
  // `aggregate` higher-order fold — accumulator is a delimited string
  // "(|dict|…|);current;count", one contains() per char. No UDF, no
  // explode, no shuffle before the final sort: per-row work is bounded
  // by the 240-char cap regardless of corpus size, which is exactly
  // the per-row-linear shape that survives 100 TB. DuckDB replays the
  // identical fold with list_reduce, so phrase counts are
  // bit-reproducible (prototyped against a reference Python LZ78:
  // exact match). Natural text here scores ratio ≈ 0.44-0.67; docs
  // under 0.45 are flagged repetitive. Delimiters ';'/'|' are safe:
  // the corpus charset is [a-z0-9 .,].
  def lzCompressibility: Q = Q(
    "q269_lz_compressibility",
    """WITH d AS (SELECT doc_id, substr(text, 1, 240) AS t FROM documents),
      |f AS (SELECT doc_id, t, list_reduce(list_prepend('|;;0', string_split(t, '')),
      |  (acc, c) -> CASE
      |    WHEN contains(string_split(acc, ';')[1],
      |                  '|' || string_split(acc, ';')[2] || c || '|')
      |      THEN string_split(acc, ';')[1] || ';' ||
      |           string_split(acc, ';')[2] || c || ';' || string_split(acc, ';')[3]
      |    ELSE string_split(acc, ';')[1] || string_split(acc, ';')[2] || c || '|' ||
      |         ';;' || CAST(CAST(string_split(acc, ';')[3] AS INT) + 1 AS VARCHAR)
      |  END) AS acc FROM d),
      |g AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_chars,
      |    CAST(CAST(string_split(acc, ';')[3] AS INT)
      |      + CASE WHEN string_split(acc, ';')[2] <> '' THEN 1 ELSE 0 END AS BIGINT)
      |      AS n_phrases
      |  FROM f)
      |SELECT doc_id, n_chars, n_phrases,
      |  round(CAST(n_phrases AS DOUBLE) / n_chars, 4) AS lz_ratio,
      |  round(CAST(n_phrases AS DOUBLE) / n_chars, 4) < 0.45 AS is_repetitive
      |FROM g ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    val t = substring(col("text"), 1, 240)
    val df = Tables.documents(s, dir)
      .select(col("doc_id"), length(t).cast("long").as("n_chars"),
        TextAnalysis.lzPhraseCount(col("text"), 240).cast("long").as("n_phrases"))
    val ratio = round(col("n_phrases").cast("double") / col("n_chars"), 4)
    df.select(col("doc_id"), col("n_chars"), col("n_phrases"),
        ratio.as("lz_ratio"), (ratio < 0.45).as("is_repetitive"))
      .orderBy("doc_id")
  }

  // --- q277: Flesch reading-ease profile per source ---------------------------
  // The readability member of the quality family: Flesch reading ease
  // 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words), with
  // the standard machine proxy syllables ≈ vowel groups (maximal
  // [aeiou]+ runs, counted by collapsing each run to one '@' and
  // diffing lengths — '@' is outside the corpus charset) and
  // sentences = '.' count floored at 1. Everything per-row integer
  // counting inside codegen — one scan, one sources-row aggregate.
  // Per-doc scores are 4-dp rounded into DECIMAL before the mean (the
  // dsum rule: the subtraction-built score must not be float-summed),
  // and the mean is znorm'd because the cancelling form can land on
  // ±0 for a degenerate corpus.
  def readability: Q = Q(
    "q277_readability",
    """WITH m AS (SELECT source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
      |    greatest(CAST(len(text) - len(replace(text, '.', '')) AS BIGINT), 1) AS sents,
      |    CAST(len(regexp_replace(text, '[aeiou]+', '@', 'g'))
      |      - len(replace(regexp_replace(text, '[aeiou]+', '@', 'g'), '@', ''))
      |      AS BIGINT) AS syls
      |  FROM documents),
      |f AS (SELECT source,
      |    round(206.835 - 1.015 * (CAST(words AS DOUBLE) / sents)
      |      - 84.6 * (CAST(syls AS DOUBLE) / words), 4) AS flesch
      |  FROM m)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(CAST(sum(CAST(flesch AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) + 0.0
      |    AS mean_flesch,
      |  round(CAST(sum(CASE WHEN flesch < 30.0 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 4) AS hard_share
      |FROM f GROUP BY source ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    val vg = regexp_replace(col("text"), "[aeiou]+", "@")
    val m = Tables.documents(s, dir).select(col("source"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("words"),
      greatest((length(col("text")) -
        length(regexp_replace(col("text"), "\\.", ""))).cast("long"), lit(1L))
        .as("sents"),
      (length(vg) - length(regexp_replace(vg, "@", ""))).cast("long").as("syls"))
    val f = m.select(col("source"),
      round(lit(206.835) - lit(1.015) * (col("words").cast("double") / col("sents"))
        - lit(84.6) * (col("syls").cast("double") / col("words")), 4).as("flesch"))
    f.groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        znorm(round(dsum(col("flesch"), 4) / count(lit(1)), 4)).as("mean_flesch"),
        round(sum(when(col("flesch") < 30.0, 1).otherwise(0)).cast("double")
          / count(lit(1)), 4).as("hard_share"))
      .orderBy("source")
  }

  // --- q281: positional token entropy (template-slot detection) ---------------
  // Template farms are not just repetitive overall — they are rigid
  // AT FIXED POSITIONS ("dear <name> , your <product> ..."): the token
  // distribution at position p collapses while the corpus-wide
  // distribution looks healthy. For the first 10 positions of every
  // ≥10-token doc: type count and Shannon entropy of the position's
  // token distribution. A bounded ×10 fan-out of one column feeds a
  // (position, token) keyed aggregate; entropies follow the q200
  // discipline (9-dp rounded −p·ln p terms, DECIMAL-summed) and the
  // negated sum is znorm'd (a single-type position is EXACTLY the
  // −0.0 shape rule 8 exists for).
  def positionalEntropy: Q = Q(
    "q281_positional_entropy",
    """WITH base AS (SELECT string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 10),
      |pos AS (SELECT CAST(i AS BIGINT) AS p, t[i] AS tok
      |  FROM base, UNNEST(range(1, 11)) AS u(i)),
      |pc AS (SELECT p, tok, count(*) AS c FROM pos GROUP BY p, tok),
      |pn AS (SELECT p, CAST(sum(c) AS BIGINT) AS n,
      |    CAST(count(*) AS BIGINT) AS n_types FROM pc GROUP BY p)
      |SELECT pc.p AS position, n AS n_docs, n_types,
      |  round(-CAST(sum(CAST(round((CAST(c AS DOUBLE) / n)
      |    * ln(CAST(c AS DOUBLE) / n), 9) AS DECIMAL(18,9))) AS DOUBLE), 6) + 0.0
      |    AS entropy
      |FROM pc JOIN pn USING (p) GROUP BY pc.p, n, n_types
      |ORDER BY position""".stripMargin,
  ) { (s, dir) =>
    val t = TextAnalysis.tokens(col("text"))
    val pos = Tables.documents(s, dir)
      .filter(size(t) >= 10)
      .select(t.as("t"))
      .select(explode(transform(sequence(lit(1), lit(10)),
        i => struct(i.cast("long").as("p"), element_at(col("t"), i).as("tok"))))
        .as("e"))
      .select(col("e.p"), col("e.tok"))
    val pc = pos.groupBy("p", "tok").agg(count(lit(1)).as("c"))
    val pn = pc.groupBy("p").agg(sum("c").cast("long").as("n"),
      count(lit(1)).cast("long").as("n_types"))
    val term = round((col("c").cast("double") / col("n")) *
      log(col("c").cast("double") / col("n")), 9)
    pc.join(pn, "p")
      .groupBy(col("p").as("position"), col("n").as("n_docs"), col("n_types"))
      .agg(znorm(round(-sum(term.cast("decimal(18,9)")).cast("double"), 6))
        .as("entropy"))
      .orderBy("position")
  }

  // --- q282: McNemar's test between two quality gates --------------------------
  // q226/q232 measure AGREEMENT between filters; McNemar asks the
  // sharper operational question — do the quality gate (≥0.75) and
  // the unique-token gate (≥½ distinct) DISAGREE in a biased
  // direction (one systematically stricter), from only the discordant
  // cells: χ² = (|b−c|−1)²/(b+c) with continuity correction. One scan
  // into a single 2×2 contingency row; every count exact, the one
  // division NULLs when the gates never disagree (b+c = 0).
  def mcnemarGates: Q = Q(
    "q282_mcnemar_gates",
    s"""WITH d AS (SELECT
       |    CASE WHEN round(${TextSqlFragments.qualitySql("string_split(text, ' ')")}, 4)
       |         >= 0.75 THEN 1 ELSE 0 END AS f1,
       |    CASE WHEN 2 * len(list_distinct(string_split(text, ' ')))
       |         >= len(string_split(text, ' ')) THEN 1 ELSE 0 END AS f2
       |  FROM documents),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN f1 = 1 AND f2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
       |    CAST(sum(CASE WHEN f1 = 1 AND f2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
       |    CAST(sum(CASE WHEN f1 = 0 AND f2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
       |    CAST(sum(CASE WHEN f1 = 0 AND f2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
       |  FROM d)
       |SELECT n, a, b, c, d,
       |  round(pow(abs(b - c) - 1, 2) / (b + c), 6) AS chi2,
       |  pow(abs(b - c) - 1, 2) / (b + c) > 3.841 AS significant
       |FROM m""".stripMargin,
  ) { (s, dir) =>
    val t = TextAnalysis.tokens(col("text"))
    val d = Tables.documents(s, dir).select(
      when(round(TextAnalysis.qualityScore(col("text")), 4) >= 0.75, 1)
        .otherwise(0).as("f1"),
      when(lit(2) * size(array_distinct(t)) >= size(t), 1).otherwise(0).as("f2"))
    val m = d.agg(count(lit(1)).cast("long").as("n"),
      sum(when(col("f1") === 1 && col("f2") === 1, 1).otherwise(0)).cast("long").as("a"),
      sum(when(col("f1") === 1 && col("f2") === 0, 1).otherwise(0)).cast("long").as("b"),
      sum(when(col("f1") === 0 && col("f2") === 1, 1).otherwise(0)).cast("long").as("c"),
      sum(when(col("f1") === 0 && col("f2") === 0, 1).otherwise(0)).cast("long").as("d"))
    val chi2 = try_divide(pow(abs(col("b") - col("c")) - 1, 2),
      (col("b") + col("c")).cast("double"))
    m.select(col("n"), col("a"), col("b"), col("c"), col("d"),
      round(chi2, 6).as("chi2"), (chi2 > 3.841).as("significant"))
  }

  // --- q292: Bland-Altman agreement between two continuous scorers -------------
  // κ (q226) and τ (q260) treat scorers as rankings; Bland-Altman is
  // the CONTINUOUS-agreement standard — the bias (mean of per-doc
  // score differences), the 1.96σ limits of agreement, and the share
  // of docs outside them, between the composite quality score and the
  // unique-token fraction (both on [0,1]). Differences are exact 4-dp
  // values, moments DECIMAL-summed (Σd at 4 dp, Σd² at 8 — products
  // of 4-dp values are exact there), the variance's cancelling
  // numerator and both limits are znorm'd, and the outside test
  // compares the exact d against 6-dp-rounded limits so no float
  // boundary can flip a count.
  def blandAltman: Q = Q(
    "q292_bland_altman",
    s"""WITH d0 AS MATERIALIZED (SELECT
       |    round(${TextSqlFragments.qualitySql("string_split(text, ' ')")}, 4)
       |      - round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
       |        / len(string_split(text, ' ')), 4) AS d
       |  FROM documents),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(d AS DECIMAL(18,4))) AS DOUBLE) AS sd1,
       |    CAST(sum(CAST(d * d AS DECIMAL(28,8))) AS DOUBLE) AS sd2
       |  FROM d0),
       |f AS (SELECT n, sd1 / n AS bias,
       |    sqrt((sd2 - sd1 / n * sd1) / (n - 1)) AS sd FROM m),
       |o AS (SELECT CAST(count(*) AS BIGINT) AS n_out FROM d0 CROSS JOIN f
       |  WHERE d < round(bias - 1.96 * sd, 6)
       |     OR d > round(bias + 1.96 * sd, 6))
       |SELECT n, round(bias, 6) + 0.0 AS bias, round(sd, 6) AS sd_diff,
       |  round(bias - 1.96 * sd, 6) + 0.0 AS loa_lo,
       |  round(bias + 1.96 * sd, 6) + 0.0 AS loa_hi,
       |  round(CAST(n_out AS DOUBLE) / n, 4) AS outside_share
       |FROM f CROSS JOIN o""".stripMargin,
  ) { (s, dir) =>
    val t = TextAnalysis.tokens(col("text"))
    val d0 = graft.dedup.Dedup.persistTracked(Tables.documents(s, dir)
      .select((round(TextAnalysis.qualityScore(col("text")), 4) -
        round(size(array_distinct(t)).cast("double") / size(t), 4)).as("d")))
    val m = d0.agg(count(lit(1)).cast("long").as("n"),
      sum(col("d").cast("decimal(18,4)")).cast("double").as("sd1"),
      sum((col("d") * col("d")).cast("decimal(28,8)")).cast("double").as("sd2"))
    val f = m.select(col("n"), (col("sd1") / col("n")).as("bias"),
      sqrt((col("sd2") - col("sd1") / col("n") * col("sd1")) / (col("n") - 1))
        .as("sd"))
    val outside = d0.crossJoin(broadcast(f))
      .filter(col("d") < round(col("bias") - lit(1.96) * col("sd"), 6) ||
        col("d") > round(col("bias") + lit(1.96) * col("sd"), 6))
      .agg(count(lit(1)).cast("long").as("n_out"))
    f.crossJoin(broadcast(outside))
      .select(col("n"), znorm(round(col("bias"), 6)).as("bias"),
        round(col("sd"), 6).as("sd_diff"),
        znorm(round(col("bias") - lit(1.96) * col("sd"), 6)).as("loa_lo"),
        znorm(round(col("bias") + lit(1.96) * col("sd"), 6)).as("loa_hi"),
        round(col("n_out").cast("double") / col("n"), 4).as("outside_share"))
  }

  // --- q297: code-switching / language-mix detection ---------------------------
  // q37 assigns each doc ONE language (argmax of marker counts); the
  // curation question it can't answer is "which docs MIX languages" —
  // retrieval and tokenizer quality both degrade on code-switched
  // text. Per doc: marker-hit share per language, the top and
  // second-best marker counts, and a mixed flag when the runner-up
  // holds ≥ a third of the marker mass (integer cross-multiplied, no
  // float gate). Pure per-row array counting inside codegen; one scan,
  // one per-source aggregate of mixed share. Docs with no marker hits
  // are 'und' and never flagged.
  def languageMix: Q = {
    val markersSql = TextAnalysis.LangMarkers.map { case (lang, m) =>
      lang -> m.map(w => s"'$w'").mkString(", ")
    }
    val scoreSql = markersSql.map { case (lang, lst) =>
      s"len(list_filter(t, x -> x IN ($lst))) AS s_$lang"
    }.mkString(",\n      |    ")
    Q(
      "q297_language_mix",
      s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS t
         |  FROM documents),
         |sc AS (SELECT doc_id, source,
         |    $scoreSql
         |  FROM d),
         |r AS (SELECT doc_id, source,
         |    CAST(s_en + s_es + s_de + s_fr AS BIGINT) AS hits,
         |    CAST(greatest(s_en, s_es, s_de, s_fr) AS BIGINT) AS best,
         |    CAST(s_en + s_es + s_de + s_fr
         |      - greatest(s_en, s_es, s_de, s_fr) AS BIGINT) AS rest,
         |    CAST(greatest(
         |      least(s_en, s_es), least(s_en, s_de), least(s_en, s_fr),
         |      least(s_es, s_de), least(s_es, s_fr), least(s_de, s_fr))
         |      AS BIGINT) AS second
         |  FROM sc)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN hits = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unknown,
         |  CAST(sum(CASE WHEN hits > 0 AND 3 * second >= hits THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_mixed,
         |  round(CAST(sum(CASE WHEN hits > 0 AND 3 * second >= hits THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 4) AS mixed_share
         |FROM r GROUP BY source ORDER BY source""".stripMargin,
    ) { (s, dir) =>
      val t = TextAnalysis.tokens(col("text"))
      val scores = TextAnalysis.LangMarkers.map { case (lang, m) =>
        lang -> TextAnalysis.langScore(t, m).cast("long")
      }
      val hits = scores.map(_._2).reduce(_ + _)
      val best = greatest(scores.map(_._2): _*)
      val Seq(en, es, de, fr) = scores.map(_._2)
      val second = greatest(least(en, es), least(en, de), least(en, fr),
        least(es, de), least(es, fr), least(de, fr))
      val r = Tables.documents(s, dir).select(col("source"),
        hits.as("hits"), best.as("best"), second.as("second"))
      val mixed = when(col("hits") > 0 && lit(3) * col("second") >= col("hits"), 1)
        .otherwise(0)
      r.groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("hits") === 0, 1).otherwise(0)).cast("long").as("n_unknown"),
          sum(mixed).cast("long").as("n_mixed"),
          round(sum(mixed).cast("double") / count(lit(1)), 4).as("mixed_share"))
        .orderBy("source")
    }
  }

  // --- q300: degenerate-repetition (max token run) gate -------------------------
  // The generation-loop detector: the longest run of one token
  // repeated consecutively — the signature of degenerate decoding
  // ("the the the …") that q82's n-gram repetition ratio can dilute
  // away on long docs. An exact per-row fold (the q269 `aggregate`
  // shape): accumulator "cur;len;max", one comparison per token, no
  // explode, no shuffle before the final sort — per-row-linear at any
  // corpus size, and DuckDB replays the identical list_reduce.
  def maxTokenRun: Q = Q(
    "q300_max_token_run",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |f AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok,
      |    list_reduce(list_prepend(';0;0', t), (acc, c) -> CASE
      |      WHEN string_split(acc, ';')[1] = c THEN
      |        c || ';' || CAST(CAST(string_split(acc, ';')[2] AS INT) + 1 AS VARCHAR)
      |          || ';' || CAST(greatest(CAST(string_split(acc, ';')[2] AS INT) + 1,
      |            CAST(string_split(acc, ';')[3] AS INT)) AS VARCHAR)
      |      ELSE c || ';1;' || CAST(greatest(1,
      |        CAST(string_split(acc, ';')[3] AS INT)) AS VARCHAR)
      |    END) AS acc
      |  FROM d)
      |SELECT doc_id, n_tok,
      |  CAST(CAST(string_split(acc, ';')[3] AS INT) AS BIGINT) AS max_run,
      |  CAST(string_split(acc, ';')[3] AS INT) >= 5 AS is_loopy
      |FROM f ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    val t = TextAnalysis.tokens(col("text"))
    val fold = aggregate(t, lit(";0;0"), (acc, c) => {
      val cur = element_at(split(acc, ";"), 1)
      val len = element_at(split(acc, ";"), 2).cast("int")
      val mx = element_at(split(acc, ";"), 3).cast("int")
      when(cur === c,
        concat(c, lit(";"), (len + 1).cast("string"), lit(";"),
          greatest(len + 1, mx).cast("string")))
        .otherwise(concat(c, lit(";1;"), greatest(lit(1), mx).cast("string")))
    })
    Tables.documents(s, dir)
      .select(col("doc_id"), size(t).cast("long").as("n_tok"), fold.as("acc"))
      .select(col("doc_id"), col("n_tok"),
        element_at(split(col("acc"), ";"), 3).cast("int").cast("long").as("max_run"),
        (element_at(split(col("acc"), ";"), 3).cast("int") >= 5).as("is_loopy"))
      .orderBy("doc_id")
  }

  // --- q316: canonicalization-ladder dedup accounting -----------------------
  // How many duplicates does each normalization level expose beyond
  // plain byte equality? The industry fuzzy-exact dedup recipe
  // (RefinedWeb/Dolma) hashes a CANONICALIZED body: casefold, strip
  // punctuation, collapse whitespace; a stricter rung sorts the token
  // bag (catches shuffled boilerplate). Per source: distinct-content
  // counts at each rung of the ladder plus the increments — the
  // accounting that decides whether the cheap canonical pass is worth
  // scheduling before the n-gram machinery. All three distinct counts
  // run in ONE aggregate over fixed-width (xxhash64, length) keys (the
  // q39 contract: the shuffle compares 12-byte keys, never document
  // bodies; the ORACLE counts distinct raw strings, so agreeing with
  // it demonstrates collision-free equivalence at this SF). The corpus
  // generator emits lowercase-alnum text, so `canon_extra` is zero
  // here — the rungs are exercised on punctuated fixtures in
  // CanonDedupSpec; zero increments still hash-check the plumbing.
  def canonDedupLadder: Q = Q(
    "q316_canon_dedup_ladder",
    """WITH c AS (SELECT source, text,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
      |                        ' +', ' ', 'g')) AS canon,
      |    array_to_string(list_sort(string_split(text, ' ')), ' ') AS bag
      |  FROM documents)
      |SELECT source, count(*) AS n_docs,
      |  count(DISTINCT text) AS d_raw,
      |  count(DISTINCT canon) AS d_canon,
      |  count(DISTINCT bag) AS d_bag,
      |  count(DISTINCT text) - count(DISTINCT canon) AS canon_extra,
      |  count(DISTINCT text) - count(DISTINCT bag) AS bag_extra
      |FROM c GROUP BY source ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    val canon = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    val bag = array_join(array_sort(TextAnalysis.tokens(col("text"))), " ")
    def key(c: org.apache.spark.sql.Column) = struct(xxhash64(c), length(c))
    Tables.documents(s, dir)
      .select(col("source"), key(col("text")).as("kr"), key(canon).as("kc"),
        key(bag).as("kb"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("kr")).as("d_raw"),
        countDistinct(col("kc")).as("d_canon"),
        countDistinct(col("kb")).as("d_bag"))
      .select(col("source"), col("n_docs"), col("d_raw"), col("d_canon"),
        col("d_bag"), (col("d_raw") - col("d_canon")).as("canon_extra"),
        (col("d_raw") - col("d_bag")).as("bag_extra"))
      .orderBy("source")
  }

  // --- q317: cross-source duplicate attribution matrix ----------------------
  // WHERE do the exact duplicates come from — mirrored content between
  // feeds (cross-source pairs) or re-crawls within one feed
  // (intra-source pairs)? q114 measures shingle-level source overlap
  // pre-dedup; this attributes the byte-identical duplicate mass q39
  // actually removes. Per exact-dup group (the q39 (xxhash64, len)
  // key), per-source copy counts c_s collapse the group to a
  // ≤|sources|-row profile; pair mass between source rows is closed-
  // form (c_a·c_b cross, C(c,2) within) — the sources²-bounded keyed
  // self-join on the group key, NEVER a copies² doc-level pair join
  // (a boilerplate group with 10⁶ copies contributes |sources|² rows,
  // not 10¹²). The full source×source axis emits zeros so a dup-free
  // corpus still reports (this one is dup-free at sf0.01 — the dup
  // path is exercised at sf0.1 and on the duplicated hot corpus).
  def dupSourceMatrix: Q = Q(
    "q317_dup_source_matrix",
    """WITH g AS (SELECT text, source, count(*) AS c FROM documents
      |           GROUP BY text, source),
      |tot AS (SELECT text, sum(c) AS n FROM g GROUP BY text),
      |dup AS (SELECT g.text, g.source, g.c FROM g JOIN tot ON g.text = tot.text
      |        WHERE tot.n >= 2),
      |cross_p AS (SELECT a.source AS source_a, b.source AS source_b,
      |         CAST(sum(a.c * b.c) AS BIGINT) AS n_pairs,
      |         count(*) AS n_groups
      |       FROM dup a JOIN dup b ON a.text = b.text AND a.source < b.source
      |       GROUP BY 1, 2),
      |within AS (SELECT source AS source_a, source AS source_b,
      |         CAST(sum(c * (c - 1) / 2) AS BIGINT) AS n_pairs,
      |         count(*) AS n_groups
      |       FROM dup WHERE c >= 2 GROUP BY 1, 2),
      |m AS (SELECT * FROM cross_p UNION ALL SELECT * FROM within),
      |srcs AS (SELECT DISTINCT source FROM documents),
      |axis AS (SELECT a.source AS source_a, b.source AS source_b
      |         FROM srcs a JOIN srcs b ON a.source <= b.source)
      |SELECT axis.source_a, axis.source_b,
      |  CAST(COALESCE(m.n_pairs, 0) AS BIGINT) AS n_dup_pairs,
      |  CAST(COALESCE(m.n_groups, 0) AS BIGINT) AS n_groups
      |FROM axis LEFT JOIN m
      |  ON m.source_a = axis.source_a AND m.source_b = axis.source_b
      |ORDER BY axis.source_a, axis.source_b""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val g = docs.groupBy(xxhash64(col("text")).as("th"),
        length(col("text")).as("tl"), col("source"))
      .agg(count(lit(1)).as("c"))
    val dup = Dedup.persistTracked {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("th", "tl")
      g.withColumn("n", sum(col("c")).over(w)).filter(col("n") >= 2).drop("n")
    }
    val crossP = dup.as("a").join(dup.as("b"),
        col("a.th") === col("b.th") && col("a.tl") === col("b.tl") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(sum(col("a.c") * col("b.c")).cast("long").as("n_pairs"),
        count(lit(1)).as("n_groups"))
    val within = dup.filter(col("c") >= 2)
      .groupBy(col("source").as("source_a"))
      .agg(sum(col("c") * (col("c") - 1) / 2).cast("long").as("n_pairs"),
        count(lit(1)).as("n_groups"))
      .select(col("source_a"), col("source_a").as("source_b"),
        col("n_pairs"), col("n_groups"))
    val m = crossP.unionByName(within)
    val srcs = docs.select("source").distinct()
    val axis = srcs.as("a").join(srcs.as("b"), col("a.source") <= col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"))
    axis.join(m, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        coalesce(col("n_pairs"), lit(0L)).as("n_dup_pairs"),
        coalesce(col("n_groups"), lit(0L)).as("n_groups"))
      .orderBy("source_a", "source_b")
  }
}

/** SQL fragments shared by Text-family oracles. */
private[queries] object TextSqlFragments {
  private def stopSql = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  /** The stopword list as a SQL IN-list body. */
  def stopList: String = stopSql

  /** q36's composite quality score over a string_split list column. */
  def qualitySql(toks: String): String =
    s"least(1.0, CAST(len($toks) AS DOUBLE) / 50.0) * 0.5 " +
      s"+ (1.0 - CAST(len(list_filter($toks, x -> x IN ($stopSql))) AS DOUBLE) / len($toks)) * 0.5"
}
