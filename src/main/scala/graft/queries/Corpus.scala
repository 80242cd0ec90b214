package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Corpus-shaping operators a training-data pipeline runs between
  * dedup and shard writing: chunking long documents into overlapping
  * token windows, corpus-frequency boilerplate detection, n-gram
  * vocabulary building, and template (shared-prefix) auditing. All
  * pure relational plans: per-row array expressions feed keyed
  * aggregations — no UDF, no driver-side iteration, nothing that
  * wouldn't scale to a 1000-executor cluster.
  */
object Corpus {

  val all: Seq[Q] = Seq(chunkOverlap, boilerplateNgrams, ngramVocab, prefixGroups,
    sourceOverlap, bigramLogprob, pmiCooccur, sequencePack, zipfSlope, heapsGrowth,
    skipgramPairs, vocabKlDrift, vocabCoverageCurve, cdcChunks, goodTuring,
    tokenBurstiness, batchNovelty, sourceMinhash, knBigramLm, captureRecapture,
    hillTailIndex, selfOverlapDiversity, jsDivergencePairs, tokenLorenz,
    bigramRedundancy, deletedInterpolation, burrowsDelta, noveltyCurve,
    sourceQualityDrift, mooreLewis, kmvSketchOverlap, cmsHeavyHitters,
    logbinQuantiles)

  // --- q162: Zipf rank-frequency slope -------------------------------------
  // The corpus-health power-law audit: natural text shows ln(tf) ≈
  // intercept + slope·ln(rank) with slope ≈ −1; template-heavy or
  // synthetic corpora bend the curve. One keyed term-frequency
  // aggregate, a bounded top-100 TakeOrderedAndProject (the window
  // that assigns ranks runs over those 100 rows, never the
  // vocabulary), then the q117/q133 least-squares idiom: ln terms
  // rounded to 9dp and moment sums DECIMAL-cast so the regression
  // inputs are associative-exact; the closed-form slope/intercept is
  // straight-line arithmetic on bit-identical doubles.
  def zipfSlope: Q = Q(
    "q162_zipf_slope",
    """WITH tf AS (SELECT tok, count(*) AS tf FROM
      |    (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY tok),
      |top AS (SELECT tok, tf FROM tf ORDER BY tf DESC, tok LIMIT 100),
      |rk AS (SELECT tf, row_number() OVER (ORDER BY tf DESC, tok) AS rank FROM top),
      |pts AS (SELECT round(ln(CAST(rank AS DOUBLE)), 9) AS x,
      |               round(ln(CAST(tf AS DOUBLE)), 9) AS y FROM rk),
      |m AS (SELECT count(*) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(18,9))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS DECIMAL(18,9))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(round(x * y, 9) AS DECIMAL(18,9))) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(round(x * x, 9) AS DECIMAL(18,9))) AS DOUBLE) AS sxx
      |  FROM pts)
      |SELECT CAST(n AS BIGINT) AS n_points,
      |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0 AS slope,
      |  round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6) + 0.0 AS intercept
      |FROM m""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(s, dir)
      .select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("tf"))
    val top = tf.orderBy(col("tf").desc, col("tok")).limit(100)
    val pts = top
      .withColumn("rank", row_number().over(Window.orderBy(col("tf").desc, col("tok"))))
      .select(round(log(col("rank").cast("double")), 9).as("x"),
        round(log(col("tf").cast("double")), 9).as("y"))
    val m = pts.agg(count(lit(1)).as("n"), dsum(col("x"), 9).as("sx"),
      dsum(col("y"), 9).as("sy"), dsum(round(col("x") * col("y"), 9), 9).as("sxy"),
      dsum(round(col("x") * col("x"), 9), 9).as("sxx"))
    val slope = try_divide(col("n") * col("sxy") - col("sx") * col("sy"),
      col("n") * col("sxx") - col("sx") * col("sx"))
    m.select(col("n").as("n_points"), znorm(round(slope, 6)).as("slope"),
      znorm(round((col("sy") - slope * col("sx")) / col("n"), 6)).as("intercept"))
  }

  // --- q153: concat-and-chunk sequence packing -----------------------------
  // The packing LLM pretraining actually uses: per source stream, all
  // documents are conceptually concatenated into one token stream and
  // cut into fixed 64-token training sequences; a document may span a
  // sequence boundary (unlike q73, where a doc belongs to exactly one
  // shard). Per-doc [start, end) offsets come from ONE running-sum
  // window partitioned by source — the window state is bounded per
  // source stream and sources pack in parallel, so there is no global
  // ORDER BY serializing the corpus through a single task. The
  // boundary expansion is a per-row `sequence` explode whose fan-out
  // is ceil(ntok/L)+1 per doc — bounded by doc length, never by
  // corpus size. Output: per-sequence composition (how many docs, how
  // many tokens carried over a boundary) — the packing-efficiency
  // audit run before writing training shards.
  def sequencePack: Q = {
    val L = 64
    Q(
      "q153_sequence_pack",
      s"""WITH d AS (SELECT doc_id, source, len(string_split(text, ' ')) AS ntok FROM documents),
         |c AS (SELECT doc_id, source, ntok,
         |        CAST(sum(ntok) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS cum
         |      FROM d),
         |s AS (SELECT source, doc_id, cum - ntok AS st, cum AS en FROM c),
         |x AS (SELECT source, doc_id, st, en,
         |        unnest(range(st // $L, (en - 1) // $L + 1)) AS seq_id FROM s
         |      WHERE en > st)
         |SELECT source, seq_id,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(least(en, (seq_id + 1) * $L) - greatest(st, seq_id * $L)) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
         |  CAST(count(CASE WHEN st < seq_id * $L THEN 1 END) AS BIGINT) AS n_carried
         |FROM x GROUP BY source, seq_id
         |ORDER BY source, seq_id""".stripMargin,
    ) { (s, dir) =>
      val w = Window.partitionBy("source").orderBy("doc_id")
      val offsets = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), size(toks).cast("long").as("ntok"))
        .withColumn("cum", sum("ntok").over(w))
        .select(col("source"), col("doc_id"),
          (col("cum") - col("ntok")).as("st"), col("cum").as("en"))
      offsets
        // en == st (an empty doc landing exactly on a block boundary)
        // would make sequence() emit a DESCENDING 2-element range where
        // DuckDB's range() returns empty — guard so both engines agree
        // if tokenization ever yields zero tokens
        .filter(col("en") > col("st"))
        .select(col("source"), col("doc_id"), col("st"), col("en"),
          explode(sequence(expr(s"st div $L"), expr(s"(en - 1) div $L"))).as("seq_id"))
        .groupBy("source", "seq_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(least(col("en"), (col("seq_id") + 1) * L)
            - greatest(col("st"), col("seq_id") * L)).as("n_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"),
          count(when(col("st") < col("seq_id") * L, 1)).as("n_carried"))
        .orderBy("source", "seq_id")
    }
  }

  // --- q127: PMI term co-occurrence (phrase/collocation mining) ------------
  // The word2vec-preprocessing signal: which vocabulary terms co-occur
  // in the same document far more than independence predicts. The
  // all-pairs trap is avoided the inverted-index way: pairs are
  // generated ONLY by a self-join keyed on doc_id AFTER restricting to
  // a bounded top-60 df vocabulary, so per-doc fan-out is ≤ C(60,2)
  // regardless of corpus size, and the vocab (bounded by construction)
  // broadcasts. The distinct-token explode is persisted once and
  // feeds both the df table and the pair join.
  def pmiCooccur: Q = Q(
    "q127_pmi_cooccur",
    """WITH raw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tok AS (SELECT DISTINCT doc_id, tok FROM raw),
      |dft AS (SELECT tok, count(*) AS df FROM tok GROUP BY tok),
      |vocab AS (SELECT tok, df FROM dft ORDER BY df DESC, tok LIMIT 60),
      |vt AS (SELECT t.doc_id, t.tok, v.df FROM tok t JOIN vocab v USING (tok)),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |p AS (SELECT a.tok AS tok_a, b.tok AS tok_b, a.df AS df_a, b.df AS df_b
      |      FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.tok < b.tok)
      |SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS df_ab,
      |  round(ln(CAST(count(*) * (SELECT n_docs FROM n) AS DOUBLE)
      |           / CAST(max(df_a) * max(df_b) AS DOUBLE)), 6) AS pmi
      |FROM p GROUP BY tok_a, tok_b
      |ORDER BY df_ab DESC, tok_a, tok_b LIMIT 40""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val tokens = graft.dedup.Dedup.persistTracked(
      docs.select(col("doc_id"), explode(array_distinct(toks)).as("tok")))
    val vocab = tokens.groupBy("tok").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok")).limit(60)
    val vt = tokens.join(broadcast(vocab), "tok")
    val pairs = vt.select(col("doc_id"), col("tok").as("tok_a"), col("df").as("df_a"))
      .join(vt.select(col("doc_id"), col("tok").as("tok_b"), col("df").as("df_b")),
        Seq("doc_id"))
      .filter(col("tok_a") < col("tok_b"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    pairs.groupBy("tok_a", "tok_b")
      .agg(count(lit(1)).as("df_ab"), max("df_a").as("df_a"), max("df_b").as("df_b"))
      .crossJoin(broadcast(nDocs))
      .select(col("tok_a"), col("tok_b"), col("df_ab"),
        round(log((col("df_ab") * col("n_docs")).cast("double")
          / (col("df_a") * col("df_b")).cast("double")), 6).as("pmi"))
      .orderBy(col("df_ab").desc, col("tok_a"), col("tok_b")).limit(40)
  }

  // --- q118: corpus bigram-LM fluency score -----------------------------------
  // Per-doc mean bigram log-probability under the corpus's own MLE
  // bigram model — the KenLM-shaped quality signal (gibberish and
  // boilerplate-mangled docs score low; every bigram exists in the
  // model because the corpus contains the doc, so MLE needs no
  // smoothing here). Three keyed aggregates off ONE persisted bigram
  // explode (occurrences, c2 by bigram, c1 by prefix), then two
  // joins back — UNhinted, because a corpus-scale bigram vocabulary
  // is NOT safely broadcastable (it grows near-linearly with corpus
  // size); AQE broadcasts when it fits and shuffles on the key when
  // it doesn't. ln terms are rounded to 9dp and summed as DECIMAL so
  // the per-doc mean is associative-exact (the repo's
  // never-sum-raw-doubles rule).
  def bigramLogprob: Q = Q(
    "q118_bigram_logprob",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (SELECT doc_id, bigram, string_split(bigram, ' ')[1] AS w1 FROM toks,
      |       UNNEST(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS u(bigram)
      |       WHERE len(t) >= 2),
      |c2 AS (SELECT bigram, count(*) AS n2 FROM bg GROUP BY 1),
      |c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY 1)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  round(CAST(sum(CAST(round(ln(CAST(n2 AS DOUBLE) / n1), 9) AS DECIMAL(18,9))) AS DOUBLE)
      |    / count(*), 6) AS avg_logprob
      |FROM bg JOIN c2 USING (bigram) JOIN c1 USING (w1)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
  ) { (s, dir) =>
    graft.text.Keywords.bigramLogProb(Tables.documents(s, dir), "doc_id", "text")
      .orderBy("doc_id")
  }

  // --- q114: cross-source shingle-overlap matrix -----------------------------
  // Pairwise source similarity (shared distinct 3-gram shingles +
  // Jaccard) — the corpus diagnostic that says which crawls/feeds
  // duplicate each other before any doc-level dedup runs. The
  // inverted-index shape: distinct (source, shingle) rows meet on the
  // shingle key, so per-shingle fan-out is bounded by #sources², never
  // #docs² (at 100 TB sources are dozens, shingles billions — the join
  // is keyed and the matrix output is tiny). Pairs sharing zero
  // shingles are absent by construction. At real scale the shingle key
  // would be its 8-byte hash (the q40 trick); strings here keep the
  // oracle byte-identical.
  def sourceOverlap: Q = Q(
    "q114_source_overlap",
    """WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT source, shingle FROM toks,
      |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
      |       WHERE len(t) >= 3),
      |sizes AS (SELECT source, count(*) AS sz FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
      |  FROM sh a JOIN sh b USING (shingle)
      |  WHERE a.source < b.source GROUP BY 1, 2)
      |SELECT src_a, src_b, CAST(n_shared AS BIGINT) AS n_shared,
      |  round(CAST(n_shared AS DOUBLE) / (sa.sz + sb.sz - n_shared), 6) AS jaccard
      |FROM inter JOIN sizes sa ON inter.src_a = sa.source
      |           JOIN sizes sb ON inter.src_b = sb.source
      |ORDER BY src_a, src_b""".stripMargin,
  ) { (s, dir) =>
    val sh = graft.dedup.Dedup.persistTracked(
      graft.dedup.Dedup.shingleTable(
        Tables.documents(s, dir).select(col("source"), col("text")), "source", "text")
        .distinct()) // three consumers: sizes + both join sides
    val sizes = sh.groupBy("source").agg(count(lit(1)).as("sz"))
    val a = sh.select(col("source").as("src_a"), col("shingle"))
    val b = sh.select(col("source").as("src_b"), col("shingle"))
    a.join(b, "shingle").filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes.toDF("src_a", "sza")), "src_a")
      .join(broadcast(sizes.toDF("src_b", "szb")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_shared"),
        round(col("n_shared").cast("double")
          / (col("sza") + col("szb") - col("n_shared")), 6).as("jaccard"))
      .orderBy("src_a", "src_b")
  }

  // --- q192: Heaps-law vocabulary growth ----------------------------------
  // How fast does the vocabulary grow as the corpus grows? Natural
  // corpora follow Heaps' law V = K·T^β with β ≈ 0.4–0.6; a flattening
  // curve (β→0) means new data is rehashing the same vocabulary —
  // the corpus-acquisition stopping signal. Measured at 7 exponential
  // doc-id checkpoints, NOT with a corpus-length running window: a
  // token's contribution to checkpoint v is `first_occurrence ≤
  // cutoff`, so the whole curve is one first-occurrence aggregate
  // (min doc_id per token) joined against a 7-row broadcast — no
  // single-partition prefix scan over the corpus. The β fit is the
  // q162 ln-ln least-squares idiom (9-dp terms, DECIMAL moments).
  def heapsGrowth: Q = Q(
    "q192_heaps_growth",
    """WITH fracs AS (SELECT unnest([0.015625, 0.03125, 0.0625, 0.125, 0.25, 0.5, 1.0])
      |    AS frac),
      |maxd AS (SELECT max(doc_id) AS maxd FROM documents),
      |cut AS (SELECT frac, CAST(ceil(frac * maxd) AS BIGINT) AS cutoff
      |        FROM fracs CROSS JOIN maxd),
      |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |fo AS (SELECT tok, min(doc_id) AS first_doc FROM tok GROUP BY tok),
      |dtok AS (SELECT doc_id, count(*) AS ntok FROM tok GROUP BY doc_id),
      |vat AS (SELECT frac, cutoff, count(*) AS vocab FROM cut
      |        JOIN fo ON fo.first_doc <= cut.cutoff GROUP BY frac, cutoff),
      |tat AS (SELECT frac, CAST(sum(ntok) AS BIGINT) AS n_tokens FROM cut
      |        JOIN dtok ON dtok.doc_id <= cut.cutoff GROUP BY frac),
      |pts AS (SELECT frac, cutoff, n_tokens, vocab,
      |    round(ln(CAST(n_tokens AS DOUBLE)), 9) AS x,
      |    round(ln(CAST(vocab AS DOUBLE)), 9) AS y
      |  FROM vat JOIN tat USING (frac)),
      |m AS (SELECT count(*) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(18,9))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS DECIMAL(18,9))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(round(x * y, 9) AS DECIMAL(18,9))) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(round(x * x, 9) AS DECIMAL(18,9))) AS DOUBLE) AS sxx
      |  FROM pts)
      |SELECT frac, cutoff AS cutoff_doc, n_tokens, CAST(vocab AS BIGINT) AS vocab,
      |  round((m.n * sxy - sx * sy) / (m.n * sxx - sx * sx), 6) + 0.0 AS beta
      |FROM pts CROSS JOIN m
      |ORDER BY frac""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val tok = graft.dedup.Dedup.persistTracked(
      docs.select(col("doc_id"), explode(toks).as("tok")))
    val maxd = docs.agg(max(col("doc_id")).as("maxd"))
    val fracs = Seq(0.015625, 0.03125, 0.0625, 0.125, 0.25, 0.5, 1.0)
    val cut = maxd.select(explode(lit(fracs.toArray)).as("frac"), col("maxd"))
      .select(col("frac"), ceil(col("frac") * col("maxd")).cast("long").as("cutoff"))
    val fo = tok.groupBy("tok").agg(min(col("doc_id")).as("first_doc"))
    val dtok = tok.groupBy("doc_id").agg(count(lit(1)).as("ntok"))
    val vat = fo.join(broadcast(cut), col("first_doc") <= col("cutoff"))
      .groupBy("frac", "cutoff").agg(count(lit(1)).as("vocab"))
    val tat = dtok.join(broadcast(cut), col("doc_id") <= col("cutoff"))
      .groupBy("frac").agg(sum(col("ntok")).as("n_tokens"))
    val pts = vat.join(tat, "frac")
      .withColumn("x", round(log(col("n_tokens").cast("double")), 9))
      .withColumn("y", round(log(col("vocab").cast("double")), 9))
    val m = pts.agg(count(lit(1)).as("n"), dsum(col("x"), 9).as("sx"),
      dsum(col("y"), 9).as("sy"), dsum(round(col("x") * col("y"), 9), 9).as("sxy"),
      dsum(round(col("x") * col("x"), 9), 9).as("sxx"))
    pts.crossJoin(broadcast(m))
      .select(col("frac"), col("cutoff").as("cutoff_doc"), col("n_tokens"), col("vocab"),
        znorm(round(try_divide(col("n") * col("sxy") - col("sx") * col("sy"),
          col("n") * col("sxx") - col("sx") * col("sx")), 6)).as("beta"))
      .orderBy("frac")
  }

  // --- q194: skip-gram training-pair counts --------------------------------
  // The word2vec/GloVe preprocessing step: (center, context) pair
  // counts within a FORWARD 2-token window (offsets +1/+2 only — the
  // symmetric ±2 convention is this table plus its transpose, so the
  // forward counts carry the same information at half the rows). NOT
  // a per-doc self-join on
  // doc_id (quadratic in doc length) — each position pairs with
  // exactly the positions offset by 1 and 2, so the offsets explode
  // (×2) and the match is a pure equi-join on (doc_id, target
  // position): linear in corpus tokens, shuffle keyed on (doc,
  // position). Distinct from q127's PMI, which counts doc-level
  // co-presence with no positional window. Top-50 by count via
  // TakeOrderedAndProject keeps the output report-sized; full pair
  // table is the unsorted intermediate a trainer would consume.
  def skipgramPairs: Q = Q(
    "q194_skipgram_pairs",
    """WITH pos AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS i, t[i] AS tok
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |       UNNEST(range(1, len(t) + 1)) AS u(i)),
      |pairs AS (
      |  SELECT a.tok AS center, b.tok AS context, count(*) AS cnt
      |  FROM pos a JOIN pos b
      |    ON a.doc_id = b.doc_id AND (b.i = a.i + 1 OR b.i = a.i + 2)
      |  GROUP BY a.tok, b.tok)
      |SELECT center, context, CAST(cnt AS BIGINT) AS cnt FROM pairs
      |ORDER BY cnt DESC, center, context LIMIT 50""".stripMargin,
  ) { (s, dir) =>
    val pos = graft.dedup.Dedup.persistTracked(Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(toks).as(Seq("p", "tok")))
      .select(col("doc_id"), (col("p") + 1).cast("long").as("i"), col("tok")))
    val offsets = explode(lit(Array(1L, 2L))).as("d")
    val centers = pos.select(col("doc_id"), col("i"), col("tok").as("center"), offsets)
      .withColumn("j", col("i") + col("d"))
    centers.join(pos.select(col("doc_id"), col("i").as("j"), col("tok").as("context")),
        Seq("doc_id", "j"))
      .groupBy("center", "context").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("center"), col("context"))
      .limit(50)
  }

  // --- q196: per-source vocabulary KL drift --------------------------------
  // Which source's token distribution diverges from the corpus — the
  // lexical counterpart of q193's embedding-space drift and q147's
  // numeric PSI. KL(source ‖ corpus) over the top-500 corpus
  // vocabulary plus one OTHER bucket holding the tail mass, add-one
  // smoothed so every term is finite. The bucketing is what makes it
  // a 100-TB plan: the support is the BOUNDED broadcast vocab (never
  // the open vocabulary), the per-source grid is |sources|×(V+1) rows
  // — linear in sources — and all corpus-scale work is the one token
  // explode feeding keyed counts. Terms 9-dp rounded before DECIMAL
  // sums (the q162 idiom).
  def vocabKlDrift: Q = Q(
    "q196_vocab_kl_drift",
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
      |ctf AS (SELECT tok, count(*) AS tf FROM tok GROUP BY tok),
      |vocab AS (SELECT tok, tf FROM ctf ORDER BY tf DESC, tok LIMIT 500),
      |v AS (SELECT count(*) AS v, CAST(sum(tf) AS BIGINT) AS in_vocab FROM vocab),
      |n AS (SELECT count(*) AS n FROM tok),
      |ns AS (SELECT source, count(*) AS ns FROM tok GROUP BY source),
      |csv AS (SELECT t.source, t.tok, count(*) AS c FROM tok t
      |        JOIN vocab USING (tok) GROUP BY t.source, t.tok),
      |grid AS (SELECT s.source, vb.tok,
      |         coalesce(csv.c, 0) AS c, vb.tf AS cq
      |  FROM (SELECT DISTINCT source FROM documents) s
      |  CROSS JOIN vocab vb
      |  LEFT JOIN csv ON csv.source = s.source AND csv.tok = vb.tok),
      |invs AS (SELECT source, CAST(sum(c) AS BIGINT) AS in_s FROM grid GROUP BY source),
      |buckets AS (
      |  SELECT source, tok, c, cq FROM grid
      |  UNION ALL
      |  SELECT ns.source, 'OTHER' AS tok, ns.ns - invs.in_s AS c,
      |         n.n - v.in_vocab AS cq
      |  FROM ns JOIN invs USING (source) CROSS JOIN n CROSS JOIN v),
      |terms AS (SELECT b.source,
      |    round(((b.c + 1.0) / (ns.ns + v.v + 1.0))
      |      * ln(((b.c + 1.0) / (ns.ns + v.v + 1.0))
      |          / ((b.cq + 1.0) / (n.n + v.v + 1.0))), 9) AS t
      |  FROM buckets b JOIN ns ON ns.source = b.source CROSS JOIN n CROSS JOIN v)
      |SELECT source,
      |  CAST((SELECT ns FROM ns WHERE ns.source = terms.source) AS BIGINT) AS n_tokens,
      |  round(CAST(sum(CAST(t AS DECIMAL(18,9))) AS DOUBLE), 6) AS kl_nats
      |FROM terms GROUP BY source ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    val tok = graft.dedup.Dedup.persistTracked(Tables.documents(s, dir)
      .select(col("source"), explode(toks).as("tok")))
    val vocab = tok.groupBy("tok").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("tok")).limit(500)
    val v = vocab.agg(count(lit(1)).as("v"), sum(col("tf")).as("in_vocab"))
    val n = tok.agg(count(lit(1)).as("n"))
    val ns = tok.groupBy("source").agg(count(lit(1)).as("ns"))
    val csv = tok.join(broadcast(vocab.select("tok")), "tok")
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val grid = Tables.documents(s, dir).select("source").distinct()
      .crossJoin(broadcast(vocab.select(col("tok"), col("tf").as("cq"))))
      .join(csv, Seq("source", "tok"), "left_outer")
      .select(col("source"), col("tok"), coalesce(col("c"), lit(0L)).as("c"), col("cq"))
    val invs = grid.groupBy("source").agg(sum(col("c")).as("in_s"))
    val other = ns.join(invs, "source").crossJoin(broadcast(n)).crossJoin(broadcast(v))
      .select(col("source"), lit("OTHER").as("tok"),
        (col("ns") - col("in_s")).as("c"), (col("n") - col("in_vocab")).as("cq"))
    val buckets = grid.unionByName(other)
    val p = (col("c") + 1.0) / (col("ns") + col("v") + 1.0)
    val q = (col("cq") + 1.0) / (col("n") + col("v") + 1.0)
    buckets.join(ns, "source").crossJoin(broadcast(n)).crossJoin(broadcast(v))
      .select(col("source"), col("ns"), round(p * log(p / q), 9).as("t"))
      .groupBy("source")
      .agg(max(col("ns")).as("n_tokens"), round(dsum(col("t"), 9), 6).as("kl_nats"))
      .orderBy("source")
  }

  /** Whitespace token array — the corpus's tokenization unit (matches
    * DuckDB `string_split(text, ' ')` exactly, including empty-string
    * artifacts, so oracle hashes agree byte for byte).
    */
  private def toks: Column = split(col("text"), " ")

  /** All word n-grams of `w` as strings: positions 1..n-(width-1),
    * each joined with single spaces. Empty when the doc is shorter
    * than `width` (explicit guard: Spark `sequence(1, 0)` counts DOWN,
    * unlike DuckDB's empty `generate_series(1, 0)`).
    */
  private def ngrams(w: Column, width: Int): Column =
    // compiled n-gram builder (graft.functions.WordNGrams): same
    // strings, and short docs yield an EMPTY array exactly like the
    // old `when(size >= width, ...)` guard — both callers explode, so
    // NULL-text rows (null in, null out) also still contribute zero
    // rows, matching the old guard's empty-array branch
    graft.functions.WordNGrams(w, width, distinct = false)

  // --- q85: overlapping token-window chunking ------------------------------
  // Long documents become training samples as fixed token windows with
  // overlap (window 32, stride 24 → 8-token overlap carries context
  // across boundaries). chunk_id i covers tokens [i·24, i·24+32);
  // chunk count = ceil((n-32)/24)+1, minimum one chunk per doc. Pure
  // per-row explode — no shuffle before the output sort, the same
  // embarrassingly-parallel shape as q72 sampling: at 100 TB this is
  // a map-only pass.
  def chunkOverlap: Q = Q(
    "q85_chunk_overlap",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |c AS (SELECT doc_id, w,
      |        unnest(generate_series(0, CASE WHEN len(w) <= 32 THEN 0
      |          ELSE CAST(ceil((len(w) - 32) / 24.0) AS BIGINT) END)) AS chunk_id
      |      FROM t)
      |SELECT doc_id, chunk_id,
      |  array_to_string(w[chunk_id*24 + 1 : chunk_id*24 + 32], ' ') AS chunk_text,
      |  CAST(least(32, len(w) - chunk_id*24) AS BIGINT) AS n_chunk_tokens
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), toks.as("w"))
      .withColumn("n", size(col("w")).cast("long"))
      .withColumn("chunk_id", explode(sequence(lit(0L),
        when(col("n") <= 32, lit(0L))
          .otherwise(ceil((col("n") - 32).cast("double") / 24.0).cast("long")))))
      .select(col("doc_id"), col("chunk_id"),
        array_join(slice(col("w"), (col("chunk_id") * 24 + 1).cast("int"), lit(32)), " ")
          .as("chunk_text"),
        least(lit(32L), col("n") - col("chunk_id") * 24).as("n_chunk_tokens"))
      .orderBy("doc_id", "chunk_id")
  }

  // --- q86: corpus-frequency boilerplate detection -------------------------
  // A trigram appearing in ≥5 distinct documents is boilerplate
  // (header/footer/template debris — the CCNet/RefinedWeb shape, with
  // word n-grams standing in for lines since this corpus has none).
  // Per-doc output: total grams and how many are boilerplate — the
  // signal a quality gate thresholds on. Two keyed aggregations and
  // one keyed join; gram join keys are 8-byte xxhash64 like the whole
  // dedup family (document frequency per HASHED gram — a collision at
  // warehouse scale shifts one count by one, which is noise for a
  // boilerplate threshold; the ORACLE joins on gram text and agreeing
  // with it at sf0.01 demonstrates collision-free equivalence).
  def boilerplateNgrams: Q = Q(
    "q86_boilerplate_ngrams",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM t),
      |gg AS (SELECT doc_id, array_to_string(w[i : i+2], ' ') AS g FROM g),
      |df AS (SELECT g, count(DISTINCT doc_id) AS df FROM gg GROUP BY g),
      |b AS (SELECT g FROM df WHERE df >= 5),
      |pd AS (SELECT gg.doc_id, count(*) AS n_grams,
      |         CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
      |       FROM gg LEFT JOIN b ON gg.g = b.g GROUP BY gg.doc_id)
      |SELECT d.doc_id, CAST(COALESCE(pd.n_grams, 0) AS BIGINT) AS n_grams,
      |       CAST(COALESCE(pd.n_boiler, 0) AS BIGINT) AS n_boiler
      |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
      |ORDER BY d.doc_id""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val grams = docs.select(col("doc_id"), explode(ngrams(toks, 3)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))
    val boiler = grams.groupBy("gh").agg(countDistinct("doc_id").as("df"))
      .filter(col("df") >= 5).select(col("gh"), lit(1).as("is_b"))
    val perDoc = grams.join(boiler, Seq("gh"), "left_outer")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), count(col("is_b")).as("n_boiler"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"))
      .orderBy("doc_id")
  }

  // --- q89: n-gram vocabulary (top-k by corpus frequency) ------------------
  // Vocabulary induction / merge-candidate mining: the 50 most frequent
  // bigrams with counts. GroupBy gets a map-side partial aggregate
  // (distinct grams ≪ gram occurrences), and the top-k is
  // TakeOrderedAndProject — per-partition heaps, never a global sort
  // of the vocabulary.
  def ngramVocab: Q = Q(
    "q89_ngram_vocab",
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |g AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i FROM t),
      |gg AS (SELECT array_to_string(w[i : i+1], ' ') AS gram FROM g)
      |SELECT gram, count(*) AS cnt FROM gg
      |GROUP BY gram ORDER BY cnt DESC, gram LIMIT 50""".stripMargin,
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(explode(ngrams(toks, 2)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(50)
  }

  // --- q90: template (shared-prefix) audit ---------------------------------
  // Docs sharing their first 8 tokens are template instances (boiler
  // openings, mirrored articles) that exact dedup misses — survey them
  // with group size, source spread, and the min-id representative a
  // prefix-level dedup would keep. One aggregation on the prefix; the
  // 8-token prefix is a bounded-width key, so this scales like exact
  // dedup (and would use a hash key at warehouse scale, as q86 does).
  def prefixGroups: Q = Q(
    "q90_prefix_groups",
    """WITH t AS (SELECT doc_id, source,
      |        array_to_string(string_split(text, ' ')[1:8], ' ') AS prefix
      |      FROM documents)
      |SELECT prefix, count(*) AS n_docs,
      |  count(DISTINCT source) AS n_sources, min(doc_id) AS keep_doc_id
      |FROM t GROUP BY prefix HAVING count(*) > 1
      |ORDER BY prefix""".stripMargin,
  ) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        array_join(slice(toks, 1, 8), " ").as("prefix"))
      .groupBy("prefix")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("source").as("n_sources"),
        min(col("doc_id")).as("keep_doc_id"))
      .filter(col("n_docs") > 1)
      .orderBy("prefix")
  }

  // --- q342: Moore-Lewis cross-entropy data selection -------------------------
  // THE classical data-selection recipe (Moore & Lewis 2010): score
  // every document by ln p_in(d) − ln p_gen(d) under an in-domain LM
  // (src0's docs) vs the general corpus LM, keep the high end — the
  // cheap precursor to q134's DSIR, still what production pipelines
  // run when the target domain is "documents like THESE". Unigram
  // add-1 LMs: per-TYPE log-probs are computed once in a vocab-sized
  // table (one corpus token aggregate + a left join for in-domain
  // counts; corpus mass and vocab size ride broadcast scalars), then
  // one keyed token→LM join and a per-doc DECIMAL sum of 9-dp-rounded
  // logs (the round-then-sum rule). Length-normalized so long docs
  // don't dominate; znorm because the score is a difference.
  def mooreLewis: Q = Q(
    "q342_moore_lewis",
    """WITH tok AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
      |            FROM documents),
      |v AS (SELECT count(DISTINCT w) AS v FROM tok),
      |gen AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
      |ing AS (SELECT w, count(*) AS c FROM tok WHERE source = 'src0' GROUP BY w),
      |ng AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok),
      |ni AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok WHERE source = 'src0'),
      |lm AS (SELECT g.w,
      |    round(ln((coalesce(i.c, 0) + 1) / (ni.n + v.v)), 9) AS lpi,
      |    round(ln((g.c + 1) / (ng.n + v.v)), 9) AS lpg
      |  FROM gen g LEFT JOIN ing i USING (w), ni, ng, v),
      |sc AS (SELECT t.doc_id,
      |    round((CAST(sum(CAST(lm.lpi AS DECIMAL(18,9))) AS DOUBLE)
      |         - CAST(sum(CAST(lm.lpg AS DECIMAL(18,9))) AS DOUBLE))
      |      / count(*), 6) + 0.0 AS ml_score
      |  FROM tok t JOIN lm ON t.w = lm.w GROUP BY t.doc_id)
      |SELECT doc_id, ml_score FROM sc
      |ORDER BY ml_score DESC, doc_id LIMIT 15""".stripMargin,
  ) { (s, dir) =>
    val tok = Dedup.persistTracked(Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), explode(toks).as("w")))
    val v = tok.agg(countDistinct("w").as("v"))
    val gen = tok.groupBy("w").agg(count(lit(1)).as("cg"))
    val ing = tok.filter(col("source") === "src0")
      .groupBy("w").agg(count(lit(1)).as("ci"))
    val ng = tok.agg(count(lit(1)).cast("double").as("ng"))
    val ni = tok.filter(col("source") === "src0")
      .agg(count(lit(1)).cast("double").as("ni"))
    val lm = gen.join(ing, Seq("w"), "left_outer")
      .crossJoin(broadcast(ni)).crossJoin(broadcast(ng)).crossJoin(broadcast(v))
      .select(col("w"),
        round(log((coalesce(col("ci"), lit(0L)) + 1) / (col("ni") + col("v"))), 9).as("lpi"),
        round(log((col("cg") + 1) / (col("ng") + col("v"))), 9).as("lpg"))
    tok.join(lm, "w")
      .groupBy("doc_id")
      .agg(znorm(round((dsum(col("lpi"), 9) - dsum(col("lpg"), 9))
        / count(lit(1)), 6)).as("ml_score"))
      .orderBy(col("ml_score").desc, col("doc_id")).limit(15)
  }

  // --- q348: KMV (theta-sketch) source-overlap estimation ---------------------
  // q114 computes EXACT source-pair shingle overlap with a corpus-wide
  // shingle join; the sketch family's answer is k-minimum-values
  // (Bar-Yossef et al. 2002 / the theta sketch): keep each source's k
  // smallest distinct shingle-hash values, and every pairwise union /
  // Jaccard / intersection estimate becomes arithmetic on
  // (sources·k)-sized state — the HLL-for-set-OPERATIONS primitive HLL
  // itself lacks (q56/q136 only union). Hashes are the engine-portable
  // polynomial fold (the q206 rule — xxhash64 has no DuckDB twin), so
  // the oracle replays sketch construction, the per-pair merge, the
  // θ = h_(k)/P threshold, and both estimators bit for bit; the exact
  // q114 Jaccard rides along as the honesty column (the estimator's
  // error is VISIBLE in the output, not asserted away). Partial
  // sketches (union < k) degrade to exact counting in both engines.
  def kmvSketchOverlap: Q = {
    val k = 256
    val P = 1000000007L
    Q(
      "q348_kmv_sketch_overlap",
      s"""WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
         |sh AS (SELECT DISTINCT source, shingle FROM toks,
         |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
         |       WHERE len(t) >= 3),
         |hd AS (SELECT DISTINCT source, list_reduce(list_prepend(CAST(0 AS BIGINT),
         |         list_transform(string_split(shingle, ''), c -> CAST(ascii(c) AS BIGINT))),
         |         (h, b) -> (h * 131 + b) % $P) AS h FROM sh),
         |sk AS (SELECT source, h FROM (
         |         SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rk
         |         FROM hd) WHERE rk <= $k),
         |srcs AS (SELECT DISTINCT source FROM sk),
         |mg AS (SELECT a.source AS sa, b.source AS sb, x.h
         |       FROM sk x JOIN srcs a ON x.source = a.source
         |                 JOIN srcs b ON a.source < b.source
         |       UNION
         |       SELECT a.source AS sa, b.source AS sb, x.h
         |       FROM sk x JOIN srcs b ON x.source = b.source
         |                 JOIN srcs a ON a.source < b.source),
         |tk AS (SELECT sa, sb, h FROM (
         |         SELECT sa, sb, h, row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rk
         |         FROM mg) WHERE rk <= $k),
         |fl AS (SELECT t.sa, t.sb, t.h,
         |         CASE WHEN pa.h IS NOT NULL AND pb.h IS NOT NULL THEN 1 ELSE 0 END AS in_both
         |       FROM tk t
         |       LEFT JOIN sk pa ON pa.source = t.sa AND pa.h = t.h
         |       LEFT JOIN sk pb ON pb.source = t.sb AND pb.h = t.h),
         |st AS (SELECT sa, sb, count(*) AS n_top, CAST(sum(in_both) AS BIGINT) AS c_both,
         |         CAST(max(h) AS DOUBLE) / $P AS uk
         |       FROM fl GROUP BY 1, 2),
         |sizes AS (SELECT source, count(*) AS sz FROM sh GROUP BY 1),
         |inter AS (SELECT a.source AS sa, b.source AS sb, count(*) AS n_shared
         |          FROM sh a JOIN sh b USING (shingle)
         |          WHERE a.source < b.source GROUP BY 1, 2)
         |SELECT st.sa AS src_a, st.sb AS src_b,
         |  round(CASE WHEN st.n_top < $k THEN CAST(st.n_top AS DOUBLE)
         |             ELSE ${k - 1} / st.uk END, 4) AS est_union,
         |  CAST(st.c_both AS DOUBLE) / st.n_top AS est_jaccard,
         |  round(CAST(st.c_both AS DOUBLE) / st.n_top
         |    * (CASE WHEN st.n_top < $k THEN CAST(st.n_top AS DOUBLE)
         |            ELSE ${k - 1} / st.uk END), 4) AS est_intersection,
         |  round(CAST(coalesce(i.n_shared, 0) AS DOUBLE)
         |    / (sa2.sz + sb2.sz - coalesce(i.n_shared, 0)), 6) AS exact_jaccard
         |FROM st LEFT JOIN inter i ON i.sa = st.sa AND i.sb = st.sb
         |JOIN sizes sa2 ON sa2.source = st.sa
         |JOIN sizes sb2 ON sb2.source = st.sb
         |ORDER BY src_a, src_b""".stripMargin,
    ) { (s, dir) =>
      val sh = Dedup.persistTracked(
        Dedup.shingleTable(
          Tables.documents(s, dir).select(col("source"), col("text")), "source", "text")
          .distinct())
      val hd = sh.select(col("source"), Dedup.polyTokenHash(col("shingle")).as("h"))
        .distinct()
      val wsrc = Window.partitionBy("source").orderBy("h")
      val sk = Dedup.persistTracked(
        hd.withColumn("rk", row_number().over(wsrc)).filter(col("rk") <= k)
          .select("source", "h"))
      val srcs = sk.select("source").distinct()
      val e1 = sk.select(col("source").as("sa"), col("h"))
        .join(srcs.select(col("source").as("sb")), col("sa") < col("sb"))
      val e2 = sk.select(col("source").as("sb"), col("h"))
        .join(srcs.select(col("source").as("sa")), col("sa") < col("sb"))
      val merged = e1.select("sa", "sb", "h").unionByName(e2.select("sa", "sb", "h"))
        .distinct()
      val wp = Window.partitionBy("sa", "sb").orderBy("h")
      val topk = merged.withColumn("rk", row_number().over(wp)).filter(col("rk") <= k)
      val fl = topk
        .join(sk.select(col("source").as("sa"), col("h"), lit(1).as("ina")),
          Seq("sa", "h"), "left_outer")
        .join(sk.select(col("source").as("sb"), col("h"), lit(1).as("inb")),
          Seq("sb", "h"), "left_outer")
      val st = fl.groupBy("sa", "sb")
        .agg(count(lit(1)).as("n_top"),
          sum(when(col("ina").isNotNull && col("inb").isNotNull, 1L).otherwise(0L))
            .as("c_both"),
          (max(col("h")).cast("double") / P).as("uk"))
      val estU = when(col("n_top") < k, col("n_top").cast("double"))
        .otherwise(lit((k - 1).toDouble) / col("uk"))
      val sizes = sh.groupBy("source").agg(count(lit(1)).as("sz"))
      val inter = sh.select(col("source").as("sa"), col("shingle"))
        .join(sh.select(col("source").as("sb"), col("shingle")), "shingle")
        .filter(col("sa") < col("sb"))
        .groupBy("sa", "sb").agg(count(lit(1)).as("n_shared"))
      st.join(inter, Seq("sa", "sb"), "left_outer")
        .join(broadcast(sizes.toDF("sa", "sza")), "sa")
        .join(broadcast(sizes.toDF("sb", "szb")), "sb")
        .select(col("sa").as("src_a"), col("sb").as("src_b"),
          round(estU, 4).as("est_union"),
          (col("c_both").cast("double") / col("n_top")).as("est_jaccard"),
          round(col("c_both").cast("double") / col("n_top") * estU, 4)
            .as("est_intersection"),
          round(coalesce(col("n_shared"), lit(0L)).cast("double")
            / (col("sza") + col("szb") - coalesce(col("n_shared"), lit(0L))), 6)
            .as("exact_jaccard"))
        .orderBy("src_a", "src_b")
    }
  }

  // --- q212: vocabulary coverage curve ---------------------------------------
  // The tokenizer-budget planning number: the smallest vocabulary (by
  // corpus frequency rank) covering 50/75/90/95/99% of token mass.
  // NOT a window over the vocabulary: types collapse to DISTINCT
  // FREQUENCY groups first — Σf over distinct f is ≤ N, so the group
  // table has ≤ √(2N) rows (~10⁶ at a 10¹² 100-TB token count) and
  // the unpartitioned cumulative window is bounded by THAT, not by
  // vocab size. Within the crossing group the exact type count is
  // integer ceil-division; every comparison is integer arithmetic
  // (targets as ⌈pct·N/100⌉ token counts), so the curve is
  // engine-exact — the only doubles are the two rounded report
  // columns.
  def vocabCoverageCurve: Q = Q(
    "q212_vocab_coverage",
    """WITH tf AS (SELECT tok, count(*) AS f FROM
      |    (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY tok),
      |tfg AS (SELECT f, count(*) AS m, CAST(count(*) * f AS BIGINT) AS mass
      |  FROM tf GROUP BY f),
      |cum AS (SELECT f, m, mass,
      |    CAST(sum(m) OVER wd AS BIGINT) AS cumk,
      |    CAST(sum(mass) OVER wd AS BIGINT) AS cump
      |  FROM tfg WINDOW wd AS (ORDER BY f DESC)),
      |tot AS (SELECT CAST(sum(mass) AS BIGINT) AS total FROM tfg),
      |tgt AS (SELECT t, (total * t + 99) // 100 AS nt, total
      |  FROM UNNEST([50, 75, 90, 95, 99]) AS u(t), tot),
      |hit AS (SELECT t, nt, total, f, cumk - m AS prevk, cump - mass AS prevp
      |  FROM tgt JOIN cum ON cump >= nt AND cump - mass < nt)
      |SELECT t AS target_pct,
      |  CAST(prevk + (nt - prevp + f - 1) // f AS BIGINT) AS vocab_size,
      |  CAST(prevp + ((nt - prevp + f - 1) // f) * f AS BIGINT) AS tokens_covered,
      |  round(CAST(prevp + ((nt - prevp + f - 1) // f) * f AS DOUBLE) / total, 6)
      |    AS coverage
      |FROM hit ORDER BY target_pct""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(s, dir)
      .select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("f"))
    val tfg = graft.dedup.Dedup.persistTracked(
      tf.groupBy("f").agg(count(lit(1)).as("m"), (count(lit(1)) * col("f")).as("mass")))
    val wd = Window.orderBy(col("f").desc)
    val cum = tfg
      .withColumn("cumk", sum(col("m")).over(wd))
      .withColumn("cump", sum(col("mass")).over(wd))
    val tot = tfg.agg(sum(col("mass")).as("total"))
    val tgt = tot.select(explode(lit(Array(50, 75, 90, 95, 99))).as("t"), col("total"))
      .withColumn("nt", expr("(total * t + 99) div 100"))
    val hit = tgt.join(cum,
      col("cump") >= col("nt") && col("cump") - col("mass") < col("nt"))
      .withColumn("prevk", col("cumk") - col("m"))
      .withColumn("prevp", col("cump") - col("mass"))
      .withColumn("need", expr("(nt - prevp + f - 1) div f"))
    hit.select(col("t").as("target_pct"),
        (col("prevk") + col("need")).as("vocab_size"),
        (col("prevp") + col("need") * col("f")).as("tokens_covered"),
        round((col("prevp") + col("need") * col("f")).cast("double") / col("total"), 6)
          .as("coverage"))
      .orderBy("target_pct")
  }

  // --- q228: Good-Turing unseen-mass estimate --------------------------------
  // "How much vocabulary is the crawl still missing?" — the classical
  // answer from the frequency-of-frequencies: the Good-Turing estimate
  // of unseen probability mass is n₁/N (share of tokens that are
  // hapaxes), the expected true count of a singleton is 2·n₂/n₁, and
  // Chao1 lower-bounds the true vocabulary at V + n₁²/(2n₂). Per
  // source, from ONE (source, token) aggregate reduced to a
  // sources-sized row — the companion planning number to q192's Heaps
  // slope and q212's coverage curve. A hapax-free source (n₂ = 0 form)
  // NULLs Chao1 via try_divide.
  def goodTuring: Q = Q(
    "q228_good_turing",
    """WITH tt AS (SELECT source, tok FROM documents,
      |       UNNEST(string_split(text, ' ')) AS u(tok)),
      |tf AS (SELECT source, tok, count(*) AS c FROM tt GROUP BY source, tok)
      |SELECT source,
      |  CAST(sum(c) AS BIGINT) AS n_tokens,
      |  CAST(count(*) AS BIGINT) AS vocab,
      |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |  round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) / sum(c), 6)
      |    AS p_unseen,
      |  round(count(*) +
      |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |      * sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
      |      / (2.0 * sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)), 2) AS chao1_vocab
      |FROM tf GROUP BY source ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    val tf = Tables.documents(s, dir)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val n1 = sum(when(col("c") === 1, 1).otherwise(0))
    val n2 = sum(when(col("c") === 2, 1).otherwise(0))
    tf.groupBy("source")
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("vocab"),
        n1.cast("long").as("n1"), n2.cast("long").as("n2"),
        round(n1.cast("double") / sum(col("c")), 6).as("p_unseen"),
        round(count(lit(1)) +
          try_divide(n1.cast("double") * n1, lit(2.0) * n2), 2).as("chao1_vocab"))
      .orderBy("source")
  }

  // --- q229: token burstiness (Church-Gale VMR) ------------------------------
  // Content words clump — once a document mentions a term it tends to
  // mention it again — while function words spread Poisson-like. The
  // variance-to-mean ratio of per-document counts (over ALL docs,
  // zeros included, via moment sums) separates the two; `repeat_rate`
  // is the within-doc repeat share of each term's occurrences. Run
  // for the corpus top-20 terms: selection is a distributed
  // TakeOrdered (count desc, token asc — never a vocab-wide window),
  // the 20 survivors broadcast back into the (token, doc) aggregate.
  // VMR's variance numerator cancels to zero when a term occurs
  // exactly once in every doc → signed-zero-normalized.
  def tokenBurstiness: Q = Q(
    "q229_token_burstiness",
    """WITH tf AS (SELECT tok, doc_id, count(*) AS c FROM documents,
      |       UNNEST(string_split(text, ' ')) AS u(tok) GROUP BY tok, doc_id),
      |top AS (SELECT tok, CAST(sum(c) AS BIGINT) AS ct FROM tf GROUP BY tok
      |        ORDER BY sum(c) DESC, tok LIMIT 20),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      |m AS (SELECT t.tok, max(t.ct) AS ct, count(*) AS df,
      |        CAST(sum(f.c) AS BIGINT) AS sc, CAST(sum(f.c * f.c) AS BIGINT) AS sc2
      |      FROM top t JOIN tf f ON f.tok = t.tok GROUP BY t.tok)
      |SELECT CAST(row_number() OVER (ORDER BY ct DESC, tok) AS INTEGER) AS rank,
      |  tok, ct AS corpus_count, CAST(df AS BIGINT) AS doc_freq,
      |  round((CAST(sc2 AS DOUBLE) / n - (CAST(sc AS DOUBLE) / n) * (CAST(sc AS DOUBLE) / n))
      |    / (CAST(sc AS DOUBLE) / n), 4) + 0.0 AS vmr,
      |  round(CAST(sc - df AS DOUBLE) / sc, 4) AS repeat_rate
      |FROM m CROSS JOIN nd
      |ORDER BY rank""".stripMargin,
  ) { (s, dir) =>
    val tf = Dedup.persistTracked(Tables.documents(s, dir)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("tok", "doc_id").agg(count(lit(1)).as("c")))
    val top = tf.groupBy("tok").agg(sum(col("c")).cast("long").as("ct"))
      .orderBy(col("ct").desc, col("tok")).limit(20)
    val nd = Tables.documents(s, dir).agg(count(lit(1)).as("n"))
    val m = broadcast(top).join(tf, "tok")
      .groupBy("tok")
      .agg(max(col("ct")).as("ct"), count(lit(1)).as("df"),
        sum(col("c")).cast("long").as("sc"),
        sum(col("c") * col("c")).cast("long").as("sc2"))
    val mean = col("sc").cast("double") / col("n")
    m.crossJoin(broadcast(nd))
      .select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("ct").desc, col("tok"))).cast("int").as("rank"),
        col("tok"), col("ct").as("corpus_count"), col("df").cast("long").as("doc_freq"),
        znorm(round((col("sc2").cast("double") / col("n") - mean * mean) / mean, 4))
          .as("vmr"),
        round((col("sc") - col("df")).cast("double") / col("sc"), 4).as("repeat_rate"))
      .orderBy("rank")
  }

  // --- q227: content-defined chunk dedup -----------------------------------
  // q95's fixed 8-token windows find duplicated content but shift with
  // it: insert one token at the front of a copy and every window
  // fingerprint changes. Content-defined chunking (the rsync/LBFS
  // trick) cuts where the CONTENT says to cut — a token is a chunk
  // boundary when md5(token) starts with '0' (expected chunk ≈ 16
  // tokens) — so an insertion only perturbs its own chunk and the
  // rest re-align. Per source: chunk instances, instances whose
  // fingerprint recurs in ≥2 docs, and the shared-token fraction —
  // the dedupable-mass estimate robust to prefix/suffix edits.
  // Shapes: one posexplode, a per-DOC cumulative window (doc-sized
  // partitions, the q95 idiom), chunk reassembly via
  // array_sort(struct(pos, tok)) inside a keyed aggregate (collect
  // order never matters), and two keyed aggregates on md5 chunk
  // fingerprints. Nothing corpus-wide is sorted; chunk texts travel
  // only until hashed.
  def cdcChunks: Q = Q(
    "q227_cdc_chunks",
    """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS tk FROM documents),
      |p AS (SELECT doc_id, source, CAST(i AS INTEGER) AS pos, tk[CAST(i AS INTEGER)] AS tok
      |      FROM t, UNNEST(range(1, len(tk) + 1)) AS u(i)),
      |b AS (SELECT doc_id, source, pos, tok,
      |        CASE WHEN substr(md5(tok), 1, 1) = '0' THEN 1 ELSE 0 END AS brk
      |      FROM p),
      |c AS (SELECT doc_id, source, pos, tok,
      |        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS cid
      |      FROM b),
      |ch AS (SELECT doc_id, source, cid, count(*) AS ntok,
      |         md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
      |       FROM c GROUP BY doc_id, source, cid),
      |fpc AS (SELECT fp, count(DISTINCT doc_id) AS nd FROM ch GROUP BY fp)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
      |  CAST(sum(ntok) AS BIGINT) AS chunk_tokens,
      |  CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS shared_chunks,
      |  CAST(sum(CASE WHEN nd >= 2 THEN ntok ELSE 0 END) AS BIGINT) AS shared_tokens,
      |  round(CAST(sum(CASE WHEN nd >= 2 THEN ntok ELSE 0 END) AS DOUBLE)
      |    / sum(ntok), 4) AS shared_token_frac,
      |  round(CAST(sum(ntok) AS DOUBLE) / count(*), 2) AS avg_chunk_tokens
      |FROM ch JOIN fpc USING (fp)
      |GROUP BY source ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    val p = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
    val c = p
      .withColumn("brk", when(substring(md5(col("tok")), 1, 1) === "0", 1).otherwise(0))
      .withColumn("cid",
        sum(col("brk")).over(Window.partitionBy("doc_id").orderBy("pos")))
    val ch = Dedup.persistTracked(c.groupBy("doc_id", "source", "cid")
      .agg(count(lit(1)).as("ntok"),
        md5(array_join(transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ")).as("fp")))
    val fpc = ch.groupBy("fp").agg(countDistinct("doc_id").as("nd"))
    ch.join(fpc, "fp")
      .groupBy("source")
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("ntok")).cast("long").as("chunk_tokens"),
        sum(when(col("nd") >= 2, 1).otherwise(0)).cast("long").as("shared_chunks"),
        sum(when(col("nd") >= 2, col("ntok")).otherwise(0)).cast("long").as("shared_tokens"),
        round(sum(when(col("nd") >= 2, col("ntok")).otherwise(0)).cast("double")
          / sum(col("ntok")), 4).as("shared_token_frac"),
        round(sum(col("ntok")).cast("double") / count(lit(1)), 2).as("avg_chunk_tokens"))
      .orderBy("source")
  }

  // --- q231: per-batch shingle novelty curve -------------------------------
  // The marginal-utility-of-data curve: split the crawl (doc_id order)
  // into 10 equal batches and ask, per batch, what fraction of its
  // distinct 5-gram shingles was never seen in an earlier batch.
  // q84's incremental dedup answers this for WHOLE documents; at
  // shingle granularity the curve shows content exhaustion long
  // before exact duplicates appear (novelty decaying toward 0 means
  // later crawls buy boilerplate recombinations, not new text) — the
  // number a data-acquisition owner reads before paying for batch 11.
  // Batch id is pure integer math ((doc_id·10) div n, clamped), the
  // corpus-scale work is two keyed aggregates on the distinct
  // (batch, shingle) set — min-batch per shingle, then counts per
  // batch — and the doc count rides in as a 1-row broadcast, so the
  // plan is scan → distinct → two bounded shuffles on the shingle
  // key. Shingles stay exact strings: novelty is a set-membership
  // claim, and a lossy hash would undercount novel shingles by
  // exactly its collision rate.
  def batchNovelty: Q = Q(
    "q231_batch_novelty",
    """WITH nn AS (SELECT count(*) AS n FROM documents),
      |d AS (SELECT least(CAST((doc_id * 10) // n AS INT), 9) AS batch,
      |    string_split(text, ' ') AS t FROM documents CROSS JOIN nn),
      |bs AS (SELECT DISTINCT batch, sg FROM d,
      |    UNNEST(list_transform(range(1, len(t) - 3),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))
      |      AS u(sg)
      |  WHERE len(t) >= 5),
      |fb AS (SELECT sg, min(batch) AS fb FROM bs GROUP BY sg),
      |cur AS (SELECT b.batch, count(*) AS n_distinct,
      |    sum(CASE WHEN f.fb = b.batch THEN 1 ELSE 0 END) AS novel
      |  FROM bs b JOIN fb f ON f.sg = b.sg GROUP BY b.batch)
      |SELECT batch, CAST(n_distinct AS BIGINT) AS n_distinct,
      |  CAST(novel AS BIGINT) AS novel_shingles,
      |  round(CAST(novel AS DOUBLE) / n_distinct, 4) AS novelty_rate
      |FROM cur ORDER BY batch""".stripMargin,
  ) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val nn = docs.agg(count(lit(1)).as("n"))
    val t = TextAnalysis.tokens(col("text"))
    val d = docs.crossJoin(broadcast(nn))
      .select(least(expr("div(doc_id * 10, n)").cast("int"), lit(9)).as("batch"),
        t.as("t"))
      .filter(size(col("t")) >= 5)
    val bs = d.select(col("batch"),
        explode(graft.functions.WordNGrams(col("t"), 5, distinct = false)).as("sg"))
      .distinct()
    val fb = bs.groupBy("sg").agg(min(col("batch")).as("fb"))
    bs.join(fb, "sg")
      .groupBy("batch")
      .agg(count(lit(1)).cast("long").as("n_distinct"),
        sum(when(col("fb") === col("batch"), 1).otherwise(0)).cast("long")
          .as("novel_shingles"))
      .withColumn("novelty_rate",
        round(col("novel_shingles").cast("double") / col("n_distinct"), 4))
      .select("batch", "n_distinct", "novel_shingles", "novelty_rate")
      .orderBy("batch")
  }

  // --- q268: capture–recapture distinct-content estimate ----------------------
  // "How many distinct documents does the full crawl hold?" is a
  // question you answer BEFORE scanning 100 TB: sample twice, count
  // the overlap, and the Chapman estimator
  // N̂ = (n_A+1)(n_B+1)/(m+1) − 1 (the bias-corrected Lincoln–Petersen
  // mark-recapture form) estimates the distinct-text population from
  // two small samples. Samples are disjoint halves by the
  // laplaceNoisedKeyed LCG on doc_id (independent of content, as the
  // estimator requires); "marked" = the same TEXT appears in both
  // halves, so what is being estimated is distinct content mass —
  // dedup capacity planning from samples. Everything reduces to
  // distinct-text counts and one intersection join on the text key;
  // at real scale the key is the (hash, len) pair (the q39 stance).
  // The truth rides along: true distinct count and the estimator's
  // signed relative error (znormed — it can cancel to −0.0).
  def captureRecapture: Q = Q(
    "q268_capture_recapture",
    """WITH u AS (SELECT doc_id, text,
      |    ((((doc_id % 1000003) * 2654435761 + 5) % 1000003) + 0.5)
      |      / 1000003.0 AS u
      |  FROM documents),
      |a AS (SELECT DISTINCT text FROM u WHERE u < 0.5),
      |b AS (SELECT DISTINCT text FROM u WHERE u >= 0.5),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM a JOIN b USING (text)),
      |na AS (SELECT CAST(count(*) AS BIGINT) AS na FROM a),
      |nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM b),
      |tr AS (SELECT CAST(count(DISTINCT text) AS BIGINT) AS n_true FROM documents)
      |SELECT na.na AS n_a, nb.nb AS n_b, m.m AS n_both,
      |  round((na.na + 1.0) * (nb.nb + 1.0) / (m.m + 1.0) - 1.0, 2) AS chapman_est,
      |  tr.n_true,
      |  round(((na.na + 1.0) * (nb.nb + 1.0) / (m.m + 1.0) - 1.0 - tr.n_true)
      |    / tr.n_true, 4) + 0.0 AS rel_err
      |FROM na CROSS JOIN nb CROSS JOIN m CROSS JOIN tr""".stripMargin,
  ) { (s, dir) =>
    val u = ((pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L) + lit(5L),
      lit(1000003L)).cast("double") + 0.5) / 1000003.0).as("u")
    val base = Dedup.persistTracked(
      Tables.documents(s, dir).select(col("doc_id"), col("text"), u))
    val a = base.filter(col("u") < 0.5).select("text").distinct()
    val b = base.filter(col("u") >= 0.5).select("text").distinct()
    val m = a.join(b, "text").agg(count(lit(1)).cast("long").as("m"))
    val na = a.agg(count(lit(1)).cast("long").as("na"))
    val nb = b.agg(count(lit(1)).cast("long").as("nb"))
    val tr = Tables.documents(s, dir)
      .agg(countDistinct("text").cast("long").as("n_true"))
    val est = (col("na") + 1.0) * (col("nb") + 1.0) / (col("m") + 1.0) - 1.0
    na.crossJoin(broadcast(nb)).crossJoin(broadcast(m)).crossJoin(broadcast(tr))
      .select(col("na").as("n_a"), col("nb").as("n_b"), col("m").as("n_both"),
        round(est, 2).as("chapman_est"), col("n_true"),
        znorm(round((est - col("n_true")) / col("n_true"), 4)).as("rel_err"))
  }

  // --- q254: Kneser–Ney smoothed bigram LM scoring ----------------------------
  // q118's MLE bigram logprob is the raw fluency signal; production
  // LM-based quality scoring smooths it, and interpolated Kneser–Ney
  // (Kneser & Ney 1995; Chen & Goodman 1998) is THE n-gram smoother:
  // P(w₂|w₁) = max(c(w₁w₂)−D,0)/c(w₁·) + λ(w₁)·P_cont(w₂), with
  // discount D = 0.75, back-off mass λ(w₁) = D·N₁₊(w₁·)/c(w₁·), and
  // the continuation prior P_cont(w₂) = N₁₊(·w₂)/|bigram types| —
  // counting how many CONTEXTS a word follows, not how often. All
  // five statistics are keyed aggregates over the exploded bigram
  // table (the c₂ table is vocab²-sparse-sized and every join is on
  // its keys — nothing corpus-wide broadcasts); scoring the corpus's
  // own bigrams means every count ≥ 1 > D, so the discounted term
  // never truncates and ln() never sees 0. Per-doc averages follow
  // the q118 9-dp decimal discipline. Docs ranked by this and by
  // q118's MLE can disagree exactly where smoothing matters: rare
  // continuations after frequent contexts.
  def knBigramLm: Q = {
    val P = "(greatest(n2 - 0.75, 0.0) / n1 + (0.75 * fo / n1) * (pcn / types))"
    Q(
      "q254_kn_bigram_lm",
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |bg AS (SELECT doc_id, string_split(bigram, ' ')[1] AS w1,
         |    string_split(bigram, ' ')[2] AS w2 FROM toks,
         |  UNNEST(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
         |    AS u(bigram)
         |  WHERE len(t) >= 2),
         |c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY 1, 2),
         |c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY 1),
         |fo1 AS (SELECT w1, count(*) AS fo FROM c2 GROUP BY 1),
         |pc AS (SELECT w2, count(*) AS pcn FROM c2 GROUP BY 1),
         |ty AS (SELECT CAST(count(*) AS DOUBLE) AS types FROM c2),
         |p AS (SELECT bg.doc_id,
         |    round(ln($P), 9) AS lp
         |  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
         |    JOIN fo1 USING (w1) JOIN pc USING (w2) CROSS JOIN ty)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  round(CAST(sum(CAST(lp AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6)
         |    AS kn_logprob
         |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    ) { (s, dir) =>
      val toks = TextAnalysis.tokens(col("text"))
      val bg = Dedup.persistTracked(Tables.documents(s, dir)
        .filter(size(toks) >= 2)
        .select(col("doc_id"), toks.as("t"))
        .select(col("doc_id"),
          explode(graft.functions.AdjacentPairs(col("t"))).as("b"))
        .select(col("doc_id"), col("b.a").as("w1"), col("b.b").as("w2")))
      val c2 = Dedup.persistTracked(
        bg.groupBy("w1", "w2").agg(count(lit(1)).as("n2")))
      val c1 = bg.groupBy("w1").agg(count(lit(1)).as("n1"))
      val fo1 = c2.groupBy("w1").agg(count(lit(1)).as("fo"))
      val pc = c2.groupBy("w2").agg(count(lit(1)).as("pcn"))
      val ty = c2.agg(count(lit(1)).cast("double").as("types"))
      val prob = greatest(col("n2") - 0.75, lit(0.0)) / col("n1") +
        (lit(0.75) * col("fo") / col("n1")) * (col("pcn") / col("types"))
      bg.join(c2, Seq("w1", "w2")).join(c1, "w1").join(fo1, "w1").join(pc, "w2")
        .crossJoin(broadcast(ty))
        .select(col("doc_id"), round(log(prob), 9).as("lp"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_bigrams"),
          round(dsum(col("lp"), 9) / count(lit(1)), 6).as("kn_logprob"))
        .orderBy("doc_id")
    }
  }

  // --- q249: corpus-level source similarity via MinHash ----------------------
  // q206 calibrates the estimator on DOC pairs; mixture planning needs
  // the same answer one level up — how much do whole SOURCES overlap?
  // Jaccard between the distinct-shingle SETS of each source pair,
  // alongside its 16-permutation MinHash estimate, because at 100 TB
  // the exact |A∩B| join over two sources' full shingle inventories is
  // exactly what you stop running: each source's signature is 16 longs
  // regardless of size, mergeable map-side, and the estimate's error
  // is what this query audits. The shingle table reduces to distinct
  // (source, hash) once; the exact intersection is a keyed self-join
  // on hash whose fan-out per shingle is bounded by the SOURCE count
  // (≤ k per key by construction — boilerplate can't blow it up); the
  // signature join runs on the k-row source table. Hashes are the q43
  // polynomial family with the seed-42 permutations, so DuckDB
  // replays signatures bit for bit.
  def sourceMinhash: Q = {
    val P = Dedup.PolyPrime
    val perms = Dedup.minhashPerms.take(16)
    val minsSql = perms.zipWithIndex
      .map { case ((a, b), i) => s"min((h * $a + $b) % $P) AS m$i" }.mkString(", ")
    val estSql = (0 until 16)
      .map(i => s"CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END").mkString(" + ")
    Q(
      "q249_source_minhash",
      s"""WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
         |sh0 AS (SELECT DISTINCT source, shingle FROM toks,
         |    UNNEST(list_transform(range(1, len(t) - 1),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
         |  WHERE len(t) >= 3),
         |sh AS (SELECT DISTINCT source, list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(string_split(shingle, ''), c -> CAST(ascii(c) AS BIGINT))),
         |    (h, b) -> (h * 131 + b) % $P) AS h FROM sh0),
         |sig AS (SELECT source, $minsSql FROM sh GROUP BY source),
         |sz AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
         |inter AS (SELECT l.source AS src_a, r.source AS src_b, count(*) AS i
         |  FROM sh l JOIN sh r ON r.h = l.h AND l.source < r.source
         |  GROUP BY 1, 2),
         |p AS (SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(($estSql) AS DOUBLE) / 16 AS est
         |  FROM sig a JOIN sig b ON a.source < b.source),
         |j AS (SELECT p.src_a, p.src_b,
         |    CAST(za.n AS BIGINT) AS n_a, CAST(zb.n AS BIGINT) AS n_b,
         |    COALESCE(CAST(inter.i AS BIGINT), 0) AS n_inter,
         |    CAST(COALESCE(inter.i, 0) AS DOUBLE)
         |      / (za.n + zb.n - COALESCE(inter.i, 0)) AS exact, p.est
         |  FROM p JOIN sz za ON za.source = p.src_a
         |         JOIN sz zb ON zb.source = p.src_b
         |  LEFT JOIN inter ON inter.src_a = p.src_a AND inter.src_b = p.src_b)
         |SELECT src_a, src_b, n_a, n_b, n_inter,
         |  round(exact, 6) AS exact_jacc, round(est, 4) AS est_jacc,
         |  round(abs(est - exact), 4) AS abs_err
         |FROM j ORDER BY src_a, src_b""".stripMargin,
    ) { (s, dir) =>
      val sh = Dedup.persistTracked(
        Dedup.shingleTable(
          Tables.documents(s, dir).select(col("source"), col("text")),
          "source", "text")
          .select(col("source"), Dedup.polyTokenHash(col("shingle")).as("h"))
          .distinct())
      val mins = perms.zipWithIndex.map { case ((a, b), i) =>
        min((col("h") * lit(a) + lit(b)) % lit(P)).as(s"m$i")
      }
      val sigs = sh.groupBy("source").agg(mins.head, mins.tail: _*)
        .select(col("source"), array((0 until 16).map(i => col(s"m$i")): _*).as("sig"))
      val sz = sh.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = sh.select(col("source").as("src_a"), col("h"))
        .join(sh.select(col("source").as("src_b"), col("h")), "h")
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("i"))
      val est = aggregate(
        zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).cast("double") / 16
      val p = sigs.select(col("source").as("src_a"), col("sig").as("sig_a"))
        .join(sigs.select(col("source").as("src_b"), col("sig").as("sig_b")),
          col("src_a") < col("src_b"))
        .select(col("src_a"), col("src_b"), est.as("est"))
      val exact = coalesce(col("i"), lit(0L)).cast("double") /
        (col("n_a") + col("n_b") - coalesce(col("i"), lit(0L)))
      p.join(sz.select(col("source").as("src_a"), col("n").as("n_a")), "src_a")
        .join(sz.select(col("source").as("src_b"), col("n").as("n_b")), "src_b")
        .join(inter, Seq("src_a", "src_b"), "left")
        .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
          coalesce(col("i"), lit(0L)).as("n_inter"),
          round(exact, 6).as("exact_jacc"), round(col("est"), 4).as("est_jacc"),
          round(abs(col("est") - exact), 4).as("abs_err"))
        .orderBy("src_a", "src_b")
    }
  }

  // --- q275: Hill tail-index estimator of the token frequency law ------------
  // q162 fits the whole top-100 rank-frequency line by OLS; the Hill
  // estimator answers the tail question directly — the maximum-
  // likelihood Pareto exponent α̂ = k / Σᵢ ln(fᵢ/f₍ₖ₊₁₎) over the k
  // largest frequencies. Natural-language tails run α ≈ 1 (Zipf);
  // a vocabulary whose head is artificially flat (template spam) or
  // spiked (token collapse) moves α̂ far from 1, and unlike the OLS
  // slope it has a known standard error (α̂/√k). k adapts to
  // min(100, |vocab|−1) so a small-vocabulary corpus still yields an
  // estimate (the test corpora have ~31 types). Order statistics come
  // from a bounded top-101 TakeOrderedAndProject (the q162 stance) —
  // the corpus-sized work is one term-frequency aggregate; every log
  // is 9-dp rounded into DECIMAL before summing. A degenerate corpus
  // (top 101 frequencies all equal) nulls α̂ via try_divide.
  def hillTailIndex: Q = Q(
    "q275_hill_tail_index",
    """WITH tf AS (SELECT tok, count(*) AS c FROM
      |    (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY tok),
      |top AS (SELECT tok, c FROM tf ORDER BY c DESC, tok LIMIT 101),
      |rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r FROM top),
      |mx AS (SELECT max(r) AS m FROM rk),
      |kp1 AS (SELECT CAST(c AS BIGINT) AS x_min, m FROM rk CROSS JOIN mx WHERE r = m),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS k, x_min,
      |    CAST(sum(CAST(round(ln(CAST(c AS DOUBLE) / x_min), 9) AS DECIMAL(18,9)))
      |      AS DOUBLE) AS slog
      |  FROM rk CROSS JOIN kp1 WHERE r < m GROUP BY x_min)
      |SELECT k, x_min,
      |  round(CAST(k AS DOUBLE) / slog, 6) AS hill_alpha,
      |  round(CAST(k AS DOUBLE) / slog / sqrt(CAST(k AS DOUBLE)), 6) AS alpha_se
      |FROM s""".stripMargin,
  ) { (s, dir) =>
    val tf = Tables.documents(s, dir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val top = tf.orderBy(col("c").desc, col("tok")).limit(101)
    val rk = top.withColumn("r",
      row_number().over(Window.orderBy(col("c").desc, col("tok"))))
    val rkP = graft.dedup.Dedup.persistTracked(rk)
    val mx = rkP.agg(max("r").as("m"))
    val kp1 = rkP.crossJoin(broadcast(mx)).filter(col("r") === col("m"))
      .select(col("c").cast("long").as("x_min"), col("m"))
    val st = rkP.crossJoin(broadcast(kp1)).filter(col("r") < col("m"))
      .groupBy("x_min")
      .agg(count(lit(1)).cast("long").as("k"),
        sum(round(log(col("c").cast("double") / col("x_min")), 9)
          .cast("decimal(18,9)")).cast("double").as("slog"))
    val alpha = try_divide(col("k").cast("double"), col("slog"))
    st.select(col("k"), col("x_min"),
      round(alpha, 6).as("hill_alpha"),
      round(alpha / sqrt(col("k").cast("double")), 6).as("alpha_se"))
  }

  // --- q276: per-source self-overlap (Self-BLEU-style diversity audit) -------
  // Generated or templated sources repeat THEMSELVES: for each doc,
  // the share of its distinct trigrams that also occur in at least
  // one OTHER doc of the same source; per source, the mean share and
  // the fraction of docs above ½ ("templated"). This is the corpus-
  // diversity number a synthetic-data pipeline watches (Self-BLEU's
  // n-gram core without the BLEU brevity machinery). Everything is
  // one trigram explode + a (source, shingle) document-frequency
  // aggregate joined back — linear keyed work, no pair generation, so
  // none of the dedup family's cap machinery is needed. df ≥ 2 uses
  // doc-distinct shingles, so a phrase repeated inside ONE doc does
  // not count as self-overlap (q82 already measures intra-doc
  // repetition).
  def selfOverlapDiversity: Q = Q(
    "q276_self_overlap",
    """WITH dd AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT DISTINCT doc_id, source, shingle FROM dd,
      |    UNNEST(list_transform(range(1, len(t) - 1),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
      |  WHERE len(t) >= 3),
      |df AS (SELECT source, shingle, count(*) AS df FROM sh GROUP BY 1, 2),
      |pd AS (SELECT s.doc_id, s.source, count(*) AS n_sh,
      |    CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
      |  FROM sh s JOIN df ON s.source = df.source AND s.shingle = df.shingle
      |  GROUP BY 1, 2),
      |fr AS (SELECT source, round(CAST(n_shared AS DOUBLE) / n_sh, 6) AS frac FROM pd)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs_scored,
      |  round(CAST(sum(CAST(frac AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
      |    AS mean_self_overlap,
      |  round(CAST(sum(CASE WHEN frac > 0.5 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 4) AS templated_share
      |FROM fr GROUP BY source ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    val t = TextAnalysis.tokens(col("text"))
    val sh = graft.dedup.Dedup.persistTracked(Tables.documents(s, dir)
      .filter(size(t) >= 3)
      .select(col("doc_id"), col("source"), t.as("t"))
      .select(col("doc_id"), col("source"),
        explode(graft.functions.WordNGrams(col("t"), 3, distinct = false)).as("shingle"))
      .distinct())
    val df = sh.groupBy("source", "shingle").agg(count(lit(1)).as("df"))
    val pd = sh.join(df, Seq("source", "shingle"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("df") >= 2, 1).otherwise(0)).cast("long").as("n_shared"))
    val fr = pd.select(col("source"),
      round(col("n_shared").cast("double") / col("n_sh"), 6).as("frac"))
    fr.groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs_scored"),
        round(dsum(col("frac"), 6) / count(lit(1)), 6).as("mean_self_overlap"),
        round(sum(when(col("frac") > 0.5, 1).otherwise(0)).cast("double")
          / count(lit(1)), 4).as("templated_share"))
      .orderBy("source")
  }

  // --- q284: pairwise Jensen-Shannon divergence between sources ---------------
  // q196 reports each batch's ASYMMETRIC KL against a reference; the
  // mixture-design question is symmetric and pairwise — which sources
  // are interchangeable and which bring genuinely different token
  // mass? JS(p,q) = ½KL(p‖m)+½KL(q‖m) ∈ [0, ln 2], finite even on
  // disjoint vocabularies. Scale stance: distributions are projected
  // onto the top-500 corpus tokens + one '<other>' bucket (bounded
  // TakeOrdered), so the per-pair term table is sources²-bounded ×
  // ≤501 regardless of vocabulary size; one-sided tokens enter
  // through a dense source×token grid (their q=0 half contributes
  // p·ln 2 — NOT skippable). Terms are 9-dp rounded into DECIMAL;
  // identical sources land on znorm'd +0.
  def jsDivergencePairs: Q = Q(
    "q284_js_divergence",
    """WITH tc0 AS (SELECT source, tok, count(*) AS c FROM
      |    (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY 1, 2),
      |top AS (SELECT tok FROM (SELECT tok, sum(c) AS tc FROM tc0 GROUP BY tok
      |  ORDER BY tc DESC, tok LIMIT 500)),
      |tc AS (SELECT source,
      |    CASE WHEN tok IN (SELECT tok FROM top) THEN tok ELSE '<other>' END AS tok,
      |    CAST(sum(c) AS BIGINT) AS c
      |  FROM tc0 GROUP BY 1, 2),
      |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM tc GROUP BY source),
      |toks AS (SELECT DISTINCT tok FROM tc),
      |grid AS (SELECT s.source, s.n, t.tok, coalesce(c.c, 0) AS c
      |  FROM ns s CROSS JOIN toks t
      |  LEFT JOIN tc c ON c.source = s.source AND c.tok = t.tok),
      |pairs AS (SELECT a.source AS src_a, b.source AS src_b,
      |    a.c AS ca, a.n AS na, b.c AS cb, b.n AS nb
      |  FROM grid a JOIN grid b ON a.tok = b.tok AND a.source < b.source
      |  WHERE a.c + b.c > 0),
      |terms AS (SELECT src_a, src_b,
      |    round(
      |      (CASE WHEN ca > 0 THEN 0.5 * (CAST(ca AS DOUBLE) / na)
      |        * ln((CAST(ca AS DOUBLE) / na)
      |          / ((CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb) / 2))
      |        ELSE 0.0 END)
      |      + (CASE WHEN cb > 0 THEN 0.5 * (CAST(cb AS DOUBLE) / nb)
      |        * ln((CAST(cb AS DOUBLE) / nb)
      |          / ((CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb) / 2))
      |        ELSE 0.0 END), 9) AS term
      |  FROM pairs)
      |SELECT src_a, src_b,
      |  round(CAST(sum(CAST(term AS DECIMAL(18,9))) AS DOUBLE), 6) + 0.0 AS js
      |FROM terms GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin,
  ) { (s, dir) =>
    val tc0 = Tables.documents(s, dir)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val top = tc0.groupBy("tok").agg(sum("c").as("tc"))
      .orderBy(col("tc").desc, col("tok")).limit(500).select("tok")
    val tc = graft.dedup.Dedup.persistTracked(tc0
      .join(broadcast(top.withColumn("istop", lit(1))), Seq("tok"), "left")
      .select(col("source"),
        when(col("istop") === 1, col("tok")).otherwise("<other>").as("tok"),
        col("c"))
      .groupBy("source", "tok").agg(sum("c").cast("long").as("c")))
    val ns = tc.groupBy("source").agg(sum("c").cast("long").as("n"))
    val toksD = tc.select("tok").distinct()
    val grid = ns.crossJoin(broadcast(toksD))
      .join(tc, Seq("source", "tok"), "left")
      .select(col("source"), col("n"), col("tok"),
        coalesce(col("c"), lit(0L)).as("c"))
    val a = grid.select(col("source").as("src_a"), col("tok"),
      col("c").as("ca"), col("n").as("na"))
    val b = grid.select(col("source").as("src_b"), col("tok"),
      col("c").as("cb"), col("n").as("nb"))
    val pairs = a.join(b, Seq("tok")).filter(col("src_a") < col("src_b"))
      .filter(col("ca") + col("cb") > 0)
    val pa = col("ca").cast("double") / col("na")
    val pb = col("cb").cast("double") / col("nb")
    val m = (pa + pb) / 2
    val term = round(
      when(col("ca") > 0, lit(0.5) * pa * log(pa / m)).otherwise(0.0) +
        when(col("cb") > 0, lit(0.5) * pb * log(pb / m)).otherwise(0.0), 9)
    pairs.select(col("src_a"), col("src_b"), term.as("term"))
      .groupBy("src_a", "src_b")
      .agg(znorm(round(sum(col("term").cast("decimal(18,9)")).cast("double"), 6))
        .as("js"))
      .orderBy("src_a", "src_b")
  }

  // --- q293: Lorenz deciles of token mass over documents ------------------------
  // The packing/skew audit in Lorenz form: sort docs by length
  // (longest first), carve into deciles, and report each decile's
  // share of total corpus TOKENS — "the top 10% of docs hold X% of
  // the tokens" is the number that sizes context-window packing
  // (q73/q153) and flags length-skewed crawls. No corpus sort: the
  // decile carve runs on the token-count HISTOGRAM's cumulative doc
  // counts with integer division (the q288 trick — tie lengths land
  // whole in one decile), and every share is a ratio of exact BIGINT
  // token sums.
  def tokenLorenz: Q = Q(
    "q293_token_lorenz",
    """WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
      |  FROM documents),
      |hist AS (SELECT nt, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY nt),
      |cum AS (SELECT nt, c,
      |    CAST(sum(c) OVER (ORDER BY nt DESC) AS BIGINT) AS cumn FROM hist),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
      |    CAST(sum(nt * c) AS BIGINT) AS toks FROM hist),
      |dec AS (SELECT least((cumn - 1) * 10 // n, 9) AS decile, c, nt * c AS tk
      |  FROM cum CROSS JOIN tot),
      |g AS (SELECT decile, CAST(sum(c) AS BIGINT) AS n_docs,
      |    CAST(sum(tk) AS BIGINT) AS tokens FROM dec GROUP BY decile),
      |gc AS (SELECT decile, n_docs, tokens,
      |    CAST(sum(tokens) OVER (ORDER BY decile) AS BIGINT) AS cum_tokens FROM g)
      |SELECT CAST(decile AS BIGINT) AS decile, n_docs, tokens,
      |  round(CAST(tokens AS DOUBLE) / toks, 6) AS token_share,
      |  round(CAST(cum_tokens AS DOUBLE) / toks, 6) AS cum_token_share
      |FROM gc CROSS JOIN tot ORDER BY decile""".stripMargin,
  ) { (s, dir) =>
    val hist = graft.dedup.Dedup.persistTracked(Tables.documents(s, dir)
      .select(size(TextAnalysis.tokens(col("text"))).cast("long").as("nt"))
      .groupBy("nt").agg(count(lit(1)).cast("long").as("c")))
    val cum = hist.withColumn("cumn",
      sum("c").over(Window.orderBy(col("nt").desc)).cast("long"))
    val tot = hist.agg(sum("c").cast("long").as("n"),
      sum(col("nt") * col("c")).cast("long").as("toks"))
    val dec = cum.crossJoin(broadcast(tot))
      .select(least(expr("(cumn - 1) * 10 div n"), lit(9L)).as("decile"),
        col("c"), (col("nt") * col("c")).as("tk"))
    val g = dec.groupBy("decile")
      .agg(sum("c").cast("long").as("n_docs"), sum("tk").cast("long").as("tokens"))
    val gc = g.withColumn("cum_tokens",
      sum("tokens").over(Window.orderBy("decile")).cast("long"))
    gc.crossJoin(broadcast(tot))
      .select(col("decile").cast("long").as("decile"), col("n_docs"), col("tokens"),
        round(col("tokens").cast("double") / col("toks"), 6).as("token_share"),
        round(col("cum_tokens").cast("double") / col("toks"), 6)
          .as("cum_token_share"))
      .orderBy("decile")
  }

  // --- q295: conditional bigram entropy and corpus redundancy -------------------
  // The information-rate pair: H(unigram) says how surprising tokens
  // are in isolation; H(next | current) says how surprising they are
  // GIVEN local context. Their gap, redundancy = 1 − H_cond/H_uni, is
  // the classic Shannon measure of how much of the corpus is
  // predictable structure — near 0 for shuffled tokens, high for
  // templated text. Both entropies are count-ratio sums over keyed
  // aggregates (unigram table + within-doc adjacent-bigram table),
  // 9-dp decimal terms; znorm'd because H_cond = H_uni cancels to ±0
  // on an order-free corpus.
  def bigramRedundancy: Q = Q(
    "q295_bigram_redundancy",
    """WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
      |uni AS (SELECT tok, count(*) AS c FROM
      |    (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
      |un AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
      |h1 AS (SELECT CAST(sum(CAST(round(-(CAST(c AS DOUBLE) / n)
      |    * ln(CAST(c AS DOUBLE) / n), 9) AS DECIMAL(18,9))) AS DOUBLE) AS h
      |  FROM uni CROSS JOIN un),
      |bg AS (SELECT t[i] AS a, t[i+1] AS b FROM toks,
      |    UNNEST(range(1, len(t))) AS u(i) WHERE len(t) >= 2),
      |c2 AS (SELECT a, b, count(*) AS c FROM bg GROUP BY a, b),
      |c1 AS (SELECT a, CAST(sum(c) AS BIGINT) AS ca FROM c2 GROUP BY a),
      |bn AS (SELECT CAST(sum(c) AS BIGINT) AS n2 FROM c2),
      |h2 AS (SELECT CAST(sum(CAST(round(-(CAST(c2.c AS DOUBLE) / n2)
      |    * ln(CAST(c2.c AS DOUBLE) / ca), 9) AS DECIMAL(18,9))) AS DOUBLE) AS h
      |  FROM c2 JOIN c1 USING (a) CROSS JOIN bn)
      |SELECT (SELECT n FROM un) AS n_tokens, (SELECT n2 FROM bn) AS n_bigrams,
      |  round(h1.h, 6) + 0.0 AS h_unigram,
      |  round(h2.h, 6) + 0.0 AS h_conditional,
      |  round(1.0 - h2.h / h1.h, 6) + 0.0 AS redundancy
      |FROM h1 CROSS JOIN h2""".stripMargin,
  ) { (s, dir) =>
    val t = TextAnalysis.tokens(col("text"))
    val toks = graft.dedup.Dedup.persistTracked(
      Tables.documents(s, dir).select(t.as("t")))
    val uni = toks.select(explode(col("t")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val un = uni.agg(sum("c").cast("long").as("n"))
    def entTerm(p: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column) =
      round(-p * log(q), 9).cast("decimal(18,9)")
    val h1 = uni.crossJoin(broadcast(un))
      .agg(sum(entTerm(col("c").cast("double") / col("n"),
        col("c").cast("double") / col("n"))).cast("double").as("h"))
    val bg = toks.filter(size(col("t")) >= 2)
      .select(explode(graft.functions.AdjacentPairs(col("t"))).as("p"))
      .select(col("p.a"), col("p.b"))
    val c2 = graft.dedup.Dedup.persistTracked(
      bg.groupBy("a", "b").agg(count(lit(1)).as("c")))
    val c1 = c2.groupBy("a").agg(sum("c").cast("long").as("ca"))
    val bn = c2.agg(sum("c").cast("long").as("n2"))
    val h2 = c2.join(c1, "a").crossJoin(broadcast(bn))
      .agg(sum(entTerm(col("c").cast("double") / col("n2"),
        col("c").cast("double") / col("ca"))).cast("double").as("h"))
    h1.withColumnRenamed("h", "hu").crossJoin(broadcast(h2))
      .crossJoin(broadcast(un)).crossJoin(broadcast(bn))
      .select(col("n").as("n_tokens"), col("n2").as("n_bigrams"),
        znorm(round(col("hu"), 6)).as("h_unigram"),
        znorm(round(col("h"), 6)).as("h_conditional"),
        znorm(round(lit(1.0) - col("h") / col("hu"), 6)).as("redundancy"))
  }

  // --- q291: deleted-interpolation weight for the bigram LM ---------------------
  // q118/q254 score text under FIXED smoothing; deleted interpolation
  // LEARNS the unigram/bigram mixing weight on held-out data — two
  // unrolled EM steps of λ ← E[λp₂/(λp₂+(1−λ)p₁)] over eval bigrams,
  // with the model trained on even doc_ids and evaluated on odd (the
  // q213 split discipline). Step 2 consumes step 1's λ, so the
  // data-dependent chain is genuinely replayed by the oracle (the
  // q123 rigor). Train tables are keyed aggregates broadcast-joined
  // onto eval bigrams; per-bigram weights are 9-dp decimal-summed;
  // eval bigrams whose token never occurs in train (p₁ = p₂ = 0) are
  // excluded as OOV rather than inventing a posterior.
  def deletedInterpolation: Q = {
    val stepSql = (prev: String) =>
      s"""round(($prev * p2) / ($prev * p2 + (1.0 - $prev) * p1), 9)"""
    Q(
      "q291_deleted_interpolation",
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |tr AS (SELECT t FROM toks WHERE doc_id % 2 = 0),
         |ev AS (SELECT t FROM toks WHERE doc_id % 2 = 1),
         |tu AS (SELECT tok, count(*) AS c FROM
         |    (SELECT unnest(t) AS tok FROM tr) GROUP BY tok),
         |tn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tu),
         |tb AS (SELECT t[i] AS a, t[i+1] AS b, count(*) AS c FROM tr,
         |    UNNEST(range(1, len(t))) AS u(i) WHERE len(t) >= 2 GROUP BY 1, 2),
         |tc AS (SELECT a, CAST(sum(c) AS BIGINT) AS ca FROM tb GROUP BY a),
         |eb AS (SELECT t[i] AS a, t[i+1] AS b FROM ev,
         |    UNNEST(range(1, len(t))) AS u(i) WHERE len(t) >= 2),
         |pr AS (SELECT
         |    CAST(coalesce(tu.c, 0) AS DOUBLE) / (SELECT n FROM tn) AS p1,
         |    CASE WHEN tc.ca IS NULL THEN 0.0
         |         ELSE CAST(coalesce(tb.c, 0) AS DOUBLE) / tc.ca END AS p2
         |  FROM eb
         |  LEFT JOIN tu ON tu.tok = eb.b
         |  LEFT JOIN tc ON tc.a = eb.a
         |  LEFT JOIN tb ON tb.a = eb.a AND tb.b = eb.b),
         |pv AS (SELECT p1, p2 FROM pr WHERE p1 > 0 OR p2 > 0),
         |s1 AS (SELECT CAST(count(*) AS BIGINT) AS n_eval,
         |    round(CAST(sum(CAST(${stepSql("0.5")} AS DECIMAL(18,9))) AS DOUBLE)
         |      / count(*), 9) AS l1
         |  FROM pv),
         |s2 AS (SELECT n_eval, l1,
         |    round(CAST(sum(CAST(${stepSql("l1")} AS DECIMAL(18,9))) AS DOUBLE)
         |      / max(n_eval), 9) AS l2
         |  FROM pv CROSS JOIN s1 GROUP BY n_eval, l1)
         |SELECT n_eval, round(l1, 6) AS lambda1, round(l2, 6) AS lambda2
         |FROM s2""".stripMargin,
    ) { (s, dir) =>
      val t = TextAnalysis.tokens(col("text"))
      val toks = Tables.documents(s, dir).select(col("doc_id"), t.as("t"))
      val tr = graft.dedup.Dedup.persistTracked(
        toks.filter(col("doc_id") % 2 === 0).select("t"))
      val ev = toks.filter(col("doc_id") % 2 === 1).select("t")
      val tu = tr.select(explode(col("t")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
      val tn = tu.agg(sum("c").cast("long").as("n"))
      def bigrams(df: org.apache.spark.sql.DataFrame) =
        df.filter(size(col("t")) >= 2)
          .select(explode(graft.functions.AdjacentPairs(col("t"))).as("p"))
          .select(col("p.a"), col("p.b"))
      val tb = bigrams(tr).groupBy("a", "b").agg(count(lit(1)).as("c"))
      val tc = tb.groupBy("a").agg(sum("c").cast("long").as("ca"))
      val eb = bigrams(ev)
      val pr = eb
        .join(broadcast(tu.withColumnRenamed("tok", "b")
          .withColumnRenamed("c", "cu")), Seq("b"), "left")
        .join(broadcast(tc), Seq("a"), "left")
        .join(broadcast(tb.withColumnRenamed("c", "cb")), Seq("a", "b"), "left")
        .crossJoin(broadcast(tn))
        .select(
          (coalesce(col("cu"), lit(0L)).cast("double") / col("n")).as("p1"),
          when(col("ca").isNull, 0.0)
            .otherwise(coalesce(col("cb"), lit(0L)).cast("double") / col("ca"))
            .as("p2"))
      val pv = graft.dedup.Dedup.persistTracked(
        pr.filter(col("p1") > 0 || col("p2") > 0))
      def step(prev: org.apache.spark.sql.Column) =
        round(try_divide(prev * col("p2"),
          prev * col("p2") + (lit(1.0) - prev) * col("p1")), 9)
      val s1 = pv.agg(count(lit(1)).cast("long").as("n_eval"),
        round(sum(step(lit(0.5)).cast("decimal(18,9)")).cast("double") /
          count(lit(1)), 9).as("l1"))
      val s2 = pv.crossJoin(broadcast(s1))
        .groupBy("n_eval", "l1")
        .agg(round(sum(step(col("l1")).cast("decimal(18,9)")).cast("double") /
          max(col("n_eval")), 9).as("l2"))
      s2.select(col("n_eval"), round(col("l1"), 6).as("lambda1"),
        round(col("l2"), 6).as("lambda2"))
    }
  }

  // --- q298: Burrows' Delta stylometric distance between sources ---------------
  // JS divergence (q284) compares WHAT sources say; Burrows' Delta —
  // the standard stylometry measure — compares HOW: mean |z-score
  // gap| over the most frequent words, where z normalizes each word's
  // relative frequency by its across-source spread. Two template
  // farms with different vocabularies can sit far apart in JS yet
  // near in Delta (same functional style). Top-30 words by corpus
  // frequency (bounded TakeOrdered), dense source×word grid,
  // per-word moments over the sources-sized table, and a
  // sources²×30 pair join — nothing scales with the corpus after the
  // one term-frequency aggregate. Zero-spread words (σ = 0) are
  // excluded from the mean rather than inventing a z.
  def burrowsDelta: Q = Q(
    "q298_burrows_delta",
    """WITH tc AS (SELECT source, tok, count(*) AS c FROM
      |    (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY 1, 2),
      |top AS (SELECT tok FROM (SELECT tok, sum(c) AS tc FROM tc GROUP BY tok
      |  ORDER BY tc DESC, tok LIMIT 30)),
      |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM tc GROUP BY source),
      |grid AS (SELECT s.source, t.tok,
      |    round(CAST(coalesce(c.c, 0) AS DOUBLE) / s.n, 9) AS f
      |  FROM ns s CROSS JOIN top t
      |  LEFT JOIN tc c ON c.source = s.source AND c.tok = t.tok),
      |mo AS (SELECT tok,
      |    CAST(sum(CAST(f AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS mu,
      |    CAST(sum(CAST(round(f * f, 9) AS DECIMAL(18,9))) AS DOUBLE) / count(*)
      |      - (CAST(sum(CAST(f AS DECIMAL(18,9))) AS DOUBLE) / count(*))
      |        * (CAST(sum(CAST(f AS DECIMAL(18,9))) AS DOUBLE) / count(*)) AS v
      |  FROM grid GROUP BY tok),
      |z AS (SELECT g.source, g.tok, round((g.f - mo.mu) / sqrt(mo.v), 9) AS z
      |  FROM grid g JOIN mo ON mo.tok = g.tok WHERE mo.v > 0),
      |pairs AS (SELECT a.source AS src_a, b.source AS src_b,
      |    round(abs(a.z - b.z), 9) AS az
      |  FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source)
      |SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_words,
      |  round(CAST(sum(CAST(az AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6) AS delta
      |FROM pairs GROUP BY src_a, src_b ORDER BY src_a, src_b""".stripMargin,
  ) { (s, dir) =>
    val tc = graft.dedup.Dedup.persistTracked(Tables.documents(s, dir)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c")))
    val top = tc.groupBy("tok").agg(sum("c").as("tc"))
      .orderBy(col("tc").desc, col("tok")).limit(30).select("tok")
    val ns = tc.groupBy("source").agg(sum("c").cast("long").as("n"))
    val grid = graft.dedup.Dedup.persistTracked(ns.crossJoin(broadcast(top))
      .join(tc, Seq("source", "tok"), "left")
      .select(col("source"), col("tok"),
        round(coalesce(col("c"), lit(0L)).cast("double") / col("n"), 9).as("f")))
    val m = sum(col("f").cast("decimal(18,9)")).cast("double") / count(lit(1))
    val mo = grid.groupBy("tok").agg(m.as("mu"),
      (sum(round(col("f") * col("f"), 9).cast("decimal(18,9)")).cast("double")
        / count(lit(1)) - m * m).as("v"))
    val z = grid.join(broadcast(mo), "tok").filter(col("v") > 0)
      .select(col("source"), col("tok"),
        round((col("f") - col("mu")) / sqrt(col("v")), 9).as("z"))
    val a = z.select(col("source").as("src_a"), col("tok"), col("z").as("za"))
    val b = z.select(col("source").as("src_b"), col("tok"), col("z").as("zb"))
    a.join(b, Seq("tok")).filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        round(abs(col("za") - col("zb")), 9).as("az"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).cast("long").as("n_words"),
        round(sum(col("az").cast("decimal(18,9)")).cast("double")
          / count(lit(1)), 6).as("delta"))
      .orderBy("src_a", "src_b")
  }

  // --- q299: marginal-novelty curve over corpus order ---------------------------
  // Curriculum/ordering audit: consuming docs in doc_id order, how
  // much NEW trigram mass does each tenth of the corpus contribute?
  // A front-loaded corpus (novelty collapsing after decile 2) means
  // later epochs retread old n-grams; flat novelty means the order
  // keeps teaching. Each distinct shingle is attributed to its FIRST
  // doc (one min-aggregate — no ordered scan), docs land in id-range
  // deciles via integer arithmetic against the max id (the corpus ids
  // are dense; the stance avoids a corpus-wide rank window), and the
  // curve is a 10-row cumulative.
  def noveltyCurve: Q = Q(
    "q299_novelty_curve",
    """WITH dd AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |mx AS (SELECT max(doc_id) AS mid, CAST(count(*) AS BIGINT) AS n_docs FROM dd),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM dd,
      |    UNNEST(list_transform(range(1, len(t) - 1),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
      |  WHERE len(t) >= 3),
      |fst AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle),
      |dec AS (SELECT least(first_doc * 10 // (mid + 1), 9) AS decile
      |  FROM fst CROSS JOIN mx),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_sh FROM fst),
      |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS new_shingles
      |  FROM dec GROUP BY decile),
      |gc AS (SELECT decile, new_shingles,
      |    CAST(sum(new_shingles) OVER (ORDER BY decile) AS BIGINT) AS cum FROM g)
      |SELECT CAST(decile AS BIGINT) AS decile, new_shingles,
      |  round(CAST(new_shingles AS DOUBLE) / n_sh, 6) AS novelty_share,
      |  round(CAST(cum AS DOUBLE) / n_sh, 6) AS cum_coverage
      |FROM gc CROSS JOIN tot ORDER BY decile""".stripMargin,
  ) { (s, dir) =>
    val t = TextAnalysis.tokens(col("text"))
    val dd = Tables.documents(s, dir)
    val mx = dd.agg(max("doc_id").as("mid"),
      count(lit(1)).cast("long").as("n_docs"))
    val sh = dd.filter(size(t) >= 3)
      .select(col("doc_id"), t.as("t"))
      .select(col("doc_id"),
        explode(graft.functions.WordNGrams(col("t"), 3, distinct = false)).as("shingle"))
      .distinct()
    val fst = graft.dedup.Dedup.persistTracked(
      sh.groupBy("shingle").agg(min("doc_id").as("first_doc")))
    val dec = fst.crossJoin(broadcast(mx))
      .select(least(expr("first_doc * 10 div (mid + 1)"), lit(9L)).as("decile"))
    val tot = fst.agg(count(lit(1)).cast("long").as("n_sh"))
    val g = dec.groupBy("decile").agg(count(lit(1)).cast("long").as("new_shingles"))
    val gc = g.withColumn("cum",
      sum("new_shingles").over(Window.orderBy("decile")).cast("long"))
    gc.crossJoin(broadcast(tot))
      .select(col("decile").cast("long").as("decile"), col("new_shingles"),
        round(col("new_shingles").cast("double") / col("n_sh"), 6)
          .as("novelty_share"),
        round(col("cum").cast("double") / col("n_sh"), 6).as("cum_coverage"))
      .orderBy("decile")
  }

  // --- q312: per-source quality drift over crawl order --------------------------
  // q117 fits trends on EVENT volume; the curation twin asks "is this
  // SOURCE degrading as the crawl progresses" — the early-warning
  // audit before a source's recent batches pollute the mix. OLS slope
  // of the 4-dp quality score against doc_id (crawl order) per
  // source, from exact moments in ONE keyed aggregate: Σx/Σx² are
  // integer sums, Σy and Σxy are DECIMAL-exact at scale 4 (doc_id ×
  // 4-dp score terminates there), and the cancelling closed form runs
  // on doubles multiplied in the same order in both engines
  // (double-first products — n·Σx² overflows BIGINT long before a
  // 100-TB crawl does). Slope is reported per 1000 docs (a per-doc
  // slope rounds to zero at 6 dp), znormed; a single-doc source NULLs
  // via the vanishing denominator (DuckDB's x/0). The verdict label
  // compares the ROUNDED slope so both engines label identically.
  def sourceQualityDrift: Q = Q(
    "q312_source_quality_drift",
    s"""WITH d AS (SELECT source, doc_id,
       |    round(${TextSqlFragments.qualitySql("string_split(text, ' ')")}, 4) AS q
       |  FROM documents),
       |m AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(doc_id) AS BIGINT) AS sx,
       |    CAST(sum(CAST(q AS DECIMAL(18,4))) AS DOUBLE) AS sy,
       |    CAST(sum(CAST(q AS DECIMAL(18,4)) * doc_id) AS DOUBLE) AS sxy,
       |    CAST(sum(doc_id * doc_id) AS BIGINT) AS sxx
       |  FROM d GROUP BY source),
       |f AS (SELECT source, n, round(sy / n, 6) AS avg_quality,
       |    round(1000.0 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
       |      / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6) + 0.0
       |      AS slope_per_1k
       |  FROM m)
       |SELECT source, n AS n_docs, avg_quality, slope_per_1k,
       |  CASE WHEN slope_per_1k > 0 THEN 'improving'
       |       WHEN slope_per_1k < 0 THEN 'degrading' ELSE 'flat' END AS verdict
       |FROM f ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    val m = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"),
        round(TextAnalysis.qualityScore(col("text")), 4).as("q"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(col("doc_id")).as("sx"),
        sum(col("q").cast("decimal(18,4)")).cast("double").as("sy"),
        sum(col("q").cast("decimal(18,4)") * col("doc_id")).cast("double").as("sxy"),
        sum(col("doc_id") * col("doc_id")).as("sxx"))
    val slope = znorm(round(lit(1000.0)
      * (col("n").cast("double") * col("sxy") - col("sx").cast("double") * col("sy"))
      / (col("n").cast("double") * col("sxx") - col("sx").cast("double") * col("sx")), 6))
    m.select(col("source"), col("n").as("n_docs"),
        round(col("sy") / col("n"), 6).as("avg_quality"),
        slope.as("slope_per_1k"))
      .withColumn("verdict",
        when(col("slope_per_1k") > 0, "improving")
          .when(col("slope_per_1k") < 0, "degrading").otherwise("flat"))
      .orderBy("source")
  }

  // --- q351: count-min sketch heavy-hitter shingles ---------------------------
  // Completes the mergeable-sketch family: HLL (q56) answers
  // cardinality, KMV (q348) set operations — CMS (Cormode &
  // Muthukrishnan 2005) answers POINT FREQUENCY: d=4 hash rows × w=1024
  // counters, estimate = min over rows, one-sided error (never under,
  // over by ≲ N/w with prob 1−(1/2)^d). Applied to the document
  // frequency of 3-gram shingles — the boilerplate signal q107's df
  // cap needs, countable at 100 TB without keeping the shingle
  // vocabulary. The sketch is LINEAR, so building it from the
  // (shingle, df) histogram is bit-identical to per-partition sketches
  // merged by cell addition — the map-side-combined aggregate into
  // ≤ d·w cells IS the merge. Hashes are the engine-portable
  // polynomial fold salted per row (the q348/q206 rule), so DuckDB
  // replays cells, probes, and the min fold exactly. The exact df
  // rides along as the honesty column — collision inflation is
  // VISIBLE in the output (16k+ shingles over 1024 counters/row), not
  // asserted away.
  def cmsHeavyHitters: Q = {
    val d = 4
    val w = 1024
    val P = 1000000007L
    val A = Seq(3L, 5L, 7L, 11L)
    val B = Seq(17L, 1017L, 2017L, 3017L)
    val acase = s"(CASE r ${A.indices.map(i => s"WHEN $i THEN ${A(i)}").mkString(" ")} END)"
    val bcase = s"(CASE r ${B.indices.map(i => s"WHEN $i THEN ${B(i)}").mkString(" ")} END)"
    Q(
      "q351_cms_heavy_hitters",
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |sh AS (SELECT DISTINCT doc_id, shingle FROM toks,
         |       UNNEST(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(shingle)
         |       WHERE len(t) >= 3),
         |tc AS (SELECT shingle, CAST(count(*) AS BIGINT) AS c FROM sh GROUP BY shingle),
         |th AS (SELECT shingle, c, list_reduce(list_prepend(CAST(0 AS BIGINT),
         |    list_transform(string_split(shingle, ''), ch -> CAST(ascii(ch) AS BIGINT))),
         |    (h, b) -> (h * 131 + b) % $P) AS h FROM tc),
         |cells AS (SELECT r, (th.h * $acase + $bcase) % $P % $w AS cell,
         |    CAST(sum(c) AS BIGINT) AS n
         |  FROM th, UNNEST(range(0, $d)) AS u(r) GROUP BY 1, 2),
         |cand AS (SELECT shingle, c, h FROM th ORDER BY c DESC, shingle LIMIT 20),
         |probe AS (SELECT shingle, c, r, (h * $acase + $bcase) % $P % $w AS cell
         |  FROM cand, UNNEST(range(0, $d)) AS u(r)),
         |est AS (SELECT probe.shingle, probe.c, min(cells.n) AS est
         |  FROM probe JOIN cells ON cells.r = probe.r AND cells.cell = probe.cell
         |  GROUP BY 1, 2)
         |SELECT shingle, c AS exact_df, est AS est_df, est - c AS inflation
         |FROM est ORDER BY exact_df DESC, shingle""".stripMargin,
    ) { (s, dir) =>
      def cellOf(h: Column, r: Int): Column =
        pmod(h * lit(A(r)) + lit(B(r)), lit(P)) % w
      val tc = Dedup.persistTracked(
        Dedup.shingleTable(Tables.documents(s, dir), "doc_id", "text")
          .groupBy("shingle").agg(count(lit(1)).as("c"))
          .select(col("shingle"), col("c"), Dedup.polyTokenHash(col("shingle")).as("h")))
      // the d×w counter matrix: d cell coordinates per vocab row, then
      // one map-side-combined aggregate into ≤ d·w cells
      val cells = tc
        .select(col("c"), posexplode(array((0 until d).map(r => cellOf(col("h"), r)): _*))
          .as(Seq("r", "cell")))
        .groupBy("r", "cell").agg(sum("c").as("n"))
      // top-20 exact heavy hitters (bounded TakeOrdered), probed against
      // the broadcast cell table; estimate = min over the d rows
      val cand = tc.orderBy(col("c").desc, col("shingle")).limit(20)
        .select(col("shingle"), col("c"),
          posexplode(array((0 until d).map(r => cellOf(col("h"), r)): _*))
            .as(Seq("r", "cell")))
      cand.join(broadcast(cells), Seq("r", "cell"))
        .groupBy("shingle", "c").agg(min("n").as("est"))
        .select(col("shingle"), col("c").as("exact_df"), col("est").as("est_df"),
          (col("est") - col("c")).as("inflation"))
        .orderBy(col("exact_df").desc, col("shingle"))
    }
  }

  // --- q353: mergeable log-bin quantile sketch ------------------------------
  // The QUANTILE member of the mergeable-sketch family (HLL =
  // cardinality q56, KMV = set ops q348, CMS = point frequency
  // q112/q351): per-language p50/p90/p99 of document length WITHOUT a
  // per-group sort of the corpus. Values bin into integer-exact log
  // bins — exact below 16, then 8 sub-bins per power of two (relative
  // error ≤ 1/8, the bin bounds ride along so the error bound is
  // VISIBLE per row, not asserted) — via bit-length arithmetic
  // (length(bin(v)), shifts, integer div), so both engines compute
  // identical bins with zero float boundaries. The histogram is
  // LINEAR: per-partition (lang, bin) counts merged by addition IS the
  // sketch merge, which is what makes it a one-aggregate 100 TB op —
  // ~300 cells/lang of state, windows and the ×3-fraction explode run
  // on the bounded histogram only, never the corpus. The quantile read
  // is rank r = ceil(q·n) into the cumulative histogram with uniform
  // within-bin interpolation — straight-line IEEE arithmetic DuckDB
  // replays bit-identically (round-6 is boundary-safe on division
  // results: x.0000005 has no exact double).
  def logbinQuantiles: Q = Q(
    "q353_logbin_quantiles",
    """WITH v AS (SELECT lang, n_chars AS v FROM documents WHERE n_chars >= 1),
      |e AS (SELECT lang, v, length(bin(v)) AS e FROM v),
      |pw AS (SELECT lang, v,
      |    CASE WHEN v < 16 THEN CAST(0 AS BIGINT)
      |         ELSE (CAST(1 AS BIGINT) << (e - 1)) END AS pv,
      |    CASE WHEN v < 16 THEN CAST(1 AS BIGINT)
      |         ELSE (CAST(1 AS BIGINT) << (e - 1)) // 8 END AS w
      |  FROM e),
      |bins AS (SELECT lang,
      |    CASE WHEN v < 16 THEN v ELSE pv + ((v - pv) // w) * w END AS lo,
      |    CASE WHEN v < 16 THEN v ELSE pv + ((v - pv) // w) * w + w - 1 END AS hi
      |  FROM pw),
      |hist AS (SELECT lang, lo, hi, CAST(count(*) AS BIGINT) AS cnt
      |  FROM bins GROUP BY 1, 2, 3),
      |c AS (SELECT lang, lo, hi, cnt,
      |    CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY lo) AS BIGINT) AS cum,
      |    CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS tot
      |  FROM hist),
      |qs AS (SELECT lang, lo, hi, cnt, cum, tot, q,
      |    CAST(ceil(q * tot) AS BIGINT) AS r
      |  FROM c, UNNEST([0.5::DOUBLE, 0.9::DOUBLE, 0.99::DOUBLE]) AS u(q))
      |SELECT lang, q AS p, tot AS n_docs, lo AS bin_lo, hi AS bin_hi,
      |  round(lo + (hi - lo) * CAST(r - (cum - cnt) AS DOUBLE) / cnt, 6) AS est
      |FROM qs WHERE cum >= r AND cum - cnt < r
      |ORDER BY lang, p""".stripMargin,
  ) { (s, dir) =>
    val binned = Tables.documents(s, dir)
      .filter(col("n_chars") >= 1)
      .select(col("lang"), col("n_chars").as("v"))
      .withColumn("e", length(bin(col("v"))))
      .withColumn("pv", expr(
        "CASE WHEN v < 16 THEN CAST(0 AS BIGINT) ELSE shiftleft(CAST(1 AS BIGINT), e - 1) END"))
      .withColumn("w", expr(
        "CASE WHEN v < 16 THEN CAST(1 AS BIGINT) ELSE pv div 8 END"))
      .withColumn("lo", expr(
        "CASE WHEN v < 16 THEN v ELSE pv + ((v - pv) div w) * w END"))
      .withColumn("hi", expr(
        "CASE WHEN v < 16 THEN v ELSE lo + w - 1 END"))
    val hist = binned.groupBy("lang", "lo", "hi").agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy("lang").orderBy("lo")
    val wTot = Window.partitionBy("lang")
    hist
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("tot", sum("cnt").over(wTot))
      .withColumn("q", explode(array(lit(0.5), lit(0.9), lit(0.99))))
      .withColumn("r", ceil(col("q") * col("tot")))
      .filter(col("cum") >= col("r") && col("cum") - col("cnt") < col("r"))
      .select(col("lang"), col("q").as("p"), col("tot").as("n_docs"),
        col("lo").as("bin_lo"), col("hi").as("bin_hi"),
        round(col("lo") + (col("hi") - col("lo"))
          * (col("r") - (col("cum") - col("cnt"))).cast("double") / col("cnt"), 6)
          .as("est"))
      .orderBy("lang", "p")
  }
}
