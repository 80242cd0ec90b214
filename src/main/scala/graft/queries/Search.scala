package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.similarity.Similarity

/** Lexical retrieval and hybrid fusion — the search-serving side of
  * the corpus: BM25 keyword scoring next to the dense-ANN family
  * (q45+), fused by reciprocal-rank fusion the way production hybrid
  * search does it. The `documents`/`embeddings` tables are aligned by
  * id (vec_id i is doc i's embedding) — the corpus convention.
  */
object Search {

  val all: Seq[Q] = Seq(bm25, hybridRrf, mmrRerank, qlDirichlet, phraseSearch)

  // --- q346: phrase search (positional retrieval) ----------------------------
  // Everything else in this module is bag-of-words; real search
  // engines also answer QUOTED queries, which need token POSITIONS.
  // Score = Σ_phrases ln(1+ptf)·ln(N/df_p) over exact adjacent-bigram
  // matches — the positional-index computation expressed as dataflow:
  // one bigram projection per doc (map-side transform over the token
  // array, the q278 shape), filtered to the query phrases BEFORE any
  // shuffle (the inverted-index property: only docs containing a
  // phrase reach the aggregate), phrase document frequencies broadcast
  // back. Log terms 9-dp round-then-DECIMAL-sum as always.
  def phraseSearch: Q = {
    val phrases = Seq("hash join", "sort merge")
    val phraseSql = phrases.map(p => s"'$p'").mkString("(", ", ", ")")
    Q(
      "q346_phrase_search",
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         |bg AS (SELECT doc_id,
         |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))
         |      AS gram
         |  FROM t WHERE len(t) >= 2),
         |pf AS (SELECT doc_id, gram, count(*) AS ptf FROM bg
         |       WHERE gram IN $phraseSql GROUP BY 1, 2),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
         |dfp AS (SELECT gram, CAST(count(*) AS DOUBLE) AS df FROM pf GROUP BY gram),
         |sc AS (SELECT pf.doc_id,
         |    round(ln(1 + pf.ptf) * ln(n.n / dfp.df), 9) AS s
         |  FROM pf JOIN dfp USING (gram), n)
         |SELECT doc_id,
         |  round(CAST(sum(CAST(s AS DECIMAL(18,9))) AS DOUBLE), 6) AS phrase_score
         |FROM sc GROUP BY doc_id
         |ORDER BY phrase_score DESC, doc_id LIMIT 15""".stripMargin,
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val t = split(col("text"), " ")
      val bg = docs.filter(size(t) >= 2)
        .select(col("doc_id"),
          explode(graft.functions.WordNGrams(t, 2, distinct = false)).as("gram"))
      // pf feeds both the df aggregate and the scoring join — persist
      // so the bigram projection scans the corpus once
      val pf = graft.dedup.Dedup.persistTracked(
        bg.filter(col("gram").isin(phrases: _*))
          .groupBy("doc_id", "gram").agg(count(lit(1)).as("ptf")))
      val n = docs.agg(count(lit(1)).cast("double").as("n"))
      val dfp = pf.groupBy("gram").agg(count(lit(1)).cast("double").as("df"))
      pf.join(broadcast(dfp), "gram").crossJoin(broadcast(n))
        .select(col("doc_id"),
          round(log(lit(1) + col("ptf")) * log(col("n") / col("df")), 9).as("s"))
        .groupBy("doc_id").agg(round(dsum(col("s"), 9), 6).as("phrase_score"))
        .orderBy(col("phrase_score").desc, col("doc_id")).limit(15)
    }
  }

  // BM25 parameters (the universal defaults) and the demo query terms.
  // defs, not vals: `val all` above runs at object init, before vals
  // declared below it (the Embeddings.EmbDim rule)
  private def K1 = 1.2
  private def B = 0.75
  private def Terms = Seq("hash", "join", "window")
  private def termsSql = Terms.map(t => s"'$t'").mkString("(", ", ", ")")

  // Shared q145/q146 BM25 pipeline in SQL: per-doc term frequencies,
  // document lengths, corpus stats, and the 9-dp-rounded per-term
  // scores DECIMAL-summed per doc (the exact-sum rule — also what
  // makes the chain engine-replicable).
  private def bm25Sql: String =
    s"""tokc AS (SELECT doc_id, tok, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY doc_id, tok),
      |dl AS (SELECT doc_id, sum(tf) AS dl FROM tokc GROUP BY doc_id),
      |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
      |ad AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
      |dft AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tokc
      |        WHERE tok IN $termsSql GROUP BY tok),
      |tsc AS (SELECT t.doc_id,
      |    round(ln((nn.n - f.df + CAST(0.5 AS DOUBLE)) / (f.df + CAST(0.5 AS DOUBLE))
      |             + CAST(1 AS DOUBLE))
      |      * (CAST(t.tf AS DOUBLE) * CAST(${K1 + 1} AS DOUBLE))
      |      / (CAST(t.tf AS DOUBLE) + CAST($K1 AS DOUBLE)
      |         * (CAST(${1 - B} AS DOUBLE) + CAST($B AS DOUBLE) * d.dl / a.avgdl)), 9) AS s
      |  FROM tokc t JOIN dft f USING (tok) JOIN dl d USING (doc_id), nn, ad a),
      |bm AS (SELECT doc_id, CAST(sum(CAST(s AS DECIMAL(18,9))) AS DOUBLE) AS bm25
      |       FROM tsc GROUP BY doc_id)""".stripMargin

  /** The Spark twin of [[bm25Sql]]: (doc_id, bm25). One token explode
    * feeds tf, dl, and df; corpus scalars ride a 1-row broadcast; the
    * per-term score join is keyed on doc_id (df side is |Terms| rows,
    * broadcast).
    */
  private def bm25Scores(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = Tables.documents(s, dir)
    val tokc = graft.dedup.Dedup.persistTracked(
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf")))
    val dl = tokc.groupBy("doc_id").agg(sum("tf").as("dl"))
    val nn = docs.agg(count(lit(1)).cast("double").as("n"))
    val ad = dl.agg((sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val dft = tokc.filter(col("tok").isin(Terms: _*))
      .groupBy("tok").agg(count(lit(1)).cast("double").as("df"))
    tokc.join(broadcast(dft), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(nn)).crossJoin(broadcast(ad)) // 1-row scalars
      .select(col("doc_id"),
        round(log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
          * (col("tf").cast("double") * lit(K1 + 1))
          / (col("tf").cast("double")
            + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl"))), 9).as("s"))
      .groupBy("doc_id").agg(dsum(col("s"), 9).as("bm25"))
  }

  // --- q145: BM25 keyword retrieval ----------------------------------------
  // Okapi BM25 (Robertson/Spärck Jones) over the token table — the
  // lexical retriever every corpus serving stack pairs with dense
  // ANN. Scale shape: one token explode feeds tf/dl/df; the df table
  // is |query terms| rows (broadcast); corpus stats are 1-row
  // broadcast scalars; scoring touches only docs containing a query
  // term (the tf⋈df join — the inverted-index property); top-k is
  // TakeOrderedAndProject. Fully oracle-checked: idf, length
  // normalization, decimal term sums, ranking.
  def bm25: Q = Q(
    "q145_bm25_search",
    s"""WITH $bm25Sql
      |SELECT doc_id, round(bm25, 6) AS bm25
      |FROM bm ORDER BY bm25 DESC, doc_id LIMIT 15""".stripMargin,
  ) { (s, dir) =>
    bm25Scores(s, dir)
      .orderBy(col("bm25").desc, col("doc_id")).limit(15)
      .select(col("doc_id"), round(col("bm25"), 6).as("bm25"))
  }

  // --- q338: query-likelihood retrieval (Dirichlet smoothing) ---------------
  // The third classical ranker next to TF-IDF (q108) and BM25 (q145):
  // the language-modeling school (Zhai & Lafferty 2001) — score(q,d) =
  // Σ_{w∈q} ln(1 + tf·|C| / (μ·cf_w)) + |q|·ln(μ/(dl+μ)), μ = 2000.
  // Absent terms contribute ln(1) = 0 exactly, so restricting the sum
  // to the tf⋈cf join (the inverted-index property — only docs
  // containing a query term are scored) is lossless, not an
  // approximation. Shares q145's persisted token-count table
  // (identical plan → one materialization per corpus via
  // CacheManager); corpus mass and per-term collection frequencies are
  // broadcast scalars. Determinism: both ln terms round to 9 dp before
  // the DECIMAL doc sum (the repo's round-then-sum rule for
  // transcendentals), final 6 dp + signed-zero normalization.
  def qlDirichlet: Q = {
    val mu = 2000.0
    Q(
      "q338_ql_dirichlet",
      s"""WITH tokc AS (SELECT doc_id, tok, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
         |  GROUP BY doc_id, tok),
         |dl AS (SELECT doc_id, sum(tf) AS dl FROM tokc GROUP BY doc_id),
         |tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS c FROM tokc),
         |cf AS (SELECT tok, CAST(sum(tf) AS DOUBLE) AS cf FROM tokc
         |       WHERE tok IN $termsSql GROUP BY tok),
         |s1 AS (SELECT t.doc_id,
         |    round(ln(CAST(1 AS DOUBLE)
         |      + CAST(t.tf AS DOUBLE) * tot.c / (CAST($mu AS DOUBLE) * f.cf)), 9) AS s
         |  FROM tokc t JOIN cf f USING (tok), tot),
         |agg AS (SELECT doc_id, CAST(sum(CAST(s AS DECIMAL(18,9))) AS DOUBLE) AS s1
         |        FROM s1 GROUP BY doc_id),
         |sc AS (SELECT a.doc_id,
         |    round(a.s1 + ${Terms.length}
         |      * round(ln(CAST($mu AS DOUBLE) / (d.dl + CAST($mu AS DOUBLE))), 9), 6)
         |      + 0.0 AS ql
         |  FROM agg a JOIN dl d USING (doc_id))
         |SELECT doc_id, ql FROM sc ORDER BY ql DESC, doc_id LIMIT 15""".stripMargin,
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val tokc = graft.dedup.Dedup.persistTracked(
        docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf")))
      val dl = tokc.groupBy("doc_id").agg(sum("tf").as("dl"))
      val tot = tokc.agg(sum("tf").cast("double").as("c"))
      val cf = tokc.filter(col("tok").isin(Terms: _*))
        .groupBy("tok").agg(sum("tf").cast("double").as("cf"))
      val s1 = tokc.join(broadcast(cf), "tok").crossJoin(broadcast(tot))
        .select(col("doc_id"),
          round(log(lit(1.0) + col("tf").cast("double") * col("c")
            / (lit(mu) * col("cf"))), 9).as("s"))
        .groupBy("doc_id").agg(dsum(col("s"), 9).as("s1"))
      s1.join(dl, "doc_id")
        .select(col("doc_id"),
          znorm(round(col("s1") + lit(Terms.length)
            * round(log(lit(mu) / (col("dl") + lit(mu))), 9), 6)).as("ql"))
        .orderBy(col("ql").desc, col("doc_id")).limit(15)
    }
  }

  // --- q146: hybrid retrieval via reciprocal-rank fusion -------------------
  // The production hybrid-search combiner (Cormack et al. 2009):
  // fuse the BM25 top-100 and the dense-cosine top-100 (query =
  // vec 0) by Σ 1/(60 + rank), absent docs at rank 1000. Ranking
  // windows run over the two bounded top-100 tables ONLY (each
  // produced by TakeOrderedAndProject — the q130 bounded-table rule),
  // so no corpus-sized single-partition sort exists; the fusion is a
  // full outer join of two 100-row sides. Oracle-checked end-to-end:
  // both rankings and the fused score replicate in DuckDB (the dense
  // side reuses q45's list-fold cosine).
  def hybridRrf: Q = {
    val dim = Similarity.Dim
    def sqlDot(a: String, b: String) =
      s"list_reduce(list_transform(range(1, ${dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
    def sqlCos(a: String, b: String) =
      s"(${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)})))"
    Q(
      "q146_hybrid_rrf",
      s"""WITH $bm25Sql,
        |bmtop AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 100),
        |bmr AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rk_l
        |        FROM bmtop),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |cs AS (SELECT vec_id, round(${sqlCos("embedding", "qv")}, 6) AS cos_sim
        |       FROM embeddings, q WHERE vec_id <> 0),
        |cstop AS (SELECT vec_id, cos_sim FROM cs ORDER BY cos_sim DESC, vec_id LIMIT 100),
        |csr AS (SELECT vec_id AS doc_id,
        |        row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rk_d FROM cstop),
        |fused AS (SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
        |    CAST(1 AS DOUBLE) / (60 + coalesce(l.rk_l, 1000))
        |  + CAST(1 AS DOUBLE) / (60 + coalesce(d.rk_d, 1000)) AS rrf
        |  FROM bmr l FULL OUTER JOIN csr d ON l.doc_id = d.doc_id)
        |SELECT doc_id, round(rrf, 6) AS rrf
        |FROM fused ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
    ) { (s, dir) =>
      val bmtop = bm25Scores(s, dir)
        .orderBy(col("bm25").desc, col("doc_id")).limit(100)
      // bounded 100-row table: the single-partition ranking window is fine
      val bmr = bmtop.withColumn("rk_l",
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))))
        .select("doc_id", "rk_l")
      val csr = Similarity.bruteForceTopK(
          Tables.embeddings(s, dir), "vec_id", "embedding", 0L, 100)
        .withColumn("rk_d",
          row_number().over(Window.orderBy(col("cos_sim").desc, col("vec_id"))))
        .select(col("vec_id").as("doc_id"), col("rk_d"))
      bmr.join(csr, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          (lit(1.0) / (lit(60) + coalesce(col("rk_l"), lit(1000)))
            + lit(1.0) / (lit(60) + coalesce(col("rk_d"), lit(1000)))).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(10)
        .select(col("doc_id"), round(col("rrf"), 6).as("rrf"))
    }
  }

  // --- q235: MMR-diversified re-ranking ------------------------------------
  // Maximal Marginal Relevance (Carbonell & Goldstein 1998) — the
  // diversification pass a RAG retriever runs AFTER top-k: greedily
  // pick 5 of the top-12 candidates maximizing λ·rel − (1−λ)·max
  // similarity to what's already picked (λ = 0.7), so near-duplicate
  // hits don't crowd the context window. Scale split per the q219
  // rule: the corpus-scale work is ONE batched exact top-k scan
  // (3 query panel, broadcast, rounded cosines); the greedy loop then
  // runs as driver arithmetic on the 36-row candidate set — a
  // DataFrame formulation of a 5-round loop over ≤12 rows only buys
  // AQE scheduling latency. Engine parity: rels and pairwise sims are
  // 6-dp rounded + signed-zero normalized, each round's score is 9-dp
  // HALF_UP requantized, ties break (score desc, id asc), and the
  // DuckDB oracle replays candidate generation, the 12×12 sim matrix,
  // and all five greedy rounds as chained CTEs — the full serving
  // computation, hash-checked.
  def mmrRerank: Q = {
    val dim = Similarity.Dim
    def sqlDot(a: String, b: String) =
      s"list_reduce(list_transform(range(1, ${dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"
    def sqlCos(a: String, b: String) =
      s"(${sqlDot(a, b)} / (sqrt(${sqlDot(a, a)}) * sqrt(${sqlDot(b, b)})))"
    // One greedy MMR round as SQL: remaining = cand − sel$t, score
    // every remaining candidate against the selected set, keep the
    // argmax with rank k.
    def mmrIterSql(t: Int, k: Int): String =
      s"""rem$k AS (SELECT c.* FROM cand c
         |  LEFT JOIN sel$t s ON s.query_id = c.query_id AND s.vec_id = c.vec_id
         |  WHERE s.vec_id IS NULL),
         |m$k AS (SELECT r.query_id, r.vec_id, r.rel,
         |    round(0.7 * r.rel - 0.3 * max(ps.sim), 9) + 0.0 AS sc
         |  FROM rem$k r
         |  JOIN sel$t s ON s.query_id = r.query_id
         |  JOIN ps ON ps.query_id = r.query_id AND ps.a = r.vec_id AND ps.b = s.vec_id
         |  GROUP BY r.query_id, r.vec_id, r.rel),
         |sel$k AS (SELECT * FROM sel$t UNION ALL
         |  SELECT query_id, vec_id, rel, sc, $k AS rank FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY sc DESC, vec_id) AS rn FROM m$k) WHERE rn = 1)""".stripMargin
    Q(
      "q235_mmr_rerank",
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        |           WHERE vec_id IN (0, 1, 2)),
        |cs AS (SELECT q.query_id, e.vec_id,
        |    round(${sqlCos("e.embedding", "qv")}, 6) + 0.0 AS rel
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
        |cand AS (SELECT query_id, vec_id, rel FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY rel DESC, vec_id) AS rn FROM cs) WHERE rn <= 12),
        |cv AS (SELECT c.query_id, c.vec_id, e.embedding AS v
        |       FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id),
        |ps AS (SELECT x.query_id, x.vec_id AS a, y.vec_id AS b,
        |    round(${sqlCos("x.v", "y.v")}, 6) + 0.0 AS sim
        |  FROM cv x JOIN cv y ON y.query_id = x.query_id AND y.vec_id <> x.vec_id),
        |sel1 AS (SELECT query_id, vec_id, rel,
        |    round(0.7 * rel, 9) + 0.0 AS sc, 1 AS rank FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY rel DESC, vec_id) AS rn FROM cand) WHERE rn = 1),
        |${mmrIterSql(1, 2)},
        |${mmrIterSql(2, 3)},
        |${mmrIterSql(3, 4)},
        |${mmrIterSql(4, 5)}
        |SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id, rel,
        |  sc AS mmr_score
        |FROM sel5 ORDER BY query_id, rank""".stripMargin,
    ) { (s, dir) =>
      import java.math.{BigDecimal => JBD, RoundingMode}
      val embs = Tables.embeddings(s, dir)
      val qids = Seq(0L, 1L, 2L)
      // corpus-scale work: one broadcast-panel scan, per-query top-12
      // via the partitioned window (3 bounded partitions); rel is
      // rounded + znormed BEFORE ranking so a -0.0/0.0 tie can't order
      // differently across engines
      val q = embs.filter(col("vec_id").isin(qids: _*))
        .select(col("vec_id").as("query_id"),
          Similarity.asDouble(col("embedding")).as("qv"))
      val scored = embs.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          znorm(round(Similarity.cosine(Similarity.asDouble(col("embedding")), col("qv")), 6))
            .as("rel"))
      val w = Window.partitionBy("query_id").orderBy(col("rel").desc, col("vec_id"))
      val cand = scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 12)
        .join(embs.select(col("vec_id"), col("embedding")), "vec_id")
        .select(col("query_id"), col("vec_id"), col("rel"), col("embedding"))
      // ≤ 36 rows reach the driver — the q219 bounded-sample budget.
      // The greedy rounds are driver arithmetic with engine semantics:
      // left-fold dots (DotProduct's accumulation order), 6-dp sims,
      // 9-dp HALF_UP scores, +0.0 signed-zero normalization.
      val rows = cand.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getSeq[Float](3).toArray.map(_.toDouble)))
      // fail loudly if an edit to the candidate window ever breaks the
      // documented ≤ |qids|×12 collect budget (the Hits.require
      // precedent for driver-arithmetic sites)
      require(rows.length <= qids.size * 12,
        s"q235: collected ${rows.length} candidate rows; the driver " +
          s"greedy's documented budget is ${qids.size * 12} (|queries| * top-12)")
      def dotd(a: Array[Double], b: Array[Double]): Double = {
        var acc = 0.0; var i = 0
        while (i < a.length) { acc += a(i) * b(i); i += 1 }
        acc
      }
      def rnd(x: Double, sc: Int): Double =
        JBD.valueOf(x).setScale(sc, RoundingMode.HALF_UP).doubleValue
      val out = rows.groupBy(_._1).toSeq.flatMap { case (qid, cs) =>
        val cands = cs.map { case (_, cid, rel, v) => (cid, rel, v) }
        val sim: Map[(Long, Long), Double] = (for {
          (a, _, va) <- cands; (bv, _, vb) <- cands if a != bv
        } yield (a, bv) -> (rnd(dotd(va, vb) / (math.sqrt(dotd(va, va)) * math.sqrt(dotd(vb, vb))), 6) + 0.0)).toMap
        val first = cands.minBy { case (cid, rel, _) => (-rel, cid) }
        var sel = Vector((first._1, first._2, rnd(0.7 * first._2, 9) + 0.0))
        for (_ <- 2 to 5) {
          val rem = cands.filterNot(c => sel.exists(_._1 == c._1))
          val scoredRem = rem.map { case (cid, rel, _) =>
            val ms = sel.map(sl => sim((cid, sl._1))).max
            (cid, rel, rnd(0.7 * rel - 0.3 * ms, 9) + 0.0)
          }
          sel = sel :+ scoredRem.minBy { case (cid, _, sc) => (-sc, cid) }
        }
        sel.zipWithIndex.map { case ((cid, rel, sc), i) => (qid, i + 1, cid, rel, sc) }
      }
      import s.implicits._
      out.toDF("query_id", "rank", "vec_id", "rel", "mmr_score")
        .orderBy("query_id", "rank")
    }
  }
}
