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

  val all: Seq[Q] = Seq(bm25, hybridRrf)

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
}
