package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Preference-data analytics — the aggregation layer of an RLHF /
  * model-arena pipeline: pairwise comparisons in, per-contestant
  * strength and confidence-ranked win tables out. The comparisons are
  * synthesized deterministically from the corpus (adjacent-in-crawl-
  * order docs from different sources "battle" on quality score), so
  * every number is a pure function of the data and the DuckDB oracle
  * replays the whole chain — synthesis, Bradley-Terry training
  * iterations, Wilson intervals — bit for bit.
  *
  * Scale stance: the match stream is built by a KEYED equi-join on
  * doc_id adjacency (never a corpus-length window — a `lag` over a
  * 4-value lang partition would serialize the corpus through 4 sort
  * tasks), and everything after the first groupBy lives on a
  * players²-bounded table (≤ k² rows for k sources/models), so the
  * iterative Bradley-Terry updates cost nothing regardless of corpus
  * size. That is exactly how arena-style rating jobs behave in
  * production: billions of battles, dozens of models.
  */
object Preference {

  val all: Seq[Q] = Seq(bradleyTerry, wilsonHeadToHead)

  private def stopSql = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  /** q36's composite quality as SQL over a string_split list. */
  private def qualitySql(toks: String) =
    s"least(1.0, CAST(len($toks) AS DOUBLE) / 50.0) * 0.5 " +
      s"+ (1.0 - CAST(len(list_filter($toks, x -> x IN ($stopSql))) AS DOUBLE) / len($toks)) * 0.5"

  /** Deterministic battle synthesis shared by q219/q220: doc i vs doc
    * i+1 when their sources differ, winner = higher 4-dp quality score
    * (tie → lexicographically smaller source). A keyed self-join on
    * doc_id+1, i.e. the q194 (doc, position) adjacency idiom — scales
    * as an equi-join, no global ordering ever materializes.
    */
  private def matchWl(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"),
        col("source"),
        round(TextAnalysis.qualityScore(col("text")), 4).as("sq"))
    val a = d.select(col("doc_id").as("id"), col("source").as("sa"), col("sq").as("qa"))
    val b = d.select((col("doc_id") - 1).as("id"), col("source").as("sb"), col("sq").as("qb"))
    a.join(b, "id").filter(col("sa") =!= col("sb"))
      .select(
        when(col("qa") > col("qb"), col("sa")).when(col("qa") < col("qb"), col("sb"))
          .when(col("sa") < col("sb"), col("sa")).otherwise(col("sb")).as("winner"),
        when(col("qa") > col("qb"), col("sb")).when(col("qa") < col("qb"), col("sa"))
          .when(col("sa") < col("sb"), col("sb")).otherwise(col("sa")).as("loser"))
      .groupBy("winner", "loser").agg(count(lit(1)).as("n"))
  }

  /** The identical synthesis as oracle CTEs (through `wl`). */
  private def matchSql: String =
    s"""d AS (SELECT doc_id, source,
       |       round(${qualitySql("string_split(text, ' ')")}, 4) AS sq
       |     FROM documents),
       |mm AS (SELECT a.source AS sa, b.source AS sb, a.sq AS qa, b.sq AS qb
       |       FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
       |       WHERE a.source <> b.source),
       |m AS (SELECT
       |    CASE WHEN qa > qb THEN sa WHEN qa < qb THEN sb
       |         WHEN sa < sb THEN sa ELSE sb END AS winner,
       |    CASE WHEN qa > qb THEN sb WHEN qa < qb THEN sa
       |         WHEN sa < sb THEN sb ELSE sa END AS loser
       |  FROM mm),
       |wl AS (SELECT winner, loser, count(*) AS n FROM m GROUP BY 1, 2)""".stripMargin

  // --- q219: Bradley-Terry strength rating ---------------------------------
  // The arena/RLHF rating primitive: given W/L counts between
  // contestants, fit Bradley-Terry strengths p_i (P(i beats j) =
  // p_i/(p_i+p_j)) by 3 minorization-maximization rounds (Hunter
  // 2004): p_i ← W_i / Σ_j m_ij/(p_i+p_j), renormalized to Σp = 1.
  // Engine parity is the q133 trajectory discipline: every per-pair
  // term is 9-dp rounded then DECIMAL-summed (associative-exact, so
  // partitioning can't reorder a float sum), each normalized p is
  // 9-dp rounded before the next round, and the oracle unrolls the
  // three rounds as chained CTEs over the same wl table. The iteration
  // runs on the players²-bounded pair table — free at any corpus size.
  def bradleyTerry: Q = Q(
    "q219_bradley_terry",
    s"""WITH $matchSql,
       |pairs AS (SELECT i, j, CAST(sum(n) AS BIGINT) AS mn FROM (
       |    SELECT winner AS i, loser AS j, n FROM wl
       |    UNION ALL SELECT loser AS i, winner AS j, n FROM wl) GROUP BY 1, 2),
       |players AS (SELECT DISTINCT i FROM pairs),
       |wins AS (SELECT p.i, COALESCE(CAST(sum(wl.n) AS BIGINT), 0) AS w
       |         FROM players p LEFT JOIN wl ON wl.winner = p.i GROUP BY p.i),
       |losses AS (SELECT p.i, COALESCE(CAST(sum(wl.n) AS BIGINT), 0) AS l
       |           FROM players p LEFT JOIN wl ON wl.loser = p.i GROUP BY p.i),
       |k AS (SELECT count(*) AS k FROM players),
       |p0 AS (SELECT i AS pk, round(1.0 / k, 9) AS p FROM players CROSS JOIN k),
       |${btIterSql(0, 1)},
       |${btIterSql(1, 2)},
       |${btIterSql(2, 3)}
       |SELECT w.i AS source, w.w AS wins, lo.l AS losses,
       |  CAST(w.w + lo.l AS BIGINT) AS matches,
       |  round(p3.p, 6) AS bt_strength
       |FROM wins w JOIN losses lo ON lo.i = w.i JOIN p3 ON p3.pk = w.i
       |ORDER BY source""".stripMargin,
  ) { (s, dir) =>
    // The corpus-scale work is ONE aggregate (matchWl); what reaches
    // the driver is the players²-bounded W/L matrix — the q133 budget
    // ("only d+2 scalars reach the driver"). The MM rounds then run as
    // driver arithmetic with the exact engine semantics (9-dp HALF_UP
    // requantization via BigDecimal.valueOf — bit-identical to Spark's
    // round() on doubles — and scale-9 decimal sums), because a
    // DataFrame formulation of a 20-row × 3-round iteration spends
    // seconds of AQE stage scheduling per round (measured 28 s; the
    // cluster-shaped plan is the wrong shape when the data is
    // literally a handful of scalars). The DuckDB oracle replays the
    // identical chain from the corpus, so the driver arithmetic is
    // hash-checked end to end.
    import java.math.{BigDecimal => JBD, RoundingMode}
    def rnd(x: Double, s9: Int): Double =
      JBD.valueOf(x).setScale(s9, RoundingMode.HALF_UP).doubleValue
    def sumDec9(xs: Iterable[Double]): Double =
      xs.foldLeft(JBD.ZERO)((acc, x) =>
        acc.add(JBD.valueOf(x).setScale(9, RoundingMode.HALF_UP))).doubleValue
    val wl = matchWl(s, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // the documented driver budget: the collected W/L matrix is at
    // most players² rows (players = distinct sources). A corpus change
    // that explodes the player vocabulary must fail loudly instead of
    // silently collecting it (the Hits.require(iters <= 4) precedent).
    require(wl.length <= 10000,
      s"q219: collected W/L matrix has ${wl.length} rows; the " +
        "driver-arithmetic budget is players^2 <= 10000 — a larger " +
        "player space needs the DataFrame iteration form")
    val pairs = wl.flatMap { case (w, l, n) => Seq(((w, l), n), ((l, w), n)) }
      .groupBy(_._1).map { case (key, v) => key -> v.map(_._2).sum }
    val players = pairs.keysIterator.map(_._1).toSeq.distinct.sorted
    val wins = players.map(i => i -> wl.filter(_._1 == i).map(_._3).sum).toMap
    val losses = players.map(i => i -> wl.filter(_._2 == i).map(_._3).sum).toMap
    var p = players.map(i => i -> rnd(1.0 / players.size, 9)).toMap
    for (_ <- 1 to 3) {
      // a battling pair always has ≥1 win between them, so after the
      // uniform start no denominator term can see p_i + p_j = 0
      val den = players.map { i =>
        i -> sumDec9(pairs.collect {
          case ((a, j), mn) if a == i => rnd(mn.toDouble / (p(i) + p(j)), 9)
        })
      }.toMap
      val up = players.map(i => i -> rnd(wins(i).toDouble / den(i), 9)).toMap
      val tot = sumDec9(players.map(up))
      p = players.map(i => i -> rnd(up(i) / tot, 9)).toMap
    }
    import s.implicits._
    players.map(i => (i, wins(i), losses(i), wins(i) + losses(i), rnd(p(i), 6)))
      .toDF("source", "wins", "losses", "matches", "bt_strength")
      .orderBy("source")
  }

  /** The same MM round as SQL, CTE p$t → p$n. */
  private def btIterSql(t: Int, n: Int): String =
    s"""den$n AS (SELECT pr.i,
       |    CAST(sum(CAST(round(pr.mn / (pa.p + pb.p), 9) AS DECIMAL(28,9)))
       |      AS DOUBLE) AS den
       |  FROM pairs pr JOIN p$t pa ON pa.pk = pr.i JOIN p$t pb ON pb.pk = pr.j
       |  GROUP BY pr.i),
       |u$n AS (SELECT w.i, round(w.w / d.den, 9) AS up
       |  FROM wins w JOIN den$n d ON d.i = w.i),
       |t$n AS (SELECT CAST(sum(CAST(up AS DECIMAL(28,9))) AS DOUBLE) AS tp FROM u$n),
       |p$n AS (SELECT i AS pk, round(up / tp, 9) AS p FROM u$n CROSS JOIN t$n)""".stripMargin

  // --- q220: head-to-head win matrix with Wilson lower bounds ---------------
  // Ranking opponents by raw win rate overrates small samples; the
  // Wilson score interval's lower bound (z = 1.96) is the standard
  // "sort by confidence, not by point estimate" fix. Per directed
  // (source, opponent): wins, games, rate, Wilson LB, and both ranks —
  // `conservative_flip` marks where the confidence-adjusted ranking
  // disagrees with the naive one. The Wilson numerator subtracts two
  // near-equal terms when rate hits 0 or 1 (p̂(1−p̂) vanishes and
  // z·sqrt(z²/4g²) cancels z²/2g), so the rounded bound gets the
  // CLAUDE.md signed-zero treatment in both engines. Windows rank a
  // players²-bounded table — nothing corpus-sized is ever sorted.
  def wilsonHeadToHead: Q = Q(
    "q220_wilson_h2h",
    s"""WITH $matchSql,
       |pairs AS (SELECT i, j, CAST(sum(n) AS BIGINT) AS g FROM (
       |    SELECT winner AS i, loser AS j, n FROM wl
       |    UNION ALL SELECT loser AS i, winner AS j, n FROM wl) GROUP BY 1, 2),
       |w AS (SELECT p.i, p.j, p.g, COALESCE(CAST(sum(wl.n) AS BIGINT), 0) AS w
       |      FROM pairs p LEFT JOIN wl ON wl.winner = p.i AND wl.loser = p.j
       |      GROUP BY p.i, p.j, p.g),
       |s AS (SELECT i AS source, j AS opponent, w AS wins, g AS games,
       |    CAST(w AS DOUBLE) / g AS ph FROM w),
       |b AS (SELECT source, opponent, wins, games, round(ph, 4) AS win_rate,
       |    round((ph + (1.96 * 1.96) / (2 * games)
       |      - 1.96 * sqrt(ph * (1.0 - ph) / games
       |          + (1.96 * 1.96) / (4.0 * games * games)))
       |      / (1.0 + (1.96 * 1.96) / games), 4) + 0.0 AS wilson_lb
       |  FROM s)
       |SELECT source, opponent, wins, games, win_rate, wilson_lb,
       |  CAST(rank() OVER (PARTITION BY source
       |    ORDER BY win_rate DESC, opponent) AS INTEGER) AS rank_rate,
       |  CAST(rank() OVER (PARTITION BY source
       |    ORDER BY wilson_lb DESC, opponent) AS INTEGER) AS rank_lb,
       |  (rank() OVER (PARTITION BY source ORDER BY win_rate DESC, opponent)
       |   <> rank() OVER (PARTITION BY source ORDER BY wilson_lb DESC, opponent))
       |    AS conservative_flip
       |FROM b ORDER BY source, opponent""".stripMargin,
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val wl = Dedup.persistTracked(matchWl(s, dir))
    val pairs = wl.select(col("winner").as("i"), col("loser").as("j"), col("n"))
      .union(wl.select(col("loser").as("i"), col("winner").as("j"), col("n")))
      .groupBy("i", "j").agg(sum(col("n")).cast("long").as("g"))
    val w = pairs
      .join(wl.withColumnRenamed("winner", "i").withColumnRenamed("loser", "j")
        .withColumnRenamed("n", "nw"), Seq("i", "j"), "left")
      .groupBy("i", "j", "g").agg(coalesce(sum(col("nw")), lit(0L)).cast("long").as("w"))
    val z2: Column = lit(1.96) * lit(1.96)
    val ph = col("w").cast("double") / col("g")
    val wilson = (ph + z2 / (lit(2) * col("g"))
      - lit(1.96) * sqrt(ph * (lit(1.0) - ph) / col("g")
          + z2 / (lit(4.0) * col("g") * col("g")))) /
      (lit(1.0) + z2 / col("g"))
    val b = w.select(col("i").as("source"), col("j").as("opponent"),
      col("w").as("wins"), col("g").as("games"),
      round(ph, 4).as("win_rate"), znorm(round(wilson, 4)).as("wilson_lb"))
    val byRate = Window.partitionBy("source").orderBy(col("win_rate").desc, col("opponent"))
    val byLb = Window.partitionBy("source").orderBy(col("wilson_lb").desc, col("opponent"))
    b.select(col("*"),
        rank().over(byRate).cast("int").as("rank_rate"),
        rank().over(byLb).cast("int").as("rank_lb"),
        (rank().over(byRate) =!= rank().over(byLb)).as("conservative_flip"))
      .orderBy("source", "opponent")
  }
}
