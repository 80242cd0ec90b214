package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** From-scratch distributed ALS-WR (Zhou et al. 2008) — the
  * model-based collaborative-filtering trainer next to the memory-based
  * item-item recommender (q132). Alternating regularized least
  * squares: fix item factors, solve every user's k×k ridge system
  * exactly; swap sides; repeat.
  *
  * Scale shape per half-iteration — keyed joins only, NEITHER factor
  * matrix is ever broadcast or collected:
  *
  *   1. ratings ⋈ other-side factors on the other-side id (hash join
  *      on the key — AQE broadcasts if one side happens to be tiny,
  *      shuffles otherwise);
  *   2. repartition by the side being solved, sortWithinPartitions
  *      (id, other id) — so each task streams its groups in a
  *      deterministic order with CONSTANT memory (one open group's
  *      A:k×k, b:k accumulators, not a per-user map);
  *   3. per group, solve (A + λ·n·I)x = b by Cholesky (k is small —
  *      k² doubles per row group, pure JVM math, no library).
  *
  * Determinism: factor init is a pure LCG function of (id, dim); the
  * per-group fold order is fixed by the sort; so factors are
  * bit-identical across partitionings and retries. The traced
  * objective Σe² + λ(Σ nᵤ‖xᵤ‖² + Σ nᵢ‖vᵢ‖²) is DECIMAL-summed from
  * 9-dp terms (exact, order-independent) and is non-increasing by
  * construction — each half-step exactly minimizes it in its block —
  * which AlsSpec gates.
  */
object AlsLite {

  /** Factor tables are (id: Long, f: Array[Double], n: Long) with n
    * the side's rating count (the WR weighting); `objective` has one
    * entry per full iteration, evaluated after both half-steps.
    */
  final case class AlsResult(
      userFactors: DataFrame,
      itemFactors: DataFrame,
      objective: Seq[Double],
  )

  /** Deterministic init factor for (id, j): uniform in [0, 1/k) via
    * the engine's LCG — a pure function, so training never depends on
    * partitioning or retries.
    */
  private def initF(id: Long, j: Int, k: Int): Double = {
    val h = ((id % 1000003L) * 2654435761L + 97L * j + 13L) % 1000003L
    (h + 0.5) / 1000003.0 / k
  }

  /** Solve (A + λnI)x = b in place via Cholesky; A is k×k row-major. */
  private def ridgeSolve(a: Array[Double], b: Array[Double], k: Int, ridge: Double): Array[Double] = {
    val m = a.clone()
    var i = 0
    while (i < k) { m(i * k + i) += ridge; i += 1 }
    // Cholesky m = LLᵀ (lower in place)
    i = 0
    while (i < k) {
      var j = 0
      while (j <= i) {
        var s = m(i * k + j)
        var t = 0
        while (t < j) { s -= m(i * k + t) * m(j * k + t); t += 1 }
        if (i == j) m(i * k + i) = math.sqrt(s)
        else m(i * k + j) = s / m(j * k + j)
        j += 1
      }
      i += 1
    }
    val x = b.clone()
    // forward substitution L y = b
    i = 0
    while (i < k) {
      var t = 0
      while (t < i) { x(i) -= m(i * k + t) * x(t); t += 1 }
      x(i) /= m(i * k + i)
      i += 1
    }
    // back substitution Lᵀ x = y
    i = k - 1
    while (i >= 0) {
      var t = i + 1
      while (t < k) { x(i) -= m(t * k + i) * x(t); t += 1 }
      x(i) /= m(i * k + i)
      i -= 1
    }
    x
  }

  /** One half-step: solve `solveCol`'s factors given `givenF` (the
    * other side's factor table). Returns (id, f, n).
    *
    * `broadcastGiven = true` is the catalog-side fast path (guide §8:
    * decide with small rows, never shuffle the payload twice): when
    * `givenF` is the ITEM factor table — catalog-sized, the q132
    * broadcast-cnt size class, NOT the user side that grows with the
    * corpus — and `ratings` is already hash-partitioned by `solveCol`,
    * the broadcast hash join preserves that partitioning, so the
    * (ratings × k-dim factor) rows never shuffle at all: the half-step
    * is join + in-partition sort + solve, ZERO exchanges. Exactness is
    * untouched: the row set is the same inner join, each sid group
    * still lands whole in one partition (the cached hash partitioning),
    * and the fold order is still sortWithinPartitions(sid, oid) — so
    * factors stay bit-identical (AlsSpec's partitioning pin).
    */
  private def solveSide(ratings: DataFrame, solveCol: String, otherCol: String,
      ratingCol: String, givenF: DataFrame, k: Int, lambda: Double,
      broadcastGiven: Boolean = false): DataFrame = {
    val spark = ratings.sparkSession
    import spark.implicits._
    // Slow path: `ratings` arrives hash-partitioned on `otherCol`, so
    // the join re-exchanges only the factor table, then the joined
    // rows repartition by the side being solved.
    val base = ratings
      .select(col(solveCol).as("sid"), col(otherCol).as("oid"),
        col(ratingCol).cast("double").as("r"))
    val gf = givenF.select(col("id").as("oid"), col("f"))
    val joined0 =
      if (broadcastGiven) base.join(broadcast(gf), "oid")
      else base.join(gf, "oid").repartition(col("sid"))
    val joined = joined0
      .select(col("sid"), col("oid"), col("r"), col("f"))
      .sortWithinPartitions("sid", "oid")
      .as[(Long, Long, Double, Array[Double])]
    val solved: Dataset[(Long, Array[Double], Long)] = joined.mapPartitions { it =>
      new Iterator[(Long, Array[Double], Long)] {
        private val buf = it.buffered
        def hasNext: Boolean = buf.hasNext
        def next(): (Long, Array[Double], Long) = {
          val sid = buf.head._1
          val a = new Array[Double](k * k)
          val b = new Array[Double](k)
          var n = 0L
          while (buf.hasNext && buf.head._1 == sid) {
            val (_, _, r, v) = buf.next()
            var i = 0
            while (i < k) {
              val vi = v(i)
              b(i) += r * vi
              var j = 0
              while (j < k) { a(i * k + j) += vi * v(j); j += 1 }
              i += 1
            }
            n += 1
          }
          (sid, ridgeSolve(a, b, k, lambda * n), n)
        }
      }
    }
    solved.toDF("id", "f", "n")
  }

  /** The regularized objective the alternation minimizes (9-dp terms,
    * DECIMAL-summed — exact and order-independent).
    */
  private def objective(ratings: DataFrame, uF: DataFrame, iF: DataFrame,
      userCol: String, itemCol: String, ratingCol: String, lambda: Double): Double = {
    val err = ratings
      .select(col(userCol).as("uid"), col(itemCol).as("iid"),
        col(ratingCol).cast("double").as("r"))
      .join(uF.select(col("id").as("uid"), col("f").as("fu")), "uid")
      .join(iF.select(col("id").as("iid"), col("f").as("fi")), "iid")
      .select((col("r") - aggregate(zip_with(col("fu"), col("fi"), _ * _),
        lit(0.0), _ + _)).as("e"))
      .agg(graft.queries.dsum(round(col("e") * col("e"), 9), 9)).head().getDouble(0)
    def reg(f: DataFrame): Double = f
      .select((col("n") * aggregate(col("f"), lit(0.0), (acc, x) => acc + x * x)).as("t"))
      .agg(graft.queries.dsum(round(col("t"), 9), 9)).head().getDouble(0)
    err + lambda * (reg(uF) + reg(iF))
  }

  /** Train k-factor ALS-WR for `iters` full iterations.
    * `traceObjective = false` skips the per-iteration objective
    * evaluation (3 extra jobs each) when only the factors matter —
    * serving paths use it; specs keep the trace on.
    */
  def train(ratings: DataFrame, userCol: String, itemCol: String, ratingCol: String,
      k: Int, iters: Int, lambda: Double, traceObjective: Boolean = true): AlsResult = {
    require(k >= 1 && iters >= 1 && lambda >= 0, s"k=$k iters=$iters lambda=$lambda")
    val spark = ratings.sparkSession
    import spark.implicits._
    val rts = graft.dedup.Dedup.persistTracked(ratings)
    // ONE ratings copy, hash-partitioned by the user key (guide §2.4 /
    // §8). Both half-steps read it:
    //   - the user half-step broadcast-joins the catalog-sized item
    //     factor table onto it, which preserves the cached user
    //     partitioning — zero exchanges for the whole half-step;
    //   - the item half-step joins the user factor table on the user
    //     key (the cached partitioning again serves the join) and then
    //     repartitions the joined rows by item — the one unavoidable
    //     payload shuffle per iteration (user factors grow with the
    //     corpus and must NEVER broadcast — scale stance).
    // The item side must be the catalog-sized one (q141: suppliers);
    // callers with two corpus-sized sides should flip which column is
    // "item" or extend this to the two-copy form this replaced.
    val rtsByUser = graft.dedup.Dedup.persistTracked(
      rts.repartition(col(userCol)))
    val kk = k
    // Lineage is cut EVERY half-step with an eager localCheckpoint
    // (the Clusters.connectedComponents idiom): each half-step's plan
    // references the previous factor plan through a join, so without
    // truncation the logical plan nests ~2× per half-step and a
    // many-iteration run OOMs the driver just stringifying it. After
    // the cut each factor table is a constant-size LogicalRDD leaf —
    // iteration cost is flat in `iters`.
    var iF = rts.select(col(itemCol).cast("long").as("id")).distinct()
      .as[Long].map(id => (id, Array.tabulate(kk)(j => initF(id, j, kk)), 0L))
      .toDF("id", "f", "n").localCheckpoint(true)
    var uF: DataFrame = null
    val trace = Seq.newBuilder[Double]
    for (_ <- 1 to iters) {
      uF = solveSide(rtsByUser, userCol, itemCol, ratingCol, iF, k, lambda,
          broadcastGiven = true)
        .localCheckpoint(true)
      iF = solveSide(rtsByUser, itemCol, userCol, ratingCol, uF, k, lambda)
        .localCheckpoint(true)
      if (traceObjective)
        trace += objective(rts, uF, iF, userCol, itemCol, ratingCol, lambda)
    }
    AlsResult(uF, iF, trace.result())
  }

  /** Map-side scoring of (user, item) candidate rows: x_u · v_i via
    * two keyed joins (no broadcast — both factor tables may be huge).
    */
  def predict(pairs: DataFrame, userFactors: DataFrame, itemFactors: DataFrame,
      userCol: String, itemCol: String): DataFrame =
    pairs
      .join(userFactors.select(col("id").as(userCol), col("f").as("__fu")), userCol)
      .join(itemFactors.select(col("id").as(itemCol), col("f").as("__fi")), itemCol)
      .withColumn("pred",
        aggregate(zip_with(col("__fu"), col("__fi"), _ * _), lit(0.0), _ + _))
      .drop("__fu", "__fi")
}
