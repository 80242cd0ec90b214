package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._
import graft.functions.Transforms
import graft.privacy.PrivacyEngine
import graft.warehouse.Merge

/** Property-based checks (SURVEY.md §5): algebraic laws that must hold
  * for arbitrary inputs, not just the hand-picked fixtures.
  */
object GraftProps extends Properties("graft") {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val batchGen: Gen[List[(Int, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(1, 10), Gen.alphaStr.map(_.take(5))))

  property("upsert is idempotent and keys stay unique") =
    Prop.forAll(batchGen, batchGen) { (t, i) =>
      val target = t.toDF("id", "v").dropDuplicates("id")
      val incoming = i.toDF("id", "v").dropDuplicates("id")
      val once = Merge.upsert(target, incoming, Seq("id"))
      val twice = Merge.upsert(once, incoming, Seq("id"))
      // set compare via collect: exceptAll trips a Spark internal error
      // on empty LocalRelation inputs (not an engine path)
      val a = once.collect().map(_.toSeq).toSet
      val b = twice.collect().map(_.toSeq).toSet
      a == b && once.select("id").distinct().count() == a.size
    }

  property("suppression leaves no group below k") =
    Prop.forAll(Gen.listOfN(40, Gen.choose(1, 6)), Gen.choose(2, 5)) { (qis, k) =>
      val df = qis.map(q => (s"g$q", 1)).toDF("qi", "x")
      val out = PrivacyEngine.suppress(df, Seq("qi"), k)
      out.isEmpty ||
        out.groupBy("qi").count().agg(min("count")).head().getLong(0) >= k
    }

  property("laplace noise is clamped at zero for any epsilon") =
    Prop.forAll(Gen.choose(0.01, 2.0), Gen.choose(0L, 10000L)) { (eps, seed) =>
      val mn = spark.range(500)
        .select(Transforms.laplaceNoised(lit(100.0), eps, seed).as("v"))
        .agg(min("v")).head().getDouble(0)
      mn >= 0.0
    }

  property("keyed laplace noise is invariant to partitioning") =
    Prop.forAll(Gen.choose(1, 8), Gen.choose(0L, 1000L)) { (parts, salt) =>
      def noised(p: Int) = spark.range(50).repartition(p)
        .select(col("id"), Transforms.laplaceNoisedKeyed(lit(42.0), col("id"), 0.1, salt).as("n"))
      noised(1).join(noised(parts).withColumnRenamed("n", "m"), "id")
        .filter(col("n") =!= col("m")).count() == 0
    }

  // random event times (seconds scale) → the binned join must return
  // EXACTLY the pairs the naive inequality predicate defines, for any
  // window width — bin math can neither drop boundary pairs nor invent
  // cross-key ones
  private val eventsGen: Gen[List[(Int, Long)]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(1, 3), Gen.choose(0L, 600L)))

  property("binned range join == naive inequality join") =
    Prop.forAll(eventsGen, eventsGen, Gen.choose(5L, 120L)) { (ls, rs, win) =>
      import java.sql.Timestamp
      def df(xs: List[(Int, Long)], ids: Boolean) = xs.zipWithIndex.map { case ((k, sec), i) =>
        (k, i.toLong, new Timestamp(sec * 1000L))
      }.toDF("k", if (ids) "lid" else "rid", "ts")
      val l = df(ls, ids = true)
      val r = df(rs, ids = false)
      val got = graft.operators.RangeJoin.lookback(l, r, "k", "ts", win)
        .select("lid", "r_rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val naive = (for {
        ((lk, lsec), li) <- ls.zipWithIndex
        ((rk, rsec), ri) <- rs.zipWithIndex
        if lk == rk && rsec < lsec && rsec >= lsec - win
      } yield (li.toLong, ri.toLong)).toSet
      got == naive
    }

  // SCD2 invariants for arbitrary change logs: versions are contiguous
  // from 1, exactly one open (current) row per key, and each version's
  // effective_to equals the next version's effective_from
  private val logGen: Gen[List[(Int, Long, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(1, 4), Gen.choose(0L, 20L), Gen.oneOf("a", "b", "c")))

  property("scd2 history intervals chain and versions are contiguous") =
    Prop.forAll(logGen) { log0 =>
      import java.sql.Timestamp
      val log = log0.zipWithIndex.map { case ((k, day, v), i) =>
        (k.toLong, new Timestamp(day * 86400000L), i.toLong, v)
      }.toDF("k", "ts", "id", "attr")
      val h = graft.warehouse.Scd2
        .fromChangeLog(log, Seq("k"), col("ts"), Seq(col("id")), Seq("attr"))
        .collect()
        .groupBy(_.getLong(0))
      h.forall { case (_, rows) =>
        val sorted = rows.sortBy(_.getLong(1)) // by version
        val versionsOk = sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq
        val oneCurrent = sorted.count(_.getInt(sorted.head.fieldIndex("is_current")) == 1) == 1
        val chained = sorted.sliding(2).forall {
          case Array(a, b) =>
            a.getTimestamp(a.fieldIndex("effective_to")) ==
              b.getTimestamp(b.fieldIndex("effective_from"))
          case _ => true
        }
        versionsOk && oneCurrent && chained
      }
    }

  property("binned AUC equals the direct tie-corrected Mann-Whitney AUC") =
    Prop.forAll(
      Gen.listOfN(30, Gen.zip(Gen.choose(0, 20), Gen.oneOf(0, 1)))
        .suchThat(l => l.exists(_._2 == 1) && l.exists(_._2 == 0))
    ) { rows =>
      // integer scores with bins >= range make the binning lossless
      val df = rows.toDF("v", "y").select(col("v").cast("double").as("v"), col("y"))
      val auc = graft.ml.Stats.aucBinned(df, "v", "y", bins = 64)
        .head().getAs[Double]("auc")
      val pos = rows.filter(_._2 == 1).map(_._1)
      val neg = rows.filter(_._2 == 0).map(_._1)
      val u2 = pos.map(p => 2L * neg.count(_ < p) + neg.count(_ == p)).sum
      val direct = u2.toDouble / (2.0 * pos.length * neg.length)
      math.abs(auc - direct) < 1e-6
    }

  property("KS distance of a distribution against itself is zero") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-50.0, 50.0)).map(_.take(40))) { vs =>
      val df = (vs.map((_, 1)) ++ vs.map((_, 0))).toDF("v", "f")
      graft.ml.Stats.ksBinned(df, "v", "f", bins = 32)
        .head().getAs[Double]("ks_stat") == 0.0
    }

  property("trend fit recovers an exact linear relation") =
    Prop.forAll(Gen.choose(-5, 5), Gen.choose(-100, 100), Gen.choose(3, 25)) { (a, b, n) =>
      val df = (0 until n).map(x => ("g", x.toLong, (a.toLong * x + b)))
        .toDF("g", "x", "y")
      val r = graft.ml.Stats.trendSlope(df, "g", "x", "y").head()
      r.getAs[Double]("slope") == a.toDouble && r.getAs[Double]("intercept") == b.toDouble
    }

  property("KM with no censoring equals the empirical survival function") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, 20L)).map(_.take(30))) { ts =>
      val df = ts.map((_, 1)).toDF("t", "ended")
      val rows = graft.ml.Stats.kaplanMeier(df, "t", "ended")
        .orderBy("t").collect()
      val n = ts.length.toDouble
      rows.forall { r =>
        val t = r.getLong(0)
        // S(t) = P(T > t): the product telescopes to (# survivors)/n
        val expect = ts.count(_ > t) / n
        math.abs(r.getDouble(3) - expect) < 1e-6
      }
    }

  property("KM survival is monotone non-increasing and censoring never lowers it") =
    Prop.forAll(Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 15L), Gen.oneOf(0, 1))).map(_.take(30))) { subj =>
      val df = subj.toDF("t", "ended")
      val s = graft.ml.Stats.kaplanMeier(df, "t", "ended")
        .orderBy("t").collect().map(_.getDouble(3))
      val allObserved = subj.map { case (t, _) => (t, 1) }.toDF("t", "ended")
      val sAll = graft.ml.Stats.kaplanMeier(allObserved, "t", "ended")
        .orderBy("t").collect().map(_.getDouble(3))
      s.zip(s.drop(1)).forall { case (a, b) => b <= a + 1e-12 } &&
        s.zip(sAll).forall { case (cens, obs) => cens >= obs - 1e-9 }
    }

  property("CUPED preserves the grand mean and zeroes theta-direction covariance") =
    Prop.forAll(Gen.listOfN(20,
      Gen.zip(Gen.choose(0, 2000), Gen.choose(0, 2000)))) { xy0 =>
      // 2dp inputs per the contract; need var(x) > 0 for theta
      val xy = xy0.map { case (a, b) => (a / 100.0, b / 100.0) }
      (xy.map(_._1).distinct.length <= 1) || {
        val df = xy.toDF("x", "y")
        val t = graft.ml.Stats.cupedTheta(df, "x", "y").head()
        val (xbar, theta) = (t.getAs[Double]("xbar"), t.getAs[Double]("theta"))
        val adj = xy.map { case (x, y) => y - theta * (x - xbar) }
        val rawMean = xy.map(_._2).sum / xy.length
        // Σ(x−x̄)=0 ⇒ grand mean unchanged; θ is the OLS slope ⇒ the
        // adjusted metric is uncorrelated with the covariate
        val cov = xy.map(_._1).zip(adj).map { case (x, a) => (x - xbar) * a }.sum
        math.abs(adj.sum / adj.length - rawMean) < 1e-6 &&
          math.abs(cov / xy.length) < 1e-4
      }
    }
}
