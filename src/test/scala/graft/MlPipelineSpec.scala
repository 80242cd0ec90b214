package graft

import org.apache.spark.sql.functions._
import graft.ml.{IsolationForestLite, MlPipeline}

class MlPipelineSpec extends SparkSpec {

  private lazy val features =
    MlPipeline.buildFeatures(Tables.events(spark, "/root/testdata/sf0.001")).cache()

  test("feature build yields the expected columns and a binary label") {
    val labels = features.select("label").distinct()
      .collect().map(_.getDouble(0)).toSet
    assert(labels.subsetOf(Set(0.0, 1.0)))
    assert(MlPipeline.FeatureCols.forall(features.columns.contains))
  }

  test("stratified split preserves class proportions") {
    val (tr, te) = MlPipeline.stratifiedSplit(features, "label")
    def posShare(df: org.apache.spark.sql.DataFrame) = {
      val n = df.count().toDouble
      df.filter(col("label") === 1.0).count() / n
    }
    assert(math.abs(posShare(tr) - posShare(te)) < 0.1)
    assert(tr.count() + te.count() === features.count())
  }

  test("classifier trains, beats the trivial floor, reports per class") {
    val res = MlPipeline.trainClassifier(features)
    assert(res.accuracy > 0.5) // events are dense in time → labels skew positive; sanity floor
    // J8: one report row per class, metrics in [0,1], support sums to test size
    val report = res.report.collect()
    assert(report.map(_.getAs[Double]("class")).toSet === Set(0.0, 1.0))
    report.foreach { r =>
      Seq("precision", "recall", "f1").foreach { m =>
        val v = r.getAs[Double](m)
        assert(v >= 0.0 && v <= 1.0, s"$m=$v")
      }
      assert(r.getAs[Long]("support") > 0)
    }
    // importances: one weight per assembled feature, summing to ~1
    val imp = res.importances.collect()
    assert(imp.length === MlPipeline.FeatureCols.length + 1) // + event_type_idx
    assert(math.abs(imp.map(_.getAs[Double]("importance")).sum - 1.0) < 1e-6)
  }

  test("regressor trains with finite errors and importances") {
    val res = MlPipeline.trainRegressor(features)
    assert(res.rmse > 0 && !res.rmse.isNaN)
    assert(res.r2 <= 1.0 && !res.r2.isNaN)
    assert(res.importances.count() === MlPipeline.RegressionFeatureCols.length)
  }

  test("classificationReport matches hand-computed confusion counts") {
    import spark.implicits._
    // actual:  1 1 1 0 0 ; predicted: 1 0 1 0 1
    val pred = Seq((1.0, 1.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0), (0.0, 1.0))
      .toDF("label", "prediction")
    val rep = MlPipeline.classificationReport(pred).collect()
      .map(r => r.getAs[Double]("class") ->
        (r.getAs[Double]("precision"), r.getAs[Double]("recall"), r.getAs[Long]("support"))).toMap
    assert(rep(1.0) === ((2.0 / 3.0, 2.0 / 3.0, 3L)))
    assert(rep(0.0) === ((1.0 / 2.0, 1.0 / 2.0, 2L)))
  }

  test("anomaly scores flag ~contamination share, outliers score high") {
    val scored = MlPipeline.anomalyScores(features, contamination = 0.05).cache()
    val n = scored.count().toDouble
    val flagged = scored.filter(col("is_anomaly") === 1).count().toDouble
    assert(flagged / n > 0.01 && flagged / n < 0.15)
    assert(scored.agg(min("anomaly_score"), max("anomaly_score")).head() match {
      case r => r.getDouble(0) >= 0.0 && r.getDouble(1) <= 1.0
    })
  }

  test("isolation forest separates a planted outlier") {
    import spark.implicits._
    val inliers = (1 to 500).map(i => (i.toLong, math.sin(i) * 0.1, math.cos(i) * 0.1))
    val df = (inliers :+ (9999L, 50.0, -50.0)).toDF("id", "x", "y")
    val model = IsolationForestLite.fit(df, Seq("x", "y"), numTrees = 50)
    val scored = IsolationForestLite.transform(df, model, Seq("x", "y"), contamination = 0.01)
    val top = scored.orderBy(col("anomaly_score").desc).select("id").head().getLong(0)
    assert(top === 9999L)
    assert(scored.filter(col("id") === 9999L).head().getAs[Int]("is_anomaly") === 1)
  }

  test("iforest scoring expression survives codegen with fallback disabled") {
    // fallback=false makes a Janino compile failure throw instead of
    // silently reverting to interpreted eval — pins that the embedded
    // forest reference object really generates compilable Java
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, (i % 13).toDouble, (i % 7).toDouble))
      .toDF("id", "x", "y")
    val model = IsolationForestLite.fit(df, Seq("x", "y"), numTrees = 10)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val scored = df.withColumn("s",
        graft.functions.IForestScore(array(col("x"), col("y")), model))
      val ss = scored.select("s").collect().map(_.getDouble(0))
      assert(ss.forall(s => s > 0.0 && s < 1.0))
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("exact and approx contamination thresholds agree (J7 scale flag)") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i.toLong, (i % 97).toDouble, (i * 7 % 89).toDouble))
      .toDF("id", "x", "y")
    val model = IsolationForestLite.fit(df, Seq("x", "y"), numTrees = 50)
    val exact = IsolationForestLite.transform(df, model, Seq("x", "y"),
      contamination = 0.05, exactThreshold = true)
    val approx = IsolationForestLite.transform(df, model, Seq("x", "y"),
      contamination = 0.05, exactThreshold = false)
    val ne = exact.filter(col("is_anomaly") === 1).count()
    val na = approx.filter(col("is_anomaly") === 1).count()
    // approx_percentile at accuracy 10000 over 2000 rows is rank-exact
    // up to interpolation vs nearest-value: the flagged sets may differ
    // by at most the sketch's rank tolerance (1% of rows here)
    assert(math.abs(ne - na) <= 20, s"exact=$ne approx=$na")
    assert(ne > 0 && na > 0)
  }

  test("isolation forest on empty input returns no flags instead of crashing") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double, Double)].toDF("id", "x", "y")
    val model = IsolationForestLite.fit(empty, Seq("x", "y"), numTrees = 10)
    assert(IsolationForestLite.transform(empty, model, Seq("x", "y")).count() === 0)
    // and a degenerate model still scores non-empty input without error
    val some = Seq((1L, 0.0, 0.0)).toDF("id", "x", "y")
    assert(IsolationForestLite.transform(some, model, Seq("x", "y"))
      .filter(col("is_anomaly") === 1).count() === 0)
  }

  test("prediction upsert replaces stale predictions") {
    import spark.implicits._
    val oldP = Seq((1L, 0.2), (2L, 0.3)).toDF("event_id", "score")
    val fresh = Seq((2L, 0.9), (3L, 0.7)).toDF("event_id", "score")
    val out = MlPipeline.upsertPredictions(oldP, fresh).orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out === Seq((1L, 0.2), (2L, 0.9), (3L, 0.7)))
  }
}
