package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.evaluation.{MulticlassClassificationEvaluator, RegressionEvaluator}
import org.apache.spark.ml.feature.{StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.RandomForestRegressor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MLlib re-expression of the reference's sklearn pipelines
  * (SURVEY.md §2.J; `ml_pipeline.py`): window-aggregate feature
  * engineering, label encoding via StringIndexer, seeded 80/20 splits,
  * RandomForest classifier (100×d10) and regressor (100×d15),
  * StandardScaler, and evaluation. Training distributes via MLlib;
  * nothing is collected to the driver.
  */
object MlPipeline {

  /** J1: per-event features (the readmission-label pattern): per-user
    * analytic aggregates + LEAD-derived next-event-within-1-day label.
    */
  def buildFeatures(events: DataFrame): DataFrame = {
    val wAll = Window.partitionBy("user_id")
    val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events.select(
      col("event_id"), col("user_id"), col("event_type"), col("value"),
      count(lit(1)).over(wAll).cast("double").as("user_event_cnt"),
      (sum(col("value")).over(wAll) / count(lit(1)).over(wAll)).as("user_value_avg"),
      max(col("value")).over(wAll).as("user_value_max"),
      min(col("value")).over(wAll).as("user_value_min"),
      when(unix_micros(lead(col("ts"), 1).over(wOrd)) - unix_micros(col("ts")) <= 86400000000L, 1.0)
        .otherwise(0.0).as("label"))
  }

  val FeatureCols: Seq[String] =
    Seq("value", "user_event_cnt", "user_value_avg", "user_value_max", "user_value_min")

  /** Features for models whose label is `value` itself — the raw column
    * must not leak into the vector (the per-user aggregates stay, as the
    * reference's cost model also feeds on historical cost statistics).
    */
  val RegressionFeatureCols: Seq[String] = FeatureCols.filterNot(_ == "value")

  private def assembler(cols: Seq[String], extra: Seq[String] = Nil) = new VectorAssembler()
    .setInputCols((cols ++ extra).toArray).setOutputCol("features")

  /** J3: stratified 80/20 split — per-class seeded split then union,
    * preserving class proportions in both folds
    * (`ml_pipeline.py:138-140` stratify=y).
    */
  def stratifiedSplit(df: DataFrame, labelCol: String, trainFrac: Double = 0.8,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    val classes = df.select(labelCol).distinct().collect().map(_.get(0))
    val splits = classes.map { c =>
      val Array(tr, te) = df.filter(col(labelCol) === c)
        .randomSplit(Array(trainFrac, 1 - trainFrac), seed)
      (tr, te)
    }
    (splits.map(_._1).reduce(_ unionByName _), splits.map(_._2).reduce(_ unionByName _))
  }

  /** Full classifier evaluation (J8): the sklearn
    * `classification_report` + `feature_importances_` analogue
    * (`ml_pipeline.py:156-166`) as DataFrames.
    */
  case class ClassifierResult(model: PipelineModel, accuracy: Double,
      report: DataFrame, importances: DataFrame)

  case class RegressorResult(model: PipelineModel, rmse: Double, r2: Double,
      importances: DataFrame)

  /** Per-class precision/recall/F1/support from a scored test set —
    * computed relationally from one confusion-matrix aggregate (tiny
    * shuffle on (label, prediction)), no per-class driver loop.
    */
  def classificationReport(pred: DataFrame, labelCol: String = "label",
      predCol: String = "prediction"): DataFrame = {
    val cm = pred.groupBy(col(labelCol).cast("double").as("actual"),
        col(predCol).cast("double").as("predicted"))
      .agg(count(lit(1)).as("n"))
    val actual = cm.groupBy(col("actual").as("class")).agg(sum("n").as("support"))
    val predicted = cm.groupBy(col("predicted").as("class")).agg(sum("n").as("n_pred"))
    val tp = cm.filter(col("actual") === col("predicted"))
      .select(col("actual").as("class"), col("n").as("tp"))
    actual.join(predicted, Seq("class"), "full_outer")
      .join(tp, Seq("class"), "left_outer")
      .na.fill(0L, Seq("support", "n_pred", "tp"))
      .select(col("class"),
        when(col("n_pred") > 0, col("tp") / col("n_pred")).otherwise(0.0).as("precision"),
        when(col("support") > 0, col("tp") / col("support")).otherwise(0.0).as("recall"),
        col("support"))
      .withColumn("f1", when(col("precision") + col("recall") > 0,
        lit(2.0) * col("precision") * col("recall") / (col("precision") + col("recall")))
        .otherwise(0.0))
      .select("class", "precision", "recall", "f1", "support")
      .orderBy("class")
  }

  /** `feature_importances_` as a (feature, importance) DataFrame,
    * sorted descending like the reference's report.
    */
  def featureImportances(model: PipelineModel): DataFrame = {
    import org.apache.spark.ml.classification.RandomForestClassificationModel
    import org.apache.spark.ml.regression.RandomForestRegressionModel
    val names = model.stages.collectFirst { case a: VectorAssembler => a.getInputCols }
      .getOrElse(throw new IllegalArgumentException("pipeline has no VectorAssembler"))
    val imps = model.stages.collectFirst {
      case m: RandomForestClassificationModel => m.featureImportances
      case m: RandomForestRegressionModel => m.featureImportances
    }.getOrElse(throw new IllegalArgumentException("pipeline has no forest model"))
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    names.zip(imps.toArray).toSeq.toDF("feature", "importance")
      .orderBy(col("importance").desc, col("feature"))
  }

  /** J2+J4+J8: label-encode event_type, assemble, RF classifier
    * (100 trees, depth 10, seed 42 — `ml_pipeline.py:143-150`);
    * `class_weight='balanced'` parity via weightCol = n / (k·n_class).
    * Returns accuracy plus the per-class report and importances.
    */
  def trainClassifier(features: DataFrame): ClassifierResult = {
    val (train0, test) = stratifiedSplit(features, "label")
    val counts = train0.groupBy("label").count()
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    val k = counts.size
    val weightExpr = counts.foldLeft(lit(1.0)) { case (acc, (cls, cnt)) =>
      when(col("label") === cls, n / (k * cnt)).otherwise(acc)
    }
    val train = train0.withColumn("w", weightExpr)
    val pipeline = new Pipeline().setStages(Array(
      new StringIndexer().setInputCol("event_type").setOutputCol("event_type_idx")
        .setHandleInvalid("keep"),
      assembler(FeatureCols, Seq("event_type_idx")),
      new RandomForestClassifier()
        .setNumTrees(100).setMaxDepth(10).setSeed(42)
        .setLabelCol("label").setFeaturesCol("features").setWeightCol("w")))
    val model = pipeline.fit(train)
    // Serve with a summary-free copy: the fitted forest retains a
    // trainingSummary whose SparkSession reference rides the prediction
    // UDF's task closure. On Spark 4.1 the session java-serializes only
    // while its lazy ObservationManager is still untouched — one
    // Dataset.observe(Observation) anywhere in the session (e.g. the
    // dedup cluster loop) and a summary-carrying transform throws
    // TaskNotSerializable. Copy drops the summary; it's also the right
    // shape at scale (don't ship training state to every task).
    val serveModel = model.copy(org.apache.spark.ml.param.ParamMap.empty)
    // one scored test set feeds both the evaluator and the report; the
    // report is materialized (≤ #classes rows) so the cache can be
    // released before returning instead of pinning the scored set for
    // the caller's lifetime
    val pred = serveModel.transform(test.withColumn("w", lit(1.0)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val acc = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setMetricName("accuracy").evaluate(pred)
    val reportDf = classificationReport(pred)
    val report = pred.sparkSession.createDataFrame(
      java.util.Arrays.asList(reportDf.collect(): _*), reportDf.schema)
    pred.unpersist(blocking = false)
    ClassifierResult(model, acc, report, featureImportances(model))
  }

  /** J5+J8: RF regressor for `value` (100 trees, depth 15, seed 42 —
    * `ml_pipeline.py:197-203`), with importances.
    */
  def trainRegressor(features: DataFrame): RegressorResult = {
    val Array(train, test) = features.randomSplit(Array(0.8, 0.2), seed = 42)
    val pipeline = new Pipeline().setStages(Array(
      assembler(RegressionFeatureCols),
      new RandomForestRegressor()
        .setNumTrees(100).setMaxDepth(15).setSeed(42)
        .setLabelCol("value").setFeaturesCol("features")))
    val model = pipeline.fit(train.drop("label"))
    // summary-free copy for scoring — same closure hazard as the
    // classifier (see trainClassifier)
    val pred = model.copy(org.apache.spark.ml.param.ParamMap.empty).transform(test)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rmse = new RegressionEvaluator().setLabelCol("value").setMetricName("rmse").evaluate(pred)
    val r2 = new RegressionEvaluator().setLabelCol("value").setMetricName("r2").evaluate(pred)
    // both evaluations have run; nothing downstream reads pred again
    pred.unpersist(blocking = false)
    RegressorResult(model, rmse, r2, featureImportances(model))
  }

  /** J6+J7: standard-scale features then isolation-forest anomaly
    * scores (contamination 0.05 — `ml_pipeline.py:246-259`).
    */
  def anomalyScores(features: DataFrame, contamination: Double = 0.05): DataFrame = {
    val scaled = new Pipeline().setStages(Array(
      assembler(FeatureCols),
      new StandardScaler().setInputCol("features").setOutputCol("scaled")
        .setWithMean(true).setWithStd(true)))
      .fit(features).transform(features)
    // unpack the scaled vector back to columns for the forest
    val arr = scaled.withColumn("f",
      org.apache.spark.ml.functions.vector_to_array(col("scaled")))
    val cols = FeatureCols.indices.map(i => col("f").getItem(i).as(s"z$i"))
    val flat = arr.select((col("event_id") +: col("user_id") +: cols): _*)
    val model = IsolationForestLite.fit(flat, FeatureCols.indices.map(i => s"z$i"))
    IsolationForestLite.transform(flat, model, FeatureCols.indices.map(i => s"z$i"), contamination)
  }

  /** J9: prediction upsert keyed on (event_id) — merge semantics. */
  def upsertPredictions(existing: DataFrame, fresh: DataFrame): DataFrame =
    graft.warehouse.Merge.upsert(existing, fresh, Seq("event_id"))

  /** J10: persist a pipeline model + sidecar metadata JSON. */
  def save(model: PipelineModel, path: String, metadata: Map[String, String]): Unit = {
    model.write.overwrite().save(path)
    graft.export.Exporters.reportJson(metadata, path + ".metadata.json")
  }
}
