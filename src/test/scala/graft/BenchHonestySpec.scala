package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The systematized q303 lesson: graft.Bench must execute the plan it
  * claims to measure. [[BenchHonesty]] detects work-bearing nodes
  * (joins/aggregates/windows/generates) that a bench action's
  * optimized plan loses vs the query's output plan; Bench's action is
  * a noop-format write precisely because count() loses them (71 of 331
  * registry queries at the time of the switch).
  */
class BenchHonestySpec extends SparkSpec {

  /** Spine of the plan a noop-write bench action actually executes,
    * captured from the live QueryExecution (element-wise max over the
    * callbacks the save fires, commands can nest executions).
    */
  private def noopActionSpine(df: DataFrame): Map[String, Int] = {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, Int]]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        seen.add(BenchHonesty.spine(qe.optimizedPlan))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      df.write.mode("overwrite").format("noop").save()
      val deadline = System.currentTimeMillis() + 30000
      while (seen.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(!seen.isEmpty, "no QueryExecution observed for the noop save")
      import scala.jdk.CollectionConverters._
      seen.asScala.foldLeft(Map.empty[String, Int]) { (acc, m) =>
        (acc.keySet ++ m.keySet).map(k =>
          k -> math.max(acc.getOrElse(k, 0), m.getOrElse(k, 0))).toMap
      }
    } finally spark.listenerManager.unregister(listener)
  }

  test("the q303 shape: count() elides a LEFT OUTER join against a unique-keyed table; the noop action keeps it") {
    val facts = spark.range(1000).select(col("id"), (col("id") % 7).as("grp"))
    // an Aggregate on the join key is what lets Catalyst PROVE the
    // right side unique — exactly the derived-table shape q303 had
    val dim = spark.range(100).select(col("id").as("k"))
      .groupBy("k").agg(max(col("k") * 2).as("v"))
    val q = facts.join(dim, facts("id") === dim("k"), "left_outer")
      .select(facts("id"), col("grp"), col("v"))
    val lost = BenchHonesty.elidedUnderCount(q)
    assert(lost.getOrElse("Join", 0) >= 1,
      s"the detector must flag the eliminated outer join, got $lost")
    // the shipped bench action measures it
    val acted = noopActionSpine(q)
    val out = BenchHonesty.spine(q.queryExecution.optimizedPlan)
    assert(acted.getOrElse("Join", 0) >= out.getOrElse("Join", 0),
      s"noop action lost the join: action=$acted output=$out")
  }

  test("an honest query has no count elision (detector specificity)") {
    val agg = spark.range(1000).select((col("id") % 10).as("g"), col("id"))
      .groupBy("g").agg(count(lit(1)).as("n"))
    assert(BenchHonesty.elidedUnderCount(agg) === Map.empty[String, Int])
  }

  test("representative registry offenders: the noop bench action retains the full output spine at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    // one per offender class from the round-10 audit: eliminated outer
    // join, output-only window, scalar-aggregate branch, generate+join
    // chain, multi-kind, plus the heaviest query as a control
    val names = Seq("q05_left_join_zero_groups", "q12_pct_of_total",
      "q268_capture_recapture", "q222_contamination_frac",
      "q217_ann_recall_curve", "q125_pagerank")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, dir)
      val out = BenchHonesty.spine(df.queryExecution.optimizedPlan)
      val acted = noopActionSpine(df)
      val lost = out.flatMap { case (k, c) =>
        val miss = c - acted.getOrElse(k, 0)
        if (miss > 0) Some(k -> miss) else None
      }
      assert(lost.isEmpty, s"$n: bench action loses $lost (output=$out acted=$acted)")
    }
  }
}
