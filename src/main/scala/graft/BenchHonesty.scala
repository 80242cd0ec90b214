package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, Join, LogicalPlan, Window}

/** Mechanical bench-honesty audit — the systematized q303 lesson.
  *
  * graft.Bench times `fn(spark, dir).count()`. Catalyst optimizes that
  * COUNT plan independently of the output plan the correctness gate
  * executes, and some rewrites legitimately drop work a count doesn't
  * need (sorts, column pruning) while others silently eliminate the
  * very operator the bench claims to measure — q303's first bench
  * measured a bare scan because a LEFT OUTER join against a
  * unique-keyed derived table cannot change the row count, so the
  * optimizer removed it. That defect was caught by eye in round 9;
  * this object makes the audit structural: compare the WORK-BEARING
  * node multiset (joins, aggregates, windows, generates) of the
  * optimized output plan against the optimized count plan, and flag
  * every node kind the count loses. BenchHonestySpec runs the audit
  * over the full registry and fails on any new elision, so a future
  * query cannot reintroduce the q303 shape unnoticed.
  *
  * Windows ARE included: a window whose outputs feed only the final
  * projection prunes to nothing under count (RemoveNoopOperators),
  * meaning the bench would skip the whole shuffle+sort the window
  * costs — the same dishonesty as the eliminated join, just quieter.
  */
object BenchHonesty {

  /** Multiset of work-bearing operator kinds in an optimized logical
    * plan, subquery plans included.
    */
  def spine(plan: LogicalPlan): Map[String, Int] = {
    val counts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    plan.foreachWithSubqueries {
      case _: Join => counts("Join") += 1
      case _: Aggregate => counts("Aggregate") += 1
      case _: Window => counts("Window") += 1
      case _: Generate => counts("Generate") += 1
      case _ => ()
    }
    counts.toMap
  }

  /** Work-bearing node kinds present in the query's OUTPUT plan but
    * missing from its count-only BENCH plan — per kind, how many nodes
    * the bench action would silently not measure. Empty = honest.
    * The groupBy().count() wrapper itself contributes one synthetic
    * global Aggregate the output plan lacks; it is subtracted from the
    * count side's tally, otherwise one genuinely elided Aggregate
    * (e.g. RemoveRedundantAggregates collapsing a group-only aggregate
    * under the count) would be masked.
    */
  def elidedUnderCount(df: DataFrame): Map[String, Int] = {
    val out = spine(df.queryExecution.optimizedPlan)
    val cntRaw = spine(df.groupBy().count().queryExecution.optimizedPlan)
    val cnt = cntRaw.updated("Aggregate",
      math.max(0, cntRaw.getOrElse("Aggregate", 0) - 1))
    out.flatMap { case (k, n) =>
      val lost = n - cnt.getOrElse(k, 0)
      if (lost > 0) Some(k -> lost) else None
    }
  }

  /** Audit main: runs [[elidedUnderCount]] over every registered query
    * against args(0) (default sf0.001) and prints one line per offender.
    */
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val lost = elidedUnderCount(fn(spark, dir))
        if (lost.nonEmpty) {
          bad += 1
          println(s"ELIDED $name: ${lost.toSeq.sorted.mkString(", ")}")
        }
      } catch {
        case e: Throwable => bad += 1; println(s"ERROR $name: ${e.getMessage}")
      }
    }
    println(s"done: $bad offender(s)")
    spark.stop()
  }
}
