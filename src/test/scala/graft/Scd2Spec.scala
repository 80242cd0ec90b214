package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.warehouse.Scd2

/** SCD2 type-2 dimension history: log rebuild + incremental merge. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private def log = Seq(
    (1L, ts("2024-01-01"), 10L, "gold"),
    (1L, ts("2024-02-01"), 11L, "gold"),   // no change → same version
    (1L, ts("2024-03-01"), 12L, "silver"), // change → v2
    (1L, ts("2024-03-01"), 13L, "gold"),   // same ts, tie-broken by id → v3
    (2L, ts("2024-01-15"), 20L, "bronze"),
  ).toDF("k", "ts", "id", "tier")

  private def history = Scd2.fromChangeLog(log, Seq("k"), col("ts"), Seq(col("id")), Seq("tier"))

  test("fromChangeLog collapses runs and versions changes in tie-broken order") {
    val rows = history.orderBy("k", "version")
      .select("k", "version", "tier", "effective_from", "effective_to", "is_current")
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ===
      Seq((1L, 1L, "gold"), (1L, 2L, "silver"), (1L, 3L, "gold"), (2L, 1L, "bronze")))
    // intervals chain: v1 [01-01, 03-01), v2 [03-01, 03-01), v3 [03-01, null)
    assert(rows(0).getTimestamp(3) === ts("2024-01-01"))
    assert(rows(0).getTimestamp(4) === ts("2024-03-01"))
    assert(rows(2).isNullAt(4) && rows(2).getInt(5) === 1)
    assert(rows.count(_.getInt(5) === 1) === 2) // one current row per key
  }

  test("fromChangeLog runs on a single key-hash exchange") {
    // change-flag window, per-version agg, and interval lead all reuse
    // the o_custkey-equivalent partitioning: exactly one shuffle below
    // any presentation sort
    val plan = history.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }

  private def dim = history

  test("applyChanges closes changed keys, opens new versions, keeps the rest") {
    val snap = Seq((1L, "platinum"), (3L, "silver")).toDF("k", "tier")
    val out = Scd2.applyChanges(dim, snap, Seq("k"), Seq("tier"), lit(ts("2024-06-01")))
    val cur = out.filter(col("is_current") === 1).orderBy("k")
      .select("k", "version", "tier").collect()
    assert(cur.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ===
      Seq((1L, 4L, "platinum"), (2L, 1L, "bronze"), (3L, 1L, "silver")))
    // key 1's previous open row is closed at asOf
    val closed1 = out.filter(col("k") === 1 && col("version") === 3).head()
    assert(closed1.getAs[Timestamp]("effective_to") === ts("2024-06-01"))
    assert(closed1.getAs[Int]("is_current") === 0)
    // key 2 untouched: still one open row, no extra versions
    assert(out.filter(col("k") === 2).count() === 1)
  }

  test("applyChanges is idempotent") {
    val snap = Seq((1L, "platinum"), (3L, "silver")).toDF("k", "tier")
    val once  = Scd2.applyChanges(dim, snap, Seq("k"), Seq("tier"), lit(ts("2024-06-01")))
    val twice = Scd2.applyChanges(once, snap, Seq("k"), Seq("tier"), lit(ts("2024-06-01")))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("applyChanges with an all-null tracked snapshot row is a change, not a miss") {
    val snap = Seq((2L, null.asInstanceOf[String])).toDF("k", "tier")
    val out = Scd2.applyChanges(dim, snap, Seq("k"), Seq("tier"), lit(ts("2024-06-01")))
    val k2 = out.filter(col("k") === 2).orderBy("version").collect()
    assert(k2.length === 2)
    assert(k2(1).getAs[Long]("version") === 2L && k2(1).isNullAt(k2(1).fieldIndex("tier")))
    assert(k2(1).getAs[Int]("is_current") === 1)
  }
}
