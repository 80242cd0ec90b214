package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Binned range join: boundary semantics and the no-nested-loop shape. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // window 60s: match iff r.ts ∈ [l.ts - 60s, l.ts)
  private val left = Seq(
    (1L, 100L, ts("2024-01-01 10:01:00")),
    (2L, 200L, ts("2024-01-01 10:05:00")),
  ).toDF("k", "lid", "ts")

  private val right = Seq(
    (1L, 900L, ts("2024-01-01 10:00:00.000001")), // in window (59.999999s before)
    (1L, 901L, ts("2024-01-01 10:00:00")),        // exactly windowSec before → included
    (1L, 902L, ts("2024-01-01 10:01:00")),        // simultaneous → excluded (strict <)
    (1L, 903L, ts("2024-01-01 09:59:59.999999")), // 1µs too early → excluded
    (2L, 904L, ts("2024-01-01 10:04:30")),        // in window, other key
    (1L, 905L, ts("2024-01-01 10:04:30")),        // right key ≠ left key 2 → no match
  ).toDF("k", "rid", "ts")

  test("inclusive lower bound, strict upper bound, key isolation") {
    val out = RangeJoin.lookback(left, right, "k", "ts", 60L)
      .select("lid", "r_rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((100L, 900L), (100L, 901L), (200L, 904L)))
  }

  test("matches cross bin boundaries") {
    // left at 10:01:00 sits in bin 61 (60s bins); right at 10:00:00.000001
    // sits in bin 60 — found only because the right side explodes into
    // bin+1 too. Guard against a same-bin-only regression.
    val crossBin = RangeJoin.lookback(left, right, "k", "ts", 60L)
      .filter(col("r_rid") === 900L)
    assert(crossBin.count() === 1)
  }

  test("plans as a hash join on (key, bin) — no nested loop, no cartesian") {
    val p = RangeJoin.lookback(left, right, "k", "ts", 60L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("__bin"), "join must key on the quantized bin")
  }
}
