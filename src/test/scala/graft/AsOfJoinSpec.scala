package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at or before the left ts") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (2L, 100L, ts("2024-01-01 12:00:00")),
      (3L, 200L, ts("2024-01-01 09:00:00")),
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, ts("2024-01-01 09:30:00"), 1.0),
      (100L, ts("2024-01-01 11:00:00"), 2.0),
      (200L, ts("2024-01-01 09:30:00"), 9.0), // after left's only row
    ).toDF("user_id", "ts", "signup_value")
    val out = AsOfJoin.join(left, right, "user_id", "ts", Seq("signup_value"))
      .orderBy("event_id")
      .collect().map(r => (r.getAs[Long]("event_id"), Option(r.getAs[java.lang.Double]("signup_value"))))
    assert(out.toSeq === Seq(
      (1L, Some(1.0)),   // 09:30 state at 10:00
      (2L, Some(2.0)),   // 11:00 state at 12:00
      (3L, None),        // nothing at or before 09:00
    ))
  }

  test("a matched right row with NULL payload wins over older non-null rows") {
    val left = Seq((1L, 5L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (5L, ts("2024-01-01 10:00:00"), Some(3.0)),
      (5L, ts("2024-01-01 11:00:00"), Option.empty[Double]), // latest match, NULL payload
    ).toDF("user_id", "ts", "v")
    val out = AsOfJoin.join(left, right, "user_id", "ts", Seq("v")).head()
    assert(out.isNullAt(out.fieldIndex("v"))) // DuckDB ASOF returns the matched row's NULL
  }

  test("ties at the exact timestamp are inclusive") {
    val left = Seq((1L, 5L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((5L, ts("2024-01-01 10:00:00"), 7.0)).toDF("user_id", "ts", "v")
    val out = AsOfJoin.join(left, right, "user_id", "ts", Seq("v")).head()
    assert(out.getAs[Double]("v") === 7.0)
  }

  test("a caller-supplied tie-break id picks among same-(key,ts) right rows") {
    val left = Seq((1L, 5L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    // two right rows at the identical (key, ts); payload order would pick
    // 9.0 (max payload) — the id tie-break must pick row_id 2's value
    val right = Seq(
      (5L, ts("2024-01-01 10:00:00"), 1L, 9.0),
      (5L, ts("2024-01-01 10:00:00"), 2L, 4.0),
    ).toDF("user_id", "ts", "row_id", "v")
    val out = AsOfJoin.join(left, right, "user_id", "ts", Seq("v"),
      tieBreakCol = Some("row_id")).head()
    assert(out.getAs[Double]("v") === 4.0)
  }
}
