package graft

import org.apache.spark.sql.functions._

/** Negative gates for the driver-arithmetic budget guards (VERDICT r8
  * item 5): q219/q289 collect a k²-bounded matrix to the driver and
  * iterate there — correct and oracle-replayed while the bound holds,
  * silently pathological if a corpus change explodes k. Each site now
  * carries a `require` (the Hits.require(iters <= 4) precedent); these
  * specs build corpora that EXCEED the documented budgets and assert
  * the guards fail loudly instead of collecting.
  */
class DriverBudgetSpec extends SparkSpec {
  import spark.implicits._

  test("q289 guard: >10000 transition-matrix entries fail loudly, not collect") {
    // one user emitting every ordered (from, to) pair over 101 event
    // types → ≥ 101² = 10201 distinct matrix entries > the 10000 budget
    val k = 101
    val dir = java.nio.file.Files.createTempDirectory("graft_budget_ev").toString
    val events = for {
      i <- 0 until k; j <- 0 until k; (t, pos) <- Seq(i -> 0, j -> 1)
    } yield {
      val idx = (i * k + j) * 2 + pos
      (idx.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        1L, f"t$t%03d", 1.0, "{}")
    }
    events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val ex = intercept[IllegalArgumentException] {
      queries.Events.spectralGap.fn(spark, dir).collect()
    }
    assert(ex.getMessage.contains("q289"), s"wrong guard: ${ex.getMessage}")
    graft.dedup.Dedup.clearCaches(spark)
  }

  test("q219 guard: >10000 W/L pairs fail loudly, not collect") {
    // adjacent-doc battles across 143 sources with identical text
    // (equal quality → winner = lexicographically smaller source):
    // every unordered source pair battles, C(143,2) = 10153 > 10000
    val k = 143
    val dir = java.nio.file.Files.createTempDirectory("graft_budget_doc").toString
    val docs = (for { i <- 0 until k; j <- 0 until k; if i != j } yield (i, j))
      .zipWithIndex.flatMap { case ((i, j), m) =>
        Seq((m * 2 + 1L, "alpha beta", "en", f"s$i%03d"),
          (m * 2 + 2L, "alpha beta", "en", f"s$j%03d"))
      }
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val ex = intercept[IllegalArgumentException] {
      queries.Preference.bradleyTerry.fn(spark, dir).collect()
    }
    assert(ex.getMessage.contains("q219"), s"wrong guard: ${ex.getMessage}")
    graft.dedup.Dedup.clearCaches(spark)
  }
}
