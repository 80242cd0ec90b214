package graft

import org.scalatest.funsuite.AnyFunSuite

/** The CORRECTNESS_r11 `{}` lesson: the driver kills Verify after a
  * wall-clock timeout, and round 11's Verify wrote `oracle_sql.json` +
  * `queries.json` only after the full 350-query dump — so a mid-dump
  * kill left finished parquet dirs the DuckDB compare could not grade
  * and the round's hard correctness signal was empty. [[Verify.runDump]]
  * must (a) write metadata BEFORE any dump, (b) dump cheap-first /
  * heaviest-last, (c) isolate per-query failures, and (d) serialize the
  * two shared-resource query families. Pure-JVM spec — no SparkSession;
  * the loop is scheduling machinery.
  */
class VerifyResilienceSpec extends AnyFunSuite {

  test("metadata is written before the first dump starts") {
    val events = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    Verify.runDump(Seq("q1_a", "q2_b", "q3_c"),
      () => events.add("meta"),
      name => events.add(s"dump:$name"),
      threads = 4)
    assert(events.get(0) === "meta",
      s"metadata must precede every dump: $events")
    assert(events.size === 4, "all three dumps plus the metadata write")
  }

  test("a crashing query does not stop the others") {
    val done = java.util.Collections.synchronizedSet(
      new java.util.HashSet[String]())
    Verify.runDump(Seq("q1_a", "q2_boom", "q3_c", "q4_d"),
      () => (),
      name => if (name.contains("boom")) sys.error("boom") else done.add(name),
      threads = 2)
    assert(done.size === 3, s"the three healthy queries must all dump: $done")
  }

  test("dump order is cheap-first with known heavies last, ascending") {
    val names = Seq("q205_token_autocorr", "q01_basic", "q337_adaboost_stumps",
      "q99_cheap", "q125_pagerank")
    val order = Verify.dumpOrder(names)
    assert(order.take(2) === Seq("q01_basic", "q99_cheap"),
      "unlisted (cheap) queries first, name order")
    // heavies ascending → the single most expensive query is LAST
    assert(order.drop(2) === Seq("q125_pagerank", "q337_adaboost_stumps",
      "q205_token_autocorr"), s"heavies must sort ascending: $order")
  }

  test("lock groups: shared-IVF-path and shuffle-conf pairs are grouped; others free") {
    assert(Verify.lockGroup("q61_ann_ivf") === Verify.lockGroup("q70_ann_ivf_probe"))
    assert(Verify.lockGroup("q61_ann_ivf").isDefined)
    assert(Verify.lockGroup("q122_stream_stream_join") ===
      Verify.lockGroup("q151_stream_left_outer_join"))
    assert(Verify.lockGroup("q122_stream_stream_join").isDefined)
    assert(Verify.lockGroup("q61_ann_ivf") !==
      Verify.lockGroup("q122_stream_stream_join"))
    assert(Verify.lockGroup("q01_basic").isEmpty)
    assert(Verify.lockGroup("q205_token_autocorr").isEmpty)
  }

  test("queries in the same lock group never run concurrently") {
    val inGroup = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val names = Seq("q61_ann_ivf", "q70_ann_ivf_probe", "qx_1", "qx_2", "qx_3")
    Verify.runDump(names,
      () => (),
      name => {
        if (Verify.lockGroup(name).isDefined) {
          val n = inGroup.incrementAndGet()
          maxSeen.updateAndGet(m => math.max(m, n))
          Thread.sleep(30)
          inGroup.decrementAndGet()
        } else Thread.sleep(5)
      },
      threads = 5)
    assert(maxSeen.get() === 1,
      "two ivf-base queries overlapped — the Overwrite-vs-read race is live")
  }
}
