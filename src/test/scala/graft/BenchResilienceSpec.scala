package graft

import org.scalatest.funsuite.AnyFunSuite

/** The BENCH_r10 rc=124 lesson: the driver kills the bench after a
  * wall-clock timeout, and round 10's Bench wrote its artifact only
  * after ALL passes — so a kill during pass 2 discarded pass 1's
  * complete min-map. [[Bench.runLoop]] must (a) leave a valid artifact
  * on disk after every completed pass, (b) respect the wall-clock
  * budget for passes 2..N, re-running heaviest-first, and (c) let a
  * fatal mid-pass error propagate without destroying the artifact.
  * Pure-JVM spec — no SparkSession; the loop is timing machinery.
  */
class BenchResilienceSpec extends AnyFunSuite {

  private def tmpOut(): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempFile("graft_bench_spec", ".json")
    p.toFile.deleteOnExit()
    p
  }

  private def readJson(p: java.nio.file.Path): String =
    new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8).trim

  /** Minimal structural check: one line, balanced braces, has the
    * driver-contract keys. (The real parse gate is tools/check.py /
    * the driver's json.loads; this pins shape regressions.)
    */
  private def assertValidArtifact(s: String, names: Seq[String]): Unit = {
    assert(s.linesIterator.size === 1, s"artifact must be one JSON line: $s")
    assert(s.startsWith("{") && s.endsWith("}"))
    for (k <- Seq("\"metric\":\"total\"", "\"unit\":\"sec\"", "\"queries\":{", "\"runs\":"))
      assert(s.contains(k), s"artifact missing $k: $s")
    for (n <- names) assert(s.contains("\"" + n + "\":"), s"artifact missing $n: $s")
  }

  // InterruptedException is NonFatal-excluded (plain Error subclasses
  // are NOT) — and an interrupt is exactly what a driver-side timeout
  // kill delivers to a JVM that handles SIGTERM
  private class SimulatedKill extends InterruptedException("simulated driver kill")

  test("a fatal error mid-pass-2 leaves pass 1's complete artifact on disk") {
    val out = tmpOut()
    val names = Seq("qa", "qb", "qc")
    var pass = 0
    val beforePass = () => pass += 1
    val kill = intercept[SimulatedKill] {
      Bench.runLoop(names,
        name => if (pass >= 2) throw new SimulatedKill else Thread.sleep(1),
        runs = 3, budgetSec = 3600.0, sfDir = "sfX", outPath = out.toString,
        beforePass = beforePass)
    }
    assert(kill.getMessage === "simulated driver kill")
    val art = readJson(out)
    assertValidArtifact(art, names)
    assert(art.contains("\"runs\":1"), s"expected the pass-1 artifact, got $art")
    // pass 1 completed, so every query has a real (non -1) sample
    assert(!art.matches(""".*":-1\.0.*"""), s"pass-1 artifact has failures: $art")
  }

  test("a fatal error mid-pass-1 leaves a partial artifact covering the attempted queries") {
    val out = tmpOut()
    val names = (1 to 5).map(i => s"q$i")
    var ran = 0
    intercept[SimulatedKill] {
      Bench.runLoop(names,
        name => { ran += 1; if (ran > 3) throw new SimulatedKill else Thread.sleep(1) },
        runs = 3, budgetSec = 3600.0, sfDir = "sfX", outPath = out.toString,
        partialEvery = 2)
    }
    // the kill hit query 4; the last checkpoint was after query 2
    val art = readJson(out)
    assert(art.contains("\"partial\":true"), s"mid-pass-1 artifact must be flagged: $art")
    assert(art.contains("\"q1\":") && art.contains("\"q2\":"))
    assert(!art.contains("\"q3\":") && !art.contains("\"q5\":"),
      s"partial artifact must cover only checkpointed attempts: $art")
    assert(!art.contains(":-1.0"), "completed queries have real samples")
  }

  test("a completed pass 1 overwrites the partial artifact with an unflagged full one") {
    val out = tmpOut()
    val names = (1 to 5).map(i => s"q$i")
    val (best, passes) = Bench.runLoop(names, _ => Thread.sleep(1),
      runs = 1, budgetSec = 3600.0, sfDir = "sfX", outPath = out.toString,
      partialEvery = 2)
    assert(passes === 1 && best.size === 5)
    val art = readJson(out)
    assert(!art.contains("\"partial\""), s"final artifact must not carry the flag: $art")
    assertValidArtifact(art, names)
  }

  test("budget zero: pass 1 still completes in full; no re-runs start") {
    val out = tmpOut()
    val names = Seq("qa", "qb")
    val calls = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    val (best, passes) = Bench.runLoop(names,
      name => calls(name) += 1,
      runs = 3, budgetSec = 0.0, sfDir = "sfX", outPath = out.toString)
    assert(passes === 1)
    assert(calls.toMap === Map("qa" -> 1, "qb" -> 1))
    assert(best.keySet === names.toSet)
    assert(best.values.forall(_ >= 0))
    assertValidArtifact(readJson(out), names)
  }

  test("passes 2+ run heaviest-first and stop when the budget is spent mid-pass, still writing the artifact") {
    val out = tmpOut()
    val names = Seq("q_fast", "q_slow")
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    // pass 1 (~180 ms) fits the 0.25 s budget; pass 2 starts (budget
    // not yet spent), re-runs the slow query first, and the budget is
    // spent before the fast one — so q_slow gets 2 samples, q_fast 1
    val (_, passes) = Bench.runLoop(names,
      { name => order += name; Thread.sleep(if (name == "q_slow") 170 else 10) },
      runs = 3, budgetSec = 0.25, sfDir = "sfX", outPath = out.toString)
    assert(passes === 1, "the truncated pass 2 must not count as completed")
    assert(order.take(2) === Seq("q_fast", "q_slow"), "pass 1 runs registry order")
    if (order.size > 2)
      assert(order(2) === "q_slow", s"pass 2 must re-run heaviest first: $order")
    assert(order.count(_ == "q_slow") <= 2)
    assertValidArtifact(readJson(out), names)
  }

  test("a NonFatal per-query failure is recorded as -1, excluded from the total, and overwritten by a later success") {
    val out = tmpOut()
    val names = Seq("q_ok", "q_flaky")
    var attempt = 0
    val (best, passes) = Bench.runLoop(names,
      { name =>
        if (name == "q_flaky") {
          attempt += 1
          if (attempt == 1) throw new RuntimeException("boom")
        }
        Thread.sleep(1)
      },
      runs = 2, budgetSec = 3600.0, sfDir = "sfX", outPath = out.toString)
    assert(passes === 2)
    assert(best("q_ok") >= 0)
    assert(best("q_flaky") >= 0, "a pass-2 success must replace the -1 marker")
    assertValidArtifact(readJson(out), names)
  }

  test("jsonLine totals exclude failures and keep insertion-order query keys") {
    val line = Bench.jsonLine(Seq("qa", "qb", "qc"),
      Map("qa" -> 1.5, "qb" -> -1.0, "qc" -> 2.0), passes = 2, sfDir = "sfY")
    assert(line.contains("\"value\":3.5"))
    assert(line.contains("\"qb\":-1.0"))
    assert(line.indexOf("\"qa\"") < line.indexOf("\"qb\""))
    assert(line.indexOf("\"qb\"") < line.indexOf("\"qc\""))
    assert(line.contains("\"sf\":\"sfY\""))
  }
}
