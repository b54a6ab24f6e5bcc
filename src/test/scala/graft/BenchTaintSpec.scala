package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench taint predicate — specifically the historical-minimum gate
  * added after rounds 6/7, when 2–4× swings on 2–4 s queries (clean steal,
  * under the absolute slow gate) sailed through the hedge unmeasured. */
class BenchTaintSpec extends AnyFunSuite {
  private val stealTol = 0.20
  private val slowSec = 5.0
  private val factor = 1.5

  private def t(secs: Double, steal: Double = 0.0, hist: Option[Double] = None) =
    Bench.tainted(secs, steal, stealTol, slowSec, hist, factor)

  test("planted 2x slowdown on a 2s query is caught by the history gate") {
    // the exact blind spot: 2.0s historical min, measured 4.0s, zero steal,
    // under the 5s absolute gate — the old rule passed this, the new taints
    assert(t(secs = 4.0, steal = 0.0, hist = Some(2.0)))
  }

  test("a clean measurement within 1.3x of its minimum is not tainted") {
    assert(!t(secs = 2.5, hist = Some(2.0)))
    assert(!t(secs = 2.0, hist = Some(2.0)))
    // a NEW minimum is never tainted by its own history
    assert(!t(secs = 1.5, hist = Some(2.0)))
  }

  test("steal and absolute-slow gates still fire independently of history") {
    assert(t(secs = 1.0, steal = 0.5, hist = Some(1.0)))
    assert(t(secs = 6.0, steal = 0.0, hist = None))
    assert(!t(secs = 4.9, steal = 0.19, hist = None)) // old behavior w/o history
  }

  test("history file round-trips through the writer's format") {
    val p = java.nio.file.Files.createTempFile("bench_hist", ".json")
    java.nio.file.Files.writeString(p,
      "{\n\"q_a\":1.234,\n\"q_b\":0.500\n}\n")
    val h = Bench.loadHistory(p.toString)
    assert(h == Map("q_a" -> 1.234, "q_b" -> 0.5))
    // missing file degrades to empty history, not a crash
    assert(Bench.loadHistory("/nonexistent/bench_hist.json").isEmpty)
  }
}
