package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-12 bench_compare calibration contract (round-11 verdict
  * #1) by running the tool's executable self-test: a same-code rerun
  * under a 15% host shift with realistic jitter exits 0, a planted 2×
  * slowdown in one query is still caught, >1% shuffle drift is
  * PLAN-CHANGED, the space-separated threshold flag parses, and the
  * legacy (no queries_min) fallback works. The fixtures and assertions
  * live in tools/test_bench_compare.py so the contract is runnable
  * standalone too; this spec only fails the build when they fail. */
class BenchCompareSpec extends AnyFunSuite {

  test("tools/bench_compare.py self-test passes (calibrated regression rule)") {
    import scala.sys.process._
    val py = Seq("python3", "--version").!(ProcessLogger(_ => ()))
    assume(py == 0, "python3 not on PATH — self-test runs driver-side only")
    val out = new StringBuilder
    val rc = Seq("python3", "tools/test_bench_compare.py")
      .!(ProcessLogger(l => { out.append(l).append('\n'); () }))
    assert(rc == 0, s"self-test failed:\n$out")
    assert(out.toString.contains("ALL PASS"), s"unexpected output:\n$out")
  }
}
