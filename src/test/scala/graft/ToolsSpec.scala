package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the repo's helper tooling. `tools/parse_bench.py` recovers the
  * metric map from a historical `BENCH_r{N}.json` whose `parsed` is null
  * (the pre-r17 sbt `[info] ` decoration problem — see BENCH_LOCAL.md);
  * its `--selftest` covers decorated, raw, and mid-line-truncated tails.
  */
class ToolsSpec extends AnyFunSuite {

  test("parse_bench.py --selftest passes (tail-recovery contract)") {
    val python = Seq("/usr/bin/python3", "/usr/local/bin/python3")
      .find(p => new java.io.File(p).canExecute)
    assume(python.isDefined, "python3 not on this box")
    val proc = new ProcessBuilder(python.get, "tools/parse_bench.py",
      "--selftest").inheritIO().start()
    assert(proc.waitFor() == 0, "parse_bench selftest failed")
  }
}
