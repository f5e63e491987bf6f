package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the repo's helper tooling. `tools/parse_bench.py` recovers the
  * metric map from a historical `BENCH_r{N}.json` whose `parsed` is null
  * (the pre-r17 sbt `[info] ` decoration problem — see BENCH_LOCAL.md);
  * its `--selftest` covers decorated, raw, and mid-line-truncated tails.
  */
class ToolsSpec extends AnyFunSuite {

  test("parse_bench.py --selftest passes (tail-recovery contract)") {
    // resolve python3 through PATH — hardcoded /usr/bin paths would
    // silently skip the contract on pyenv/homebrew/nix hosts
    val proc =
      try new ProcessBuilder("python3", "tools/parse_bench.py",
        "--selftest").inheritIO().start()
      catch { case _: java.io.IOException =>
        cancel("python3 not on PATH on this box")
      }
    assert(proc.waitFor() == 0, "parse_bench selftest failed")
  }
}
