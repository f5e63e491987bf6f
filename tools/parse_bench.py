#!/usr/bin/env python3
"""Recover the parsed metric map from a BENCH_r{N}.json whose "parsed" is null.

The per-round driver captures `sbt runMain graft.Bench` output, keeps the
last ~2000 chars as "tail", and json-parses the tail line-wise for Bench's
one-line metric JSON. Under sbt's default LoggedOutput every forked-process
line is decorated with "[info] " / "[error] ", so the parse fails even
though the JSON line is fully present — BENCH_r14..r16 all carry
"parsed": null for exactly this reason (fixed going forward by
`run / outputStrategy := StdoutOutput` in build.sbt).

Usage:
    tools/parse_bench.py BENCH_r16.json          # print the recovered map
    tools/parse_bench.py --selftest              # exit 0 iff recovery works

The recovery is the driver's own contract, minus the decoration: scan the
tail's lines, strip any leading "[level] " sbt prefix, and json-parse the
first line that yields an object with a "metric" key.
"""
import json
import re
import sys

SBT_PREFIX = re.compile(r"^\[(?:info|error|warn|debug|success)\]\s+")


def parse_tail(tail: str):
    """Return the metric dict embedded in a captured-stdout tail, or None."""
    for line in tail.splitlines():
        line = SBT_PREFIX.sub("", line.strip())
        # The tail may begin mid-line; recover by seeking the JSON start.
        start = line.find('{"metric"')
        if start < 0:
            continue
        try:
            obj = json.loads(line[start:])
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and "metric" in obj:
            return obj
    return None


def selftest() -> int:
    tail = (
        "[error] 26/08/16 WARN DAGScheduler: noise\n"
        '[info] {"metric":"total","value":1.5,"unit":"sec",'
        '"queries":{"q1":0.5,"q2":1.0},"nqueries":2}\n'
        "[success] Total time: 815 s\n"
    )
    got = parse_tail(tail)
    assert got is not None and got["queries"] == {"q1": 0.5, "q2": 1.0}, got
    # Raw (StdoutOutput) lines and tails that begin mid-line must also work.
    assert parse_tail('{"metric":"total","value":1,"queries":{}}')["value"] == 1
    assert parse_tail('-af87-x. Temp.\n{"metric":"t","queries":{"a":2}}\nok')[
        "queries"
    ] == {"a": 2}
    assert parse_tail("[info] no json here\n") is None
    print("selftest ok")
    return 0


def main(argv) -> int:
    if len(argv) != 2:
        print(__doc__.strip(), file=sys.stderr)
        return 2
    if argv[1] == "--selftest":
        return selftest()
    with open(argv[1]) as f:
        artifact = json.load(f)
    parsed = artifact.get("parsed") or parse_tail(artifact.get("tail", ""))
    if parsed is None:
        print("no metric line found in tail", file=sys.stderr)
        return 1
    json.dump(parsed, sys.stdout, indent=1, sort_keys=True)
    print()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
