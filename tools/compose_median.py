#!/usr/bin/env python
"""Compose the artifact of record from N same-day full bench passes:
per-entry MEDIAN across the passes (BENCH_LOCAL.md's round-13 rule for
tide-resistant regens). Meta keys (_sf, _nqueries) are copied from the
last pass; the load/tide annotations record each pass's values so the
artifact carries its own calm-window evidence.
Usage: compose_median.py <out.json> <pass1.json> [pass2.json ...]
"""
import json
import statistics
import sys


def main(out_path, *passes):
    runs = [json.load(open(p)) for p in passes]
    keys = set()
    for r in runs:
        keys |= {k for k in r if not k.startswith("_")}
    composed = {}
    for k in sorted(keys):
        vals = [r[k] for r in runs if k in r
                and isinstance(r[k], (int, float)) and r[k] >= 0]
        if not vals:
            composed[k] = -1.0
        else:
            composed[k] = statistics.median(vals)
    meta = {
        "_sf": runs[-1].get("_sf"),
        "_nqueries": runs[-1].get("_nqueries"),
        "_load1_start": runs[-1].get("_load1_start"),
        "_load1_end": runs[-1].get("_load1_end"),
        "_tide_wait_sec": runs[-1].get("_tide_wait_sec"),
        "_composed_of": len(runs),
        "_pass_load1": [[r.get("_load1_start"), r.get("_load1_end")]
                        for r in runs],
    }
    body = {**meta, **composed}
    with open(out_path, "w") as f:
        json.dump(body, f, indent=2, sort_keys=False)
        f.write("\n")
    total = sum(v for k, v in composed.items() if v >= 0)
    print(f"composed {len(composed)} entries from {len(runs)} passes; "
          f"total {total:.1f} s")


if __name__ == "__main__":
    main(sys.argv[1], *sys.argv[2:])
