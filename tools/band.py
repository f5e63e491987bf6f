#!/usr/bin/env python
"""Artifact-of-record band check (BENCH_LOCAL.md's rule): common-entry
per-query ratio median of a fresh BENCH_QUERIES.json against a previous
artifact. Usage: python tools/band.py <new.json> <old.json> [threshold_s]
Prints the median, the >=1.8x movers, and exits 1 when the median is
outside the 0.85-1.20 same-day band."""
import json
import statistics
import sys


def main(new_path, old_path, thresh=0.0):
    new = json.load(open(new_path))
    old = json.load(open(old_path))
    common = [k for k in new if not k.startswith("_") and k in old
              and isinstance(new[k], (int, float))
              and isinstance(old[k], (int, float))
              and new[k] > 0 and old[k] > 0
              and max(new[k], old[k]) >= thresh]
    ratios = {k: new[k] / old[k] for k in common}
    if not ratios:
        print("no common positive entries — artifacts are not comparable")
        print("BAND VIOLATION (0.85-1.20)")
        return 1
    med = statistics.median(ratios.values())
    print(f"common entries: {len(common)}  median ratio: {med:.3f}")
    movers = sorted((r, k) for k, r in ratios.items()
                    if r >= 1.8 or r <= 1 / 1.8)
    for r, k in movers:
        print(f"  mover {k}: {old[k]:.2f} -> {new[k]:.2f} ({r:.2f}x)")
    fails = [k for k in new if not k.startswith("_") and new[k] == -1.0]
    for k in fails:
        print(f"  FAILED ENTRY {k} = -1")
    ok = 0.85 <= med <= 1.20 and not fails
    print("BAND " + ("OK" if ok else "VIOLATION (0.85-1.20)"))
    return 0 if ok else 1


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    sys.exit(main(sys.argv[1], sys.argv[2], t))
