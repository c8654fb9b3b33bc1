#!/usr/bin/env python3
"""Compare two Bench JSON artifacts (BENCH_LOCAL.json / BENCH_r*.json).

Usage: bench_diff.py <old.json> <new.json> [threshold]

Prints totals over the common query set, the median per-query ratio
(the robust round-over-round signal — battery totals move with query
count and machine noise), and every query whose ratio exceeds the
threshold (default 1.3) in either direction, so a structural
regression is visible even when the total looks flat.
"""
import json
import statistics
import sys


def load(p):
    d = json.load(open(p))
    return d["queries"] if "queries" in d else d


def main(old_p, new_p, thr=1.3):
    old, new = load(old_p), load(new_p)
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if not common:
        print("no common queries")
        return 1
    ratios = {k: new[k] / old[k] for k in common if old[k] > 0}
    skipped = [k for k in common if old[k] <= 0]
    s_old = sum(old[k] for k in common)
    s_new = sum(new[k] for k in common)
    med = (f"{statistics.median(ratios.values()):.3f}"
           if ratios else "n/a (no nonzero baselines)")
    tot = f"{s_new / s_old:.3f}x" if s_old > 0 else "n/a"
    print(f"common {len(common)}: {s_old:.1f}s -> {s_new:.1f}s "
          f"({tot}), median ratio {med}")
    if skipped:
        print(f"skipped {len(skipped)} zero-baseline: {', '.join(skipped)}")
    if added:
        extra = sum(new[k] for k in added)
        print(f"added {len(added)} ({extra:.1f}s): {', '.join(added)}")
    if removed:
        print(f"removed {len(removed)}: {', '.join(removed)}")
    flagged = [(k, r) for k, r in ratios.items()
               if r > thr or r < 1 / thr]
    for k, r in sorted(flagged, key=lambda x: -x[1]):
        print(f"  {r:5.2f}x  {k}: {old[k]:.2f}s -> {new[k]:.2f}s")
    return 0


if __name__ == "__main__":
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    sys.exit(main(sys.argv[1], sys.argv[2], thr))
