#!/usr/bin/env python3
"""Compare two bench JSON artifacts for run-to-run reproducibility.

Usage: bench_compare.py <run1.json> <run2.json> [rel_tol] [abs_floor]

Flags per-query disagreements beyond rel_tol (default 1.2x) with an
absolute floor (default 0.5s) so sub-second scheduling noise doesn't
drown the signal. Exit 1 if any query disagrees.
"""
import json
import sys


def main():
    r1 = json.load(open(sys.argv[1]))
    r2 = json.load(open(sys.argv[2]))
    rel = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    print("total: %.1fs vs %.1fs" % (r1["value"], r2["value"]))
    common = sorted(set(r1["queries"]) & set(r2["queries"]))
    only = set(r1["queries"]) ^ set(r2["queries"])
    if only:
        print("queries present in only one run:", sorted(only))
    bad = []
    for q in common:
        a, b = r1["queries"][q], r2["queries"][q]
        if a < 0 or b < 0:
            bad.append((q, a, b))
        elif max(a, b) > rel * min(a, b) and max(a, b) - min(a, b) > floor:
            bad.append((q, a, b))
    for q, a, b in sorted(bad, key=lambda x: -abs(x[1] - x[2])):
        print("  DISAGREE %-26s %.2fs vs %.2fs" % (q, a, b))
    print("== %d/%d queries agree (rel %.2fx, floor %.1fs) ==" %
          (len(common) - len(bad), len(common), rel, floor))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
