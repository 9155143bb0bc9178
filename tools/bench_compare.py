#!/usr/bin/env python3
"""Compare per-query floors across bench chains (builder analysis tool).

usage: bench_compare.py FLOOR_GROUP_A... -- FLOOR_GROUP_B...
Each group's per-query FLOOR (min across files) is compared; prints the
worst regressions/improvements and the totals.
"""
import json, sys

def floors(paths):
    out = {}
    for p in paths:
        q = json.load(open(p))["queries"]
        for k, v in q.items():
            out[k] = min(out.get(k, 1e18), v)
    return out

argv = sys.argv[1:]
i = argv.index("--")
a, b = floors(argv[:i]), floors(argv[i+1:])
shared = sorted(set(a) & set(b))
rows = [(b[k] - a[k], a[k], b[k], k) for k in shared]
print(f"shared {len(shared)}  floorsum A={sum(a[k] for k in shared):.1f}s  B={sum(b[k] for k in shared):.1f}s")
print("top regressions (B - A):")
for d, av, bv, k in sorted(rows, reverse=True)[:8]:
    print(f"  {k:28s} {av:7.2f} -> {bv:7.2f}  ({d:+.2f}s)")
print("top improvements:")
for d, av, bv, k in sorted(rows)[:8]:
    print(f"  {k:28s} {av:7.2f} -> {bv:7.2f}  ({d:+.2f}s)")
new = sorted(set(b) - set(a))
if new:
    print(f"new queries ({len(new)}): " + ", ".join(f"{k}={b[k]:.2f}s" for k in new))
