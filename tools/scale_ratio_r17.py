#!/usr/bin/env python3
"""Round-17 core-scaling table (VERDICT r16 next-#1): per-query
8-core/32-core wall ratios at sf10 from the probe_scale_r17.sh artifacts,
with each arm's cpu ratio (process-CPU/wall) as the parallelism
self-diagnosis — a query whose c32 cpu ratio is ~1 is serial on the
driver/single task; one whose wall barely moves at 8 cores but shows
high cpu at 32 was never core-bound at this SF."""
import json
import sys

def load(p):
    d = json.loads(open(p).readline())
    return d["queries"], d.get("cpu", {}), d.get("gc", {})

q32, c32, g32 = load(sys.argv[1] if len(sys.argv) > 1 else "BENCH_sf10_c32_r17_full.json")
q8, c8, g8 = load(sys.argv[2] if len(sys.argv) > 2 else "BENCH_sf10_c8_r17_full.json")

rows = []
for k in sorted(q32, key=lambda k: -q32[k]):
    if k in q8:
        rows.append((k, q32[k], q8[k], q8[k] / q32[k], c32.get(k), c8.get(k)))
print(f"| query | c32 s | c8 s | c8/c32 | cpu@32 | cpu@8 |")
print(f"|---|---|---|---|---|---|")
for k, a, b, r, x, y in rows:
    print(f"| {k} | {a:.2f} | {b:.2f} | {r:.2f} | {x:.1f} | {y:.1f} |")
tot32 = sum(q32[k] for k, *_ in [(r[0],) for r in rows])
tot8 = sum(q8[r[0]] for r in rows)
print(f"\nsum: c32 {tot32:.1f} s, c8 {tot8:.1f} s, ratio {tot8/tot32:.2f}")
