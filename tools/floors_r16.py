#!/usr/bin/env python3
"""Round-16 floors table (builder analysis tool): per-query mins across
the r16 chain legs at each scale vs the r15 chain floors, printed as the
SCALE.md summary. Bench files are JSONL; line 0 carries the best-of-reps
per-query map (see Bench.scala)."""
import glob
import json

def floors(paths):
    out = {}
    for p in paths:
        try:
            d = json.loads(open(p).readline())
        except ValueError:
            print(f"   !! skipping {p}: empty/in-progress")
            continue
        if d.get("failed"):
            print(f"   !! skipping {p}: failed={d['failed'][:3]}…")
            continue
        for k, v in d["queries"].items():
            out[k] = min(out.get(k, 1e18), v)
    return out

def table(name, r15_glob, r16_glob):
    a, b = sorted(glob.glob(r15_glob)), sorted(glob.glob(r16_glob))
    if not b:
        print(f"-- {name}: no r16 legs yet ({r16_glob})")
        return
    f15, f16 = floors(a), floors(b)
    shared = sorted(set(f15) & set(f16))
    s15, s16 = sum(f15[k] for k in shared), sum(f16[k] for k in shared)
    print(f"== {name}: r15 legs={len(a)} r16 legs={len(b)}  shared {len(shared)} "
          f"floorsum {s15:.1f} -> {s16:.1f} s ({(s16/s15-1)*100:+.1f}%)")
    rows = sorted(((f16[k] - f15[k]), k) for k in shared)
    moved = [(k, f15[k], f16[k]) for d, k in rows if abs(d) > max(0.2, 0.3 * f15[k])]
    for k, x, y in moved:
        print(f"   moved {k:28s} {x:7.2f} -> {y:7.2f}")
    new = sorted(set(f16) - set(f15))
    if new:
        print("   new: " + ", ".join(f"{k}={f16[k]:.2f}" for k in new))

table("sf0.1", "BENCH_sf0.1_r15?.json", "BENCH_sf0.1_r16?.json")
table("sf1  ", "BENCH_sf1_r15?.json", "BENCH_sf1_r16*.json")
table("sf10 ", "BENCH_sf10_r15?.json", "BENCH_sf10_r16*.json")
