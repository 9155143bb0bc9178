#!/usr/bin/env python3
"""Round-17 floors table (builder analysis tool): per-query mins across
the r17 chain legs at each scale vs the r16 chain floors. VERDICT r16
next-#7: the mover list must be EXHAUSTIVE — every shared-query floor
move beyond +/-0.2 s is printed, both directions, no relative gate."""
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

def table(name, prev_glob, now_glob):
    a, b = sorted(glob.glob(prev_glob)), sorted(glob.glob(now_glob))
    if not b:
        print(f"-- {name}: no r17 legs yet ({now_glob})")
        return
    fp, fn = floors(a), floors(b)
    shared = sorted(set(fp) & set(fn))
    sp, sn = sum(fp[k] for k in shared), sum(fn[k] for k in shared)
    print(f"== {name}: r16 legs={len(a)} r17 legs={len(b)}  shared {len(shared)} "
          f"floorsum {sp:.1f} -> {sn:.1f} s ({(sn/sp-1)*100:+.1f}%)")
    rows = sorted(((fn[k] - fp[k]), k) for k in shared)
    moved = [(k, fp[k], fn[k]) for d, k in rows if abs(d) > 0.2]
    for k, x, y in moved:
        print(f"   moved {k:28s} {x:7.2f} -> {y:7.2f}  ({(y/x-1)*100:+.0f}%)")
    missing = sorted(set(fp) - set(fn))
    if missing:
        print("   MISSING from r17: " + ", ".join(missing))

table("sf0.1", "BENCH_sf0.1_r16?.json", "BENCH_sf0.1_r17?.json")
table("sf1  ", "BENCH_sf1_r16*.json", "BENCH_sf1_r17?.json")
table("sf10 ", "BENCH_sf10_r16[abc]*.json", "BENCH_sf10_r17?.json")
