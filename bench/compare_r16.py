#!/usr/bin/env python3
"""Compare a fresh bench record (bench/latest_full.json) against the
round-15 driver record (BENCH_r15.json): per-query median/min deltas,
sorted by absolute median saving. Round-16 optimization evidence tool."""
import json, sys

r15 = json.load(open("BENCH_r15.json"))["parsed"]
new = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "bench/latest_full.json"))

old_q = r15["queries"]
new_q = {k: [v["median"], v["min"]] for k, v in new["runs"].items()} \
    if "runs" in new else new["queries"]

rows = []
for k, (om, omin) in old_q.items():
    nm, nmin = new_q.get(k, (float("nan"),) * 2)
    rows.append((k, om, nm, om - nm, omin, nmin, omin - nmin))
rows.sort(key=lambda r: -r[3])
print(f"{'query':45s} {'med15':>7s} {'med16':>7s} {'dmed':>7s} "
      f"{'min15':>7s} {'min16':>7s} {'dmin':>7s}")
tot_o = tot_n = 0.0
for k, om, nm, dm, omin, nmin, dmin in rows:
    tot_o += om; tot_n += nm
    print(f"{k:45s} {om:7.3f} {nm:7.3f} {dm:+7.3f} {omin:7.3f} {nmin:7.3f} {dmin:+7.3f}")
print(f"{'TOTAL (shared 40)':45s} {tot_o:7.3f} {tot_n:7.3f} {tot_o - tot_n:+7.3f}")
if "soloFloors" in new:
    sf = new["soloFloors"]
    samples = sf.get("samples", sf) if isinstance(sf, dict) else sf
    print("\nsolo floors (new):")
    if isinstance(samples, dict):
        for k, v in samples.items():
            mn = min(x for x in v if x >= 0) if isinstance(v, list) else v
            old = r15.get("soloFloors", {}).get(k)
            print(f"  {k:43s} {mn:7.3f}  (r15: {old})")
