#!/usr/bin/env python3
"""Four-point scale fits: merge the r6 three-scale bench with an sf100
SpillBench run and fit log t vs log k over sf0.1/sf1/sf10/sf100
(k = 1/10/100/1000). Usage: spill_fit.py <spillbench.json> [out.json]."""
import json
import math
import sys

spill = json.load(open(sys.argv[1]))
three = json.load(open("BENCH_3SCALE_r06.json"))["fits"]

out = {
    "note": ("round-8 four-point scale fit: sf0.1/sf1/sf10 from "
             "BENCH_3SCALE_r06.json (quiet-machine medians) + sf100 single "
             "trial on a deliberately bounded 16g heap (SpillBench, 14 GB "
             "input, 1000x replica) - the sf100 point prices REAL "
             "spill-to-disk, so its fit bounds the spill regime, not the "
             "in-memory one"),
    "heap": spill.get("heap"),
    "entries": {},
}
ks = [1.0, 10.0, 100.0, 1000.0]
for name, m in spill["entries"].items():
    row = {
        "sf100_sec": m["sec"], "status": m["status"],
        "spill_disk_gb": m["spill_disk_gb"],
        "shuffle_write_gb": m["shuffle_write_gb"],
        "peak_exec_mem_gb": m["peak_exec_mem_gb"],
    }
    for extra in ("codec", "note"):
        if extra in m:
            row[extra] = m[extra]
    t3 = three.get(name)
    if t3 and m["status"] == "ok":
        ts = [t3.get("sf0.1"), t3.get("sf1"), t3.get("sf10"), m["sec"]]
        if all(ts):
            lx = [math.log(k) for k in ks]
            ly = [math.log(t) for t in ts]
            n = len(lx)
            sx, sy = sum(lx), sum(ly)
            sxx = sum(x * x for x in lx)
            sxy = sum(x * y for x, y in zip(lx, ly))
            slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
            row.update({"sf0.1": ts[0], "sf1": ts[1], "sf10": ts[2],
                        "exponent_4pt": round(slope, 3),
                        "ratio_sf10_to_sf100": round(m["sec"] / ts[2], 2)})
    out["entries"][name] = row

dst = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SF100_SPILL.json"
json.dump(out, open(dst, "w"), indent=1)
for n, r in sorted(out["entries"].items(), key=lambda kv: -kv[1]["sf100_sec"]):
    print(f"{n:34s} sf100={r['sf100_sec']:8.1f}s "
          f"exp4={r.get('exponent_4pt', '-'):>5} "
          f"x{r.get('ratio_sf10_to_sf100', '-'):>5} "
          f"spill={r['spill_disk_gb']}GB shufw={r['shuffle_write_gb']}GB")
print("wrote", dst)
