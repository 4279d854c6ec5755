#!/usr/bin/env python3
"""Merge SpillBench outputs (JSON files and/or raw logs with [spill]
lines) into one entries map. Usage:
spill_merge.py out.json <file.json|file.log> ..."""
import json
import re
import sys

entries = {}
heap = cpus = None
for path in sys.argv[2:]:
    if path.endswith(".json"):
        d = json.load(open(path))
        heap, cpus = d.get("heap", heap), d.get("cpus", cpus)
        for k, v in d["entries"].items():
            entries.setdefault(k, []).append(v)
    else:
        for line in open(path):
            m = re.match(r"\[spill\] (\S+) (.*)", line.strip())
            if not m:
                continue
            name, kvs = m.group(1), {}
            for kv in m.group(2).split():
                if "=" not in kv:  # e.g. the exception class after FAIL
                    continue
                k, v = kv.split("=", 1)
                try:
                    kvs[k] = int(v) if k == "tasks" else float(v)
                except ValueError:
                    kvs[k] = v
            if "status" not in kvs:
                kvs["status"] = "ok"
            entries.setdefault(name, []).append(kvs)

# a repeated name = warm re-run (the delta-only upsert pricing): keep
# every run, suffix later ones
out = {}
for name, runs in entries.items():
    for i, r in enumerate(runs):
        out[name if i == 0 else f"{name}#run{i + 1}"] = r
json.dump({"heap": heap or "16g", "cpus": cpus or 32, "entries": out},
          open(sys.argv[1], "w"), indent=1)
print("merged", len(out), "entries ->", sys.argv[1])
