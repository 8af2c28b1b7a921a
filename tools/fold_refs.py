#!/usr/bin/env python3
"""Min-fold bench passes into bench_ref.json: add first entries for new
queries, tighten existing entries where a pass's warm beat the ref.
Usage: fold_refs.py ref.json pass1.json [pass2.json ...]
Prints the changes; writes ref.json in place.
"""
import json, sys

ref_path = sys.argv[1]
ref = json.load(open(ref_path))
passes = [json.load(open(p)) for p in sys.argv[2:]]

mins = {}
for p in passes:
    for name, q in p["queries"].items():
        w = q["warm"]
        if name not in mins or w < mins[name]:
            mins[name] = w

added, tightened = [], []
for name, w in sorted(mins.items()):
    w = round(w, 3)
    if name not in ref:
        ref[name] = w
        added.append((name, w))
    elif w < ref[name]:
        tightened.append((name, ref[name], w))
        ref[name] = w

print("ADDED:")
for n, w in added:
    print(f"  {n} {w}")
print("TIGHTENED:")
for n, old, new in tightened:
    print(f"  {n} {old} -> {new}")

json.dump(ref, open(ref_path, "w"), indent=1)
print("factors:", [p.get("host_factor") for p in passes],
      "totals:", [round(p["value"], 1) for p in passes])
