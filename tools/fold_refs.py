#!/usr/bin/env python3
"""Fold bench passes into bench_ref.json.

Policy (round 9):
  * ADD     — first entry for a new query: min across this fold's passes.
  * TIGHTEN — existing entry, same definition: min-fold (refs only ever
              tighten; co-tenant noise is strictly additive so the min
              over clean passes estimates the noise-free time).
  * RESET   — the query's DEFINITION changed since the ref was recorded
              (source-span fingerprint mismatch, or --reset qXX): the
              old ref describes a retired implementation, so the entry
              is REPLACED by this fold's min instead of min-folded.
              Without this, a query rewritten into a strictly heavier
              (e.g. exact-audit) form keeps its old ref forever and
              reads as a permanent "regression" (round-8 q27/q38).

Fingerprints live in bench_ref_fp.json ({query: sha256-of-source-span});
bench_ref.json stays a flat {name: sec} object (graft.Bench parses it
with a regex). A span is the text from the query's `QueryDef("name"` to
the next `QueryDef(` in the same file — helper-function edits don't move
it, so --reset remains the manual override for helper-level rewrites.

Basis guard (the session-5 lesson, hand-undone at the time): only full
graft.Bench artifacts are a valid basis — Probe (local[4]/count) and
Bench (local[32]/noop) diverge ~2x per query. A pass file must carry
Bench's run-level markers (cold_total + host_factor), and a fold whose
median existing-query ratio is implausibly FAST (< 0.67x — faster than
any machine state ever observed) is refused without --force.

Usage: fold_refs.py ref.json pass1.json [pass2.json ...]
                    [--reset q27_x,q38_y] [--force]
Prints the changes; writes ref.json and bench_ref_fp.json in place.
"""
import hashlib
import json
import re
import sys
from pathlib import Path

args = []
force = False
resets = set()
it = iter(sys.argv[1:])
for a in it:
    if a == "--force":
        force = True
    elif a == "--reset":
        resets.update(next(it, "").split(","))
    elif a.startswith("--reset="):
        resets.update(a.split("=", 1)[1].split(","))
    else:
        args.append(a)

ref_path = Path(args[0])
fp_path = ref_path.with_name("bench_ref_fp.json")
ref = json.load(open(ref_path))
fps = json.load(open(fp_path)) if fp_path.exists() else {}


def source_fingerprints(src_root="src/main/scala/graft"):
    """query name -> sha256 of its QueryDef source span."""
    out = {}
    for p in Path(src_root).rglob("*.scala"):
        txt = p.read_text()
        starts = [(m.start(), m.group(1))
                  for m in re.finditer(r'QueryDef\(\s*"([^"]+)"', txt)]
        for i, (pos, name) in enumerate(starts):
            end = starts[i + 1][0] if i + 1 < len(starts) else len(txt)
            out[name] = hashlib.sha256(txt[pos:end].encode()).hexdigest()[:16]
    return out


def check_basis(path, p):
    """Refuse non-Bench artifacts (ADVICE r8: Probe/hand-made files
    folded silently was the exact session-5 failure mode)."""
    missing = [k for k in ("cold_total", "host_factor", "queries") if k not in p]
    if missing:
        sys.exit(f"REFUSED {path}: missing Bench markers {missing} — "
                 "only full graft.Bench artifacts are a valid ref basis "
                 "(Probe diverges ~2x per query; see bench_ref comment)")


cur_fps = source_fingerprints()
passes = []
for path in args[1:]:
    p = json.load(open(path))
    check_basis(path, p)
    passes.append(p)

mins = {}
for p in passes:
    for name, q in p["queries"].items():
        w = q["warm"]
        if name not in mins or w < mins[name]:
            mins[name] = w

# Plausibility: median ratio of this fold's mins vs existing entries.
ratios = sorted(mins[n] / ref[n] for n in mins
                if n in ref and isinstance(ref[n], (int, float)) and ref[n] > 0)
if ratios:
    med = ratios[len(ratios) // 2]
    # >= 5 samples before trusting the median (BenchStats.MinSamples):
    # one legitimately-tightened query must not read as a wrong basis.
    if len(ratios) >= 5 and med < 0.67 and not force:
        sys.exit(f"REFUSED: median existing-query ratio {med:.2f} is "
                 "implausibly fast for this box (< 0.67) — wrong basis or "
                 "wrong SF dir? Re-run with --force to fold anyway.")
else:
    med = None

added, tightened, reset = [], [], []
for name, w in sorted(mins.items()):
    w = round(w, 3)
    fp = cur_fps.get(name)
    if name not in ref:
        ref[name] = w
        added.append((name, w))
    elif name in resets or (fp is not None and fps.get(name) not in (None, fp)):
        why = "manual" if name in resets else "fingerprint"
        reset.append((name, ref[name], w, why))
        ref[name] = w
    elif w < ref[name]:
        tightened.append((name, ref[name], w))
        ref[name] = w
    if fp is not None:
        fps[name] = fp

print("ADDED:")
for n, w in added:
    print(f"  {n} {w}")
print("TIGHTENED:")
for n, old, new in tightened:
    print(f"  {n} {old} -> {new}")
print("RESET (definition changed — replaced, not min-folded):")
for n, old, new, why in reset:
    print(f"  {n} {old} -> {new} [{why}]")

json.dump(ref, open(ref_path, "w"), indent=1)
json.dump(fps, open(fp_path, "w"), indent=1, sort_keys=True)
print("factors:", [p.get("host_factor") for p in passes],
      "totals:", [round(p["value"], 1) for p in passes],
      "median_ratio:", round(med, 2) if med else None)
