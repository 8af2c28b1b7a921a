#!/usr/bin/env python3
"""Local parity self-check mirroring the driver's DuckDB-oracle compare:
run graft.Verify (via sbt) at a given SF, then for each query compare
the Spark parquet result against the DuckDB oracle SQL (columns sorted
by name, values hashed). Usage:
    python3 tools/check_parity.py [sfDir] [outDir] [--skip-verify]
                                  [--oracle-timeout=SECONDS]
                                  [--json=PATH]

Robustness contract (round-9 verdict task 1: the driver's artifact came
back empty after ONE oracle raised): every per-query failure — wrong
rows, a raising oracle, a missing result dir — is RECORDED and the
sweep continues; nothing aborts the run. Each oracle runs on its own
DuckDB cursor (two threads must never share a connection), and a
cursor whose query survives interrupt+grace is abandoned, not reused.
Only queries in HEAVY_TIMEOUT_OK may be skipped on timeout (q145 is
the one remaining full char-level miner re-mine, which spills
unboundedly at sf0.1 — its sf0.1 evidence is check_graph_sf01.py's
pair-store replay); a timeout anywhere else counts as a failure.

A driver-format per-query summary (rows/schema/hash match) is written
to --json (default /root/repo/correctness_out.json) so the round's
correctness surface can be adjudicated from the repo even if the
driver-side artifact is lost again.
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Queries whose oracle is ALLOWED to be skipped on timeout: the full
# char-level multi-signal re-mine (the q145 store anchor). Everything
# else must finish inside the budget or the sweep fails — a silent
# skip outside this list would hide a regression (round-9 advice).
HEAVY_TIMEOUT_OK = {"q145_pairs_store"}


def run_verify():
    cmd = ["sbt", f'runMain graft.Verify {SF_DIR} {OUT}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:], r.stderr[-2000:])
        sys.exit("verify run failed")
    for line in r.stdout.splitlines():
        if "[verify]" in line:
            print(line)


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


# DuckDB output types the DRIVER's pandas-based comparator cannot
# represent faithfully: HUGEINT/UHUGEINT coerce to float64 (so the
# driver hashes `1152256.0` against Spark's int64 `1152256` and fails
# even though every value matches — round 10's only red row, q21) and
# DECIMAL coerces to object/float. No oracle may output one; builders
# must CAST (typically to BIGINT).
BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def table_rows(rel):
    cols = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
    names = [rel.columns[i] for i in cols]
    types = [str(rel.types[i]) for i in cols]
    rows = [tuple(norm(r[i]) for i in cols) for r in rel.fetchall()]
    return names, sorted(rows), types


def run_with_timeout(con, sql, seconds):
    """table_rows(cur.sql(sql)) on a FRESH cursor, interrupted after
    `seconds`. Returns (result, err, timed_out). The cursor is private
    to the worker thread; if the worker survives interrupt + grace the
    cursor is abandoned (never reused), so a stuck oracle cannot
    corrupt later queries on the shared connection.
    """
    import threading
    cur = con.cursor()
    out, err = [], []

    def work():
        try:
            out.append(table_rows(cur.sql(sql)))
        except Exception as e:  # includes InterruptException
            err.append(e)

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(seconds)
    if t.is_alive():
        cur.interrupt()
        t.join(30)
        if t.is_alive():
            print("  (worker survived interrupt — cursor abandoned)")
        else:
            cur.close()  # interrupted cleanly: release its resources
        return None, None, True
    cur.close()
    if err:
        return None, err[0], False
    return out[0], None, False


def main():
    if "--skip-verify" not in sys.argv:
        run_verify()
    timeout = 900.0
    json_path = Path("/root/repo/correctness_out.json")
    for a in sys.argv:
        if a.startswith("--oracle-timeout="):
            timeout = float(a.split("=", 1)[1])
        if a.startswith("--json="):
            json_path = Path(a.split("=", 1)[1])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    report = {}
    failures = 0
    timed_out = []

    def record(name, rows_match=False, schema_match=False, hash_match=False,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    # every toplevel dir is a query result: since round 11 Verify
    # publishes the oracle side-files (frames/media dumps, pair store)
    # to the SIBLING directory <outDir>_dumps, outside any iteration
    # of outDir (round-10 verdict task 2 — the driver's scan picked up
    # an in-outDir _dumps/ as a phantom query). The underscore filter
    # stays as a belt against stale pre-round-11 outDirs.
    for name in sorted(p.name for p in OUT.iterdir()
                       if p.is_dir() and not p.name.startswith("_")):
        try:
            gn, gr, gt = table_rows(
                con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'"))
        except Exception as e:
            print(f"✗ {name}: spark result unreadable: {e}")
            record(name, err=f"spark result unreadable: {e}")
            failures += 1
            continue
        if name not in oracle:
            # schema/hash were NOT compared — record null, never a
            # fabricated True an adjudicator could mistake for a pass.
            # An EMPTY rows-only result is a FAILURE (round-10 advice:
            # the exit code and the JSON must agree — previously the
            # err string was recorded but the sweep still exited 0).
            if not gr:
                print(f"✗ {name}: rows-only check found 0 rows")
                failures += 1
            else:
                print(f"  {name}: rows-only ({len(gr)} rows)")
            record(name, rows_match=len(gr) > 0, schema_match=None,
                   hash_match=None, spark_rows=len(gr),
                   err=None if gr else "rows-only check found 0 rows")
            continue
        res, err, was_timeout = run_with_timeout(con, oracle[name], timeout)
        if was_timeout:
            if name in HEAVY_TIMEOUT_OK:
                timed_out.append(name)
                print(f"⏱ {name}: oracle timed out after {timeout:.0f}s — "
                      "allowlisted heavy re-mine; at sf0.1 its evidence "
                      "is check_graph_sf01.py")
                record(name, spark_rows=len(gr),
                       err=f"oracle timeout {timeout:.0f}s (allowlisted)")
            else:
                print(f"✗ {name}: oracle TIMED OUT after {timeout:.0f}s "
                      "(not allowlisted) — counted as failure")
                record(name, spark_rows=len(gr),
                       err=f"oracle timeout {timeout:.0f}s")
                failures += 1
            continue
        if err is not None:
            print(f"✗ {name}: oracle raised: {err}")
            record(name, spark_rows=len(gr), err=f"oracle raised: {err}")
            failures += 1
            continue
        en, er, et = res
        # Oracle-dtype gate (round-10 verdict task 1b): the driver's
        # pandas comparator coerces HUGEINT/UHUGEINT/DECIMAL, so a
        # value-identical result still hash-fails there. This mirror
        # normalizes values to strings and would never see it — gate
        # on the DuckDB output types themselves.
        bad = [f"{n}:{t}" for n, t in zip(en, et)
               if any(t.startswith(b) for b in BANNED_ORACLE_TYPES)]
        if bad:
            print(f"✗ {name}: oracle dtype gate: {', '.join(bad)} "
                  "(pandas-uncomparable — CAST in the oracle SQL)")
            record(name, spark_rows=len(gr), oracle_rows=len(er),
                   err=f"oracle dtype gate: {', '.join(bad)}")
            failures += 1
            continue
        if gn != en:
            # column-name equality FIRST (round-11 advice): the drift
            # check below zips types positionally, so on a genuine
            # column mismatch it would pair types of differently-named
            # columns and report a confusing mislabeled drift.
            print(f"✗ {name}: COLUMN MISMATCH spark={gn} oracle={en}")
            record(name, rows_match=len(gr) == len(er), schema_match=False,
                   spark_rows=len(gr), oracle_rows=len(er),
                   err="column mismatch")
            failures += 1
        elif gt != et:
            # spark-vs-oracle DuckDB type drift (e.g. INT vs BIGINT):
            # the values would still string-compare below, but a
            # pandas-dtype-sensitive driver comparator could diverge —
            # the whole surface is drift-free (q72/q91/q98 were aligned
            # in round 11), so any drift is a regression. FATAL.
            diffs = [f"{n}:{a}≠{b}" for n, a, b in zip(en, gt, et)
                     if a != b]
            print(f"✗ {name}: dtype drift: {', '.join(diffs)}")
            record(name, spark_rows=len(gr), oracle_rows=len(er),
                   err=f"dtype drift: {', '.join(diffs)}")
            failures += 1
        elif gr != er:
            print(f"✗ {name}: ROW MISMATCH ({len(gr)} vs {len(er)} rows)")
            for i, (a, b) in enumerate(zip(gr, er)):
                if a != b:
                    print(f"    first diff at {i}: spark={a} oracle={b}")
                    break
            if len(gr) != len(er):
                only_g = set(gr) - set(er)
                only_e = set(er) - set(gr)
                if only_g:
                    print(f"    spark-only sample: {sorted(only_g)[:2]}")
                if only_e:
                    print(f"    oracle-only sample: {sorted(only_e)[:2]}")
            record(name, rows_match=len(gr) == len(er), schema_match=True,
                   spark_rows=len(gr), oracle_rows=len(er),
                   err="row/hash mismatch")
            failures += 1
        else:
            print(f"✓ {name}: {len(gr)} rows match")
            record(name, rows_match=True, schema_match=True, hash_match=True,
                   spark_rows=len(gr), oracle_rows=len(er))
    missing = set(oracle) - {p.name for p in OUT.iterdir() if p.is_dir()}
    for m in sorted(missing):
        print(f"✗ {m}: oracle declared but no spark result")
        record(m, err="oracle declared but no spark result")
        failures += 1
    anchor_skipped = bool(timed_out)
    if timed_out:
        print(f"timed-out oracles ({len(timed_out)}): {','.join(timed_out)}")
        print("WARNING: the q145 full re-mine anchor was SKIPPED — the "
              "ten store-backed oracles replayed Spark-produced edges "
              "without an independent mining check at this SF. Re-run "
              "with a larger --oracle-timeout (sf0.1 fits ~120s on an "
              "idle box) so the anchor is exercised at the SF the "
              "store-backed oracles gate (round-10 advice).")
    try:
        json_path.write_text(json.dumps(
            {"sf_dir": SF_DIR, "out_dir": str(OUT), "failures": failures,
             "anchor_skipped": anchor_skipped, "timed_out": timed_out,
             "queries": report}, indent=2))
        print(f"wrote {json_path} ({len(report)} queries, "
              f"{failures} failures)")
    except OSError as e:
        print(f"could not write {json_path}: {e}")
    # The one-line summary a close-out quotes. ANCHOR SKIPPED must be
    # impossible to miss (round-11 verdict task 4): a sweep that
    # skipped q145 is NOT full coverage at this SF, exit code
    # notwithstanding — the store-backed oracles gated on unanchored
    # edges. README documents the close-out convention.
    status = "PASS" if failures == 0 else "FAIL"
    anchor = " *** ANCHOR SKIPPED (q145 re-mine not exercised at this " \
             "SF — do not quote this sweep as full coverage) ***" \
             if anchor_skipped else ""
    print(f"SUMMARY: {status} — {len(report)} queries, {failures} "
          f"failures, sf_dir={SF_DIR}{anchor}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
