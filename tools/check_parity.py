#!/usr/bin/env python3
"""Local parity self-check mirroring the driver's DuckDB-oracle compare:
run graft.Verify (via sbt) at a given SF, then for each query compare
the Spark parquet result against the DuckDB oracle SQL (columns sorted
by name, values hashed). Usage:
    python3 tools/check_parity.py [sfDir] [outDir] [--skip-verify]
                                  [--oracle-timeout=SECONDS]
An oracle exceeding the per-query timeout is reported as skipped,
not passed/failed. The default (900 s) never fires at sf0.01 (the
slowest miner replay, q134, runs ~215 s there); pass a lower value
for an sf0.1 sweep, where the char-level miner replays spill
unboundedly — their sf0.1 evidence is check_graph_sf01.py's
pair-store replay.
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


def table_rows(rel):
    cols = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
    names = [rel.columns[i] for i in cols]
    rows = [tuple(norm(r[i]) for i in cols) for r in rel.fetchall()]
    return names, sorted(rows)


def run_with_timeout(con, sql, seconds):
    """table_rows(con.sql(sql)), interrupted after `seconds`. The
    char-level miner-replay oracles (q71/q132/q134/q139/q145/q146
    family) are seconds at sf0.01 but spill unboundedly at sf0.1 —
    a timed-out oracle is reported as skipped (the sf0.1 evidence for
    those queries is tools/check_graph_sf01.py's pair-store replay),
    never as a pass or a failure.
    """
    import threading
    out, err = [], []

    def work():
        try:
            out.append(table_rows(con.sql(sql)))
        except Exception as e:  # includes InterruptException
            err.append(e)

    t = threading.Thread(target=work, daemon=True)
    t.start()
    t.join(seconds)
    if t.is_alive():
        con.interrupt()
        t.join(30)
        return None
    if err:
        raise err[0]
    return out[0]


def main():
    if "--skip-verify" not in sys.argv:
        run_verify()
    timeout = 900.0
    for a in sys.argv:
        if a.startswith("--oracle-timeout="):
            timeout = float(a.split("=", 1)[1])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    failures = 0
    timed_out = []
    for name in sorted(p.name for p in OUT.iterdir() if p.is_dir()):
        got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
        if name not in oracle:
            print(f"  {name}: rows-only ({len(got.fetchall())} rows)")
            continue
        res = run_with_timeout(con, oracle[name], timeout)
        if res is None:
            timed_out.append(name)
            print(f"⏱ {name}: oracle timed out after {timeout:.0f}s — "
                  "heavy miner replay; at sf0.1 use check_graph_sf01.py")
            continue
        en, er = res
        gn, gr = table_rows(con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'"))
        if gn != en:
            print(f"✗ {name}: COLUMN MISMATCH spark={gn} oracle={en}")
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
            failures += 1
        else:
            print(f"✓ {name}: {len(gr)} rows match")
    missing = set(oracle) - {p.name for p in OUT.iterdir() if p.is_dir()}
    for m in missing:
        print(f"✗ {m}: oracle declared but no spark result")
        failures += 1
    if timed_out:
        print(f"timed-out oracles ({len(timed_out)}): {','.join(timed_out)}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
