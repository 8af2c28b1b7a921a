#!/usr/bin/env python3
"""sf0.1 parity for the graph-kernel queries q132/q134/q139 (round-8
verdict item 4).

Their regular oracles re-mine the pair list char-level in SQL, which
at sf0.1 spills >60 GB in DuckDB — so the driver gate checks them at
sf0.01 only. This tool closes the missing sf0.1 corner WITHOUT the
re-mine: the engine's own q145 pass persists the provenance-tagged
pair store, and the graph MATH (connected components / triangles /
modularity) is replayed in DuckDB over that verified edge list. The
miners stay independently oracled at sf0.001/sf0.01; what this adds is
the sf0.1 evidence that the distributed graph kernels (pointer-jumping
CC, compact-forward triangles, integer modularity) agree with a
sequential replay at 10x the gated scale.

Edge-set provenance: q134/q139 consume the 3-signal text union
(src_minhash|src_simhash|src_ppjoin); q132 adds src_embed. src_exact
is excluded — the store mines it separately, the three queries don't.

Usage: check_graph_sf01.py [sfDir] [outDir] [--skip-verify]
(never run concurrently with another sf0.1 DuckDB replay)
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_graph_sf01")
# q145 publishes the store in the SIBLING <outDir>_dumps directory
# (round-11 relocation: side-files travel with the compare artifact
# but stay outside the driver's result iteration of outDir)
STORE = OUT.parent / (OUT.name + "_dumps") / \
    f"graft_pairs_store_{Path(SF_DIR).name}"


def run_verify():
    # q145 mines + persists the pair store; q132/q134/q139 dump the
    # Spark-side graph results this tool compares against.
    cmd = ["sbt", f'runMain graft.Verify {SF_DIR} {OUT} q145,q132,q134,q139,q71,q73,q96']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:], r.stderr[-2000:])
        sys.exit("verify run failed")


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_rows(rel):
    cols = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
    names = [rel.columns[i] for i in cols]
    rows = [tuple(norm(r[i]) for i in cols) for r in rel.fetchall()]
    return names, sorted(rows)


TEXT = "(src_minhash OR src_simhash OR src_ppjoin)"
ALL4 = "(src_minhash OR src_simhash OR src_ppjoin OR src_embed)"

Q132 = f"""
WITH RECURSIVE pairs4 AS (
  SELECT doc_a, doc_b FROM store WHERE {ALL4}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs4
  UNION ALL SELECT doc_b, doc_a FROM pairs4),
nodes AS (SELECT DISTINCT a AS id FROM edges),
reach(src, dst) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
comp AS (SELECT src AS id, min(dst) AS keeper FROM reach GROUP BY src)
SELECT keeper, count(*) AS n_docs,
  array_to_string(list_sort(list(id)), ',') AS members
FROM comp GROUP BY keeper ORDER BY keeper"""

Q134 = f"""
WITH pairs AS (SELECT doc_a, doc_b FROM store WHERE {TEXT}),
tedges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs),
tdeg AS (SELECT u AS id, count(*) AS deg FROM tedges GROUP BY u),
o AS (
  SELECT e.u, e.v FROM tedges e
  JOIN tdeg du ON du.id = e.u
  JOIN tdeg dv ON dv.id = e.v
  WHERE du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)),
tri AS (
  SELECT o1.u AS a, o1.v AS b, o2.v AS c
  FROM o o1
  JOIN o o2 ON o1.v = o2.u
  JOIN o o3 ON o3.u = o1.u AND o3.v = o2.v),
pern AS (
  SELECT id, count(*) AS tri FROM (
    SELECT a AS id FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri)
  GROUP BY id)
SELECT d.id AS doc_id, CAST(d.deg AS BIGINT) AS deg,
  CAST(coalesce(p.tri, 0) AS BIGINT) AS tri
FROM tdeg d LEFT JOIN pern p USING (id)
ORDER BY doc_id"""

Q139 = f"""
WITH pairs AS (SELECT doc_a, doc_b FROM store WHERE {TEXT}),
ws AS (
  SELECT p.doc_a, p.doc_b, da.source AS src_a, db.source AS src_b
  FROM pairs p
  JOIN documents da ON da.doc_id = p.doc_a
  JOIN documents db ON db.doc_id = p.doc_b),
mm AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM ws),
degs AS (
  SELECT source, count(*) AS deg_sum FROM (
    SELECT src_a AS source FROM ws
    UNION ALL SELECT src_b FROM ws)
  GROUP BY source),
intr AS (
  SELECT src_a AS source, count(*) AS intra_edges
  FROM ws WHERE src_a = src_b GROUP BY src_a),
nds AS (
  SELECT d.source, count(*) AS n_nodes FROM (
    SELECT DISTINCT doc_id FROM (
      SELECT doc_a AS doc_id FROM pairs
      UNION ALL SELECT doc_b FROM pairs)) n
  JOIN documents d ON d.doc_id = n.doc_id
  GROUP BY d.source)
SELECT n.source, CAST(n.n_nodes AS BIGINT) AS n_nodes,
  CAST(coalesce(i.intra_edges, 0) AS BIGINT) AS intra_edges,
  CAST(coalesce(g.deg_sum, 0) AS BIGINT) AS deg_sum,
  CAST((2 * (4 * mm.m * coalesce(i.intra_edges, 0)
      - CAST(coalesce(g.deg_sum, 0) AS HUGEINT) * coalesce(g.deg_sum, 0))
      * 1000000 + 4 * mm.m * mm.m)
    // (2 * 4 * mm.m * mm.m) AS BIGINT) AS contrib_ppm
FROM nds n
LEFT JOIN degs g USING (source)
LEFT JOIN intr i USING (source)
CROSS JOIN mm
ORDER BY n.source"""


# shared component fixpoint over the TEXT pair list (q71/q73/q96 input)
COMP = f"""pairs AS (SELECT doc_a, doc_b FROM store WHERE {TEXT}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT DISTINCT a AS id FROM edges),
reach(src, dst) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
comp AS (SELECT src AS id, min(dst) AS keeper FROM reach GROUP BY src)"""

Q71 = f"""
WITH RECURSIVE {COMP}
SELECT keeper, count(*) AS n_docs,
  array_to_string(list_sort(list(id)), ',') AS members
FROM comp GROUP BY keeper ORDER BY keeper"""

Q73 = f"""
WITH RECURSIVE {COMP},
scored AS (
  SELECT c.keeper AS lbl, c.id AS doc_id, d.n_chars AS len
  FROM comp c JOIN documents d ON d.doc_id = c.id),
keep AS (
  SELECT lbl, doc_id AS keeper_id FROM (
    SELECT lbl, doc_id, row_number() OVER (
      PARTITION BY lbl ORDER BY len DESC, doc_id) AS rn
    FROM scored)
  WHERE rn = 1)
SELECT s.doc_id, k.keeper_id,
  s.doc_id = k.keeper_id AS is_keeper
FROM scored s JOIN keep k ON k.lbl = s.lbl
ORDER BY s.doc_id"""

Q96 = f"""
WITH RECURSIVE {COMP},
per AS (
  SELECT c.keeper AS lbl, count(*) AS sz,
    sum(d.n_chars) AS bytes, max(d.n_chars) AS kept
  FROM comp c JOIN documents d ON d.doc_id = c.id
  GROUP BY c.keeper)
SELECT sz AS cluster_size,
  CAST(count(*) AS BIGINT) AS n_clusters,
  CAST(sum(sz) AS BIGINT) AS n_docs,
  CAST(sum(sz) - count(*) AS BIGINT) AS n_removable,
  CAST(sum(bytes - kept) AS BIGINT) AS bytes_removable
FROM per GROUP BY sz ORDER BY sz"""


def main():
    if "--skip-verify" not in sys.argv:
        run_verify()
    if not STORE.exists():
        sys.exit(f"pair store missing at {STORE} — run without --skip-verify")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW store AS SELECT * FROM '{STORE}/*.parquet'")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    failures = 0
    for name, sql in [("q132_multi_signal_4way", Q132),
                      ("q134_dup_triangles", Q134),
                      ("q139_dup_modularity", Q139),
                      ("q71_multi_signal_components", Q71),
                      ("q73_dedup_keepers", Q73),
                      ("q96_dup_cluster_stats", Q96)]:
        gn, gr = table_rows(con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'"))
        en, er = table_rows(con.sql(sql))
        if gn != en:
            print(f"✗ {name}: COLUMN MISMATCH spark={gn} replay={en}")
            failures += 1
        elif gr != er:
            print(f"✗ {name}: ROW MISMATCH ({len(gr)} vs {len(er)} rows)")
            for a, b in zip(gr, er):
                if a != b:
                    print(f"    first diff: spark={a} replay={b}")
                    break
            failures += 1
        else:
            print(f"✓ {name}: {len(gr)} rows match the pair-store replay")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
