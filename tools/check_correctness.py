#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify to dump
each SparkEntry query as parquet, then run each oracle_sql.json entry in
DuckDB over the same testdata and compare (schema-insensitive: columns sorted
by name, rows sorted, values hashed)."""
import json, math, subprocess, sys, tempfile
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="graft_verify_")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=3600)
    if "[success]" not in r.stdout:
        print(r.stdout[-4000:]); print(r.stderr[-2000:]); sys.exit(1)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)

con = duckdb.connect()
for t in TABLES:
    p = Path(SF_DIR) / f"{t}.parquet"
    if p.exists():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.loads((Path(OUT) / "oracle_sql.json").read_text())

# Type gates. The driver's comparator normalizes values with str(), under
# which DuckDB HUGEINT == int64 and many nested types "look" equal locally
# but hash-diverge (or crash the pandas sorter) in the real gate. So reject
# up front any oracle result column outside the four scalar types the
# driver round-trips losslessly, and any Spark dump column whose arrow type
# isn't the matching scalar — e.g. an uncast sum() (HUGEINT) or an
# array-valued column must fail HERE, not in CORRECTNESS_r{N}.json.
ORACLE_TYPES = {"BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN"}
SPARK_TYPES = {"int64", "double", "string", "bool"}

def type_gate(q, cols, types, allowed, side):
    bad = [f"{c}:{t}" for c, t in zip(cols, types) if t not in allowed]
    if bad:
        print(f"✗ {q}: {side} TYPE GATE: {bad} not in {sorted(allowed)} — "
              f"CAST/reshape to scalar BIGINT/DOUBLE/VARCHAR/BOOLEAN")
    return not bad

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out

ok = fail = 0
dumped = {p.name for p in Path(OUT).iterdir() if p.is_dir()}
for missing in sorted(set(oracle) - dumped):
    print(f"✗ {missing}: NO DUMP (query failed in Verify)")
    fail += 1
for name in sorted(Path(OUT).iterdir()):
    if not name.is_dir():
        continue
    q = name.name
    tbl = pq.read_table(str(name))
    scols = tbl.column_names
    srows = [tuple(d.values()) for d in tbl.to_pylist()]
    if q not in oracle:
        print(f"  {q}: rows-only ({len(srows)} rows) {'OK' if len(srows) > 0 else 'EMPTY!'}")
        continue
    try:
        rel = con.sql(oracle[q])
        ocols = list(rel.columns)
        otypes = [str(t).upper() for t in rel.types]
        orows = rel.fetchall()
    except Exception as e:
        print(f"✗ {q}: ORACLE SQL ERROR: {e}")
        fail += 1
        continue
    stypes = [str(f.type) for f in tbl.schema]
    if not (type_gate(q, ocols, otypes, ORACLE_TYPES, "ORACLE") &
            type_gate(q, scols, stypes, SPARK_TYPES, "SPARK")):
        fail += 1
        continue
    sc, sr = canon(scols, srows)
    oc, orr = canon(ocols, orows)
    if sc != oc:
        print(f"✗ {q}: SCHEMA spark={sc} oracle={oc}")
        fail += 1
    elif sr != orr:
        diff_s = [r for r in sr if r not in set(orr)][:3]
        diff_o = [r for r in orr if r not in set(sr)][:3]
        print(f"✗ {q}: VALUES spark_rows={len(sr)} oracle_rows={len(orr)} "
              f"spark_only={diff_s} oracle_only={diff_o}")
        fail += 1
    else:
        print(f"✓ {q}: {len(sr)} rows")
        ok += 1
print(f"\n{ok} matched, {fail} failed, out={OUT}")
sys.exit(1 if fail else 0)
