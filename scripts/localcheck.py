#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/localcheck.py [sfdir] [outdir]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran.
Registers every testdata table as a DuckDB view, runs each oracle SQL
from outdir/oracle_sql.json, and compares against the Spark parquet
result: columns sorted by name, rows sorted by all columns, exact value
compare with a tiny float tolerance report so near-misses are visible.
"""
import glob
import json
import math
import re
import sys

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-verify"
# Optional 3rd arg: regex over query names — check only the queries a
# filtered `graft.Verify` run actually produced.
FILTER = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None

con = duckdb.connect()
for f in glob.glob(f"{SFDIR}/*.parquet"):
    name = f.split("/")[-1].removesuffix(".parquet")
    con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{OUTDIR}/oracle_sql.json"))

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(out, key=lambda t: tuple(str(x) for x in t)), [cols[i] for i in order]

def cell_eq(a, b):
    if a is None and b is None:
        return True, 0.0
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b), None
        if math.isnan(fa) and math.isnan(fb):
            return True, 0.0
        d = abs(fa - fb)
        return d == 0.0, d
    if isinstance(a, list) and isinstance(b, list):
        if len(a) != len(b):
            return False, None
        for x, y in zip(a, b):
            ok, _ = cell_eq(x, y)
            if not ok:
                return False, None
        return True, 0.0
    return str(a) == str(b), None

ok_n = 0
fail = []
names = sorted(set(oracle) | {p.split("/")[-1] for p in glob.glob(f"{OUTDIR}/*") if not p.endswith(".json")})
if FILTER is not None:
    names = [n for n in names if FILTER.search(n)]
for name in names:
    res_glob = glob.glob(f"{OUTDIR}/{name}/*.parquet")
    if not res_glob:
        fail.append((name, "no spark result"))
        continue
    if name not in oracle:
        n = con.execute(f"SELECT count(*) FROM read_parquet('{res_glob[0]}')").fetchone()[0]
        print(f"  ~ {name}: rows-only ({n} rows)")
        ok_n += 1 if n > 0 else 0
        if n == 0:
            fail.append((name, "rows-only query returned 0 rows"))
        continue
    try:
        sq = con.execute(f"SELECT * FROM read_parquet('{res_glob[0]}')")
        s_cols = [d[0] for d in sq.description]
        s_rows = sq.fetchall()
        dq = con.execute(oracle[name])
        d_cols = [d[0] for d in dq.description]
        d_rows = dq.fetchall()
    except Exception as e:
        fail.append((name, f"exec error: {str(e)[:300]}"))
        continue
    if sorted(s_cols) != sorted(d_cols):
        fail.append((name, f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}"))
        continue
    # Type-strict lint: the driver's hash is sensitive to the physical column
    # type, so an oracle column DuckDB types HUGEINT/DECIMAL (e.g. an un-CAST
    # sum-derived expression) hash-mismatches a value-identical Spark BIGINT.
    # Compare DESCRIBE output per column name and reject any wide numeric.
    try:
        s_types = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{res_glob[0]}')").fetchall()}
        d_types = {r[0]: r[1] for r in con.execute(f"DESCRIBE {oracle[name]}").fetchall()}
    except Exception as e:
        fail.append((name, f"describe error: {str(e)[:300]}"))
        continue
    type_bad = None
    INT_WIDTHS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}
    for c in sorted(d_cols):
        dt, st = d_types.get(c, "?"), s_types.get(c, "?")
        if "HUGEINT" in dt or dt.startswith("DECIMAL"):
            type_bad = f"oracle col {c} is {dt} (driver hash is type-sensitive; CAST it)"
            break
        # int WIDTH differences are the one driver-tolerated case (values
        # hash identically); HUGEINT/DECIMAL above are not
        if dt != st and not (dt in INT_WIDTHS and st in INT_WIDTHS):
            type_bad = f"col {c} type: spark={st} duck={dt}"
            break
    if type_bad:
        fail.append((name, f"type: {type_bad}"))
        continue
    if len(s_rows) != len(d_rows):
        fail.append((name, f"rowcount: spark={len(s_rows)} duck={len(d_rows)}"))
        continue
    s_n, cols = norm(s_rows, s_cols)
    d_n, _ = norm(d_rows, d_cols)
    bad = None
    maxd = 0.0
    for i, (sr, dr) in enumerate(zip(s_n, d_n)):
        for j, (a, b) in enumerate(zip(sr, dr)):
            eq, d = cell_eq(a, b)
            if d:
                maxd = max(maxd, d)
            if not eq:
                bad = (i, cols[j], a, b)
                break
        if bad:
            break
    if bad:
        fail.append((name, f"value row{bad[0]} col={bad[1]}: spark={bad[2]!r} duck={bad[3]!r}"))
    else:
        extra = f" (max float delta {maxd:.2e})" if maxd else ""
        print(f"  ✓ {name}: {len(s_rows)} rows{extra}")
        ok_n += 1

print(f"\n{ok_n}/{len(names)} green")
for name, why in fail:
    print(f"  ✗ {name}: {why}")
sys.exit(1 if fail else 0)
