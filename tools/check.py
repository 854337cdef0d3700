#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs graft.Verify at the given scale factor, then executes each entry of
oracle_sql.json in DuckDB against the same parquet tables and compares with
the Spark-written parquet output: schema (column names), row count, and
values (columns sorted by name, rows sorted by all columns).

Usage: python3 tools/check.py [sf0.01] [--skip-verify] [query ...]
"""
import json, math, os, subprocess, sys
from pathlib import Path

import duckdb
import pandas as pd

SF = next((a for a in sys.argv[1:] if a.startswith("sf")), "sf0.01")
ONLY = [a for a in sys.argv[1:] if not a.startswith("sf") and a != "--skip-verify"]
SFDIR = f"/root/testdata/{SF}"
OUT = Path(f"/tmp/graft_verify_{SF}")

if "--skip-verify" not in sys.argv:
    only = " " + " ".join(ONLY) if ONLY else ""
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {SFDIR} {OUT}{only}"],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write("\n".join(
        l for l in (r.stdout + r.stderr).splitlines() if "[verify]" in l or "error]" in l.lower()
        and "INFO" not in l) + "\n")
    if r.returncode != 0:
        print("VERIFY RUN FAILED"); sys.exit(1)

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")

oracle = json.loads((OUT / "oracle_sql.json").read_text())
queries = sorted(d.name for d in OUT.iterdir() if d.is_dir())
if ONLY:
    queries = [q for q in queries if q in ONLY]

# Verify isolates per-query failures into _errors.json (rc stays 0) and the
# output dir is REUSED across runs, so a stale parquet dir from an earlier
# run can mask a now-broken query. Treat any recorded error as a hard fail
# for the affected queries.
errs_file = OUT / "_errors.json"
if errs_file.exists():
    errs = json.loads(errs_file.read_text())
    bad = [q for q in errs if (not ONLY) or q in ONLY]
    if bad:
        for q in bad:
            print(f"{q:28s} VERIFY ERROR: {errs[q][:200]}")
        print(f"{len(bad)} queries failed inside Verify (see {errs_file})")
        sys.exit(1)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def canon_type(t) -> str:
    """Canonical dtype class, mirroring the driver's typed hash: int widths
    collapse (int32 == int64 passes the driver), float32/64 collapse, but
    float vs int vs decimal vs date vs timestamp are DISTINCT."""
    import pyarrow as pa
    import pyarrow.types as pt
    if pt.is_decimal(t):
        return f"DECIMAL[{t}]"        # flagged as an error elsewhere
    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_date(t):
        return "date"
    if pt.is_string(t) or pt.is_large_string(t):
        return "str"
    if pt.is_binary(t) or pt.is_large_binary(t) or pt.is_fixed_size_binary(t):
        return "bin"
    if pt.is_boolean(t):
        return "bool"
    if pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pt.is_struct(t):
        inner = ",".join(f"{t.field(i).name}:{canon_type(t.field(i).type)}"
                         for i in range(t.num_fields))
        return f"struct<{inner}>"
    return str(t)

def dtype_errors(spark_schema, duck_schema) -> list:
    """Strict schema gate: canonical types must match per column, and NO
    decimal/hugeint output columns at all — the driver reads Spark parquet
    and the DuckDB oracle through different decimal representations, so a
    decimal output column can never hash-match. Cast to DOUBLE or BIGINT."""
    errs = []
    sp = {f.name: f.type for f in spark_schema}
    du = {f.name: f.type for f in duck_schema}
    for name in sorted(set(sp) | set(du)):
        cs = canon_type(sp[name]) if name in sp else "<missing>"
        cd = canon_type(du[name]) if name in du else "<missing>"
        if "DECIMAL" in cs or "DECIMAL" in cd:
            errs.append(f"{name}: decimal output forbidden (spark={cs} duck={cd})")
        elif cs != cd:
            errs.append(f"{name}: spark={cs} duck={cd}")
    return errs

def eq(a, b) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        return (a is None or (isinstance(a, float) and math.isnan(a))) and \
               (b is None or (isinstance(b, float) and math.isnan(b)))
    if isinstance(a, float) or isinstance(b, float):
        try: fa, fb = float(a), float(b)
        except (TypeError, ValueError): return str(a) == str(b)
        if fa == fb: return True
        if os.environ.get("GRAFT_EXACT"): return False
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    if hasattr(a, "__len__") and not isinstance(a, str):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b

fails = 0
for name in queries:
    if name not in oracle:
        print(f"{name:28s} NO-ORACLE (rows-only check)")
        continue
    try:
        spark_tbl = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").arrow()
        duck_tbl = con.sql(oracle[name]).arrow()
        terrs = dtype_errors(spark_tbl.schema, duck_tbl.schema)
        spark_df = canon(spark_tbl.to_pandas())
        duck_df = canon(duck_tbl.to_pandas())
    except Exception as e:
        print(f"{name:28s} ERROR: {str(e)[:160]}"); fails += 1; continue
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        print(f"{name:28s} SCHEMA MISMATCH spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        fails += 1; continue
    if terrs:
        print(f"{name:28s} DTYPE MISMATCH: " + "; ".join(terrs))
        fails += 1; continue
    if len(spark_df) != len(duck_df):
        print(f"{name:28s} ROWCOUNT spark={len(spark_df)} duck={len(duck_df)}")
        fails += 1; continue
    bad = None
    for col in spark_df.columns:
        sv, dv = spark_df[col].tolist(), duck_df[col].tolist()
        for i, (x, y) in enumerate(zip(sv, dv)):
            if not eq(x, y):
                bad = (col, i, x, y); break
        if bad: break
    if bad:
        print(f"{name:28s} VALUE MISMATCH col={bad[0]} row={bad[1]} spark={bad[2]!r} duck={bad[3]!r}")
        fails += 1
    else:
        print(f"{name:28s} OK ({len(spark_df)} rows)")

print(f"\n{len(queries)-fails}/{len(queries)} green")
sys.exit(1 if fails else 0)
