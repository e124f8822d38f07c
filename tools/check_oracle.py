#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB (tables registered as
views over <sfDir>/*.parquet), and compares: schema (column names), row
count, exact cell values after sorting rows and columns by name, AND the
Arrow-level column types. The driver's hash is typed: DuckDB `sum(BIGINT)`
silently widening to DECIMAL128(38,0) hash-mismatches against Spark's int64
even when every stringified cell agrees (the round-5 lesson — 5 queries
passed this replica's value compare but failed the driver). Integer widths
are normalized (int32 vs int64 passes, matching observed driver tolerance);
any int-vs-decimal or int-vs-float divergence fails here first.
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows):
    def key(r):
        return tuple((v is None, str(v)) for v in r)
    return sorted(rows, key=key)


def norm_type(t):
    """Collapse Arrow types to compare families: int widths merge, string
    flavors merge; decimal/float32/float64/date/timestamp stay distinct —
    the driver's hash is typed, so a float32-vs-float64 divergence must fail
    HERE first, not at the driver."""
    s = str(t)
    if s.startswith("int") or s.startswith("uint"):
        return "int"
    if s in ("large_string", "string", "utf8", "large_utf8"):
        return "string"
    return s


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import glob, os
    names = sorted(
        os.path.basename(p) for p in glob.glob(f"{out_dir}/*") if os.path.isdir(p))
    for name in names:
        got_tbl = pq.read_table(glob.glob(f"{out_dir}/{name}/*.parquet")[0])
        got_cols = sorted(got_tbl.column_names)
        got = [tuple(row[c] for c in got_cols) for row in got_tbl.to_pylist()]
        if name not in oracle:
            print(f"  {name:<18} rows={len(got)} (no oracle — rows-only check: "
                  f"{'OK' if len(got) > 0 else 'FAIL empty'})")
            failures += 0 if len(got) > 0 else 1
            continue
        try:
            exp_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"  {name:<18} ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        exp_cols_raw = exp_tbl.column_names
        exp_cols = sorted(exp_cols_raw)
        exp = [tuple(row[c] for c in exp_cols) for row in exp_tbl.to_pylist()]
        got_types = {f.name: norm_type(f.type) for f in got_tbl.schema}
        exp_types = {f.name: norm_type(f.type) for f in exp_tbl.schema}
        type_diff = [
            f"{c}:{got_types[c]}!={exp_types[c]}"
            for c in got_types if c in exp_types and got_types[c] != exp_types[c]]
        schema_ok = got_cols == exp_cols
        types_ok = not type_diff
        rows_ok = len(got) == len(exp)
        vals_ok = canon(got) == canon(exp) if schema_ok and rows_ok else False
        status = "OK" if (schema_ok and types_ok and rows_ok and vals_ok) else "FAIL"
        print(f"  {name:<18} {status} rows={len(got)}/{len(exp)} "
              f"schema={'ok' if schema_ok else f'{got_cols} != {exp_cols}'} "
              f"types={'ok' if types_ok else ','.join(type_diff)} vals={vals_ok}")
        if status == "FAIL":
            failures += 1
            if schema_ok and rows_ok:
                g, e = canon(got), canon(exp)
                for i, (gr, er) in enumerate(zip(g, e)):
                    if gr != er:
                        print(f"    first diff row {i}: got={gr} exp={er}")
                        break
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
