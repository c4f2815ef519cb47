#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the raw testdata
parquet, sorts columns by name + rows, and compares values exactly.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def frame(rows, names):
    cols = sorted(names)
    idx = [names.index(c) for c in cols]
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    return cols, sorted(out, key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            tbl = pq.read_table(f"{out_dir}/{name}")
            s_names = tbl.column_names
            s_rows = [tuple(r[c] for c in s_names) for r in tbl.to_pylist()]
            d = con.execute(sql)
            d_names = [c[0] for c in d.description]
            d_rows = d.fetchall()
            # Driver-parity type check: the driver hashes pandas frames, so
            # a DuckDB HUGEINT/DECIMAL column (rendered as float64/object)
            # hash-mismatches Spark's int64 even when values are equal.
            # Catch any oracle column type pandas won't round-trip as the
            # Spark type.
            d_arrow = con.execute(sql).fetch_arrow_table()
            lossy = [f"{f.name}:{f.type}" for f in d_arrow.schema
                     if "int128" in str(f.type)
                     or str(f.type).startswith("decimal")]
            if lossy:
                print(f"FAIL {name}: pandas-lossy oracle column types "
                      f"{lossy} (CAST them in the SQL)")
                n_bad += 1
                continue
            sc, sr = frame(s_rows, s_names)
            dc, dr = frame([tuple(r) for r in d_rows], d_names)
            if sc != dc:
                print(f"FAIL {name}: columns spark={sc} duck={dc}")
                n_bad += 1
                continue
            if len(sr) != len(dr):
                print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
                n_bad += 1
                continue
            mism = [(i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
            if mism:
                i, a, b = mism[0]
                print(f"FAIL {name}: {len(mism)}/{len(sr)} rows differ; first@{i}:")
                print(f"   spark={a}")
                print(f"   duck ={b}")
                n_bad += 1
            else:
                print(f"OK   {name} ({len(sr)} rows)")
                n_ok += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
