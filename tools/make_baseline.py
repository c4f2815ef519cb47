#!/usr/bin/env python3
"""Times every oracle SQL in DuckDB and emits the BASELINE.md table.

Usage: python3 tools/make_baseline.py <sfDir> <verifyOutDir> [out.md]

The oracle SQL (from a fresh graft.Verify dump — required so the
VerifyTap aux parquet under /tmp/graft_aux matches <sfDir>) is run in
DuckDB over the raw testdata parquet; each query is timed as min-of-2
after one warmup, mirroring Bench.main's procedure. DuckDB is the same
single-node engine the driver uses for correctness, so these wall-times
are the published reference numbers BENCH_r{N}.json is compared against.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, md_path=None):
    con = duckdb.connect()
    # Bounded memory so an oracle that exceeds the host (p3's chained
    # recursive-CC x span-explode x NB closure at sf0.1 OOM-killed the
    # process at DuckDB's default config) raises a catchable
    # OutOfMemoryException and records a FAILED row instead of taking
    # the whole run down. In-memory queries are unaffected (none of
    # the other oracles approaches the limit).
    con.execute("SET memory_limit='24GB'")
    con.execute("SET temp_directory='/tmp/duck_tmp'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    rows = []
    for name, sql in sorted(oracle.items()):
        try:
            con.execute(sql).fetchall()  # warmup (I/O cache, plan)
            samples = []
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                samples.append(time.perf_counter() - t0)
            dt = min(samples)
            rows.append((name, dt))
            print(f"{name}: {dt:.3f} s")
        except Exception as e:  # noqa: BLE001 - record and continue
            rows.append((name, None))
            print(f"{name}: FAILED {e}")
    total = sum(dt for _, dt in rows if dt is not None)
    lines = [
        "| query | duckdb_sec |",
        "|---|---|",
    ] + [f"| {n} | {dt:.3f} |" for n, dt in rows if dt is not None] + [
        f"| **total ({len([r for r in rows if r[1] is not None])} queries)**"
        f" | **{total:.2f}** |",
    ]
    table = "\n".join(lines)
    print(table)
    if md_path:
        with open(md_path, "w") as f:
            f.write(table + "\n")


if __name__ == "__main__":
    main(*sys.argv[1:])
