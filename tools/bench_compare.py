#!/usr/bin/env python3
"""Diff two graft bench JSON lines (e.g. BENCH_r1.json vs a local run).

Usage: python3 tools/bench_compare.py <old.json> <new.json> [threshold_pct]

Prints per-query deltas sorted by regression size; exits 1 if any query
regressed more than threshold_pct (default 50%) AND more than 0.5 s
absolute — both gates, so noise on sub-second queries doesn't fail CI.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def main(old_path, new_path, threshold_pct=50.0):
    old, new = load(old_path), load(new_path)
    rows = []
    for name in sorted(set(old) | set(new)):
        o, n = old.get(name), new.get(name)
        if o is None or n is None:
            rows.append((float("inf"), name, o, n, "added" if o is None else "removed"))
            continue
        pct = (n - o) / o * 100 if o else 0.0
        rows.append((pct, name, o, n, f"{pct:+.0f}%"))
    rows.sort(reverse=True)

    failed = []
    for pct, name, o, n, label in rows:
        mark = ""
        if (o is not None and n is not None
                and pct > threshold_pct and (n - o) > 0.5):
            mark = "  <-- REGRESSION"
            failed.append(name)
        fo = "-" if o is None else f"{o:7.2f}"
        fn = "-" if n is None else f"{n:7.2f}"
        print(f"{fo} -> {fn}  {label:>9}  {name}{mark}")

    tot_o = sum(v for v in old.values())
    tot_n = sum(v for v in new.values())
    print(f"\ntotal: {tot_o:.1f} s -> {tot_n:.1f} s")
    return 1 if failed else 0


if __name__ == "__main__":
    t = float(sys.argv[3]) if len(sys.argv) > 3 else 50.0
    sys.exit(main(sys.argv[1], sys.argv[2], t))
