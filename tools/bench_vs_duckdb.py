#!/usr/bin/env python3
"""Spark-vs-DuckDB single-node throughput comparison.

Usage: python3 tools/bench_vs_duckdb.py <sfDir> <verifyOutDir> <bench.json>

Times every oracle SQL (from <verifyOutDir>/oracle_sql.json) in DuckDB
over the same parquet tables and compares per-query seconds against
the Spark bench JSON (graft.Bench output, raw or driver wrapper).
DuckDB here is a stand-in for "a fast single-node engine at the same
data scale" — the comparison target the north-star asks for. Both
engines get the whole machine (DuckDB uses all cores by default, the
bench runs local[32]).

Prints per-query ratios and a summary: how many queries Spark wins,
how many are within 2x, and the total-time ratio.
"""
import json
import os
import sys
import time

import duckdb

# same wrapper/truncated-tail recovery (and the same loud failure on an
# unparseable file) as the cross-round gate — one loader, no drift
from bench_regression import load_queries as load_bench

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir, bench_path = sys.argv[1], sys.argv[2], sys.argv[3]
    spark = load_bench(bench_path)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    gate_dir = "/root/testdata/sf0.01"
    wins = within2 = slower2 = 0
    tot_s = tot_d = 0.0
    rows = []
    for name in sorted(oracle):
        sql = oracle[name].replace(gate_dir, os.path.abspath(sf_dir))
        # warm once (buffer cache, plan), then take best of 2 timed runs
        try:
            con.sql(sql).fetchall()
            times = []
            for _ in range(2):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                times.append(time.perf_counter() - t0)
            dt = min(times)
        except Exception as e:
            rows.append((name, spark.get(name), None, f"oracle error: {e}"))
            continue
        # bench emits compact short keys ("q41") since the driver-tail
        # truncation fix; fall back from the full oracle name
        st = spark.get(name)
        if st is None:
            st = spark.get(name.split("_")[0])
        if st is None:
            rows.append((name, None, dt, "no spark timing"))
            continue
        tot_s += st
        tot_d += dt
        ratio = st / dt if dt > 0 else float("inf")
        if ratio <= 1.0:
            wins += 1
            verdict = "spark wins"
        elif ratio <= 2.0:
            within2 += 1
            verdict = "within 2x"
        else:
            slower2 += 1
            verdict = f"SLOWER {ratio:.1f}x"
        rows.append((name, st, dt, verdict))
    for name, st, dt, verdict in rows:
        s = f"{st:.3f}" if st is not None else "-"
        d = f"{dt:.3f}" if dt is not None else "-"
        print(f"{name:32s} spark {s:>8s}s  duckdb {d:>8s}s  {verdict}")
    n = wins + within2 + slower2
    if n == 0 or tot_d == 0:
        print("== nothing compared (no query had both timings)")
        return
    print(f"== {n} compared: {wins} spark-faster, {within2} within 2x, "
          f"{slower2} beyond 2x; totals spark {tot_s:.1f}s vs duckdb "
          f"{tot_d:.1f}s ({tot_s / tot_d:.2f}x)")
    # Fixed-overhead caveat: at sf0.1 (~600k rows) a Spark query pays
    # ~0.1-0.3s of scheduling/codegen/exchange setup regardless of
    # data volume — a constant that vanishes at real scale, while
    # DuckDB answers toy scans in ms. The throughput question is
    # decided by queries with actual compute; report them separately.
    heavy = [(nm, s, d) for nm, s, d, _ in rows
             if s is not None and d is not None and max(s, d) >= 0.5]
    if heavy:
        hs, hd = sum(s for _, s, _ in heavy), sum(d for _, _, d in heavy)
        hw = sum(1 for _, s, d in heavy if s <= d)
        print(f"== compute-bound subset (max(s,d) >= 0.5s): "
              f"{len(heavy)} queries, spark faster on {hw}; "
              f"spark {hs:.1f}s vs duckdb {hd:.1f}s ({hs / hd:.2f}x)")


if __name__ == "__main__":
    main()
