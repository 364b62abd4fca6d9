#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<query>/ parquet result (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over views named
after the testdata tables, and compares: columns sorted by name, rows sorted,
values stringified, hashed. Reports per-query match/mismatch with diagnostics.
"""
import glob
import hashlib
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.astype(object)

    def norm(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if pd.isna(v) if not isinstance(v, (list, tuple)) else False:
            return "NULL"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    out = df.map(norm)
    out = out.sort_values(by=list(out.columns), kind="mergesort")
    return out.reset_index(drop=True)


def digest(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    h.update(("|".join(df.columns)).encode())
    for row in df.itertuples(index=False):
        h.update(("\x1f".join(row) + "\x1e").encode())
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # optional: ORACLE_CHECK_JSON=<path> writes the per-query results
    # in the driver gate's CORRECTNESS_r{N}.json format (used for the
    # committed sf0.1 sweep artifact)
    json_out = os.environ.get("ORACLE_CHECK_JSON")
    results = {}
    # optional third arg: comma-separated name prefixes to check
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # q61's oracle must scan parquet files directly (DuckDB's `filename`
    # virtual column is unavailable through a view), so SparkEntry pins
    # the driver gate's fixed sf0.01 paths in the SQL text. Re-point
    # those literals at THIS run's corpus dir so every corpus
    # (fuzz_corpus.py, make_advdata.py) gets a real q61 check instead of
    # a standing known-fail that could mask a regression.
    gate_dir = "/root/testdata/sf0.01"
    oracle = {k: v.replace(gate_dir, os.path.abspath(sf_dir).rstrip("/"))
              for k, v in oracle.items()}
    if only:
        oracle = {k: v for k, v in oracle.items()
                  if any(k.startswith(p) for p in only)}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        def rec(rows_match, schema_match, hash_match, sr, orr, err):
            results[name] = {"rows_match": rows_match,
                             "schema_match": schema_match,
                             "hash_match": hash_match,
                             "spark_rows": sr, "oracle_rows": orr,
                             "err": err}
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            rec(False, False, False, 0, 0, "no_spark_output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            rec(False, False, False, len(got), 0, f"oracle_error: {e}")
            n_fail += 1
            continue
        cg, cw = canon(got), canon(want)
        if list(cg.columns) != list(cw.columns):
            print(f"FAIL {name}: columns {list(cg.columns)} vs {list(cw.columns)}")
            rec(len(cg) == len(cw), False, False, len(cg), len(cw),
                "schema_mismatch")
            n_fail += 1
            continue
        if len(cg) != len(cw):
            print(f"FAIL {name}: rows {len(cg)} vs {len(cw)}")
            rec(False, True, False, len(cg), len(cw), "row_mismatch")
            n_fail += 1
            continue
        if digest(cg) != digest(cw):
            neq = (cg != cw)
            bad_cols = [c for c in cg.columns if neq[c].any()]
            i = neq.any(axis=1).idxmax()
            print(f"FAIL {name}: value mismatch in {bad_cols}; first bad row {i}:")
            print("  spark :", dict(cg.iloc[i]))
            print("  oracle:", dict(cw.iloc[i]))
            # raw dtypes help diagnose
            print("  spark dtypes :", dict(got.dtypes.astype(str)))
            print("  oracle dtypes:", dict(want.dtypes.astype(str)))
            rec(True, True, False, len(cg), len(cw), "hash_mismatch")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(cg)} rows)")
        rec(True, True, True, len(cg), len(cw), None)
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        json.dump(results, open(json_out, "w"), indent=1)
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
