#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only — the
library itself has no Python dependency).

Usage: python3 tools/check.py <outDir> [sfDir]

Expects graft.Verify to have populated <outDir> with one parquet dir per
query plus oracle_sql.json. Registers the sfDir tables as DuckDB views,
runs each oracle, canonicalizes both sides (columns sorted by name, rows
sorted), and reports match/mismatch per query.
"""
import os
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize for comparison: stringify with repr-ish precision
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        # Driver sf dirs hold single files; Spark-written replicas (the
        # SCALEGEN sf1 gate) hold part-file directories — glob those.
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # A missing output is only "not run" when the entry wasn't ATTEMPTED;
    # otherwise it means the entry CRASHED mid-dump and must fail the
    # gate, not silently skip. The attempted set comes from the manifest
    # Verify writes WITH the run artifacts (so re-scoring from a fresh
    # shell works); the SPARK_GRAFT_ONLY env is the legacy fallback for
    # output dirs predating the manifest.
    manifest = f"{out_dir}/attempted.json"
    if os.path.exists(manifest):
        attempted = set(json.load(open(manifest)))
    else:
        subset_env = os.environ.get("SPARK_GRAFT_ONLY", "")
        subset = {s.strip() for s in subset_env.split(",") if s.strip()}
        attempted = subset if subset else None  # None = all attempted
    ok = fail = skipped = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.exists(f"{out_dir}/{name}"):
            if attempted is not None and name not in attempted:
                print(f"skip {name}: no output (not in this run's subset)")
                skipped += 1
                continue
            print(f"FAIL {name}: attempted but no output (crashed mid-run?)")
            fail += 1
            continue
        try:
            spark_df = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            fail += 1
            continue
        try:
            duck_df = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            fail += 1
            continue
        mismatch = None
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            try:
                eq = (a.astype(str) == b.astype(str)) | (a.isna() & b.isna())
            except Exception:
                eq = a == b
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = (c, i, a.iloc[i], b.iloc[i])
                break
        if mismatch:
            c, i, va, vb = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={va!r} duck={vb!r}")
            fail += 1
        else:
            print(f"ok   {name} ({len(spark_df)} rows)")
            ok += 1
    tail = f", {skipped} skipped" if skipped else ""
    print(f"\n{ok} ok, {fail} fail{tail}")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
