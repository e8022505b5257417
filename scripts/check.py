#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet output
against the DuckDB oracle SQL and diff (columns sorted by name, rows sorted,
floats compared EXACTLY, bit-for-bit — the driver hashes exact values, so a
tolerance here hides real gate failures; the r7 embed_covariance red row was
a -0.0 vs +0.0 sign mismatch this mirror's old 1e-9 tolerance waved through
for two rounds).

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>
"""
import os, sys, json, math, struct
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        # bitwise: distinguishes -0.0 from +0.0 exactly like the driver hash
        return struct.pack("<d", fa) == struct.pack("<d", fb)
    return a == b


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # At 100x scale a few oracle SQLs (recursive-CTE connected components)
    # are quadratic in DuckDB; cap resources so a runaway oracle degrades to
    # a per-query timeout/OOM instead of taking the host down, and allow a
    # subset run so a driver loop can apply `timeout` per query.
    if os.environ.get("CHECK_MEM"):
        con.sql(f"SET memory_limit='{os.environ['CHECK_MEM']}'")
    if os.environ.get("CHECK_THREADS"):
        con.sql(f"SET threads={int(os.environ['CHECK_THREADS'])}")
    only = {s for s in os.environ.get("CHECK_ONLY", "").split(",") if s}
    for t in TABLES:
        # driver testdata ships single files; ScaleGen output is a
        # Spark-written DIRECTORY named <t>.parquet — glob inside it
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # CHECK_JSON=<path>: also write a driver-format artifact (one entry per
    # query: rows_match/schema_match/hash_match/spark_rows/oracle_rows/err)
    # so a full-gate run at any SF leaves committed, judge-reparsable
    # evidence — not just console text.
    report = {}

    def record(name, rows_match=False, schema_match=False, hash_match=False,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = canon(pd.read_parquet(f"{outdir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            record(name, err=f"no spark output: {e}")
            n_fail += 1
            continue
        try:
            duck_df = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record(name, spark_rows=len(spark_df), err=f"oracle SQL error: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            record(name, rows_match=len(spark_df) == len(duck_df),
                   spark_rows=len(spark_df), oracle_rows=len(duck_df),
                   err="schema mismatch")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            record(name, schema_match=True,
                   spark_rows=len(spark_df), oracle_rows=len(duck_df),
                   err="row count mismatch")
            n_fail += 1
            continue
        bad = 0
        first = None
        for c in spark_df.columns:
            sv, dv = spark_df[c].tolist(), duck_df[c].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                if not values_equal(a, b):
                    bad += 1
                    if first is None:
                        first = (c, i, a, b)
                    break
        if bad:
            c, i, a, b = first
            print(f"FAIL {name}: value mismatch col={c} row={i} spark={a!r} duck={b!r}")
            record(name, rows_match=True, schema_match=True,
                   spark_rows=len(spark_df), oracle_rows=len(duck_df),
                   err=f"value mismatch col={c} row={i} spark={a!r} duck={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            record(name, rows_match=True, schema_match=True, hash_match=True,
                   spark_rows=len(spark_df), oracle_rows=len(duck_df))
            n_pass += 1
    if os.environ.get("CHECK_JSON"):
        with open(os.environ["CHECK_JSON"], "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
