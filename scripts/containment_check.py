#!/usr/bin/env python3
"""Sharded-oracle exact check for `dedup_containment` at ScaleGen scales.

The single-process DuckDB oracle OOMs at sf10 (500k docs: the cand join's
working set exceeds 80 GB). But ScaleGen corpora are replica-sharded BY
CONSTRUCTION: every replica's document text carries a per-replica token
suffix, so no token n-gram is shared across replicas. Under that property
the oracle DECOMPOSES exactly:

  - `dfreq` (global gram document-frequency): a gram occurs in exactly one
    replica, so its global df equals its replica-local df;
  - `pre` (rarest-prefix selection): orders each doc's own grams by
    (df, gram) — all df values equal their replica-local values, so the
    selected prefix set is identical;
  - `cand` (prefix-gram join): a candidate pair shares a gram, and a
    shared gram implies the same replica — the global candidate set is
    the disjoint union of the per-replica candidate sets;
  - the containment measure itself only reads the two paired docs.

So: global oracle result == union over replicas of the oracle run on that
replica's documents alone. This script PROVES the disjointness premise on
the actual data (a gram→distinct-replica-count aggregation must find no
gram in >1 replica — using the committed oracle's own shingle definition,
extracted verbatim from oracle_sql.json), then runs the committed oracle
SQL unmodified once per replica, unions the results, and exact-compares
(columns sorted, rows sorted, floats bit-for-bit) against the engine's
Verify output — the same comparison discipline as scripts/check.py.

Usage: python3 scripts/containment_check.py <verify_out_dir> <sf_dir>
Env: CHECK_MEM / CHECK_THREADS as in check.py (per-replica runs are
sf0.1-sized, so modest limits suffice).
"""
import json
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import canon, values_equal  # noqa: E402  (same compare rules)

REPLICA_STRIDE = 1_000_000_000  # ScaleGen bigint key stride (ScaleGen.scala)


def new_con():
    con = duckdb.connect()
    if os.environ.get("CHECK_MEM"):
        con.sql(f"SET memory_limit='{os.environ['CHECK_MEM']}'")
    if os.environ.get("CHECK_THREADS"):
        con.sql(f"SET threads={int(os.environ['CHECK_THREADS'])}")
    return con


def doc_path(sfdir: str) -> str:
    p = f"{sfdir}/documents.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    sql = json.load(open(f"{outdir}/oracle_sql.json"))["dedup_containment"]

    # --- 1. prove replica gram-disjointness on the actual corpus --------
    # Reuse the oracle's own CTE prefix (shingling + grams) verbatim so the
    # property is proven for the exact gram definition the oracle uses.
    cut = sql.index("dfreq AS")
    prefix = sql[:cut].rstrip().rstrip(",")
    dis_sql = (
        f"{prefix}\n"
        f"SELECT count(*) FROM ("
        f"  SELECT g FROM grams GROUP BY g"
        f"  HAVING count(DISTINCT doc_id // {REPLICA_STRIDE}) > 1)"
    )
    con = new_con()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{doc_path(sfdir)}'")
    replicas = [r[0] for r in con.sql(
        f"SELECT DISTINCT doc_id // {REPLICA_STRIDE} FROM documents ORDER BY 1"
    ).fetchall()]
    shared = con.sql(dis_sql).fetchone()[0]
    print(f"replicas={len(replicas)} cross-replica shared grams={shared}")
    if shared != 0:
        print("FAIL: gram sets are not replica-disjoint; sharding is unsound here")
        sys.exit(1)
    con.close()

    # --- 2. committed oracle SQL, unmodified, once per replica ----------
    parts = []
    for r in replicas:
        con = new_con()
        lo, hi = r * REPLICA_STRIDE, (r + 1) * REPLICA_STRIDE
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{doc_path(sfdir)}' "
            f"WHERE doc_id >= {lo} AND doc_id < {hi}")
        parts.append(con.sql(sql).df())
        con.close()
        if (r + 1) % 10 == 0 or r == replicas[-1]:
            done = sum(len(p) for p in parts)
            print(f"  replica {r}: cumulative oracle rows={done}")
    duck_df = canon(pd.concat(parts, ignore_index=True))

    # --- 3. exact compare against the engine output ---------------------
    spark_df = canon(pd.read_parquet(f"{outdir}/dedup_containment"))
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL columns: spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        sys.exit(1)
    if len(spark_df) != len(duck_df):
        print(f"FAIL rows: spark={len(spark_df)} duck={len(duck_df)}")
        sys.exit(1)
    for col in spark_df.columns:
        sv, dv = spark_df[col].tolist(), duck_df[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if not values_equal(a, b):
                print(f"FAIL value: col={col} row={i} spark={a!r} duck={b!r}")
                sys.exit(1)
    print(f"PASS dedup_containment: {len(spark_df)} rows bit-exact "
          f"(sharded oracle, {len(replicas)} replicas, disjointness proven)")


if __name__ == "__main__":
    main()
