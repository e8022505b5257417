#!/usr/bin/env python3
"""Independent connected-components check for the cluster queries.

The DuckDB oracle for embed_dup_clusters / dedup_clusters is a recursive
CTE that enumerates every (src, reachable-node) pair — O(sum of
component^2) working set. At gate scale (sf0.01) that is instant; at the
sf1 scale rehearsal the near-threshold pair tail percolates into a few
giant components (sf1: 19,648 members in 16 components) and the CTE
exceeds any reasonable budget in DuckDB 1.0 (no USING KEY recursion).

This script is the scale-path verifier: it recomputes the clustering
with union-find (a different algorithm from both the engine's
large-star/small-star rounds and the oracle's CTE) over the PAIR query's
output — which is itself exact-compare-verified against DuckDB — and
bit-compares against the cluster query's output.

Usage:
  python3 scripts/cc_check.py <verify_out_dir> <pairs_query> <clusters_query> [a_col b_col]
e.g.
  python3 scripts/cc_check.py /tmp/vsf1 embed_rp_lsh_neardup embed_dup_clusters vec_a vec_b
"""
import glob
import sys

import pandas as pd


def main():
    outdir, pairs_q, clusters_q = sys.argv[1], sys.argv[2], sys.argv[3]
    a_col = sys.argv[4] if len(sys.argv) > 4 else "vec_a"
    b_col = sys.argv[5] if len(sys.argv) > 5 else "vec_b"
    pairs = pd.concat(
        pd.read_parquet(f) for f in glob.glob(f"{outdir}/{pairs_q}/*.parquet"))
    clusters = pd.concat(
        pd.read_parquet(f) for f in glob.glob(f"{outdir}/{clusters_q}/*.parquet"))
    id_col, lbl_col = clusters.columns[0], clusters.columns[1]

    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs[a_col], pairs[b_col]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    members = set(pairs[a_col]).union(set(pairs[b_col]))
    truth = {v: find(v) for v in members}
    got = dict(zip(clusters[id_col], clusters[lbl_col]))

    missing = [v for v in members if v not in got]
    extra = [v for v in got if v not in members]
    wrong = [v for v in members if v in got and got[v] != truth[v]]
    n_comp = len(set(truth.values()))
    print(f"{pairs_q}: {len(pairs)} pairs, {len(members)} members, "
          f"{n_comp} components")
    if missing or extra or wrong:
        print(f"FAIL {clusters_q}: {len(wrong)} wrong labels, "
              f"{len(missing)} missing, {len(extra)} extra")
        for v in (wrong[:5] + missing[:5] + extra[:5]):
            print(f"  id={v} truth={truth.get(v)} got={got.get(v)}")
        sys.exit(1)
    print(f"PASS {clusters_q}: all {len(members)} labels match union-find")


if __name__ == "__main__":
    main()
