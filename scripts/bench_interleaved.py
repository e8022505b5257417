#!/usr/bin/env python3
"""Drift-proof cross-round bench: run the PREVIOUS round's committed binary
and HEAD interleaved (A/B/A/B) in one window over a fixed 20-query anchor
set spanning the suite's families, and report the same-window ratio.

Motivation: host wall-clock drift has outgrown cross-window comparison —
round 13 measured 1.14x between two same-code, same-day full-suite runs
(BENCH_r13 vs bench_results/bench_full.json) with shuffle bytes
bit-identical. Interleaving the two binaries inside one window subjects
both to the same load profile, so the A/B ratio is attributable to code,
not to when the run happened.

Usage:
  python3 scripts/bench_interleaved.py <prev-rev> [--legs N] [--sf DIR] \
      [--out bench_results/bench_interleaved.json] [--anchors a,b,c]

Method:
  - `git worktree add` the previous rev at /tmp/graft_ab_prev and
    `sbt compile` it (HEAD is compiled in place);
  - run `graft.Bench` from each classpath alternately, N legs per side,
    each leg a fresh JVM restricted to the anchor set
    (SPARK_GRAFT_BENCH_ONLY), 1 untimed warm-up pass + 1 timed sample;
  - per query per side, take the MIN across legs (the noise floor — host
    spikes only ever ADD time), and report head/prev per query plus the
    sum-of-mins ratio.

The anchor set spans TPC-H join-heavy, dedup, duplicate-clusters, embed/
ANN, text/LM, sampling, skew-safe as-of, and the three stream-kernel
heavies — the families whose plans dominate the full-suite total.
"""
import argparse
import json
import os
import subprocess
import sys
import time

ANCHORS = [
    "q21_waiting_supplier", "q16_supplier_part_counts",          # TPC-H joins
    "f2f3_window_buffer", "f4_dedup_consecutive",                # stream kernel
    "w2_ev44_index_shift",
    "dedup_containment", "dedup_clusters", "dedup_minhash_lsh",  # dedup
    "dedup_cross_source",
    "embed_dup_clusters", "embed_opq_knn",                       # embed / ANN
    "embed_ivf_knn_bucketed", "embed_pq_recall",
    "winnow_matches", "boilerplate_per_source", "text_lm_score", # text / LM
    "lm_quality_buckets", "ngram_novelty",
    "dsir_resample",                                             # sampling
    "asof_latest_click_skewsafe",                                # skew-safe asof
]

ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]

PREV_DIR = "/tmp/graft_ab_prev"


def run(cmd, **kw):
    print("+ " + " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, **kw)


def build_prev(rev):
    if not os.path.isdir(PREV_DIR):
        run(["git", "worktree", "add", "--detach", PREV_DIR, rev])
    else:
        run(["git", "-C", PREV_DIR, "checkout", "--detach", rev])
    run(["sbt", "-batch", "compile"], cwd=PREV_DIR)


def bench_leg(classes_dir, sf, out_path, anchors, label):
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": sf,
        "SPARK_GRAFT_CPUS": env.get("SPARK_GRAFT_CPUS", "32"),
        "SPARK_GRAFT_BENCH_ONLY": ",".join(anchors),
        "SPARK_GRAFT_BENCH_RUNS": "1",
        "SPARK_GRAFT_BENCH_WARMUP": "1",
        "SPARK_GRAFT_BENCH_HEAVY_EXTRA": "0",
        "SPARK_GRAFT_BENCH_OUT": out_path,
    })
    cmd = ["java"]
    for p in ADD_OPENS:
        cmd += ["--add-opens", p + "=ALL-UNNAMED"]
    cmd += [
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        "-Xmx" + env.get("SPARK_DRIVER_MEM", "24g"),
        "-cp", classes_dir + ":/opt/spark/jars/*",
        "graft.Bench",
    ]
    t0 = time.time()
    # Bench chatters on stderr (Spark WARN) and prints its JSON line on
    # stdout; the per-query artifact lands at out_path either way.
    subprocess.run(cmd, check=True, env=env,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    print(f"  [{label}] leg done in {time.time() - t0:.0f}s", flush=True)
    with open(out_path) as f:
        return json.load(f)["queries"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prev_rev")
    ap.add_argument("--legs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="bench_results/bench_interleaved.json")
    ap.add_argument("--anchors", default=",".join(ANCHORS))
    args = ap.parse_args()
    anchors = [a for a in args.anchors.split(",") if a]

    build_prev(args.prev_rev)
    run(["sbt", "-batch", "compile"])  # HEAD in place

    legs = {"prev": [], "head": []}
    sides = [
        ("prev", PREV_DIR + "/target/scala-2.13/classes"),
        ("head", "target/scala-2.13/classes"),
    ]
    for i in range(args.legs):
        # ABBA ordering: under monotone host drift a strict A-then-B pair
        # systematically favors B (it always runs half a leg later);
        # alternating the within-pair order cancels the first-order bias
        order = sides if i % 2 == 0 else list(reversed(sides))
        for side, classes in order:
            out = f"/tmp/graft_ab_{side}_{i}.json"
            legs[side].append(bench_leg(classes, args.sf, out, anchors,
                                        f"{side} {i + 1}/{args.legs}"))

    report = {"prev_rev": args.prev_rev, "sf": args.sf, "legs": args.legs,
              "anchors": anchors, "queries": {}}
    sum_prev = sum_head = 0.0
    for q in anchors:
        mins = {}
        for side in ("prev", "head"):
            vals = [leg[q]["min"] for leg in legs[side]
                    if q in leg and leg[q]["min"] >= 0]
            mins[side] = min(vals) if vals else -1.0
        entry = {"prev_min": mins["prev"], "head_min": mins["head"],
                 "prev_samples": [leg[q]["min"] for leg in legs["prev"] if q in leg],
                 "head_samples": [leg[q]["min"] for leg in legs["head"] if q in leg]}
        if mins["prev"] > 0 and mins["head"] > 0:
            entry["ratio"] = round(mins["head"] / mins["prev"], 4)
            sum_prev += mins["prev"]
            sum_head += mins["head"]
        report["queries"][q] = entry
    if sum_prev > 0:
        report["sum_of_mins_prev"] = round(sum_prev, 3)
        report["sum_of_mins_head"] = round(sum_head, 3)
        report["ratio"] = round(sum_head / sum_prev, 4)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in report.items() if k != "queries"},
                     indent=1))
    for q, e in sorted(report["queries"].items(),
                       key=lambda kv: -kv[1].get("ratio", 0)):
        print(f"  {q:32s} prev={e['prev_min']:7.3f} head={e['head_min']:7.3f} "
              f"ratio={e.get('ratio', float('nan')):.3f}")


if __name__ == "__main__":
    main()
