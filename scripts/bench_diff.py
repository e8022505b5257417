#!/usr/bin/env python3
"""Per-query attribution diff of two bench artifacts (VERDICT r9 item 1):
for every common query, the min-over-samples ratio new/old plus the
shuffle-byte deltas — bytes repeat exactly run-over-run, so a row whose
time moved but whose bytes did not is warm-up/host noise, while a row
whose bytes moved has a real plan/data change to name.

Usage: python3 scripts/bench_diff.py OLD.json NEW.json [ratio_threshold]
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def fmt_b(x):
    if x is None or x < 0:
        return "-"
    for unit in ("B", "KB", "MB", "GB"):
        if abs(x) < 1024:
            return f"{x:.0f}{unit}"
        x /= 1024
    return f"{x:.1f}TB"


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    common = sorted(set(old) & set(new))
    rows = []
    for q in common:
        o, n = old[q], new[q]
        om, nm = o.get("min", -1), n.get("min", -1)
        if om is None or nm is None or om <= 0 or nm <= 0:
            continue
        ob = (o.get("bytes") or {}).get("shuffle_write", -1)
        nb = (n.get("bytes") or {}).get("shuffle_write", -1)
        rows.append({
            "query": q, "old_min": om, "new_min": nm, "ratio": nm / om,
            "old_sw": ob, "new_sw": nb,
            "sw_ratio": (nb / ob) if ob and ob > 0 and nb and nb >= 0 else None,
            "audit": bool(n.get("audit")),
        })
    rows.sort(key=lambda r: -r["ratio"])
    tot_o = sum(r["old_min"] for r in rows)
    tot_n = sum(r["new_min"] for r in rows)
    print(f"common {len(rows)} queries: sum-of-mins {tot_o:.1f} -> {tot_n:.1f} "
          f"({tot_n / tot_o:.2f}x)")
    gm = 1.0
    for r in rows:
        gm *= r["ratio"]
    print(f"geomean ratio {gm ** (1 / len(rows)):.3f}\n")
    print(f"{'query':36s} {'old':>7s} {'new':>7s} {'ratio':>6s} "
          f"{'sw_old':>8s} {'sw_new':>8s} {'sw_r':>5s}")
    flagged = []
    for r in rows:
        mark = ""
        if r["ratio"] > thresh:
            mark = "  <-- regressed"
            flagged.append(r["query"])
            if r["sw_ratio"] is not None and abs(r["sw_ratio"] - 1.0) < 0.02:
                mark += " (bytes unchanged: not a plan change)"
        if r["audit"]:
            mark += " [audit]"
        swr = f"{r['sw_ratio']:.2f}" if r["sw_ratio"] is not None else "-"
        print(f"{r['query']:36s} {r['old_min']:7.3f} {r['new_min']:7.3f} "
              f"{r['ratio']:6.2f} {fmt_b(r['old_sw']):>8s} {fmt_b(r['new_sw']):>8s} "
              f"{swr:>5s}{mark}")
    print(f"\n>{thresh}x regressions: {flagged or 'none'}")


if __name__ == "__main__":
    main()
