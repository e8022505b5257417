#!/usr/bin/env python3
"""Per-query attribution diff of two bench artifacts (VERDICT r9 item 1):
for every common query, the min-over-samples ratio new/old plus the
shuffle-byte deltas — bytes repeat exactly run-over-run, so a row whose
time moved but whose bytes did not is warm-up/host noise, while a row
whose bytes moved has a real plan/data change to name.

Usage: python3 scripts/bench_diff.py OLD.json NEW.json [ratio_threshold]
       python3 scripts/bench_diff.py --movers OLD.json NEW.json

--movers prints the NOTES-ready byte-parity block: every query whose
shuffle-write ratio is not EXACTLY 1.0 with its full-precision ratio and
raw byte counts, plus each artifact's config stamp (or its absence) — so
the cross-round parity claim is machine-derived, never transcribed from
the 2-decimal display (VERDICT r11 "what's wrong" #1).
"""
import json
import sys

STAMP_KEYS = ("codegen_cache", "warmup_passes", "chunk_numbering", "reuse",
              "cpus", "runs", "sf")


def load(path):
    with open(path) as f:
        return json.load(f)["queries"]


def movers(old_path, new_path):
    def stamp(path):
        with open(path) as f:
            art = json.load(f)
        present = {k: art[k] for k in STAMP_KEYS if k in art}
        if not present:
            return f"{path}: NO config stamp (pre-stamping artifact)"
        return f"{path}: " + " ".join(f"{k}={present[k]}" for k in sorted(present))

    old, new = load(old_path), load(new_path)
    print(stamp(old_path))
    print(stamp(new_path))
    common = sorted(set(old) & set(new))
    exact, rows, unmeasured = 0, [], 0
    for q in common:
        ob = (old[q].get("bytes") or {}).get("shuffle_write")
        nb = (new[q].get("bytes") or {}).get("shuffle_write")
        if not ob or ob <= 0 or nb is None or nb < 0:
            unmeasured += 1
            continue
        if nb == ob:
            exact += 1
        else:
            rows.append((q, ob, nb, nb / ob))
    rows.sort(key=lambda r: abs(r[3] - 1.0), reverse=True)
    print(f"common {len(common)} queries: {exact} shuffle-write EXACTLY equal, "
          f"{len(rows)} movers, {unmeasured} without byte metrics")
    for q, ob, nb, r in rows:
        print(f"  {q:40s} {ob:>14d} -> {nb:>14d} bytes  ratio {r:.6f} "
              f"({(r - 1) * 100:+.3f}%)")
    if not rows:
        print("  (none)")


def fmt_b(x):
    if x is None or x < 0:
        return "-"
    for unit in ("B", "KB", "MB", "GB"):
        if abs(x) < 1024:
            return f"{x:.0f}{unit}"
        x /= 1024
    return f"{x:.1f}TB"


def main():
    if "--movers" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--movers"]
        movers(args[0], args[1])
        return
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
