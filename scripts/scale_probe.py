#!/usr/bin/env python3
"""Join two or three bench artifacts at different scale factors and report
per-query scaling: decade time ratios, log-log exponents, and (when the
artifacts carry the ByteMeter block) shuffle-byte exponents — the
noise-free signal. Usage:

  python3 scripts/scale_probe.py sf0.1=bench_results/probe_sf01.json \
      sf1=bench_results/probe_sf1.json sf10=bench_results/probe_sf10.json

Scales are parsed from the label prefix (sf0.1 → 0.1). Exponent is the
least-squares slope of log(metric) vs log(sf) over the points where the
metric is positive. Time exponents use per-query MIN (noise floor);
byte exponents use the recorded deltas directly.
"""
import json
import math
import sys


def load(spec):
    label, path = spec.split("=", 1)
    sf = float(label.replace("sf", ""))
    with open(path) as f:
        return sf, json.load(f)["queries"]


def slope(points):
    pts = [(math.log(x), math.log(y)) for x, y in points if y and y > 0]
    if len(pts) < 2:
        return None
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    d = n * sxx - sx * sx
    return (n * sxy - sx * sy) / d if d else None


def main():
    runs = sorted((load(a) for a in sys.argv[1:]), key=lambda t: t[0])
    if len(runs) < 2:
        sys.exit("need at least two label=artifact args")
    sfs = [sf for sf, _ in runs]
    names = sorted(set.intersection(*(set(q) for _, q in runs)))
    rows = []
    for name in names:
        # a failed query records min == -1; it must not flow into the fit
        # as a plausible-looking time, and a fit on fewer points than
        # scales must be visible (coverage shrank)
        tpts = [(sf, q[name].get("min", q[name].get("median"))) for sf, q in runs]
        failed = [f"sf{sf:g}" for sf, t in tpts if t is None or t < 0]
        tpts = [(sf, t) for sf, t in tpts if t is not None and t >= 0]
        bpts = [
            (sf, (q[name].get("bytes") or {}).get("shuffle_write", -1))
            for sf, q in runs
        ]
        spill = max(
            (q[name].get("bytes") or {}).get("spill_disk", 0) for _, q in runs
        )
        rows.append(
            {
                "query": name,
                "t": {f"sf{sf:g}": round(t, 3) for sf, t in tpts},
                "t_exp": slope(tpts),
                "t_pts": len(tpts),
                "failed_at": failed,
                "shuffle_write": {f"sf{sf:g}": b for sf, b in bpts},
                "sw_exp": slope(bpts),
                "sw_pts": sum(1 for _, b in bpts if b and b > 0),
                "spill_disk_max": spill,
            }
        )
    rows.sort(key=lambda r: -(r["t_exp"] or 0))
    print(f"{'query':34s} {'t_exp':>6s} {'sw_exp':>6s} " + " ".join(f"t(sf{sf:g})" for sf in sfs))
    flagged = []
    partial = []
    for r in rows:
        te = f"{r['t_exp']:.2f}" if r["t_exp"] is not None else "-"
        se = f"{r['sw_exp']:.2f}" if r["sw_exp"] is not None else "-"
        # failed scale points print as FAIL, never as a plausible time
        ts = " ".join(
            f"{r['t'][k]:8.2f}" if (k := f"sf{sf:g}") in r["t"] else f"{'FAIL':>8s}"
            for sf in sfs
        )
        mark = ""
        if (r["t_exp"] or 0) > 1.2 or (r["sw_exp"] or 0) > 1.1:
            mark = "  <-- superlinear"
            flagged.append(r["query"])
        if r["failed_at"]:
            mark += f"  !! fit on {r['t_pts']}/{len(sfs)} points (failed: {','.join(r['failed_at'])})"
            partial.append(r["query"])
        print(f"{r['query']:34s} {te:>6s} {se:>6s} {ts}{mark}")
    out = {
        "scales": sfs,
        "flag_rule": "t_exp > 1.2 or shuffle_write_exp > 1.1",
        "flagged": flagged,
        "partial_fit": partial,
        "rows": rows,
    }
    with open("bench_results/scale_probe_summary.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nflagged: {flagged or 'none'}; partial fits: {partial or 'none'}; "
          "summary -> bench_results/scale_probe_summary.json")


if __name__ == "__main__":
    main()
