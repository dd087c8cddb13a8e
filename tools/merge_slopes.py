#!/usr/bin/env python3
"""Merge multiple 3-point slope sweeps (tools/bench_slope_r11*.json) into
one artifact of record: per B-set query, keep EVERY run's (ratio, resid)
pair plus the BEST fit — the run with the smallest engine residual, i.e.
the window where the three points actually sat on a line. Host drag
windows produce fits with large residuals; picking min-residual selects
the measurement, not the answer we'd like.

Usage: python3 tools/merge_slopes.py tools/bench_slope_r11a.json ... > tools/bench_slope3_latest.json
"""
import json
import sys


def main(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append((p.split("/")[-1], json.load(f)))
    names = []
    for _, r in runs:
        for q in r["queries"]:
            if q not in names:
                names.append(q)
    out = {"sources": [p for p, _ in runs], "queries": {}}
    for q in sorted(names):
        entries = []
        for tag, r in runs:
            e = r["queries"].get(q)
            if e is None or "points" not in e:
                continue
            if e.get("censored"):
                # a watchdog-cancelled run is not a measurement; it cannot
                # become a "best fit" nor count toward the floor-bound vote
                continue
            entries.append({
                "run": tag,
                "marginal_ratio": e.get("marginal_ratio"),
                "resid_rel_e": e.get("resid_rel_e"),
                "points": e["points"],
            })
        if not entries:
            continue
        # best fit: among runs with a measurable ratio, smallest engine
        # residual; if NO run could measure a ratio (engine delta within
        # jitter at every window), the query is floor-bound — that IS the
        # verdict, recorded explicitly.
        with_ratio = [e for e in entries
                      if e["marginal_ratio"] is not None and e["resid_rel_e"] is not None]
        if with_ratio:
            best = min(with_ratio, key=lambda e: e["resid_rel_e"])
            verdict = {"best_marginal": best["marginal_ratio"],
                       "best_resid_rel_e": best["resid_rel_e"],
                       "best_run": best["run"]}
            # floor-bound override: if half or more runs saw no measurable
            # engine slope, the occasional non-null fit is window noise
            nulls = sum(1 for e in entries if e["marginal_ratio"] is None)
            if nulls * 2 >= len(entries):
                verdict["floor_bound"] = True
        else:
            verdict = {"floor_bound": True}
        out["queries"][q] = {"verdict": verdict, "runs": entries}
    json.dump(out, sys.stdout, indent=1)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main(sys.argv[1:])
