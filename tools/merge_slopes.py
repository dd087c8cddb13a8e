#!/usr/bin/env python3
"""Merge multiple 3-point slope sweeps (tools/bench_slope_r11*.json) into
one artifact of record: per B-set query, keep EVERY run's (ratio, resid)
pair plus the BEST fit — the run with the smallest engine residual, i.e.
the window where the three points actually sat on a line. Host drag
windows produce fits with large residuals; picking min-residual selects
the measurement, not the answer we'd like.

Usage: python3 tools/merge_slopes.py tools/bench_slope_r11a.json ... > tools/bench_slope3_latest.json

Supersede rule: tools/slope_supersede.json (optional) maps a query name
to the FIRST window tag that measured its CURRENT implementation.
Windows listed before that tag (command-line order) are excluded for
that query: min-residual selection across code generations would
otherwise attribute the OLD implementation's marginal to the new code —
flattering a regression or hiding an improvement equally (r16: the q14
family's md5→xxhash64 change halved the data term, but every pre-r16
window still fit the md5 code with smaller residuals).
"""
import json
import os
import sys


def main(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append((p.split("/")[-1], json.load(f)))
    supersede = {}
    sup_path = os.path.join(os.path.dirname(paths[0]) or ".", "slope_supersede.json")
    if os.path.exists(sup_path):
        with open(sup_path) as f:
            supersede = json.load(f)
    tag_order = {p.split("/")[-1]: i for i, p in enumerate(paths)}
    names = []
    for _, r in runs:
        for q in r["queries"]:
            if q not in names:
                names.append(q)
    out = {"sources": [p for p, _ in runs], "queries": {}}
    if supersede:
        out["supersede"] = supersede
    for q in sorted(names):
        min_tag = supersede.get(q)
        if min_tag is not None and min_tag not in tag_order:
            # silently degrading to "no exclusion" would reintroduce the
            # cross-generation attribution the rule exists to prevent
            sys.exit(f"supersede window {min_tag!r} for {q!r} is not among "
                     f"the merged inputs — pass it on the command line")
        min_idx = tag_order[min_tag] if min_tag else 0
        entries = []
        for tag, r in runs:
            if tag_order.get(tag, 0) < min_idx:
                continue
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
