"""Summarize an interrupted bench_scaling run from its log.

Since round 5 bench_scaling.py writes BENCH/<out-json> incrementally after
every trial (with "partial": true until the run completes), so a killed run
keeps its own artifact; this tool remains for recovering a summary from a
LOG when only stdout survived (e.g. a run of the pre-round-5 harness).
Usage:

    python scripts/summarize_scaling.py /tmp/scaling_2x.log \
        --levels 2 8 --clones 80000 --cluster-size 5 --out scaling_2x.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--levels", type=int, nargs=2, default=(2, 8))
    ap.add_argument("--clones", type=int, default=80000)
    ap.add_argument("--cluster-size", type=int, default=5)
    ap.add_argument("--out", default="scaling_2x.json")
    args = ap.parse_args()
    lo, hi = sorted(args.levels)

    recs = []
    for ln in open(args.log):
        ln = ln.strip()
        if ln.startswith("{") and '"tps"' in ln:
            recs.append(json.loads(ln))
    # bench_scaling interleaves lo,hi,lo,hi,... — assign by position
    trials = {lo: recs[0::2], hi: recs[1::2]}
    n = min(len(trials[lo]), len(trials[hi]))
    if n == 0:
        sys.exit("no complete interleaved trial pair in the log")
    trials = {c: t[:n] for c, t in trials.items()}

    med = {c: statistics.median(r["tps"] for r in trials[c]) for c in (lo, hi)}
    eff = (med[hi] / med[lo]) / (hi / lo)
    summary = {
        "clones": args.clones,
        "cluster_size": args.cluster_size,
        "pages": trials[hi][0]["pages"],
        "triples": trials[hi][0]["triples"],
        "levels": [lo, hi],
        "trials_per_level": n,
        "note": ("summarized from the run log; interleaved protocol, "
                 "median per level"),
        f"local{lo}": {"tps_median": med[lo], "trials": trials[lo]},
        f"local{hi}": {"tps_median": med[hi], "trials": trials[hi]},
        "scaling_efficiency": round(eff, 3),
        "gate": eff >= 0.8,
    }
    out = os.path.join(REPO, "BENCH", args.out)
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: summary[k] for k in
                      ("pages", "triples", "levels", "trials_per_level",
                       "scaling_efficiency", "gate")}))


if __name__ == "__main__":
    main()
