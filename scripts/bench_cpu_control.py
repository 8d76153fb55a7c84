"""Pure-CPU control for the scaling gate (companion to
bench_shuffle_control.py).

Measures THIS HOST's parallel-scaling ceiling for compute-bound work with no
JVM, no shuffle, no Python<->JVM traffic: a fixed amount of md5 hashing split
across P worker processes, timed at the gate's two parallelism levels.  The
pipeline's narrow-map stages (the Python extraction UDF above all) cannot
scale better than this number on this box — a stage matching it is
host-bound, not engine-bound.  On a real cluster each node brings its own
cores, so this ceiling, like the shuffle one, is a single-box artifact.

Usage: python scripts/bench_cpu_control.py [--hashes N] [--trials K]
       [--levels LO HI] [--out-json NAME]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import os
import statistics
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_BLOCK = b"x" * 4096


def _worker(n_hashes: int) -> int:
    h = b"seed"
    for _ in range(n_hashes):
        h = hashlib.md5(h + _BLOCK).digest()
    return len(h)


def run_once(procs: int, total_hashes: int) -> float:
    per = total_hashes // procs
    t0 = time.time()
    with mp.get_context("spawn").Pool(procs) as pool:
        pool.map(_worker, [per] * procs)
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hashes", type=int, default=6_000_000,
                    help="total md5 invocations (fixed work at every level)")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--levels", type=int, nargs=2, default=(2, 8))
    ap.add_argument("--out-json", default="cpu_control.json")
    args = ap.parse_args()

    lo, hi = sorted(args.levels)
    walls: dict[int, list[float]] = {lo: [], hi: []}
    for i in range(args.trials):
        for procs in (lo, hi):        # interleave against host drift
            w = run_once(procs, args.hashes)
            walls[procs].append(round(w, 2))
            print(f"trial {i + 1}: {procs} procs {w:.2f}s", flush=True)

    med = {c: statistics.median(walls[c]) for c in (lo, hi)}
    ratio = med[lo] / med[hi]
    summary = {
        "hashes": args.hashes,
        "levels": [lo, hi],
        "trials_per_level": args.trials,
        f"procs{lo}": {"wall_median_s": med[lo], "trials": walls[lo]},
        f"procs{hi}": {"wall_median_s": med[hi], "trials": walls[hi]},
        "speedup": round(ratio, 3),
        "scaling_efficiency": round(ratio / (hi / lo), 3),
        "note": ("host ceiling for embarrassingly-parallel pure-CPU work; "
                 "narrow-map pipeline stages at or above this ratio are "
                 "host-bound"),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", args.out_json), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: summary[k] for k in
                      ("hashes", "levels", "speedup", "scaling_efficiency")}))


if __name__ == "__main__":
    main()
