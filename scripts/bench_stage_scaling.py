"""Stage-level scaling bench: extract+dedup ONLY, fused vs postwrite.

Round 3's full-pipeline gate decomposition flagged ONE stage — fused
extract+dedup — as the scaling bottleneck (1.5× from local[2]→local[8] at
2.4M pages, vs 4.2× for canonical_map).  This script measures exactly that
stage pair in isolation, per dedup mode, at two parallelism levels:

- ``postwrite``: raw narrow write (`extract_triples_with_side_sink` →
  `with_dedup_write_cols` → parquet) then the decoupled
  `dedup_from_raw` job — per-phase walls reported separately;
- ``fused``: the round-3 shape — extraction streaming straight into
  `dedup_edges(strategy='prepartition')` and out to parquet.

Interleaved trials (lo, hi, lo, hi, ...), per-level medians, efficiency
per stage and mode.  Output is written INCREMENTALLY to
``BENCH/stage_scaling.json`` after every run, so a killed session loses at
most the in-flight run (the full-pipeline harness buffered its per-trial
lines through a pipe and lost them on an early stop — not again).

Usage: python scripts/bench_stage_scaling.py [--trials K] [--levels LO HI]
       [--modes postwrite fused] [--pages PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_JSON = os.path.join(REPO, "BENCH", "stage_scaling.json")


def run_stage(cores: int, pages_path: str, mode: str) -> dict:
    """Subprocess body: one extract+dedup stage run, returns phase walls."""
    from pyspark.sql import functions as F

    from olkg import fsio
    from olkg.canonicalize import dedup_edges, dedup_from_raw, \
        with_dedup_write_cols
    from olkg.extract import extract_triples_with_side_sink
    from olkg.fsio import pjoin
    from olkg.session import build_session

    spark = build_session(app_name=f"stage-scaling-{mode}-{cores}",
                          master=f"local[{cores}]",
                          shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = tempfile.mkdtemp(prefix=f"olkg_stage_{mode}_{cores}_")
    fsio.mkdirs(spark, out_dir)
    pages = spark.read.parquet(pages_path)
    sides_sink = pjoin(out_dir, "sides")
    stream = extract_triples_with_side_sink(
        pages, sides_sink, repartition_by_url=cores * 2)
    res: dict = {"mode": mode, "cores": cores}
    t0 = time.time()
    if mode == "postwrite":
        raw_path = pjoin(out_dir, "edges_raw")
        with_dedup_write_cols(stream).write.parquet(raw_path)
        t1 = time.time()
        res["extract_raw_s"] = round(t1 - t0, 1)
        stats: dict = {}
        cleanup: list = []
        deduped = dedup_from_raw(spark.read.parquet(raw_path), stats=stats,
                                 cleanup=cleanup)
        deduped.write.parquet(pjoin(out_dir, "edges_d0"))
        for cached in cleanup:
            cached.unpersist()
        res["dedup_s"] = round(time.time() - t1, 1)
        res.update(stats)
    else:
        (dedup_edges(stream, strategy="prepartition", num_partitions=64)
         .write.parquet(pjoin(out_dir, "edges_d0")))
    res["total_s"] = round(time.time() - t0, 1)
    res["rows"] = spark.read.parquet(pjoin(out_dir, "edges_d0")).count()
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--levels", type=int, nargs=2, default=(2, 8))
    ap.add_argument("--modes", nargs="+", default=["postwrite"],
                    choices=["postwrite", "fused"])
    ap.add_argument("--pages",
                    default="/tmp/olkg_scaling_pages_80000_cs5")
    ap.add_argument("--run-one", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.run_one is not None:
        mode, cores = args.run_one.split(":")
        print("RESULT " + json.dumps(
            run_stage(int(cores), args.pages, mode)), flush=True)
        return

    env = dict(os.environ, OLKG_DRIVER_MEM="16g", OLKG_TMPFS_SCRATCH="1",
               PYTHONPATH=REPO)
    lo, hi = sorted(args.levels)
    runs: list[dict] = []

    def save() -> None:
        summary: dict = {"pages_path": args.pages, "levels": [lo, hi],
                         "trials_per_level": args.trials, "runs": runs}
        for mode in args.modes:
            walls = {c: [r["total_s"] for r in runs
                         if r["mode"] == mode and r["cores"] == c]
                     for c in (lo, hi)}
            if walls[lo] and walls[hi]:
                med = {c: statistics.median(walls[c]) for c in (lo, hi)}
                eff = (med[lo] / med[hi]) / (hi / lo)
                summary[mode] = {
                    f"local{lo}_median_s": med[lo],
                    f"local{hi}_median_s": med[hi],
                    "stage_speedup": round(med[lo] / med[hi], 3),
                    "stage_scaling_efficiency": round(eff, 3)}
        os.makedirs(os.path.dirname(OUT_JSON), exist_ok=True)
        with open(OUT_JSON, "w") as f:
            json.dump(summary, f, indent=2)

    for i in range(args.trials):
        for cores in (lo, hi):          # interleave against host drift
            for mode in args.modes:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--run-one", f"{mode}:{cores}",
                     "--pages", args.pages],
                    capture_output=True, text=True, env=env, cwd=REPO)
                if proc.returncode != 0:
                    raise RuntimeError(proc.stderr[-3000:])
                line = [l for l in proc.stdout.splitlines()
                        if l.startswith("RESULT ")][-1]
                rec = json.loads(line[len("RESULT "):])
                rec["trial"] = i + 1
                runs.append(rec)
                print(json.dumps(rec), flush=True)
                save()                   # incremental — survives any stop

    print(json.dumps({m: s for m, s in
                      json.load(open(OUT_JSON)).items()
                      if m in args.modes}))


if __name__ == "__main__":
    main()
