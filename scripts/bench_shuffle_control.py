"""Pure-shuffle control for the scaling gate (BENCH/BASELINE.md).

The round-3 scaling decomposition attributed the fused extract+dedup stage's
poor 2→8 scaling to the full shuffle of the ~59M-row triple stream being
bounded by ONE host's memory-bus/disk bandwidth at both simulated "cluster
sizes".  This script measures that ceiling DIRECTLY with a job of the same
shape and size but no Python, no extraction, no pipeline: read a synthetic
edge table shaped like the real direct stream (same five string columns,
similar row bytes, ~14% duplicates), repartition on the five-column dedup
key, dropDuplicates, write parquet — i.e. exactly the fused plan's dedup
shuffle and the postwrite fallback plan.

Run interleaved at local[2] / local[8] (the bench_scaling protocol), report
per-level medians and the efficiency ratio.  Whatever ratio THIS job reaches
is the host's ceiling for that shuffle shape: a pipeline stage matching it
is host-bound, not engine-bound.  On a real cluster the aggregate shuffle
bandwidth grows with node count — this ceiling is a single-box artifact.

Usage: python scripts/bench_shuffle_control.py [--rows N] [--trials K]
       [--levels LO HI]
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

DUP_FRACTION = 0.14   # measured dup share of the 2.4M-page direct stream


def generate(rows: int, path: str) -> None:
    from pyspark.sql import functions as F

    from olkg.session import build_session
    spark = build_session(app_name="shuffle-control-gen", master="local[32]",
                          shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    n_distinct = int(rows * (1 - DUP_FRACTION))
    base = spark.range(rows).select(
        (F.col("id") % F.lit(n_distinct)).alias("k"))
    # row bytes modeled on the real stream: ~40-char subject URI, predicate
    # from a small vocabulary, ~40-char object, mostly-null datatype
    df = base.select(
        F.concat(F.lit("http://olkg.example/editions/OL"),
                 F.col("k").cast("string"), F.lit("M")).alias("subj"),
        F.concat(F.lit("http://purl.org/ontology/bibo/p"),
                 (F.col("k") % 60).cast("string")).alias("pred"),
        F.concat(F.lit("v:"), F.md5(F.col("k").cast("string"))).alias("obj"),
        F.when(F.col("k") % 3 == 0, F.lit("uri"))
         .otherwise(F.lit("literal")).alias("obj_kind"),
        F.when(F.col("k") % 17 == 0,
               F.lit("http://www.w3.org/2001/XMLSchema#string"))
         .otherwise(F.lit(None).cast("string")).alias("obj_datatype"))
    df.write.mode("overwrite").parquet(path)
    spark.stop()


def run_one(cores: int, src: str) -> float:
    """Subprocess body: the timed shuffle-dedup-write job."""
    from pyspark.sql import functions as F  # noqa: F401

    from olkg.session import build_session
    spark = build_session(app_name=f"shuffle-control-{cores}",
                          master=f"local[{cores}]",
                          shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    # scratch lives beside the source table, so the control job's I/O stays
    # on the same storage medium the gate run under measurement uses
    out = tempfile.mkdtemp(prefix=f"olkg_shufctl_{cores}_",
                           dir=os.path.dirname(src.rstrip("/")))
    cols = ["subj", "pred", "obj", "obj_kind", "obj_datatype"]
    t0 = time.time()
    (spark.read.parquet(src)
     .repartition(64, *cols)          # fixed reduce width at every level,
     .dropDuplicates(cols)            # like the pipeline's prepartition plan
     .write.mode("overwrite").parquet(out))
    wall = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()
    return wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=59_000_000)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--levels", type=int, nargs=2, default=(2, 8))
    ap.add_argument("--out-json", default="shuffle_control.json",
                    help="artifact filename under BENCH/ (use a dated name "
                         "to co-record a gate run's same-day ceiling "
                         "without overwriting the historical control)")
    ap.add_argument("--storage", default="disk", choices=["disk", "tmpfs"],
                    help="medium for the source table and the written "
                         "output — match the gate run this control "
                         "brackets (tmpfs = /dev/shm, the "
                         "cluster-representative protocol; see "
                         "bench_scaling.py docstring)")
    ap.add_argument("--run-one", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--src", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.run_one is not None:
        print(json.dumps({"wall_s": run_one(args.run_one, args.src)}))
        return

    root = tempfile.gettempdir()
    if args.storage == "tmpfs":
        root = "/dev/shm/olkg_gate"
        os.makedirs(root, exist_ok=True)
    src = os.path.join(root, f"olkg_shufctl_src_{args.rows}")
    disk_src = os.path.join(tempfile.gettempdir(),
                            f"olkg_shufctl_src_{args.rows}")
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        if (src != disk_src
                and os.path.exists(os.path.join(disk_src, "_SUCCESS"))):
            print(f"copying control rows to tmpfs: {src} ...", flush=True)
            shutil.copytree(disk_src, src, dirs_exist_ok=True)
        else:
            print(f"generating {args.rows} control rows ...", flush=True)
            generate(args.rows, src)

    env = dict(os.environ, OLKG_DRIVER_MEM="16g", OLKG_TMPFS_SCRATCH="1",
               PYTHONPATH=REPO)
    lo, hi = sorted(args.levels)
    walls: dict[int, list[float]] = {lo: [], hi: []}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    artifact = os.path.join(REPO, "BENCH", args.out_json)

    def summarize(partial: bool) -> dict:
        med = {c: (statistics.median(walls[c]) if walls[c] else None)
               for c in (lo, hi)}
        ratio = (med[lo] / med[hi]) if med[lo] and med[hi] else None
        s = {
            "rows": args.rows,
            "dup_fraction": DUP_FRACTION,
            "storage": args.storage,
            "levels": [lo, hi],
            "trials_per_level": args.trials,
            f"local{lo}": {"wall_median_s": med[lo], "trials": walls[lo]},
            f"local{hi}": {"wall_median_s": med[hi], "trials": walls[hi]},
            "speedup": round(ratio, 3) if ratio else None,
            "scaling_efficiency": round(ratio / (hi / lo), 3) if ratio
            else None,
            "note": ("host ceiling for a full-row dedup shuffle of this "
                     "shape; pipeline stages at or above this ratio are "
                     "host-bound"),
        }
        if partial:
            s["partial"] = True
        return s

    for i in range(args.trials):
        for cores in (lo, hi):        # interleave against host drift
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--run-one", str(cores), "--src", src],
                capture_output=True, text=True, env=env, cwd=REPO)
            if proc.returncode != 0:
                raise RuntimeError(proc.stderr[-3000:])
            line = [l for l in proc.stdout.strip().splitlines()
                    if l.startswith("{")][-1]
            w = json.loads(line)["wall_s"]
            walls[cores].append(round(w, 1))
            print(f"trial {i + 1}: local[{cores}] {w:.1f}s", flush=True)
            # artifact after every trial — a wall-clock kill never loses
            # the record (the bench_scaling lesson)
            with open(artifact, "w") as f:
                json.dump(summarize(partial=True), f, indent=2)

    summary = summarize(partial=False)
    with open(artifact, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: summary[k] for k in
                      ("rows", "levels", "speedup", "scaling_efficiency")}))


if __name__ == "__main__":
    main()
