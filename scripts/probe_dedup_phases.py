"""Diagnose dedup_from_raw's parallel behavior, phase by phase.

The stage-scaling bench showed the decoupled dedup job running SLOWER at
local[8] than local[2] on the same raw table.  This probe isolates the
job's phases on a synthetic raw table of the same shape (59M rows, 14%
dups — derived from the shuffle-control generator output, so no Python
extraction in the loop):

  window   — dedup_from_raw(detect='window'): sort-based window detect
             (persist+count = detect_s), then broadcast anti-join write
             (remove_s)
  hashagg  — dedup_from_raw(detect='hashagg'): repartition + complete
             hash aggregate detect (sort-free), then broadcast group
             join-back write
  fallback — repartition(h1, h2) + dropDuplicates (the full-row shuffled
             plan, for reference)

Usage: python scripts/probe_dedup_phases.py --cores 8 [--phases ...]
Each invocation is one fresh JVM (run one phase set per process to keep
timings honest).  Prints one JSON line per phase.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.path.join(tempfile.gettempdir(), "olkg_probe_raw_59M")


def ensure_raw() -> None:
    if os.path.exists(os.path.join(SRC, "_SUCCESS")):
        return
    from olkg.canonicalize import with_dedup_write_cols
    from olkg.session import build_session
    spark = build_session(app_name="probe-raw-gen", master="local[32]",
                          shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    ctl = os.path.join(tempfile.gettempdir(), "olkg_shufctl_src_59000000")
    (with_dedup_write_cols(spark.read.parquet(ctl))
     .write.mode("overwrite").parquet(SRC))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--phases", nargs="+",
                    default=["window", "hashagg", "fallback"])
    ap.add_argument("--gen-only", action="store_true")
    args = ap.parse_args()
    ensure_raw()
    if args.gen_only:
        return

    from pyspark.sql import functions as F

    from olkg.canonicalize import dedup_from_raw
    from olkg.session import build_session
    spark = build_session(app_name=f"probe-dedup-{args.cores}",
                          master=f"local[{args.cores}]",
                          shuffle_partitions=args.cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    raw = spark.read.parquet(SRC)
    cols = ["subj", "pred", "obj", "obj_kind", "obj_datatype"]

    for detect in ("window", "hashagg"):
        if detect not in args.phases:
            continue
        stats: dict = {}
        cleanup: list = []
        t0 = time.time()
        deduped = dedup_from_raw(raw, stats=stats, detect=detect,
                                 cleanup=cleanup)
        detect_s = time.time() - t0          # census action runs inside
        out = tempfile.mkdtemp(prefix="olkg_probe_rm_")
        t1 = time.time()
        deduped.write.mode("overwrite").parquet(out)
        print(json.dumps({"phase": detect, "cores": args.cores,
                          "detect_s": round(detect_s, 1),
                          "remove_s": round(time.time() - t1, 1),
                          **stats}), flush=True)
        shutil.rmtree(out, ignore_errors=True)
        for cached in cleanup:
            cached.unpersist()

    if "fallback" in args.phases:
        out = tempfile.mkdtemp(prefix="olkg_probe_fb_")
        t0 = time.time()
        (raw.repartition(64, "h1", "h2").dropDuplicates(["h1", "h2"])
         .select(*cols)
         .write.mode("overwrite").parquet(out))
        print(json.dumps({"phase": "fallback", "cores": args.cores,
                          "wall_s": round(time.time() - t0, 1)}), flush=True)
        shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
