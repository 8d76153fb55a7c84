"""Extra benchmarks for optimization work (guide §1): per-query isolation
with BOTH the frozen bench methodology (.count()) and the noop sink
(df.write.format("noop")), plus .explain("formatted") capture.

NOT part of the driver contract — bench.py stays the measured artifact.

Usage:
  python bench_extra.py [--sf-dir DIR] [--queries q1,q2] [--trials N]
                        [--plans-out DIR] [--noop] [--pipeline]

Prints one JSON line per query with count/noop timings, and (with
--plans-out) writes the formatted plan of each query to
<plans-out>/<query>.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_bench_session():
    """The exact session bench.py builds (same confs → same plans)."""
    os.environ.setdefault("OLKG_TMPFS_SCRATCH", "1")
    from olkg.session import build_session
    extra = {"spark.task.cpus": "2"} if CPUS >= 16 else {}
    spark = build_session(
        app_name="olkg-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(2 * CPUS, 16),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--plans-out", default="")
    ap.add_argument("--noop", action="store_true",
                    help="also time with the noop sink")
    args = ap.parse_args()

    spark = build_bench_session()
    import __spark_entry__ as entry
    qmap = entry.queries()
    names = ([n.strip() for n in args.queries.split(",") if n.strip()]
             or list(qmap))
    if any(n.startswith("ann_ivf") for n in names):
        entry.ensure_ivf_materialized(spark, args.sf_dir)

    if args.plans_out:
        os.makedirs(args.plans_out, exist_ok=True)

    for name in names:
        df = qmap[name](spark, args.sf_dir)
        if args.plans_out:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans_out, f"{name}.txt"), "w") as f:
                f.write(plan)
        rec = {"query": name, "sf_dir": args.sf_dir}
        counts = []
        for _ in range(args.trials):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}:count")
            t0 = time.time()
            qmap[name](spark, args.sf_dir).count()
            counts.append(round(time.time() - t0, 3))
        rec["count_sec"] = counts
        if args.noop:
            noops = []
            for _ in range(args.trials):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}:noop")
                t0 = time.time()
                (qmap[name](spark, args.sf_dir)
                 .write.format("noop").mode("overwrite").save())
                noops.append(round(time.time() - t0, 3))
            rec["noop_sec"] = noops
        spark.sparkContext.setJobDescription(None)
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
