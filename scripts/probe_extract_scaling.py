"""Bisect the fused extract+dedup stage's scaling behavior.

Runs ONE job (extract UDF -> dropDuplicates -> parquet write) at a given
parallelism with feature toggles, printing wall seconds.  Separate JVM per
invocation (driven by the shell), same input.

Usage: python scripts/probe_extract_scaling.py CORES [--no-sink] [--no-observe]
       [--no-dedup] [--sides-only] [--udf-only]
"""
import argparse
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cores", type=int)
    ap.add_argument("--pages", default=os.path.join(
        tempfile.gettempdir(), "olkg_scaling_pages_20000"))
    ap.add_argument("--no-sink", action="store_true")
    ap.add_argument("--no-observe", action="store_true")
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--udf-only", action="store_true",
                    help="count(1) over the UDF stream, no shuffle/write")
    ap.add_argument("--prepart-dedup", action="store_true")
    ap.add_argument("--native", action="store_true",
                    help="enable the (measured-slower) Catalyst-native "
                         "hot-field emission for A/B runs")
    ap.add_argument("--shm-out", action="store_true")
    ap.add_argument("--repartition", type=int, default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from olkg.extract import extract_pages, extract_triples_with_side_sink
    from olkg.session import build_session

    os.environ.setdefault("OLKG_DRIVER_MEM", "16g")
    os.environ.setdefault("OLKG_TMPFS_SCRATCH", "1")
    sp = args.shuffle_partitions or args.cores * 2
    spark = build_session(app_name=f"probe{args.cores}",
                          master=f"local[{args.cores}]",
                          shuffle_partitions=sp)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(args.pages)
    out_base = "/dev/shm" if args.shm_out else None
    out = tempfile.mkdtemp(prefix=f"probe_{args.cores}_", dir=out_base)

    t0 = time.time()
    if args.no_sink:
        stream = extract_pages(pages, triples=True, sides=False,
                               repartition_by_url=args.repartition) \
            .select("subj", "pred", "obj", "obj_kind", "obj_datatype")
    else:
        stream = extract_triples_with_side_sink(
            pages, os.path.join(out, "sides"),
            repartition_by_url=args.repartition,
            native_hot=args.native)
    if args.udf_only:
        n = stream.count()
    else:
        cols = ["subj", "pred", "obj", "obj_kind", "obj_datatype"]
        if args.no_dedup:
            df = stream
        elif args.prepart_dedup:
            df = stream.repartition(sp, *[__import__("pyspark.sql.functions", fromlist=["col"]).col(c) for c in cols]).dropDuplicates(cols)
        else:
            df = stream.dropDuplicates(cols)
        if not args.no_observe:
            obs = Observation("n")
            df = df.observe(obs, F.count(F.lit(1)).alias("n"))
        df.write.mode("overwrite").parquet(os.path.join(out, "edges"))
        n = obs.get["n"] if not args.no_observe else -1
    wall = time.time() - t0
    print(f"RESULT cores={args.cores} sink={not args.no_sink} "
          f"dedup={not args.no_dedup} observe={not args.no_observe} "
          f"udf_only={args.udf_only} sp={sp} repart={args.repartition} rows={n} wall={wall:.1f}s",
          flush=True)
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
