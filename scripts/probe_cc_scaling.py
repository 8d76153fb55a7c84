"""Isolate the canonical_map (connected-components) stage at gate scale.

The round-5 2.4M postwrite gate showed canonical_map dominating the wall
(~80%) and scaling worst of all stages (1.89x in trial 1 vs 3.4x for the
extract map), with the pointer-jump engaged from iteration 2 onward even
though the changed census collapsed to ~140 rows by iteration 3.  This
probe runs JUST the CC loop on a synthetic (entity, block_key) pair table
of the same shape as the gate corpus (size-5 clusters via shared
identifier keys, a chain-y fraction via overlapping band keys), one fresh
JVM per run, and reports per-iteration wall + census so jump gating
policies can be compared on evidence:

  python scripts/probe_cc_scaling.py --cores 8 --pairs 17000000
  python scripts/probe_cc_scaling.py --cores 2 --pairs 17000000

Prints one JSON line: total wall, cc_stats (iterations, jump_engaged_at,
changed_hist), and the per-iteration walls recorded via cc_stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_pairs(spark, n_entities: int, cluster: int, chain_frac: float,
                chain_run: int = 8):
    """(entity, block_key) pairs: entities come in clusters of `cluster`
    sharing one identifier key (star blocks — the common case), plus runs
    of ``chain_run`` CONSECUTIVE clusters chained via overlapping band keys
    (the pointer-jump's reason to exist).  Each chained cluster emits TWO
    band keys — band:cl and band:(cl-1) — so cluster cl shares band:cl with
    cluster cl+1 of the same run: a run is one genuine chain of diameter
    ~chain_run, not the length-2 pairs the earlier single-key construction
    degenerated to.  Runs recur every 2·chain_run/chain_frac clusters, so
    chained extra rows ≈ chain_frac of the star rows."""
    from pyspark.sql import functions as F
    e = (spark.range(n_entities)
         .select(F.col("id").alias("eid"),
                 (F.col("id") / cluster).cast("long").alias("cl")))
    star = e.select(
        F.concat(F.lit("http://x/e"), F.col("eid")).alias("entity"),
        F.concat(F.lit("isbn:"), F.col("cl")).alias("block_key"))
    period = max(chain_run + 1, int(round(2 * chain_run / chain_frac)))
    chain = (e.filter((F.col("cl") % F.lit(period)) < chain_run)
             .select(
        F.concat(F.lit("http://x/e"), F.col("eid")).alias("entity"),
        F.explode(F.array(
            F.concat(F.lit("band:"), F.col("cl").cast("string")),
            F.concat(F.lit("band:"), (F.col("cl") - 1).cast("string"))))
        .alias("block_key")))
    return star.unionByName(chain)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--pairs", type=int, default=17_000_000,
                    help="approximate pair-row count (gate shape: 17M)")
    ap.add_argument("--cluster", type=int, default=5)
    ap.add_argument("--chain-frac", type=float, default=0.1)
    ap.add_argument("--chain-run", type=int, default=8,
                    help="clusters per chain (chain diameter; see "
                         "build_pairs)")
    args = ap.parse_args()

    from olkg.canonicalize import connected_components
    from olkg.session import build_session
    spark = build_session(app_name=f"probe-cc-{args.cores}",
                          master=f"local[{args.cores}]",
                          shuffle_partitions=args.cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    # ~1.1 pair rows per entity in this construction
    n_entities = int(args.pairs / 1.1)
    pairs = build_pairs(spark, n_entities, args.cluster, args.chain_frac,
                        chain_run=args.chain_run)
    pairs = pairs.persist()
    n_pairs = pairs.count()          # materialize input outside the timing
    cc_stats: dict = {}
    t0 = time.time()
    out = connected_components(pairs, cc_stats=cc_stats)
    n_out = out.count()
    wall = time.time() - t0
    print(json.dumps({"cores": args.cores, "n_pairs": n_pairs,
                      "n_mapped": n_out,
                      "wall_s": round(wall, 1), **cc_stats}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
