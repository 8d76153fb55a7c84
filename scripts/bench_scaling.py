"""Two-parallelism scaling benchmark (BASELINE.md protocol).

No multi-node cluster exists in this sandbox, so the north_rule's N → 4N
executor criterion is evidenced by running the SAME pipeline on the SAME
input at local[8] and local[32] (shuffle partitions scaled proportionally)
in separate JVMs, reporting triples/sec at both and

    efficiency = (tps_32 / tps_8) / (32 / 8)     gate: ≥ 0.8

Writes BENCH/scaling.json and updates the measured table in BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [--clones N] [--skip-generate]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def generate_corpus(clones: int, path: str) -> None:
    from olkg.fixtures import corpus_lines
    from olkg.pagesgen import build_pages_df_distributed
    from olkg.session import build_session
    spark = build_session(app_name="olkg-scaling-gen", master="local[32]",
                          shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    df = build_pages_df_distributed(
        spark, corpus_lines(include_reference=True), clones=clones,
        rewrite_refs=True, skew_hot_author="/authors/HOT1A",
        skew_fraction=0.1, partitions=128)
    df.write.mode("overwrite").parquet(path)
    spark.stop()


def run_at(cores: int, pages_path: str) -> dict:
    out = tempfile.mkdtemp(prefix=f"olkg_scale_{cores}_")
    # fixed moderate heap at every level: on this VM, JVM heaps ≥32g degrade
    # throughput 2-3x (host-side page backing; measured local[16] 118 s @16g
    # vs >290 s @32g on identical input) — and a constant heap also keeps
    # memory out of the compared variables
    env = dict(os.environ,
               OLKG_DRIVER_MEM="16g",
               PYTHONPATH=REPO)
    cmd = [sys.executable, "-m", "olkg.pipeline",
           "--pages", pages_path,
           "--lcsh-parquet", os.path.join(REPO, "data", "lcsh.parquet"),
           "--out", out,
           "--master", f"local[{cores}]",
           "--shuffle-partitions", str(cores * 2),
           "--no-resume",
           "--fast",
           "--hot-threshold", "50000",
           # north_rule: repartition pages by url-hash; also guarantees the
           # narrow extract stage has ≥ cores input partitions
           "--repartition-by-url", str(cores * 2)]
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=REPO)
    wall_incl_startup = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    if proc.returncode != 0:
        raise RuntimeError(f"run at {cores} cores failed:\n{proc.stderr[-4000:]}")
    line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    m = json.loads(line)
    m["cores"] = cores
    m["wall_incl_startup_s"] = round(wall_incl_startup, 1)
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clones", type=int,
                    default=int(os.environ.get("OLKG_SCALING_CLONES", "40000")))
    ap.add_argument("--skip-generate", action="store_true")
    args = ap.parse_args()

    pages_path = os.path.join(tempfile.gettempdir(),
                              f"olkg_scaling_pages_{args.clones}")
    if not args.skip_generate and not os.path.exists(
            os.path.join(pages_path, "_SUCCESS")):
        print(f"generating corpus: 30 records x {args.clones} clones ...",
              flush=True)
        generate_corpus(args.clones, pages_path)

    results = {}
    # N=4 vs 4N=16: the UDF stage runs a JVM task thread + a Python worker
    # per slot, so local[32] would put 64 runnable threads on this 32-CPU box
    # and measure oversubscription, not scaling (memory/CPU experiments in
    # BENCH/BASELINE.md).  4 and 16 both fit: parallelism is the only delta.
    for cores in (4, 16):
        print(f"running pipeline at local[{cores}] ...", flush=True)
        m = run_at(cores, pages_path)
        tps = m["triples"] / m["wall_s"]
        results[cores] = {"wall_s": m["wall_s"], "triples": m["triples"],
                          "pages": m["pages"], "tps": round(tps, 1),
                          "text_mismatches": m["text_mismatches"],
                          "stages": m["stages"]}
        print(json.dumps(results[cores]), flush=True)

    lo, hi = sorted(results)
    eff = (results[hi]["tps"] / results[lo]["tps"]) / (hi / lo)
    summary = {"clones": args.clones, "pages": results[hi]["pages"],
               f"local{lo}": results[lo], f"local{hi}": results[hi],
               "scaling_efficiency": round(eff, 3), "gate": eff >= 0.8}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
