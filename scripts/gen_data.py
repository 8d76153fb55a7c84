"""Generate the repo's committed KG data artifacts (deterministic):

- data/pages.parquet        : synthetic+reference pages table (FIXTURES.md §1)
- data/lcsh.parquet         : LCSH label→URI dimension
- data/golden_edges.parquet : deduplicated golden triple set (pure-Python net
                              effect, olkg.golden — the DuckDB oracle source)
- data/hyperplanes.parquet  : LSH hyperplane weights (table_id, plane_id,
                              w: list<double> of ±1), derived deterministically
                              from md5 so both Spark and the SQL oracle read
                              the SAME weights and derive identical buckets

Run: python scripts/gen_data.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from olkg.fixtures import LCSH_ROWS, corpus_lines
from olkg.golden import golden_triples
from olkg.pagesgen import pages_rows

OUT = os.path.join(os.path.dirname(__file__), "..", "data")


def main():
    os.makedirs(OUT, exist_ok=True)
    lines = corpus_lines(include_reference=True)

    rows = pages_rows(lines)
    pages = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    pages_tbl = pa.Table.from_pandas(pages, schema=pa.schema([
        ("url", pa.string()), ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string()),
    ]))
    pq.write_table(pages_tbl, os.path.join(OUT, "pages.parquet"))

    lcsh = pd.DataFrame(LCSH_ROWS, columns=["label", "uri"])
    pq.write_table(pa.Table.from_pandas(lcsh),
                   os.path.join(OUT, "lcsh.parquet"))

    import hashlib
    NUM_TABLES, NUM_PLANES, DIM = 4, 6, 64
    prows = []
    for t in range(NUM_TABLES):
        for p in range(NUM_PLANES):
            w = [1.0 if hashlib.md5(f"{t}|{p}|{j}".encode()).digest()[0] % 2
                 == 0 else -1.0 for j in range(DIM)]
            prows.append((t, p, w))
    planes_tbl = pa.table({
        "table_id": pa.array([r[0] for r in prows], pa.int32()),
        "plane_id": pa.array([r[1] for r in prows], pa.int32()),
        "w": pa.array([r[2] for r in prows], pa.list_(pa.float64())),
    })
    pq.write_table(planes_tbl, os.path.join(OUT, "hyperplanes.parquet"))

    # IVF coarse codebook: k deterministic pseudo-random centroids — both
    # engines READ the same values, so cell assignment is engine-identical
    K = 16
    crows = []
    for cid in range(K):
        c = [hashlib.md5(f"ivf|{cid}|{j}".encode()).digest()[0] / 255.0 - 0.5
             for j in range(DIM)]
        crows.append((cid, c))
    cent_tbl = pa.table({
        "centroid_id": pa.array([r[0] for r in crows], pa.int32()),
        "c": pa.array([r[1] for r in crows], pa.list_(pa.float64())),
    })
    pq.write_table(cent_tbl, os.path.join(OUT, "ivf_centroids.parquet"))

    golden = sorted(golden_triples(lines, dict(LCSH_ROWS)))
    gdf = pd.DataFrame(golden, columns=["subj", "pred", "obj", "obj_kind",
                                        "obj_datatype"])
    pq.write_table(pa.Table.from_pandas(gdf),
                   os.path.join(OUT, "golden_edges.parquet"))
    print(f"pages={len(pages)} lcsh={len(lcsh)} golden_triples={len(gdf)}")


if __name__ == "__main__":
    main()
