"""Driver-contract tests: every queries() entry runs; every oracle_sql()
entry produces the identical result set in DuckDB (the same comparison the
verify driver performs: column names + row count + order-insensitive values).
Runs at sf0.001 for speed; the driver uses sf0.01."""

import math
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        return f"{v.normalize():f}" if v != 0 else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def _normalize(df, cols):
    rows = [tuple(_norm_cell(r[c]) for c in cols) for _, r in df.iterrows()]
    return sorted(rows)


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_runs_and_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_pd = sdf.toPandas()
    assert spark_pd is not None
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        # rows-only contract: runs, schema stable, deterministic re-run
        again = q(spark, SF_DIR).toPandas()
        assert list(spark_pd.columns) == list(again.columns)
        assert len(spark_pd) == len(again)
        return
    duck_pd = ddb.execute(oracle).fetchdf()
    s_cols = sorted(spark_pd.columns)
    d_cols = sorted(duck_pd.columns)
    assert s_cols == d_cols, f"{name}: columns {s_cols} != {d_cols}"
    assert len(spark_pd) == len(duck_pd), (
        f"{name}: rows {len(spark_pd)} != {len(duck_pd)}")
    s_rows = _normalize(spark_pd, s_cols)
    d_rows = _normalize(duck_pd, d_cols)
    mism = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
    assert s_rows == d_rows, f"{name}: first mismatches {mism}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"name", "n"}


def test_ann_lsh_recall_vs_bruteforce(spark):
    """The LSH path must find a reasonable fraction of the true top-5."""
    from olkg.simsearch import cosine_topk_bruteforce, cosine_topk_lsh
    from pyspark.sql import functions as F
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double")))
    bf = {(r.query_id, r.neighbor_id)
          for r in cosine_topk_bruteforce(emb, list(range(10)), k=5).collect()}
    lsh = {(r.query_id, r.neighbor_id)
           for r in cosine_topk_lsh(emb, list(range(10)), k=5,
                                    num_planes=4, num_tables=6).collect()}
    assert len(bf) == 50
    recall = len(bf & lsh) / len(bf)
    assert recall >= 0.3, f"LSH recall {recall} suspiciously low"


def test_multimodal_decode_stub_raises():
    from olkg.multimodal import decode_stub
    with pytest.raises(NotImplementedError):
        decode_stub(b"\x89PNG", "image/png")


def test_ann_ivf_recall_vs_bruteforce(spark):
    """IVF top-k must overlap brute force meaningfully at nprobe=4/16 cells
    and reach full recall when probing every cell."""
    import os
    from pyspark.sql import functions as F
    from olkg.simsearch import cosine_topk_bruteforce, ivf_topk
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    emb = emb.withColumn("embedding",
                         F.transform("embedding", lambda x: x.cast("double")))
    cents = spark.read.parquet(
        os.path.join(os.path.dirname(entry_mod.__file__), "data",
                     "ivf_centroids.parquet"))
    qids = list(range(5))
    bf = {(r.query_id, r.neighbor_id)
          for r in cosine_topk_bruteforce(emb, qids, k=5).collect()}
    ivf4 = {(r.query_id, r.neighbor_id)
            for r in ivf_topk(emb, cents, qids, k=5, nprobe=4).collect()}
    assert len(bf & ivf4) / len(bf) >= 0.2
    ivf_all = {(r.query_id, r.neighbor_id)
               for r in ivf_topk(emb, cents, qids, k=5, nprobe=16).collect()}
    assert ivf_all == bf  # probing every cell == exact


def test_ivf_materialized_layout_prunes_and_matches(spark, tmp_path):
    """ivf_materialize writes the corpus cell-partitioned; the probe read
    (1) prunes to only the probed cells' partition directories — asserted
    on both the scan's PartitionFilters and the actual files under the
    pruned path set — and (2) returns results identical to the in-memory
    ivf_topk on the same codebook."""
    import os
    from pyspark.sql import functions as F
    from olkg.simsearch import ivf_materialize, ivf_topk, ivf_topk_materialized

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    emb = emb.withColumn("embedding",
                         F.transform("embedding", lambda x: x.cast("double")))
    cents = spark.read.parquet(
        os.path.join(os.path.dirname(entry_mod.__file__), "data",
                     "ivf_centroids.parquet"))
    path = str(tmp_path / "ivf_corpus")
    ivf_materialize(emb, cents, path)
    cells_on_disk = {d for d in os.listdir(path) if d.startswith("cell=")}
    assert len(cells_on_disk) > 4   # corpus actually spread over cells

    qids = list(range(5))
    got = ivf_topk_materialized(spark, path, cents, qids, k=5, nprobe=2)
    want = ivf_topk(emb, cents, qids, k=5, nprobe=2)
    g = {(r.query_id, r.neighbor_id, r.cos_sim, r.rank) for r in got.collect()}
    w = {(r.query_id, r.neighbor_id, r.cos_sim, r.rank) for r in want.collect()}
    assert g == w and len(g) > 0

    # pruning evidence: the probe filter reaches the scan as a PARTITION
    # filter (directory-level pruning, not row-level), and the pruned scan
    # touches fewer partition directories than exist on disk
    corpus = spark.read.parquet(path)
    probed = corpus.filter(F.col("cell").isin([0, 1]))
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed.explain(mode="formatted")
    plan = buf.getvalue()
    pf_lines = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf_lines and any("cell" in ln and "IN" in ln.upper()
                            for ln in pf_lines), plan
    # row-count agreement with the directory layout: the pruned read
    # returns exactly the rows materialized under cell=0 and cell=1
    want_rows = sum(
        spark.read.parquet(os.path.join(path, d)).count()
        for d in ("cell=0", "cell=1") if d in cells_on_disk)
    assert probed.count() == want_rows > 0


def test_ivf_materialized_query_lookup_prunes_and_queries_df(spark, tmp_path):
    """Round-4 contract extension: EVERY corpus scan in the materialized
    IVF query — the candidate scan AND the query-vector lookup — carries a
    partition filter on `cell` (via the _ids index), so total files read is
    bounded by the probed + query-home cells, never the whole corpus.  An
    explicit `queries` DataFrame skips the corpus lookup entirely and gives
    identical results for corpus-resident vectors."""
    import contextlib
    import io
    import os
    from pyspark.sql import functions as F
    from olkg.simsearch import ivf_materialize, ivf_topk, ivf_topk_materialized

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    emb = emb.withColumn("embedding",
                         F.transform("embedding", lambda x: x.cast("double")))
    cents = spark.read.parquet(
        os.path.join(os.path.dirname(entry_mod.__file__), "data",
                     "ivf_centroids.parquet"))
    path = str(tmp_path / "ivf_corpus")
    ivf_materialize(emb, cents, path)
    assert os.path.isdir(path + "/_ids")   # the id→cell index exists

    qids = list(range(5))
    got = ivf_topk_materialized(spark, path, cents, qids, k=5, nprobe=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain(mode="formatted")
    plan = buf.getvalue()
    # every scan over the cell-partitioned corpus (not the _ids index) must
    # be partition-pruned; an unpruned corpus scan = full-corpus I/O at scale
    scans = [b for b in plan.split("\n\n")
             if "Scan parquet" in b and "ivf_corpus" in b
             and "_ids" not in b]
    assert scans, plan
    for b in scans:
        pf = [ln for ln in b.splitlines() if "PartitionFilters" in ln]
        assert pf and any("cell" in ln for ln in pf), b
    # round-5 tightening: the by-id SCORING plan reads the corpus exactly
    # once (the pruned candidate scan) — the query vectors and probe pairs
    # come back from the single combined probe-selection collect as local
    # relations, not a second corpus read
    assert len(scans) == 1, plan

    # explicit-queries path: same results, corpus untouched for the lookup
    queries = emb.filter(F.col("vec_id").isin(qids))
    got_q = ivf_topk_materialized(spark, path, cents, k=5, nprobe=2,
                                  queries=queries)
    want = ivf_topk(emb, cents, qids, k=5, nprobe=2)
    as_set = lambda df: {(r.query_id, r.neighbor_id, r.cos_sim, r.rank)
                         for r in df.collect()}
    assert as_set(got) == as_set(got_q) == as_set(want)
    assert len(as_set(got)) > 0

    # misuse is an explicit error, not an empty result
    with pytest.raises(ValueError, match="query_ids or a queries"):
        ivf_topk_materialized(spark, path, cents, k=5, nprobe=2)


def test_ivf_materialized_preopened_handles_identical_and_pruned(
        spark, tmp_path):
    """Round-6: the serving read path takes pre-opened ``corpus`` /
    ``ids_index`` handles (what entry._ivf_handles caches per session) so
    repeated queries skip the per-call parquet listing + schema inference.
    Results and the pruned single-corpus-scan plan must be IDENTICAL to the
    self-opening path."""
    import contextlib
    import io
    import os
    from pyspark.sql import functions as F
    from olkg.simsearch import ivf_materialize, ivf_topk_materialized

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    emb = emb.withColumn("embedding",
                         F.transform("embedding", lambda x: x.cast("double")))
    cents = spark.read.parquet(
        os.path.join(os.path.dirname(entry_mod.__file__), "data",
                     "ivf_centroids.parquet"))
    path = str(tmp_path / "ivf_corpus")
    ivf_materialize(emb, cents, path)

    corpus = spark.read.parquet(path)
    ids = spark.read.parquet(path + "/_ids").persist()
    try:
        qids = list(range(5))
        got_h = ivf_topk_materialized(spark, path, cents, qids, k=5,
                                      nprobe=2, corpus=corpus,
                                      ids_index=ids)
        # read the STATIC plan before any action (matching the round-5
        # pruning contract test): after execution the AQE final plan prints
        # the DPP subquery as a second scan block of the same pruned scan
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            got_h.explain(mode="formatted")
        plan = buf.getvalue()
        scans = [b for b in plan.split("\n\n")
                 if "Scan parquet" in b and "ivf_corpus" in b
                 and "_ids" not in b]
        assert len(scans) == 1, plan   # one pruned candidate scan, as before
        for b in scans:
            pf = [ln for ln in b.splitlines() if "PartitionFilters" in ln]
            assert pf and any("cell" in ln for ln in pf), b

        got = ivf_topk_materialized(spark, path, cents, qids, k=5, nprobe=2)
        as_set = lambda df: {(r.query_id, r.neighbor_id, r.cos_sim, r.rank)
                             for r in df.collect()}
        assert as_set(got_h) == as_set(got) and len(as_set(got)) > 0
    finally:
        ids.unpersist()
