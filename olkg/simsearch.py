"""Similarity search over an embedding column (array<float|double>).

Brute-force cosine top-k is the verifiable baseline (dot products in native
``aggregate``/``zip_with`` expressions — JVM-side, no Python); the LSH-bucketed
variant is the scale path: random-hyperplane signatures shrink the candidate
set from N to a bucket, turning the O(N·Q) cross join into a bucket-partitioned
join.  Hyperplanes are derived deterministically from xxhash64 so results are
reproducible without RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk_bruteforce(embeddings: DataFrame, query_ids: list[int],
                           k: int = 5, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query id against the full table.
    (query_id, neighbor_id, cos_sim rounded to 4dp, rank).  The query side is
    tiny → broadcast; the corpus side streams, so this scales with corpus
    size × |queries| and never shuffles the corpus."""
    q = (embeddings.filter(F.col(id_col).isin(query_ids))
         .select(F.col(id_col).alias("query_id"),
                 F.col(vec_col).alias("qv")))
    c = embeddings.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("cv"))
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id"))
    sim = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    scored = pairs.select("query_id", "neighbor_id",
                          F.round(sim, 4).alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _hyperplane_sign(vec_col, plane: int, dim: int):
    """Deterministic pseudo-random hyperplane: component j's weight is ±1 by
    parity of xxhash64(plane, j); sign of <v, h> is the signature bit."""
    weights = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.when(
            F.pmod(F.xxhash64(F.concat(F.lit(f"p{plane}|"),
                                       j.cast("string"))), F.lit(2)) == 0,
            F.lit(1.0)).otherwise(F.lit(-1.0)))
    return (_dot(vec_col, weights) > 0).cast("int")


def lsh_signatures(embeddings: DataFrame, num_planes: int = 8,
                   num_tables: int = 4, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   dim: int | None = None) -> DataFrame:
    """(id, bucket): multi-table random-hyperplane LSH (OR-construction).
    Each of ``num_tables`` tables hashes with its own ``num_planes``
    hyperplanes; a vector emits one bucket per table, and any shared bucket
    makes a candidate pair — the standard recall/selectivity trade."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    buckets = []
    for t in range(num_tables):
        bits = [_hyperplane_sign(F.col(vec_col), t * 1000 + p, dim)
                .cast("string") for p in range(num_planes)]
        buckets.append(F.concat_ws("", F.lit(f"t{t}:"), *bits))
    return embeddings.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(*buckets)).alias("bucket"))


def cosine_topk_lsh(embeddings: DataFrame, query_ids: list[int], k: int = 5,
                    num_planes: int = 8, num_tables: int = 4,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: restrict the brute-force scoring to same-bucket candidates
    across the LSH tables.  Same schema as the brute-force variant;
    recall < 1 by design (tested against brute force)."""
    sig = lsh_signatures(embeddings, num_planes, num_tables, id_col, vec_col)
    emb_b = embeddings.join(sig.withColumnRenamed("id", id_col), id_col)
    q = (emb_b.filter(F.col(id_col).isin(query_ids))
         .select(F.col(id_col).alias("query_id"),
                 F.col(vec_col).alias("qv"), "bucket"))
    c = emb_b.select(F.col(id_col).alias("neighbor_id"),
                     F.col(vec_col).alias("cv"), "bucket")
    pairs = (c.join(F.broadcast(q), "bucket")
             .filter(F.col("neighbor_id") != F.col("query_id"))
             .select("query_id", "neighbor_id", "qv", "cv").distinct())
    sim = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    scored = pairs.select("query_id", "neighbor_id",
                          F.round(sim, 4).alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
