"""Canonicalize stage: dedup (A4) + identifier-blocked entity resolution.

The reference never deduplicates its output (the same ISBN arriving via both
``isbn_10`` and ``isbn_13`` emits duplicate statements) — the comparison set
is the *deduplicated* (s,p,o) set (SURVEY.md §2.7 A4), so dedup is the first
step here.

Entity canonicalization (north_star): editions/works that denote the same
entity are clustered by **blocking keys** —

- normalized ISBN-13 (``bibo:isbn13``), LCCN (``bibo:lccn``),
  OCLC (``bibo:oclcnum``): exact identifier blocks;
- author name MinHash band signatures: fuzzy name blocks.

Within the bipartite (entity, block-key) graph, connected components are
computed by hash-min label propagation — alternating min-aggregations over the
two sides until a fixpoint.  Blocks are tiny after blocking, so convergence is
fast (diameter of the identifier co-occurrence graph), and every iteration is
two shuffles on (key) / (entity) — no driver-side state, no GraphFrames
dependency.  The canonical id of a cluster is its lexicographically smallest
member URI (deterministic across runs and cluster sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import vocab as V


def dedup_edges(triples: DataFrame) -> DataFrame:
    """A4: distinct (subj, pred, obj, obj_kind, obj_datatype).  Spark plans
    this as a hash-partitioned aggregate with map-side partial dedup."""
    return triples.dropDuplicates(["subj", "pred", "obj", "obj_kind",
                                   "obj_datatype"])


_ID_PREDS = {
    V.BIBO_ISBN13: "isbn13",
    V.BIBO_LCCN: "lccn",
    V.BIBO_OCLCNUM: "oclc",
}


def blocking_keys(edges: DataFrame, author_names: DataFrame | None = None,
                  minhash_bands: int = 4, band_rows: int = 2) -> DataFrame:
    """(entity, block_key) pairs.

    Identifier keys come straight off the deduped edge table (already
    normalized by the extract semantics: ISBN cleanup/convert, LCCN strip,
    OCLC digits-only).  Author fuzzy keys are MinHash band signatures over
    character 3-grams of each name (vectorized, see _minhash_band_udf)."""
    pred_map = F.create_map(*[F.lit(x) for kv in _ID_PREDS.items() for x in kv])
    ids = (edges.filter(F.col("pred").isin(list(_ID_PREDS)))
           .select(F.col("subj").alias("entity"),
                   F.concat_ws(":", pred_map[F.col("pred")],
                               F.col("obj")).alias("block_key")))
    if author_names is None:
        return ids
    bands = _author_name_bands(author_names, minhash_bands, band_rows)
    return ids.unionByName(bands)


def _author_name_bands(author_names: DataFrame, num_bands: int,
                       band_rows: int) -> DataFrame:
    """MinHash-LSH band keys for author names: shingle each name into char
    3-grams, take per-permutation min hashes, group into bands; two names
    sharing any band land in one block."""
    import hashlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    n_perm = num_bands * band_rows

    # note: no type hints — `from __future__ import annotations` would turn
    # them into strings pyspark can't resolve; returnType carries the schema
    @pandas_udf(ArrayType(StringType()))
    def bands_udf(names):
        out = []
        for name in names:
            if not name:
                out.append([])
                continue
            s = "".join(ch.lower() for ch in name if ch.isalnum())
            grams = {s[i:i + 3] for i in range(max(1, len(s) - 2))}
            mins = []
            for p in range(n_perm):
                best = None
                for g in grams:
                    h = int.from_bytes(
                        hashlib.blake2b(f"{p}|{g}".encode(),
                                        digest_size=8).digest(), "big")
                    if best is None or h < best:
                        best = h
                mins.append(best or 0)
            out.append([
                f"nameband:{b}:" + hashlib.blake2b(
                    "|".join(str(m) for m in
                             mins[b * band_rows:(b + 1) * band_rows]).encode(),
                    digest_size=8).hexdigest()
                for b in range(num_bands)
            ])
        return pd.Series(out)

    per_author = (author_names
                  .select(F.col("author_key"), F.col("name"))
                  .dropDuplicates())
    return (per_author
            .withColumn("band", F.explode(bands_udf(F.col("name"))))
            .select(F.concat(F.lit(V.URI_PREFIX),
                             F.col("author_key")).alias("entity"),
                    F.col("band").alias("block_key"))
            .dropDuplicates())


def connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Hash-min label propagation over the bipartite (entity, block_key)
    graph.  Returns (entity, canonical_id) for every entity that has at least
    one block key.  Converges in O(component diameter) iterations; each
    iteration is two key-partitioned aggregations."""
    pairs = pairs.dropDuplicates(["entity", "block_key"]).cache()
    labels = pairs.select("entity").distinct() \
                  .withColumn("label", F.col("entity"))
    for _ in range(max_iter):
        # key side: min label among the key's entities
        key_min = (pairs.join(labels, "entity")
                   .groupBy("block_key")
                   .agg(F.min("label").alias("key_label")))
        # entity side: min over its keys' labels (and its own)
        new_labels = (pairs.join(key_min, "block_key")
                      .groupBy("entity")
                      .agg(F.min("key_label").alias("prop_label"))
                      .join(labels, "entity")
                      .select("entity",
                              F.least("prop_label", "label").alias("new_label"),
                              "label"))
        changed = new_labels.filter(F.col("new_label") != F.col("label")).limit(1)
        labels_next = new_labels.select("entity",
                                        F.col("new_label").alias("label"))
        if changed.count() == 0:
            labels = labels_next
            break
        labels = labels_next.cache()
    pairs.unpersist()
    return labels.withColumnRenamed("label", "canonical_id")


def canonical_map(edges: DataFrame, author_names: DataFrame | None = None
                  ) -> DataFrame:
    """(entity, canonical_id) for all entities resolvable via blocking keys;
    entities not in any block are their own canonical id (left out of the map
    — consumers treat absence as identity)."""
    return connected_components(blocking_keys(edges, author_names))


def sameas_edges_from_map(cmap: DataFrame) -> DataFrame:
    """owl:sameAs edges materializing non-trivial cluster memberships."""
    return (cmap.filter(F.col("entity") != F.col("canonical_id"))
            .select(F.col("entity").alias("subj"),
                    F.lit(V.OWL_SAME_AS).alias("pred"),
                    F.col("canonical_id").alias("obj"),
                    F.lit("uri").alias("obj_kind"),
                    F.lit(None).cast("string").alias("obj_datatype")))
