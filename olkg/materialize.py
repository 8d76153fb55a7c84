"""Materialize stage: checkpointed stage tables, nodes/edges graph tables,
N-Triples export, per-partition lineage metrics, idempotent resume.

Storage format is pluggable: parquet everywhere in this sandbox; on a cluster
with an Iceberg catalog, pass ``table_format='iceberg'`` and stage outputs go
through ``writeTo(...).createOrReplace()`` instead (same logical layout).

Resume contract (north_rule): every stage writes to ``<out>/<stage>/`` with a
``_SUCCESS`` marker; a re-run skips any stage whose marker exists and reads
the checkpoint instead, so a killed run resumes from the last completed stage
and reproduces the identical triple set (blank-node labels are deterministic,
olkg.util.det_bnode).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fsio
from . import vocab as V
from .fsio import pjoin
from .schema import LINEAGE_SCHEMA


def _stage_path(out_dir: str, stage: str) -> str:
    return pjoin(out_dir, stage)


def stage_complete(out_dir: str, stage: str) -> bool:
    """Checked through the Hadoop FS of the ACTIVE session, so resume
    markers work on any storage Spark can reach (file/hdfs/s3a), not only
    the driver's local filesystem."""
    spark = SparkSession.getActiveSession()
    return fsio.exists(spark, pjoin(_stage_path(out_dir, stage), "_SUCCESS"))


def write_stage(df: DataFrame, out_dir: str, stage: str,
                partition_by: list[str] | None = None,
                table_format: str = "parquet",
                mode: str = "overwrite",
                catalog: str = "olkg") -> None:
    """Write one stage table.  ``table_format='iceberg'`` targets a
    configured Iceberg catalog via the DataFrameWriterV2 API and honors
    ``partition_by`` (identity transforms) and ``mode`` ('overwrite' →
    createOrReplace, 'append' → append); parquet is the sandbox default."""
    if table_format == "iceberg":
        writer_v2 = df.writeTo(f"{catalog}.{stage}")
        if mode == "append":
            # appends inherit the existing table's partition spec
            writer_v2.append()
        else:
            if partition_by:
                writer_v2 = writer_v2.partitionedBy(
                    *[F.col(c) for c in partition_by])
            writer_v2.createOrReplace()
        return
    path = _stage_path(out_dir, stage)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def read_stage(spark: SparkSession, out_dir: str, stage: str) -> DataFrame:
    return spark.read.parquet(_stage_path(out_dir, stage))


def append_lineage(spark: SparkSession, out_dir: str, run_id: str, stage: str,
                   df: DataFrame, wall_ms: int,
                   detail: str | None = None) -> None:
    """Per-partition lineage rows for a completed stage: the checkpointed
    evidence of what each partition produced (north_rule's lineage+metrics).
    Reads the stage's own checkpoint so counting costs one column scan.
    ``detail`` (optional JSON string) records stage-level contracts on the
    lineage row itself — e.g. the postwrite-dedup retention census
    (raw == kept + dropped), so a resumed run can prove the raw-table
    reclaim was verified without the original driver's metrics dict."""
    per_part = (df.groupBy(F.spark_partition_id().alias("partition_id"))
                .agg(F.count(F.lit(1)).alias("rows_out"))
                .select(F.lit(run_id).alias("run_id"),
                        F.lit(stage).alias("stage"),
                        F.col("partition_id").cast("long"),
                        F.col("rows_out").cast("long"),
                        F.lit(wall_ms).cast("long").alias("wall_ms"),
                        F.lit(detail).cast("string").alias("detail")))
    per_part.write.mode("append").parquet(pjoin(out_dir, "lineage"))


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    path = pjoin(out_dir, "lineage")
    if not fsio.exists(spark, path):
        return spark.createDataFrame([], LINEAGE_SCHEMA)
    return spark.read.parquet(path)


def build_nodes(edges: DataFrame) -> DataFrame:
    """Canonical node table: every URI/bnode appearing as subject or object,
    with its rdf:type when asserted (entity class: foaf:Agent / bibo:Book /
    frbr:Work / skos:Concept / ...)."""
    subs = edges.select(F.col("subj").alias("id"))
    objs = (edges.filter(F.col("obj_kind").isin("uri", "bnode"))
            .select(F.col("obj").alias("id")))
    ids = subs.unionByName(objs).distinct()
    types = (edges.filter(F.col("pred") == V.RDF_TYPE)
             .groupBy("subj").agg(F.min("obj").alias("node_type"))
             .withColumnRenamed("subj", "id"))
    return (ids.join(types, "id", "left")
            .withColumn("is_bnode", F.col("id").startswith("_:")))


# --- N-Triples export (K1: openlibrary_to_rdf.rb:22,40-42) ------------------

def ntriples_lines(edges: DataFrame) -> DataFrame:
    """Deterministic N-Triples formatting as a single-column DataFrame.
    Escaping per the N-Triples grammar: backslash, quote, \\n, \\r, \\t."""
    def esc(col):
        c = F.regexp_replace(col, r"\\", r"\\\\")
        c = F.regexp_replace(c, '"', r'\\"')
        c = F.regexp_replace(c, "\n", r"\\n")
        c = F.regexp_replace(c, "\r", r"\\r")
        c = F.regexp_replace(c, "\t", r"\\t")
        return c

    subj_t = F.when(F.col("subj").startswith("_:"), F.col("subj")) \
              .otherwise(F.concat(F.lit("<"), F.col("subj"), F.lit(">")))
    obj_t = (F.when(F.col("obj_kind") == "uri",
                    F.concat(F.lit("<"), F.col("obj"), F.lit(">")))
             .when(F.col("obj_kind") == "bnode", F.col("obj"))
             .when(F.col("obj_datatype").isNotNull(),
                   F.concat(F.lit('"'), esc(F.col("obj")),
                            F.lit('"^^<'), F.col("obj_datatype"), F.lit(">")))
             .otherwise(F.concat(F.lit('"'), esc(F.col("obj")), F.lit('"'))))
    return edges.select(
        F.concat(subj_t, F.lit(" <"), F.col("pred"), F.lit("> "), obj_t,
                 F.lit(" .")).alias("value"))


def export_ntriples_gz(edges: DataFrame, path: str,
                       dated_single_file: bool = False,
                       date: str | None = None) -> None:
    """Gzipped N-Triples export.  Default: a directory of part files (the
    scalable layout).  ``dated_single_file`` reproduces the reference's
    ``openlibrary-YYYY-MM-DD.nt.gz`` convention (openlibrary_to_rdf.rb:22)
    by coalescing to one partition and renaming the part file — parity mode
    for modest outputs, not the 100-TB path."""
    df = ntriples_lines(edges)
    if dated_single_file:
        df = df.coalesce(1)
    (df.write.mode("overwrite")
     .option("compression", "gzip")
     .text(path))
    if dated_single_file:
        if date is None:
            date = time.strftime("%Y-%m-%d")
        spark = SparkSession.getActiveSession()
        part = [f for f in fsio.listdir(spark, path)
                if f.startswith("part-") and f.endswith(".gz")]
        if part:
            fsio.rename(spark, pjoin(path, part[0]),
                        pjoin(path, f"openlibrary-{date}.nt.gz"))
