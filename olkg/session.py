"""SparkSession construction with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "olkg",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_size: int = 10_000,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build a SparkSession tuned for the KG pipeline.

    Defaults chosen for the pipeline's shape (one narrow Arrow-UDF stage,
    two wide join/dedup stages):

    - AQE on, incl. skew-join splitting — the author rendezvous join (J1) is
      skew-prone under web-duplicate key distributions (SURVEY.md §4);
      explicit salting in olkg.link complements this.
    - Arrow enabled with a bounded batch size: the extract UDF is the only
      JVM↔Python boundary, amortized per batch (the analog of the
      reference's 1001-record micro-batch, openlibrary_to_rdf.rb:35).
    """
    master = master or os.environ.get("OLKG_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_size))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("OLKG_DRIVER_MEM", "8g"))
        # input split sizing: the default 128 MB coalesces a medium local
        # corpus into fewer splits than cores, serializing the extract stage;
        # 16 MB keeps scan parallelism ≥ cores at bench scale while remaining
        # a no-op for genuinely large inputs
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("OLKG_MAX_PARTITION_BYTES", "16m"))
        .config("spark.sql.files.openCostInBytes", "1m")
    )
    if shuffle_partitions is None:
        # default: match default parallelism at local scale; clusters should
        # set this explicitly (≈ 2-3x total cores)
        shuffle_partitions = int(os.environ.get("OLKG_SHUFFLE_PARTITIONS", "32"))
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
