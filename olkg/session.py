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
        # AQE coalesce target: the 64m default collapses bench-scale shuffles
        # to 1-2 post-shuffle partitions, serializing reduce stages however
        # many cores exist (measured: 2m cut the 8-core e2e wall ~30%).  At
        # genuine cluster scale set this back up via the env var.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("OLKG_ADVISORY_PARTITION_BYTES", "2m"))
        # stage-table codec: every byte written to a stage table traverses
        # the storage/memory path twice (write + downstream read); zstd
        # roughly halves parquet bytes vs snappy at a CPU cost that — unlike
        # bandwidth — actually scales with executors.  At 10^12 rows the
        # stage tables are the dominant I/O, so the compression/CPU trade
        # leans further toward zstd the larger the cluster; keep snappy only
        # when local scratch bandwidth is free and CPUs are the constraint.
        .config("spark.sql.parquet.compression.codec",
                os.environ.get("OLKG_PARQUET_CODEC", "snappy"))
    )
    # Shuffle/spill scratch: on a real cluster this is per-executor local SSD
    # whose aggregate bandwidth scales with the node count; this sandbox has
    # ONE shared disk, which would serialize every run's shuffle I/O behind a
    # fixed device.  tmpfs (RAM-backed) models the per-node-scaling scratch
    # in the sandbox — but RAM-backed shuffle competes with heap/page cache
    # and can ENOSPC/OOM a big corpus run, so it is OPT-IN
    # (OLKG_TMPFS_SCRATCH=1, used by the bench harnesses), not the default
    # for every consumer of build_session.  OLKG_LOCAL_DIR overrides either
    # way.
    # extra driver JVM flags (local mode: the driver IS the executor).
    # Motivating case: -XX:+AlwaysPreTouch faults the whole heap in at JVM
    # startup — on hosts with slow/oversubscribed page backing,
    # demand-faulting heap pages DURING shuffle phases serializes task
    # threads in kernel page-fault handling; pre-touching converts that to
    # a one-time sequential startup cost.  Only set when the env var is
    # non-empty so an unset var does not clobber extraJavaOptions coming
    # from spark-defaults.conf.
    java_opts = os.environ.get("OLKG_DRIVER_JAVA_OPTS", "")
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    local_dir = os.environ.get("OLKG_LOCAL_DIR")
    if (local_dir is None
            and os.environ.get("OLKG_TMPFS_SCRATCH") == "1"
            and os.path.isdir("/dev/shm")):
        local_dir = "/dev/shm/olkg-spark-local"
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    if shuffle_partitions is None:
        # default: match default parallelism at local scale; clusters should
        # set this explicitly (≈ 2-3x total cores)
        shuffle_partitions = int(os.environ.get("OLKG_SHUFFLE_PARTITIONS", "32"))
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
