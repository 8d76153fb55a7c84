"""Spark schemas for every table the pipeline touches."""

from pyspark.sql.types import (BinaryType, BooleanType, LongType, StringType,
                               StructField, StructType, TimestampType)

# Input: Common-Crawl-style pages (BASELINE.json input_hint)
PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

# Output of the extract stage: one unified row stream, discriminated by `kind`
#   kind = 'triple'       → subj/pred/obj[/obj_kind/obj_datatype] populated
#   kind = 'probe'        → subj=entity uri, obj=normalized subject label (J2 input)
#   kind = 'author_name'  → subj=author key, obj=name string (J1 build side)
#   kind = 'creation_ref' → subj=creation uri, obj=author key (J1 probe side)
#   kind = 'page'         → subj=url, obj='ok'|'mismatch' (byte-identity audit)
EXTRACT_SCHEMA = StructType([
    StructField("kind", StringType(), False),
    StructField("src_type", StringType(), True),
    StructField("url", StringType(), True),
    StructField("subj", StringType(), True),
    StructField("pred", StringType(), True),
    StructField("obj", StringType(), True),
    StructField("obj_kind", StringType(), True),
    StructField("obj_datatype", StringType(), True),
])

# Canonical edge table (A4-deduplicated triples)
TRIPLES_SCHEMA = StructType([
    StructField("subj", StringType(), False),
    StructField("pred", StringType(), False),
    StructField("obj", StringType(), False),
    StructField("obj_kind", StringType(), False),
    StructField("obj_datatype", StringType(), True),
])

# LCSH label → URI dimension (lib/util.rb:25-34 replacement)
LCSH_SCHEMA = StructType([
    StructField("label", StringType(), False),
    StructField("uri", StringType(), False),
])

# Per-partition lineage/metrics checkpoint rows (north_rule)
LINEAGE_SCHEMA = StructType([
    StructField("run_id", StringType(), False),
    StructField("stage", StringType(), False),
    StructField("partition_id", LongType(), True),
    StructField("rows_out", LongType(), True),
    StructField("wall_ms", LongType(), True),
    StructField("detail", StringType(), True),
])
