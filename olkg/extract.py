"""Extract stage: pages DataFrame → triple rows (+ join side rows).

This is the pipeline's single JVM↔Python boundary.  The per-record semantics
live in :mod:`olkg.triples` (pure Python, spec-tested); this module is only
its Arrow-batched vectorized wrapper via ``mapInPandas`` — batches stream in
as Arrow RecordBatches and rows stream out columnar, so Python is amortized
per batch, never per Spark row (the analog of the reference's 1001-record
queue, openlibrary_to_rdf.rb:35-45, minus its tail-drop bug).

Scale notes (100 TB posture):
- narrow stage: no shuffle; parallelism = input splits.  Optional
  ``repartition_by_url`` forces an xxhash64(url) redistribution when the
  input's own partitioning is skewed (north_rule's url-hash repartition).
- column pruning: only (url, html, text) are read — Catalyst prunes the rest
  from the parquet/Iceberg scan.
- the html→text inversion is audited per page ('page' rows), enforcing the
  byte-identity invariant without a second pass.
- single-pass mode (:func:`extract_triples_with_side_sink`): the UDF yields
  the big triple stream straight into the downstream shuffle and writes the
  small side rows (author names, creation refs, LCSH probes, page audits —
  a few rows per page) to a parquet side sink from inside the task, so the
  expensive Python extraction runs EXACTLY ONCE per page and the large
  intermediate is never materialized.  On a cluster the sink path must be
  shared storage — the sink is written through ``pyarrow.fs`` resolved from
  the URI in-task (hdfs://, s3a://→s3://, file://; see olkg.fsio), and the
  driver cross-checks an executor-side row census against sink visibility,
  failing loudly on a non-shared sink.  Task retries can duplicate sink files;
  every consumer is duplicate-tolerant (names/refs/probes feed joins whose
  outputs pass one dropDuplicates; page audits aggregate per distinct url).
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import vocab as V
from .pagesgen import html_to_text
from .schema import EXTRACT_SCHEMA, TRIPLES_SCHEMA
from .triples import extract_record, parse_dump_line

_COLS = ["kind", "src_type", "url", "subj", "pred", "obj", "obj_kind",
         "obj_datatype"]
_TRIPLE_COLS = ["subj", "pred", "obj", "obj_kind", "obj_datatype"]

# Triples whose predicate can ALSO be produced by the link stage's joins
# (J1 emits ol:author from the author↔creation rendezvous; editions with a
# role=="Author" contributor emit ol:author directly, lib/edition.rb:229-236;
# J2 emits dc:subject URIs, and classifications/dict-subjects emit dc:subject
# URIs directly).  In single-pass mode these are routed through the side sink
# so the directly-written edge set and the join-born edge set stay provably
# disjoint — global dedup then decomposes into two independent dedups.
_DC_SUBJECT = V.DC_SUBJECT
_OL_AUTHOR = V.OL_AUTHOR

# identifier predicates double as entity-resolution blocking keys; the sink
# carries a copy (kind='block_id') so the canonicalize stage never re-scans
# the full edge table for them (duplicates are harmless — blocking dedups)
_BLOCK_PREDS = {V.BIBO_ISBN13: "isbn13", V.BIBO_LCCN: "lccn",
                V.BIBO_OCLCNUM: "oclc"}


def _is_collision_triple(pred: str, obj_kind: str) -> bool:
    return pred == _OL_AUTHOR or (pred == _DC_SUBJECT and obj_kind == "uri")


class _Cols:
    """Columnar accumulator: per-column Python lists → pd.DataFrame(dict),
    avoiding the row-oriented list-of-tuples transpose."""

    def __init__(self, names):
        self.names = names
        self.cols = [[] for _ in names]

    def append(self, *vals):
        for c, v in zip(self.cols, vals):
            c.append(v)

    def __len__(self):
        return len(self.cols[0])

    def frame(self) -> pd.DataFrame:
        return pd.DataFrame(dict(zip(self.names, self.cols)))

    def reset(self):
        self.cols = [[] for _ in self.names]


def _make_extract_batches(triples: bool = True, sides: bool = True):
    """Batch iterator emitting the unified 8-column extract rows (durable
    path; also the two-pass fast path's building block)."""

    def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _Cols(_COLS)
            urls = pdf["url"].tolist()
            htmls = pdf["html"].tolist() if "html" in pdf else [None] * len(urls)
            texts = pdf["text"].tolist()
            for url, html, text in zip(urls, htmls, texts):
                recovered = html_to_text(bytes(html)) if html is not None else None
                line = recovered if recovered is not None else text
                rec = parse_dump_line(line) if line is not None else None
                src_type = rec[0] if rec else None
                if sides:
                    out.append("page", src_type, url, url, None,
                               "ok" if recovered == text else "mismatch",
                               None, None)
                if rec is None:
                    continue
                res = extract_record(rec[0], rec[4])
                if res is None:
                    continue
                if triples:
                    for t in res.triples:
                        out.append("triple", src_type, url, t.subj, t.pred,
                                   t.obj, t.obj_kind, t.obj_datatype)
                if sides:
                    for key, name in res.author_names:
                        out.append("author_name", src_type, url, key, None,
                                   name, None, None)
                    for creation, key in res.creation_refs:
                        out.append("creation_ref", src_type, url, creation,
                                   None, key, None, None)
                    for uri, label in res.probes:
                        out.append("probe", src_type, url, uri, None, label,
                                   None, None)
            yield out.frame()

    return _extract_batches


def extract_pages(pages: DataFrame, repartition_by_url: int | None = None,
                  triples: bool = True, sides: bool = True) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → unified extract rows
    (durable-pipeline path; the checkpoint write materializes every kind
    once, so downstream readers never re-run the UDF)."""
    cols = [c for c in ("url", "html", "text") if c in pages.columns]
    src = pages.select(*cols)
    if repartition_by_url:
        src = src.repartition(repartition_by_url, F.xxhash64("url"))
    return src.mapInPandas(_make_extract_batches(triples, sides),
                           schema=EXTRACT_SCHEMA)


# --- JVM-native html→text inversion (single-pass fast path) ----------------
# html_to_text (pagesgen.py) is substring+replace — expressible natively, so
# the fast path never ships html bytes to Python and never pays Python string
# work for the inversion; Python receives ONLY the recovered dump line.

_H_PREFIX = "<html><body><pre>"
_H_SUFFIX = "</pre></body></html>"


def _native_recovered(html_col):
    """Decoded+unescaped dump line from the html envelope, NULL when the
    envelope doesn't conform (same contract as pagesgen.html_to_text)."""
    s = F.decode(html_col, "UTF-8")
    conforms = s.startswith(_H_PREFIX) & s.endswith(_H_SUFFIX)
    body = s.substr(F.lit(len(_H_PREFIX) + 1),
                    F.length(s) - F.lit(len(_H_PREFIX) + len(_H_SUFFIX)))
    # same replace order as html_to_text: &gt; then &lt; then &amp;
    unesc = F.replace(F.replace(F.replace(body, F.lit("&gt;"), F.lit(">")),
                                F.lit("&lt;"), F.lit("<")),
                      F.lit("&amp;"), F.lit("&"))
    return F.when(html_col.isNotNull() & conforms, unesc)


def pages_to_lines(pages: DataFrame) -> DataFrame:
    """(line): the dump line per page — html inversion when possible, else
    the text column (mirrors the Python fallback in _make_extract_batches)."""
    cols = pages.columns
    if "html" in cols and "text" in cols:
        line = F.coalesce(_native_recovered(F.col("html")), F.col("text"))
    elif "html" in cols:
        line = _native_recovered(F.col("html"))
    else:
        line = F.col("text")
    return pages.select(line.alias("line"))


def audit_pages(pages: DataFrame):
    """Byte-identity audit, fully native: (pages, mismatches) row.  A page
    passes iff the html→text inversion reproduces the text column exactly
    (north_rule's per-url invariant).  One column-pruned scan, no Python."""
    recovered = _native_recovered(F.col("html"))
    ok = recovered.eqNullSafe(F.col("text"))
    return pages.agg(
        F.count(F.lit(1)).alias("pages"),
        F.sum(F.when(~ok, 1).otherwise(0)).alias("mismatches")).first()


def _make_sink_batches(side_sink: str, side_count_acc=None):
    """Single-pass batch iterator over (line) rows: yields 5-column triple
    rows; side rows (incl. collision-class triples) accumulate across the
    task's batches and are written once per task to ``side_sink``.  The
    html→text inversion and the page audit happen JVM-side
    (:func:`pages_to_lines` / :func:`audit_pages`) — Python never touches
    html bytes.

    The sink path may be a URI (``hdfs://``, ``s3a://``, ``file://``) or a
    plain path: it is resolved IN-TASK via :func:`olkg.fsio.pa_fs`
    (pyarrow), so executors write straight to shared storage — the cluster
    precondition for the fast path.  ``side_count_acc`` (a Spark
    accumulator) censuses written side rows so the driver can detect a sink
    the executors wrote but it cannot see (see :func:`read_side_rows`)."""

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from .fsio import pa_fs, pjoin

        side = _Cols(_COLS)
        for pdf in batches:
            out = _Cols(_TRIPLE_COLS)
            hots = (pdf["hot_ok"].tolist() if "hot_ok" in pdf
                    else [False] * len(pdf))
            for line, hot in zip(pdf["line"].tolist(), hots):
                rec = parse_dump_line(line) if line is not None else None
                if rec is None:
                    continue
                res = extract_record(rec[0], rec[4], skip_hot=bool(hot))
                if res is None:
                    continue
                src_type = rec[0]
                for t in res.triples:
                    if _is_collision_triple(t.pred, t.obj_kind):
                        side.append("triple", src_type, None, t.subj, t.pred,
                                    t.obj, t.obj_kind, t.obj_datatype)
                    else:
                        if t.pred in _BLOCK_PREDS:
                            side.append("block_id", src_type, None, t.subj,
                                        None,
                                        _BLOCK_PREDS[t.pred] + ":" + t.obj,
                                        None, None)
                        out.append(t.subj, t.pred, t.obj, t.obj_kind,
                                   t.obj_datatype)
                for key, name in res.author_names:
                    side.append("author_name", src_type, None, key, None,
                                name, None, None)
                for creation, key in res.creation_refs:
                    side.append("creation_ref", src_type, None, creation,
                                None, key, None, None)
                for uri, label in res.probes:
                    side.append("probe", src_type, None, uri, None, label,
                                None, None)
            yield out.frame()

        if len(side):
            tbl = pa.table(
                {n: pa.array(c, type=pa.string())
                 for n, c in zip(side.names, side.cols)})
            fs, sink_path = pa_fs(side_sink)
            fs.create_dir(sink_path, recursive=True)
            pq.write_table(
                tbl, pjoin(sink_path, f"part-{uuid.uuid4().hex}.parquet"),
                filesystem=fs, compression="zstd")
            if side_count_acc is not None:
                side_count_acc.add(len(side))

    return _batches


def extract_triples_with_side_sink(pages: DataFrame, side_sink: str,
                                   repartition_by_url: int | None = None,
                                   side_count_acc=None,
                                   native_hot: bool = False) -> DataFrame:
    """Single-pass extraction: returns the (non-collision) triple stream;
    side rows land in ``side_sink`` when the returned stream is executed.
    The caller MUST run an action on the stream before reading the sink.
    The page audit is NOT part of this stream — use :func:`audit_pages`.
    Pass a Spark accumulator as ``side_count_acc`` to census side rows
    written (feeds the empty-sink guard in :func:`read_side_rows`).

    ``native_hot`` (default OFF — measured slower, see olkg.nativex's
    module docstring for the A/B) emits the high-volume structured edition
    fields as pure Catalyst variant expressions (olkg.nativex) and tells
    the Python UDF to skip them per conforming record — the hybrid union
    is triple-identical to the all-Python path (tests/test_nativex.py).
    Hot fields never produce collision-class or blocking-key predicates,
    so the side-sink routing and the disjoint-dedup decomposition are
    unaffected either way."""
    src = pages
    if repartition_by_url:
        src = src.repartition(repartition_by_url, F.xxhash64("url"))
    lines = pages_to_lines(src)
    if not native_hot:
        return lines.mapInPandas(
            _make_sink_batches(side_sink, side_count_acc),
            schema=TRIPLES_SCHEMA)
    from .nativex import edition_hot_triples, hot_ok_col

    flagged = lines.withColumn("hot_ok", hot_ok_col(F.col("line")))
    py_stream = flagged.mapInPandas(
        _make_sink_batches(side_sink, side_count_acc), schema=TRIPLES_SCHEMA)
    return py_stream.unionByName(edition_hot_triples(lines))


def read_side_rows(spark, side_sink: str,
                   expected_rows: int | None = None) -> DataFrame:
    """Read the side sink written by :func:`extract_triples_with_side_sink`
    (EXTRACT_SCHEMA-shaped; empty DataFrame if the sink has no files).

    Existence checks go through Spark's Hadoop FileSystem (scheme-aware),
    so URI sinks work wherever Spark itself can read them.  When
    ``expected_rows`` (the side-row accumulator's value) is positive, this
    raises unless the visible sink holds AT LEAST that many rows — a sink
    that is missing entirely OR undercounts is the signature of executors
    writing to storage the driver cannot fully see (e.g. executor-local
    disks on a multi-node cluster with a local-path sink, where the
    driver-colocated executor's files ARE visible and an existence check
    alone passes), which would otherwise silently drop join-born edges,
    block_ids and the canonical map.  ``visible >= expected`` is the sound
    direction: the accumulator counts each successful task exactly once,
    and task retries can only ADD files to the sink, never remove them."""
    from . import fsio

    names = fsio.listdir(spark, side_sink)
    has_files = any(n.endswith(".parquet") for n in names)
    if not has_files:
        if expected_rows:
            raise RuntimeError(
                f"side sink {side_sink!r} is empty but executors reported "
                f"writing {expected_rows} side rows — the sink is not on "
                "storage shared between executors and driver. Point "
                "--out/side_sink at shared storage (HDFS/S3/NFS) for "
                "multi-node runs.")
        return spark.createDataFrame([], EXTRACT_SCHEMA)
    sides = spark.read.schema(EXTRACT_SCHEMA).parquet(side_sink)
    if expected_rows:
        visible = sides.count()
        if visible < expected_rows:
            raise RuntimeError(
                f"side sink {side_sink!r} holds {visible} rows but "
                f"executors reported writing {expected_rows} — part of the "
                "sink is on storage the driver cannot see (e.g. an "
                "executor-local path on a multi-node cluster). Point "
                "--out/side_sink at shared storage (HDFS/S3/NFS).")
    return sides
