"""Extract stage: pages DataFrame → unified extract-row DataFrame.

This is the pipeline's single JVM↔Python boundary.  The per-record semantics
live in :mod:`olkg.triples` (pure Python, spec-tested); this module is only
its Arrow-batched vectorized wrapper via ``mapInPandas`` — batches stream in
as Arrow RecordBatches and triple rows stream out columnar, so Python is
amortized per batch, never per Spark row (the analog of the reference's
1001-record queue, openlibrary_to_rdf.rb:35-45, minus its tail-drop bug).

Scale notes (100 TB posture):
- narrow stage: no shuffle; parallelism = input splits.  Optional
  ``repartition_by_url`` forces an xxhash64(url) redistribution when the
  input's own partitioning is skewed (north_rule's url-hash repartition).
- column pruning: only (url, html, text) are read — Catalyst prunes the rest
  from the parquet/Iceberg scan.
- the html→text inversion is audited per page ('page' rows), enforcing the
  byte-identity invariant without a second pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagesgen import html_to_text
from .schema import EXTRACT_SCHEMA
from .triples import extract_line, parse_dump_line

_COLS = ["kind", "src_type", "url", "subj", "pred", "obj", "obj_kind",
         "obj_datatype"]


def _make_extract_batches(triples: bool = True, sides: bool = True):
    """Batch-iterator factory.  ``triples``/``sides`` select which row kinds
    the pass emits — the two-pass fast pipeline runs one sides-only pass
    (tiny output, persisted) and one triples-only pass (streamed straight
    into the dedup shuffle), trading one extra narrow scan for never
    materializing the big intermediate."""

    def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            urls = pdf["url"].tolist()
            htmls = pdf["html"].tolist() if "html" in pdf else [None] * len(urls)
            texts = pdf["text"].tolist()
            for url, html, text in zip(urls, htmls, texts):
                # byte-identity audit: html→text must reproduce `text` exactly
                recovered = html_to_text(bytes(html)) if html is not None else None
                line = recovered if recovered is not None else text
                ok = "ok" if recovered == text else "mismatch"
                rec = parse_dump_line(line) if line is not None else None
                src_type = rec[0] if rec else None
                if sides:
                    out.append(("page", src_type, url, url, None, ok, None,
                                None))
                if line is None:
                    continue
                res = extract_line(line)
                if res is None:
                    continue
                if triples:
                    for t in res.triples:
                        out.append(("triple", src_type, url, t.subj, t.pred,
                                    t.obj, t.obj_kind, t.obj_datatype))
                if sides:
                    for key, name in res.author_names:
                        out.append(("author_name", src_type, url, key, None,
                                    name, None, None))
                    for creation, key in res.creation_refs:
                        out.append(("creation_ref", src_type, url, creation,
                                    None, key, None, None))
                    for uri, label in res.probes:
                        out.append(("probe", src_type, url, uri, None, label,
                                    None, None))
            yield pd.DataFrame(out, columns=_COLS)

    return _extract_batches


def extract_pages(pages: DataFrame, repartition_by_url: int | None = None,
                  triples: bool = True, sides: bool = True) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → extract rows."""
    cols = [c for c in ("url", "html", "text") if c in pages.columns]
    src = pages.select(*cols)
    if repartition_by_url:
        src = src.repartition(repartition_by_url, F.xxhash64("url"))
    return src.mapInPandas(_make_extract_batches(triples, sides),
                           schema=EXTRACT_SCHEMA)
