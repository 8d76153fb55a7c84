"""Single-process golden output: the *net effect* of the reference converter
over a whole corpus, order-independent.

The reference's Redis rendezvous (J1, lib/author.rb:50-61 etc.) makes its
per-run output order-dependent only in mechanism, not in net effect: for every
(creation, author-ref) pair where the author record exists anywhere in the
corpus, each of the author's name strings is emitted as an ``ol:author``
triple.  The LCSH lookup (J2) is a plain dictionary probe.  This module
computes that net effect with two passes over the records — the semantics the
Spark pipeline's joins must reproduce — and is the oracle for the P/R ≥ 0.95
gate (BASELINE.md).
"""

from __future__ import annotations

from . import vocab as V
from .triples import Triple, extract_line

TripleTuple = tuple  # (subj, pred, obj, obj_kind, obj_datatype)


def golden_triples(lines: list[str], lcsh: dict[str, str] | None = None
                   ) -> set[TripleTuple]:
    lcsh = lcsh or {}
    triples: set[TripleTuple] = set()
    author_names: dict[str, list[str]] = {}
    creation_refs: list[tuple[str, str]] = []
    probes: list[tuple[str, str]] = []

    for line in lines:
        res = extract_line(line)
        if res is None:
            continue
        triples.update(t.as_tuple() for t in res.triples)
        for key, name in res.author_names:
            author_names.setdefault(key, []).append(name)
        creation_refs.extend(res.creation_refs)
        probes.extend(res.probes)

    # J1 net effect: creations × author names, inner on author key
    for creation_uri, key in creation_refs:
        for name in author_names.get(key, []):
            triples.add(Triple(creation_uri, V.OL_AUTHOR, name).as_tuple())

    # J2: LCSH label probe
    for uri, label in probes:
        hit = lcsh.get(label)
        if hit:
            triples.add(Triple(uri, V.DC_SUBJECT, hit, "uri").as_tuple())

    return triples


def precision_recall(result: set, golden: set) -> tuple[float, float]:
    if not result and not golden:
        return 1.0, 1.0
    inter = len(result & golden)
    p = inter / len(result) if result else 0.0
    r = inter / len(golden) if golden else 0.0
    return p, r
