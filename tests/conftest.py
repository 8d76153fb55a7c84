"""Shared test helpers.

The semantic tests port the reference's RSpec suite 1:1
(specs/{author,edition,work,subject}_spec.rb — 64 examples) against the same
20 golden fixture lines in /root/reference/specs/data.  They run the pure
Python extractor (olkg.triples) — the same code the Spark UDF wraps — so no
cluster is needed (mirrors the reference's own spec entry point
line_to_resource, specs/edition_spec.rb:10-20).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import pytest

from olkg.triples import MemoryKV, extract_line

REF_DATA = Path("/root/reference/specs/data")

requires_reference = pytest.mark.skipif(
    not REF_DATA.exists(), reason="reference fixture corpus not available"
)


def read_fixture_line(name: str) -> str:
    """Last line of a fixture file (the specs loop to the last line)."""
    line = None
    with open(REF_DATA / name, encoding="utf-8") as f:
        for raw in f:
            line = raw
    assert line is not None
    return line


def resource(name: str, db: MemoryKV | None = None):
    """Port of resource_from_file + parse_data: returns (uri, triples, result)."""
    line = read_fixture_line(name)
    res = extract_line(line, db=db)
    assert res is not None
    data = json.loads(line.split("\t")[4])
    uri = "http://openlibrary.org" + data.get("key", "")
    return uri, res.triples, res


def match(triples, s=None, p=None, o=None, kind=None):
    """Triple-pattern set-membership, mirroring match_triples
    (specs/edition_spec.rb:43-65): None = wildcard."""
    for t in triples:
        if s is not None and t.subj != s:
            continue
        if p is not None and t.pred != p:
            continue
        if o is not None and t.obj != o:
            continue
        if kind is not None and t.obj_kind != kind:
            continue
        return True
    return False


def objects_of(triples, s, p):
    return [t.obj for t in triples if t.subj == s and t.pred == p]


def follow_author_list(triples, head):
    """Walk an rdf:first/rdf:rest cons list from its head bnode, mirroring
    follow_list (specs/edition_spec.rb:31-41).  Returns the ordered member
    list."""
    from olkg import vocab as V

    members = []
    node = head
    seen = set()
    while node != V.RDF_NIL:
        assert node.startswith("_:"), f"list cell {node} is not a bnode"
        assert node not in seen, "cycle in author list"
        seen.add(node)
        first = objects_of(triples, node, V.RDF_FIRST)
        rest = objects_of(triples, node, V.RDF_REST)
        assert len(first) == 1 and len(rest) == 1
        members.append(first[0])
        node = rest[0]
    return members


@pytest.fixture(scope="session")
def spark():
    """local-mode SparkSession for integration tests."""
    pyspark = pytest.importorskip("pyspark")
    from olkg.session import build_session

    spark = build_session(app_name="olkg-tests", master="local[4]",
                          shuffle_partitions=8)
    yield spark
    spark.stop()
