"""Port of specs/subject_spec.rb (4 examples) — single-record Subject semantics."""

from olkg import vocab as V
from olkg.triples import parse_dump_line

from conftest import (match, objects_of, read_fixture_line,  # noqa: F401
                      requires_reference, resource)

pytestmark = requires_reference

S = "subject_Word_formation.txt"


def test_identifies_subject_resource():  # subject_spec.rb:22-28
    rec = parse_dump_line(read_fixture_line(S))
    assert rec is not None and rec[0] == "/type/subject"


def test_uri_from_subject_key():  # subject_spec.rb:30-44
    uri, triples, _ = resource(S)
    assert uri == "http://openlibrary.org/subjects/Word_formation"
    assert match(triples, s=uri, p=V.RDF_TYPE, o=V.SKOS_CONCEPT)


def test_created_typed_datetime():  # subject_spec.rb:46-59
    uri, triples, _ = resource(S)
    created = [t for t in triples if t.subj == uri and t.pred == V.DC_CREATED]
    assert len(created) == 1
    assert created[0].obj == "2009-10-15T15:17:23+00:00"
    assert created[0].obj_datatype == V.XSD_DATETIME  # only typed literals


def test_modified_typed_datetime():  # subject_spec.rb:60-73
    uri, triples, _ = resource(S)
    mod = [t for t in triples if t.subj == uri and t.pred == V.DC_MODIFIED]
    assert len(mod) == 1
    assert mod[0].obj == "2009-10-15T15:17:23+00:00"
    assert mod[0].obj_datatype == V.XSD_DATETIME


def test_pref_label():
    uri, triples, _ = resource(S)
    assert match(triples, s=uri, p=V.SKOS_PREF_LABEL, o="Word formation")
