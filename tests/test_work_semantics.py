"""Port of specs/work_spec.rb (10 examples) — single-record Work semantics."""

from olkg import vocab as V
from olkg.triples import MemoryKV, parse_dump_line

from conftest import (follow_author_list, match, objects_of,  # noqa: F401
                      read_fixture_line, requires_reference, resource)

pytestmark = requires_reference

W_119 = "work_OL11928803W.txt"
W_100 = "work_OL1005131W.txt"
W_250 = "work_OL2506185W.txt"
W_001 = "work_OL100126W.txt"


def test_identifies_work_resource():  # work_spec.rb:65-71
    rec = parse_dump_line(read_fixture_line(W_119))
    assert rec is not None and rec[0] == "/type/work"


def test_uri_from_work_key():  # work_spec.rb:73-87
    uri, triples, _ = resource(W_119)
    assert uri == "http://openlibrary.org/works/OL11928803W"
    assert match(triples, s=uri, p=V.RDF_TYPE, o=V.FRBR_WORK)


def test_title():  # work_spec.rb:89-95
    uri, triples, _ = resource(W_100)
    assert match(triples, s=uri, p=V.RDA_TITLE_PROPER, o="Os pobres da cidade")
    assert match(triples, s=uri, p=V.DC_TITLE,
                 o="Os pobres da cidade; vida e trabalho, 1880-1920")
    assert match(triples, s=uri, p=V.RDA_OTHER_TITLE_INFORMATION,
                 o="vida e trabalho, 1880-1920")


def test_first_publish_date():  # work_spec.rb:97-101
    uri, triples, _ = resource(W_119)
    assert match(triples, s=uri, p=V.DC_CREATED, o="2004")


def test_authors_and_author_list():  # work_spec.rb:103-134
    db = MemoryKV()
    uri, triples, _ = resource(W_250, db=db)
    authors = ["http://openlibrary.org/authors/OL352128A",
               "http://openlibrary.org/authors/OL6893618A"]
    for a in authors:
        assert match(triples, s=uri, p=V.DC_CREATOR, o=a, kind="uri")
        # work-only: (author, foaf:made, work) — lib/work.rb:70
        assert match(triples, s=a, p=V.FOAF_MADE, o=uri, kind="uri")
    heads = objects_of(triples, uri, V.BIBO_AUTHOR_LIST)
    assert len(heads) == 1 and heads[0].startswith("_:")
    assert follow_author_list(triples, heads[0]) == authors
    assert uri in db.get("/authors/OL352128A")
    assert uri in db.get("/authors/OL6893618A")


def test_subjects_with_lcsh():  # work_spec.rb:136-166
    db = MemoryKV()
    lcsh = {
        "Sociology, Urban": "http://id.loc.gov/authorities/subjects/sh85124233",
        "City and town life": "http://id.loc.gov/authorities/subjects/sh85026255",
        "History": "http://id.loc.gov/authorities/subjects/sh85061212",
        "Social conditions": "http://id.loc.gov/authorities/subjects/sh2001008850",
        "Canada": "http://id.loc.gov/authorities/names/n79007233",
        "Québec (Province)": "http://id.loc.gov/authorities/names/n80001244",
    }
    for k, v in lcsh.items():
        db.set(k, v)
    uri, triples, _ = resource(W_119, db=db)
    subjects = {"City and town life", "History", "Social conditions",
                "Sociology, Urban", "Urban Sociology", "To 1763",
                "To 1763 (New France)", "Canada", "Québec (Province)"}
    got = set(objects_of(triples, uri, V.DC11_SUBJECT))
    assert got == subjects
    dc_subjects = {o for o in objects_of(triples, uri, V.DC_SUBJECT)
                   if "stores/openlibrary/items/" not in o}
    assert dc_subjects == set(lcsh.values())


def test_description():  # work_spec.rb:168-172
    uri, triples, _ = resource(W_001)
    descs = objects_of(triples, uri, V.DC_DESCRIPTION)
    assert len(descs) == 1
    assert descs[0].startswith("After Cuno Masseys business partner")
    assert descs[0].endswith("kidnapped a young Chinese woman")


def test_lc_classification():  # work_spec.rb:174-178
    uri, triples, _ = resource(W_250)
    node = "http://api.talis.com/stores/openlibrary/items/lcc/LB1131+.B4#class"
    assert match(triples, s=uri, p=V.DC_SUBJECT, o=node, kind="uri")


def test_dewey_number():  # work_spec.rb:180-184
    uri, triples, _ = resource(W_250)
    node = "http://api.talis.com/stores/openlibrary/items/ddc/155.4%2F13#class"
    assert match(triples, s=uri, p=V.DC_SUBJECT, o=node, kind="uri")


def test_covers():  # work_spec.rb:186-197
    uri, triples, _ = resource(W_250)
    covers = objects_of(triples, uri, V.FOAF_DEPICTION)
    assert len(covers) == 3
    assert "http://covers.openlibrary.org/w/id/5614028-S.jpg" in covers
