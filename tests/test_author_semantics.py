"""Port of specs/author_spec.rb (15 examples) — single-record Author semantics."""

from olkg import vocab as V
from olkg.triples import MemoryKV, extract_line, parse_dump_line

from conftest import (follow_author_list, match, objects_of,  # noqa: F401
                      read_fixture_line, requires_reference, resource)

pytestmark = requires_reference

A1 = "author_OL1179559A.txt"
A2 = "author_OL1394244A.txt"
A3 = "author_OL39937A.txt"


def test_identifies_author_resource():  # author_spec.rb:22-28
    rec = parse_dump_line(read_fixture_line(A1))
    assert rec is not None and rec[0] == "/type/author"


def test_uri_from_author_key():  # author_spec.rb:30-44
    uri, triples, _ = resource(A1)
    assert uri == "http://openlibrary.org/authors/OL1179559A"
    assert any(t.subj == uri for t in triples)
    assert match(triples, s=uri, p=V.RDF_TYPE, o=V.FOAF_AGENT)


def test_foaf_name():  # author_spec.rb:46-60
    uri, triples, _ = resource(A1)
    assert match(triples, s=uri, p=V.FOAF_NAME, o="August Dillmann")


def test_alternate_names():  # author_spec.rb:62-75
    uri, triples, _ = resource(A1)
    alts = {"Christian Friedrich August Dillmann", "Ch. F. A. Dillmann",
            "Friedrich August Dillmann", "F. A. Dillmann", "Augustus Dillmann",
            "August Dillmann", "A. Dillmann"}
    got = set(objects_of(triples, uri, V.SKOS_ALT_LABEL))
    assert alts <= got


def test_fuller_form_of_name():  # author_spec.rb:77-91
    uri, triples, _ = resource(A3)
    assert match(triples, s=uri, p=V.RDAG2_FULLER_FORM_OF_NAME,
                 o="Edward John Moreton Drax Plunkett")


def test_names_stored_pipe_delimited():  # author_spec.rb:93-100
    db = MemoryKV()
    uri, triples, _ = resource(A3, db=db)
    stored = db.get("/authors/OL39937A")
    assert stored is not None and "||" in stored
    assert "Edward John Moreton Drax Plunkett" in stored.split("||")


def _bio_event(fixture, type_uri, date):
    uri, triples, _ = resource(fixture)
    nodes = [t.subj for t in triples if t.pred == V.RDF_TYPE and t.obj == type_uri]
    assert len(nodes) == 1
    node = nodes[0]
    assert node.startswith("_:")  # blank node
    assert match(triples, s=node, p=V.DC_DATE, o=date)
    assert match(triples, s=uri, p=V.BIO_EVENT, o=node)
    assert match(triples, s=node, p=V.BIO_PRINCIPAL, o=uri)


def test_birth_date():  # author_spec.rb:102-138
    _bio_event(A1, V.BIO_BIRTH, "25 April 1823")


def test_death_date():  # author_spec.rb:140-176
    _bio_event(A1, V.BIO_DEATH, "4 July 1894.")


def test_website():  # author_spec.rb:178-194
    uri, triples, _ = resource(A2)
    assert match(triples, s=uri, p=V.FOAF_HOMEPAGE,
                 o="http://craphound.com/bio.php", kind="uri")


def test_bio():  # author_spec.rb:196-212
    uri, triples, _ = resource(A2)
    bios = objects_of(triples, uri, V.BIO_OLB)
    assert len(bios) == 1
    assert bios[0].startswith("From his website: Cory Doctorow")
    assert bios[0].endswith("Creative Commons Attribution 3.0.")


def test_author_title():  # author_spec.rb:214-228
    uri, triples, _ = resource(A3)
    assert match(triples, s=uri, p=V.RDAG2_TITLE_OF_THE_PERSON,
                 o="18th Baron of Dunsany")


def test_wikipedia_and_dbpedia():  # author_spec.rb:230-251
    uri, triples, _ = resource(A2)
    topics = objects_of(triples, uri, V.FOAF_IS_PRIMARY_TOPIC_OF)
    assert any("wikipedia.org" in t for t in topics)
    sames = objects_of(triples, uri, V.OWL_SAME_AS)
    assert any("dbpedia.org" in t for t in sames)


def test_photos():  # author_spec.rb:253-268
    uri, triples, _ = resource(A2)
    photos = objects_of(triples, uri, V.FOAF_DEPICTION)
    assert len(photos) == 6
    assert "http://covers.openlibrary.org/a/id/6257044-M.jpg" in photos


def test_links():  # author_spec.rb:270-285
    uri, triples, _ = resource(A1)
    links = objects_of(triples, uri, V.FOAF_PAGE)
    assert "http://de.wikipedia.org/wiki/August_Dillmann" in links
    assert "http://en.wikipedia.org/wiki/August_Dillmann" in links


def test_replays_pending_creations():  # author_spec.rb:287-303
    creations = ["http://openlibrary.org/books/OL3570141M",
                 "http://openlibrary.org/books/OL20957482M",
                 "http://openlibrary.org/works/OL5734718W"]
    db = MemoryKV()
    db.set("/authors/OL1394244A", "||".join(creations))
    db.sadd("pending", "/authors/OL1394244A")
    uri, triples, _ = resource(A2, db=db)
    replayed = {t.subj for t in triples if t.pred == V.OL_AUTHOR}
    assert replayed == set(creations)
    # each creation gets every name string
    for c in creations:
        assert match(triples, s=c, p=V.OL_AUTHOR, o="Cory Doctorow")
    assert not db.sismember("pending", "/authors/OL1394244A")


def test_batch_side_rows_without_db():
    """db=None (distributed mode): names surface as author_names side rows
    instead of Redis writes — the join input for J1."""
    line = read_fixture_line(A2)
    res = extract_line(line)
    keys = {k for k, _ in res.author_names}
    assert keys == {"/authors/OL1394244A"}
    assert any(n == "Cory Doctorow" for _, n in res.author_names)
    # no ol:author triples at extract time in batch mode
    assert not any(t.pred == V.OL_AUTHOR for t in res.triples)
