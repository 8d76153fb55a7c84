"""Port of specs/edition_spec.rb (35 examples) — single-record Edition semantics."""

from olkg import vocab as V
from olkg.triples import MemoryKV, parse_dump_line

from conftest import (follow_author_list, match, objects_of,  # noqa: F401
                      read_fixture_line, requires_reference, resource)

pytestmark = requires_reference

E_396 = "edition_OL1002396M.txt"
E_411 = "edition_OL1002411M.txt"
E_024 = "edition_OL1002024M.txt"
E_043 = "edition_OL100043M.txt"
E_515 = "edition_OL1009515M.txt"
E_232 = "edition_OL10023172M.txt"
E_292 = "edition_OL10292211M.txt"
E_189 = "edition_OL18904767M.txt"
E_193 = "edition_OL19374587M.txt"
E_203 = "edition_OL20343282M.txt"
E_205 = "edition_OL20587107M.txt"
E_249 = "edition_OL24919867M.txt"


def test_identifies_edition_resource():  # edition_spec.rb:68-72
    rec = parse_dump_line(read_fixture_line(E_396))
    assert rec is not None and rec[0] == "/type/edition"


def test_uri_from_edition_key():  # edition_spec.rb:74-85
    uri, triples, _ = resource(E_396)
    assert uri == "http://openlibrary.org/books/OL1002396M"
    assert match(triples, s=uri, p=V.RDF_TYPE, o=V.BIBO_BOOK)


def test_title():  # edition_spec.rb:87-93
    uri, triples, _ = resource(E_411)
    assert match(triples, s=uri, p=V.RDA_TITLE_PROPER, o="Biochemistry")
    assert match(triples, s=uri, p=V.DC_TITLE,
                 o="Biochemistry; Mosby's USMLE step 1 reviews")
    assert match(triples, s=uri, p=V.RDA_OTHER_TITLE_INFORMATION,
                 o="Mosby's USMLE step 1 reviews")


def test_variant_titles():  # edition_spec.rb:95-99
    uri, triples, _ = resource(E_411)
    assert match(triples, s=uri, p=V.RDA_VARIANT_TITLE,
                 o="Mosby's USMLE step 1 reviews--biochemistry")


def test_publishers():  # edition_spec.rb:101-105
    uri, triples, _ = resource(E_396)
    assert match(triples, s=uri, p=V.DC11_PUBLISHER, o="Millbrook Press")


def test_copyright_date():  # edition_spec.rb:106-110
    uri, triples, _ = resource(E_203)
    assert match(triples, s=uri, p=V.DC_DATE_COPYRIGHTED, o="1972, 1978")


def test_contributors():  # edition_spec.rb:112-121
    uri, triples, _ = resource(E_203)
    assert match(triples, s=uri, p=V.DC11_CONTRIBUTOR, o="Greenwood, Joy.")
    assert match(triples, s=uri, p=V.DC11_CONTRIBUTOR,
                 o="Ramblers' Association. Lake District Area.")
    assert match(triples, s=uri, p=V.DC11_CREATOR, o="Joy Greenwood")
    uri2, triples2, _ = resource(E_292)
    assert match(triples2, s=uri2, p=V.DC11_CONTRIBUTOR, o="Anthony Hogg")


def test_pagination():  # edition_spec.rb:123-127
    uri, triples, _ = resource(E_203)
    assert match(triples, s=uri, p=V.DC_EXTENT, o="64p. :")


def test_physical_dimensions():  # edition_spec.rb:129-133
    uri, triples, _ = resource(E_232)
    assert match(triples, s=uri, p=V.RDA_DIMENSIONS, o="11.8 x 8 x 0.2 inches")


def test_publish_places():  # edition_spec.rb:135-139
    uri, triples, _ = resource(E_411)
    assert match(triples, s=uri, p=V.RDA_PLACE_OF_PUBLICATION, o="St. Louis")


def test_source_records():  # edition_spec.rb:141-146
    uri, triples, _ = resource(E_043)
    assert match(triples, s=uri, p=V.DC11_SOURCE,
                 o="marc:marc_records_scriblio_net/part28.dat:62741961:1376")
    assert match(triples, s=uri, p=V.DC11_SOURCE,
                 o="marc:marc_loc_updates/v36.i33.records.utf8:3020091:1375")


def test_number_of_pages():  # edition_spec.rb:148-152
    uri, triples, _ = resource(E_043)
    assert match(triples, s=uri, p=V.BIBO_NUM_PAGES, o="103")


def test_publish_date():  # edition_spec.rb:154-158
    uri, triples, _ = resource(E_396)
    assert match(triples, s=uri, p=V.DC_ISSUED, o="1997")


def test_edition_name():  # edition_spec.rb:160-164
    uri, triples, _ = resource(E_024)
    assert match(triples, s=uri, p=V.BIBO_EDITION, o="1st ed.")


def test_work_title():  # edition_spec.rb:166-170
    uri, triples, _ = resource(E_515)
    # "\314\201" etc. are UTF-8 combining marks in the fixture
    expect = ("Sciences de la vie dans la pensée française "
              "de XVIIIe siècle.")
    assert match(triples, s=uri, p=V.RDA_TITLE_OF_THE_WORK, o=expect)


def test_by_statement():  # edition_spec.rb:172-176
    uri, triples, _ = resource(E_396)
    assert match(triples, s=uri, p=V.RDA_STATEMENT_OF_RESPONSIBILITY,
                 o="Andrew Matthews ; illustrated by Sheila Moxley.")


def test_language():  # edition_spec.rb:178-182
    uri, triples, _ = resource(E_396)
    assert match(triples, s=uri, p=V.DC_LANGUAGE,
                 o="http://purl.org/NET/marccodes/languages/eng#lang", kind="uri")


def test_isbns():  # edition_spec.rb:184-203
    uri, triples, _ = resource(E_024)
    for o in ("0060275278", "9780060275273", "0064420477", "9780064420471"):
        assert match(triples, s=uri, p=V.BIBO_ISBN, o=o)
    assert match(triples, s=uri, p=V.BIBO_ISBN10, o="0060275278")
    assert match(triples, s=uri, p=V.BIBO_ISBN13, o="9780060275273")
    assert match(triples, s=uri, p=V.BIBO_ISBN10, o="0064420477")
    assert match(triples, s=uri, p=V.BIBO_ISBN13, o="9780064420471")

    uri, triples, _ = resource(E_249)
    assert match(triples, s=uri, p=V.BIBO_ISBN10, o="8862742614")
    assert match(triples, s=uri, p=V.BIBO_ISBN, o="8862742614")
    assert match(triples, s=uri, p=V.BIBO_ISBN13, o="9788862742610")
    assert match(triples, s=uri, p=V.BIBO_ISBN, o="9788862742610")


def test_urls():  # edition_spec.rb:205-211
    uri, triples, _ = resource(E_515)
    for o in ("http://www.h-net.org/review/hrev-a0a9k8-aa",
              "http://www.loc.gov/catdir/description/cam028/96049548.html",
              "http://www.loc.gov/catdir/toc/cam027/96049548.html"):
        assert match(triples, s=uri, p=V.FOAF_PAGE, o=o, kind="uri")


def test_uris():  # edition_spec.rb:213-219
    uri, triples, _ = resource(E_515)
    for o in ("http://www.h-net.org/review/hrev-a0a9k8-aa",
              "http://www.loc.gov/catdir/description/cam028/96049548.html",
              "http://www.loc.gov/catdir/toc/cam027/96049548.html"):
        assert match(triples, s=uri, p=V.BIBO_URI, o=o, kind="uri")


def test_lc_classification():  # edition_spec.rb:221-225
    uri, triples, _ = resource(E_515)
    node = "http://api.talis.com/stores/openlibrary/items/lcc/QH305+.R5413+1997#class"
    assert match(triples, s=uri, p=V.DC_SUBJECT, o=node, kind="uri")
    assert match(triples, s=node, p=V.DCAM_IS_MEMBER_OF, o=V.DC_LCC, kind="uri")
    assert match(triples, s=node, p=V.RDF_VALUE, o="QH305 .R5413 1997")
    scheme = "http://api.talis.com/stores/openlibrary/items/lcc/QH#scheme"
    assert match(triples, s=scheme, p=V.RDF_TYPE, o=V.SKOS_CONCEPT_SCHEME)
    assert match(triples, s=node, p=V.SKOS_IN_SCHEME, o=scheme, kind="uri")


def test_genres():  # edition_spec.rb:227-232
    uri, triples, _ = resource(E_024)
    assert match(triples, s=uri, p=V.DC_TYPE, o="Juvenile fiction")
    assert match(triples, s=uri, p=V.DC_TYPE, o="Fiction")


def test_table_of_contents():  # edition_spec.rb:234-239
    uri, triples, _ = resource(E_193)
    tocs = objects_of(triples, uri, V.DC_TABLE_OF_CONTENTS)
    assert len(tocs) == 1
    lines = tocs[0].split("\n")
    assert lines[0] == "1. Outside and Inside History"
    assert lines[19] == "20. Barbarism: A Userb2ss Guide"  # cntrl chars stripped
    assert lines[20] == "21. Identity History Is Not Enough."
    assert len(lines) == 21


def test_lccn():  # edition_spec.rb:241-245
    uri, triples, _ = resource(E_515)
    assert match(triples, s=uri, p=V.BIBO_LCCN, o="96049548")
    assert match(triples, s=uri, p=V.OWL_SAME_AS,
                 o="http://purl.org/NET/lccn/96049548#i", kind="uri")
    assert match(triples, s=uri, p=V.OWL_SAME_AS, o="info:lccn/96049548",
                 kind="uri")


def test_authors_and_author_list():  # edition_spec.rb:247-278
    db = MemoryKV()
    uri, triples, _ = resource(E_205, db=db)
    authors = ["http://openlibrary.org/authors/OL6075577A",
               "http://openlibrary.org/authors/OL6075578A"]
    for a in authors:
        assert match(triples, s=uri, p=V.DC_CREATOR, o=a, kind="uri")
    heads = objects_of(triples, uri, V.BIBO_AUTHOR_LIST)
    assert len(heads) == 1 and heads[0].startswith("_:")
    assert follow_author_list(triples, heads[0]) == authors
    # creation registered as pending in the KV (J1 client side)
    assert uri in db.get("/authors/OL6075577A")
    assert uri in db.get("/authors/OL6075578A")
    assert db.sismember("pending", "/authors/OL6075577A")


def test_description():  # edition_spec.rb:280-284
    uri, triples, _ = resource(E_396)
    assert match(triples, s=uri, p=V.DC_DESCRIPTION,
                 o="A collection of creation stories from various world "
                   "cultures, both ancient and contemporary.")


def test_dewey_number():  # edition_spec.rb:286-290
    uri, triples, _ = resource(E_396)
    node = "http://api.talis.com/stores/openlibrary/items/ddc/291.1%2F3#class"
    assert match(triples, s=uri, p=V.DC_SUBJECT, o=node, kind="uri")
    assert match(triples, s=node, p=V.DCAM_IS_MEMBER_OF, o=V.DC_DDC, kind="uri")
    scheme = "http://api.talis.com/stores/openlibrary/items/ddc/291#scheme"
    assert match(triples, s=node, p=V.SKOS_IN_SCHEME, o=scheme, kind="uri")


def test_publish_country():  # edition_spec.rb:292-296
    uri, triples, _ = resource(E_396)
    assert match(triples, s=uri, p=V.RDA_PLACE_OF_PUBLICATION,
                 o="http://purl.org/NET/marccodes/countries/ctu#location",
                 kind="uri")


def test_identifiers():  # edition_spec.rb:298-303
    uri, triples, _ = resource(E_396)
    assert match(triples, s=uri, p=V.FOAF_IS_PRIMARY_TOPIC_OF,
                 o="http://www.librarything.com/work/1536693", kind="uri")
    assert match(triples, s=uri, p=V.FOAF_IS_PRIMARY_TOPIC_OF,
                 o="http://www.goodreads.com/book/show/1780787", kind="uri")


def test_oclc_numbers():  # edition_spec.rb:305-315
    uri, triples, _ = resource(E_396)
    assert match(triples, s=uri, p=V.BIBO_OCLCNUM, o="35586866")
    assert match(triples, s=uri, p=V.FOAF_IS_PRIMARY_TOPIC_OF,
                 o="http://worldcat.org/oclc/35586866", kind="uri")
    uri, triples, _ = resource(E_189)
    assert match(triples, s=uri, p=V.BIBO_OCLCNUM, o="12101731")
    assert match(triples, s=uri, p=V.FOAF_IS_PRIMARY_TOPIC_OF,
                 o="http://worldcat.org/oclc/12101731", kind="uri")


def test_subjects_with_lcsh():  # edition_spec.rb:317-343
    db = MemoryKV()
    lcsh = {
        "Homes and haunts": "http://id.loc.gov/authorities/subjects/sh99005711",
        "Criticism and interpretation": "http://id.loc.gov/authorities/subjects/sh99005576",
        "Italy": "http://id.loc.gov/authorities/names/n79021783",
    }
    for k, v in lcsh.items():
        db.set(k, v)
    uri, triples, _ = resource(E_249, db=db)
    subjects = {"Congresses", "Homes and haunts", "Criticism and interpretation",
                "Edmondo De Amicis (1846-1908)", "Italy", "Turin"}
    got = set(objects_of(triples, uri, V.DC11_SUBJECT))
    assert got == subjects
    dc_subjects = {o for o in objects_of(triples, uri, V.DC_SUBJECT)
                   if "stores/openlibrary/items/" not in o}
    assert dc_subjects == set(lcsh.values())


def test_subjects_probe_rows_without_db():
    """db=None: LCSH lookups become probe side rows for the broadcast join."""
    from olkg.triples import extract_line
    res = extract_line(read_fixture_line(E_249))
    labels = {label for _, label in res.probes}
    assert "Homes and haunts" in labels
    assert "Criticism and interpretation" in labels


def test_ocaid():  # edition_spec.rb:345-351
    uri, triples, _ = resource(E_205)
    assert match(triples, s=uri, p=V.DC11_IDENTIFIER, o="dieproblemeeine00ottogoog")
    assert match(triples, s=uri, p=V.FOAF_PAGE,
                 o="http://www.archive.org/details/dieproblemeeine00ottogoog",
                 kind="uri")


def test_notes():  # edition_spec.rb:353-357
    uri, triples, _ = resource(E_515)
    assert match(triples, s=uri, p=V.RDA_NOTE,
                 o="Includes bibliographical references (p. [691]-734) and index.")


def test_works():  # edition_spec.rb:359-366
    uri, triples, _ = resource(E_193)
    w = "http://openlibrary.org/works/OL495651W"
    assert match(triples, s=uri, p=V.DC_IS_VERSION_OF, o=w, kind="uri")
    assert match(triples, s=w, p=V.DC_HAS_VERSION, o=uri, kind="uri")
    assert match(triples, s=uri, p=V.OV_COMMON_MANIFESTATION, o=w, kind="uri")
    assert match(triples, s=w, p=V.OV_COMMON_MANIFESTATION, o=uri, kind="uri")


def test_covers():  # edition_spec.rb:368-380
    uri, triples, _ = resource(E_024)
    covers = objects_of(triples, uri, V.FOAF_DEPICTION)
    assert len(covers) == 6
    assert "http://covers.openlibrary.org/b/id/3857941-S.jpg" in covers
    assert "http://covers.openlibrary.org/b/id/3857863-L.jpg" in covers
