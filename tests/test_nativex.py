"""Native (Catalyst variant) hot-field extraction ≡ the Python spec path.

The invariant that makes the hybrid split sound, checked triple-for-triple:

    python_full(record) == python_skip_hot(record) ∪ native(record)
                                        (for records passing the gate)
    python_full(record) == python_full(record)     (fallback records:
                                        gate False → Python runs full)

over (a) the whole fixture corpus (includes the reference's own spec
fixtures read at runtime) and (b) adversarial shapes targeting every
conformance rule.
"""

import json

import pytest
from pyspark.sql import functions as F

from olkg.fixtures import corpus_lines
from olkg.triples import extract_line, parse_dump_line, extract_record


def _py_triples(line, skip_hot=False):
    rec = parse_dump_line(line)
    if rec is None:
        return set()
    res = extract_record(rec[0], rec[4], skip_hot=skip_hot)
    if res is None:
        return set()
    return {t.as_tuple() for t in res.triples}


def _check_equivalence(spark, lines):
    """Assert the hybrid invariant for every line in `lines`."""
    from olkg.nativex import edition_hot_triples, hot_ok_col

    df = spark.createDataFrame([(ln,) for ln in lines], ["line"])
    flags = [bool(r[0]) for r in
             df.select(F.coalesce(hot_ok_col(F.col("line")),
                                  F.lit(False))).collect()]
    native_rows = edition_hot_triples(df).collect()
    native = {(r.subj, r.pred, r.obj, r.obj_kind, r.obj_datatype)
              for r in native_rows}

    full_all, hybrid_all = set(), set(native)
    for ln, hot in zip(lines, flags):
        full_all |= _py_triples(ln)
        hybrid_all |= _py_triples(ln, skip_hot=hot)
    assert hybrid_all == full_all, (
        f"spurious={sorted(hybrid_all - full_all)[:8]} "
        f"missing={sorted(full_all - hybrid_all)[:8]}")
    return flags, native


def test_native_matches_python_on_fixture_corpus(spark):
    lines = corpus_lines(include_reference=True)
    flags, native = _check_equivalence(spark, lines)
    # the corpus must actually exercise the native path
    assert any(flags), "no fixture record passed the native gate"
    assert len(native) > 0


def _ed(key, **fields):
    d = {"key": key, **fields}
    return f"/type/edition\t{key}\t1\t2020-01-01\t{json.dumps(d)}"


ADVERSARIAL = [
    # floats anywhere in a generic field → fallback (repr vs SQL cast)
    _ed("/books/F1", publishers=["Acme", 1.5]),
    _ed("/books/F2", number_of_pages=3.0),
    # >64-bit int → DECIMAL in variant → fallback; Python str(int) exact
    _ed("/books/F3", pagination=123456789012345678901234567890),
    # dict-valued generic field: splat pair-lists are dropped → emits nothing
    _ed("/books/C1", pagination={"a": 1}, publishers=["Real"]),
    # bool in a generic field → 'true' + xsd:boolean on both paths
    _ed("/books/C2", publishers=[True, "x"], by_statement=False),
    # int generic values get xsd:integer datatype
    _ed("/books/C3", number_of_pages=336, other_titles=[7, "t"]),
    # empty strings / null elements skip
    _ed("/books/C4", publishers=["", None, "Keep"]),
    # title machinery: prefix concat, empty-string subtitle appends '; '
    _ed("/books/T1", title="T", title_prefix="The ", subtitle=""),
    _ed("/books/T2", title="T", subtitle="Sub"),
    _ed("/books/T3", title="", subtitle="Sub"),          # no title triples
    _ed("/books/T4", title="T", title_prefix=7),          # non-str prefix → ''
    _ed("/books/T5", title="T", subtitle={"x": 1}),       # dict subtitle → fallback
    _ed("/books/T6", title="T", subtitle=False),          # bool subtitle → fallback
    _ed("/books/T7", title=42),                           # non-str title → nothing
    # languages: prefix stripping, bad keys skipped, whitespace key → fallback
    _ed("/books/L1", languages=[{"key": "/languages/eng"}, {"key": "/l/fr"},
                                {"key": 9}, {"key": ""}, "x", {"n": 1}]),
    _ed("/books/L2", languages=[{"key": " eng "}]),
    _ed("/books/L3", languages={"key": "/languages/eng"}),  # non-list → nothing
    # publish_country: lowercase<4 emits URI; digits/длина → nothing
    _ed("/books/P1", publish_country="xxk"),
    _ed("/books/P2", publish_country="toolong"),
    _ed("/books/P3", publish_country="x1"),
    # covers: ints and strings emit 3 sizes; bool/dict/float → fallback
    _ed("/books/V1", covers=[111, None, "22"]),
    _ed("/books/V2", covers=7),
    _ed("/books/V3", covers=[True]),
    _ed("/books/V4", covers=[[1, 2]]),
    _ed("/books/V5", covers={"a": 1}),
    # key shapes: %-escape or dot segment → normalize_uri not identity → fallback
    _ed("/books/K%20A", title="T"),
    _ed("/books/../K", title="T"),
    # duplicate JSON keys: variant refuses → fallback to Python (last wins)
    '/type/edition\t/books/D1\t1\t2020\t{"key": "/books/D1", "title": "A", "title": "B"}',
    # malformed lines: both paths skip
    "/type/edition\t/books/M1\t1",
    "/type/edition\t/books/M2\t1\t2020\t{broken",
    "/type/edition\t/books/M3\t1\t2020\t[1,2]",
    # non-edition records never take the native path
    '/type/author\t/authors/A1\t1\t2020\t{"key": "/authors/A1", "name": "N"}',
]


def test_native_matches_python_on_adversarial_shapes(spark):
    flags, native = _check_equivalence(spark, ADVERSARIAL)
    by_key = dict(zip([ln.split("\t")[1] for ln in ADVERSARIAL], flags))
    # conformance gate: these MUST fall back …
    for k in ["/books/F1", "/books/F2", "/books/F3", "/books/T5", "/books/T6",
              "/books/L2", "/books/V3", "/books/V4", "/books/V5",
              "/books/K%20A", "/books/../K", "/books/D1"]:
        assert not by_key[k], f"{k} should have fallen back"
    # … and these MUST be natively handled
    for k in ["/books/C1", "/books/C2", "/books/C3", "/books/C4",
              "/books/T1", "/books/T2", "/books/T3", "/books/T4", "/books/T7",
              "/books/L1", "/books/L3", "/books/P1", "/books/P2", "/books/P3",
              "/books/V1", "/books/V2"]:
        assert by_key[k], f"{k} should be native"


def test_native_plan_has_no_python(spark):
    """The native emission is pure Catalyst — no Arrow/Python eval nodes."""
    import contextlib
    import io

    from olkg.nativex import edition_hot_triples
    df = spark.createDataFrame([(ADVERSARIAL[0],)], ["line"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        edition_hot_triples(df).explain(mode="simple")
    assert "EvalPython" not in buf.getvalue()


def test_skip_hot_only_affects_editions():
    line = ('/type/author\t/authors/A9\t1\t2020\t'
            '{"key": "/authors/A9", "name": "X", "title": "Sir"}')
    assert _py_triples(line, skip_hot=True) == _py_triples(line)
