"""Catalyst-native extraction of the HOT structured edition fields.

STATUS: correct, fully tested, and OFF BY DEFAULT — measured SLOWER than
the Python path it offloads (see the A/B below).  Kept as the working
implementation of the "offload hot fields to Catalyst" design so the
trade-off is reproducible, and because a future Spark whose higher-order
functions and variant expressions participate in whole-stage codegen would
flip the result.

Measured A/B (600k pages, local[8], extract→dedup→sink job, identical
14,308,091-row output): all-Python 40.3 s; hybrid (this module + skip_hot
Python) 263 s naive, ~80 s with the variant materialized behind a barrier.
Decomposition: the per-row floor (scan + native html→text inversion) is
~8-12 s and is paid ONCE by the Python branch but TWICE by the hybrid (the
native branch is a second scan leg); the conformance gate + per-element
emission evaluate interpreted (higher-order functions and variant
expressions are CodegenFallback in Spark 4.1), costing ~500 µs/row against
orjson's ~130 µs/record for the ENTIRE Python extraction; and skip_hot
only saves 19 % of the Python time (hot fields are ~24 % of emitted
triples) — so the hybrid adds a ~30 s branch to save ~6 s.

The high-volume edition fields have *almost* columnar semantics: the
generic 16-field literal map (lib/edition.rb:9-26, 165-172), languages
(:38-49), title/title_prefix/subtitle (:224-239), publish_country
(:260-266) and covers (:368-375).  This module re-expresses those field
emitters as pure Catalyst expressions over Spark's VariantType
(``try_parse_json`` + ``try_variant_get`` + ``schema_of_variant``), which
gives the JVM the same per-value duck-type dispatch the Ruby code does.

Correctness contract: a record is handled natively ONLY when
:func:`edition_hot_ok` proves every hot field's value shape is one whose
reference semantics the native expressions reproduce EXACTLY (see the
conformance notes inline).  Non-conforming records — floats where Ruby's
``to_s`` formatting differs from SQL casts, duck-type corners like
dict-valued subtitles, unicode-whitespace language keys, non-trivially
normalizable keys — fall back to the spec-tested Python path per record.
The split is exhaustive and disjoint: Python skips exactly the hot fields
(``skip_hot``) for records the native side emits, so
``python(full) == python(skip_hot) ∪ native`` triple-for-triple
(tested in tests/test_nativex.py against the whole fixture corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import vocab as V
from .schema import TRIPLES_SCHEMA
from .triples import GENERIC_FIELDS, HOT_NATIVE_FIELDS  # noqa: F401 (re-export)

_XSD_BOOL = V.XSD_NS + "boolean"

# generic-map fields handled natively ('subtitle' is shadowed by its
# DISPATCH handler in EditionExtractor.run, so it is NOT a generic field;
# its dispatch emission is reproduced by _subtitle_structs)
_NATIVE_GENERIC = {k: p for k, p in GENERIC_FIELDS.items() if k != "subtitle"}

_BAD_NUM = "^(DOUBLE|FLOAT|DECIMAL)"   # Ruby Float#to_s != SQL cast → fallback


def _vg(x, path):
    return F.try_variant_get(x, path, "variant")


def _vstr(x, path="$"):
    return F.try_variant_get(x, path, "string")


def _sch(x):
    return F.schema_of_variant(x)


def _split_line(line):
    """parse_dump_line's TSV contract (triples.py): rstrip newlines, split
    on tabs, JSON is column 5 EXACTLY (extra columns truncate it)."""
    return F.split(F.regexp_replace(line, "\n+$", ""), "\t")


def _elems(raw):
    """Ruby ``[*value]`` restricted to what the native path emits from:
    arrays → their elements; objects → [] (splat yields [k,v] pair-lists,
    which ``_Emitter.add`` drops as non-literal-able — net: nothing);
    scalars/null → a 1-element array (null element filters out later)."""
    sch = _sch(raw)
    return (F.when(sch.startswith("ARRAY"),
                   F.try_variant_get(raw, "$", "array<variant>"))
             .when(sch.startswith("OBJECT"), F.array().cast("array<variant>"))
             .otherwise(F.array(raw)))


def _scalar_obj(e):
    """Literal object string for a scalar element, mirroring _Emitter.add:
    strings pass through; ints → str(int); bools → 'true'/'false'.  Any
    other shape → NULL (either skipped by the reference or excluded by the
    conformance gate)."""
    es = _sch(e)
    return F.when(es.isin("STRING", "BIGINT", "BOOLEAN"), _vstr(e))


def _scalar_dt(e):
    es = _sch(e)
    return (F.when(es == F.lit("BIGINT"), F.lit(V.XSD_INTEGER))
             .when(es == F.lit("BOOLEAN"), F.lit(_XSD_BOOL)))


def _triple(pred, obj, kind="literal", dt=None):
    return F.struct(
        F.lit(pred).alias("pred"),
        obj.alias("obj"),
        F.lit(kind).alias("obj_kind"),
        (dt if dt is not None else F.lit(None).cast("string"))
        .alias("obj_datatype"))


def _triple_dyn(pred, obj, dt):
    return F.struct(F.lit(pred).alias("pred"), obj.alias("obj"),
                    F.lit("literal").alias("obj_kind"),
                    dt.alias("obj_datatype"))


def _empty():
    # built lazily: Column construction needs the live JVM
    return F.array().cast(
        "array<struct<pred:string,obj:string,obj_kind:string,"
        "obj_datatype:string>>")


def _generic_structs(v, fld, pred):
    raw = _vg(v, f"$.{fld}")
    return F.filter(
        F.transform(_elems(raw),
                    lambda e: _triple_dyn(pred, _scalar_obj(e), _scalar_dt(e))),
        lambda s: s["obj"].isNotNull() & (s["obj"] != F.lit("")))


def _no_float(raw):
    """Conformance: no DOUBLE/DECIMAL at the top level or among first-level
    array elements (deeper nesting is dropped wholesale by the reference,
    so its numeric types never surface)."""
    sch = _sch(raw)
    bad_top = F.coalesce(sch.rlike(_BAD_NUM), F.lit(False))
    bad_elem = F.when(
        sch.startswith("ARRAY"),
        F.exists(F.try_variant_get(raw, "$", "array<variant>"),
                 lambda e: F.coalesce(_sch(e).rlike(_BAD_NUM), F.lit(False)))
    ).otherwise(F.lit(False))
    return ~(bad_top | bad_elem)


# --- languages (parse_languages, lib/edition.rb:38-49) ---------------------

def _lang_uri(e):
    kv = _vg(e, "$.key")
    s = _vstr(e, "$.key")
    stripped = F.regexp_replace(
        F.regexp_replace(s, "^/languages/", ""), "^/l/", "")
    return F.when((_sch(kv) == F.lit("STRING")) & (s != F.lit("")),
                  F.concat(F.lit("http://purl.org/NET/marccodes/languages/"),
                           stripped, F.lit("#lang")))


def _languages_structs(v):
    raw = _vg(v, "$.languages")
    arr = F.try_variant_get(raw, "$", "array<variant>")
    return F.when(
        _sch(raw).startswith("ARRAY"),
        F.filter(F.transform(arr, lambda e: _triple(V.DC_LANGUAGE,
                                                    _lang_uri(e), "uri")),
                 lambda s: s["obj"].isNotNull())
    ).otherwise(_empty())


def _languages_ok(v):
    """Python str.strip() == identity requires the key to be printable
    ASCII; any other STRING key (whitespace/unicode edges) → fallback.
    Non-string keys are skipped identically by both paths; a non-array
    languages value emits nothing on both paths."""
    raw = _vg(v, "$.languages")
    sch = _sch(raw)

    def key_ok(e):
        kv = _vg(e, "$.key")
        s = _vstr(e, "$.key")
        return F.when(_sch(kv) == F.lit("STRING"),
                      (s == F.lit("")) | s.rlike("^[!-~]+$")
                      ).otherwise(F.lit(True))

    return F.when(sch.startswith("ARRAY"),
                  F.forall(F.try_variant_get(raw, "$", "array<variant>"),
                           key_ok)).otherwise(F.lit(True))


# --- title / title_prefix / subtitle (lib/edition.rb:224-239) ---------------

def _title_structs(v):
    ts = _sch(_vg(v, "$.title"))
    tval = _vstr(v, "$.title")
    prefix = F.when(_sch(_vg(v, "$.title_prefix")) == F.lit("STRING"),
                    _vstr(v, "$.title_prefix")).otherwise(F.lit(""))
    title1 = F.concat(prefix, tval)
    ss = _sch(_vg(v, "$.subtitle"))
    sval = _vstr(v, "$.subtitle")
    # any non-nil subtitle (even "") appends '; ' + subtitle (Ruby
    # truthiness, edition.rb:228); the conformance gate restricts the
    # native path to string-or-absent subtitles
    title2 = F.when(ss == F.lit("STRING"),
                    F.concat(title1, F.lit("; "), sval)).otherwise(title1)
    both = F.array(_triple(V.RDA_TITLE_PROPER, title1),
                   _triple(V.DC_TITLE, title2))
    return F.when((ts == F.lit("STRING")) & (tval != F.lit("")),
                  both).otherwise(_empty())


def _title_ok(v):
    ss = _sch(_vg(v, "$.subtitle"))
    ts = _sch(_vg(v, "$.title"))
    # a non-string subtitle only matters when a title will be emitted
    return (ts.isNull() | (ts != F.lit("STRING")) | (_vstr(v, "$.title") == F.lit(""))
            | ss.isNull() | (ss == F.lit("STRING")))


def _subtitle_structs(v):
    ss = _sch(_vg(v, "$.subtitle"))
    sval = _vstr(v, "$.subtitle")
    return F.when((ss == F.lit("STRING")) & (sval != F.lit("")),
                  F.array(_triple(V.RDA_OTHER_TITLE_INFORMATION, sval))
                  ).otherwise(_empty())


# --- publish_country (lib/edition.rb:260-266) -------------------------------

def _publish_country_structs(v):
    ps = _sch(_vg(v, "$.publish_country"))
    pc = _vstr(v, "$.publish_country")
    uri = F.concat(F.lit("http://purl.org/NET/marccodes/countries/"),
                   pc, F.lit("#location"))
    return F.when((ps == F.lit("STRING")) & (pc != F.lit(""))
                  & pc.rlike("^[a-z]*$") & (F.length(pc) < 4),
                  F.array(_triple(V.RDA_PLACE_OF_PUBLICATION, uri, "uri"))
                  ).otherwise(_empty())


# --- covers (parse_covers 'b', lib/edition.rb:368-375) ----------------------

def _covers_structs(v):
    raw = _vg(v, "$.covers")

    def one(e, size):
        val = F.when(_sch(e).isin("BIGINT", "STRING"), _vstr(e))
        return _triple(
            V.FOAF_DEPICTION,
            F.concat(F.lit("http://covers.openlibrary.org/b/id/"), val,
                     F.lit(f"-{size}.jpg")), "uri")

    per_elem = F.transform(
        _elems(raw),
        lambda e: F.array(one(e, "S"), one(e, "M"), one(e, "L")))
    return F.filter(F.flatten(per_elem), lambda s: s["obj"].isNotNull())


def _covers_ok(v):
    """Native covers handle int/string ids (null elements skip).  Anything
    else — bools (Python str(True)='True'), floats, nested lists/dicts
    (Python repr), object-valued covers (splat pair-lists reach the
    f-string) — falls back to the Python path, which IS the port's spec."""
    raw = _vg(v, "$.covers")
    sch = _sch(raw)
    elem_ok = F.forall(
        F.try_variant_get(raw, "$", "array<variant>"),
        lambda e: _sch(e).isin("VOID", "BIGINT", "STRING"))
    return (sch.isNull() | sch.isin("BIGINT", "STRING")
            | (sch.startswith("ARRAY") & F.coalesce(elem_ok, F.lit(False))))


# --- record-level gate + assembly ------------------------------------------

# normalize_uri identity: unreserved-chars-only path segments, no dot
# segments, no %-escapes → minting is plain concat (util.normalize_uri)
_KEY_SAFE = "^(/[A-Za-z0-9._~-]+)+$"
_KEY_DOTSEG = "(^|/)[.]{1,2}(/|$)"


def edition_hot_ok(v) -> F.Column:
    """True iff EVERY hot field of this record has a shape whose native
    emission provably equals the Python path's (see module docstring)."""
    key = _vg(v, "$.key")
    ok = (_sch(v).startswith("OBJECT")
          & (_sch(key) == F.lit("STRING"))
          & _vstr(v, "$.key").rlike(_KEY_SAFE)
          & ~_vstr(v, "$.key").rlike(_KEY_DOTSEG)
          & _languages_ok(v) & _title_ok(v) & _covers_ok(v))
    for fld in _NATIVE_GENERIC:
        ok = ok & _no_float(_vg(v, f"$.{fld}"))
    return F.coalesce(ok, F.lit(False))


def line_variant(line) -> F.Column:
    """The record JSON of a 5+-column dump line as a variant (null when the
    line is short or the JSON doesn't parse — those records either fall
    back to Python or are skipped by both paths identically)."""
    cols = _split_line(line)
    return F.when(F.size(cols) >= 5, F.try_parse_json(cols[4]))


def line_is_edition(line) -> F.Column:
    return _split_line(line)[0] == F.lit("/type/edition")


def hot_ok_col(line) -> F.Column:
    """Per-line flag: this record's hot fields will be emitted natively
    (the Python extractor must skip them)."""
    return (line_is_edition(line)
            & F.coalesce(edition_hot_ok(line_variant(line)), F.lit(False)))


def edition_hot_triples(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """(subj, pred, obj, obj_kind, obj_datatype) for the hot fields of all
    conforming edition records in ``lines`` — pure Catalyst, no Python.

    The parsed variant is materialized behind a nondeterministic barrier
    (the ``rand() >= -1`` guard) so neither CollapseProject nor
    PushDownPredicate inlines ``try_parse_json`` into the gate and the
    Generate node, which would re-parse the JSON once per expression
    reference (measured 201 s → 53 s on the 600k-page probe)."""
    line = F.col(line_col)
    barrier_v = F.when(F.rand() >= F.lit(-1.0), line_variant(line))
    mid = (lines
           .filter(line_is_edition(line))
           .select(barrier_v.alias("v")))
    v = F.col("v")
    subj = F.concat(F.lit(V.URI_PREFIX), _vstr(v, "$.key"))
    all_structs = F.concat(
        _title_structs(v), _subtitle_structs(v), _languages_structs(v),
        _publish_country_structs(v), _covers_structs(v),
        *[_generic_structs(v, fld, pred)
          for fld, pred in sorted(_NATIVE_GENERIC.items())])
    return (mid
            .filter(edition_hot_ok(v))
            .select(subj.alias("subj"), F.explode(all_structs).alias("t"))
            .select("subj", "t.pred", "t.obj", "t.obj_kind", "t.obj_datatype")
            .select([F.col(c).cast("string").alias(c)
                     for c in TRIPLES_SCHEMA.fieldNames()]))
