"""Behavioral tests for the corpus ops on a handcrafted near-dup corpus."""

import pytest
from pyspark.sql import functions as F

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again", "en"),
    (2, "the quick brown fox jumps over the lazy dog again and again", "en"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog again and once", "en"),   # near dup of 1
    (4, "der schnelle braune fuchs springt und springt mit der zeit", "de"),
    (5, "completely unrelated text about spark shuffles and joins here", "en"),
    (6, "THE  quick   brown fox jumps over the lazy dog again and again", "en"),  # ws/case variant
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], ["doc_id", "text"])


def test_exact_dup_groups(docs):
    from olkg.textops import dedup_exact, exact_dup_groups
    groups = exact_dup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0].dup_count == 2 and groups[0].keeper_id == 1
    kept = dedup_exact(docs).select("doc_id").rdd.map(lambda r: r[0]).collect()
    assert sorted(kept) == [1, 3, 4, 5, 6]


def test_ngram_jaccard_pairs(docs):
    from olkg.textops import ngram_jaccard_pairs
    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in ngram_jaccard_pairs(docs, n=3, threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0          # exact dup
    assert 0.3 <= pairs[(1, 3)] < 1.0    # near dup
    assert (1, 5) not in pairs and (4, 5) not in pairs


def test_minhash_candidates_cover_near_dups(docs):
    from olkg.textops import minhash_lsh_candidates
    cand = {(r.doc_a, r.doc_b) for r in
            minhash_lsh_candidates(docs, n=3, num_perm=16, bands=8).collect()}
    assert (1, 2) in cand                # identical shingle sets always collide
    assert (1, 3) in cand                # high-jaccard pair caught at 8 bands
    assert (4, 5) not in cand


def test_simhash(docs):
    from olkg.textops import simhash64, simhash_near_pairs
    sh = {r.doc_id: r.simhash for r in simhash64(docs).collect()}
    assert sh[1] == sh[2]                # identical text → identical simhash
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in simhash_near_pairs(docs, max_hamming=16).collect()}
    assert pairs[(1, 2)] == 0
    if (1, 3) in pairs:
        assert pairs[(1, 3)] > 0


def test_lang_id(docs):
    from olkg.textops import lang_id
    pred = {r.doc_id: r.lang_pred for r in lang_id(docs).collect()}
    assert pred[1] == "en"
    assert pred[4] == "de"


def test_quality_and_tokens(docs, spark):
    from olkg.textops import quality_scores, token_counts
    q = {r.doc_id: r for r in quality_scores(docs).collect()}
    assert q[1].n_tokens == 12 and q[1].keep
    short = spark.createDataFrame([(9, "tiny")], ["doc_id", "text"])
    assert not quality_scores(short).first().keep
    t = {r.doc_id: r for r in token_counts(docs).collect()}
    assert t[1].ws_tokens == 12
    assert t[1].bpe_tokens == 12  # no punctuation/digits in doc 1


def test_fingerprints_normalize_whitespace(docs):
    from olkg.textops import doc_fingerprints
    fp = {r.doc_id: r.fingerprint for r in doc_fingerprints(docs).collect()}
    assert fp[1] == fp[2]
    assert fp[1] == fp[6]   # case+whitespace collapse
    assert fp[1] != fp[3]
