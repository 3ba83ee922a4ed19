"""Unit tests for text-analysis primitives on hand-built fixtures
(oracle parity at sf0.01 is covered by test_oracle_parity.py)."""

from __future__ import annotations

import pytest

from dask_obj_spark.operators.text import (
    language_id,
    quality_scores,
    tfidf_top_terms,
    token_stats,
    winnow_fingerprints,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox, it jumps!"),
            (2, "der und die das ist von hund"),
            (3, "aaa bbb aaa ccc aaa"),
        ],
        ["doc_id", "text"],
    )


def test_token_stats(docs):
    got = {r.doc_id: r for r in token_stats(docs, "doc_id", "text").collect()}
    assert got[1].n_ws_tokens == 6
    # BPE-ish: 6 words + comma + bang
    assert got[1].n_bpe_tokens == 8
    assert got[1].n_chars_exact == len("the quick brown fox, it jumps!")


def test_quality_monotone(docs):
    got = {r.doc_id: r for r in quality_scores(docs, "doc_id", "text").collect()}
    assert got[1].stopword_ratio == pytest.approx(2 / 6, abs=1e-6)  # the, it
    assert got[3].punct_ratio == 0.0
    assert 0.0 <= got[1].quality <= 1.0


def test_language_id(docs):
    got = {r.doc_id: r.pred_lang for r in language_id(docs, "doc_id", "text").collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "de"  # zero hits everywhere → alphabetical tie-break


def test_tfidf_unique_term_wins(docs):
    got = tfidf_top_terms(docs, "doc_id", "text", 1).collect()
    top = {r.doc_id: r.term for r in got}
    # 'aaa' appears 3x only in doc 3 → by far its highest tf-idf
    assert top[3] == "aaa"
    assert all(r.rank == 1 for r in got)


def test_winnow_shared_substring_shares_fp(spark):
    # docs share a 20-char substring > kgram+window-1 = 11 → winnowing
    # guarantees at least one common fingerprint
    shared = "identical-common-run"
    df = spark.createDataFrame(
        [(1, "prefix one " + shared), (2, shared + " suffix two"), (3, "zzz qqq vvv unrelated")],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(df, "doc_id", "text", 8, 4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3] & by_doc[2])


def test_boilerplate_scrub_removes_cross_doc_segments(spark):
    from dask_obj_spark.operators.text import remove_boilerplate_segments

    footer = "this footer is repeated boilerplate"  # 5 words = one segment
    rows = [
        (1, "unique alpha text here now " + footer),
        (2, "different beta words again ok " + footer),
        (3, "standalone gamma content stays put intact"),
        (4, footer),  # fully boilerplate → empty
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r.clean_text
        for r in remove_boilerplate_segments(df, "doc_id", "text", 5, 1).collect()
    }
    assert got[1] == "unique alpha text here now"
    assert got[2] == "different beta words again ok"
    assert got[3] == "standalone gamma content stays put intact"
    assert got[4] == ""


def test_boilerplate_scrub_keeps_order_across_segments(spark):
    from dask_obj_spark.operators.text import remove_boilerplate_segments

    # 3 segments of 2 words; middle segment is shared boilerplate
    rows = [(1, "aa bb XX YY cc dd"), (2, "zz ww XX YY qq rr")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r.clean_text
        for r in remove_boilerplate_segments(df, "doc_id", "text", 2, 1).collect()
    }
    assert got == {1: "aa bb cc dd", 2: "zz ww qq rr"}
