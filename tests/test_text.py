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


def test_pmi_bigrams_repeated_pair_scores_high(spark):
    from dask_obj_spark.operators.text import pmi_bigrams

    # "new york" always co-occurs; "the cat"/"the dog" split "the"'s mass
    rows = [(i, "new york " * 3 + ("the cat " if i % 2 else "the dog ")) for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.w1, r.w2): r.pmi for r in pmi_bigrams(df, "doc_id", "text", 3).collect()}
    # python reference over the same corpus
    import math
    from collections import Counter
    uni, big = Counter(), Counter()
    for _, text in rows:
        toks = text.split()
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    T, B = sum(uni.values()), sum(big.values())
    for (w1, w2), nxy in big.items():
        if nxy >= 3:
            ref = round(math.log((nxy / B) / ((uni[w1] / T) * (uni[w2] / T))), 6)
            assert abs(got[(w1, w2)] - ref) < 1e-9, (w1, w2)
    # forward repetition pairs outnumber the wrap-around ones
    assert got[("new", "york")] > got[("york", "new")]


def test_span_dedup_conservation_and_first_wins(spark):
    from dask_obj_spark.operators.text import span_dedup

    shared = "a b c d e f g h"  # exactly one 8-token span
    rows = [(1, shared + " x1 y1"), (2, shared + " x2 y2"), (3, "fresh words only here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in span_dedup(df, "doc_id", "text", 8).collect()}
    # doc 1 is the first occurrence -> keeps both spans
    assert out[1].clean_text == shared + " x1 y1"
    # doc 2 loses the shared span but keeps its tail
    assert out[2].clean_text == "x2 y2"
    assert out[2].n_spans == 2 and out[2].n_kept == 1
    # untouched doc is identity
    assert out[3].clean_text == "fresh words only here"
    # conservation: kept spans across corpus == distinct spans
    assert sum(r.n_kept for r in out.values()) == 4


def test_ngram_lm_score_smoothing_semantics(spark):
    """Hand-checkable bigram LM: corpus 'a b a b' + 'a c' — V=3,
    c1(a)=3, c2(a,b)=2, so pair (a,b) scores ln(3/6); an unseen-but-
    valid pair (b,a) scores ln(2/5)... pinned against exact math."""
    import math

    from dask_obj_spark.operators.text import ngram_lm_fit, ngram_lm_score

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], ["doc_id", "text"]
    )
    uni, big, v = ngram_lm_fit(df, "text")
    assert v == 3  # vocabulary {a, b, c}
    got = {
        r["doc_id"]: (r["n_pairs"], r["logp_x1m"])
        for r in ngram_lm_score(df, "doc_id", "text", uni, big, v).collect()
    }
    # doc 1 pairs: (a,b) x2, (b,a) x1.  c1(a)=3, c1(b)=2, c2(a,b)=2, c2(b,a)=1
    lp_ab = math.floor(math.log((2 + 1) / (3 + 3)) * 1e6)
    lp_ba = math.floor(math.log((1 + 1) / (2 + 3)) * 1e6)
    assert got[1] == (3, 2 * lp_ab + lp_ba)
    # doc 2 pair: (a,c), c2(a,c)=1 → ln(2/6)
    lp_ac = math.floor(math.log((1 + 1) / (3 + 3)) * 1e6)
    assert got[2] == (1, lp_ac)


def test_ngram_lm_pruned_model_backs_off_monotonically(spark):
    """Pruning the bigram table only ever LOWERS scores (a pruned pair
    backs off to the unseen-pair smoothing mass), and K=∞ equals the
    unpruned fit exactly."""
    from dask_obj_spark.operators.text import ngram_lm_fit, ngram_lm_score

    df = spark.createDataFrame(
        [(1, "a b a b c a"), (2, "b c b a")], ["doc_id", "text"]
    )
    def score(k):
        uni, big, v = ngram_lm_fit(df, "text", top_k_bigrams=k)
        return {
            r["doc_id"]: r["logp_x1m"]
            for r in ngram_lm_score(df, "doc_id", "text", uni, big, v).collect()
        }

    full = score(None)
    assert score(10_000) == full  # K beyond vocab — identical
    pruned = score(2)
    for d in full:
        assert pruned[d] <= full[d]
    assert any(pruned[d] < full[d] for d in full)


def test_hashed_classifier_exact_integer_logits(spark):
    """The classifier's logit must equal the hand-computed sum of the
    deterministic stub weights over unigram+bigram hashed features,
    the mean must use truncation division (matching DuckDB //), and
    the label must flip with the margin."""
    import hashlib

    from dask_obj_spark.operators.text import (
        _CLS_MOD,
        _CLS_MULT,
        _CLS_SHIFT,
        CLS_BUCKETS,
        hashed_classifier_score,
    )

    def w_of(gram: str) -> int:
        h = int(hashlib.md5(f"{gram}#cls".encode()).hexdigest()[:15], 16)
        b = h % CLS_BUCKETS
        return (b * _CLS_MULT) % _CLS_MOD - _CLS_SHIFT

    df = spark.createDataFrame(
        [(1, "red fox"), (2, "red red")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r
        for r in hashed_classifier_score(df, "doc_id", "text").collect()
    }
    for doc_id, grams in (
        (1, ["red", "fox", "red fox"]),
        (2, ["red", "red", "red red"]),
    ):
        want = sum(w_of(g) for g in grams)
        assert got[doc_id].n_grams == 3
        assert got[doc_id].logit_u == want
        # truncation division (Spark div == DuckDB // on negatives)
        q = abs(want) // 3
        assert got[doc_id].mean_logit_u == (q if want >= 0 else -q)
        assert got[doc_id].label == (1 if got[doc_id].mean_logit_u > 0 else 0)
    # margin above everything → all labels 0
    hi = hashed_classifier_score(df, "doc_id", "text", margin_u=600000)
    assert all(r.label == 0 for r in hi.collect())


def test_word_entropy_hand_computed(spark):
    """Uniform words → ln(k) micro-nats; one repeated word → 0;
    skewed mix matches the closed form; case-insensitive."""
    import math

    from dask_obj_spark.operators.text import word_entropy

    df = spark.createDataFrame(
        [
            (1, "a b c d"),          # uniform over 4 -> ln 4
            (2, "x x x X"),          # one word (lowercased) -> 0
            (3, "a a b"),            # H = ln3 - (2 ln2)/3
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in word_entropy(df, "doc_id", "text").collect()}
    assert got[1].n_tokens == 4 and got[1].n_distinct == 4
    assert got[1].entropy_x1m == math.floor(math.log(4) * 1e6)
    assert got[2].n_distinct == 1 and got[2].entropy_x1m == 0
    want3 = math.floor(math.log(3) * 1e6) - math.floor(
        2.0 * math.log(2.0) * 1e6
    ) // 3
    assert got[3].entropy_x1m == want3


def test_filter_agreement_splits_mass_by_both_gates(spark):
    """Docs engineered to span quality deciles must land in distinct
    (cls_keep, q_decile) cells, total mass conserved."""
    from dask_obj_spark.operators.text import filter_agreement

    rows = [
        (1, "the cat is on the mat and it is a fine day for the dog"),
        (2, "@@@ ### !!! $$$ %%% ^^^ &&& *** ((( )))"),
        (3, "the quick brown fox jumps over the lazy dog again and again"),
        (4, "zzz"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = filter_agreement(df, "doc_id", "text").collect()
    assert sum(r.n_docs for r in got) == 4
    deciles = {r.q_decile for r in got}
    assert len(deciles) >= 2  # junk and prose separate
    assert all(r.cls_keep in (0, 1) and 0 <= r.q_decile <= 9 for r in got)


def test_readability_hand_computed(spark):
    """Counts and the Flesch fold match the closed form; empty text
    degenerates to the constant term with zero counts."""
    import math

    from dask_obj_spark.operators.text import readability_scores

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, None)], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in readability_scores(df, "doc_id", "text").collect()}
    r = got[1]
    assert (r.n_words, r.n_sentences) == (6, 2)
    # vowel groups: e,a,a,e,o,a  -> 6
    assert r.n_syllables == 6
    want = math.floor((206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)) * 1000)
    assert r.flesch_x1k == want
    assert got[2].n_words == 0 and got[2].n_syllables == 0
    assert got[2].flesch_x1k == math.floor(206.835 * 1000)


def test_code_detect_separates_code_from_prose(spark):
    """A code snippet must out-score plain prose decisively; counts
    match hand inspection."""
    from dask_obj_spark.operators.text import code_detect

    code = "def foo_bar(x):\n    if x <= 3:\n        return my_list[x];\n"
    prose = "the cat sat on the mat and looked at the dog for a while"
    df = spark.createDataFrame([(1, code), (2, prose)], ["doc_id", "text"])
    got = {r.doc_id: r for r in code_detect(df, "doc_id", "text").collect()}
    assert got[1].n_indented == 2          # two 4-space-indented lines
    assert got[1].n_idents >= 2            # foo_bar, my_list
    assert got[1].n_sym >= 6               # ( ) : ; [ ] < =
    assert got[2].n_sym == 0 and got[2].n_indented == 0
    assert got[1].code_score_u > 10 * max(got[2].code_score_u, 1)
