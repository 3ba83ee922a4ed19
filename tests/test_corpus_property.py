"""Reference-implementation tests for operators/corpus.py: pseudo-random
(seeded, deterministic) inputs, exact comparison against a straight-line
Python replay of the operator's contract.  Stronger than invariant
checks — any drift between the distributed plan and the specification
shows up as a value diff.
"""

from __future__ import annotations

import hashlib
import math
import random

from dask_obj_spark.operators.corpus import (
    mix_rebalance,
    pack_bins,
    quantize_embeddings_int8,
    weighted_sample,
)


def _porthash(s: str, salt: str) -> int:
    return int(hashlib.md5(f"{s}#{salt}".encode()).hexdigest()[:15], 16)


def _mk_docs(n=200, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        n_tok = rng.randint(1, 40)
        rows.append((i, " ".join(f"w{rng.randint(0, 50)}" for _ in range(n_tok)),
                     f"s{rng.randint(0, 3)}"))
    return rows


def test_pack_bins_matches_python_reference(spark):
    rows = _mk_docs()
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"]).repartition(8)
    got = {
        r["doc_id"]: (r["n_tokens"], r["cum_tokens"], r["bin_id"])
        for r in pack_bins(df, "doc_id", "text", "source", 64).collect()
    }
    # reference replay: per source, in id order, exclusive-prefix // budget
    expect = {}
    by_src: dict[str, list[tuple[int, int]]] = {}
    for i, text, src in rows:
        by_src.setdefault(src, []).append((i, len(text.split())))
    for src, docs in by_src.items():
        cum = 0
        for i, n_tok in sorted(docs):
            cum += n_tok
            expect[i] = (n_tok, cum, (cum - n_tok) // 64)
    assert got == expect


def test_quantize_int8_matches_python_reference(spark):
    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-5, 5) for _ in range(16)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(6)
    got = {
        r["vec_id"]: (r["scale"], r["q_min"], r["q_max"], r["q_sum"])
        for r in quantize_embeddings_int8(df, "vec_id", "embedding").collect()
    }
    expect = {}
    for i, vec in rows:
        amax = max(abs(x) for x in vec)
        qs = [math.floor(x / (amax / 127.0) + 0.5) for x in vec]
        expect[i] = (round(amax / 127.0, 6), min(qs), max(qs), sum(qs))
    assert got == expect


def test_weighted_sample_matches_python_reference(spark):
    rng = random.Random(3)
    rows = [(i, round(rng.random(), 6)) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "score"]).repartition(8)
    got = sorted(r["doc_id"] for r in weighted_sample(df, "doc_id", "score").collect())
    expect = sorted(
        i for i, s in rows
        if _porthash(str(i), "wsamp") % 1000000 < math.floor(s * 1000000.0)
    )
    assert got == expect


def test_mix_rebalance_matches_python_reference(spark):
    rng = random.Random(5)
    langs = ["en", "de", "fr"]
    rows = [(i, rng.choice(langs)) for i in range(300)]
    weights = {"en": 0.25, "de": 0.75}
    df = spark.createDataFrame(rows, ["doc_id", "lang"]).repartition(8)
    got = sorted(
        r["doc_id"]
        for r in mix_rebalance(df, "doc_id", "lang", weights, 1.0).collect()
    )
    expect = sorted(
        i for i, lang in rows
        if _porthash(str(i), "mix") % 1000000
        < math.floor(weights.get(lang, 1.0) * 1000000.0)
    )
    assert got == expect
