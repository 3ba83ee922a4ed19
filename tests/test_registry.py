"""Registry hygiene: the round-7 verdict found that ``query()`` let a
second registration of ``sim_random_projection`` silently SHADOW the
r4 query of the same name, so the old query body became unreachable
while its stale official record kept counting.  These tests pin the
fix: duplicates raise at import time, both JL queries are live, and
the window contract still holds.
"""

from __future__ import annotations

import pytest

from dask_obj_spark.queries import ORACLE, QUERIES, _WINDOW_50, load_all_queries, query


def test_duplicate_registration_raises():
    load_all_queries()
    some_name = next(iter(QUERIES))
    with pytest.raises(ValueError, match="duplicate query registration"):
        query(some_name)(lambda spark, sf_dir: None)


def test_both_jl_queries_are_live():
    load_all_queries()
    # r4 distance-preservation-ratio query
    assert "sim_random_projection" in QUERIES
    assert "sim_random_projection" in ORACLE
    # r7 projected-coordinates query (renamed in r8 off the collision)
    assert "sim_jl_projection_coords" in QUERIES
    assert "sim_jl_projection_coords" in ORACLE
    a = QUERIES["sim_random_projection"]
    b = QUERIES["sim_jl_projection_coords"]
    assert a is not b


def test_window_50_is_the_first_50_registered():
    load_all_queries()
    assert list(QUERIES)[: len(_WINDOW_50)] == list(_WINDOW_50)
    assert len(_WINDOW_50) == 50
    # every window name must be a registered query (a typo here would
    # silently shrink the driver's official check)
    missing = [n for n in _WINDOW_50 if n not in QUERIES]
    assert not missing


def test_bench_adaptive_warmup_requires_two_consecutive_settled():
    """r13 verdict #7: a single mid-descent GC hiccup reads as
    "settled" under the >25% rule — the warmup must see TWO
    consecutive settled runs before handing off to the timed runs,
    and still cap at ADAPTIVE_WARMUP_MAX extras."""
    import os
    import sys

    # repo root derived from this file, not hardcoded (r14 advice):
    # conftest.py already inserts it, but keep the import self-contained
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import bench as B

    def scripted(seq):
        it = iter(seq)
        return lambda: next(it)

    # monotone descent then steady: 10 → 4 → 2 → 2 → 2; the fixed
    # warmup saw 10.  Settles after the two consecutive 2s (hiccup-free
    # path costs exactly ADAPTIVE_SETTLED_RUNS extra runs once steady).
    w = B.adaptive_warmup([10.0], scripted([4.0, 2.0, 2.0, 2.0, 2.0]))
    assert w == [10.0, 4.0, 2.0, 2.0, 2.0]  # stopped before the 5th

    # bimodal trap: run 2 is a GC hiccup (8.0 "settled" vs best 10.0)
    # but the row is still descending — one settled run must NOT stop
    # the warmup; the hiccup resets the streak and descent continues
    w = B.adaptive_warmup([10.0], scripted([8.0, 3.0, 1.5, 1.5, 1.5]))
    assert w == [10.0, 8.0, 3.0, 1.5, 1.5, 1.5]

    # already steady on entry: two settled runs, then stop
    w = B.adaptive_warmup([2.0], scripted([2.0, 2.0, 2.0]))
    assert w == [2.0, 2.0, 2.0]

    # pathological never-settling descent: hard cap at MAX extras
    w = B.adaptive_warmup([100.0], scripted([50.0, 25.0, 12.0, 6.0, 3.0, 1.5]))
    assert len(w) == 1 + B.ADAPTIVE_WARMUP_MAX
