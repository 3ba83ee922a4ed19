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
