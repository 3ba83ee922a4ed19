"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``dask_obj_spark`` (see SURVEY.md §2 for the
operator inventory each query demonstrates).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: value-frequency ``counts``
    over events.event_type (SURVEY.md §7 step 0 — source → projection →
    two-phase hash agg)."""
    from dask_obj_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    return QUERIES["counts_event_type"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dask_obj_spark.queries import QUERIES, load_all_queries

    load_all_queries()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (the correctness gate)."""
    from dask_obj_spark.queries import ORACLE, load_all_queries

    load_all_queries()
    return dict(ORACLE)
