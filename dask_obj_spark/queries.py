"""Query registry: the driver-facing catalog of implemented operators.

Every operator from SURVEY.md §2 that is demonstrable as a query gets a
``@query("name", oracle="...sql...")`` registration here or in the
operator modules; ``__spark_entry__.py`` re-exports the registry.  The
oracle SQL is ANSI SQL executable by DuckDB over the same parquet tables
— the correctness gate (row count + schema + order-insensitive value
hash at sf0.01).

Column-name contract: every computed/aggregate column is aliased
IDENTICALLY in the Spark query and the oracle SQL.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all_queries() -> None:
    """Import every module that registers queries (idempotent)."""
    import dask_obj_spark.queries_core  # noqa: F401
    import dask_obj_spark.queries_relational  # noqa: F401
    import dask_obj_spark.queries_tierd  # noqa: F401
    import dask_obj_spark.operators.corpus  # noqa: F401
    import dask_obj_spark.operators.dedup  # noqa: F401
    import dask_obj_spark.operators.similarity  # noqa: F401
    import dask_obj_spark.operators.scale  # noqa: F401
    import dask_obj_spark.operators.text  # noqa: F401
    import dask_obj_spark.operators.multimodal  # noqa: F401
    import dask_obj_spark.streaming.windows  # noqa: F401
