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
# Round-10 window = the 5 never-driven round-9 queries first, then the
# oldest official records (r4-r5-era graph/profile/tpch/ts families),
# exactly as emitted by `python tools/rolling_window.py --tuple` after
# the r9 driver rows landed.
_WINDOW_50 = (
    "sim_matryoshka_recall",
    "corpus_bpe_roundtrip",
    "corpus_epoch_schedule",
    "stream_quality_psi",
    "stream_contamination_guard",
    "sim_pca_topk",
    "sim_label_propagation",
    "sim_knn_kcore",
    "graph_bfs_hops",
    "graph_link_prediction",
    "dedup_fuzzy_names",
    "dedup_prefix_jaccard",
    "dedup_sorted_neighborhood",
    "dedup_minhash_est_error",
    "text_zipf_fit",
    "text_bm25_topk",
    "text_bigram_perplexity",
    "text_perplexity_buckets",
    "corpus_bpe_compression",
    "graph_pagerank_fixed",
    "corpus_mix_temperature",
    "graph_hits_fixed",
    "skew_salted_join",
    "window_sliding_distinct_users",
    "sim_ndcg_ivf",
    "sim_mmr_topk",
    "sketch_countmin_freq",
    "incremental_agg_merge",
    "incremental_agg_minmax",
    "profile_table_checksum",
    "profile_equidepth_histogram",
    "basket_item_pairs",
    "profile_mutual_information",
    "stats_spearman_corr",
    "profile_kl_drift",
    "profile_dp_release",
    "profile_key_skew_gini",
    "tpch_q2_min_cost_supplier",
    "tpch_q8_market_share",
    "tpch_q13_customer_distribution",
    "tpch_q17_small_quantity_revenue",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales",
    "layout_hilbert_keys",
    "join_bloom_prefilter",
    "ts_resample_interpolate",
    "ts_trend_per_user",
    "ts_user_entropy",
    "ts_changepoint_cusum",
    "ts_seasonal_profile",
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
