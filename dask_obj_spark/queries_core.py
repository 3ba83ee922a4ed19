"""Core-facade queries (SURVEY.md Tier A/B/C demonstrated on driver data).

Each query exercises an ObjectFrame/Expr capability end-to-end through
Catalyst, with a DuckDB oracle proving the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_obj_spark.core import ObjectFrame
from dask_obj_spark.expr import Expr, compile_expr
from dask_obj_spark.queries import query
from dask_obj_spark.sources import load_table


@query(
    "counts_event_type",
    oracle="SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",
)
def counts_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 ``counts``: two-phase hash aggregate (partial+final), the same
    shape the reference builds by hand with counter/sum_counts
    (``src/dask_obj/core.py:19-31,107-108``).

    Returned as a DataFrame (event_type, cnt) for the oracle; the
    ``Counter``-returning facade is ``ObjectFrame.counts`` (unit-tested).
    """
    events = ObjectFrame(load_table(spark, sf_dir, "events"))
    return events.agg_by("event_type", F.count(F.lit(1)).alias("cnt")).df


@query(
    "attr_projection",
    oracle="SELECT c_name AS value FROM customer",
)
def attr_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 broadcast attribute access → column pruning at the scan."""
    customers = ObjectFrame(load_table(spark, sf_dir, "customer"))
    return customers.c_name.df


@query(
    "pluck_multi",
    oracle="SELECT o_orderkey, o_totalprice FROM orders",
)
def pluck_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 list-of-keys pluck → multi-column projection."""
    orders = ObjectFrame(load_table(spark, sf_dir, "orders"))
    plucked = orders[["o_orderkey", "o_totalprice"]]
    # unwrap the struct for a named-column oracle comparison
    return plucked.df.select(
        F.col("value.o_orderkey").alias("o_orderkey"),
        F.col("value.o_totalprice").alias("o_totalprice"),
    )


@query(
    "expr_arithmetic",
    oracle="SELECT l_orderkey, l_extendedprice * (1 - l_discount) AS revenue "
    "FROM lineitem WHERE l_quantity > 30",
)
def expr_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6/B8 operator broadcasting: a recorded Expr compiled to Column
    arithmetic (JVM-side, no Python in the loop)."""
    li = load_table(spark, sf_dir, "lineitem")
    e = Expr("l_extendedprice") * (1 - Expr("l_discount"))
    revenue = compile_expr(e)
    return li.filter(F.col("l_quantity") > 30).select(
        "l_orderkey", revenue.alias("revenue")
    )


@query(
    "expr_method_dispatch",
    oracle="SELECT upper(c_mktsegment) AS seg, count(*) AS cnt "
    "FROM customer GROUP BY upper(c_mktsegment)",
)
def expr_method_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 call capture + dispatch table: ``.upper()`` runs as F.upper
    (JVM), not a Python UDF."""
    cust = load_table(spark, sf_dir, "customer")
    e = Expr("c_mktsegment").upper()
    seg = compile_expr(e)
    return cust.groupBy(seg.alias("seg")).agg(F.count(F.lit(1)).alias("cnt"))


@query(
    "flatten_embeddings",
    oracle="SELECT count(*) AS n FROM (SELECT unnest(embedding) FROM embeddings)",
)
def flatten_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 flatten/explode over the embedding arrays (BASELINE B5)."""
    emb = ObjectFrame(load_table(spark, sf_dir, "embeddings"))
    flat = emb.embedding.flatten()
    return flat.df.agg(F.count(F.lit(1)).alias("n"))


@query(
    "map_computed_column",
    oracle="SELECT o_orderkey, o_totalprice * 1.1 AS gross FROM orders",
)
def map_computed_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 map + B8 operator broadcasting, expressed columnar: the facade
    compiles ``frame * 1.1`` to Column arithmetic in the same plan as the
    key projection (no Python in the loop, no zip shuffle)."""
    orders = load_table(spark, sf_dir, "orders")
    e = Expr("o_totalprice") * 1.1
    return orders.select("o_orderkey", compile_expr(e).alias("gross"))


@query(
    "facade_tree_reduction",
    oracle="""
    SELECT count(*)::BIGINT AS n_elements,
           4096 AS n_partitions,
           true AS fanin_within_bound
    FROM events
    """,
)
def facade_tree_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 ``reduction`` at HIGH partition count — the r4-verdict lock
    on the executor-side tree combine (core.py): events spread over
    4096 partitions, perpartition = len, aggregate = sum, split_every=8,
    tree=True.  The combine rounds run as tiny keyed shuffles
    (treeAggregate-style, 4096 → 512 → 64 → ≤8), so the driver receives
    at most ``split_every`` partials — the BOUND is emitted as a boolean
    and checked by the oracle (a bound, not equality: empty input
    partitions leave gaps in the contiguous ``i // split_every`` keying,
    so the exact fan-in can be < 8 at small scale factors while the
    ≤ 8 contract always holds), alongside the exact element count.
    This is the registered face of the 10k-partition unit test and
    bench row b28: at 100k+ partitions the driver collect would
    otherwise become the reduction's bottleneck."""
    ev = load_table(spark, sf_dir, "events").select("event_id").repartition(4096)
    of = ObjectFrame(ev)
    total = of.reduction(
        lambda items: len(items), sum, split_every=8, tree=True
    )
    fanin = of._last_reduction_driver_fanin
    return spark.createDataFrame(
        [(int(total), 4096, bool(fanin <= 8))],
        "n_elements bigint, n_partitions int, fanin_within_bound boolean",
    )


@query("delayed_map_fleet_rowsonly")
def delayed_map_fleet_rowsonly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier-B facade under the driver (the only tier with no query-level
    official record until round 6): a 25-task ``DelayedObjects`` fleet —
    one eager per-item task per nation row (B1/B4) — maps item-first
    (B2), drains in COMPLETION order via ``__iter__`` (B6), then
    re-computes in original order (B3); ``len`` is B7.  Emits the fleet
    size, result count, an order-insensitive checksum, and a flag that
    the completion-order drain saw exactly the ordered results as a
    multiset.  Rows-only: thread-pool task execution has no SQL form;
    the operator-dunder/broadcast surface (B5/B8) is pinned by
    tests/test_delayed.py."""
    from dask_obj_spark.delayed import DelayedObjects

    rows = load_table(spark, sf_dir, "nation").orderBy("n_nationkey").collect()
    fleet = DelayedObjects(rows, eager=True)
    lengths = fleet.map(lambda r: len(r.n_name) * (r.n_regionkey + 1))
    drained = sorted(lengths)  # completion-order iteration (B6)
    ordered = lengths.compute()  # original submission order (B3)
    ok = sorted(ordered) == drained
    return spark.createDataFrame(
        [(len(fleet), len(ordered), int(sum(ordered)), bool(ok))],
        "n_tasks int, n_results int, len_checksum int, completion_matches boolean",
    )
