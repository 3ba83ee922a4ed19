"""TPC-H completion battery (SURVEY.md §2 Tier E — SQL entry point /
relational completeness).

Rounds 1-3 covered the TPC-H shapes Q1/3/5/6/10/14/18/19; this module
adds the remaining fourteen query SHAPES, adapted to the reduced star
schema the driver generates (TESTDATA.md: no ``partsupp`` table, no
commit/receipt dates, no phone column).  Each adaptation preserves the
structural feature that makes the original query interesting —
correlated-min subqueries (Q2), EXISTS semi-joins (Q4), nation-pair
self-joins (Q7), market-share ratio-of-conditional-sums (Q8),
multi-fact profit rollup (Q9), scalar-subquery thresholds (Q11),
CASE-bucketed line counting (Q12), outer-join histograms (Q13),
argmax-by-scalar-subquery (Q15), NOT-IN anti-join + count-distinct
(Q16), per-group correlated averages (Q17), nested-IN quantity shares
(Q20), exists/not-exists rewritten as group algebra (Q21), and
anti-join + above-average filters (Q22) — and documents the column
substitution it makes.

Numeric determinism: every threshold comparison that involves a
floating aggregate either (a) multiplies through so both sides are
exact-in-double integer sums (l_quantity is integral), or (b) uses the
repo's floor-quantization pattern (PLANS.md "cross-engine numerics") so
no engine-specific rounding-tie semantics are involved.

Reference parity note: the reference (``src/dask_obj/core.py``) exposes
these shapes through ``dask.bag`` fold/group/join compositions; here
each is a single declarative DataFrame plan that Catalyst optimizes
(broadcast dims, partial aggregation, semi/anti joins, pushdown).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_obj_spark.queries import query
from dask_obj_spark.sources import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH eu_supp AS (
      SELECT s_suppkey, s_name, n_name
      FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    offers AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_price
      FROM lineitem JOIN eu_supp ON l_suppkey = s_suppkey
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, min(unit_price) AS best_price
      FROM offers GROUP BY l_partkey
    )
    SELECT p.p_partkey, p.p_brand, e.s_name, e.n_name,
           CAST(floor(o.unit_price * 10000.0) AS BIGINT) AS best_price_x10k
    FROM offers o
      JOIN best b ON o.l_partkey = b.l_partkey AND o.unit_price = b.best_price
      JOIN part p ON p.p_partkey = o.l_partkey
      JOIN eu_supp e ON e.s_suppkey = o.l_suppkey
    WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'LARGE'
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (min-cost supplier): the correlated-min subquery
    ("supplier whose cost equals the region-wide minimum for the part")
    rewritten as aggregate + self-equi-join on the min — the scalable
    form of a correlated subquery.  Substitution: no ``partsupp``, so
    the part↔supplier offer relation is derived from lineitem unit
    prices (min l_extendedprice/l_quantity per pair); division is a
    single IEEE op, bit-identical on both engines, so the min-equality
    join is deterministic.  The readout is floor-quantized to
    basis-point units (floor(x·1e4) BIGINT, the repo's standing rule)
    — round(x, 4) cracked at sf0.1 on a tie landing on the Spark
    HALF_UP / DuckDB half-even divergence.  Scale: the offers
    aggregate shuffles on (partkey, suppkey) with map-side partials;
    part and the EU supplier dim broadcast; no sort anywhere."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    eu = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    offers = (
        li.join(F.broadcast(eu.select("s_suppkey")),
                li["l_suppkey"] == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"))
    )
    best = offers.groupBy("l_partkey").agg(F.min("unit_price").alias("best_price"))
    pf = p.filter(F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE"))
    return (
        offers.join(
            best.withColumnRenamed("l_partkey", "bk"),
            (F.col("l_partkey") == F.col("bk"))
            & (F.col("unit_price") == F.col("best_price")),
        )
        .join(F.broadcast(pf), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(eu), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "p_partkey", "p_brand", "s_name", "n_name",
            F.floor(F.col("unit_price") * 10000.0)
            .cast("bigint")
            .alias("best_price_x10k"),
        )
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape (order priority checking): correlated EXISTS →
    left-semi join with a cross-table residual predicate.  Substitution:
    no commit/receipt dates, so "late line" = shipped more than 30 days
    after the order date (same orders↔lineitem correlated-date shape).
    Scale: semi join emits at most one probe hit per order and carries
    only the 8-byte key + two dates; the date filter on orders is pushed
    to the scan so the build side is one quarter's keys."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    of = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    return (
        of.join(
            li,
            (of["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > of["o_orderdate"] + F.expr("INTERVAL 30 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping): bidirectional nation-pair
    filter over a 5-way star join, revenue by (supplier nation,
    customer nation, year).  The nation dim joins twice under different
    roles — both broadcast; Catalyst derives the per-side IN('NATION_1',
    'NATION_2') implication from the pair disjunction and prunes both
    dimension branches before the fact join.  Scale: one shuffle for
    orders↔lineitem (the only fact-fact edge); everything else
    broadcasts."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        j.filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): ratio of a conditional
    sum to a total sum per year — one aggregation computes both legs
    (no second scan, no self-join).  Customer nation restricts the
    market (ASIA region); supplier nation is the share dimension.
    Scale: the p_type filter broadcasts a pruned part dim that
    semi-reduces lineitem FIRST (the most selective edge); the single
    fact-fact shuffle is orders↔lineitem; the ratio is computed
    post-aggregation on 7 rows."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rk"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    asia = r.filter(F.col("r_name") == "ASIA")
    econ = p.filter(F.col("p_type") == "ECONOMY")
    j = (
        li.join(F.broadcast(econ), li["l_partkey"] == econ["p_partkey"], "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(asia), F.col("n1_rk") == F.col("r_regionkey"), "left_semi")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "nation")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q9_product_profit",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.1 * p_retailprice * l_quantity AS amount
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def tpch_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit): profit per supplier nation
    per year over a part-name wildcard.  Substitution: no
    ``ps_supplycost``, so cost is proxied as 10% of p_retailprice per
    unit — preserving the two-sided expression (revenue term from
    lineitem, cost term from a joined dim).  Scale: the LIKE filter
    cannot push below the dictionary scan but prunes part before the
    broadcast; orders↔lineitem is the one shuffle; the aggregate is
    (25 nations × 7 years) rows."""
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    red = p.filter(F.col("p_name").like("%red%"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(red), li["l_partkey"] == red["p_partkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


@query(
    "tpch_q11_important_parts",
    oracle="""
    WITH pv AS (
      SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS value
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      GROUP BY l_partkey
    )
    SELECT l_partkey, round(value, 2) AS part_value
    FROM pv
    WHERE value > (SELECT 2.5 * avg(value) FROM pv)
    """,
)
def tpch_q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (important stock identification): per-part value
    filtered against a scalar-subquery threshold over the same view.
    Substitution: no partsupp, so value = revenue shipped by the three
    nations' suppliers.  r14 review fix: the original FRACTION-OF-TOTAL
    threshold (value > 0.002·sum) was VACUOUS — per-part share scales
    as 1/N_parts, so it returned 0 rows at every driver scale factor
    and the oracle agreed vacuously (the one green the parity gate
    cannot distinguish from a real one).  TPC-H itself scales the Q11
    fraction by 1/SF for exactly this reason; the scale-invariant
    adaptation is a MULTIPLE OF THE MEAN per-part value (2.5×, ~2% of
    parts selected at every SF), preserving the structural feature —
    a scalar subquery over the aggregate view it filters.  The scalar
    is a 1-row aggregate broadcast-crossed against the per-part
    aggregate — no driver collect; at 100 TB you would .persist() pv.
    Tie risk: the threshold is a continuous multiple of a double mean —
    a part landing within one ulp has measure zero (PLANS.md)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    nf = n.filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
    supp = s.join(F.broadcast(nf), s["s_nationkey"] == nf["n_nationkey"], "left_semi")
    pv = (
        li.join(F.broadcast(supp.select("s_suppkey")),
                li["l_suppkey"] == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    thr = pv.agg((F.avg("value") * F.lit(2.5)).alias("thr"))
    return (
        pv.crossJoin(F.broadcast(thr))
        .filter(F.col("value") > F.col("thr"))
        .select("l_partkey", F.round("value", 2).alias("part_value"))
    )


@query(
    "tpch_q12_shipmode_lateness",
    oracle="""
    SELECT ship_bucket,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY THEN 'FAST'
                  WHEN l_shipdate <= o_orderdate + INTERVAL 90 DAY THEN 'NORMAL'
                  ELSE 'SLOW' END AS ship_bucket
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
    ) lines
    GROUP BY ship_bucket
    """,
)
def tpch_q12_shipmode_lateness(spark, sf_dir):
    """TPC-H Q12 shape (shipping modes / priority): CASE-bucketed line
    classification crossed with conditional priority counting.
    Substitution: no l_shipmode or commit/receipt dates — the bucket is
    derived ship latency (shipdate − orderdate), the same
    derived-category + conditional-sum structure.  Scale: one
    orders↔lineitem shuffle; the year filter pushes to the lineitem
    scan; output is 3 rows."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    lf = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    j = o.join(lf, o["o_orderkey"] == lf["l_orderkey"])
    bucket = (
        F.when(F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"), "FAST")
        .when(F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"), "NORMAL")
        .otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.select(bucket.alias("ship_bucket"), "o_orderpriority")
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape (customer order-count distribution): left outer
    join with an extra join-condition predicate (NOT a post-filter —
    customers with only excluded orders must still appear with count 0),
    then a histogram of the per-customer counts.  Substitution: the
    o_comment NOT LIKE filter becomes an order-priority exclusion.
    Scale: two shuffles (join on custkey, then the tiny count-of-counts
    re-aggregation); count(o_orderkey) counts non-null probe hits so
    the outer-null rows land in bucket 0."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    j = c.join(
        o,
        (c["c_custkey"] == o["o_custkey"]) & (o["o_orderpriority"] != "5-LOW"),
        "left_outer",
    )
    per = j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier / argmax by scalar subquery): the
    revenue view computed once, its max taken as a 1-row broadcast, and
    the equality filter returning every tying supplier (the reason Q15
    is not just a LIMIT 1).  Revenue is rounded BEFORE the max/equality
    so both engines compare identical 2-dp values — the equality join
    is then exact.  Scale: rev is a 100-row aggregate; the max leg and
    the filter leg both reuse it; supplier broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q16_supplier_count",
    oracle="""
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_count(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): NOT-IN subquery →
    anti join (sound here because s_suppkey is non-null — documented,
    since NOT IN over a nullable column is NOT an anti join), negated
    dim filters, count-distinct per part classification.  Substitution:
    the part↔supplier relation derives from lineitem; the "complaints"
    comment filter becomes a negative-balance supplier exclusion.
    Scale: the excluded-supplier build side is tiny and broadcasts; the
    count-distinct shuffles (brand,type,size,suppkey) once (partial
    dedup map-side) then re-aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    pf = p.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(pf), li["l_partkey"] == pf["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
      JOIN part ON p_partkey = l.l_partkey
      JOIN (SELECT l_partkey, count(*) AS cnt, sum(l_quantity) AS sq
            FROM lineitem GROUP BY l_partkey) pa
        ON pa.l_partkey = l.l_partkey
    WHERE p_brand = 'Brand#2' AND p_size < 10
      AND 2 * l.l_quantity * pa.cnt < pa.sq
    """,
)
def tpch_q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): correlated
    per-part average — "lines below half the part's average quantity" —
    rewritten as aggregate + join.  The comparison multiplies through
    (2·qty·cnt < sum) so both sides are integer-valued doubles (exact:
    l_quantity is integral), eliminating the cross-engine avg-division
    ulp tie the repo documents in PLANS.md.  Substitution: p_container
    → p_size filter.  Scale: the per-part aggregate shuffles lineitem
    once on partkey; the brand filter broadcasts; at 100 TB you'd
    semi-filter the aggregate to the brand's partkeys first — Catalyst
    cannot infer that, so the plan does it explicitly."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    pf = p.filter((F.col("p_brand") == "Brand#2") & (F.col("p_size") < 10))
    # explicit semi-reduction: only the selected parts' statistics are needed
    pa = (
        li.join(F.broadcast(pf.select("p_partkey")),
                li["l_partkey"] == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("l_quantity").alias("sq"))
        .withColumnRenamed("l_partkey", "pa_partkey")
    )
    return (
        li.join(F.broadcast(pf), li["l_partkey"] == pf["p_partkey"])
        .join(F.broadcast(pa), li["l_partkey"] == F.col("pa_partkey"))
        .filter(2 * F.col("l_quantity") * F.col("cnt") < F.col("sq"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "tpch_q20_promotion_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_suppkey, l_partkey
    ),
    tot AS (
      SELECT l_partkey, sum(qty) AS total_qty FROM shipped GROUP BY l_partkey
    )
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_4'
      AND s_suppkey IN (
        SELECT sh.l_suppkey
        FROM shipped sh
          JOIN tot ON tot.l_partkey = sh.l_partkey
          JOIN part ON p_partkey = sh.l_partkey
        WHERE p_name LIKE '%red%' AND 2 * sh.qty > tot.total_qty
      )
    """,
)
def tpch_q20_promotion_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion): nested IN-subqueries
    → a chain of semi joins; "suppliers who shipped more than half of a
    red part's yearly volume".  Substitution: no partsupp availability
    (ps_availqty > half shipped) — the dominance condition compares the
    supplier's shipped share against the part total instead, preserving
    the aggregate-vs-aggregate inner predicate.  Quantity sums are
    integral-exact so 2·qty > total is deterministic.  Scale: shipped
    is one (suppkey, partkey) aggregate; tot reuses it; the final IN
    collapses to a semi join on a 100-key build side."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    tot = shipped.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty")).withColumnRenamed(
        "l_partkey", "t_partkey"
    )
    red = p.filter(F.col("p_name").like("%red%")).select("p_partkey")
    dominant = (
        shipped.join(F.broadcast(red), shipped["l_partkey"] == red["p_partkey"], "left_semi")
        .join(tot, F.col("l_partkey") == F.col("t_partkey"))
        .filter(2 * F.col("qty") > F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n.filter(F.col("n_name") == "NATION_4")),
               s["s_nationkey"] == F.col("n_nationkey"))
        .join(dominant, s["s_suppkey"] == dominant["l_suppkey"], "left_semi")
        .select("s_name", "n_name")
    )


@query(
    "tpch_q21_waiting_supplier",
    oracle="""
    WITH per AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey
    ),
    ord AS (
      SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
      FROM per GROUP BY l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM per
      JOIN ord ON ord.l_orderkey = per.l_orderkey
      JOIN supplier ON s_suppkey = per.l_suppkey
    WHERE per.late = 1 AND ord.n_supp > 1 AND ord.n_late = 1
    GROUP BY s_name
    """,
)
def tpch_q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    EXISTS ("another supplier participated") + NOT EXISTS ("no other
    supplier was also late") pair rewritten as per-order group algebra
    — n_supp > 1 ∧ n_late = 1 ∧ this supplier late — which is both
    equivalent and the scalable form (two hash aggregates instead of
    two correlated self-joins of the fact table).  Substitution:
    late = shipped >60 days after order date (no receipt/commit dates).
    Scale: lineitem shuffles once on orderkey (the join and both
    aggregates share that partitioning); supplier broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    of = o.filter(F.col("o_orderstatus") == "F")
    late_flag = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"), 1
    ).otherwise(0)
    per = (
        li.join(of, li["l_orderkey"] == of["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late_flag).alias("late"))
    )
    ordagg = per.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    ).withColumnRenamed("l_orderkey", "o_key")
    return (
        per.join(ordagg, per["l_orderkey"] == F.col("o_key"))
        .filter((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), per["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "tpch_q22_global_sales",
    oracle="""
    WITH pos AS (
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM customer
      WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
    ),
    ab AS (SELECT floor(avg(c_acctbal) * 1000000) AS thr FROM pos)
    SELECT c_nationkey AS cntrycode, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM pos, ab
    WHERE floor(c_acctbal * 1000000) > thr
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY c_nationkey
    """,
)
def tpch_q22_global_sales(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): above-average
    account balances among customers with no RECENT orders (the
    original's "no orders for 7 years") — scalar-subquery average +
    NOT EXISTS anti join with a date-restricted build side, grouped by
    country code.  Substitution: no c_phone, so the country code is
    c_nationkey.  The
    average threshold is floor-quantized to integer micro-units on BOTH
    engines (PLANS.md numerics pattern) so no rounding-tie semantics
    are involved.  Scale: pos is a filtered dim; the anti join probes
    orders with a broadcast candidate set; output ≤ 7 rows."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    pos = c.filter(
        (F.col("c_acctbal") > 0.0) & F.col("c_nationkey").isin(1, 2, 3, 4, 5, 6, 7)
    ).select("c_custkey", "c_nationkey", "c_acctbal")
    ab = pos.agg(F.floor(F.avg("c_acctbal") * 1000000).alias("thr"))
    return (
        pos.crossJoin(F.broadcast(ab))
        .filter(F.floor(F.col("c_acctbal") * 1000000) > F.col("thr"))
        .join(
            o.filter(F.col("o_orderdate") >= F.lit("2001-01-01")),
            pos["c_custkey"] == o["o_custkey"],
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
