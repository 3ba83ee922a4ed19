"""Similarity search over embedding columns (north-star Tier E).

Reference has no vector ops (SURVEY.md §2 Tier E; the only imports in
`/root/reference/src/dask_obj/core.py:3-10` are dask/toolz/operator).
Built Spark-first:

- **cosine kernel**: `F.zip_with` product + `F.aggregate` left-fold sum —
  pure JVM whole-stage-codegen arithmetic, no UDF, no Python boundary.
- **brute-force top-k**: small probe set broadcast against the corpus
  (BroadcastNestedLoopJoin — the *corpus* side never shuffles), then
  per-probe top-k via window `row_number`.  This is the exact baseline.
- **LSH ANN**: random-hyperplane (sign) LSH.  P sign bits from fixed ±1
  hyperplanes, split into two half-keys (pigeonhole: any pair agreeing on
  ≥ P/2 bits shares a half) → candidates via equi-join on the half-key →
  exact cosine re-rank of candidates only.  Sub-quadratic: cost is
  bucket-size-bounded, and the join is a plain shuffled/broadcast hash
  join Catalyst already knows how to plan.

Oracle determinism: every float expression is generated with the SAME
left-to-right association in Spark (`F.aggregate` fold) and DuckDB
(explicit `a[1]*b[1] + a[2]*b[2] + ...` chain), both over float64, so
results are bit-identical — rankings compare without tolerance.

100 TB notes: brute-force is the *per-probe-batch* building block (probe
batches broadcast in ~64 MB chunks); LSH is the standing-index path —
the (bucket → vec) table is a materialized, bucketed-by-key dataset so
probe joins are shuffle-free.  Hyperplane count trades recall for bucket
size; skewed buckets (dense regions) are handled by AQE skew-join.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dask_obj_spark.functions.fastlit import (
    lit_double_array,
    lit_double_matrix,
    lit_long_array,
)
from dask_obj_spark.queries import query
from dask_obj_spark.sources import load_table

# -- cosine kernel ------------------------------------------------------------


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns — JVM-side left fold.

    NOTE (optimization r15, guide §1.2 step 2 / §4.1): `F.aggregate` /
    `F.zip_with` are CodegenFallback expressions — every pair pays an
    INTERPRETED 64-step fold with per-element lambda binding.  Hot pair
    stages over the fixed-width embedding fixture should use
    :func:`dot_w` instead: the unrolled `element_at` chain is the
    node-for-node left-assoc tree (bit-identical doubles, same oracle
    hashes) but whole-stage-codegen compiles it to straight-line double
    arithmetic (measured ~5x on the brute-kNN scoring stage), and the
    single `F.expr` parse costs ONE driver round-trip instead of ~130.
    This HOF form stays for width-generic call sites."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def sql_dot(a: str, b: str, dim: int, lo: int = 1) -> str:
    """Spark-SQL text of the SAME left-assoc dot fold `dot` builds, over
    elements ``lo..lo+dim-1`` of two array expressions: ``0.0D`` is the
    double literal seed, `+` parses left-associated, so the parsed tree
    is node-for-node the `F.aggregate` fold's — bit-identical float64
    results (the exactness argument `duck_dot` already documents for
    the DuckDB twin; ``lo`` replays a `slice(x, lo, dim)` prefix/window
    without materializing the slice)."""
    return (
        "(0.0D + "
        + " + ".join(
            f"element_at({a}, {i}) * element_at({b}, {i})"
            for i in range(lo, lo + dim)
        )
        + ")"
    )


def sql_norm(a: str, dim: int, lo: int = 1) -> str:
    """SQL text of `l2_norm`'s sqrt-of-self-dot over a fixed width."""
    return f"SQRT{sql_dot(a, a, dim, lo)}"


SQL_DOT_HOF = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
"""SQL text of the width-generic `dot` fold — parses to the identical
ArrayAggregate/ZipWith tree `F.aggregate`/`F.zip_with` build (0.0D is
the double seed `F.lit(0.0)` produces), so results are bit-identical."""


def _sql_dot_hof(a: str, b: str) -> str:
    return SQL_DOT_HOF.format(a=a, b=b)


def dot_w(a: str, b: str, dim: int) -> Column:
    """Width-guarded codegen'd dot product (see `dot` docstring): the
    unrolled left-assoc chain when both arrays are exactly ``dim`` wide
    (the fixture case — whole-stage codegen'd straight-line doubles),
    else the width-generic HOF fold `dot` builds.  Both branches are
    node-for-node the `F.aggregate` fold at their width, so results are
    bit-identical for every input; one `F.expr` parse total.  The guard
    exists because ANSI `element_at` past the array end is an ERROR
    where the HOF fold just folds the actual width (unit-tested API
    behavior on arbitrary-width vectors)."""
    return F.expr(
        f"CASE WHEN size({a}) = {dim} AND size({b}) = {dim} "
        f"THEN {sql_dot(a, b, dim)} ELSE {_sql_dot_hof(a, b)} END"
    )


def l2_norm_w(a: str, dim: int) -> Column:
    """Width-guarded codegen'd L2 norm twin of `l2_norm` (see `dot_w`)."""
    return F.expr(
        f"CASE WHEN size({a}) = {dim} THEN {sql_norm(a, dim)} "
        f"ELSE SQRT({_sql_dot_hof(a, a)}) END"
    )


def cosine_sim_w(a: str, b: str, dim: int) -> Column:
    """Width-guarded codegen'd twin of `cosine_sim` (same sub-trees;
    see `dot_w` for the guard rationale)."""
    return F.expr(
        f"CASE WHEN size({a}) = {dim} AND size({b}) = {dim} "
        f"THEN {sql_dot(a, b, dim)} / ({sql_norm(a, dim)} * {sql_norm(b, dim)}) "
        f"ELSE {_sql_dot_hof(a, b)} / "
        f"(SQRT({_sql_dot_hof(a, a)}) * SQRT({_sql_dot_hof(b, b)})) END"
    )


def dot_prefix_w(a: str, b: str, m: int) -> Column:
    """Prefix-dot over the first ``m`` elements: unrolled chain when the
    arrays are at least ``m`` wide, else the HOF fold over
    ``slice(x, 1, m)`` — exactly `dot(F.slice(a,1,m), F.slice(b,1,m))`'s
    tree (matryoshka semantics), bit-identical at every width."""
    sa, sb = f"slice({a}, 1, {m})", f"slice({b}, 1, {m})"
    return F.expr(
        f"CASE WHEN size({a}) >= {m} AND size({b}) >= {m} "
        f"THEN {sql_dot(a, b, m)} ELSE {_sql_dot_hof(sa, sb)} END"
    )


def l2_norm_prefix_w(a: str, m: int) -> Column:
    """Prefix-norm twin of `dot_prefix_w`."""
    sa = f"slice({a}, 1, {m})"
    return F.expr(
        f"CASE WHEN size({a}) >= {m} THEN {sql_norm(a, m)} "
        f"ELSE SQRT({_sql_dot_hof(sa, sa)}) END"
    )


def chained_prefix_dots(
    frame: DataFrame, a: str, b: str, widths: tuple[int, ...], prefix: str
) -> tuple[DataFrame, dict[int, str]]:
    """Project one prefix-dot column per width, each chain EXTENDING the
    previous width's column instead of re-unrolling from element 1
    (optimization r16, guide §7.3 plan size / §1.2 step 2): the fold is
    left-associated, so the m₂-prefix sum IS the m₁-prefix sum followed
    by terms m₁+1..m₂ — ``(0.0D + t1 + ... + t_m1) + t_{m1+1} + ...``
    parses to the node-for-node identical tree `dot_prefix_w` unrolls in
    full, but the total unrolled term count across widths drops from
    Σwidths to max(widths) (120 → 64 at the matryoshka fixture widths),
    and whole-stage codegen evaluates each shared prefix ONCE per row.

    Guard semantics are `dot_prefix_w`'s, width by width: under the
    ``size() >= m`` guard the previous column takes its own unrolled
    branch (its guard is implied), reproducing the full left-assoc
    chain bit-identically; outside it the slice-HOF fallback folds the
    actual width exactly as `dot_prefix_w` does.  Returns the frame
    plus {width: column name}."""
    cols: dict[int, str] = {}
    prev: tuple[int, str] | None = None
    for m in sorted(widths):
        name = f"__{prefix}d{m}"
        if prev is None:
            frame = frame.withColumn(name, dot_prefix_w(a, b, m))
        else:
            pm, pname = prev
            tail = " + ".join(
                f"element_at({a}, {i}) * element_at({b}, {i})"
                for i in range(pm + 1, m + 1)
            )
            sa, sb = f"slice({a}, 1, {m})", f"slice({b}, 1, {m})"
            frame = frame.withColumn(
                name,
                F.expr(
                    f"CASE WHEN size({a}) >= {m} AND size({b}) >= {m} "
                    f"THEN (`{pname}` + {tail}) "
                    f"ELSE {_sql_dot_hof(sa, sb)} END"
                ),
            )
        cols[m] = name
        prev = (m, name)
    return frame, cols


SQL_HAM_HOF = (
    "aggregate(zip_with({a}, {b}, (x, y) -> bit_count(x ^ y)), 0, "
    "(acc, x) -> acc + x)"
)
"""SQL text of the width-generic Hamming fold — parses to the identical
ArrayAggregate/ZipWith tree ``F.aggregate(F.zip_with(a, b, (x, y) ->
bit_count(x.bitwiseXOR(y))), F.lit(0), +)`` builds (integer seed, int
adds), so results are identical at every width."""


def hamming_w(a: str, b: str, nwords: int) -> Column:
    """Width-guarded codegen'd Hamming distance over packed sign-bit
    words (see `dot_w` for the guard rationale): the unrolled
    xor→bit_count chain when both arrays are exactly ``nwords`` wide —
    whole-stage-codegen'd straight-line integer ops — else the
    width-generic HOF fold.  Integer adds are associative and cannot
    overflow (≤ 64 per word), so both branches are value-identical to
    the legacy interpreted fold for every input."""
    chain = " + ".join(
        f"bit_count(element_at({a}, {i}) ^ element_at({b}, {i}))"
        for i in range(1, nwords + 1)
    )
    return F.expr(
        f"CASE WHEN size({a}) = {nwords} AND size({b}) = {nwords} "
        f"THEN (0 + {chain}) ELSE {SQL_HAM_HOF.format(a=a, b=b)} END"
    )


def sql_sqdist_const(a: str, cent: list[float]) -> str:
    """SQL text of the squared-euclidean fold against a LITERAL centroid
    — the codegen'd twin of ``aggregate(zip_with(v, lit_array, (x,y) ->
    (x-y)*(x-y)), 0.0, +)``: same left-assoc tree, `sql_double`'s
    repr round-trip makes each centroid literal bit-identical to
    `F.lit`'s (fastlit exactness note)."""
    from dask_obj_spark.functions.fastlit import sql_double

    terms = " + ".join(
        f"(element_at({a}, {i + 1}) - {sql_double(c)}) * "
        f"(element_at({a}, {i + 1}) - {sql_double(c)})"
        for i, c in enumerate(cent)
    )
    return f"(0.0D + {terms})"


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def duck_dot(a: str, b: str, dim: int) -> str:
    """DuckDB expression computing the identical left-associated dot sum.
    ``0.0 + x1 + x2 + ...`` parses left-assoc — same FP op order as the
    Spark ``F.aggregate`` fold, hence bit-identical float64 results."""
    return "(0.0 + " + " + ".join(f"{a}[{i}]*{b}[{i}]" for i in range(1, dim + 1)) + ")"


def duck_cosine(a: str, b: str, dim: int) -> str:
    return (
        f"{duck_dot(a, b, dim)} / "
        f"(sqrt({duck_dot(a, a, dim)}) * sqrt({duck_dot(b, b, dim)}))"
    )


def duck_sqdist(a: str, b: str, dim: int) -> str:
    """DuckDB expression for :func:`sqdist`'s left-assoc squared-distance
    fold — ``0.0 + (a1-b1)*(a1-b1) + ...``, bit-identical to Spark's."""
    return (
        "(0.0 + "
        + " + ".join(
            f"({a}[{i}]-{b}[{i}])*({a}[{i}]-{b}[{i}])" for i in range(1, dim + 1)
        )
        + ")"
    )


# -- brute-force top-k --------------------------------------------------------


def cosine_topk_brute(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    probe_mod: int,
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for probe vectors (id % probe_mod == 0).

    The probe side is broadcast; the corpus scans once with no shuffle
    until the final per-probe top-k (tiny: ≤ |probes|·|corpus| pairs only
    conceptually — physically a streamed nested-loop against an in-memory
    probe table).

    Norms are precomputed once per vector BEFORE the pair join (the
    factored `dot/(‖p‖·‖v‖)` evaluates the sqrt-fold subexpressions
    identically, so values — and the oracle hash — are bit-unchanged,
    but the per-pair interpreted work drops from 3 folds to 1)."""
    return (
        cosine_ranked_raw(df, id_col, vec_col, probe_mod)
        .filter(F.col("rank") <= k)
        .select("id1", "id2", F.round("cos_raw", 6).alias("cosine"), "rank")
    )


MAX_PROBES = 4096
"""Hard cap on any brute-harness probe set.

The exact-oracle harnesses select probes as ``vid % probe_mod == 0`` —
N/probe_mod rows, LINEAR in the corpus — so a scale-up could silently
quadratic-ize a "bounded" harness query.  The guard fails loudly
instead of truncating (the no-silent-caps rule): more than MAX_PROBES
probes means you want the ANN library path (cosine_topk_ivf /
knn_graph_ann) or a larger probe_mod."""


def _checked_probe_rows(probes: DataFrame, what: str) -> list:
    """Collect a probe frame under the MAX_PROBES contract (collects at
    most MAX_PROBES+1 rows, so the failure path is cheap too)."""
    rows = probes.limit(MAX_PROBES + 1).collect()
    if len(rows) > MAX_PROBES:
        raise ValueError(
            f"{what}: probe set exceeds MAX_PROBES={MAX_PROBES} "
            "(exact-oracle harness contract) — raise probe_mod or use "
            "the ANN library path (cosine_topk_ivf / knn_graph_ann)"
        )
    return rows


def cosine_ranked_raw(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    probe_mod: int,
) -> DataFrame:
    """All probe-corpus cosine pairs with per-probe rank and the RAW
    (unrounded) cosine — the shared kernel behind `cosine_topk_brute`
    and the weighted-graph builders, which need `cos_raw` so derived
    integer edge weights can floor-quantize it without a round() in
    between (round's tie semantics differ across engines; floor on the
    identical double does not).

    Explicit fan-out (the PLANS.md compute-bound-stage rule): the
    scoring is an interpreted HOF nested-loop whose parallelism would
    otherwise be the PARQUET SPLIT COUNT of the embeddings table — a
    small table is one file, so the whole |probes|·|corpus| stage ran
    on ONE core (found in the round-5 sf1 spot-check: 66 s of the 69 s
    MMR row was this stage single-threaded).  repartition() is
    row-preserving, so values and oracle hashes are unchanged.

    The probe side derives from the UN-repartitioned scan (its values
    are identical expressions, so bit-identical) — broadcasting it must
    not drag the corpus repartition exchange into the probe branch —
    and is bounded by the MAX_PROBES contract (fails loudly when
    N/probe_mod outgrows it; see MAX_PROBES)."""
    ncores = df.sparkSession.sparkContext.defaultParallelism
    raw0 = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # codegen'd fixed-width kernels (see `dot`): bit-identical to the
    # HOF folds, ~5x on the pair stage, 3 driver round-trips total
    base = raw0.repartition(ncores).withColumn("vn", l2_norm_w("v", DIM))
    # one scan serves both the MAX_PROBES guard and the probe
    # materialization (the maxsim_topk/heavy_hitters pattern): collect
    # ≤ MAX_PROBES+1 probe rows once — within the cap the collected set
    # is COMPLETE, so it becomes the broadcast local relation and the
    # pair join starts from an in-memory LocalTableScan instead of
    # paying a separate count() job plus a probe re-scan of the corpus
    probe_rows = _checked_probe_rows(
        raw0.filter(F.col("vid") % probe_mod == 0), "cosine_ranked_raw"
    )
    probes = (
        df.sparkSession.createDataFrame(probe_rows, raw0.schema)
        .withColumn("vn", l2_norm_w("v", DIM))
        .select(
            F.col("vid").alias("pid"), F.col("v").alias("pv"), F.col("vn").alias("pn")
        )
    )
    pairs = base.join(F.broadcast(probes), F.col("pid") != F.col("vid"))
    scored = pairs.select(
        F.col("pid").alias("id1"),
        F.col("vid").alias("id2"),
        (dot_w("pv", "v", DIM) / (F.col("pn") * F.col("vn"))).alias("cos_raw"),
    )
    w = Window.partitionBy("id1").orderBy(F.desc("cos_raw"), F.asc("id2"))
    return scored.withColumn("rank", F.row_number().over(w))


def cosine_topk_brute_numpy(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    probe_mod: int,
    k: int = 10,
) -> DataFrame:
    """Vectorized brute-force top-k: the production-throughput variant of
    `cosine_topk_brute`. The probe matrix ships inside the closure (the
    same bounded-size contract as a broadcast); each Arrow batch of the
    corpus does ONE BLAS matmul against it and emits only its per-probe
    partial top-k (≤ k rows per probe per batch), so the final exchange
    carries O(probes x k x batches), never all pairs.

    SIMD matmul replaces ~200 interpreted ops per pair with fused
    multiply-adds — this is the kernel you'd run at 100 TB, while the
    `F.aggregate` twin stays the bit-exact oracle reference (float
    summation order differs here: numpy pairwise vs left fold, ~1e-13
    relative, which is why this entry is rows-only)."""
    # explicit fan-out: the parquet scan of a small embeddings table is a
    # handful of input splits — without this the matmul stage runs on 1-2
    # cores (and AQE would coalesce it further; compute-bound stages get
    # an explicit partition count, see PLANS.md)
    ncores = df.sparkSession.sparkContext.defaultParallelism
    raw0 = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    base = raw0.repartition(ncores)
    # probe matrix collected from the un-repartitioned scan (no corpus
    # exchange in the probe branch) under the MAX_PROBES contract
    probe_rows = _checked_probe_rows(
        raw0.filter(F.col("vid") % probe_mod == 0), "cosine_topk_brute_numpy"
    )
    pids = [r.vid for r in probe_rows]
    pmat = [list(r.v) for r in probe_rows]

    def run(batches):
        import numpy as _np
        import pandas as _pd

        P = _np.asarray(pmat, dtype=_np.float64)
        Pn = P / _np.linalg.norm(P, axis=1, keepdims=True)
        pid_arr = _np.asarray(pids)
        cols = _np.arange(len(pids))
        for pdf in batches:
            if not len(pdf):
                continue
            V = _np.array(pdf["v"].to_list(), dtype=_np.float64)
            Vn = V / _np.linalg.norm(V, axis=1, keepdims=True)
            S = Vn @ Pn.T  # (batch, probes)
            vids = pdf["vid"].to_numpy()
            kk = min(k + 1, S.shape[0])  # +1: self-match may occupy a slot
            top = _np.argpartition(-S, kk - 1, axis=0)[:kk]  # (kk, probes)
            # vectorized emission: gather ids/scores for every (slot, probe)
            # cell at once, mask out self-matches — no Python-level loops
            id2 = vids[top]  # (kk, probes)
            cos = S[top, cols]  # advanced indexing, (kk, probes)
            id1 = _np.broadcast_to(pid_arr, id2.shape)
            keep = id2 != id1
            yield _pd.DataFrame(
                {"id1": id1[keep], "id2": id2[keep], "cos_raw": cos[keep]}
            )

    partial = base.mapInPandas(run, "id1 bigint, id2 bigint, cos_raw double")
    w = Window.partitionBy("id1").orderBy(F.desc("cos_raw"), F.asc("id2"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id1", "id2", F.round("cos_raw", 6).alias("cosine"), "rank")
    )


# -- random-hyperplane LSH ANN ------------------------------------------------

DIM = 64  # driver testdata embedding dimensionality (FIXTURES.md)
NBITS = 8  # sign bits per vector → 2 half-keys of 4 bits (16 buckets each)

_rng = random.Random(42)
HYPERPLANES: list[list[float]] = [
    [1.0 if _rng.random() < 0.5 else -1.0 for _ in range(DIM)] for _ in range(NBITS)
]


def _sign_bit(v: Column, plane: list[float]) -> Column:
    p = lit_double_array(plane)
    return F.when(dot(v, p) >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_half_keys(v: Column) -> Column:
    """Two pigeonhole half-keys ("l<n>", "h<n>") from NBITS sign bits."""
    bits = [_sign_bit(v, pl) for pl in HYPERPLANES]
    half = NBITS // 2
    lo = None
    hi = None
    for i in range(half):
        t_lo = bits[i] * (2 ** (half - 1 - i))
        t_hi = bits[half + i] * (2 ** (half - 1 - i))
        lo = t_lo if lo is None else lo + t_lo
        hi = t_hi if hi is None else hi + t_hi
    return F.array(F.concat(F.lit("l"), lo), F.concat(F.lit("h"), hi))


def cosine_topk_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    probe_mod: int,
    k: int = 10,
) -> DataFrame:
    """ANN top-k: hyperplane-LSH half-key buckets → candidate equi-join →
    exact cosine re-rank of candidates only.  May return < k rows per
    probe (standard ANN recall trade); every returned neighbor's score is
    exact."""
    base = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("vn", l2_norm(F.col("v")))  # 1 fold per pair, not 3
    keyed = base.select(
        "vid", "v", "vn", F.explode(lsh_half_keys(F.col("v"))).alias("bucket")
    )
    probes = keyed.filter(F.col("vid") % probe_mod == 0).select(
        F.col("vid").alias("pid"), F.col("v").alias("pv"),
        F.col("vn").alias("pn"), "bucket"
    )
    cand = (
        keyed.join(F.broadcast(probes), "bucket")
        .filter(F.col("pid") != F.col("vid"))
        .select("pid", "pv", "pn", "vid", "v", "vn")
        .distinct()
    )
    scored = cand.select(
        F.col("pid").alias("id1"),
        F.col("vid").alias("id2"),
        (dot(F.col("pv"), F.col("v")) / (F.col("pn") * F.col("vn"))).alias("cos_raw"),
    )
    w = Window.partitionBy("id1").orderBy(F.desc("cos_raw"), F.asc("id2"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id1", "id2", F.round("cos_raw", 6).alias("cosine"), "rank")
    )


# -- IVF (inverted-file) ANN --------------------------------------------------

CENTROID_MOD = 61  # deterministic coarse centroids: vid % 61 == 1
NPROBE = 2


def cosine_topk_ivf(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    probe_mod: int,
    k: int = 10,
    centroid_mod: int = CENTROID_MOD,
    nprobe: int = NPROBE,
) -> DataFrame:
    """IVF ANN top-k: corpus vectors are assigned to their nearest coarse
    centroid (one cell each); a probe searches its `nprobe` nearest
    cells with exact cosine re-ranking.

    Plan shape (the part that matters at 100 TB): centroid table is tiny
    and broadcast; assignment is a narrow broadcast nested-loop + per-id
    argmin (no corpus shuffle); the candidate join is a plain equi-join
    on cell id, so probe cost is bounded by cell size, never all-pairs.
    In production the cell table is a standing dataset bucketed by cell
    (see operators/scale.py write_bucketed) and centroids come from
    k-means; here they are deterministic (vid % centroid_mod == 1) so
    the DuckDB oracle reproduces the index exactly."""
    # norms computed once per vector/centroid (identical sqrt-fold
    # subexpressions → bit-identical values vs the 3-fold form; 1
    # interpreted fold per pair instead of 3 — same trick as
    # cosine_topk_brute / semantic_dedup)
    base = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("vn", l2_norm(F.col("v")))
    cents = base.filter(F.col("vid") % centroid_mod == 1).select(
        F.col("vid").alias("cid"), F.col("v").alias("cv"), F.col("vn").alias("cn")
    )
    sim = dot(F.col("v"), F.col("cv")) / (F.col("vn") * F.col("cn"))
    aw = Window.partitionBy("vid").orderBy(F.desc("cs"), F.asc("cid"))
    assign = (
        base.join(F.broadcast(cents))
        .select("vid", "v", "vn", "cid", sim.alias("cs"))
        .withColumn("rn", F.row_number().over(aw))
    )
    cells = assign.filter(F.col("rn") == 1).select("vid", "v", "vn", "cid")
    pcells = (
        assign.filter((F.col("rn") <= nprobe) & (F.col("vid") % probe_mod == 0))
        .select(F.col("vid").alias("pid"), F.col("v").alias("pv"),
                F.col("vn").alias("pn"), "cid")
    )
    cand = (
        cells.join(F.broadcast(pcells), "cid")
        .filter(F.col("pid") != F.col("vid"))
        .select("pid", "pv", "pn", "vid", "v", "vn")
        .distinct()
    )
    scored = cand.select(
        F.col("pid").alias("id1"),
        F.col("vid").alias("id2"),
        (dot(F.col("pv"), F.col("v")) / (F.col("pn") * F.col("vn"))).alias("cos_raw"),
    )
    w = Window.partitionBy("id1").orderBy(F.desc("cos_raw"), F.asc("id2"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id1", "id2", F.round("cos_raw", 6).alias("cosine"), "rank")
    )


def knn_graph_ann(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    probe_mod: int = 1,
    centroids: list[list[float]] | None = None,
    nprobe: int = 4,
    centroid_mod: int | None = None,
    kmeans_k: int | None = None,
    kmeans_iters: int = 2,
    raw: bool = False,
    n_rows: int | None = None,
) -> DataFrame:
    """Approximate kNN GRAPH construction — the library path for every
    graph operator (bfs_hops / k_core / triangle counting / label
    propagation) whose input is "the kNN graph of the corpus".

    Unlike `cosine_topk_ivf` (few probes, probe side broadcast), here
    the probe side is the corpus itself (every vertex needs neighbors),
    so candidates come from a PLAIN equi-join on the IVF cell id: each
    vector probes its `nprobe` nearest cells, candidate volume is
    Σ_cells |cell|·|probes touching the cell| — bounded by cell sizes,
    never the |V|² all-pairs surface that brute-force scoring scans.
    Exact cosine re-ranks the candidates, so every emitted edge score
    is exact; only RECALL is approximate (standard ANN-graph trade —
    recall@10 vs the brute graph is pinned in tests/test_dedup.py).

    This closes the BASELINE.md §5 b25 caveat: ~60% of the brute-built
    BFS bench was kNN-graph construction; the oracle-paired graph
    queries keep the brute builder (their fixed-unroll oracles replay
    it), while this is the builder a 100 TB job uses.

    Centroid source — the DEFAULT is the scale-safe path: `centroids`
    (a constant-size k×dim list, e.g. from a prior :func:`kmeans_fit`),
    or, when None, centroids trained in-call with
    ``kmeans_fit(k=kmeans_k, iters=kmeans_iters)``.  Either way the
    model is k·dim driver floats compiled into a per-row literal-array
    argmin (:func:`_nearest_cells`) — assignment is LINEAR in the
    corpus with a constant-size plan, no broadcast that grows with the
    data.  ``kmeans_k=None`` auto-sizes toward √N per the usual IVF
    rule (capped at 64 — the literal plan carries one term per
    centroid; beyond the cap use the bucketed standing index) so cell
    sizes, and with them candidate volume, stay bounded.  Passing
    ``centroid_mod`` instead selects the ORACLE-REPLAY variant used
    only by the `graph_knn_ann_edges` / `graph_bfs_ann` query wrappers:
    the centroid set is the vectors with vid ≡ 1 (mod centroid_mod) —
    corpus-fraction sized, so its broadcast and its N²/centroid_mod
    assignment cost are a replayability price, NOT a design property;
    never use it as a library call at scale."""
    # NOTE (r16): fan_out before the centroid-scoring scan was A/B
    # probed and REGRESSED this row at sf0.1 (2.59 -> 3.62 s): the
    # round-robin exchange plus 32-task overhead exceeds the scoring
    # parallelism it buys at this size — left as-is (the b10/b24 regex
    # chains it does help are 10x heavier per row).
    base = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("vn", l2_norm_w("v", DIM))
    if centroid_mod is not None:
        # oracle-replay path (quadratic; see docstring).  Scoring uses
        # the codegen'd width-guarded kernels (optimization r16, guide
        # §4.1): this corpus×centroid stage and the candidate re-rank
        # below were the two interpreted-HOF sites the r15 kernel
        # migration missed — bit-identical by the dot_w guard contract.
        cents = base.filter(F.col("vid") % centroid_mod == 1).select(
            F.col("vid").alias("cid"), F.col("v").alias("cv"), F.col("vn").alias("cn")
        )
        sim = dot_w("v", "cv", DIM) / (F.col("vn") * F.col("cn"))
        aw = Window.partitionBy("vid").orderBy(F.desc("cs"), F.asc("cid"))
        assign = (
            base.join(F.broadcast(cents))
            .select("vid", "v", "vn", "cid", sim.alias("cs"))
            .withColumn("rn", F.row_number().over(aw))
        )
        # one pass over the corpus computes both legs; materialize it so
        # the cells/pcells branches don't re-score the assignment twice
        assign = assign.localCheckpoint(eager=True)
        cells = assign.filter(F.col("rn") == 1).select("vid", "v", "vn", "cid")
        pcells = assign.filter(
            (F.col("rn") <= nprobe) & (F.col("vid") % probe_mod == 0)
        ).select(
            F.col("vid").alias("pid"), F.col("v").alias("pv"),
            F.col("vn").alias("pn"), "cid",
        )
    else:
        if centroids is None:
            # IVF sizing rule, applied so a bare call is scale-correct
            # without the caller knowing it: cells ~ √N keeps candidate
            # volume ~N^1.5·nprobe/√N = linear per probe in cell size;
            # capped at 64 because the literal-argmin plan carries one
            # struct term per centroid (beyond that, use the bucketed
            # standing index build_ann_index/query_ann_index).  The
            # count is one cheap bounded job; sf1 measured ~40% faster
            # than a fixed k=16 at 10× data (BASELINE.md §6 round-6).
            # Training runs on a bounded deterministic modular sample —
            # the Faiss practice; the full corpus only flows through
            # the narrow assignment scan.  On a 100 TB table even the
            # count scan is real money — pass `n_rows` (catalog stats /
            # known table size) and the bare call runs ZERO extra jobs.
            n = n_rows if n_rows is not None else df.count()
            if kmeans_k is None:
                kmeans_k = max(8, min(64, int(n ** 0.5 / 4)))
            train = df
            if n > 100_000:
                train = df.filter(
                    F.col(id_col) % int(-(-n // 100_000)) == 0
                )
            centroids, _ = kmeans_fit(
                train, id_col, vec_col, k=kmeans_k, iters=kmeans_iters
            )
        # constant-k model state → per-row literal argmin, both legs
        # computed narrowly from the same scan (no join, no window)
        cells = base.select(
            "vid", "v", "vn",
            _nearest_cells("v", centroids, 1).getItem(0).alias("cid"),
        )
        pcells = base.filter(F.col("vid") % probe_mod == 0).select(
            F.col("vid").alias("pid"), F.col("v").alias("pv"),
            F.col("vn").alias("pn"),
            F.explode(_nearest_cells("v", centroids, nprobe)).alias("cid"),
        )
    cand = (
        cells.join(pcells, "cid")  # plain equi-join: both sides corpus-sized
        .filter(F.col("pid") != F.col("vid"))
        .select("pid", "pv", "pn", "vid", "v", "vn")
        .distinct()
    )
    scored = cand.select(
        F.col("pid").alias("id1"),
        F.col("vid").alias("id2"),
        (dot_w("pv", "v", DIM) / (F.col("pn") * F.col("vn"))).alias("cos_raw"),
    )
    w = Window.partitionBy("id1").orderBy(F.desc("cos_raw"), F.asc("id2"))
    ranked = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    if raw:
        # unrounded scores for callers with their own quantization
        # contract (the oracle wrapper floor-quantizes — round()'s tie
        # semantics differ across engines: Spark HALF_UP, DuckDB
        # half-even)
        return ranked.select("id1", "id2", "cos_raw", "rank")
    return ranked.select(
        "id1", "id2", F.round("cos_raw", 6).alias("cosine"), "rank"
    )


# -- mini k-means (iterative; feeds production IVF) ---------------------------


def kmeans_fit(
    df: DataFrame, id_col: str, vec_col: str, k: int = 8, iters: int = 3
) -> tuple[list[list[float]], DataFrame]:
    """Deterministic Lloyd's k-means over vector columns — the iterative-
    algorithm pattern on Spark, and the production centroid source for
    `cosine_topk_ivf` (which uses fixed modular centroids only so the
    DuckDB oracle can replay the index).

    Per iteration: centroids (k x dim, driver-held model state — same
    contract as MLlib) broadcast into an argmin assignment (squared
    euclidean), then new centroids via posexplode + groupBy(cell, pos)
    avg — the shuffle carries k*dim partial sums per partition, never
    vectors. Init = first k vectors by id (seeded/deterministic).
    Returns (centroids, assignment df (vid, v, cell))."""
    # fan-out before the interpreted argmin stage (the PLANS.md
    # compute-bound-stage rule): k·dim zip_with/aggregate folds per row
    # run interpreted, and a 1-file scan would pin them to one core.
    # r16 (guide §5): pin the working frame once — Lloyd's re-scans it
    # iters+2 times (init collect + per-iter update + assignment), and
    # without the pin every job re-ran the caller's upstream plan (for
    # the PQ/IVF callers: a parquet scan + a normalize projection) plus
    # this repartition exchange.  This is the localCheckpoint analogue
    # of MLlib KMeans caching its input; values are unchanged.
    ncores = df.sparkSession.sparkContext.defaultParallelism
    base = (
        df.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .repartition(ncores, "vid")
        .localCheckpoint(eager=True)
    )
    cents = [list(r.v) for r in base.orderBy("vid").limit(k).collect()]

    def assign_for(cent_rows: list[list[float]]) -> DataFrame:
        # few-centroid models: one-parse codegen'd argmin chains (see
        # `sql_sqdist_const` / the `dot` r15 notes) — bit-identical to
        # the interpreted zip_with folds, straight-line doubles per
        # corpus row.  Many-centroid models (r16, the k=64 codebook
        # fits): the unrolled chains put 2·k·dim expression nodes into
        # codegen source — inflating parse/analysis per Lloyd round and
        # at larger k·dim blowing the generated-method size entirely
        # (the PQ-stall failure mode) — so the centroids ride as ONE
        # array<array<double>> Literal and the argmin is the identical
        # fold per centroid (array_min over struct(dist, cell), index
        # == enumeration order; same values both ways).
        if len(cent_rows) <= 16:
            arms = ", ".join(
                f"struct({sql_sqdist_const('v', cent)} AS dist, {i} AS cell)"
                for i, cent in enumerate(cent_rows)
            )
            cell = F.expr(f"array_min(array({arms})).cell")
        else:
            cell = F.array_min(
                F.transform(
                    lit_double_matrix(cent_rows),
                    lambda c, i: F.struct(
                        sqdist(F.col("v"), c).alias("dist"),
                        i.alias("cell"),
                    ),
                )
            ).getField("cell")
        return base.select("vid", "v", cell.alias("cell"))

    assigned = assign_for(cents)
    for _ in range(iters):
        new_rows = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.col("pm.m").alias("centroid"))
            .collect()
        )
        by_cell = {r.cell: list(r.centroid) for r in new_rows}
        cents = [by_cell.get(i, cents[i]) for i in range(k)]
        assigned = assign_for(cents)
    return cents, assigned


def kmeans_assign(
    df: DataFrame, id_col: str, vec_col: str, k: int = 8, iters: int = 3
) -> DataFrame:
    """(vid, cell) assignment from :func:`kmeans_fit`."""
    _, assigned = kmeans_fit(df, id_col, vec_col, k, iters)
    return assigned.select("vid", "cell")


KMQ_SCALE = 1000  # |x| ≤ 0.58 fixture → |xq| ≤ 578; (xq·n − s)² summed
# over 64 dims stays < 2^63 up to n ≈ 200k rows/cell (sf10 headroom)


def kmeans_fit_quantized(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    scale: int = KMQ_SCALE,
) -> tuple[list[tuple[list[int], int]], DataFrame]:
    """Lloyd's k-means with EXACT integer state — the bit-reproducible
    variant of :func:`kmeans_fit`, and the oracle-replayable face of
    the iterative-algorithm category (`sim_kmeans_cells_rowsonly`
    stays as the raw-double production form).

    Vectors are floor-quantized once (xq_d = floor(x_d·scale), BIGINT);
    centroid state is the per-cell integer SUM vector s plus count n —
    never a float mean, so the state is partition-order-free (integer
    sums commute exactly, where kmeans_fit's F.avg folds partition
    order into the last ulp).  Assignment compares squared euclidean
    distances to the RATIONAL centroid s/n without materializing it:
    D_c = Σ_d (xq_d·n_c − s_cd)² / n_c², with the numerator an exact
    BIGINT fold and the single final division one correctly-rounded
    IEEE op — bit-identical across engines and partitionings, ties
    broken by cell id.  Same scale contract as kmeans_fit: k×dim
    driver-held model state compiled into the assignment plan as
    literals, updates via posexplode + (cell, pos) integer-sum
    aggregate (k·dim partials per partition), empty cells keep their
    previous state.  Init = first k vectors by id.

    Returns ([(s, n)] per cell, assignment df (vid, xq, cell))."""
    # fan-out before the interpreted integer-argmin stage (the PLANS.md
    # compute-bound-stage rule).  Local cost is dominated by the k·dim
    # interpreted fold itself (~6.8 s at sf0.1 across the 5 training
    # jobs) — linear in N with a constant 8×64 per-row term, so the
    # plan holds at scale; the fan-out keeps it off one core.
    # pinned like kmeans_fit (r16): Lloyd's re-scans the quantized frame
    # iters+2 times; the pin stops each pass re-running the scan +
    # quantize transform + this exchange (values unchanged)
    ncores = df.sparkSession.sparkContext.defaultParallelism
    base = (
        df.select(
            F.col(id_col).alias("vid"),
            F.expr(
                f"transform(cast({vec_col} as array<double>), "
                f"x -> cast(floor(x * {scale}.0) as bigint))"
            ).alias("xq"),
        )
        .repartition(ncores, "vid")
        .localCheckpoint(eager=True)
    )
    init = base.orderBy("vid").limit(k).collect()
    state: list[tuple[list[int], int]] = [(list(r.xq), 1) for r in init]

    def _sq_num_sql(s: list[int], n: int) -> str:
        # codegen'd twin of the exact-BIGINT fold: (xq_d·n − s_d)²
        # summed left-assoc from a CAST(0 AS BIGINT) seed — integer ops,
        # so order is immaterial anyway; overflow still raises (ANSI),
        # same loud bound as the interpreted fold it replaces
        terms = " + ".join(
            f"(element_at(xq, {d + 1}) * {int(n)}L - {int(c)}L) * "
            f"(element_at(xq, {d + 1}) * {int(n)}L - {int(c)}L)"
            for d, c in enumerate(s)
        )
        return f"(CAST(0 AS BIGINT) + {terms})"

    def assign_for(st: list[tuple[list[int], int]]) -> DataFrame:
        # one-parse codegen'd argmin (see `sql_sqdist_const` notes); the
        # single final division per cell stays the identical IEEE op
        arms = ", ".join(
            f"struct(CAST({_sq_num_sql(s, n)} AS DOUBLE) / {float(n * n)!r}D"
            f" AS dist, {i} AS cell)"
            for i, (s, n) in enumerate(st)
        )
        cell = F.expr(f"array_min(array({arms})).cell")
        return base.select("vid", "xq", cell.alias("cell"))

    assigned = assign_for(state)
    for _ in range(iters):
        new_rows = (
            assigned.select("cell", F.posexplode("xq").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.sum("x").alias("sd"), F.count(F.lit(1)).alias("n"))
            .groupBy("cell")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "sd"))).alias("pm"),
                F.max("n").alias("n"),
            )
            .select("cell", F.col("pm.sd").alias("s"), "n")
            .collect()
        )
        by_cell = {r.cell: (list(r.s), int(r.n)) for r in new_rows}
        state = [by_cell.get(i, state[i]) for i in range(k)]
        assigned = assign_for(state)
    return state, assigned


def _kmeans_quantized_oracle(
    k: int = 8, iters: int = 3, scale: int = KMQ_SCALE, dim: int = DIM
) -> str:
    """Unrolled quantized-Lloyd replay: init from the first k vids,
    then ``iters`` chained (assign → integer-sum update) rounds plus
    the final assignment — every CTE MATERIALIZED (the fixed-unroll
    iteration precedent).  All sums are exact integers (DuckDB HUGEINT
    cast back to BIGINT); the one division per (vector, cell) is the
    same correctly-rounded IEEE op Spark performs."""
    sum_arms = ", ".join(
        f"CAST(sum(xq[{d + 1}]) AS BIGINT) AS s{d + 1}" for d in range(dim)
    )
    s_list = "[" + ", ".join(f"u.s{d + 1}" for d in range(dim)) + "]"

    def assign_cte(name: str, cents: str) -> str:
        return f"""{name} AS MATERIALIZED (
      SELECT vid, xq, cell FROM (
        SELECT b.vid, b.xq, c.cell,
               row_number() OVER (
                 PARTITION BY b.vid
                 ORDER BY CAST(list_sum(list_transform(generate_series(1, {dim}),
                            i -> (b.xq[i] * c.n - c.s[i]) * (b.xq[i] * c.n - c.s[i])))
                          AS DOUBLE) / CAST(c.n * c.n AS DOUBLE) ASC,
                          c.cell ASC) AS rn
        FROM base b CROSS JOIN {cents} c
      ) WHERE rn = 1
    )"""

    def update_cte(name: str, prev_c: str, prev_a: str) -> str:
        return f"""{name} AS MATERIALIZED (
      SELECT p.cell,
             CASE WHEN u.n IS NULL THEN p.s ELSE {s_list} END AS s,
             coalesce(u.n, p.n) AS n
      FROM {prev_c} p LEFT JOIN (
        SELECT cell, count(*)::BIGINT AS n, {sum_arms}
        FROM {prev_a} GROUP BY cell
      ) u ON p.cell = u.cell
    )"""

    ctes = [
        f"""base AS MATERIALIZED (
      SELECT vec_id AS vid,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(floor(x * {scale}.0) AS BIGINT)) AS xq
      FROM embeddings
    ),
    c0 AS MATERIALIZED (
      SELECT row_number() OVER (ORDER BY vid) - 1 AS cell, xq AS s,
             CAST(1 AS BIGINT) AS n
      FROM base ORDER BY vid LIMIT {k}
    )""",
        assign_cte("a0", "c0"),
    ]
    for it in range(1, iters + 1):
        ctes.append(update_cte(f"c{it}", f"c{it - 1}", f"a{it - 1}"))
        ctes.append(assign_cte(f"a{it}", f"c{it}"))
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT vid, CAST(cell AS BIGINT) AS cell FROM a{iters}
    """
    )


@query("sim_kmeans_cells_exact", oracle=_kmeans_quantized_oracle())
def sim_kmeans_cells_exact_q(spark, sf_dir):
    """Quantized Lloyd's k-means (k=8, 3 iterations, deterministic
    first-k init), full (vid, cell) assignment — the oracle-paired
    companion for the iterative-algorithm category (r9 verdict #5
    family): integer centroid state makes every round's argmin
    bit-replayable, so the DuckDB oracle re-runs the ENTIRE training
    loop as unrolled MATERIALIZED CTEs and a wrong update order,
    dropped empty-cell fallback, or argmin tie bug becomes a hash
    mismatch."""
    emb = load_table(spark, sf_dir, "embeddings")
    _, assigned = kmeans_fit_quantized(emb, "vec_id", "embedding")
    return assigned.select("vid", F.col("cell").cast("bigint").alias("cell"))


# -- standing IVF index (k-means centroids + bucketed cell table) -------------


def _nearest_cells(vec: str, cents: list[list[float]], nprobe: int) -> Column:
    """Array of the ``nprobe`` nearest centroid ids (squared euclidean),
    computed against literal centroid arrays — model state is compiled
    into the plan, no join needed for assignment.

    ``vec`` is the array column's NAME; the whole k-way argsort is ONE
    `F.expr` parse of codegen'd unrolled chains (see `sql_sqdist_const`
    and the `dot` r15 notes) — bit-identical to the interpreted
    zip_with/aggregate folds it replaces, ~k·dim fewer driver
    round-trips and straight-line double math per row."""
    arms = ", ".join(
        f"struct({sql_sqdist_const(vec, cent)} AS dist, {i} AS cell)"
        for i, cent in enumerate(cents)
    )
    return F.expr(f"slice(array_sort(array({arms})), 1, {nprobe}).cell")


def build_ann_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    table: str = "ann_index_cells",
    k: int = 8,
    iters: int = 3,
    buckets: int = 8,
) -> list[list[float]]:
    """Build a STANDING IVF index: k-means coarse centroids
    (:func:`kmeans_fit`), every corpus vector assigned to its cell, and
    the cell table persisted BUCKETED by ``cell``
    (operators/scale.py ``write_bucketed``) — the shuffle is paid once at
    build time, so every later probe batch joins the corpus with no
    corpus-side Exchange.  Returns the centroid model (driver-held
    k × dim list, the same bounded-model-state contract as k-means) to
    pass to :func:`query_ann_index`."""
    from dask_obj_spark.operators.scale import write_bucketed

    cents, assigned = kmeans_fit(df, id_col, vec_col, k, iters)
    write_bucketed(assigned.select("vid", "v", "cell"), table, "cell", buckets)
    return cents


def query_ann_index(
    spark: SparkSession,
    table: str,
    centroids: list[list[float]],
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nprobe: int = NPROBE,
) -> DataFrame:
    """ANN top-k against a standing :func:`build_ann_index` table.

    Probes are assigned to their ``nprobe`` nearest cells via literal
    centroid arithmetic (no join), broadcast, and equi-joined on
    ``cell`` against the bucketed corpus — scan → join with NO Exchange
    on the corpus side; the only shuffle in the plan is the final
    per-probe top-k window, which WindowGroupLimit prunes to ≤ k rows
    per probe before the exchange."""
    p = probes.select(
        F.col(id_col).alias("pid"), F.col(vec_col).cast("array<double>").alias("pv")
    ).withColumn("pn", l2_norm(F.col("pv")))
    pcells = p.select(
        "pid", "pv", "pn",
        F.explode(_nearest_cells("pv", centroids, nprobe)).alias("cell"),
    )
    # corpus-side norm computed once per row on the (bucketed) scan,
    # before the join — 1 fold per candidate pair instead of 3
    cells = spark.table(table).withColumn("vn", l2_norm(F.col("v")))
    scored = (
        cells.join(F.broadcast(pcells), "cell")
        .filter(F.col("pid") != F.col("vid"))
        .select(
            F.col("pid").alias("id1"),
            F.col("vid").alias("id2"),
            (dot(F.col("pv"), F.col("v")) / (F.col("pn") * F.col("vn"))).alias(
                "cos_raw"
            ),
        )
    )
    w = Window.partitionBy("id1").orderBy(F.desc("cos_raw"), F.asc("id2"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id1", "id2", F.round("cos_raw", 6).alias("cosine"), "rank")
    )


# ====================== oracle SQL builders (DuckDB) =========================


def _duck_base(probe_mod: int) -> str:
    return f"""
    WITH base AS (
      SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings
    ), probes AS (
      SELECT vid AS pid, v AS pv FROM base WHERE vid % {probe_mod} = 0
    )"""


def _duck_topk_ctes() -> str:
    cos = duck_cosine("pv", "v", DIM)
    return f"""
    , scored AS (
      SELECT pid AS id1, vid AS id2, {cos} AS cos_raw
      FROM base JOIN probes ON pid <> vid
    ), ranked AS (
      SELECT id1, id2, cos_raw,
             row_number() OVER (PARTITION BY id1 ORDER BY cos_raw DESC, id2) AS rank
      FROM scored
    )"""


def _duck_topk_select(k: int) -> str:
    return (
        _duck_topk_ctes()
        + f"""
    SELECT id1, id2, round(cos_raw, 6) AS cosine, rank
    FROM ranked WHERE rank <= {k}
    """
    )


def _duck_bits_cte() -> str:
    half = NBITS // 2
    bit_exprs = []
    for bi, plane in enumerate(HYPERPLANES):
        terms = "(0.0 + " + " + ".join(
            f"v[{i + 1}]*({plane[i]})" for i in range(DIM)
        ) + ")"
        bit_exprs.append(f"CASE WHEN {terms} >= 0 THEN 1 ELSE 0 END AS b{bi}")
    lo = " + ".join(f"b{i} * {2 ** (half - 1 - i)}" for i in range(half))
    hi = " + ".join(f"b{half + i} * {2 ** (half - 1 - i)}" for i in range(half))
    return f"""
    , bits AS (
      SELECT vid, v, {", ".join(bit_exprs)} FROM base
    ), keyed AS (
      SELECT vid, v, 'l' || ({lo}) AS bucket FROM bits
      UNION ALL
      SELECT vid, v, 'h' || ({hi}) AS bucket FROM bits
    )"""


@query(
    "sim_cosine_topk_brute",
    oracle=_duck_base(50) + _duck_topk_select(10),
)
def sim_cosine_topk_brute_q(spark, sf_dir):
    """Exact cosine top-10 neighbors for 1-in-50 probe vectors
    (BASELINE.md B7)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_brute(emb, "vec_id", "embedding", probe_mod=50, k=10)


@query(
    "sim_cosine_topk_lsh",
    oracle=_duck_base(50)
    + _duck_bits_cte()
    + """
    , cand AS (
      SELECT DISTINCT p.pid, p.pv, c.vid, c.v
      FROM keyed c JOIN (
        SELECT k.vid AS pid, k.v AS pv, k.bucket FROM keyed k WHERE k.vid % 50 = 0
      ) p ON c.bucket = p.bucket AND p.pid <> c.vid
    ), scored AS (
      SELECT pid AS id1, vid AS id2, """
    + duck_cosine("pv", "v", DIM)
    + """ AS cos_raw FROM cand
    ), ranked AS (
      SELECT id1, id2, cos_raw,
             row_number() OVER (PARTITION BY id1 ORDER BY cos_raw DESC, id2) AS rank
      FROM scored
    )
    SELECT id1, id2, round(cos_raw, 6) AS cosine, rank
    FROM ranked WHERE rank <= 10
    """,
)
def sim_cosine_topk_lsh_q(spark, sf_dir):
    """Hyperplane-LSH ANN top-10 — the 100 TB scale path, oracle-checked
    exactly (deterministic hyperplanes embedded in both engines)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_lsh(emb, "vec_id", "embedding", probe_mod=50, k=10)


@query("sim_kmeans_cells_rowsonly")
def sim_kmeans_cells_q(spark, sf_dir):
    """Mini k-means cell assignment (3 Lloyd iterations, deterministic
    init) — rows-only: iterative algorithms are outside single-statement
    SQL; convergence/determinism are unit-tested."""
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_assign(emb, "vec_id", "embedding", k=8, iters=3)


@query("sim_cosine_topk_numpy_rowsonly")
def sim_cosine_topk_numpy_q(spark, sf_dir):
    """Vectorized (BLAS matmul) brute-force top-10 — rows-only because
    numpy's pairwise summation orders floats differently from the
    SQL-expressible left fold; pair-set parity with the exact variant is
    asserted in tests/test_dedup.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_brute_numpy(emb, "vec_id", "embedding", probe_mod=50, k=10)


@query(
    "sim_cosine_topk_ivf",
    oracle=_duck_base(50)
    + f"""
    , cents AS (
      SELECT vid AS cid, v AS cv FROM base WHERE vid % {CENTROID_MOD} = 1
    ), assign AS (
      SELECT b.vid, b.v, c.cid,
             {duck_cosine("b.v", "c.cv", DIM)} AS cs
      FROM base b, cents c
    ), ranked_assign AS (
      SELECT vid, v, cid, cs,
             row_number() OVER (PARTITION BY vid ORDER BY cs DESC, cid) AS rn
      FROM assign
    ), cells AS (
      SELECT vid, v, cid FROM ranked_assign WHERE rn = 1
    ), pcells AS (
      SELECT vid AS pid, v AS pv, cid
      FROM ranked_assign WHERE rn <= {NPROBE} AND vid % 50 = 0
    ), cand AS (
      SELECT DISTINCT p.pid, p.pv, c.vid, c.v
      FROM pcells p JOIN cells c ON p.cid = c.cid AND p.pid <> c.vid
    ), scored AS (
      SELECT pid AS id1, vid AS id2, {duck_cosine("pv", "v", DIM)} AS cos_raw
      FROM cand
    ), rank2 AS (
      SELECT id1, id2, cos_raw,
             row_number() OVER (PARTITION BY id1 ORDER BY cos_raw DESC, id2) AS rank
      FROM scored
    )
    SELECT id1, id2, round(cos_raw, 6) AS cosine, rank
    FROM rank2 WHERE rank <= 10
    """,
)
def sim_cosine_topk_ivf_q(spark, sf_dir):
    """IVF ANN top-10 (deterministic coarse centroids, nprobe=2) — the
    second scale path next to hyperplane LSH, oracle-checked exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_ivf(emb, "vec_id", "embedding", probe_mod=50, k=10)


def _duck_ivf_knn_ctes(probe_mod: int, k: int) -> str:
    """IVF candidate CTE chain ending in rank2 — the oracle replay of
    `knn_graph_ann` (deterministic centroids, nprobe cells, exact
    re-rank).  Starts after a `base` CTE; caller appends the SELECT."""
    return f"""
    , cents AS (
      SELECT vid AS cid, v AS cv FROM base WHERE vid % {CENTROID_MOD} = 1
    ), assign AS (
      SELECT b.vid, b.v, c.cid,
             {duck_cosine("b.v", "c.cv", DIM)} AS cs
      FROM base b, cents c
    ), ranked_assign AS (
      SELECT vid, v, cid, cs,
             row_number() OVER (PARTITION BY vid ORDER BY cs DESC, cid) AS rn
      FROM assign
    ), cells AS MATERIALIZED (
      SELECT vid, v, cid FROM ranked_assign WHERE rn = 1
    ), pcells AS MATERIALIZED (
      SELECT vid AS pid, v AS pv, cid
      FROM ranked_assign WHERE rn <= {NPROBE} AND vid % {probe_mod} = 0
    ), cand AS (
      SELECT DISTINCT p.pid, p.pv, c.vid, c.v
      FROM pcells p JOIN cells c ON p.cid = c.cid AND p.pid <> c.vid
    ), scored AS (
      SELECT pid AS id1, vid AS id2, {duck_cosine("pv", "v", DIM)} AS cos_raw
      FROM cand
    ), rank2 AS (
      SELECT id1, id2, cos_raw,
             row_number() OVER (PARTITION BY id1 ORDER BY cos_raw DESC, id2) AS rank
      FROM scored
      QUALIFY rank <= {k}
    )"""


@query(
    "graph_knn_ann_edges",
    oracle=_duck_base(5)
    + _duck_ivf_knn_ctes(5, 10)
    + """
    SELECT id1, id2, CAST(floor(cos_raw * 1000000) AS BIGINT) AS cosine_x1m, rank
    FROM rank2
    """,
)
def graph_knn_ann_edges_q(spark, sf_dir):
    """The ANN kNN-GRAPH builder, oracle-checked exactly: every 1-in-5
    vertex gets its top-10 neighbors from IVF candidates (nprobe=2
    cells, plain cell equi-join — no probe broadcast, because here the
    probe side IS the corpus) with exact cosine re-rank.  This is the
    edge list the graph family consumes at 100 TB in place of the
    brute-force builder (BASELINE.md §5 b25 caveat).  Scores are
    floor-quantized to integer micro-units on the bit-identical raw
    double (the repo's standing rule — round()'s tie semantics differ
    across engines).  Centroids here are the modular oracle-replay set
    (explicit ``centroid_mod``); the library DEFAULT trains constant-k
    k-means."""
    emb = load_table(spark, sf_dir, "embeddings")
    knn = knn_graph_ann(
        emb, "vec_id", "embedding", k=10, probe_mod=5,
        centroid_mod=CENTROID_MOD, nprobe=NPROBE, raw=True,
    )
    return knn.select(
        "id1",
        "id2",
        F.floor(F.col("cos_raw") * 1000000).cast("long").alias("cosine_x1m"),
        "rank",
    )


def _duck_bfs_ann_oracle(rounds: int, probe_mod: int, k: int, seed_mod: int) -> str:
    """Unrolled BFS oracle over the IVF-built kNN graph: the
    `_duck_bfs_oracle` min-merge rounds fed by `_duck_ivf_knn_ctes`
    instead of the brute-force ranked CTE."""
    ctes = [
        _duck_base(probe_mod).replace("WITH ", "").strip(),
        _duck_ivf_knn_ctes(probe_mod, k).strip().lstrip(",").strip(),
        f"""knn AS MATERIALIZED (
      SELECT DISTINCT least(id1, id2) AS u, greatest(id1, id2) AS v
      FROM rank2
    ), ed AS MATERIALIZED (
      SELECT u, v FROM knn UNION ALL SELECT v, u FROM knn
    ), d0 AS MATERIALIZED (
      SELECT vec_id AS id, 0 AS dist FROM embeddings WHERE vec_id % {seed_mod} = 0
    )""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(f"""d{r} AS MATERIALIZED (
      SELECT id, min(dist) AS dist FROM (
        SELECT id, dist FROM d{r-1}
        UNION ALL
        SELECT e.v AS id, d.dist + 1 AS dist
        FROM ed e JOIN d{r-1} d ON d.id = e.u
      ) GROUP BY id
    )""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT b.vid AS id, CAST(coalesce(d.dist, -1) AS BIGINT) AS dist
    FROM base b LEFT JOIN d{rounds} d ON d.id = b.vid
    """
    )


@query("graph_bfs_ann", oracle=_duck_bfs_ann_oracle(4, 5, 10, 50))
def graph_bfs_ann_q(spark, sf_dir):
    """Frontier BFS over the ANN-BUILT kNN graph (same seeds, hops and
    probe set as graph_bfs_hops, but edges from `knn_graph_ann` instead
    of brute-force scoring) — certifying the library's production graph
    path end-to-end: IVF candidate generation, exact re-rank, and the
    frontier iteration all hash-match the unrolled oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    knn = knn_graph_ann(
        emb, "vec_id", "embedding", k=10, probe_mod=5,
        centroid_mod=CENTROID_MOD, nprobe=NPROBE,
    )
    edges = knn.select(
        F.least("id1", "id2").alias("u"), F.greatest("id1", "id2").alias("v")
    ).distinct()
    vertices = emb.select(F.col("vec_id").alias("id"))
    seeds = emb.filter(F.col("vec_id") % 50 == 0).select(F.col("vec_id").alias("id"))
    return bfs_hops(vertices, edges, seeds, rounds=4)


def ann_recall(truth: DataFrame, approx: DataFrame, k: int) -> DataFrame:
    """Per-probe recall@k of an ANN result against exact ground truth:
    |approx ∩ truth| / k. The evaluation harness every ANN deployment
    needs before trusting an index — both inputs are (id1, id2) top-k
    tables keyed by probe."""
    t = truth.select("id1", "id2")
    a = approx.select(F.col("id1").alias("aid1"), F.col("id2").alias("aid2"))
    j = t.join(a, (t["id1"] == a["aid1"]) & (t["id2"] == a["aid2"]), "left")
    return (
        j.groupBy("id1")
        .agg(F.round(F.count("aid2") / F.lit(float(k)), 6).alias("recall"))
        .select(F.col("id1").alias("probe_id"), "recall")
    )


@query(
    "sim_ivf_recall",
    oracle=_duck_base(50)
    + f"""
    , t_scored AS (
      SELECT pid AS id1, vid AS id2, {duck_cosine("pv", "v", DIM)} AS cos_raw
      FROM base JOIN probes ON pid <> vid
    ), t_ranked AS (
      SELECT id1, id2,
             row_number() OVER (PARTITION BY id1 ORDER BY cos_raw DESC, id2) AS rank
      FROM t_scored
    ), truth AS (
      SELECT id1, id2 FROM t_ranked WHERE rank <= 10
    ), cents AS (
      SELECT vid AS cid, v AS cv FROM base WHERE vid % {CENTROID_MOD} = 1
    ), assign AS (
      SELECT b.vid, b.v, c.cid,
             {duck_cosine("b.v", "c.cv", DIM)} AS cs
      FROM base b, cents c
    ), ranked_assign AS (
      SELECT vid, v, cid, cs,
             row_number() OVER (PARTITION BY vid ORDER BY cs DESC, cid) AS rn
      FROM assign
    ), cells AS (
      SELECT vid, v, cid FROM ranked_assign WHERE rn = 1
    ), pcells AS (
      SELECT vid AS pid, v AS pv, cid
      FROM ranked_assign WHERE rn <= {NPROBE} AND vid % 50 = 0
    ), cand AS (
      SELECT DISTINCT p.pid, p.pv, c.vid, c.v
      FROM pcells p JOIN cells c ON p.cid = c.cid AND p.pid <> c.vid
    ), a_scored AS (
      SELECT pid AS id1, vid AS id2, {duck_cosine("pv", "v", DIM)} AS cos_raw
      FROM cand
    ), a_ranked AS (
      SELECT id1, id2,
             row_number() OVER (PARTITION BY id1 ORDER BY cos_raw DESC, id2) AS rank
      FROM a_scored
    ), approx AS (
      SELECT id1, id2 FROM a_ranked WHERE rank <= 10
    )
    SELECT t.id1 AS probe_id, round(count(a.id2) / 10.0, 6) AS recall
    FROM truth t LEFT JOIN approx a ON t.id1 = a.id1 AND t.id2 = a.id2
    GROUP BY t.id1
    """,
)
def sim_ivf_recall_q(spark, sf_dir):
    """Recall@10 of the IVF index against exact brute-force ground truth,
    per probe — oracle-checked end-to-end (both sides replayed in SQL)."""
    emb = load_table(spark, sf_dir, "embeddings")
    truth = cosine_topk_brute(emb, "vec_id", "embedding", probe_mod=50, k=10)
    approx = cosine_topk_ivf(emb, "vec_id", "embedding", probe_mod=50, k=10)
    return ann_recall(truth, approx, 10)


@query(
    "sim_norms",
    oracle=f"""
    WITH base AS (
      SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings
    )
    SELECT vid, round(sqrt({duck_dot("v", "v", DIM)}), 6) AS l2
    FROM base
    """,
)
def sim_norms_q(spark, sf_dir):
    """Per-vector L2 norm — the kernel primitive, oracle-checked over
    every row (validates the fold/association contract end-to-end)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        F.col("vec_id").alias("vid"),
        F.round(l2_norm(F.col("embedding").cast("array<double>")), 6).alias("l2"),
    )


_DUCK_TRI_CTES = """
    , knn AS (
      SELECT DISTINCT least(id1, id2) AS a, greatest(id1, id2) AS b
      FROM ranked WHERE rank <= 10
    ), deg AS (
      SELECT v, count(*) AS d FROM (
        SELECT a AS v FROM knn UNION ALL SELECT b AS v FROM knn
      ) GROUP BY v
    ), orient AS (
      SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND k.a < k.b)
                  THEN k.a ELSE k.b END AS u,
             CASE WHEN (da.d < db.d) OR (da.d = db.d AND k.a < k.b)
                  THEN k.b ELSE k.a END AS w,
             CASE WHEN (da.d < db.d) OR (da.d = db.d AND k.a < k.b)
                  THEN db.d ELSE da.d END AS dw
      FROM knn k JOIN deg da ON da.v = k.a JOIN deg db ON db.v = k.b
    ), wedges AS (
      SELECT e1.u, e1.w AS y, e2.w AS z
      FROM orient e1 JOIN orient e2 ON e2.u = e1.u
      WHERE (e1.dw < e2.dw) OR (e1.dw = e2.dw AND e1.w < e2.w)
    ), tri AS (
      SELECT wd.u, wd.y, wd.z
      FROM wedges wd JOIN orient c ON c.u = wd.y AND c.w = wd.z
    )"""


@query(
    "sim_knn_triangles",
    oracle=_duck_base(50)
    + _duck_topk_ctes()
    + _DUCK_TRI_CTES
    + """
    SELECT v, CAST(count(*) AS BIGINT) AS n_tri
    FROM (
      SELECT u AS v FROM tri
      UNION ALL SELECT y AS v FROM tri
      UNION ALL SELECT z AS v FROM tri
    ) GROUP BY v
    """,
)
def sim_knn_triangles_q(spark, sf_dir):
    """kNN-graph triangle census: exact cosine top-10 edges for the
    probe set, symmetrized, then degree-ordered triangle counting —
    the cluster-density signal over the similarity graph."""
    from dask_obj_spark.operators.corpus import triangle_counts

    emb = load_table(spark, sf_dir, "embeddings")
    knn = cosine_topk_brute(emb, "vec_id", "embedding", probe_mod=50, k=10)
    return triangle_counts(knn.select("id1", "id2"), "id1", "id2")


# -- power-iteration PCA ------------------------------------------------------


def pca_power_top_component(
    df: DataFrame, id_col: str, vec_col: str, rounds: int = 8
) -> DataFrame:
    """Dominant right-singular direction of the embedding matrix by
    power iteration: v ← normalize(Xᵀ(X·v)), starting from the uniform
    unit vector.  (Uncentered — the top component of the second moment;
    mean-centering is one extra broadcast subtraction with the same
    plan.)

    Fully distributed iteration: X·v is a broadcast join of the
    exploded (vec_id, dim, x) matrix against the 64-row v estimate and
    a per-vector sum; Xᵀs is the mirrored join against the 500-row
    score vector with a per-dim sum.  The shuffle never carries more
    than (rows + dims) scalars per round — at 100 TB the matrix stays
    put and only the d-vector circulates, which is exactly how
    distributed Lanczos/power solvers are laid out.  Sign is fixed by
    making the largest-|loading| coordinate positive.

    Returns (i, loading) — dim rows, the unit top component.

    Round structure (optimization r16, guide §1.2 step 1 / §5): the
    r15 shape pinned ``v`` per round, so each round's one eager action
    computed the back-projection ``w`` TWICE (once under the norm
    broadcast, once on the streamed crossJoin leg) and paid a broadcast
    build, a checkpoint and three jobs per round.  The iteration state
    is dim doubles — CONSTANT-sized (the embedding width), the same
    bound the old broadcast relied on — so instead each round runs ONE
    job: the corpus-touching back-projection, collected as dim rows.
    The norm fold and the division happen in driver doubles (IEEE-754,
    the same ops Spark's codegen emits; the sum fold order was already
    nondeterministic in Spark's partial aggregation, and the dual-SF
    oracle gate certifies the 6-decimal outputs), and the next round's
    estimate goes back in as an exact literal array
    (:func:`~dask_obj_spark.functions.fastlit.lit_double_array` —
    repr round-trip, bit-identical to `F.lit`).  The distributed legs
    (x*c products, the two aggregation trees) are unchanged
    expression-for-expression."""
    mat = (
        df.select(
            F.col(id_col).alias("vid"),
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x"),
        )
        .localCheckpoint(eager=True)
    )
    dim = mat.agg(F.max("i")).first()[0] + 1
    v = [1.0 / math.sqrt(float(dim))] * dim
    for _ in range(rounds):
        c = F.element_at(lit_double_array(v), F.col("i") + 1)
        s = (
            mat.select("vid", (F.col("x") * c).alias("xc"))
            .groupBy("vid")
            .agg(F.sum(F.col("xc")).alias("s"))
        )
        w = (
            mat.join(F.broadcast(s), "vid")
            .groupBy("i")
            .agg(F.sum(F.col("s") * F.col("x")).alias("w"))
        )
        wi = {r["i"]: r["w"] for r in w.collect()}
        if len(wi) != dim:
            raise ValueError(
                "pca_power_top_component: back-projection lost a dimension "
                f"({len(wi)} of {dim} present) — input vectors must cover "
                "every dim index"
            )
        sq = 0.0
        for i in range(dim):
            sq += wi[i] * wi[i]
        norm = math.sqrt(sq)
        v = [wi[i] / norm for i in range(dim)]
    spark = df.sparkSession
    vfinal = spark.range(dim).select(
        F.col("id").cast("int").alias("i"),
        F.element_at(lit_double_array(v), F.col("id").cast("int") + 1).alias("c"),
    )
    sign = vfinal.orderBy(F.abs(F.col("c")).desc(), "i").limit(1).select(
        F.when(F.col("c") < 0, F.lit(-1.0)).otherwise(F.lit(1.0)).alias("sgn")
    )
    return vfinal.crossJoin(F.broadcast(sign)).select(
        "i", F.round(F.col("c") * F.col("sgn"), 6).alias("loading")
    )


def _duck_pca_oracle(rounds: int, dim: int) -> str:
    ctes = [
        f"""mat AS MATERIALIZED (
      SELECT vec_id AS vid,
             generate_subscripts(embedding::DOUBLE[], 1) - 1 AS i,
             unnest(embedding::DOUBLE[]) AS x
      FROM embeddings
    ), v0 AS (
      SELECT i, 1.0 / sqrt({dim}.0) AS c FROM range({dim}) t(i)
    )"""
    ]
    for t in range(1, rounds + 1):
        # AS MATERIALIZED: DuckDB inlines CTEs by default, so chained
        # rounds would nest exponentially without it
        ctes.append(f"""s{t} AS MATERIALIZED (
      SELECT m.vid, sum(m.x * v.c) AS s
      FROM mat m JOIN v{t-1} v ON v.i = m.i GROUP BY m.vid
    ), w{t} AS MATERIALIZED (
      SELECT m.i, sum(s.s * m.x) AS w
      FROM mat m JOIN s{t} s ON s.vid = m.vid GROUP BY m.i
    ), n{t} AS MATERIALIZED (
      SELECT sqrt(sum(w * w)) AS n FROM w{t}
    ), v{t} AS MATERIALIZED (
      SELECT i, w / (SELECT n FROM n{t}) AS c FROM w{t}
    )""")
    last = f"v{rounds}"
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    sgn AS (
      SELECT CASE WHEN c < 0 THEN -1.0 ELSE 1.0 END AS sgn
      FROM {last} ORDER BY abs(c) DESC, i LIMIT 1
    )
    SELECT i, round(c * sgn, 6) AS loading FROM {last} CROSS JOIN sgn
    """
    )


@query("sim_pca_power", oracle=_duck_pca_oracle(8, DIM))
def sim_pca_power_q(spark, sf_dir):
    """Top principal direction of the embedding corpus — 8 rounds of
    distributed power iteration, hash-matched against the identical
    unrolled iteration in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    return pca_power_top_component(emb, "vec_id", "embedding", rounds=8)


def pca_top_components(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_components: int = 2,
    rounds: int = 4,
) -> DataFrame:
    """Mean-centered top-k PCA by deflated power iteration — the real
    embedding-whitening primitive (``sim_pca_power`` finds the dominant
    direction of the UNcentered second moment; this subtracts the mean
    first, so components are true covariance eigenvectors, then peels
    k of them).

    Layout is the same distributed-solver shape as the single-component
    version: the (vid, i, x) matrix stays put and only dim-row vectors
    circulate as broadcasts.  Mean-centering is one dim-row aggregate
    broadcast-subtracted onto the stream (the centered matrix is
    checkpointed once and reused by every round of every component).
    Deflation is Gram-Schmidt per round: after each back-projection,
    subtract ``(w·u_j) u_j`` for every previously-extracted component —
    u_j is a broadcast dim-row frame and the dot product is a dim-row
    aggregate, so orthogonalization costs no shuffle of the corpus.
    Sign fixed per component (largest-|loading| coordinate positive).

    Returns (comp, i, loading): ``n_components × dim`` rows.

    Round structure (optimization r16): same rework as
    `pca_power_top_component` — the per-round/per-component state
    (estimate, extracted components, Gram-Schmidt dots) is dim-bounded,
    so each round runs ONE job (the corpus-touching back-projection,
    collected as dim rows, instead of 3+len(components) jobs through
    the pin / GS / norm legs) and Gram-Schmidt, the norm fold and the
    division happen in driver doubles — elementwise IEEE-754 ops
    identical to the Spark expressions they replace; the sum-fold
    order was already nondeterministic under partial aggregation and
    the dual-SF oracle gate certifies the 6-decimal outputs."""
    mat = df.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x"),
    )
    mu = mat.groupBy("i").agg(F.avg("x").alias("mu"))
    cmat = (
        mat.join(F.broadcast(mu), "i")
        .select("vid", "i", (F.col("x") - F.col("mu")).alias("x"))
        .localCheckpoint(eager=True)
    )
    dim = cmat.agg(F.max("i")).first()[0] + 1

    def dense_vec(frame: DataFrame, col: str, what: str) -> list[float]:
        vals = {r["i"]: r[col] for r in frame.collect()}
        if len(vals) != dim:
            raise ValueError(
                f"pca_top_components: {what} lost a dimension "
                f"({len(vals)} of {dim} present) — input vectors must "
                "cover every dim index"
            )
        return [vals[i] for i in range(dim)]

    components: list[list[float]] = []
    for _ in range(n_components):
        v = [1.0 / math.sqrt(float(dim))] * dim
        for _r in range(rounds):
            c = F.element_at(lit_double_array(v), F.col("i") + 1)
            s = (
                cmat.select("vid", (F.col("x") * c).alias("xc"))
                .groupBy("vid")
                .agg(F.sum(F.col("xc")).alias("s"))
            )
            w = (
                cmat.join(F.broadcast(s), "vid")
                .groupBy("i")
                .agg(F.sum(F.col("s") * F.col("x")).alias("w"))
            )
            wv = dense_vec(w, "w", "back-projection")
            for u in components:  # Gram-Schmidt against extracted components
                d = 0.0
                for i in range(dim):
                    d += wv[i] * u[i]
                wv = [wv[i] - d * u[i] for i in range(dim)]
            sq = 0.0
            for x in wv:
                sq += x * x
            norm = math.sqrt(sq)
            v = [x / norm for x in wv]
        components.append(v)
    spark = df.sparkSession
    out = None
    for ci, u in enumerate(components):
        uf = spark.createDataFrame(
            [(i, float(x)) for i, x in enumerate(u)], "i int, u double"
        )
        sign = uf.orderBy(F.abs(F.col("u")).desc(), "i").limit(1).select(
            F.when(F.col("u") < 0, F.lit(-1.0)).otherwise(F.lit(1.0)).alias("sgn")
        )
        comp = uf.crossJoin(F.broadcast(sign)).select(
            F.lit(ci).cast("int").alias("comp"),
            "i",
            F.round(F.col("u") * F.col("sgn"), 6).alias("loading"),
        )
        out = comp if out is None else out.unionByName(comp)
    return out


def _duck_pca_topk_oracle(n_components: int, rounds: int, dim: int) -> str:
    """Unrolled deflated power iteration — per component c and round t:
    scores s_ct, back-projection w_ct, one Gram-Schmidt subtraction per
    prior component, norm, normalized v_ct.  AS MATERIALIZED throughout
    (DuckDB inlines CTEs; chained rounds nest exponentially otherwise)."""
    ctes = [
        f"""mat AS MATERIALIZED (
      SELECT vec_id AS vid,
             generate_subscripts(embedding::DOUBLE[], 1) - 1 AS i,
             unnest(embedding::DOUBLE[]) AS x
      FROM embeddings
    ), mu AS MATERIALIZED (
      SELECT i, avg(x) AS mu FROM mat GROUP BY i
    ), cmat AS MATERIALIZED (
      SELECT m.vid, m.i, m.x - mu.mu AS x FROM mat m JOIN mu ON mu.i = m.i
    )"""
    ]
    finals = []
    for c in range(n_components):
        ctes.append(f"""v{c}_0 AS (
      SELECT i, 1.0 / sqrt({dim}.0) AS c FROM range({dim}) t(i)
    )""")
        for t in range(1, rounds + 1):
            ctes.append(f"""s{c}_{t} AS MATERIALIZED (
      SELECT m.vid, sum(m.x * v.c) AS s
      FROM cmat m JOIN v{c}_{t-1} v ON v.i = m.i GROUP BY m.vid
    ), w{c}_{t}_0 AS MATERIALIZED (
      SELECT m.i, sum(s.s * m.x) AS w
      FROM cmat m JOIN s{c}_{t} s ON s.vid = m.vid GROUP BY m.i
    )""")
            for j in range(c):
                ctes.append(f"""d{c}_{t}_{j} AS MATERIALIZED (
      SELECT sum(w.w * u.u) AS d
      FROM w{c}_{t}_{j} w JOIN u{j} u ON u.i = w.i
    ), w{c}_{t}_{j+1} AS MATERIALIZED (
      SELECT w.i, w.w - (SELECT d FROM d{c}_{t}_{j}) * u.u AS w
      FROM w{c}_{t}_{j} w JOIN u{j} u ON u.i = w.i
    )""")
            ctes.append(f"""n{c}_{t} AS MATERIALIZED (
      SELECT sqrt(sum(w * w)) AS n FROM w{c}_{t}_{c}
    ), v{c}_{t} AS MATERIALIZED (
      SELECT i, w / (SELECT n FROM n{c}_{t}) AS c FROM w{c}_{t}_{c}
    )""")
        ctes.append(f"""u{c} AS MATERIALIZED (
      SELECT i, c AS u FROM v{c}_{rounds}
    ), sgn{c} AS (
      SELECT CASE WHEN u < 0 THEN -1.0 ELSE 1.0 END AS sgn
      FROM u{c} ORDER BY abs(u) DESC, i LIMIT 1
    )""")
        finals.append(
            f"SELECT CAST({c} AS INT) AS comp, i, round(u * sgn, 6) AS loading"
            f" FROM u{c} CROSS JOIN sgn{c}"
        )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + "\n    UNION ALL\n    ".join(finals)


@query("sim_pca_topk", oracle=_duck_pca_topk_oracle(2, 4, DIM))
def sim_pca_topk_q(spark, sf_dir):
    """Top-2 mean-centered principal components by deflated power
    iteration (4 rounds each), hash-matched against the identical
    unrolled iteration in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    return pca_top_components(emb, "vec_id", "embedding", n_components=2, rounds=4)


@query(
    "sim_standardize_dims",
    oracle="""
    WITH m AS (
      SELECT vec_id, generate_subscripts(embedding::DOUBLE[], 1) - 1 AS i,
             unnest(embedding::DOUBLE[]) AS x
      FROM embeddings
    ), stats AS (
      SELECT i, avg(x) AS mu, stddev_pop(x) AS sd FROM m GROUP BY i
    )
    SELECT m.vec_id, m.i, round((m.x - s.mu) / s.sd, 6) AS z
    FROM m JOIN stats s ON s.i = m.i
    """,
)
def sim_standardize_dims_q(spark, sf_dir):
    """Per-dimension z-score standardization of the embedding corpus
    (feature preprocessing for distance-based ML): one explode, one
    64-row stats aggregate broadcast back onto the stream.  The
    shuffle carries per-dim partial moments, never vectors — the
    corpus-side join is broadcast, so the operator runs at scan
    bandwidth at any corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    m = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x"),
    )
    stats = m.groupBy("i").agg(
        F.avg("x").alias("mu"), F.stddev_pop("x").alias("sd")
    )
    return m.join(F.broadcast(stats), "i").select(
        "vec_id", "i", F.round((F.col("x") - F.col("mu")) / F.col("sd"), 6).alias("z")
    )


# -- label propagation (semi-supervised) --------------------------------------


def label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
) -> DataFrame:
    """Semi-supervised label propagation over an undirected edge list:
    seed vertices hold their label (clamped); every other vertex takes
    the MAJORITY label of its labeled neighbors each round (ties →
    smallest label) — the weak-supervision primitive for spreading a
    small hand-labeled set over a similarity graph.

    ``edges``: (u, v) one row per undirected edge; ``seeds``: (id, lab,
    seed) with lab NULL for unlabeled vertices.  Per round: one
    neighbor-label count aggregate + one per-vertex argmax window +
    one left join — all keyed on the vertex, reusing one partitioning;
    localCheckpoint per round (the iterative-operator contract shared
    with connected_components/kmeans/BPE)."""
    # materialize the symmetrized edges once: every round consumes them,
    # and an unpinned lineage would re-run the upstream edge
    # construction (e.g. brute-force kNN scoring) per round
    sym = (
        edges.select(F.col("u"), F.col("v"))
        .union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=True)
    )
    lab = seeds.localCheckpoint(eager=True)
    for _ in range(rounds):
        nb = (
            sym.join(lab.select(F.col("id").alias("u"), "lab"), "u")
            .filter(F.col("lab").isNotNull())
            .groupBy(F.col("v").alias("id"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("id").orderBy(F.desc("c"), F.asc("lab"))
        best = (
            nb.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", F.col("lab").alias("new_lab"))
        )
        lab = (
            lab.join(best, "id", "left")
            .select(
                "id",
                F.when(F.col("seed") == 1, F.col("lab"))
                .otherwise(F.coalesce(F.col("new_lab"), F.col("lab")))
                .alias("lab"),
                "seed",
            )
            .localCheckpoint(eager=True)
        )
    return lab.select(
        "id", F.coalesce(F.col("lab"), F.lit(-1)).cast("long").alias("lab")
    )


def _duck_lpa_oracle(rounds: int, probe_mod: int, k: int) -> str:
    ctes = [
        _duck_base(probe_mod).replace("WITH ", "").strip(),
        _duck_topk_ctes().strip().lstrip(',').strip(),
        f"""knn AS MATERIALIZED (
      SELECT DISTINCT least(id1, id2) AS a, greatest(id1, id2) AS b
      FROM ranked WHERE rank <= {k}
    ), ed AS MATERIALIZED (
      SELECT a AS u, b AS v FROM knn UNION ALL SELECT b, a FROM knn
    ), lab0 AS MATERIALIZED (
      SELECT vec_id AS id,
             CASE WHEN vec_id % 5 = 0 THEN label END AS lab,
             CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END AS seed
      FROM embeddings
    )""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(f"""nb{r} AS MATERIALIZED (
      SELECT e.v AS id, l.lab, count(*) AS c
      FROM ed e JOIN lab{r-1} l ON l.id = e.u
      WHERE l.lab IS NOT NULL GROUP BY e.v, l.lab
    ), bst{r} AS MATERIALIZED (
      SELECT id, lab FROM (
        SELECT id, lab,
               row_number() OVER (PARTITION BY id ORDER BY c DESC, lab) AS rn
        FROM nb{r}
      ) WHERE rn = 1
    ), lab{r} AS MATERIALIZED (
      SELECT l.id,
             CASE WHEN l.seed = 1 THEN l.lab
                  ELSE coalesce(b.lab, l.lab) END AS lab,
             l.seed
      FROM lab{r-1} l LEFT JOIN bst{r} b ON b.id = l.id
    )""")
    # lab is NULL for never-reached vertices; coalesce to -1 and cast so
    # neither client renders the column as nullable-int-promoted float
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT id, CAST(coalesce(lab, -1) AS BIGINT) AS lab"
        + f" FROM lab{rounds}"
    )


@query("sim_label_propagation", oracle=_duck_lpa_oracle(3, 5, 10))
def sim_label_propagation_q(spark, sf_dir):
    """3 rounds of label propagation over the 1-in-5-probe kNN graph,
    seeds = every 5th vector clamped to its true label — each round
    hash-matched against the unrolled materialized-CTE oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    knn = cosine_topk_brute(emb, "vec_id", "embedding", probe_mod=5, k=10)
    edges = (
        knn.select(
            F.least("id1", "id2").alias("u"), F.greatest("id1", "id2").alias("v")
        )
        .distinct()
    )
    seeds = emb.select(
        F.col("vec_id").alias("id"),
        F.when(F.col("vec_id") % 5 == 0, F.col("label")).alias("lab"),
        (F.col("vec_id") % 5 == 0).cast("int").alias("seed"),
    )
    return label_propagation(edges, seeds, rounds=3)


# -- k-core decomposition -----------------------------------------------------


def k_core(edges: DataFrame, k: int, rounds: int | None = None) -> DataFrame:
    """k-core of an undirected graph by iterative peeling: drop every
    vertex with degree < k, recompute degrees on the induced subgraph,
    repeat — the fixpoint is the maximal subgraph where everyone has
    ≥ k neighbors (the density filter used to separate genuine
    similarity communities from sparse hub noise before clustering).

    With ``rounds=None`` (the library default) peeling iterates TO
    CONVERGENCE: each round's edge set is localCheckpointed anyway, so
    the stopping check is one cheap ``count()`` on materialized data,
    and the loop exits the first round the edge count stabilizes —
    returning the true maximal-subgraph fixpoint regardless of graph
    shape (a pendant chain of length L needs L rounds).  Passing an
    explicit ``rounds`` runs that FIXED unroll instead (extra rounds
    past convergence are no-ops), which is what the oracle-paired
    query uses so the SQL oracle can replay the exact round count.

    Per round one degree aggregate + one semi-join on the vertex — the
    shuffle carries (vertex, degree) pairs.  Returns (id, degree)."""
    e = (
        edges.select(F.col("u"), F.col("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def peel(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("u")
        return (
            e.join(keep, "u")
            .join(keep.select(F.col("u").alias("v")), "v")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )

    if rounds is None:
        n = e.count()
        while n:
            e = peel(e)
            n2 = e.count()
            if n2 == n:
                break
            n = n2
    else:
        for _ in range(rounds):
            e = peel(e)
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return sym.groupBy(F.col("u").alias("id")).agg(F.count(F.lit(1)).alias("degree"))


def _duck_kcore_oracle(k: int, rounds: int, probe_mod: int, topk: int) -> str:
    ctes = [
        _duck_base(probe_mod).replace("WITH ", "").strip(),
        _duck_topk_ctes().strip().lstrip(",").strip(),
        f"""e0 AS MATERIALIZED (
      SELECT DISTINCT least(id1, id2) AS u, greatest(id1, id2) AS v
      FROM ranked WHERE rank <= {topk} AND id1 <> id2
    )""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(f"""sym{r} AS MATERIALIZED (
      SELECT u, v FROM e{r-1} UNION ALL SELECT v, u FROM e{r-1}
    ), keep{r} AS MATERIALIZED (
      SELECT u FROM sym{r} GROUP BY u HAVING count(*) >= {k}
    ), e{r} AS MATERIALIZED (
      SELECT e.u, e.v FROM e{r-1} e
      JOIN keep{r} ka ON ka.u = e.u
      JOIN keep{r} kb ON kb.u = e.v
    )""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f""",
    symf AS (SELECT u, v FROM e{rounds} UNION ALL SELECT v, u FROM e{rounds})
    SELECT u AS id, count(*) AS degree FROM symf GROUP BY u
    """
    )


@query("sim_knn_kcore", oracle=_duck_kcore_oracle(3, 8, 5, 10))
def sim_knn_kcore_q(spark, sf_dir):
    """3-core of the 1-in-5-probe kNN graph after 8 peel rounds —
    the dense-community filter, hash-matched against the unrolled
    peeling oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    knn = cosine_topk_brute(emb, "vec_id", "embedding", probe_mod=5, k=10)
    edges = knn.select(
        F.least("id1", "id2").alias("u"), F.greatest("id1", "id2").alias("v")
    ).distinct()
    return k_core(edges, k=3, rounds=8)


# -- multi-source BFS hop distances -------------------------------------------


def bfs_hops(
    vertices: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int,
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any seed vertex,
    explored `rounds` hops deep — the reachability/diffusion primitive
    (influence radius, contamination spread over a similarity graph,
    "how far is every doc from a trusted set").

    ``vertices``: (id); ``edges``: (u, v) one row per undirected edge;
    ``seeds``: (id) at distance 0.  Vertices unreached within `rounds`
    hops report -1.

    Scale shape: the classic frontier algorithm — each round joins ONLY
    the newly-discovered frontier against the (symmetrized) edge list,
    anti-joins out already-settled vertices, and appends the rest at
    distance r.  Work per round is O(frontier · avg-degree), not
    O(vertices); the settled table is localCheckpointed per round (the
    iterative-operator contract shared with connected_components /
    k_core / label_propagation) and the frontier is derived from the
    pin as the leaf-only filter ``dist == r`` — ONE eager checkpoint
    per hop instead of the r15 shape's two (frontier pinned separately,
    plus a dead pin of the final hop's never-consumed frontier), same
    rows by construction (optimization r16, guide §5).  BFS guarantees
    a vertex is first reached at its minimum hop count, so the
    append-only settled table needs no min-merge.

    The symmetrized edge list localCheckpoints ONCE before the loop: it
    is consumed by every round, and without materialization each round
    re-executes the full upstream edge construction (for a kNN graph
    the entire brute-force scoring — measured ~4x the whole query at
    bench scale before this pin).

    Graph construction: when the input is "the kNN graph of the
    corpus", build edges with `knn_graph_ann` (IVF candidates + exact
    re-rank — the 100 TB path, certified by graph_bfs_ann); the brute
    builder stays only inside oracle-paired queries whose fixed-unroll
    DuckDB replay needs it."""
    sym = (
        edges.select("u", "v")
        .union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=True)
    )
    dist = (
        seeds.select(F.col("id"), F.lit(0).alias("dist"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for r in range(1, rounds + 1):
        cand = (
            sym.join(frontier.select(F.col("id").alias("u")), "u")
            .select(F.col("v").alias("id"))
            .distinct()
        )
        new = cand.join(dist, "id", "left_anti").select(
            "id", F.lit(r).alias("dist")
        )
        dist = dist.union(new).localCheckpoint(eager=True)
        frontier = dist.filter(F.col("dist") == r)
    return vertices.join(dist, "id", "left").select(
        "id", F.coalesce(F.col("dist"), F.lit(-1)).cast("long").alias("dist")
    )


def _duck_bfs_oracle(rounds: int, probe_mod: int, topk: int, seed_mod: int) -> str:
    """Unrolled BFS oracle: per round, min-merge of the previous distance
    table with every neighbor's dist+1 (equivalent to the frontier form:
    BFS first touches a vertex at its minimum hop)."""
    ctes = [
        _duck_base(probe_mod).replace("WITH ", "").strip(),
        _duck_topk_ctes().strip().lstrip(",").strip(),
        f"""knn AS MATERIALIZED (
      SELECT DISTINCT least(id1, id2) AS u, greatest(id1, id2) AS v
      FROM ranked WHERE rank <= {topk}
    ), ed AS MATERIALIZED (
      SELECT u, v FROM knn UNION ALL SELECT v, u FROM knn
    ), d0 AS MATERIALIZED (
      SELECT vec_id AS id, 0 AS dist FROM embeddings WHERE vec_id % {seed_mod} = 0
    )""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(f"""d{r} AS MATERIALIZED (
      SELECT id, min(dist) AS dist FROM (
        SELECT id, dist FROM d{r-1}
        UNION ALL
        SELECT e.v AS id, d.dist + 1 AS dist
        FROM ed e JOIN d{r-1} d ON d.id = e.u
      ) GROUP BY id
    )""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT b.vid AS id, CAST(coalesce(d.dist, -1) AS BIGINT) AS dist
    FROM base b LEFT JOIN d{rounds} d ON d.id = b.vid
    """
    )


@query("graph_bfs_hops", oracle=_duck_bfs_oracle(4, 5, 10, 50))
def graph_bfs_hops_q(spark, sf_dir):
    """Hop distance from the 1-in-50 seed set over the 1-in-5-probe kNN
    graph, 4 hops deep (unreached = -1) — frontier BFS hash-matched
    against the unrolled min-merge oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    knn = cosine_topk_brute(emb, "vec_id", "embedding", probe_mod=5, k=10)
    edges = knn.select(
        F.least("id1", "id2").alias("u"), F.greatest("id1", "id2").alias("v")
    ).distinct()
    vertices = emb.select(F.col("vec_id").alias("id"))
    seeds = emb.filter(F.col("vec_id") % 50 == 0).select(F.col("vec_id").alias("id"))
    return bfs_hops(vertices, edges, seeds, rounds=4)


# -- weighted single-source shortest paths ------------------------------------


def weighted_sssp(
    vertices: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int | None = None,
) -> DataFrame:
    """Multi-source weighted shortest paths (Bellman-Ford min-merge):
    minimum total edge weight from any seed to every vertex — the
    weighted generalization of `bfs_hops` (semantic distance through a
    similarity graph, cheapest-hop routing, influence with per-edge
    cost).

    ``edges``: (u, v, w) one row per undirected edge, ``w`` a
    non-negative BIGINT (callers quantize float weights to integer
    micro-units FIRST, so path sums are exact on every engine and no
    float-summation-order noise can flip a min).  ``seeds``: (id) at
    distance 0.  Unreached vertices report -1.

    With ``rounds=None`` (library default) relaxation iterates TO
    CONVERGENCE — each round's distance table is localCheckpointed, so
    the stopping check (same row count AND same exact BIGINT sum —
    min-merge only ever improves, so the pair is a fixpoint witness) is
    two cheap aggregates on materialized data; paths up to the graph
    diameter are found regardless of shape.  An explicit ``rounds``
    runs that FIXED unroll instead (extra rounds past convergence are
    no-ops), which the oracle-paired query uses so the SQL oracle can
    replay the exact round count — the k_core / bfs_hops contract.

    Scale shape: per round ONE equi-join of the current distance table
    against the symmetrized edge list and ONE min-merge hash aggregate
    — the shuffle carries (vertex, candidate-distance) pairs, never
    payloads.  Unlike frontier BFS the full distance table re-relaxes
    each round (weighted minima can improve through longer paths), the
    standard trade until delta-stepping; the edge list checkpoints once
    before the loop (shared-scan pin, see `bfs_hops`)."""
    sym = (
        edges.select("u", "v", "w")
        .union(
            edges.select(
                F.col("v").alias("u"), F.col("u").alias("v"), F.col("w")
            )
        )
        .localCheckpoint(eager=True)
    )
    dist = (
        seeds.select("id", F.lit(0).cast("long").alias("dist"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def relax(d: DataFrame) -> DataFrame:
        cand = sym.join(d.select(F.col("id").alias("u"), "dist"), "u").select(
            F.col("v").alias("id"), (F.col("dist") + F.col("w")).alias("dist")
        )
        return (
            d.union(cand)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )

    if rounds is None:
        sig = dist.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dist").alias("s")
        ).first()
        while True:
            dist = relax(dist)
            new_sig = dist.agg(
                F.count(F.lit(1)).alias("n"), F.sum("dist").alias("s")
            ).first()
            if (new_sig["n"], new_sig["s"]) == (sig["n"], sig["s"]):
                break
            sig = new_sig
    else:
        for _ in range(rounds):
            dist = relax(dist)
    return vertices.join(dist, "id", "left").select(
        "id", F.coalesce(F.col("dist"), F.lit(-1)).cast("long").alias("dist_micro")
    )


def _duck_sssp_oracle(rounds: int, probe_mod: int, topk: int, seed_mod: int) -> str:
    """Unrolled Bellman-Ford oracle over the micro-unit-weighted kNN
    graph: per round, min-merge of the previous distance table with
    every neighbor's dist + edge weight.  Weights floor-quantize the
    RAW cosine ((1 - cos) · 1e6 → BIGINT) — floor on the bit-identical
    double agrees across engines where round()'s tie handling would
    not, and integer path sums are exact."""
    ctes = [
        _duck_base(probe_mod).replace("WITH ", "").strip(),
        _duck_topk_ctes().strip().lstrip(",").strip(),
        f"""knnw AS MATERIALIZED (
      SELECT least(id1, id2) AS u, greatest(id1, id2) AS v,
             CAST(floor((1.0 - cos_raw) * 1000000) AS BIGINT) AS w
      FROM ranked WHERE rank <= {topk} AND id1 <> id2
    ), ew AS MATERIALIZED (
      SELECT u, v, min(w) AS w FROM knnw GROUP BY u, v
    ), ed AS MATERIALIZED (
      SELECT u, v, w FROM ew UNION ALL SELECT v, u, w FROM ew
    ), d0 AS MATERIALIZED (
      SELECT vec_id AS id, CAST(0 AS BIGINT) AS dist FROM embeddings
      WHERE vec_id % {seed_mod} = 0
    )""",
    ]
    for r in range(1, rounds + 1):
        ctes.append(f"""d{r} AS MATERIALIZED (
      SELECT id, min(dist) AS dist FROM (
        SELECT id, dist FROM d{r-1}
        UNION ALL
        SELECT e.v AS id, d.dist + e.w AS dist
        FROM ed e JOIN d{r-1} d ON d.id = e.u
      ) GROUP BY id
    )""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT b.vid AS id, CAST(coalesce(d.dist, -1) AS BIGINT) AS dist_micro
    FROM base b LEFT JOIN d{rounds} d ON d.id = b.vid
    """
    )


@query("graph_weighted_sssp", oracle=_duck_sssp_oracle(4, 5, 10, 50))
def graph_weighted_sssp_q(spark, sf_dir):
    """Cheapest cosine-distance path from the 1-in-50 seed set over the
    1-in-5-probe kNN graph, 4 relaxation rounds, weights in integer
    micro-units of (1 - cosine) — Bellman-Ford hash-matched against
    the unrolled min-merge oracle (unreached = -1)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ranked = cosine_ranked_raw(emb, "vec_id", "embedding", probe_mod=5)
    edges = (
        ranked.filter((F.col("rank") <= 10) & (F.col("id1") != F.col("id2")))
        .select(
            F.least("id1", "id2").alias("u"),
            F.greatest("id1", "id2").alias("v"),
            F.floor((F.lit(1.0) - F.col("cos_raw")) * 1000000)
            .cast("long")
            .alias("w"),
        )
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
    )
    vertices = emb.select(F.col("vec_id").alias("id"))
    seeds = emb.filter(F.col("vec_id") % 50 == 0).select(F.col("vec_id").alias("id"))
    return weighted_sssp(vertices, edges, seeds, rounds=4)


# -- product quantization -----------------------------------------------------

PQ_M = 4  # subspaces (DIM/PQ_M dims each)
PQ_MOD = 11  # deterministic codebook: subvectors of vids with vid % 11 == 1
# Codebook vids are additionally bounded to vid < PQ_CB_CAP: model state
# must be constant-size by construction (the train_sample discipline —
# PLANS.md "models see a slice, the corpus only flows through the encode
# scan").  An UNcapped vid % 11 codebook grows linearly with the corpus,
# making encode work quadratic: the r6 sf1 spot-check measured 15.9× at
# 10× data (BASELINE.md §6).  512 covers every vec_id at the sf0.01
# correctness gate (max 499 — hashes unchanged), so bigger SFs keep the
# SAME bounded 47-codeword model instead of a corpus-sized one.
PQ_CB_CAP = 512


def sqdist(a: Column, b: Column) -> Column:
    """Squared euclidean distance of two array columns — the same
    JVM-side left fold as :func:`dot`, so the DuckDB left-assoc chain
    ``0.0 + (a1-b1)*(a1-b1) + ...`` reproduces it bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = PQ_M,
    k: int = 8,
    iters: int = 3,
    dim: int = DIM,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: the vector splits into `m`
    contiguous subspaces and each subspace gets its own k-codeword
    k-means model (:func:`kmeans_fit` on the sliced frame) — the
    IVF-PQ compression stage (Jégou et al., TPAMI 2011): memory per
    vector drops from dim×4 bytes to m log2(k) bits, which is what
    makes billion-vector ANN indexes fit a cluster's RAM at 100 TB.

    Driver holds only the m×k×(dim/m) codebook floats (model state,
    same contract as kmeans_fit); the corpus never re-shuffles — each
    subspace fit scans the same frame with a different slice.  Returns
    one codeword list per subspace (index = code id)."""
    sub = dim // m
    books = []
    for s in range(m):
        sliced = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col).cast("array<double>"), s * sub + 1, sub).alias(
                "subv"
            ),
        )
        cents, _ = kmeans_fit(sliced, id_col, "subv", k=k, iters=iters)
        books.append(cents)
    return books


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    books: list[list[list[float]]],
    dim: int = DIM,
) -> DataFrame:
    """Assign every vector its per-subspace nearest codeword →
    (id, code0..code{m-1}, err_micro).  Codebooks are driver-held model
    state compiled into the plan as LITERAL arrays (the kmeans_fit
    assignment pattern): per row, each subspace evaluates k
    struct(dist, cid) terms and ``array_min`` takes the (dist, cid)
    argmin — a fully NARROW map over the corpus with ZERO joins, ZERO
    windows, and ZERO shuffles (asserted in tests/test_scale.py).  At
    100 TB encode-once is the whole cost of standing up a PQ index, so
    the encode plan must be a pure scan→project.  (The previous form —
    broadcast-join against an (s, cid, cv) frame + a row_number window
    over (vid, s) — exchanged an m·k·|corpus| intermediate; the argmin
    is the same, the plan was not.)

    ``err_micro`` is the total squared reconstruction error
    floor-quantized to integer micro-units (the cross-engine-stable
    quantization contract shared with weighted_sssp)."""
    m = len(books)
    sub = dim // m
    base = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    bests = []
    for s, book in enumerate(books):
        # the codebook rides the plan as ONE array<array<double>>
        # Literal (r16, guide §7.3 plan size): per-codeword literal
        # expressions put k·sub nodes per subspace into codegen source,
        # which at k=64 × m=8 generated multi-MiB methods Janino chewed
        # on for minutes per stage; a transform over the constant matrix
        # evaluates the identical sqdist fold per codeword (same
        # struct(dist, cid) argmin, index == cid in book order)
        sv = F.slice(F.col("v"), s * sub + 1, sub)
        pairs = F.transform(
            lit_double_matrix(book),
            lambda c, i: F.struct(
                sqdist(sv, c).alias("dist"), i.alias("cid")
            ),
        )
        bests.append(F.array_min(pairs).alias(f"best{s}"))
    enc = base.select("vid", *bests)
    err = F.col("best0").getField("dist")
    for s in range(1, m):
        err = err + F.col(f"best{s}").getField("dist")
    return enc.select(
        "vid",
        *[F.col(f"best{s}").getField("cid").alias(f"code{s}") for s in range(m)],
        F.floor(err * 1000000).cast("long").alias("err_micro"),
    )


def _duck_pq_oracle(m: int, mod: int, dim: int) -> str:
    """Unrolled PQ-encode oracle: per subspace, the identical left-assoc
    squared-distance chain against every modular codeword, argmin by
    (dist, cid), then the m-way pivot with explicit left-assoc error
    addition — every float op replayed in Spark's evaluation order."""
    sub = dim // m
    arms = []
    for s in range(m):
        off = s * sub
        chain = "0.0 + " + " + ".join(
            f"(b.v[{off + i}]-c.cv[{off + i}])*(b.v[{off + i}]-c.cv[{off + i}])"
            for i in range(1, sub + 1)
        )
        arms.append(
            f"SELECT b.vid, {s} AS s, c.cid, ({chain}) AS dist FROM base b CROSS JOIN cw c"
        )
    codes = ",\n           ".join(
        f"max(CASE WHEN s = {s} THEN cid END) AS code{s}" for s in range(m)
    )
    err = f"max(CASE WHEN s = 0 THEN dist END)"
    for s in range(1, m):
        err = f"({err} + max(CASE WHEN s = {s} THEN dist END))"
    return f"""
    WITH base AS (
      SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings
    ), cw AS (
      SELECT vid AS cid, v AS cv FROM base
      WHERE vid % {mod} = 1 AND vid < {PQ_CB_CAP}
    ), d AS (
      {" UNION ALL ".join(arms)}
    ), a AS (
      SELECT vid, s, cid, dist,
             row_number() OVER (PARTITION BY vid, s ORDER BY dist, cid) AS rn
      FROM d
    )
    SELECT vid, {codes},
           CAST(floor({err} * 1000000) AS BIGINT) AS err_micro
    FROM a WHERE rn = 1 GROUP BY vid
    """


@query("sim_pq_encode", oracle=_duck_pq_oracle(PQ_M, PQ_MOD, DIM))
def sim_pq_encode_q(spark, sf_dir):
    """Product-quantization encoding of the whole corpus: 4 subspaces
    of 16 dims, deterministic modular codebooks (subvectors of vids
    ≡ 1 mod 11 AND vid < PQ_CB_CAP — the IVF precedent, so the oracle
    replays the index exactly; production trains per-subspace k-means
    via pq_fit), each vector reduced to 4 codeword ids + its
    floor-quantized total reconstruction error.  The cap keeps the
    replayable model CONSTANT-SIZE at any SF (uncapped, encode work
    grew quadratically — 15.9× at 10× data, BASELINE.md §6; capped,
    2.0× — and the per-row argmin is now 47 codewords, light enough
    that the corpus side keeps its zero-exchange plan contract
    pinned in test_scale.py with no repartition fan-out)."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    sub = DIM // PQ_M
    # the modular codeword set collapses to ONE row holding a sorted
    # struct array, broadcast onto the corpus — per-row HOF argmin per
    # subspace, so the corpus side never exchanges (same zero-shuffle
    # contract as the trained-books pq_encode; the only aggregation in
    # the plan is the tiny codeword-side collect_list)
    cws = F.broadcast(
        base.filter((F.col("vid") % PQ_MOD == 1) & (F.col("vid") < PQ_CB_CAP))
        .select(F.struct(F.col("vid").alias("cid"), F.col("v").alias("cv")).alias("c"))
        .groupBy()
        .agg(F.array_sort(F.collect_list("c")).alias("cws"))
    )
    # NB: the transform lambda must take exactly ONE argument — pyspark
    # interprets a second parameter as the (element, index) form, so the
    # subspace offset is captured via this factory, not a default arg
    def _subspace_best(s: int):
        def _term(c):
            return F.struct(
                sqdist(
                    F.slice(F.col("v"), s * sub + 1, sub),
                    F.slice(c["cv"], s * sub + 1, sub),
                ).alias("dist"),
                c["cid"].alias("cid"),
            )

        return F.array_min(F.transform(F.col("cws"), _term)).alias(f"best{s}")

    bests = [_subspace_best(s) for s in range(PQ_M)]
    enc = base.join(cws).select("vid", *bests)
    err = F.col("best0").getField("dist")
    for s in range(1, PQ_M):
        err = err + F.col(f"best{s}").getField("dist")
    return enc.select(
        "vid",
        *[
            F.col(f"best{s}").getField("cid").alias(f"code{s}")
            for s in range(PQ_M)
        ],
        F.floor(err * 1000000).cast("long").alias("err_micro"),
    )


def _duck_pq_adc_ctes(m: int, mod: int, dim: int, probe_mod: int) -> str:
    """ADC CTE chain (requires a `base(vid, v)` CTE): encode the corpus,
    build each probe's subspace×codeword distance table, melt the codes,
    join, and recombine the m partial distances by PIVOTED max-case
    arms with explicit left-assoc addition — never sum() over an
    unordered group, whose float order differs across engines.  CTE
    names are pq_-prefixed so the chain composes with the exact-truth
    CTEs in the recall oracle.  Vectors are unit-normalized first
    (identical per-element division off the same sqrt-fold norm on
    both engines): euclidean ordering on the unit sphere IS cosine
    ordering, which is the target metric."""
    sub = dim // m
    enc_arms, probe_arms = [], []
    for s in range(m):
        off = s * sub
        chain = "0.0 + " + " + ".join(
            f"(b.v[{off + i}]-c.cv[{off + i}])*(b.v[{off + i}]-c.cv[{off + i}])"
            for i in range(1, sub + 1)
        )
        enc_arms.append(
            f"SELECT b.vid, {s} AS s, c.cid, ({chain}) AS dist FROM pq_nbase b CROSS JOIN cw c"
        )
        pchain = "0.0 + " + " + ".join(
            f"(p.v[{off + i}]-c.cv[{off + i}])*(p.v[{off + i}]-c.cv[{off + i}])"
            for i in range(1, sub + 1)
        )
        probe_arms.append(
            f"SELECT p.vid AS pid, {s} AS s, c.cid, ({pchain}) AS pd "
            f"FROM pq_probes p CROSS JOIN cw c"
        )
    melt = " UNION ALL ".join(
        f"SELECT vid, {s} AS s, code{s} AS code FROM enc" for s in range(m)
    )
    adc2 = "max(CASE WHEN pt.s = 0 THEN pd END)"
    for s in range(1, m):
        adc2 = f"({adc2} + max(CASE WHEN pt.s = {s} THEN pd END))"
    ndot = duck_dot("v", "v", dim)
    return f"""
    , pq_nbase AS (
      SELECT vid, list_transform(v, x -> x / sqrt({ndot})) AS v FROM base
    ), pq_probes AS (
      SELECT vid, v FROM pq_nbase WHERE vid % {probe_mod} = 0
    ), cw AS (
      SELECT vid AS cid, v AS cv FROM pq_nbase
      WHERE vid % {mod} = 1 AND vid < {PQ_CB_CAP}
    ), pq_d AS (
      {" UNION ALL ".join(enc_arms)}
    ), pq_a AS (
      SELECT vid, s, cid,
             row_number() OVER (PARTITION BY vid, s ORDER BY dist, cid) AS rn
      FROM pq_d
    ), enc AS (
      SELECT vid, {", ".join(f"max(CASE WHEN s = {s} THEN cid END) AS code{s}" for s in range(m))}
      FROM pq_a WHERE rn = 1 GROUP BY vid
    ), melt AS (
      {melt}
    ), pq_pt AS (
      {" UNION ALL ".join(probe_arms)}
    ), pq_scored AS (
      SELECT pt.pid AS id1, melt.vid AS id2, {adc2} AS adc
      FROM melt JOIN pq_pt pt ON pt.s = melt.s AND pt.cid = melt.code
      WHERE pt.pid <> melt.vid
      GROUP BY pt.pid, melt.vid
    ), pq_ranked AS (
      SELECT id1, id2, adc,
             row_number() OVER (PARTITION BY id1 ORDER BY adc, id2) AS rank
      FROM pq_scored
    )"""


def _duck_pq_adc_oracle(m: int, mod: int, dim: int, probe_mod: int, k: int) -> str:
    return f"""
    WITH base AS (
      SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings
    ){_duck_pq_adc_ctes(m, mod, dim, probe_mod)}
    SELECT id1, id2, CAST(floor(adc * 1000000) AS BIGINT) AS adc_micro, rank
    FROM pq_ranked WHERE rank <= {k}
    """


def pq_adc_ranked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    probe_mod: int,
    m: int = PQ_M,
    mod: int = PQ_MOD,
    dim: int = DIM,
) -> DataFrame:
    """All probe→candidate ADC pairs with per-probe rank — the shared
    kernel behind `sim_pq_adc_topk` and `sim_pq_recall`.  See the query
    docstrings for the plan shape and the broadcast-scope caveat."""
    raw = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # unit-normalize: euclidean on the sphere = cosine ordering (the
    # target metric); same sqrt-fold norm + per-element division on
    # both engines keeps every double bit-identical.  The norm rides a
    # projected column so it folds ONCE per row — the old in-lambda
    # l2_norm re-ran the interpreted dim-term fold per ELEMENT
    # (O(dim²) interpreted work per row; r16, guide §4.1)
    # pinned once: consumed by the codeword collect, the encode scan,
    # the probe expansion and the candidate surface (r16; see
    # ivfpq_topk)
    base = (
        raw.withColumn("_vn", l2_norm_w("v", dim))
        .select(
            "vid",
            F.transform(F.col("v"), lambda x: x / F.col("_vn")).alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    sub = dim // m
    # the modular codeword set collapses to ONE sorted struct-array row,
    # broadcast onto the corpus; the per-subspace argmin is a per-row
    # HOF over that array (same zero-corpus-exchange encode plan as
    # pq_encode — the old broadcast-join + row_number window exchanged
    # an m·|cw|·|corpus| intermediate), then posexplode melts the m
    # codes for the ADC code-lookup join
    cwsf = F.broadcast(
        base.filter((F.col("vid") % mod == 1) & (F.col("vid") < PQ_CB_CAP))
        .select(
            F.struct(F.col("vid").alias("cid"), F.col("v").alias("cv")).alias("c")
        )
        .groupBy()
        .agg(F.array_sort(F.collect_list("c")).alias("cws"))
    )

    def _subspace_code(s: int):
        # argmin returns the POSITION in the sorted codeword array (the
        # array is cid-sorted, so idx order == cid order and the
        # dist-then-idx tie-break matches the old dist-then-cid one);
        # positions feed the element_at ADC lookups below
        def _term(c, i):
            return F.struct(
                sqdist(
                    F.slice(F.col("v"), s * sub + 1, sub),
                    F.slice(c["cv"], s * sub + 1, sub),
                ).alias("dist"),
                i.alias("idx"),
            )

        return F.array_min(F.transform(F.col("cws"), _term)).getField("idx")

    # encoded corpus: ONE row per vector with its m-code ARRAY, and each
    # probe row carries its own m×|cw| ADC distance table as an
    # array-of-arrays — the same narrow plan as pq_adc_trained_topk /
    # ivfpq_topk: per-candidate scoring is m element_at lookups + a
    # left-assoc m-term add, so the pair surface is never exchanged
    # (the old melted-code equi-join + pivot groupBy shuffled
    # |probes|·|corpus|·m rows)
    enc = base.join(cwsf).select(
        "vid",
        F.array(*[_subspace_code(s) for s in range(m)]).alias("codes"),
    )

    def _subspace_dists(s: int):
        return F.transform(
            F.col("cws"),
            lambda c: sqdist(
                F.slice(F.col("v"), s * sub + 1, sub),
                F.slice(c["cv"], s * sub + 1, sub),
            ),
        )

    probes = (
        base.filter(F.col("vid") % probe_mod == 0)
        .join(cwsf)
        .select(
            F.col("vid").alias("pid"),
            F.array(*[_subspace_dists(s) for s in range(m)]).alias("pt"),
        )
    )
    adc = F.element_at(F.col("pt").getItem(0), F.col("codes").getItem(0) + 1)
    for s in range(1, m):
        adc = adc + F.element_at(
            F.col("pt").getItem(s), F.col("codes").getItem(s) + 1
        )
    scored = (
        # no broadcast hint on probes: each row is m·|cw| doubles and
        # the probe COUNT is corpus-growing (1-in-probe_mod) — AQE
        # picks the strategy at demo scale; production is the
        # constant-k trained path (PLANS.md broadcast-audit rule)
        enc.join(probes)
        .filter(F.col("pid") != F.col("vid"))
        .select(
            F.col("pid").alias("id1"), F.col("vid").alias("id2"), adc.alias("adc")
        )
    )
    rw = Window.partitionBy("id1").orderBy(F.asc("adc"), F.asc("id2"))
    return scored.withColumn("rank", F.row_number().over(rw))


@query("sim_pq_adc_topk", oracle=_duck_pq_adc_oracle(PQ_M, PQ_MOD, DIM, 50, 10))
def sim_pq_adc_topk_q(spark, sf_dir):
    """PQ asymmetric-distance top-10 for 1-in-50 probes — the
    compressed-index read path (Jégou et al.): the corpus is touched
    only through its 4 codeword ids, and each probe precomputes one
    subspace×codeword distance table (m·k entries, broadcast) that
    every candidate's approximate distance is assembled from by code
    lookup.

    Scale shape at 100 TB: the encoded corpus is m BIGINTs per vector
    (a standing dataset — pq_encode writes it once), probes never see
    raw corpus floats, and the per-candidate work is m element_at
    lookups into the probe's own m×k distance table + an explicit
    left-assoc m-term add (never an unordered float sum()) — the pair
    surface is projected narrow inside codegen, not shuffled.  Codebooks
    here are the deterministic modular ones (oracle replays the index);
    production swaps in pq_fit's k-means books unchanged.

    Broadcast-audit note (PLANS.md rule — hints only on
    constant-bounded sides): the modular codeword table grows with the
    corpus (N/11 rows), so its hint is justified only for this
    oracle-replayable variant at test/bench scale; the probe side
    carries no hint (AQE decides).  The production path is pq_fit's
    CONSTANT-k codebooks (k·d model floats) with probes arriving in
    bounded batches, where the broadcast is size-safe by
    construction."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        pq_adc_ranked(emb, "vec_id", "embedding", probe_mod=50)
        .filter(F.col("rank") <= 10)
        .select(
            "id1",
            "id2",
            F.floor(F.col("adc") * 1000000).cast("long").alias("adc_micro"),
            "rank",
        )
    )


@query(
    "sim_pq_recall",
    oracle=_duck_base(50)
    + f"""
    , t_scored AS (
      SELECT pid AS id1, vid AS id2, {duck_cosine("pv", "v", DIM)} AS cos_raw
      FROM base JOIN probes ON pid <> vid
    ), t_ranked AS (
      SELECT id1, id2,
             row_number() OVER (PARTITION BY id1 ORDER BY cos_raw DESC, id2) AS rank
      FROM t_scored
    ), truth AS (
      SELECT id1, id2 FROM t_ranked WHERE rank <= 10
    )"""
    + _duck_pq_adc_ctes(PQ_M, PQ_MOD, DIM, 50)
    + f"""
    , approx AS (
      SELECT id1, id2 FROM pq_ranked WHERE rank <= 10
    ), shortlist AS (
      SELECT id1, id2 FROM pq_ranked WHERE rank <= 50
    ), re_scored AS (
      SELECT sl.id1, sl.id2,
             {duck_cosine("p.v", "b.v", DIM)} AS cos_raw
      FROM shortlist sl
      JOIN base p ON p.vid = sl.id1
      JOIN base b ON b.vid = sl.id2
    ), re_ranked AS (
      SELECT id1, id2,
             row_number() OVER (PARTITION BY id1 ORDER BY cos_raw DESC, id2) AS rank
      FROM re_scored
    ), rerank AS (
      SELECT id1, id2 FROM re_ranked WHERE rank <= 10
    ), r_adc AS (
      SELECT t.id1, count(a.id2) AS hits
      FROM truth t LEFT JOIN approx a ON t.id1 = a.id1 AND t.id2 = a.id2
      GROUP BY t.id1
    ), r_rr AS (
      SELECT t.id1, count(r.id2) AS hits
      FROM truth t LEFT JOIN rerank r ON t.id1 = r.id1 AND t.id2 = r.id2
      GROUP BY t.id1
    )
    SELECT a.id1 AS probe_id, round(a.hits / 10.0, 6) AS recall_adc,
           round(b.hits / 10.0, 6) AS recall_rerank
    FROM r_adc a JOIN r_rr b ON b.id1 = a.id1
    """,
)
def sim_pq_recall_q(spark, sf_dir):
    """Recall@10 of PQ-ADC against exact brute-force ground truth, per
    probe, in BOTH production flavors: raw ADC@10 (codes only — what
    16-bytes-per-vector compression alone buys) and the full IVF-PQ
    read pattern, ADC shortlist@50 → exact cosine re-rank → top-10
    (the shortlist touches raw floats for 50 candidates instead of the
    whole corpus).  Measured at sf0.01: raw ADC 0.19, re-ranked 0.41 —
    the tuning readout (m, k, shortlist width) every PQ deployment
    runs, next to sim_ivf_recall / sim_recall_curve_lsh; both sides
    replayed in SQL end-to-end.  Per-probe recalls are exact rationals
    (count/10), so no cross-engine float summation is involved."""
    emb = load_table(spark, sf_dir, "embeddings")
    truth = cosine_topk_brute(emb, "vec_id", "embedding", probe_mod=50, k=10)
    ranked = pq_adc_ranked(emb, "vec_id", "embedding", probe_mod=50)
    adc10 = ranked.filter(F.col("rank") <= 10)
    shortlist = ranked.filter(F.col("rank") <= 50).select("id1", "id2")
    raw = emb.select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn("vn", l2_norm(F.col("v")))
    p = raw.select(F.col("vid").alias("pvid"), F.col("v").alias("pv"), F.col("vn").alias("pn"))
    b = raw.select(
        F.col("vid").alias("bvid"), F.col("v").alias("bv"), F.col("vn").alias("bn")
    )
    re_scored = (
        shortlist.join(p, shortlist["id1"] == p["pvid"])
        .join(b, shortlist["id2"] == b["bvid"])
        .select(
            "id1",
            "id2",
            (dot(F.col("pv"), F.col("bv")) / (F.col("pn") * F.col("bn"))).alias(
                "cos_raw"
            ),
        )
    )
    rw = Window.partitionBy("id1").orderBy(F.desc("cos_raw"), F.asc("id2"))
    rerank = (
        re_scored.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= 10)
    )
    r_adc = ann_recall(truth, adc10, 10).select(
        "probe_id", F.col("recall").alias("recall_adc")
    )
    r_rr = ann_recall(truth, rerank, 10).select(
        "probe_id", F.col("recall").alias("recall_rerank")
    )
    return r_adc.join(r_rr, "probe_id")


def matryoshka_recall(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    probe_mod: int = 50,
    dims: tuple[int, ...] = (8, 16, 32),
    full_dim: int = 64,
    k: int = 10,
    probe_cap: int = 512,
) -> DataFrame:
    """Prefix-dimension truncation quality — the Matryoshka-embedding
    readout (Kusupati et al., "Matryoshka Representation Learning",
    NeurIPS 2022): recall@k of top-k-by-prefix-cosine against the
    full-dimension ground truth, one row per truncation width.  This
    is the table a storage/latency decision reads before truncating a
    100 TB embedding column to its first m dims (a 64→16 cut is 4×
    less I/O and ADC work everywhere downstream).

    Same exact-harness shape as `cosine_ranked_raw`, with the
    PQ_CB_CAP probe discipline on top: probes are ``id % probe_mod ==
    0 AND id < probe_cap`` — a CONSTANT probe set at any SF (an
    uncapped 1-in-probe_mod probe slice grows with the corpus, making
    pair volume quadratic: the first sf1 reading measured 19.6× at
    10× data; capped, pair volume is linear in N and the readout is
    the same truncation curve from a fixed probe panel).  512 covers
    every vec_id at the sf0.01 correctness gate, so oracle hashes are
    unchanged.  The corpus side fans out with a row-preserving
    repartition ahead of the interpreted scoring stage, and prefix
    NORMS are precomputed per vector per width before the pair join —
    per pair only the len(dims)+1 prefix dots remain.  Per-width rankings melt out of
    ONE pair pass (explode of a literal struct array — the pair
    surface is scanned once, not once per width), and recall is
    integer arithmetic end to end (hits·1e6 DIV probes·k), so no
    cross-engine float summation exists outside the bit-replayable
    left-assoc cosine chains."""
    ncores = df.sparkSession.sparkContext.defaultParallelism
    widths = tuple(dims) + (full_dim,)
    raw0 = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )

    def with_norms(frame: DataFrame, pfx: str) -> DataFrame:
        # codegen'd prefix norms via the CHAINED squared-sum columns
        # (optimization r16, guide §7.3: the r15 per-width unrolled
        # norms re-unrolled every width from element 1 — Σwidths terms
        # per side; the chain shares each prefix, max(widths) terms).
        # SQRT over the chained CASE column is value-identical to
        # l2_norm_prefix_w's CASE-of-SQRTs: same branch, same fold.
        frame, sq_cols = chained_prefix_dots(frame, "v", "v", widths, pfx + "sq")
        for m in widths:
            frame = frame.withColumn(
                f"{pfx}n{m}", F.expr(f"SQRT(`{sq_cols[m]}`)")
            )
        return frame.drop(*sq_cols.values())

    base = with_norms(raw0.repartition(ncores), "")
    # Collect the capped probe panel ONCE and rebuild it as a local
    # broadcast relation (the heavy_hitters/maxsim_topk pattern, r9
    # advice): len(rows) serves as both the MAX_PROBES guard and the
    # n_probes literal, and the pair join below never re-derives the
    # probe slice from the corpus scan.  Bounded by construction:
    # vid < probe_cap caps the collect at probe_cap rows.
    probe_rows = raw0.filter(
        (F.col("vid") % probe_mod == 0) & (F.col("vid") < probe_cap)
    ).collect()
    n_probes = len(probe_rows)
    if n_probes > MAX_PROBES:
        raise ValueError(
            f"matryoshka_recall: probe set exceeds MAX_PROBES={MAX_PROBES} "
            "(exact-oracle harness contract) — raise probe_mod"
        )
    spark = df.sparkSession
    probes = with_norms(
        spark.createDataFrame(probe_rows, raw0.schema), "p"
    ).select(
        F.col("vid").alias("pid"),
        F.col("v").alias("pv"),
        *[F.col(f"pn{m}") for m in widths],
    )
    pairs = base.join(F.broadcast(probes), F.col("pid") != F.col("vid"))
    # chained per-pair prefix dots (r16): the r15 arms re-unrolled every
    # width from element 1 inside the explode — Σwidths = 120 terms per
    # pair; the chain computes 64 and shares each prefix across arms
    pairs, d_cols = chained_prefix_dots(pairs, "pv", "v", widths, "p")
    arms = [
        F.struct(
            F.lit(m).cast("bigint").alias("m"),
            (
                F.col(d_cols[m]) / (F.col(f"pn{m}") * F.col(f"n{m}"))
            ).alias("cs"),
        )
        for m in widths
    ]
    melted = pairs.select(
        F.col("pid").alias("id1"),
        F.col("vid").alias("id2"),
        F.explode(F.array(*arms)).alias("e"),
    ).select("id1", "id2", F.col("e.m").alias("m"), F.col("e.cs").alias("cs"))
    w = Window.partitionBy("m", "id1").orderBy(F.desc("cs"), F.asc("id2"))
    # pin the per-width top-k table ONCE (optimization r16, the b19/b23
    # §5 recipe): the truth/hits legs below self-join `top`, so without
    # the pin the ENTIRE pair-scoring + window subplan is embedded (and
    # executed) twice — plans/r15/b39_matryoshka_after.txt shows the two
    # mirrored BroadcastNestedLoopJoin legs.  Bounded by construction:
    # ≤ len(widths)·n_probes·k rows, n_probes ≤ MAX_PROBES.
    top = (
        melted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("m", "id1", "id2")
        .localCheckpoint(eager=True)
    )
    truth = top.filter(F.col("m") == full_dim).select(
        F.col("id1").alias("t1"), F.col("id2").alias("t2")
    )
    hits = (
        top.filter(F.col("m") != full_dim)
        .join(
            truth,
            (F.col("id1") == F.col("t1")) & (F.col("id2") == F.col("t2")),
        )
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("hits"))
    )
    mframe = spark.createDataFrame(
        [(int(m),) for m in dims], "m bigint"
    ).join(hits, "m", "left")
    return mframe.select(
        "m",
        F.lit(int(n_probes)).cast("bigint").alias("n_probes"),
        F.coalesce(F.col("hits"), F.lit(0)).cast("bigint").alias("hits"),
        F.expr(
            f"coalesce(hits, CAST(0 AS BIGINT)) * CAST(1000000 AS BIGINT) "
            f"DIV (CAST({int(n_probes)} AS BIGINT) * CAST({k} AS BIGINT))"
        ).alias("recall_x1m"),
    )


def _matryoshka_oracle(
    probe_mod: int,
    dims: tuple[int, ...],
    full_dim: int,
    k: int,
    probe_cap: int = 512,
) -> str:
    widths = tuple(dims) + (full_dim,)
    cs_cols = ",\n             ".join(
        f"{duck_dot('pv', 'v', m)} / (sqrt({duck_dot('pv', 'pv', m)}) * "
        f"sqrt({duck_dot('v', 'v', m)})) AS cs{m}"
        for m in widths
    )
    melt = " UNION ALL ".join(
        f"SELECT id1, id2, {m}::BIGINT AS m, cs{m} AS cs FROM scored"
        for m in widths
    )
    dim_list = ", ".join(str(m) for m in dims)
    return f"""
    WITH base AS (
      SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings
    ), probes AS (
      SELECT vid AS pid, v AS pv FROM base
      WHERE vid % {probe_mod} = 0 AND vid < {probe_cap}
    ), pairs AS (
      SELECT pid, pv, vid, v FROM base JOIN probes ON pid <> vid
    ), scored AS (
      SELECT pid AS id1, vid AS id2,
             {cs_cols}
      FROM pairs
    ), melted AS ({melt}),
    top AS (
      SELECT m, id1, id2 FROM (
        SELECT m, id1, id2,
               row_number() OVER (PARTITION BY m, id1
                                  ORDER BY cs DESC, id2) AS rnk
        FROM melted
      ) WHERE rnk <= {k}
    ),
    truth AS (SELECT id1, id2 FROM top WHERE m = {full_dim}),
    np AS (SELECT count(*)::BIGINT AS n_probes FROM probes),
    hits AS (
      SELECT t.m, count(*)::BIGINT AS hits
      FROM top t JOIN truth u ON t.id1 = u.id1 AND t.id2 = u.id2
      WHERE t.m <> {full_dim}
      GROUP BY t.m
    )
    SELECT d.m::BIGINT AS m,
           (SELECT n_probes FROM np) AS n_probes,
           coalesce(h.hits, 0)::BIGINT AS hits,
           ((coalesce(h.hits, 0) * 1000000)
            // ((SELECT n_probes FROM np) * {k}))::BIGINT AS recall_x1m
    FROM (SELECT unnest([{dim_list}]) AS m) d
    LEFT JOIN hits h ON h.m = d.m
    """


@query("sim_matryoshka_recall", oracle=_matryoshka_oracle(50, (8, 16, 32), 64, 10))
def sim_matryoshka_recall_q(spark, sf_dir):
    """Matryoshka truncation readout: recall@10 of prefix-cosine top-10
    (8/16/32 of 64 dims) vs the full-dimension exact ground truth over
    the standard 1-in-50 probe set."""
    emb = load_table(spark, sf_dir, "embeddings")
    return matryoshka_recall(emb, "vec_id", "embedding")


def pq_adc_trained_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    books: list[list[list[float]]],
    probe_mod: int,
    k: int = 10,
    shortlist: int = 50,
    dim: int = DIM,
) -> DataFrame:
    """PQ-ADC top-k with TRAINED codebooks + shortlist re-rank — the
    tuned production read path the round-5 recall sweep selected
    (PLANS.md "PQ recall engineering"): codebooks are constant
    m·k model floats (a size-safe broadcast by construction, unlike
    the corpus-growing modular codeword table of the oracle-replayable
    twin `pq_adc_ranked`), ADC assembles approximate distances from m
    code lookups, the best `shortlist` candidates per probe get exact
    cosine re-ranks against raw floats, and the final top-k is emitted
    with exact scores.

    Vectors are unit-normalized first (euclidean on the sphere = cosine
    ordering).  At 100 TB: encode is a fully NARROW per-row
    literal-codebook argmin (zero joins, zero shuffles — the
    pq_encode plan) written ONCE as a standing m-codes table; a probe
    batch computes one m·k distance table; per-candidate cost is m
    lookups + an m-term add; only `shortlist` raw vectors per probe
    are ever touched."""
    m = len(books)
    sub = dim // m
    raw = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    # norm as a projected column (one fold per row, not per element)
    # and the normalized corpus pinned once — every downstream consumer
    # (encode, probes, re-rank join-backs) otherwise re-evaluates
    # cast+normalize inline (r16; see ivfpq_topk)
    base = (
        raw.withColumn("_vn", l2_norm_w("v", dim))
        .select(
            "vid", F.transform(F.col("v"), lambda x: x / F.col("_vn")).alias("v")
        )
        .localCheckpoint(eager=True)
    )

    def _subspace_best(s: int, book) -> Column:
        # codebook as ONE matrix Literal, not k·sub expression nodes
        # (r16 plan-size fix — see pq_encode)
        sv = F.slice(F.col("v"), s * sub + 1, sub)
        return F.array_min(
            F.transform(
                lit_double_matrix(book),
                lambda c, i: F.struct(
                    sqdist(sv, c).alias("dist"), i.alias("cid")
                ),
            )
        ).getField("cid")

    # encoded corpus: ONE row per vector with its m-code ARRAY (the
    # zero-exchange encode plan); probes carry their own m×k ADC
    # distance table as an array-of-arrays — both sides narrow, so the
    # ADC scan is one cross join (probe batch bounded by contract; no
    # broadcast hint — AQE picks the strategy, PLANS.md audit rule)
    # and per-candidate scoring is m element_at lookups + a left-assoc
    # m-term add in subspace order: the ivfpq_topk pattern, replacing
    # the previous melted-code equi-join + pivot groupBy (one fewer
    # shuffle of the pair surface).
    enc = base.select(
        "vid",
        F.array(*[_subspace_best(s, book) for s, book in enumerate(books)]).alias(
            "codes"
        ),
    )
    # NB: transform lambdas must take exactly ONE argument (a second —
    # even defaulted — parameter selects pyspark's (element, index)
    # form), so the subspace offset is captured via this factory
    def _pt_dists(s: int, book) -> Column:
        return F.transform(
            lit_double_matrix(book),
            lambda c: sqdist(F.slice(F.col("v"), s * sub + 1, sub), c),
        )

    pt_arr = F.array(*[_pt_dists(s, book) for s, book in enumerate(books)])
    probes = base.filter(F.col("vid") % probe_mod == 0).select(
        F.col("vid").alias("pid"), pt_arr.alias("pt")
    )
    adc = F.element_at(F.col("pt").getItem(0), F.col("codes").getItem(0) + 1)
    for s in range(1, m):
        adc = adc + F.element_at(
            F.col("pt").getItem(s), F.col("codes").getItem(s) + 1
        )
    scored = (
        enc.join(probes)
        .filter(F.col("pid") != F.col("vid"))
        .select(
            F.col("pid").alias("id1"), F.col("vid").alias("id2"), adc.alias("adc")
        )
    )
    slw = Window.partitionBy("id1").orderBy(F.asc("adc"), F.asc("id2"))
    sl = (
        scored.withColumn("slrank", F.row_number().over(slw))
        .filter(F.col("slrank") <= shortlist)
        .select("id1", "id2")
    )
    nraw = raw.withColumn("vn", l2_norm(F.col("v")))
    p = nraw.select(
        F.col("vid").alias("pvid"), F.col("v").alias("pv"), F.col("vn").alias("pn")
    )
    b = nraw.select(
        F.col("vid").alias("bvid"), F.col("v").alias("bv"), F.col("vn").alias("bn")
    )
    re_scored = (
        sl.join(p, sl["id1"] == p["pvid"])
        .join(b, sl["id2"] == b["bvid"])
        .select(
            "id1",
            "id2",
            (dot(F.col("pv"), F.col("bv")) / (F.col("pn") * F.col("bn"))).alias(
                "cos_raw"
            ),
        )
    )
    rw = Window.partitionBy("id1").orderBy(F.desc("cos_raw"), F.asc("id2"))
    return (
        re_scored.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
        .select("id1", "id2", F.round("cos_raw", 6).alias("cosine"), "rank")
    )


def ivfpq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    probe_mod: int,
    k: int = 10,
    nprobe: int = 4,
    m: int = 8,
    codebook_k: int = 64,
    shortlist: int = 100,
    centroids: list[list[float]] | None = None,
    books: list[list[list[float]]] | None = None,
    kmeans_k: int | None = None,
    iters: int = 2,
    dim: int = DIM,
    train_sample: int = 100_000,
    n_rows: int | None = None,
) -> DataFrame:
    """IVF-PQ top-k — the composed Faiss-style read path (Jégou et al.,
    TPAMI 2011) and the canonical 100 TB ANN plan: coarse k-means cells
    restrict WHICH candidates are touched (IVF), product-quantization
    codes decide their order without reading raw floats (ADC), and only
    the per-probe ``shortlist`` survivors get exact cosine re-ranks.

    Plan shape, stage by stage:
    - **index build** (encode-once at scale): one narrow scan emits per
      vector its cell id (literal-centroid argmin, `_nearest_cells`)
      and its m-code ARRAY (literal-codebook argmin — the zero-exchange
      pq_encode plan).  No joins, no windows, no shuffles.
    - **probe expansion**: each probe row computes, narrowly, its
      ``nprobe`` nearest cells and its own m×k ADC distance table as an
      array-of-arrays column — model state is plan literals, so nothing
      joins and nothing grows with the corpus.
    - **candidate generation**: ONE equi-join on the cell id (the IVF
      bound: candidate volume is cell-sized, never all-pairs).
    - **ADC scoring**: per candidate row, ``adc = Σ_s pt[s][code_s]`` —
      m `element_at` lookups + a left-assoc m-term add, fully narrow
      (no melt, no pivot groupBy — this improves on pq_adc_trained's
      melted-code join).  The only exchanges after the cell join are
      the two per-probe top-N windows (shortlist, then final k).
    - **re-rank**: exact cosine on unit-normalized vectors for the
      shortlist only.

    Trained model state (centroids + codebooks) is constant-size driver
    floats; ``kmeans_k=None`` auto-sizes cells toward √N (knn_graph_ann
    rule), and both fits train on a BOUNDED deterministic sample
    (``train_sample`` rows via modular id selection — Faiss practice:
    a 100 TB corpus never streams through Lloyd's loop; the models see
    a representative slice and the full corpus only flows through the
    narrow encode/assign scan).  Rows-only registration
    (`sim_ivfpq_recall_rowsonly`): trained float models aren't
    SQL-replayable; the modular-deterministic twins (sim_ivf_recall /
    sim_pq_recall) carry the hash contract, and the recall floor is
    pinned in tests/test_dedup.py."""
    raw = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    # norm as a projected column: one fold per row, not per element
    # (r16, guide §4.1 — see pq_adc_ranked), and the normalized corpus
    # is PINNED once: it feeds the two fits, the encode scan, the probe
    # expansion and both re-rank sides, and without the pin every
    # consumer re-evaluated cast+normalize inline — the shortlist
    # re-rank stage was observed evaluating the inlined norm chain
    # INTERPRETED with a per-term array cast (thread dump: minutes of
    # single-task Cast.castArray under BinaryArithmetic.eval).  Values
    # identical; the b13/b19 pin discipline (guide §5/§3.3).
    base = (
        raw.withColumn("_vn", l2_norm_w("v", dim))
        .select(
            "vid", F.transform(F.col("v"), lambda x: x / F.col("_vn")).alias("nv")
        )
        .localCheckpoint(eager=True)
    )
    if centroids is None or books is None:
        # auto-sizing needs a row count; accept a caller hint (catalog
        # statistics / known table size) so a bare call on a 100 TB
        # table doesn't pay a full count scan before every index build
        n = n_rows if n_rows is not None else df.count()
        if kmeans_k is None:
            kmeans_k = max(8, min(64, int(n**0.5 / 4)))
        train = base
        if n > train_sample:
            # deterministic modular sample: ~train_sample rows, no
            # shuffle, replayable across runs (unlike limit())
            train = base.filter(
                F.col("vid") % int(-(-n // train_sample)) == 0
            )
        if centroids is None:
            centroids, _ = kmeans_fit(train, "vid", "nv", k=kmeans_k, iters=iters)
        if books is None:
            books = pq_fit(
                train, "vid", "nv", m=m, k=codebook_k, iters=iters, dim=dim
            )
    m = len(books)
    sub = dim // m

    def _code(s: int, book) -> Column:
        # codebook as ONE matrix Literal, not k·sub expression nodes
        # (r16 plan-size fix — see pq_encode)
        sv = F.slice(F.col("nv"), s * sub + 1, sub)
        return F.array_min(
            F.transform(
                lit_double_matrix(book),
                lambda c, i: F.struct(
                    sqdist(sv, c).alias("dist"), i.alias("cid")
                ),
            )
        ).getField("cid")

    # index side carries ONLY (vid, cell, codes) — the raw/normalized
    # floats never enter the candidate surface (the whole point of ADC);
    # they are joined back for the shortlist survivors only
    cells = base.select(
        "vid",
        _nearest_cells("nv", centroids, 1).getItem(0).alias("cell"),
        F.array(*[_code(s, book) for s, book in enumerate(books)]).alias("codes"),
    )
    # per-probe ADC table: pt[s][cid] = ||probe_sub_s - codeword||²,
    # an array-of-arrays computed from literal codebooks — narrow
    # NB: one-arg transform lambdas only (see pq_adc_trained_topk)
    def _pt_dists(s: int, book) -> Column:
        return F.transform(
            lit_double_matrix(book),
            lambda c: sqdist(F.slice(F.col("nv"), s * sub + 1, sub), c),
        )

    pt = F.array(*[_pt_dists(s, book) for s, book in enumerate(books)])
    pcells = base.filter(F.col("vid") % probe_mod == 0).select(
        F.col("vid").alias("pid"),
        pt.alias("pt"),
        F.explode(_nearest_cells("nv", centroids, nprobe)).alias("cell"),
    )
    cand = cells.join(pcells, "cell").filter(F.col("pid") != F.col("vid"))
    adc = F.element_at(F.col("pt").getItem(0), F.col("codes").getItem(0) + 1)
    for s in range(1, m):
        adc = adc + F.element_at(
            F.col("pt").getItem(s), F.col("codes").getItem(s) + 1
        )
    # no dedup needed: every vector lives in exactly ONE cell and a
    # probe's nprobe cells are distinct, so (pid, vid) pairs are unique
    # by construction — a dropDuplicates here would be a pure extra
    # shuffle of the candidate set.  The per-probe ADC table `pt` (m·k
    # doubles) rides the candidate rows — bounded by the model, not the
    # corpus; candidate ordering itself is (pid, vid, adc) only, so the
    # shortlist row_number exchange moves NO dim-sized arrays (the
    # pq_adc_trained_topk join-back pattern).
    scored = cand.select("pid", "vid", adc.alias("adc"))
    slw = Window.partitionBy("pid").orderBy(F.asc("adc"), F.asc("vid"))
    sl = (
        scored.withColumn("slrank", F.row_number().over(slw))
        .filter(F.col("slrank") <= shortlist)
        .select("pid", "vid")
    )
    p = base.select(F.col("vid").alias("pvid"), F.col("nv").alias("pnv"))
    b = base.select(F.col("vid").alias("bvid"), F.col("nv").alias("bnv"))
    rescored = (
        sl.join(p, sl["pid"] == p["pvid"])
        .join(b, sl["vid"] == b["bvid"])
        .select(
            F.col("pid").alias("id1"),
            F.col("vid").alias("id2"),
            dot(F.col("pnv"), F.col("bnv")).alias("cos_raw"),
        )
    )
    rw = Window.partitionBy("id1").orderBy(F.desc("cos_raw"), F.asc("id2"))
    return (
        rescored.withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
        .select("id1", "id2", F.round("cos_raw", 6).alias("cosine"), "rank")
    )


@query("sim_ivfpq_recall_rowsonly")
def sim_ivfpq_recall_rowsonly_q(spark, sf_dir):
    """Per-probe recall@10 of the full IVF-PQ read path (trained cells
    auto-sized toward √N, trained m=8/k=64 codebooks, ADC
    shortlist=100, exact re-rank) against brute-force ground truth —
    the end-to-end certificate for the composed 100 TB index
    (`ivfpq_topk`).  Rows-only: trained float models have no SQL
    replay; floors pinned in tests/test_dedup.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    approx = ivfpq_topk(emb, "vec_id", "embedding", probe_mod=50, k=10)
    truth = cosine_topk_brute(emb, "vec_id", "embedding", probe_mod=50, k=10)
    return ann_recall(truth, approx, 10)


@query("graph_knn_ann_trained_rowsonly")
def graph_knn_ann_trained_rowsonly_q(spark, sf_dir):
    """The PRODUCTION kNN-graph builder under the driver: a bare
    `knn_graph_ann()` call (trained auto-√N centroids, literal-argmin
    assignment — the linear path a 100 TB job uses) builds every
    1-in-5 vertex's top-10 edges; emitted per probe as edge count +
    recall vs the brute graph.  Rows-only: trained centroids aren't
    SQL-replayable — the modular twins (`graph_knn_ann_edges`,
    `graph_bfs_ann`) carry the hash contract."""
    emb = load_table(spark, sf_dir, "embeddings")
    ann = knn_graph_ann(emb, "vec_id", "embedding", k=10, probe_mod=5)
    truth = cosine_topk_brute(emb, "vec_id", "embedding", probe_mod=5, k=10)
    return ann_recall(truth, ann, 10)


@query("sim_pq_tuned_recall_rowsonly")
def sim_pq_tuned_recall_rowsonly_q(spark, sf_dir):
    """Per-probe recall@10 of the TUNED trained-PQ read path (m=8, k=64
    codewords, shortlist=100 → exact re-rank) against brute-force
    ground truth — the configuration the round-5 sweep selected for
    recall@10 ≥ 0.7 (measured 0.775 at sf0.1; full cost curve in
    PLANS.md).  Rows-only: trained float centroids aren't
    SQL-replayable; the modular-codebook twins (sim_pq_adc_topk /
    sim_pq_recall) carry the hash contract, and the ≥ 0.6 recall floor
    is pinned in tests/test_dedup.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    # norm as a projected column: one fold per row, not per element
    # (r16, guide §4.1 — see pq_adc_ranked)
    norm = (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("_v"))
        .withColumn("_vn", l2_norm_w("_v", DIM))
        .select(
            "vec_id",
            F.transform(F.col("_v"), lambda x: x / F.col("_vn")).alias("nv"),
        )
    )
    books = pq_fit(norm, "vec_id", "nv", m=8, k=64, iters=3)
    tuned = pq_adc_trained_topk(
        emb, "vec_id", "embedding", books, probe_mod=50, k=10, shortlist=100
    )
    truth = cosine_topk_brute(emb, "vec_id", "embedding", probe_mod=50, k=10)
    return ann_recall(truth, tuned, 10)


# -- link prediction ----------------------------------------------------------


def link_prediction_jaccard(
    edges: DataFrame, min_score: float = 0.2
) -> DataFrame:
    """Common-neighbor link prediction over an undirected edge list:
    for every non-adjacent pair sharing at least one neighbor, the
    Jaccard coefficient of their neighborhoods — the classic missing-
    edge / recommendation score ("these two docs are not linked but
    their neighborhoods overlap heavily").

    Plan: candidate pairs come from the WEDGE join (two hops through a
    shared neighbor, a < b), counted per pair; degrees join in as a
    broadcast; existing edges are anti-joined out.  The wedge join's
    cost is sum-of-squared-degrees — bounded on a kNN graph (degree ≤
    2k by construction); on organic graphs the standard hub cap (drop
    vertices above a degree ceiling before the wedge) applies, exactly
    like the hot-shingle cap in dedup."""
    # four consumers (deg, both wedge legs, the anti-join) → pin the
    # input edge list once; the symmetrization/projections downstream
    # are cheap unions over the materialized table
    edges = edges.localCheckpoint(eager=True)
    sym = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    e1 = sym.select(F.col("u").alias("a"), F.col("v").alias("w"))
    e2 = sym.select(F.col("u").alias("w"), F.col("v").alias("b"))
    wedges = (
        e1.join(e2, "w")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    norm_edges = edges.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    ).distinct()
    cand = wedges.join(norm_edges, ["a", "b"], "left_anti")
    da = deg.select(F.col("u").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("u").alias("b"), F.col("d").alias("db"))
    score = F.round(
        F.col("common") / (F.col("da") + F.col("db") - F.col("common")), 6
    )
    # degree tables are per-vertex: plain joins (AQE decides)
    return (
        cand.join(da, "a")
        .join(db, "b")
        .select("a", "b", "common", score.alias("score"))
        .filter(F.col("score") >= min_score)
    )


def _duck_linkpred_oracle(probe_mod: int, topk: int, min_score: float) -> str:
    return (
        _duck_base(probe_mod)
        + _duck_topk_ctes()
        + f"""
    , knn AS MATERIALIZED (
      SELECT DISTINCT least(id1, id2) AS u, greatest(id1, id2) AS v
      FROM ranked WHERE rank <= {topk}
    ), ed AS MATERIALIZED (
      SELECT u, v FROM knn UNION ALL SELECT v, u FROM knn
    ), deg AS (
      SELECT u, count(*) AS d FROM ed GROUP BY u
    ), wedges AS (
      SELECT e1.u AS a, e2.v AS b, count(*) AS common
      FROM ed e1 JOIN ed e2 ON e1.v = e2.u
      WHERE e1.u < e2.v
      GROUP BY e1.u, e2.v
    ), cand AS (
      SELECT w.a, w.b, w.common FROM wedges w
      WHERE NOT EXISTS (
        SELECT 1 FROM knn k WHERE k.u = w.a AND k.v = w.b
      )
    )
    SELECT c.a, c.b, c.common,
           round(c.common / (da.d + db.d - c.common), 6) AS score
    FROM cand c
      JOIN deg da ON da.u = c.a
      JOIN deg db ON db.u = c.b
    WHERE round(c.common / (da.d + db.d - c.common), 6) >= {min_score}
    """
    )


@query("graph_link_prediction", oracle=_duck_linkpred_oracle(5, 10, 0.2))
def graph_link_prediction_q(spark, sf_dir):
    """Predicted missing links on the 1-in-5-probe kNN graph: every
    non-adjacent pair with neighborhood Jaccard >= 0.2."""
    emb = load_table(spark, sf_dir, "embeddings")
    knn = cosine_topk_brute(emb, "vec_id", "embedding", probe_mod=5, k=10)
    edges = knn.select(
        F.least("id1", "id2").alias("u"), F.greatest("id1", "id2").alias("v")
    ).distinct()
    return link_prediction_jaccard(edges, 0.2)


# -- random-projection (JL) dimensionality reduction --------------------------

RP_DIM = 16  # target dimensionality
_rp_rng = random.Random(7)
RP_PLANES: list[list[float]] = [
    [1.0 if _rp_rng.random() < 0.5 else -1.0 for _ in range(DIM)]
    for _ in range(RP_DIM)
]


def random_project(v: Column) -> Column:
    """Project a DIM-vector to RP_DIM dims with the fixed ±1 matrix
    scaled by 1/sqrt(RP_DIM) — the Johnson-Lindenstrauss sketch that
    approximately preserves pairwise distances.  Pure codegen arithmetic
    (RP_DIM fold-sums); the matrix ships as literals in the plan."""
    scale = 1.0 / (RP_DIM ** 0.5)
    return F.array(
        *[
            (dot(v, lit_double_array(plane)) * scale)
            for plane in RP_PLANES
        ]
    )


def _duck_rp_oracle(probe_mod: int, other_mod: int) -> str:
    scale = 1.0 / (RP_DIM ** 0.5)

    def proj(vec: str, k: int) -> str:
        terms = " + ".join(
            f"{vec}[{i + 1}]*({RP_PLANES[k][i]})" for i in range(DIM)
        )
        return f"((0.0 + {terms}) * {scale})"

    orig = "(0.0 + " + " + ".join(
        f"(a.v[{i}] - b.v[{i}])*(a.v[{i}] - b.v[{i}])" for i in range(1, DIM + 1)
    ) + ")"
    projd = "(0.0 + " + " + ".join(
        f"({proj('a.v', k)} - {proj('b.v', k)})*({proj('a.v', k)} - {proj('b.v', k)})"
        for k in range(RP_DIM)
    ) + ")"
    return f"""
    WITH base AS (
      SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings
    ), a AS (
      SELECT vid, v FROM base WHERE vid % {probe_mod} = 0
    ), b AS (
      SELECT vid, v FROM base WHERE vid % {other_mod} = 0
    )
    SELECT a.vid AS id1, b.vid AS id2,
           round({orig}, 6) AS orig_d2,
           round({projd}, 6) AS proj_d2,
           round({projd} / {orig}, 6) AS ratio
    FROM a JOIN b ON a.vid <> b.vid
    """


@query("sim_random_projection", oracle=_duck_rp_oracle(50, 11))
def sim_random_projection_q(spark, sf_dir):
    """JL random projection 64 → 16 dims: squared distances before and
    after projection for every (1-in-50 probe, 1-in-11 corpus) pair,
    with the preservation ratio — the measured evidence that the sketch
    keeps neighborhoods (E[ratio] = 1, concentration by JL), and the
    dimensionality-reduction primitive that makes downstream ANN /
    clustering 4x cheaper per vector.

    Plan: projection is RP_DIM codegen'd fold-sums evaluated once per
    side; the pair join is probe-broadcast like cosine_topk_brute.  The
    oracle replays the entire fixed ±1 matrix in left-assoc SQL, so
    every value is bit-identical."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    a = base.filter(F.col("vid") % 50 == 0).select(
        F.col("vid").alias("id1"), F.col("v").alias("va")
    ).withColumn("pa", random_project(F.col("va")))
    b = base.filter(F.col("vid") % 11 == 0).select(
        F.col("vid").alias("id2"), F.col("v").alias("vb")
    ).withColumn("pb", random_project(F.col("vb")))
    diff2 = lambda x, y: dot(  # noqa: E731
        F.zip_with(x, y, lambda p, q: p - q), F.zip_with(x, y, lambda p, q: p - q)
    )
    pairs = b.join(F.broadcast(a), F.col("id1") != F.col("id2"))
    return pairs.select(
        "id1",
        "id2",
        F.round(diff2(F.col("va"), F.col("vb")), 6).alias("orig_d2"),
        F.round(diff2(F.col("pa"), F.col("pb")), 6).alias("proj_d2"),
        F.round(
            diff2(F.col("pa"), F.col("pb")) / diff2(F.col("va"), F.col("vb")), 6
        ).alias("ratio"),
    )


@query(
    "sim_gram_matrix",
    oracle=f"""
    WITH m AS (
      SELECT generate_subscripts(embedding::DOUBLE[], 1) - 1 AS i,
             unnest(embedding::DOUBLE[]) AS x,
             vec_id
      FROM embeddings
    )
    SELECT a.i AS i, b.i AS j,
           round(sum(a.x * b.x), 6) AS g
    FROM m a JOIN m b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
    """,
)
def sim_gram_matrix_q(spark, sf_dir):
    """The corpus Gram matrix X'X (upper triangle, 64x64 → 2080 cells)
    — the sufficient statistic behind closed-form OLS, covariance/PCA,
    and whitening: compute it ONCE in a distributed pass and every
    downstream d x d solve is driver-trivial.

    Plan: posexplode to (vec, dim, x) rows, self-join on the vector id
    (co-partitioned — the join key is the id both sides were exploded
    from, so with the upstream repartition there is ONE shuffle), then
    a d² hash aggregate.  The shuffle carries (d²/2) partials per task
    — independent of corpus size.  Cross-engine: per-cell sums differ
    in last-ulp order; 6-dp rounding absorbs it (values O(n))."""
    emb = load_table(spark, sf_dir, "embeddings")
    ncores = emb.sparkSession.sparkContext.defaultParallelism
    m = (
        emb.repartition(ncores, "vec_id")
        .select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "x"),
        )
    )
    a, b = m.alias("a"), m.alias("b")
    return (
        a.join(
            b,
            (F.col("a.vec_id") == F.col("b.vec_id"))
            & (F.col("a.i") <= F.col("b.i")),
        )
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.round(F.sum(F.col("a.x") * F.col("b.x")), 6).alias("g"))
    )


@query(
    "graph_assortativity",
    oracle=_duck_base(5)
    + _duck_topk_ctes()
    + """
    , knn AS MATERIALIZED (
      SELECT DISTINCT least(id1, id2) AS u, greatest(id1, id2) AS v
      FROM ranked WHERE rank <= 10
    ), ed AS (
      SELECT u, v FROM knn UNION ALL SELECT v, u FROM knn
    ), deg AS (
      SELECT u, count(*) AS d FROM ed GROUP BY u
    )
    SELECT CAST(count(*) AS BIGINT) AS n_directed_edges,
           round(avg(da.d), 6) AS mean_deg,
           round(corr(da.d, db.d), 6) AS assortativity
    FROM ed e JOIN deg da ON da.u = e.u JOIN deg db ON db.u = e.v
    """,
)
def graph_assortativity_q(spark, sf_dir):
    """Degree assortativity of the kNN graph: the Pearson correlation
    of endpoint degrees over all (directed) edges — positive means hubs
    connect to hubs (social-network-like), negative means hub-and-spoke
    (typical for kNN graphs, where dense-region vectors absorb many
    reverse edges).  The one-number topology screen that decides
    whether degree-capping is needed before wedge/triangle work.

    Plan: degree table (one hash agg) joined onto the edge list twice
    (vertex-keyed equi-joins — per-vertex tables, so no broadcast
    hint), one corr aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    knn = cosine_topk_brute(emb, "vec_id", "embedding", probe_mod=5, k=10)
    edges = knn.select(
        F.least("id1", "id2").alias("u"), F.greatest("id1", "id2").alias("v")
    ).distinct().localCheckpoint(eager=True)
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    da = deg.select(F.col("u"), F.col("d").alias("da"))
    db = deg.select(F.col("u").alias("v"), F.col("d").alias("db"))
    # per-vertex degree tables: plain joins (AQE decides)
    return (
        sym.join(da, "u")
        .join(db, "v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_directed_edges"),
            F.round(F.avg("da"), 6).alias("mean_deg"),
            F.round(F.corr("da", "db"), 6).alias("assortativity"),
        )
    )


@query(
    "sim_triplet_mining",
    oracle=_duck_base(25)
    + f"""
    , lab AS (
      SELECT vec_id AS vid, label FROM embeddings
    ), scored AS (
      SELECT p.pid, b.vid, {duck_cosine("p.pv", "b.v", DIM)} AS cs,
             la.label AS alabel, lb.label AS blabel
      FROM base b
        JOIN probes p ON p.pid <> b.vid
        JOIN lab la ON la.vid = p.pid
        JOIN lab lb ON lb.vid = b.vid
    ), pos AS (
      SELECT pid, vid AS pos_id, cs AS pos_cos FROM (
        SELECT pid, vid, cs,
               row_number() OVER (PARTITION BY pid ORDER BY cs DESC, vid) AS rn
        FROM scored WHERE alabel = blabel
      ) WHERE rn = 1
    ), neg AS (
      SELECT s.pid, s.vid AS neg_id, s.cs AS neg_cos,
             row_number() OVER (PARTITION BY s.pid
                                ORDER BY s.cs DESC, s.vid) AS rn
      FROM scored s JOIN pos p ON p.pid = s.pid
      WHERE s.alabel <> s.blabel AND s.cs < p.pos_cos
    )
    SELECT p.pid AS anchor_id, p.pos_id, n.neg_id,
           round(p.pos_cos, 6) AS pos_cos,
           round(n.neg_cos, 6) AS neg_cos,
           round(p.pos_cos - n.neg_cos, 6) AS margin
    FROM pos p JOIN neg n ON n.pid = p.pid AND n.rn = 1
    """,
)
def sim_triplet_mining_q(spark, sf_dir):
    """Semi-hard triplet mining for metric learning: for each anchor
    (1-in-25 probe), the most-similar SAME-label vector as the
    positive, and the hardest DIFFERENT-label vector that is still
    farther than the positive (the semi-hard band of FaceNet) as the
    negative — the batch construction that makes triplet-loss training
    converge, as one engine query.

    Plan: the anchor-probe set broadcasts against the corpus exactly
    like cosine_topk_brute; label attachment is two dimension joins;
    positive and semi-hard negative are per-anchor argmax windows over
    bit-exact scores (id tie-breaks), so the mined triplets are
    deterministic and the oracle replays them."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").cast("array<double>").alias("v"),
        "label",
    ).withColumn("vn", l2_norm(F.col("v")))
    probes = base.filter(F.col("vid") % 25 == 0).select(
        F.col("vid").alias("pid"), F.col("v").alias("pv"),
        F.col("vn").alias("pn"), F.col("label").alias("alabel"),
    )
    scored = base.join(F.broadcast(probes), F.col("pid") != F.col("vid")).select(
        "pid",
        "vid",
        (dot(F.col("pv"), F.col("v")) / (F.col("pn") * F.col("vn"))).alias("cs"),
        "alabel",
        F.col("label").alias("blabel"),
    ).localCheckpoint(eager=True)  # two consumers: positives + negatives
    wp = Window.partitionBy("pid").orderBy(F.desc("cs"), F.asc("vid"))
    pos = (
        scored.filter(F.col("alabel") == F.col("blabel"))
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select("pid", F.col("vid").alias("pos_id"), F.col("cs").alias("pos_cos"))
    )
    neg_cand = (
        scored.filter(F.col("alabel") != F.col("blabel"))
        .join(pos.select("pid", "pos_cos"), "pid")
        .filter(F.col("cs") < F.col("pos_cos"))
    )
    neg = (
        neg_cand.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select("pid", F.col("vid").alias("neg_id"), F.col("cs").alias("neg_cos"))
    )
    return pos.join(neg, "pid").select(
        F.col("pid").alias("anchor_id"),
        "pos_id",
        "neg_id",
        F.round("pos_cos", 6).alias("pos_cos"),
        F.round("neg_cos", 6).alias("neg_cos"),
        F.round(F.col("pos_cos") - F.col("neg_cos"), 6).alias("margin"),
    )


@query(
    "sim_knn_outlier_scores",
    oracle=_duck_base(5)
    + _duck_topk_ctes()
    + """
    SELECT id1 AS vid, round(cos_raw, 6) AS cos_at_k,
           round(1.0 - round(cos_raw, 6), 6) AS outlier_score
    FROM ranked WHERE rank = 10
    """,
)
def sim_knn_outlier_scores_q(spark, sf_dir):
    """Distance-to-kth-neighbor outlier scores: a vector whose 10th-
    nearest neighbor is already far (low cosine) sits in a sparse
    region — the classic kNN density proxy for embedding-space outlier
    and OOD detection (the per-point counterpart to the k-core's
    subgraph-level density filter).

    Plan: exactly the brute top-k machinery, keeping ONLY the rank-k
    row per probe — no extra passes; with an ANN index the same score
    comes from the index probe at negligible cost."""
    emb = load_table(spark, sf_dir, "embeddings")
    knn = cosine_topk_brute(emb, "vec_id", "embedding", probe_mod=5, k=10)
    return knn.filter(F.col("rank") == 10).select(
        F.col("id1").alias("vid"),
        F.col("cosine").alias("cos_at_k"),
        F.round(1.0 - F.col("cosine"), 6).alias("outlier_score"),
    )


@query(
    "graph_label_modularity",
    oracle=_duck_base(5)
    + _duck_topk_ctes()
    + """
    , knn AS MATERIALIZED (
      SELECT DISTINCT least(id1, id2) AS u, greatest(id1, id2) AS v
      FROM ranked WHERE rank <= 10
    ), lab AS (
      SELECT vec_id AS vid, label FROM embeddings
    ), lab_e AS (
      SELECT k.u, k.v, lu.label AS lu, lv.label AS lv
      FROM knn k JOIN lab lu ON lu.vid = k.u JOIN lab lv ON lv.vid = k.v
    ), m AS (
      SELECT count(*) AS m FROM knn
    ), ed AS (
      SELECT u AS x, lu AS l FROM lab_e UNION ALL SELECT v, lv FROM lab_e
    ), dsum AS (
      SELECT l, count(*) AS d FROM ed GROUP BY l
    ), within AS (
      SELECT lu AS l, count(*) AS mc FROM lab_e WHERE lu = lv GROUP BY lu
    ), per AS (
      SELECT d.l,
             coalesce(w.mc, 0) * 1.0 / m.m
               - (d.d / (2.0 * m.m)) * (d.d / (2.0 * m.m)) AS q
      FROM dsum d LEFT JOIN within w ON w.l = d.l CROSS JOIN m
    )
    SELECT CAST((SELECT m FROM m) AS BIGINT) AS n_edges,
           CAST(count(*) AS BIGINT) AS n_labels,
           round(sum(q), 6) AS modularity
    FROM per
    """,
)
def graph_label_modularity_q(spark, sf_dir):
    """Newman modularity of the TRUE label partition over the kNN
    graph: Q = Σ_c (m_c/m − (d_c/2m)²) — the one-number check of how
    well the class structure aligns with embedding-space neighborhoods
    (high Q ⇒ labels form graph communities ⇒ kNN classifiers and
    graph-propagation labeling will work; near-zero Q ⇒ the embedding
    does not separate the classes).

    Plan: label attachment is two vertex-keyed joins; within-community
    edge counts and degree sums are two small aggregates over the edge
    list; the Q fold runs over |labels| rows.  Everything after the kNN
    construction is edge-list-sized."""
    emb = load_table(spark, sf_dir, "embeddings")
    knn = cosine_topk_brute(emb, "vec_id", "embedding", probe_mod=5, k=10)
    edges = knn.select(
        F.least("id1", "id2").alias("u"), F.greatest("id1", "id2").alias("v")
    ).distinct().localCheckpoint(eager=True)
    lab = emb.select(F.col("vec_id").alias("vid"), "label")
    lab_e = (
        edges.join(lab.select(F.col("vid").alias("u"), F.col("label").alias("lu")), "u")
        .join(lab.select(F.col("vid").alias("v"), F.col("label").alias("lv")), "v")
        .localCheckpoint(eager=True)
    )
    m = edges.count()
    dsum = (
        lab_e.select(F.col("lu").alias("l"))
        .union(lab_e.select(F.col("lv").alias("l")))
        .groupBy("l")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    within = (
        lab_e.filter(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("l"))
        .agg(F.count(F.lit(1)).alias("mc"))
    )
    per = dsum.join(within, "l", "left").select(
        (
            F.coalesce("mc", F.lit(0)) / F.lit(float(m))
            - (F.col("d") / F.lit(2.0 * m)) * (F.col("d") / F.lit(2.0 * m))
        ).alias("q")
    )
    return per.agg(
        F.lit(m).cast("bigint").alias("n_edges"),
        F.count(F.lit(1)).cast("bigint").alias("n_labels"),
        F.round(F.sum("q"), 6).alias("modularity"),
    )


@query(
    "sim_recall_curve_lsh",
    oracle=_duck_base(50)
    + _duck_bits_cte()
    + """
    , cand AS (
      SELECT DISTINCT p.pid, p.pv, c.vid, c.v
      FROM keyed c JOIN (
        SELECT k.vid AS pid, k.v AS pv, k.bucket FROM keyed k WHERE k.vid % 50 = 0
      ) p ON c.bucket = p.bucket AND p.pid <> c.vid
    ), a_scored AS (
      SELECT pid AS id1, vid AS id2, """
    + duck_cosine("pv", "v", DIM)
    + """ AS cos_raw FROM cand
    ), a_ranked AS (
      SELECT id1, id2,
             row_number() OVER (PARTITION BY id1 ORDER BY cos_raw DESC, id2) AS rank
      FROM a_scored
    ), t_scored AS (
      SELECT pid AS id1, vid AS id2, """
    + duck_cosine("pv", "v", DIM)
    + """ AS cos_raw
      FROM base JOIN probes ON pid <> vid
    ), t_ranked AS (
      SELECT id1, id2,
             row_number() OVER (PARTITION BY id1 ORDER BY cos_raw DESC, id2) AS rank
      FROM t_scored
    ), ks AS (
      SELECT unnest([1, 5, 10]) AS k
    ), probeset AS (
      SELECT DISTINCT id1 FROM t_ranked
    ), hits AS (
      SELECT a.id1, kk.k, count(*) AS h
      FROM a_ranked a
        JOIN t_ranked t ON t.id1 = a.id1 AND t.id2 = a.id2
        JOIN ks kk ON a.rank <= kk.k AND t.rank <= kk.k
      GROUP BY a.id1, kk.k
    ), per AS (
      SELECT kk.k, coalesce(h.h, 0) * 1.0 / kk.k AS r
      FROM probeset p CROSS JOIN ks kk
      LEFT JOIN hits h ON h.id1 = p.id1 AND h.k = kk.k
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_probes,
           round(avg(r), 6) AS mean_recall
    FROM per GROUP BY k
    """,
)
def sim_recall_curve_lsh_q(spark, sf_dir):
    """LSH recall CURVE — mean recall@k of the hyperplane index against
    exact ground truth for k in {1, 5, 10}: the index-tuning readout
    (recall@1 tells you about the nearest neighbor specifically, which
    banding parameters trade away first).  Zero-hit probes count as
    zero recall (the probeset cross join), not as missing rows.

    Plan: both rankings are the existing probe-broadcast shapes; the
    curve aggregation is O(probes · k-levels)."""
    emb = load_table(spark, sf_dir, "embeddings")
    truth = cosine_topk_brute(emb, "vec_id", "embedding", probe_mod=50, k=10)
    approx = cosine_topk_lsh(emb, "vec_id", "embedding", probe_mod=50, k=10)
    ks = emb.sparkSession.createDataFrame([(1,), (5,), (10,)], "k int")
    t = truth.select("id1", "id2", F.col("rank").alias("rt"))
    a = approx.select("id1", "id2", F.col("rank").alias("ra"))
    hits = (
        a.join(t, ["id1", "id2"])
        .join(F.broadcast(ks), (F.col("ra") <= F.col("k")) & (F.col("rt") <= F.col("k")))
        .groupBy("id1", "k")
        .agg(F.count(F.lit(1)).alias("h"))
    )
    probeset = t.select("id1").distinct()
    per = (
        probeset.crossJoin(F.broadcast(ks))
        .join(hits, ["id1", "k"], "left")
        .select("k", (F.coalesce("h", F.lit(0)) / F.col("k")).alias("r"))
    )
    return per.groupBy(F.col("k").cast("bigint").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.round(F.avg("r"), 6).alias("mean_recall"),
    )


@query(
    "graph_effective_diameter",
    oracle=f"""
    WITH bfs AS ({_duck_bfs_oracle(4, 5, 10, 50)})
    SELECT round(quantile_cont(CASE WHEN dist >= 0 THEN dist END, 0.9), 6)
             AS eff_diameter_p90,
           CAST(sum(CASE WHEN dist >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_reached,
           CAST(sum(CASE WHEN dist < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unreached
    FROM bfs
    """,
)
def graph_effective_diameter_q(spark, sf_dir):
    """Effective diameter (90th-percentile hop distance among reached
    vertices) of the kNN graph from the 1-in-50 seed set, plus the
    reached/unreached census — the one-number connectivity summary
    (small-world check, diffusion-radius estimate) built directly on
    the `bfs_hops` primitive.  `quantile_cont` ≡ Spark `F.percentile`
    exactly (verify-notes contract), and the inputs are exact BIGINT
    hop counts, so the interpolated percentile is engine-stable.  The
    unreached count is reported rather than silently dropped (a
    truncated 4-hop exploration undercounts distances; the census
    makes that visible)."""
    emb = load_table(spark, sf_dir, "embeddings")
    knn = cosine_topk_brute(emb, "vec_id", "embedding", probe_mod=5, k=10)
    edges = knn.select(
        F.least("id1", "id2").alias("u"), F.greatest("id1", "id2").alias("v")
    ).distinct()
    vertices = emb.select(F.col("vec_id").alias("id"))
    seeds = emb.filter(F.col("vec_id") % 50 == 0).select(F.col("vec_id").alias("id"))
    d = bfs_hops(vertices, edges, seeds, rounds=4)
    return d.agg(
        F.round(
            F.expr("percentile(CASE WHEN dist >= 0 THEN dist END, 0.9)"), 6
        ).alias("eff_diameter_p90"),
        F.sum((F.col("dist") >= 0).cast("long")).alias("n_reached"),
        F.sum((F.col("dist") < 0).cast("long")).alias("n_unreached"),
    )


@query(
    "graph_clustering_coeff",
    oracle=_duck_base(50)
    + _duck_topk_ctes()
    + _DUCK_TRI_CTES
    + """
    , tcount AS (
      SELECT v, count(*) AS n_tri FROM (
        SELECT u AS v FROM tri
        UNION ALL SELECT y AS v FROM tri
        UNION ALL SELECT z AS v FROM tri
      ) GROUP BY v
    )
    SELECT d.v AS id, CAST(d.d AS BIGINT) AS degree,
           CAST(coalesce(t.n_tri, 0) AS BIGINT) AS n_tri,
           round(2.0 * coalesce(t.n_tri, 0) / (d.d * (d.d - 1)), 6) AS coeff
    FROM deg d LEFT JOIN tcount t ON t.v = d.v
    WHERE d.d >= 2
    """,
)
def graph_clustering_coeff_q(spark, sf_dir):
    """Local clustering coefficient per vertex of the kNN graph —
    2·triangles / (degree·(degree−1)), the how-clique-like-is-my-
    neighborhood signal that separates tight similarity communities
    (coeff → 1) from hub-and-spoke noise (coeff → 0).  Vertices with
    degree ≥ 2 and ZERO triangles are kept at coefficient 0 via the
    left join (a triangle-only census silently drops them and skews
    any average upward); coefficients are exact small-integer ratios,
    identical on both engines.  Plan cost = the degree-ordered
    triangle count (`triangle_counts`, hub-proof) + one left join of
    two vertex-sized tables."""
    from dask_obj_spark.operators.corpus import triangle_counts

    emb = load_table(spark, sf_dir, "embeddings")
    knn = cosine_topk_brute(emb, "vec_id", "embedding", probe_mod=50, k=10)
    e = (
        knn.select(
            F.least("id1", "id2").alias("a"), F.greatest("id1", "id2").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .union(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    tri = triangle_counts(knn.select("id1", "id2"), "id1", "id2")
    return (
        deg.join(tri, "v", "left")
        .filter(F.col("d") >= 2)
        .select(
            F.col("v").alias("id"),
            F.col("d").cast("long").alias("degree"),
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
            F.round(
                2.0 * F.coalesce("n_tri", F.lit(0)) / (F.col("d") * (F.col("d") - 1)),
                6,
            ).alias("coeff"),
        )
    )


@query("sim_pq_trained_rowsonly")
def sim_pq_trained_rowsonly_q(spark, sf_dir):
    """The PRODUCTION PQ path end-to-end through the engine: pq_fit
    trains 4 per-subspace k-means codebooks (k=8, 2 Lloyd rounds) on
    the corpus, pq_encode assigns codes by broadcast argmin — rows-only
    (trained float centroids aren't SQL-replayable; the numpy-parity
    unit test pins assignment correctness, and the modular-codebook
    twins sim_pq_encode / sim_pq_adc_topk carry the hash contract)."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_fit(emb, "vec_id", "embedding", m=PQ_M, k=8, iters=2)
    return pq_encode(emb, "vec_id", "embedding", books)


# -- k-center coreset selection ----------------------------------------------


def kcenter_coreset(
    df: DataFrame, id_col: str, vec_col: str, k: int = 6
) -> DataFrame:
    """Greedy k-center coreset selection over an embedding column — the
    farthest-point-first diversity heuristic (Gonzalez 1985; 2-approx
    for the k-center radius), the standard "pick a maximally diverse
    seed set" step in corpus curation / active-learning pipelines.

    Round 1 seeds with the min-id vector; each later round picks the
    point FARTHEST from the already-chosen set (min over centers of the
    exact squared euclidean distance, max over points, ties by id) and
    reports that distance — the coverage radius at pick time.

    Scale shape at 100 TB: the kmeans_fit template — centers circulate
    as k·dim literal floats, each round is ONE corpus scan with a
    per-row least() chain over the center literals into a global
    TakeOrdered(1) (no shuffle of corpus rows, no N-sized state, no
    all-pairs); driver state is k rows.  Total work k scans — for the
    coreset sizes this heuristic is used at (seed sets, not
    clusterings), the scan count is the constant k of the query.

    Numerics: sqdist is the shared left-assoc fold, least() chains in
    pick order, and the reported radius is floor-quantized to integer
    micro-units — every pick decision and output value replays
    bit-for-bit on the DuckDB oracle's identically-unrolled rounds.
    """
    import math

    base = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    first = base.orderBy(F.asc("vid")).limit(1).collect()[0]
    centers: list[tuple[int, list[float], float]] = [
        (first["vid"], list(first["v"]), 0.0)
    ]
    for _ in range(1, k):
        # one-parse codegen'd least-of-sqdist chain, nested in pick
        # order exactly like the F.least fold it replaces (and like the
        # oracle's unrolled rounds) — bit-identical doubles
        mind_sql = sql_sqdist_const("v", centers[0][1])
        for _, vec, _ in centers[1:]:
            mind_sql = f"least({mind_sql}, {sql_sqdist_const('v', vec)})"
        mind = F.expr(mind_sql)
        pick = (
            base.select("vid", "v", mind.alias("mind"))
            .orderBy(F.desc("mind"), F.asc("vid"))
            .limit(1)
            .collect()[0]
        )
        centers.append((pick["vid"], list(pick["v"]), pick["mind"]))
    rows = [
        (r + 1, int(vid), int(math.floor(1000000.0 * d)))
        for r, (vid, _, d) in enumerate(centers)
    ]
    return df.sparkSession.createDataFrame(
        rows, "round int, vid bigint, dist_x1m bigint"
    )


def _duck_kcenter_sql(k: int, dim: int) -> str:
    """Identically-unrolled greedy k-center rounds (MATERIALIZED CTEs:
    DuckDB would otherwise inline each round's chain exponentially)."""
    ctes = [
        """base AS MATERIALIZED (
      SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings
    )""",
        "p1 AS MATERIALIZED (SELECT vid, v FROM base ORDER BY vid LIMIT 1)",
    ]
    for r in range(2, k + 1):
        mind = duck_sqdist("b.v", "p1.v", dim)
        for j in range(2, r):
            mind = f"least({mind}, {duck_sqdist('b.v', f'p{j}.v', dim)})"
        froms = ", ".join(["base b"] + [f"p{j}" for j in range(1, r)])
        ctes.append(
            f"""p{r} AS MATERIALIZED (
      SELECT b.vid AS vid, b.v AS v, {mind} AS mind
      FROM {froms}
      ORDER BY mind DESC, b.vid LIMIT 1
    )"""
        )
    selects = [
        "SELECT CAST(1 AS INTEGER) AS round, vid, CAST(0 AS BIGINT) AS dist_x1m FROM p1"
    ] + [
        f"SELECT CAST({r} AS INTEGER), vid, CAST(floor(1000000.0 * mind) AS BIGINT) FROM p{r}"
        for r in range(2, k + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


@query("sim_kcenter_coreset", oracle=_duck_kcenter_sql(6, DIM))
def sim_kcenter_coreset_q(spark, sf_dir):
    """Greedy k-center coreset (6 picks) over the embeddings table:
    each round's pick and its coverage radius, oracle-replayed through
    identically-unrolled farthest-point rounds."""
    emb = load_table(spark, sf_dir, "embeddings")
    return kcenter_coreset(emb, "vec_id", "embedding", k=6)


# -- binary quantization (sign-bit codes + Hamming shortlist) -----------------


def binary_quantize(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int = DIM,
    thresholds: list[int] | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Per-dimension sign-bit codes packed 32-to-a-BIGINT: the 32×
    compression path of modern vector stores (binary quantization with
    Hamming-distance candidate generation; see also SimHash,
    operators/dedup.py — this is its *per-dimension threshold* cousin
    for raw embedding columns rather than hyperplane projections).

    Reference has no vector ops (SURVEY.md §2 Tier E) — Tier-E surface.

    Bit rule, integer-exact on both engines: quantize each component to
    micro-units ``q_j = floor(v_j · 1e6)`` (BIGINT, per-row, exact),
    learn per-dimension totals ``T_j = Σ q_j`` (BIGINT sum — order-free,
    no float-sum hazard), and set bit j iff ``q_j · n > T_j`` (strictly
    above the dimension mean, compared in integers — no division, no
    rounding ambiguity).  Packing adds ``bit << (j mod 32)`` into word
    ``j div 32`` — non-negative powers of two, left-assoc, exact; 32
    bits per 64-bit word so no sign-bit edge cases in either engine.

    Plan shape (the pq_encode discipline): the threshold fit is ONE
    explode + hash-agg over (dim) — d output rows, map-side combined —
    collected as bounded model state (d BIGINTs); the encode itself is
    a zero-exchange narrow scan against literal threshold arrays.  At
    100 TB the fit is a single pass producing d rows and the encode
    never shuffles; pass precomputed ``thresholds``/``n_rows`` (e.g.
    from a saved model) to skip the fit entirely.

    Overflow note: ``q_j · n`` stays in BIGINT for |v| ≤ ~1e3 up to
    n ≈ 9e9 rows; beyond that scale, fit thresholds on a bounded
    modular sample (the kmeans_fit/pq_fit train_sample pattern).

    Returns (vid, words: array<bigint> of length ceil(dim/32)).
    """
    raw = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    q = F.transform(F.col("v"), lambda x: F.floor(x * F.lit(1000000.0)).cast("bigint"))
    if thresholds is None or n_rows is None:
        fit = (
            raw.select(F.posexplode(q).alias("j", "qv"))
            .groupBy("j")
            .agg(F.sum("qv").alias("t"), F.count("*").alias("c"))
            .collect()
        )
        thresholds = [0] * dim
        for r in fit:
            thresholds[r["j"]] = int(r["t"])
        n_rows = int(fit[0]["c"]) if fit else 0
    # one parsed array literal instead of 64 py4j lit+cast round-trips
    # (identical array<bigint> literal; 'L' is the SQL bigint suffix)
    tlit = F.expr("array(" + ", ".join(f"{int(t)}L" for t in thresholds) + ")")
    n = F.lit(int(n_rows)).cast("bigint")
    qcol = q
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (F.element_at(qcol, j + 1) * n > F.element_at(tlit, j + 1)).cast(
            "bigint"
        ),
    )
    nwords = (dim + 31) // 32

    def _word(w: int) -> Column:
        # unrolled 32-term integer add of literal powers of two —
        # non-negative, exact, and order-free (so the oracle's grouped
        # SUM over bit<<pos replays to the identical BIGINT)
        acc = F.lit(0).cast("bigint")
        for b in range(32):
            j = w * 32 + b
            if j >= dim:
                break
            acc = acc + F.when(
                F.element_at(bits, j + 1) == 1, F.lit(1 << b).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint"))
        return acc

    words = F.array(*[_word(w) for w in range(nwords)])
    return raw.select("vid", F.col("v"), bits.alias("bits"), words.alias("words"))


def binary_hamming_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    probe_mod: int,
    k: int = 10,
    shortlist: int = 100,
    dim: int = DIM,
    thresholds: list[int] | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Binary-quantized ANN read path: Hamming-distance candidate
    generation over packed sign-bit words, exact cosine re-rank for the
    per-probe ``shortlist`` survivors only.

    The 100 TB plan: the standing index is (vid, words) — ceil(d/32)
    BIGINTs per vector, 32× smaller than the float32 raws, so the
    candidate surface streams ~2 words/row against a broadcast probe
    table; ``hamming`` is a zip_with xor→popcount fold (pure integer,
    whole-stage codegen).  Raw vectors enter ONLY for the shortlist
    re-rank via join-back (the ivfpq_topk/pq_adc_trained_topk payload
    discipline: no dim-sized arrays ride the shortlist exchange).

    Cross-engine exactness: Hamming is integer (xor + bit_count), the
    shortlist is (hamming asc, vid) row_number, and the re-rank orders
    by ``floor(cosine·1e6)`` on the shared left-assoc double fold —
    every comparison the query makes is on integers.

    Probe side is bounded by the MAX_PROBES harness contract.
    """
    enc = binary_quantize(df, id_col, vec_col, dim, thresholds, n_rows)
    index = enc.select("vid", "words")
    # collect-once guard + local probe relation (the cosine_ranked_raw /
    # maxsim_topk pattern): one job instead of a count() guard plus a
    # second probe scan of the encode plan
    probes0 = enc.filter(F.col("vid") % probe_mod == 0).select(
        F.col("vid").alias("pid"), F.col("words").alias("pwords")
    )
    probe_rows = _checked_probe_rows(probes0, "binary_hamming_topk")
    probes = df.sparkSession.createDataFrame(probe_rows, probes0.schema)
    # codegen'd kernel over the candidate surface (optimization r16,
    # guide §4.1): the interpreted aggregate/zip_with fold paid a
    # per-pair lambda walk on every (probe, vector) candidate — the
    # unrolled xor→bit_count chain is value-identical (integer adds)
    # and whole-stage-codegen'd
    nwords = (dim + 31) // 32
    ham = hamming_w("pwords", "words", nwords).cast("bigint")
    cand = (
        index.join(F.broadcast(probes), F.col("pid") != F.col("vid"))
        .select("pid", "vid", ham.alias("hamming"))
    )
    slw = Window.partitionBy("pid").orderBy(F.asc("hamming"), F.asc("vid"))
    sl = (
        cand.withColumn("slrank", F.row_number().over(slw))
        .filter(F.col("slrank") <= shortlist)
        .select("pid", "vid", "hamming")
    )
    # per-VECTOR norms before the join (r16, guide §2.3): the norm fold
    # runs once per vector instead of once per shortlist pair, and the
    # pair projection shrinks to a single unrolled dot chain —
    # dot / (pnorm * rnorm) is the same sqrt-then-multiply-then-divide
    # tree cosine_sim_w builds, so cos_x1m is bit-identical
    raw = df.select(
        F.col(id_col).alias("rvid"),
        F.col(vec_col).cast("array<double>").alias("rv"),
    ).withColumn("rnorm", l2_norm_w("rv", dim))
    p = raw.select(
        F.col("rvid").alias("pvid"),
        F.col("rv").alias("pv"),
        F.col("rnorm").alias("pnorm"),
    )
    rr = (
        sl.join(p, sl["pid"] == p["pvid"])
        .join(raw, sl["vid"] == raw["rvid"])
        .select(
            "pid",
            "vid",
            "hamming",
            F.floor(
                dot_w("pv", "rv", dim)
                / (F.col("pnorm") * F.col("rnorm"))
                * F.lit(1000000.0)
            ).cast("bigint").alias("cos_x1m"),
        )
    )
    w = Window.partitionBy("pid").orderBy(F.desc("cos_x1m"), F.asc("vid"))
    return (
        rr.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("pid").alias("id1"),
            F.col("vid").alias("id2"),
            "hamming",
            "cos_x1m",
            "rank",
        )
    )


def _duck_binary_hamming_oracle(probe_mod: int, k: int, shortlist: int, dim: int) -> str:
    nwords = (dim + 31) // 32
    cos = duck_cosine("p.v", "c.v", dim)
    return f"""
WITH base AS MATERIALIZED (
  SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings
),
qd AS MATERIALIZED (
  SELECT vid, i, floor(v[i] * 1000000.0)::BIGINT AS q
  FROM base, range(1, {dim + 1}) t(i)
),
fit AS (SELECT i, sum(q) AS t FROM qd GROUP BY i),
nn AS (SELECT count(*)::BIGINT AS n FROM base),
wordrows AS MATERIALIZED (
  SELECT qd.vid, ((qd.i - 1) // 32)::INT AS w,
         sum(CASE WHEN qd.q * nn.n > fit.t
             THEN (1::BIGINT << ((qd.i - 1) % 32)) ELSE 0 END) AS word
  FROM qd JOIN fit USING (i) CROSS JOIN nn
  GROUP BY qd.vid, ((qd.i - 1) // 32)
),
ham AS MATERIALIZED (
  SELECT p.vid AS pid, c.vid AS vid,
         sum(bit_count(xor(p.word, c.word)))::BIGINT AS hamming
  FROM wordrows p JOIN wordrows c USING (w)
  WHERE p.vid % {probe_mod} = 0 AND p.vid <> c.vid
  GROUP BY 1, 2
),
sl AS MATERIALIZED (
  SELECT pid, vid, hamming,
         row_number() OVER (PARTITION BY pid ORDER BY hamming ASC, vid ASC) AS slrank
  FROM ham
  QUALIFY slrank <= {shortlist}
),
rr AS (
  SELECT sl.pid, sl.vid, sl.hamming,
         floor({cos} * 1000000.0)::BIGINT AS cos_x1m
  FROM sl JOIN base p ON sl.pid = p.vid JOIN base c ON sl.vid = c.vid
)
SELECT pid AS id1, vid AS id2, hamming, cos_x1m,
       row_number() OVER (PARTITION BY pid ORDER BY cos_x1m DESC, vid ASC) AS rank
FROM rr
QUALIFY rank <= {k}
"""


@query(
    "sim_binary_hamming_topk",
    oracle=_duck_binary_hamming_oracle(50, 10, 100, DIM),
)
def sim_binary_hamming_topk_q(spark, sf_dir):
    """Binary-quantization ANN (packed sign bits + Hamming shortlist +
    exact cosine re-rank) for probes vid % 50 == 0 over the embeddings
    table — the 32×-compressed candidate-generation read path."""
    emb = load_table(spark, sf_dir, "embeddings")
    return binary_hamming_topk(emb, "vec_id", "embedding", probe_mod=50)


# -- random projection (Johnson-Lindenstrauss dimensionality reduction) -------


def _rp_signs(out_dim: int, dim: int, salt: str = "rp") -> list[list[float]]:
    """Deterministic ±1 sign matrix from md5 — computed once at plan
    time, embedded as literals in BOTH engines, so the projection is a
    fixed linear map with no cross-engine randomness to reconcile."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{i}_{j}#{salt}".encode()).hexdigest(), 16) % 2 == 0
            else -1.0
            for j in range(dim)
        ]
        for i in range(out_dim)
    ]


def random_projection(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_dim: int = 16,
    dim: int = DIM,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: dim → out_dim via a
    fixed ±1/√r sign matrix (Achlioptas 2003 database-friendly variant
    — sign matrices preserve pairwise distances in expectation exactly
    like Gaussian ones, and cost only adds/subtracts).

    Reference has no vector ops (SURVEY.md §2 Tier E) — Tier-E surface.

    The 100 TB story: projection is a ZERO-exchange narrow map — each
    output coordinate is one literal-sign dot fold over the row's own
    array; no model state circulates (the sign matrix is plan
    literals), so this is the cheap front-end that shrinks 100 TB of
    raw embeddings to out_dim/dim of their size before any pairwise
    stage (LSH, kmeans, dedup) touches them.

    Returns (vid, y: array<double> of length out_dim).
    """
    signs = _rp_signs(out_dim, dim)
    import math

    inv = 1.0 / math.sqrt(out_dim)
    raw = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    ys = [
        (dot(F.col("v"), lit_double_array(row)) * F.lit(inv)).alias(
            f"y{i}"
        )
        for i, row in enumerate(signs)
    ]
    return raw.select("vid", F.array(*[y for y in ys]).alias("y"))


def _duck_random_projection_oracle(out_dim: int, dim: int) -> str:
    import math

    signs = _rp_signs(out_dim, dim)
    inv = repr(1.0 / math.sqrt(out_dim))
    chains = [
        "(0.0 + "
        + " + ".join(f"({row[j]!r})*v[{j + 1}]" for j in range(dim))
        + ")"
        for row in signs
    ]
    ys = ", ".join(f"(({c}) * {inv})" for c in chains)
    return f"""
WITH base AS (
  SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings
),
proj AS (SELECT vid, [{ys}] AS y FROM base)
SELECT vid, i - 1 AS j, floor(y[i] * 1000000.0)::BIGINT AS y_x1m
FROM proj, range(1, {out_dim + 1}) t(i)
"""


@query("sim_jl_projection_coords", oracle=_duck_random_projection_oracle(16, DIM))
def sim_jl_projection_coords_q(spark, sf_dir):
    """JL random projection 64 → 16 over the embeddings table, emitted
    as (vid, j, floor-quantized coordinate) rows.

    Distinct from ``sim_random_projection`` (the r4 distance-
    preservation-ratio query over pair distances): this one certifies
    the projected COORDINATES themselves, that one certifies the JL
    guarantee.  The two were briefly registered under one name in
    round 7, which silently shadowed the r4 query (verdict finding #1)
    — ``query()`` now raises on duplicates."""
    emb = load_table(spark, sf_dir, "embeddings")
    proj = random_projection(emb, "vec_id", "embedding", out_dim=16)
    return proj.select(
        "vid",
        F.posexplode("y").alias("j", "yv"),
    ).select(
        "vid",
        "j",
        F.floor(F.col("yv") * F.lit(1000000.0)).cast("bigint").alias("y_x1m"),
    )


# -- rank-biased overlap between two retrieval runs ----------------------------

RBO_P = 0.9


def rbo_vs_exact(
    exact: DataFrame, approx: DataFrame, k: int = 10, p: float = RBO_P
) -> DataFrame:
    """Rank-Biased Overlap (Webber et al., "A Similarity Measure for
    Indefinite Rankings", TOIS 2010) between an exact and an
    approximate top-k ranking, per probe — the RANK-AWARE companion to
    set recall: two ANN configurations with identical recall@10 can
    differ wildly in whether the misses sit at rank 1 or rank 10, and
    RBO (top-weighted, p^(d-1) per depth) is the standard readout.

    Inputs are (id1, id2, rank) rankings.  Per probe, both lists
    assemble order-exactly (array_sort over (rank, id) structs), then
    the truncated RBO sum unrolls as a FIXED k-term left-assoc chain
    of intersect-prefix sizes — integer set sizes times the exact IEEE
    powers of p, identical on both engines, floor-quantized at the
    end.  Join is probe-keyed; everything after the two ranking
    aggregates is |probes|-sized."""

    def ranked_list(df: DataFrame, name: str) -> DataFrame:
        arr = F.transform(
            F.array_sort(F.collect_list(F.struct("rank", "id2"))),
            lambda s: s["id2"],
        )
        return df.groupBy("id1").agg(arr.alias(name))

    a = ranked_list(exact, "ea")
    b = ranked_list(approx, "aa")
    j = a.join(b, "id1")
    chain = F.lit(0.0)
    for d in range(1, k + 1):
        ov = F.size(
            F.array_intersect(
                F.slice(F.col("ea"), 1, d), F.slice(F.col("aa"), 1, d)
            )
        )
        chain = chain + F.lit(float(p) ** (d - 1)) * (
            ov.cast("double") / F.lit(float(d))
        )
    rbo = chain * F.lit(1.0 - float(p))
    return j.select(
        F.col("id1").alias("probe_id"),
        F.floor(rbo * F.lit(1000000.0)).cast("bigint").alias("rbo_x1m"),
    )


def _rbo_oracle(k: int = 10, p: float = RBO_P) -> str:
    base = _duck_base(50)
    exact_ctes = _duck_topk_ctes()
    lsh = _duck_bits_cte()
    terms = []
    for d in range(1, k + 1):
        terms.append(
            f"{p ** (d - 1)!r} * (len(list_intersect(ea[1:{d}], aa[1:{d}]))::DOUBLE / {float(d)!r})"
        )
    chain = "(0.0 + " + " + ".join(terms) + f") * {1.0 - p!r}"
    return (
        base
        + exact_ctes
        + lsh
        + f"""
    , exact_lists AS (
      SELECT id1, list(id2 ORDER BY rank) AS ea
      FROM ranked WHERE rank <= {k} GROUP BY id1
    ), cand AS (
      SELECT DISTINCT pp.pid, pp.pv, c.vid, c.v
      FROM keyed c JOIN (
        SELECT kk.vid AS pid, kk.v AS pv, kk.bucket FROM keyed kk
        WHERE kk.vid % 50 = 0
      ) pp ON c.bucket = pp.bucket AND pp.pid <> c.vid
    ), lsh_scored AS (
      SELECT pid AS id1, vid AS id2, {duck_cosine('pv', 'v', DIM)} AS cos_raw
      FROM cand
    ), lsh_ranked AS (
      SELECT id1, id2,
             row_number() OVER (PARTITION BY id1 ORDER BY cos_raw DESC, id2) AS rank
      FROM lsh_scored
    ), lsh_lists AS (
      SELECT id1, list(id2 ORDER BY rank) AS aa
      FROM lsh_ranked WHERE rank <= {k} GROUP BY id1
    )
    SELECT e.id1 AS probe_id,
           floor(({chain}) * 1000000.0)::BIGINT AS rbo_x1m
    FROM exact_lists e JOIN lsh_lists l ON e.id1 = l.id1
    """
    )


@query("sim_rbo_lsh_vs_exact", oracle=_rbo_oracle())
def sim_rbo_lsh_vs_exact_q(spark, sf_dir):
    """RBO@10 (p=0.9) of the hyperplane-LSH ranking against the exact
    cosine ranking, per probe — the rank-aware ANN quality readout
    that set recall cannot give."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = cosine_topk_brute(emb, "vec_id", "embedding", probe_mod=50, k=10)
    approx = cosine_topk_lsh(emb, "vec_id", "embedding", probe_mod=50, k=10)
    return rbo_vs_exact(
        exact.select("id1", "id2", "rank"), approx.select("id1", "id2", "rank")
    )
