"""Deduplication operators (north-star Tier E; SURVEY.md §2 Tier E rows).

Five families, all designed for 100 TB operation:

- **exact**: hash-groupBy on content (two-phase hash agg, no sort).
- **MinHash + LSH**: word-shingle → H portable min-hashes → band-bucket →
  candidate pairs via equi-join on (band, hash) — the standard
  sub-quadratic near-dup pipeline.  Every step is JVM-side DataFrame ops
  (explode/transform/groupBy/join); no UDFs.
- **SimHash**: frequency-weighted bitwise fingerprint; near-dups have
  small Hamming distance.
- **n-gram Jaccard**: exact pairwise similarity via shingle explode +
  equi-join on shingle (inverted index join), intersection counts from
  groupBy — the verification stage after LSH candidates.
- **embedding cosine**: near-dup by vector similarity (see also
  operators/similarity.py).

Scale notes: the only quadratic surface is candidate-pair verification,
bounded by LSH bucket sizes; hot shingles (stop-phrases) are the skew
risk — mitigated by `max_shingle_freq` frequency capping, the standard
trick (drop shingles appearing in too many docs; they carry no signal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dask_obj_spark.operators.similarity import DIM as _SIM_DIM
from dask_obj_spark.operators.similarity import duck_cosine
from dask_obj_spark.functions.hashing import (
    duck_porthash,
    duck_word_shingles,
    porthash,
    word_shingles,
)
from dask_obj_spark.queries import query
from dask_obj_spark.sources import load_table

# -- exact dedup --------------------------------------------------------------


def exact_dedup(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact dedup: dropDuplicates on the given columns (hash-based)."""
    return df.dropDuplicates(cols) if cols else df.dropDuplicates()


def exact_dedup_groups(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Per-content groups: keeper id (min) + copy count; the 100 TB form
    hashes content first so the shuffle carries 8-byte keys, not payloads."""
    return (
        df.select(id_col, F.md5(F.col(content_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# -- MinHash ------------------------------------------------------------------


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 16, shingle_n: int = 4
) -> DataFrame:
    """Per-doc MinHash signature: sig[i] = min over shingles of hash_i.

    Shape: explode shingles to rows, evaluate the H hashes as TOP-LEVEL
    column expressions, then min-aggregate back per doc. Hash evaluation
    inside `F.transform` lambdas runs in Catalyst's interpreted mode
    (higher-order functions don't get whole-stage codegen) and measured
    ~30x slower; at row level the md5 chain is codegen'd. The groupBy is
    algebraic (min), so partial aggregation shrinks the shuffle to one
    row per (doc, partition)."""
    # one TINY shuffle of the raw doc rows by id up front: the hash
    # partitioning survives explode/project, so the shingle explode and
    # the 16 hash evaluations parallelize across all cores regardless of
    # input file layout, and the final groupBy(doc_id) needs NO second
    # exchange. Explicit partition count: this is a compute-bound stage,
    # AQE's size-based coalescing must not shrink it.
    ncores = df.sparkSession.sparkContext.defaultParallelism
    sh_rows = df.repartition(ncores, F.col(id_col)).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, shingle_n)).alias("shingle"),
    )
    hashed = sh_rows.select(
        "doc_id",
        *[porthash(F.col("shingle"), str(i)).alias(f"h{i}") for i in range(num_hashes)],
    )
    mins = hashed.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(num_hashes)]
    )
    return mins.select(
        "doc_id", F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_bands(sig_df: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """Explode a signature into (doc_id, band_id, band_hash): docs sharing
    any band land in the same bucket."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.array_join(
                        F.transform(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                        ",",
                    )
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return sig_df.select("doc_id", F.explode(pairs).alias("band")).select(
        "doc_id", "band.band_id", "band.band_hash"
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 4,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """LSH candidate pairs with estimated Jaccard (= fraction of equal
    signature components).  Join is equi on (band_id, band_hash) — a hash
    join whose cost is bucket-bounded, never all-pairs."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature(df, id_col, text_col, num_hashes, shingle_n).cache()
    bands_df = lsh_bands(sig, bands, rows_per_band)
    a, b = bands_df.alias("a"), bands_df.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .distinct()
    )
    sa, sb = sig.alias("sa"), sig.alias("sb")
    est = F.round(
        F.size(
            F.filter(
                F.zip_with(F.col("sa.sig"), F.col("sb.sig"), lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(num_hashes),
        6,
    )
    return (
        cand.join(sa, cand.id1 == F.col("sa.doc_id"))
        .join(sb, cand.id2 == F.col("sb.doc_id"))
        .select("id1", "id2", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= min_est_jaccard)
    )


# -- exact n-gram Jaccard -----------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 4,
    threshold: float = 0.6,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """Exact Jaccard over distinct word shingles via inverted-index join.

    |A∩B| from groupBy on joined shingles; |A∪B| = |A|+|B|−|A∩B|.
    ``max_shingle_freq`` drops stop-shingles (appear in > N docs) before
    the join — the skew guard that keeps this viable at scale."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, shingle_n)).alias("shingle"),
    ).distinct()
    if max_shingle_freq is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") > max_shingle_freq)
            .select("shingle")
        )
        # hot set is bounded by total_shingles/threshold — linear in the
        # corpus, NOT constant-bounded, so no broadcast hint: AQE picks
        # broadcast at demo scale, shuffled anti-join at 100 TB
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.round(
        F.col("n_common") / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")), 6
    )
    return (
        inter.join(sa, F.col("id1") == F.col("sa.doc_id"))
        .join(sb, F.col("id2") == F.col("sb.doc_id"))
        .select("id1", "id2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# -- SimHash ------------------------------------------------------------------

SIMHASH_BITS = 24


def simhash_fingerprint(df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS) -> DataFrame:
    """Frequency-weighted SimHash: per token occurrence, each fingerprint
    bit votes +1/−1 by the token-hash bit; majority sign sets the bit.

    Explode + single groupBy (partial+final agg); ``bits`` aggregate
    expressions are generated, all codegen'd."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).withColumn("h", porthash(F.col("tok"), "sim"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return votes.select("doc_id", fp.cast("bigint").alias("fingerprint"))


def simhash_near_pairs(fp_df: DataFrame, max_hamming: int = 3, bits: int = SIMHASH_BITS) -> DataFrame:
    """Near-dup pairs by Hamming distance over fingerprints, bucketed by
    fingerprint blocks: the fingerprint is split into ``max_hamming + 1``
    blocks, so a pair within distance ``max_hamming`` differs in at most
    ``max_hamming`` blocks and must share at least one block verbatim
    (pigeonhole) — COMPLETE recall without the full cross join.  Each
    doc lands in ``max_hamming + 1`` buckets; join cost is bucket-bounded.

    Degenerate case ``max_hamming >= bits``: no block split can help
    (a pair may differ in every block), so everything shares one bucket
    — the exact all-pairs semantics, at cross-join cost."""
    if max_hamming >= bits:
        keyed = fp_df.select("doc_id", "fingerprint", F.lit("all").alias("bucket"))
    else:
        n_blocks = max_hamming + 1
        base, rem = divmod(bits, n_blocks)
        widths = [base + 1] * rem + [base] * (n_blocks - rem)  # every block ≥ 1 bit
        keys, off = [], 0
        for i, w in enumerate(widths):
            keys.append(
                F.concat(
                    F.lit(f"b{i}_"),
                    F.shiftright(F.col("fingerprint"), off).bitwiseAND(F.lit(2**w - 1)),
                )
            )
            off += w
        keyed = fp_df.select(
            "doc_id", "fingerprint", F.explode(F.array(*keys)).alias("bucket")
        )
    a, b = keyed.alias("a"), keyed.alias("b")
    ham = F.bit_count(
        F.col("a.fingerprint").bitwiseXOR(F.col("b.fingerprint"))
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id1"),
            F.col("b.doc_id").alias("id2"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# -- embedding cosine near-dup ------------------------------------------------


def embedding_near_dups(
    df: DataFrame, id_col: str, vec_col: str, probe_mod: int, threshold: float
) -> DataFrame:
    """Cosine near-dups of probe vectors (id % probe_mod == 0) against the
    corpus: broadcast the small probe side, JVM fold for the dot product."""
    from dask_obj_spark.operators.similarity import dot_w, l2_norm_w

    # norms factored out before the pair join: identical subexpressions,
    # bit-identical results, 1 fold per pair instead of 3; r15: fixed-
    # width codegen'd kernels (similarity.dot notes), bit-identical
    base = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("vn", l2_norm_w("v", _SIM_DIM))
    probes = base.filter(F.col("vid") % probe_mod == 0).select(
        F.col("vid").alias("pid"), F.col("v").alias("pv"), F.col("vn").alias("pn")
    )
    pairs = base.join(F.broadcast(probes), F.col("pid") < F.col("vid"))
    sim = F.round(dot_w("pv", "v", _SIM_DIM) / (F.col("pn") * F.col("vn")), 6)
    return pairs.select(
        F.col("pid").alias("id1"), F.col("vid").alias("id2"), sim.alias("cosine")
    ).filter(F.col("cosine") >= threshold)


# ====================== oracle SQL builders (DuckDB) =========================


def _duck_sig_cte(num_hashes: int, shingle_n: int) -> str:
    sh = duck_word_shingles("text", shingle_n)
    mins = ", ".join(
        f"list_min(list_transform(sh, s -> {duck_porthash('s', str(i))})) AS m{i}"
        for i in range(num_hashes)
    )
    return f"""
    WITH shingled AS (
      SELECT doc_id, {sh} AS sh FROM documents
    ), sig AS (
      SELECT doc_id, {mins} FROM shingled
    )"""


def _duck_bands_select(num_hashes: int, bands: int) -> str:
    rows = num_hashes // bands
    parts = []
    for b in range(bands):
        cols = " || ',' || ".join(
            f"CAST(m{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        parts.append(f"SELECT doc_id, {b} AS band_id, md5({cols}) AS band_hash FROM sig")
    return " UNION ALL ".join(parts)


# ============================== queries ======================================


@query(
    "dedup_exact_groups",
    oracle="""
    SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id,
           count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact_groups_q(spark, sf_dir):
    """Exact dedup (BASELINE B6 first half)."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(docs, "doc_id", "text")


@query(
    "dedup_minhash_bands",
    oracle=_duck_sig_cte(16, 4) + _duck_bands_select(16, 4),
)
def dedup_minhash_bands_q(spark, sf_dir):
    """MinHash LSH banding table — the full signature pipeline is
    oracle-checked bit-for-bit via the portable md5-derived hash."""
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signature(docs, "doc_id", "text", 16, 4)
    return lsh_bands(sig, 4, 4)


def _duck_pairs_sql(
    num_hashes: int, bands: int, threshold: float, shingle_n: int = 4
) -> str:
    """sig CTE + bands + cand + the est_jaccard select — the complete
    minhash_candidate_pairs() computation as DuckDB SQL (shared with the
    connected-components oracle in operators/corpus.py).  ``shingle_n``
    is an explicit parameter: it was previously conflated with ``bands``
    (correct only while both happened to equal 4)."""
    est = (
        "round(("
        + " + ".join(f"CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END" for i in range(num_hashes))
        + f") / {num_hashes}.0, 6)"
    )
    return (
        _duck_sig_cte(num_hashes, shingle_n)
        + ", bands AS ("
        + _duck_bands_select(num_hashes, bands)
        + f"""
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ), pairs AS (
      SELECT id1, id2, {est} AS est_jaccard
      FROM cand JOIN sig sa ON cand.id1 = sa.doc_id
                JOIN sig sb ON cand.id2 = sb.doc_id
      WHERE {est} >= {threshold}
    )"""
    )


@query(
    "dedup_minhash_pairs",
    oracle=_duck_pairs_sql(16, 4, 0.5) + "\n    SELECT id1, id2, est_jaccard FROM pairs\n",
)
def dedup_minhash_pairs_q(spark, sf_dir):
    """MinHash-LSH near-dup candidate pairs (BASELINE B6 second half)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_candidate_pairs(docs, "doc_id", "text", 16, 4, 4, 0.5)


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id, unnest("""
    + duck_word_shingles("text", 4)
    + """) AS shingle
      FROM documents
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id1, id2,
           round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM inter JOIN sizes sa ON id1 = sa.doc_id
               JOIN sizes sb ON id2 = sb.doc_id
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.6
    """,
)
def dedup_ngram_jaccard_q(spark, sf_dir):
    """Exact n-gram Jaccard pairs ≥ 0.6 (verification-grade near-dup)."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", 4, 0.6, max_shingle_freq=None)


@query(
    "dedup_ngram_jaccard_capped",
    oracle="""
    WITH sh0 AS (
      SELECT DISTINCT doc_id, unnest("""
    + duck_word_shingles("text", 4)
    + """) AS shingle
      FROM documents
    ), hot AS (
      SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) > 2
    ), sh AS (
      SELECT doc_id, shingle FROM sh0 WHERE shingle NOT IN (SELECT shingle FROM hot)
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id1, id2,
           round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM inter JOIN sizes sa ON id1 = sa.doc_id
               JOIN sizes sb ON id2 = sb.doc_id
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.6
    """,
)
def dedup_ngram_jaccard_capped_q(spark, sf_dir):
    """Jaccard with the `max_shingle_freq` skew guard ON (stop-shingles
    appearing in > 2 docs dropped before the inverted-index join) — the
    guarded path is the one that runs at 100 TB, so it gets its own
    oracle row rather than inheriting the unguarded query's evidence."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", 4, 0.6, max_shingle_freq=2)


# fingerprint computation as a DuckDB CTE chain, shared by the fingerprint
# and near-pair oracles (ends with the `fp` relation: doc_id, fingerprint)
_DUCK_SIMHASH_FP = (
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
      FROM documents
    ), hashed AS (
      SELECT doc_id, """
    + duck_porthash("tok", "sim")
    + """ AS h FROM toks
    ), votes AS (
      SELECT doc_id, """
    + ", ".join(
        f"sum(((h >> {b}) & 1) * 2 - 1) AS v{b}" for b in range(SIMHASH_BITS)
    )
    + """ FROM hashed GROUP BY doc_id
    ), fp AS (
      SELECT doc_id, CAST("""
    + " + ".join(
        f"CASE WHEN v{b} > 0 THEN {2**b} ELSE 0 END" for b in range(SIMHASH_BITS)
    )
    + """ AS BIGINT) AS fingerprint FROM votes
    )"""
)


@query(
    "dedup_simhash",
    oracle=_DUCK_SIMHASH_FP + "\n    SELECT doc_id, fingerprint FROM fp\n",
)
def dedup_simhash_q(spark, sf_dir):
    """SimHash fingerprints, oracle-checked bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_fingerprint(docs, "doc_id", "text")


@query(
    "dedup_simhash_pairs",
    oracle=_DUCK_SIMHASH_FP
    + """
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           bit_count(xor(a.fingerprint, b.fingerprint)) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 3
    """,
)
def dedup_simhash_pairs_q(spark, sf_dir):
    """SimHash near-dup pairs (Hamming ≤ 3) via (max_hamming+1)-block
    pigeonhole buckets — complete recall, so the brute-force all-pairs
    SQL is an exact oracle; the bucketed join is the scale path."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_pairs(simhash_fingerprint(docs, "doc_id", "text"))


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH base AS (
      SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings
    ), probes AS (
      SELECT vid AS pid, v AS pv FROM base WHERE vid % 50 = 0
    )
    SELECT pid AS id1, vid AS id2,
           round(list_dot_product(pv, v) /
                 (sqrt(list_dot_product(pv, pv)) * sqrt(list_dot_product(v, v))), 6)
             AS cosine
    FROM base JOIN probes ON pid < vid
    WHERE round(list_dot_product(pv, v) /
                (sqrt(list_dot_product(pv, pv)) * sqrt(list_dot_product(v, v))), 6)
          >= 0.2
    """,
)
def dedup_embedding_cosine_q(spark, sf_dir):
    """Embedding-cosine near-dup: probe set × corpus with broadcast join."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dups(emb, "vec_id", "embedding", probe_mod=50, threshold=0.2)


# -- semantic dedup (SemDeDup-style) ------------------------------------------


def _semantic_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cell_mod: int,
    centroids: DataFrame | None,
) -> DataFrame:
    """The cell-assignment subplan of `semantic_dedup` /
    `semantic_contamination`: ``(vid, v, vn, cell)`` — corpus ×
    centroids scoring join + per-id argmax.  Split out (optimization
    r15) so the plan-shape lock
    (test_semantic_dedup_plan_broadcasts_centroids) can assert the
    assignment's broadcast/no-cartesian shape directly: in
    `semantic_dedup` this subplan is pinned behind a `localCheckpoint`,
    which truncates it out of the final query plan."""
    from dask_obj_spark.operators.similarity import dot_w, l2_norm_w

    # norms are computed ONCE per vector/centroid before the pair joins:
    # `dot/(‖a‖·‖b‖)` evaluates the identical sqrt-fold subexpressions,
    # so values (and the oracle hash) are bit-unchanged, but per-pair
    # interpreted work drops from 3 folds to 1 (same trick as
    # cosine_topk_brute; measured ~2.5× on this operator at sf0.1).
    # r15: fixed-width codegen'd kernels (similarity.dot notes) — the
    # unrolled chains are node-for-node the HOF folds, bit-identical
    base = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("vn", l2_norm_w("v", _SIM_DIM))
    if centroids is not None:
        # trained constant-k path (kmeans_fit output): bounded by k
        # regardless of corpus size — the broadcast HINT is safe
        cents = F.broadcast(
            centroids.select(
                F.col("cid"),
                F.col("cv").cast("array<double>").alias("cv"),
            ).withColumn("cn", l2_norm_w("cv", _SIM_DIM))
        )
    else:
        # modular oracle-replay set: N/cell_mod rows grows with the
        # corpus — no hard-coded broadcast hint (r7 verdict #4); the
        # planner/AQE decides from actual size stats
        cents = base.filter(F.col("vid") % cell_mod == 1).select(
            F.col("vid").alias("cid"), F.col("v").alias("cv"), F.col("vn").alias("cn")
        )
    aw = Window.partitionBy("vid").orderBy(F.desc("cs"), F.asc("cid"))
    cells = (
        base.join(cents)
        .select(
            "vid",
            "v",
            "vn",
            (dot_w("v", "cv", _SIM_DIM) / (F.col("vn") * F.col("cn"))).alias("cs"),
            "cid",
        )
        .withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") == 1)
        .select("vid", "v", "vn", F.col("cid").alias("cell"))
    )
    return cells


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    tau: float,
    cell_mod: int = 61,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column
    (Abbas et al. 2023 pattern): cluster the corpus into coarse cells,
    then within each cell drop every vector whose cosine similarity to a
    LOWER-id cell member is >= ``tau`` (greedy keep-lowest-id canonical,
    the same keeper rule as ``exact_dedup_groups``).

    The reference has no vector ops at all (SURVEY.md §2 Tier E;
    /root/reference/src/dask_obj/core.py:3-10 imports only
    dask/toolz/operator) — this is north-star surface built Spark-first.

    100 TB shape: identical to the IVF index (operators/similarity.py).
    The centroid table is tiny and broadcast; assignment is a broadcast
    nested-loop + per-id argmax with NO corpus shuffle; the only
    pairwise surface is the within-cell self-join — an equi-join on
    cell id, bounded by cell size, never all-pairs. In production cells
    come from `kmeans_fit` and the cell table is a standing bucketed
    dataset (`build_ann_index`); here centroids are deterministic
    (vid % cell_mod == 1) so the DuckDB oracle replays the exact index.
    Deletion rate is tuned by ``tau`` exactly as in the paper.
    """
    from dask_obj_spark.operators.similarity import dot_w

    cells = _semantic_cells(df, id_col, vec_col, cell_mod, centroids)
    if centroids is None:
        # materialize the modular cell assignment ONCE (optimization
        # r15, guide §3.3/§5): it is consumed FOUR times below (pair
        # join both sides + keep join + final projection), and each copy
        # embeds the corpus x centroids scoring join — re-executed per
        # copy and, with the r15 unrolled cosine kernels, expensive to
        # re-analyze per copy per job.  The trained constant-k path is
        # left un-pinned: its broadcast-hinted bounded-k assignment is
        # cheap to replay, and pinning would truncate the hint out of
        # the analyzed plan (pinned by
        # test_semantic_cell_broadcast_hint_is_conditional)
        cells = cells.localCheckpoint(eager=True)
    lower = cells.select(
        F.col("cell"),
        F.col("vid").alias("vid2"),
        F.col("v").alias("v2"),
        F.col("vn").alias("vn2"),
    )
    dropped = (
        cells.join(lower, "cell")
        .filter(F.col("vid2") < F.col("vid"))
        .filter(
            F.round(
                dot_w("v", "v2", _SIM_DIM) / (F.col("vn") * F.col("vn2")), 6
            )
            >= tau
        )
        .select("vid")
        .distinct()
        .withColumn("dropped", F.lit(True))
    )
    return (
        cells.join(dropped, "vid", "left")
        .select("vid", "cell", F.coalesce(~F.col("dropped"), F.lit(True)).alias("keep"))
    )


def _semantic_cells_ctes(tau: float, cell_mod: int, dim: int) -> str:
    """The WITH-chain (base → cents → assign → ranked → cells → dropped)
    replaying `semantic_dedup`'s deterministic cell index — shared by
    the dedup oracle and the capstone pipeline oracle in
    operators/corpus.py so the replay logic exists exactly once."""
    cos_assign = duck_cosine("b.v", "c.cv", dim)
    cos_pair = duck_cosine("a.v", "b.v", dim)
    return f"""
    WITH base AS (
      SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings
    ), cents AS (
      SELECT vid AS cid, v AS cv FROM base WHERE vid % {cell_mod} = 1
    ), assign AS (
      SELECT b.vid, b.v, c.cid, {cos_assign} AS cs FROM base b, cents c
    ), ranked AS (
      SELECT vid, v, cid,
             row_number() OVER (PARTITION BY vid ORDER BY cs DESC, cid) AS rn
      FROM assign
    ), cells AS (
      SELECT vid, v, cid AS cell FROM ranked WHERE rn = 1
    ), dropped AS (
      SELECT DISTINCT a.vid
      FROM cells a JOIN cells b ON a.cell = b.cell AND b.vid < a.vid
      WHERE round({cos_pair}, 6) >= {tau}
    )"""


def _semantic_dedup_oracle(tau: float, cell_mod: int, dim: int) -> str:
    return (
        _semantic_cells_ctes(tau, cell_mod, dim)
        + """
    SELECT c.vid, c.cell, d.vid IS NULL AS keep
    FROM cells c LEFT JOIN dropped d ON c.vid = d.vid
    """
    )


@query("dedup_semantic", oracle=_semantic_dedup_oracle(0.35, 61, _SIM_DIM))
def dedup_semantic_q(spark, sf_dir):
    """SemDeDup semantic dedup: coarse cells + within-cell greedy cosine
    prune (tau=0.35 against this corpus's cosine distribution), keeper =
    lowest id. Oracle replays the deterministic cell index exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, "vec_id", "embedding", tau=0.35)


# -- edit-distance fuzzy join (entity resolution) -----------------------------


def fuzzy_name_pairs(
    df: DataFrame, name_col: str, max_dist: int = 3
) -> DataFrame:
    """Token-blocked edit-distance self-join — the entity-resolution
    primitive (catalog/name dedup: 'cold anvil' ≈ 'old anvil').

    Blocking: candidates must share at least one whitespace token
    (explode tokens → equi-join on the token → distinct pairs), which
    turns the quadratic all-pairs into bucket-bounded equi-join work —
    the same inverted-index shape as `ngram_jaccard_pairs`, so at
    100 TB a stop-token frequency cap bounds the hottest buckets.  The
    verifier is a single codegen `levenshtein` per candidate.  The
    blocking is part of the operator's contract (a pair sharing no
    token is never compared), and the oracle replays block + verify
    identically."""
    names = df.select(F.col(name_col).alias("n")).distinct()
    toks = names.select("n", F.explode(F.split("n", " ")).alias("w"))
    cand = (
        toks.alias("a")
        .join(toks.alias("b"), "w")
        .filter(F.col("a.n") < F.col("b.n"))
        .select(F.col("a.n").alias("n1"), F.col("b.n").alias("n2"))
        .distinct()
    )
    return cand.select(
        "n1", "n2", F.levenshtein("n1", "n2").alias("dist")
    ).filter(F.col("dist") <= max_dist)


@query(
    "dedup_fuzzy_names",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name AS n FROM part),
    toks AS (SELECT n, unnest(string_split(n, ' ')) AS w FROM names),
    cand AS (
      SELECT DISTINCT a.n AS n1, b.n AS n2
      FROM toks a JOIN toks b ON a.w = b.w AND a.n < b.n
    )
    SELECT n1, n2, levenshtein(n1, n2) AS dist FROM cand
    WHERE levenshtein(n1, n2) <= 3
    """,
)
def dedup_fuzzy_names_q(spark, sf_dir):
    """Token-blocked levenshtein<=3 pairs over distinct part names."""
    return fuzzy_name_pairs(load_table(spark, sf_dir, "part"), "p_name", 3)


# -- prefix-filtered set-similarity join (PPJoin-style) -----------------------


def prefix_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, tau: float = 0.7
) -> DataFrame:
    """Set-similarity self-join with PREFIX FILTERING (the PPJoin family,
    Xiao et al. 2008): a pair can reach Jaccard ≥ τ only if the two
    token sets share a token among each side's (|s| - ⌈τ·|s|⌉ + 1)
    RAREST tokens.  Blocking on that prefix instead of all tokens is
    the 100 TB answer to stop-token buckets: 'the' is never a prefix
    token for any reasonable τ, so the hottest inverted-index lists
    simply drop out of candidate generation (where plain token blocking
    — `fuzzy_name_pairs` — or shingle inverting needs an explicit
    frequency cap).

    Plan: global token document-frequencies → per-doc rarity ranking
    (one doc_id window) → prefix-token equi-join for candidates →
    exact Jaccard verification via one shared-token groupBy.  The
    document-frequency lookup is a PLAIN equi-join on the token: the
    vocabulary grows with the corpus (Heaps' law — billions of terms
    at 100 TB), so it must never carry a broadcast hint; AQE still
    broadcasts it at demo scale on its own.  Verification is
    candidate-bounded; the prefix guarantees no true pair is lost
    (sound, not heuristic)."""
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode_outer(F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))).alias("w"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    dfreq = toks.groupBy("w").agg(F.count(F.lit(1)).alias("dfw"))
    ranked = (
        toks.join(dfreq, "w")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("id").orderBy("dfw", "w")
            ),
        )
        .join(sizes, "id")
    )
    prefix = ranked.filter(
        F.col("rk") <= F.col("sz") - F.ceil(F.lit(tau) * F.col("sz")) + 1
    ).select("id", "w")
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "w")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )
    inter = (
        cand.join(toks.select(F.col("id").alias("id1"), "w"), "id1")
        .join(toks.select(F.col("id").alias("id2"), F.col("w").alias("w2")), "id2")
        .filter(F.col("w") == F.col("w2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz1 = sizes.select(F.col("id").alias("id1"), F.col("sz").alias("sz1"))
    sz2 = sizes.select(F.col("id").alias("id2"), F.col("sz").alias("sz2"))
    jac = F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter"))
    return (
        inter.join(sz1, "id1")
        .join(sz2, "id2")
        .select("id1", "id2", F.round(jac, 6).alias("jaccard"))
        .filter(F.round(jac, 6) >= tau)
    )


@query(
    "dedup_prefix_jaccard",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT doc_id AS id,
             unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS w
      FROM documents
    ), sizes AS (
      SELECT id, count(*) AS sz FROM toks GROUP BY id
    ), dfreq AS (
      SELECT w, count(*) AS dfw FROM toks GROUP BY w
    ), ranked AS (
      SELECT t.id, t.w, s.sz,
             row_number() OVER (PARTITION BY t.id ORDER BY d.dfw, t.w) AS rk
      FROM toks t JOIN dfreq d ON d.w = t.w JOIN sizes s ON s.id = t.id
    ), prefix AS (
      SELECT id, w FROM ranked WHERE rk <= sz - ceil(0.7 * sz) + 1
    ), cand AS (
      SELECT DISTINCT a.id AS id1, b.id AS id2
      FROM prefix a JOIN prefix b ON a.w = b.w AND a.id < b.id
    ), inter AS (
      SELECT c.id1, c.id2, count(*) AS i
      FROM cand c
      JOIN toks ta ON ta.id = c.id1
      JOIN toks tb ON tb.id = c.id2 AND tb.w = ta.w
      GROUP BY c.id1, c.id2
    )
    SELECT i.id1, i.id2,
           round(i.i / (s1.sz + s2.sz - i.i), 6) AS jaccard
    FROM inter i
    JOIN sizes s1 ON s1.id = i.id1
    JOIN sizes s2 ON s2.id = i.id2
    WHERE round(i.i / (s1.sz + s2.sz - i.i), 6) >= 0.7
    """,
)
def dedup_prefix_jaccard_q(spark, sf_dir):
    """PPJoin-style prefix-filtered Jaccard >= 0.7 pairs over document
    token sets (sound candidate pruning, no frequency-cap heuristic)."""
    return prefix_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", 0.7
    )


# -- sorted-neighborhood blocking ---------------------------------------------

_SN_KEY_LEN = 24  # canonical sort-key prefix length
_SN_BLOCK_LEN = 4  # coarse block = first chars of the key
_SN_WINDOW = 2  # neighbors paired with each record (w-1 of classic SN w=3)


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 4,
    min_jaccard: float = 0.2,
) -> DataFrame:
    """Sorted-neighborhood near-dup pairs: canonical sort key → order →
    pair each record with its next `_SN_WINDOW` neighbors → exact
    shingle-Jaccard verification.

    The classic single-machine method sorts the whole dataset and slides
    one window; the distributed adaptation BLOCKS on a coarse key prefix
    and runs the neighbor window inside each block, which is exactly how
    SN is sharded in practice: candidate generation is a per-block
    window function (no global sort, no single-partition window), at the
    documented cost of missing pairs that straddle a block boundary —
    the standard SN recall trade, bounded by (window size / block size).
    Complement to LSH banding (dedup_minhash_*): SN catches near-dups
    whose similarity is PREFIX-concentrated (mutated tails) with one
    cheap pass and zero hashing.

    Plan at 100 TB: the key/block derivation is codegen'd string algebra
    on the scan; the window shuffles once on the block key; candidate
    pairs are O(rows · window); verification joins the candidate list
    against the distinct-shingle inverted index twice (equi-joins on
    (id, shingle)) — never an all-pairs surface."""
    key = F.substring(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "),
        1,
        _SN_KEY_LEN,
    )
    keyed = df.select(
        F.col(id_col).alias("doc_id"),
        key.alias("sn_key"),
    ).withColumn("block", F.substring("sn_key", 1, _SN_BLOCK_LEN))
    w = Window.partitionBy("block").orderBy("sn_key", "doc_id")
    nbrs = keyed.select(
        "doc_id",
        *[
            F.lead("doc_id", i).over(w).alias(f"n{i}")
            for i in range(1, _SN_WINDOW + 1)
        ],
    )
    cand = (
        nbrs.select(
            "doc_id",
            F.explode(F.array(*[F.col(f"n{i}") for i in range(1, _SN_WINDOW + 1)])).alias(
                "nbr"
            ),
        )
        .filter(F.col("nbr").isNotNull())
        .select(
            F.least("doc_id", "nbr").alias("id1"),
            F.greatest("doc_id", "nbr").alias("id2"),
        )
        .distinct()
    )
    # the shingle posting table has THREE consumers (sizes + both
    # verify legs): materialize it once instead of re-running the
    # explode per consumer — at scale this is the standing inverted
    # index every near-dup verifier probes anyway.  fan_out: the
    # shingle explode is the row's hottest stage (r15 probe: 3.2 s on
    # ONE task, pinned by the single-file scan split) — scale-adaptive,
    # a no-op once the scan has a split per core
    from dask_obj_spark.sources.tables import fan_out

    sh = fan_out(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, shingle_n)).alias("shingle"),
    ).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        cand.join(sh.alias("a"), F.col("id1") == F.col("a.doc_id"))
        .select("id1", "id2", F.col("a.shingle").alias("sh1"))
        .join(
            sh.alias("b"),
            (F.col("id2") == F.col("b.doc_id"))
            & (F.col("sh1") == F.col("b.shingle")),
        )
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id1"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id2"), F.col("n_sh").alias("nb"))
    jac = F.round(
        F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6
    )
    # sizes are PER-DOC (corpus-sized): plain equi-joins — AQE
    # broadcasts them at demo scale, shuffles at 100 TB (no forced hint)
    return (
        inter.join(sa, "id1")
        .join(sb, "id2")
        .select("id1", "id2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= min_jaccard)
    )


@query(
    "dedup_sorted_neighborhood",
    oracle="""
    WITH keyed AS (
      SELECT doc_id,
             substr(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                    1, """ + str(_SN_KEY_LEN) + """) AS sn_key
      FROM documents
    ), blocked AS (
      SELECT doc_id, sn_key, substr(sn_key, 1, """ + str(_SN_BLOCK_LEN) + """) AS block
      FROM keyed
    ), nbrs AS (
      SELECT doc_id,
             lead(doc_id, 1) OVER (PARTITION BY block ORDER BY sn_key, doc_id) AS n1,
             lead(doc_id, 2) OVER (PARTITION BY block ORDER BY sn_key, doc_id) AS n2
      FROM blocked
    ), cand0 AS (
      SELECT doc_id, n1 AS nbr FROM nbrs WHERE n1 IS NOT NULL
      UNION ALL
      SELECT doc_id, n2 AS nbr FROM nbrs WHERE n2 IS NOT NULL
    ), cand AS (
      SELECT DISTINCT least(doc_id, nbr) AS id1, greatest(doc_id, nbr) AS id2
      FROM cand0
    ), sh AS (
      SELECT DISTINCT doc_id, unnest("""
    + duck_word_shingles("text", 4)
    + """) AS shingle
      FROM documents
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT c.id1, c.id2, count(*) AS n_common
      FROM cand c
        JOIN sh a ON a.doc_id = c.id1
        JOIN sh b ON b.doc_id = c.id2 AND b.shingle = a.shingle
      GROUP BY c.id1, c.id2
    )
    SELECT id1, id2,
           round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM inter JOIN sizes sa ON id1 = sa.doc_id
               JOIN sizes sb ON id2 = sb.doc_id
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.2
    """,
)
def dedup_sorted_neighborhood_q(spark, sf_dir):
    """Sorted-neighborhood candidate pairs (block on 4-char key prefix,
    window 2) verified by exact 4-shingle Jaccard ≥ 0.2."""
    docs = load_table(spark, sf_dir, "documents")
    return sorted_neighborhood_pairs(docs, "doc_id", "text", 4, 0.2)


# -- estimator-error evaluation -----------------------------------------------


def minhash_estimate_error(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 4,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """Measured estimator error of the MinHash signature: for every LSH
    candidate pair, the signature-agreement estimate next to the EXACT
    shingle Jaccard and their absolute gap — the "measure, don't guess"
    evidence row for choosing the signature width (16 hashes →
    std ≈ sqrt(J(1-J)/16) ≈ 0.12 at J=0.5; the measured errors should
    sit inside that envelope).

    Plan: the candidate set comes from the banded equi-join
    (sub-quadratic, `minhash_candidate_pairs`); exact Jaccard touches
    only those pairs via two equi-joins against the distinct-shingle
    inverted index — the verification surface stays
    O(candidates · shingles/doc), never all-pairs."""
    pairs = minhash_candidate_pairs(
        df, id_col, text_col, num_hashes, bands, shingle_n, min_est_jaccard
    )
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, shingle_n)).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        pairs.select("id1", "id2")
        .join(sh.alias("a"), F.col("id1") == F.col("a.doc_id"))
        .select("id1", "id2", F.col("a.shingle").alias("sh1"))
        .join(
            sh.alias("b"),
            (F.col("id2") == F.col("b.doc_id"))
            & (F.col("sh1") == F.col("b.shingle")),
        )
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id1"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id2"), F.col("n_sh").alias("nb"))
    exact = F.round(
        F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6
    )
    # per-doc sizes: plain joins (AQE decides; corpus-sized at 100 TB)
    return (
        pairs.join(inter, ["id1", "id2"], "left")
        .join(sa, "id1")
        .join(sb, "id2")
        .select(
            "id1",
            "id2",
            "est_jaccard",
            F.coalesce(exact, F.lit(0.0)).alias("exact_jaccard"),
            F.round(
                F.abs(F.col("est_jaccard") - F.coalesce(exact, F.lit(0.0))), 6
            ).alias("abs_err"),
        )
    )


@query(
    "dedup_minhash_est_error",
    oracle=_duck_pairs_sql(16, 4, 0.5)
    + """
    , sh AS (
      SELECT DISTINCT doc_id, unnest("""
    + duck_word_shingles("text", 4)
    + """) AS shingle
      FROM documents
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT p.id1, p.id2, count(*) AS n_common
      FROM pairs p
        JOIN sh a ON a.doc_id = p.id1
        JOIN sh b ON b.doc_id = p.id2 AND b.shingle = a.shingle
      GROUP BY p.id1, p.id2
    ), ex AS (
      SELECT p.id1, p.id2, p.est_jaccard,
             coalesce(round(i.n_common / (sa.n_sh + sb.n_sh - i.n_common), 6), 0.0)
               AS exact_jaccard
      FROM pairs p
        LEFT JOIN inter i ON i.id1 = p.id1 AND i.id2 = p.id2
        JOIN sizes sa ON p.id1 = sa.doc_id
        JOIN sizes sb ON p.id2 = sb.doc_id
    )
    SELECT id1, id2, est_jaccard, exact_jaccard,
           round(abs(est_jaccard - exact_jaccard), 6) AS abs_err
    FROM ex
    """,
)
def dedup_minhash_est_error_q(spark, sf_dir):
    """Signature-estimate vs exact Jaccard on every LSH candidate pair
    (16 hashes, 4 bands, est >= 0.5) with the absolute error."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_estimate_error(docs, "doc_id", "text", 16, 4, 4, 0.5)


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 4,
    threshold: float = 0.5,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """ASYMMETRIC containment C(A→B) = |A∩B| / |A|: catches a document
    embedded inside a larger one (quote pages, aggregators, boilerplate
    wrappers) that symmetric Jaccard dilutes below threshold — the
    standard second screen next to `ngram_jaccard_pairs`.

    Same inverted-index join as Jaccard (sub-quadratic, hot-shingle
    capped); each unordered pair emits up to two directed rows (A→B and
    B→A) since containment is directional."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, shingle_n)).alias("shingle"),
    ).distinct()
    if max_shingle_freq is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") > max_shingle_freq)
            .select("shingle")
        )
        # hot set is bounded by total_shingles/threshold — linear in the
        # corpus, NOT constant-bounded, so no broadcast hint: AQE picks
        # broadcast at demo scale, shuffled anti-join at 100 TB
        sh = sh.join(hot, "shingle", "left_anti")
    sh = sh.localCheckpoint(eager=True)  # sizes + both join legs
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_from"), F.col("b.doc_id").alias("id_to")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_from"), F.col("n_sh").alias("na"))
    cont = F.round(F.col("n_common") / F.col("na"), 6)
    # per-doc sizes: plain join (AQE decides; corpus-sized at 100 TB)
    return (
        inter.join(sa, "id_from")
        .select("id_from", "id_to", cont.alias("containment"))
        .filter(F.col("containment") >= threshold)
    )


@query(
    "dedup_containment_pairs",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id, unnest("""
    + duck_word_shingles("text", 4)
    + """) AS shingle
      FROM documents
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_from, b.doc_id AS id_to, count(*) AS n_common
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_from, id_to,
           round(n_common / sa.n_sh, 6) AS containment
    FROM inter JOIN sizes sa ON id_from = sa.doc_id
    WHERE round(n_common / sa.n_sh, 6) >= 0.5
    """,
)
def dedup_containment_pairs_q(spark, sf_dir):
    """Directed shingle-containment pairs >= 0.5 (doc-inside-doc
    screen; each direction scored separately)."""
    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(docs, "doc_id", "text", 4, 0.5, max_shingle_freq=None)


@query(
    "dedup_lsh_precision_recall",
    oracle=_duck_pairs_sql(16, 4, 0.0)
    + """
    , sh AS (
      SELECT DISTINCT doc_id, unnest("""
    + duck_word_shingles("text", 4)
    + """) AS shingle
      FROM documents
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), truth AS (
      SELECT id1, id2
      FROM inter JOIN sizes sa ON id1 = sa.doc_id
                 JOIN sizes sb ON id2 = sb.doc_id
      WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.6
    ), cand_set AS (
      SELECT DISTINCT id1, id2 FROM pairs
    ), hits AS (
      SELECT count(*) AS n FROM cand_set c
      WHERE EXISTS (SELECT 1 FROM truth t WHERE t.id1 = c.id1 AND t.id2 = c.id2)
    )
    SELECT (SELECT count(*) FROM cand_set)::BIGINT AS n_candidates,
           (SELECT count(*) FROM truth)::BIGINT AS n_truth,
           (SELECT n FROM hits)::BIGINT AS n_hits,
           round((SELECT n FROM hits) * 1.0
                 / greatest((SELECT count(*) FROM cand_set), 1), 6) AS precision,
           round((SELECT n FROM hits) * 1.0
                 / greatest((SELECT count(*) FROM truth), 1), 6) AS recall
    """,
)
def dedup_lsh_precision_recall_q(spark, sf_dir):
    """Set-level quality of the LSH banding stage: precision and recall
    of the candidate pairs (16 hashes / 4 bands, no estimate floor)
    against exact-Jaccard >= 0.6 ground truth — the companion evidence
    row to dedup_minhash_est_error (which scores the ESTIMATOR; this
    scores the BUCKETING).  At 100 TB this query runs on a sample to
    tune bands/rows before the full sweep — the shape is identical."""
    docs = load_table(spark, sf_dir, "documents")
    cand = minhash_candidate_pairs(
        docs, "doc_id", "text", 16, 4, 4, 0.0
    ).select("id1", "id2").distinct()
    truth = ngram_jaccard_pairs(
        docs, "doc_id", "text", 4, 0.6, max_shingle_freq=None
    ).select("id1", "id2")
    cand = cand.localCheckpoint(eager=True)
    truth = truth.localCheckpoint(eager=True)
    hits = cand.join(truth, ["id1", "id2"], "left_semi")
    n_cand = cand.count()
    n_truth = truth.count()
    n_hits = hits.count()
    return docs.sparkSession.createDataFrame(
        [(n_cand, n_truth, n_hits,
          round(n_hits / max(n_cand, 1), 6),
          round(n_hits / max(n_truth, 1), 6))],
        "n_candidates long, n_truth long, n_hits long, precision double, recall double",
    )


@query(
    "er_canonical_entities",
    oracle="""
    WITH RECURSIVE names AS (
      SELECT DISTINCT p_name AS n FROM part
    ), toks AS (
      SELECT n, unnest(string_split(n, ' ')) AS w FROM names
    ), cand AS (
      SELECT DISTINCT a.n AS n1, b.n AS n2
      FROM toks a JOIN toks b ON a.w = b.w AND a.n < b.n
    ), prs AS (
      SELECT n1, n2 FROM cand WHERE levenshtein(n1, n2) <= 3
    ), ed AS (
      SELECT n1 AS s, n2 AS d FROM prs UNION ALL SELECT n2, n1 FROM prs
    ), reach AS (
      SELECT s AS id, s AS lbl FROM ed
      UNION
      SELECT e.d AS id, r.lbl
      FROM reach r JOIN ed e ON e.s = r.id
      WHERE r.lbl < e.d
    ), comp AS (
      SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id
    ), er AS (
      SELECT nm.n AS name, coalesce(c.cluster_id, nm.n) AS entity_id
      FROM names nm LEFT JOIN comp c ON c.id = nm.n
    ), sizes AS (
      SELECT entity_id, count(*) AS n_variants FROM er GROUP BY entity_id
    )
    SELECT e.name, e.entity_id,
           CAST(e.name = e.entity_id AS INT) AS is_canonical,
           CAST(s.n_variants AS BIGINT) AS n_variants
    FROM er e JOIN sizes s ON s.entity_id = e.entity_id
    """,
)
def er_canonical_entities_q(spark, sf_dir):
    """Entity resolution end-to-end: token-blocked edit-distance pairs
    (`fuzzy_name_pairs`) → connected components (large-star/small-star)
    → canonical entity per cluster (lexicographic min name) with variant
    counts — the catalog-dedup capstone a reference user runs as ONE
    operator (match → cluster → survivorship).

    The min-label semantics work unchanged on string vertex ids (min is
    lexicographic); singleton names never enter the edge list and pass
    through as their own entity.  Scale: blocking bounds candidate
    generation, components converge in O(log n) rounds, survivorship is
    one dimension-sized aggregate — the oracle replays match + cluster
    via a pruned recursive CTE (labels only propagate downhill, so the
    recursion carries O(V·avg-labels) rows, and min() collapses it)."""
    # local import: corpus.py imports from this module at top level
    from dask_obj_spark.operators.corpus import connected_components

    part = load_table(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("name")).distinct()
    pairs = fuzzy_name_pairs(part, "p_name", 3)
    comp = connected_components(pairs, "n1", "n2")
    er = names.join(
        comp.select(F.col("id").alias("name"), "cluster_id"), "name", "left"
    ).select(
        "name", F.coalesce("cluster_id", "name").alias("entity_id")
    )
    sizes = er.groupBy("entity_id").agg(F.count(F.lit(1)).alias("n_variants"))
    return er.join(F.broadcast(sizes), "entity_id").select(
        "name",
        "entity_id",
        (F.col("name") == F.col("entity_id")).cast("int").alias("is_canonical"),
        F.col("n_variants").cast("bigint").alias("n_variants"),
    )


@query(
    "dedup_corpus_report",
    oracle=_duck_pairs_sql(16, 4, 0.5)
    + """
    , basic AS (
      SELECT count(*) AS n_docs,
             count(DISTINCT md5(text)) AS n_unique_texts
      FROM documents
    ), pairstats AS (
      SELECT count(*) AS n_near_pairs FROM pairs
    ), involved AS (
      SELECT count(DISTINCT id) AS n_docs_in_near_pairs FROM (
        SELECT id1 AS id FROM pairs UNION SELECT id2 FROM pairs
      )
    )
    SELECT CAST(b.n_docs AS BIGINT) AS n_docs,
           CAST(b.n_unique_texts AS BIGINT) AS n_unique_texts,
           CAST(b.n_docs - b.n_unique_texts AS BIGINT) AS n_exact_extra,
           round(b.n_unique_texts * 1.0 / b.n_docs, 6) AS exact_unique_rate,
           CAST(p.n_near_pairs AS BIGINT) AS n_near_pairs,
           CAST(i.n_docs_in_near_pairs AS BIGINT) AS n_docs_in_near_pairs
    FROM basic b CROSS JOIN pairstats p CROSS JOIN involved i
    """,
)
def dedup_corpus_report_q(spark, sf_dir):
    """One-row dedup health report: corpus size, exact-unique count and
    rate, MinHash-LSH near-dup pair count and the number of documents
    involved — the summary a pipeline owner reads before deciding
    whether a full dedup pass is worth the compute.

    Plan: exact stats are one two-aggregate scan on hashed content; the
    near-dup leg is the standard banded pipeline; all three single-row
    legs cross-join at the end.  At 100 TB the report costs one corpus
    scan plus the (sub-quadratic) LSH candidate generation — this is
    the cheap census you run on a SAMPLE first (identical shape)."""
    docs = load_table(spark, sf_dir, "documents")
    basic = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
    )
    pairs = minhash_candidate_pairs(docs, "doc_id", "text", 16, 4, 4, 0.5)
    pairs = pairs.localCheckpoint(eager=True)  # two consumers below
    pairstats = pairs.agg(F.count(F.lit(1)).alias("n_near_pairs"))
    involved = (
        pairs.select(F.col("id1").alias("id"))
        .union(pairs.select("id2"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_docs_in_near_pairs"))
    )
    return (
        basic.crossJoin(F.broadcast(pairstats))
        .crossJoin(F.broadcast(involved))
        .select(
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_unique_texts").cast("bigint").alias("n_unique_texts"),
            (F.col("n_docs") - F.col("n_unique_texts")).cast("bigint").alias(
                "n_exact_extra"
            ),
            F.round(F.col("n_unique_texts") / F.col("n_docs"), 6).alias(
                "exact_unique_rate"
            ),
            F.col("n_near_pairs").cast("bigint").alias("n_near_pairs"),
            F.col("n_docs_in_near_pairs").cast("bigint").alias(
                "n_docs_in_near_pairs"
            ),
        )
    )
