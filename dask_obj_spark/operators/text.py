"""Text-analysis operators over the ``documents`` table (north-star Tier
E; absent in the reference — `/root/reference/src/dask_obj/core.py:3-10`
imports only dask/toolz/operator, no text code).

All operators are pure DataFrame expressions (split/filter/transform/
aggregate higher-order functions + groupBy) — no Python UDFs, so the hot
path stays inside whole-stage codegen and scales linearly with executors:

- **token counting**: whitespace tokens and a BPE-ish regex pre-tokenizer
  (letter runs / digit runs / single punctuation — the GPT-2-style split
  minus byte-level merges, which need a learned vocab).
- **quality scoring**: length, punctuation/alpha/stopword ratios, mean
  token length — the standard cheap pre-filters of LLM data pipelines.
- **language ID**: per-language stopword-profile hit counts → argmax
  (regexp_count per profile + array_max struct argmax — zero-shuffle,
  codegen). An n-gram heuristic, not a model: the point is the
  distributed shape (literal profiles in-plan, scoring at scan
  bandwidth).
- **tf-idf**: classic explode → per-(doc,term) tf → per-term df → join →
  score; top-k terms per doc via window.
- **winnowing fingerprints**: char k-gram rolling hashes, min per
  sliding window of w hashes (Schleimer et al. MOSS scheme) — the
  document-fingerprinting primitive for plagiarism/copy detection.

Scale notes: token explode multiplies rows by ~doc length — aggregate
immediately after (tf groupBy) so the shuffle carries (doc, term, n)
triples, never raw tokens; stopword/profile lookups are broadcast-map
lookups via `array_contains` on literal arrays; winnowing emits O(len/w)
fingerprints per doc. The only wide ops are groupBys on already-reduced
keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dask_obj_spark.functions.hashing import (
    duck_porthash,
    duck_word_shingles,
    porthash,
    word_shingles,
)
from dask_obj_spark.queries import query
from dask_obj_spark.sources import load_table

# Shared stopword profiles (tiny on purpose: they ride inside the plan as
# literal arrays — at 100 TB these become a broadcast dict, same plan shape).
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "mit", "von", "big", "merge"],
    "en": ["the", "and", "of", "to", "in", "is", "order", "table", "group"],
    "es": ["el", "la", "de", "que", "los", "por", "slow", "agg", "vector"],
    "fr": ["le", "la", "et", "les", "des", "une", "scan", "data", "small"],
    "zh": ["de", "shi", "zai", "le", "he", "you", "join", "customer", "row"],
}

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "for", "on"]

BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def ws_tokens(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.split(F.trim(c), r"\s+")


def bpe_tokens(c: Column | str) -> Column:
    """BPE-style pre-tokenization: letter runs, digit runs, single
    punctuation marks (regexp_extract_all — one JVM pass)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0)


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    t = F.col(text_col)
    return df.select(
        id_col,
        F.size(ws_tokens(t)).alias("n_ws_tokens"),
        F.size(bpe_tokens(t)).alias("n_bpe_tokens"),
        F.length(t).alias("n_chars_exact"),
    )


def quality_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Cheap quality signals; `quality` is a fixed linear combination so
    downstream filters are a single pushdown-able predicate.

    ``keep_cols`` passes extra columns through the projection so
    consumers that need (quality, facet) pairs get them in ONE corpus
    scan instead of re-joining on the id (a corpus-sized shuffle)."""
    t = F.col(text_col)
    toks = ws_tokens(t)
    n_tok = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda w: F.array_contains(F.array(*[F.lit(s) for s in STOPWORDS]), F.lower(w))))
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    punct = F.length(F.regexp_replace(t, "[a-zA-Z0-9\\s]", ""))
    total = F.length(t)
    mean_tok = total / n_tok
    stop_ratio = stop_hits / n_tok
    alpha_ratio = alpha / total
    punct_ratio = punct / total
    quality = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * stop_ratio
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0)))
    )
    return df.select(
        id_col,
        *(keep_cols or []),
        n_tok.alias("n_tokens"),
        F.round(mean_tok, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def _lang_pattern(markers: list[str]) -> str:
    return r"\b(" + "|".join(markers) + r")\b"


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Predict language by stopword-profile hit count (argmax, ties →
    lexicographically first language).

    Scoring is `regexp_count` of a word-boundary alternation per
    language — whole-stage-codegen JVM regex over the raw string, no
    interpreted higher-order filter, no explode.  The argmax is
    `array_max` over (score, -rank, lang) structs (max score, then
    lowest-ranked = lexicographically first language), so the whole
    operator is a zero-shuffle narrow map — at 100 TB it runs at scan
    bandwidth.  Boundary semantics: a marker adjacent to punctuation
    counts as a hit (``\\b`` boundary), where the token-membership form
    would not; markers are pure word characters so the two agree on
    whitespace-tokenized text (verified corpus-wide in the A/B)."""
    lowered = F.lower(F.col(text_col))
    structs = [
        F.struct(
            F.regexp_count(lowered, F.lit(_lang_pattern(markers))).alias("score"),
            F.lit(-i).alias("nr"),
            F.lit(lang).alias("lang"),
        )
        for i, (lang, markers) in enumerate(sorted(LANG_PROFILES.items()))
    ]
    best = F.array_max(F.array(*structs))
    return df.select(
        id_col,
        best.getField("lang").alias("pred_lang"),
        best.getField("score").alias("score"),
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k terms per document by tf·idf (idf = ln(N/df), ties → term
    asc). Tokens are reduced to (doc, term, tf) immediately after the
    explode, so the shuffle never carries raw token streams."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.transform(ws_tokens(text_col), lambda w: F.lower(w))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.count()  # scalar, folded into the plan as a literal
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_"))
    scored = tf.join(doc_freq, "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_")), 6).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tfidf", "rank")
    )


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, kgram: int = 8, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints: hash every char k-gram, keep the
    min hash of each sliding window of `window` consecutive hashes,
    dedupe. Guarantees any shared substring ≥ kgram+window-1 chars
    produces a shared fingerprint.

    Shape: explode k-grams to rows (cheap string lambda), hash at row
    level (codegen'd), then a sliding `min` window over gram position.
    The original all-array form (`array_min(slice(hashes, i, w))` inside
    `F.transform`) is O(n*w) interpreted-mode allocations per doc —
    measured ~30x slower at sf0.1. The window shuffle on doc_id also
    provides the compute parallelism regardless of input file layout."""
    t = F.col(text_col)
    n_grams = F.greatest(F.length(t) - kgram + 1, F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams), lambda i: F.substring(t, i, kgram)
    )
    # one TINY shuffle of the raw doc rows by id up front: the hash
    # partitioning survives explode/project, so gram explode + hashing
    # parallelize across all cores, and the window's required
    # distribution on doc_id is already satisfied (sort only, no second
    # exchange). Explicit count: compute-bound stage, AQE's size-based
    # coalescing must not shrink it.
    ncores = df.sparkSession.sparkContext.defaultParallelism
    exploded = df.repartition(ncores, F.col(id_col)).select(
        F.col(id_col).alias("doc_id"),
        n_grams.alias("n_grams"),
        F.posexplode(grams).alias("pos", "gram"),
    )
    hashed = exploded.select(
        "doc_id", "n_grams", "pos", porthash(F.col("gram"), "fp").alias("h")
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    # only full windows start at pos ≤ n_grams - window (0-based); short
    # docs (n_grams < window) keep their single partial window at pos 0
    return (
        hashed.withColumn("fp", F.min("h").over(w))
        .filter(F.col("pos") <= F.greatest(F.col("n_grams") - window, F.lit(0)))
        .select("doc_id", "fp")
        .distinct()
    )


def facets(df: DataFrame, dims: list[str], measure: str) -> DataFrame:
    """Faceted counts + mean measure over the given dimensions."""
    return df.groupBy(*dims).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(measure), 6).alias(f"avg_{measure}"),
    )


# ====================== oracle SQL builders (DuckDB) =========================

_DUCK_WS = "string_split_regex(trim(text), '\\s+')"


def _duck_list_lit(xs: list[str]) -> str:
    return "[" + ", ".join(f"'{x}'" for x in xs) + "]"


# ============================== queries ======================================


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len({_DUCK_WS}) AS n_ws_tokens,
           len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS n_bpe_tokens,
           length(text) AS n_chars_exact
    FROM documents
    """,
)
def text_token_stats_q(spark, sf_dir):
    """Whitespace + BPE-ish token counts per document."""
    return token_stats(load_table(spark, sf_dir, "documents"), "doc_id", "text")


def duck_quality_select() -> str:
    """The quality_scores() computation as a standalone DuckDB SELECT —
    shared by the text_quality_scores oracle and downstream consumers
    (operators/corpus.py weighted sampling)."""
    return f"""
    WITH t AS (
      SELECT doc_id, text, {_DUCK_WS} AS toks,
             length(text) AS total,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS alpha,
             length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS punct,
             len(list_filter({_DUCK_WS},
                 w -> list_contains({_duck_list_lit(STOPWORDS)}, lower(w)))) AS stop_hits
      FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_tokens,
           round(total / len(toks), 6) AS mean_token_len,
           round(stop_hits / len(toks), 6) AS stopword_ratio,
           round(alpha / total, 6) AS alpha_ratio,
           round(punct / total, 6) AS punct_ratio,
           round(0.4 * (alpha / total) + 0.3 * (stop_hits / len(toks))
                 + 0.3 * (1.0 - least((punct / total) * 5, 1.0)), 6) AS quality
    FROM t
    """


@query("text_quality_scores", oracle=duck_quality_select())
def text_quality_scores_q(spark, sf_dir):
    """Per-doc quality signals (alpha/punct/stopword ratios + combo)."""
    return quality_scores(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_langid",
    oracle="""
    WITH scored AS (
    """
    + " UNION ALL ".join(
        f"""SELECT doc_id, '{lang}' AS lang,
               len(regexp_extract_all(lower(text), '{_lang_pattern(markers)}')) AS score
            FROM documents"""
        for lang, markers in sorted(LANG_PROFILES.items())
    )
    + """
    ), ranked AS (
      SELECT doc_id, lang, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang) AS rn
      FROM scored
    )
    SELECT doc_id, lang AS pred_lang, score FROM ranked WHERE rn = 1
    """,
)
def text_langid_q(spark, sf_dir):
    """Stopword-profile language ID (deterministic argmax)."""
    return language_id(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lower(unnest(string_split_regex(trim(text), '\\s+'))) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), df_ AS (
      SELECT term, count(*) AS df_ FROM tf GROUP BY term
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), scored AS (
      SELECT doc_id, tf.term,
             round(tf * ln((SELECT n_docs FROM n) * 1.0 / df_), 6) AS tfidf
      FROM tf JOIN df_ ON tf.term = df_.term
    ), ranked AS (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rank
      FROM scored
    )
    SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= 3
    """,
)
def text_tfidf_top_terms_q(spark, sf_dir):
    """Top-3 tf-idf terms per document."""
    return tfidf_top_terms(load_table(spark, sf_dir, "documents"), "doc_id", "text", 3)


@query(
    "text_fingerprints",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id,
             list_transform(range(1, greatest(length(text) - 8 + 1, 1) + 1),
                            i -> {duck_porthash("substr(text, i, 8)", "fp")}) AS hashes
      FROM documents
    ), wins AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(hashes) - 4 + 1, 1) + 1),
               i -> list_min(hashes[i:i+3]))) AS mins
      FROM grams
    )
    SELECT DISTINCT doc_id, unnest(mins) AS fp FROM wins
    """,
)
def text_fingerprints_q(spark, sf_dir):
    """Winnowing fingerprints (char 8-grams, window 4) per document."""
    return winnow_fingerprints(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", 8, 4
    )


@query(
    "text_facets",
    oracle="""
    SELECT lang, source, count(*) AS n, round(avg(n_chars), 6) AS avg_n_chars
    FROM documents GROUP BY lang, source
    """,
)
def text_facets_q(spark, sf_dir):
    """Corpus facets: lang × source counts + mean length."""
    return facets(load_table(spark, sf_dir, "documents"), ["lang", "source"], "n_chars")


def repetition_ratio(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signal: fraction of all word bigrams taken
    by the single most frequent bigram (high → boilerplate/spam). One
    explode reduced immediately to (doc, bigram) counts; max/sum per doc."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(ws_tokens(text_col)).alias("pos", "w"),
    )
    # consecutive-token pairing as a window lead: ONE shuffle on doc_id
    # (no token self-join), which the bigram groupBy then reuses
    w_next = F.lead("w").over(Window.partitionBy("doc_id").orderBy("pos"))
    pairs = (
        toks.withColumn("w2", w_next)
        .filter(F.col("w2").isNotNull())
        .select("doc_id", F.concat_ws(" ", "w", "w2").alias("bigram"))
    )
    counts = pairs.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
    return counts.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_ratio"),
        F.sum("c").alias("n_bigrams"),
    )


def scrub_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Pipeline scrubbing: redact email-like tokens and digit runs, count
    the redactions (the shape of a PII pass; production swaps in its own
    pattern set). Pure regexp_replace — one projection."""
    t = F.col(text_col)
    email_re = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    digits_re = "[0-9]{3,}"
    after_email = F.regexp_replace(t, email_re, "<EMAIL>")
    scrubbed = F.regexp_replace(after_email, digits_re, "<NUM>")
    n_email = F.size(F.regexp_extract_all(t, F.lit(email_re), 0))
    n_num = F.size(F.regexp_extract_all(after_email, F.lit(digits_re), 0))
    return df.select(
        F.col(id_col).alias("doc_id"),
        scrubbed.alias("scrubbed"),
        n_email.alias("n_emails"),
        n_num.alias("n_numbers"),
    )


@query(
    "text_repetition_ratio",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS pos,
             unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ), pairs AS (
      SELECT a.doc_id, a.w || ' ' || b.w AS bigram
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ), counts AS (
      SELECT doc_id, bigram, count(*) AS c FROM pairs GROUP BY doc_id, bigram
    )
    SELECT doc_id,
           round(max(c) / sum(c), 6) AS top_bigram_ratio,
           CAST(sum(c) AS BIGINT) AS n_bigrams
    FROM counts GROUP BY doc_id
    """,
)
def text_repetition_ratio_q(spark, sf_dir):
    """Repetition filter signal (most-frequent-bigram share per doc)."""
    return repetition_ratio(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_scrub",
    oracle="""
    WITH e AS (
      SELECT doc_id, text,
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                            '<EMAIL>', 'g') AS after_email
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(after_email, '[0-9]{3,}', '<NUM>', 'g') AS scrubbed,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(after_email, '[0-9]{3,}')) AS n_numbers
    FROM e
    """,
)
def text_scrub_q(spark, sf_dir):
    """Redaction pass: emails + digit runs → placeholders, with counts."""
    return scrub_text(load_table(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "pipeline_clean_corpus",
    oracle="""
    WITH q AS (
      SELECT doc_id, text,
             0.4 * (length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / length(text))
             + 0.3 * (len(list_filter(string_split_regex(trim(text), '\\s+'),
                         w -> list_contains(['the','a','of','to','and','in','is','it','for','on'], lower(w))))
                      / len(string_split_regex(trim(text), '\\s+')))
             + 0.3 * (1.0 - least((length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                                   / length(text)) * 5, 1.0)) AS quality
      FROM documents
    ), keepers AS (
      SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ), scored AS (
    """
    + " UNION ALL ".join(
        f"""SELECT doc_id, '{lang}' AS lang,
               len(regexp_extract_all(lower(text), '{_lang_pattern(markers)}')) AS score
            FROM documents"""
        for lang, markers in sorted(LANG_PROFILES.items())
    )
    + """
    ), lang_pick AS (
      SELECT doc_id, lang AS pred_lang,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
      FROM scored
    )
    SELECT q.doc_id,
           lp.pred_lang,
           round(q.quality, 6) AS quality,
           md5(regexp_replace(q.text, '[0-9]{3,}', '<NUM>', 'g')) AS clean_hash
    FROM q
    JOIN keepers k ON q.doc_id = k.doc_id
    JOIN lang_pick lp ON q.doc_id = lp.doc_id AND lp.rn = 1
    WHERE q.quality >= 0.3
    """,
)
def pipeline_clean_corpus_q(spark, sf_dir):
    """Capstone: the composed LLM-data cleaning pipeline in ONE lazy plan
    — quality gate → exact-dedup keepers (anti-amplification: semi-join
    on the keeper set) → language tag → scrub → stable content hash.
    Catalyst fuses the narrow stages; the only shuffles are the dedup
    groupBy and the langid argmax."""
    # fan_out (r15): all four branches below are regex-heavy narrow
    # chains over the same scan — a single-file table pinned them to one
    # task each (probe: 5.7 s of single-task executor time); the
    # round-robin floor is scale-adaptive (no-op at production splits)
    # and row-preserving, so results and oracle hashes are unchanged
    from dask_obj_spark.sources.tables import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    quality = quality_scores(docs, "doc_id", "text").select("doc_id", "quality")
    keepers = (
        docs.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    )
    langs = language_id(docs, "doc_id", "text").select("doc_id", "pred_lang")
    scrubbed = docs.select(
        "doc_id",
        F.md5(F.regexp_replace(F.col("text"), "[0-9]{3,}", "<NUM>")).alias("clean_hash"),
    )
    return (
        quality.filter(F.col("quality") >= 0.3)
        .join(keepers, "doc_id", "left_semi")
        .join(langs, "doc_id")
        .join(scrubbed, "doc_id")
        .select("doc_id", "pred_lang", "quality", "clean_hash")
    )


# -- cross-document boilerplate removal ---------------------------------------


def remove_boilerplate_segments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    seg_words: int = 10,
    max_df: int = 1,
) -> DataFrame:
    """C4/CCNet-style boilerplate scrub: split each document into fixed
    ``seg_words``-word segments, drop every segment whose exact content
    occurs in more than ``max_df`` DISTINCT documents (navigation chrome,
    license footers, templated headers), and rebuild the surviving text
    in original order.  Returns (doc_id, clean_text); a fully-boilerplate
    document comes back as ''.

    Shape: posexplode segments → distinct (doc, segment) → algebraic
    groupBy(count) for document frequency → anti-join of the hot set →
    order-safe rebuild (array_sort of (pos, seg) structs, then join —
    collect_list order is never trusted).  At 100 TB the hot-set join
    keys on a segment HASH (8-byte shuffle instead of strings); the hot
    set is the head of a Zipf curve but its SIZE is occurrences/max_df —
    linear in the corpus — so it carries no broadcast hint (AQE
    broadcasts at demo scale, shuffles the anti-join beyond); the
    string form here keeps the DuckDB oracle replayable verbatim."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    nseg = F.floor((F.size(words) - 1) / seg_words) + 1
    segs = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.array_join(F.slice(words, i * seg_words + 1, seg_words), " "),
    )
    exploded = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(segs).alias("pos", "seg")
    )
    hot = (
        exploded.select("doc_id", "seg")
        .distinct()
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("df_"))
        .filter(F.col("df_") > max_df)
        .select("seg")
    )
    # hot set grows with the corpus (occurrences/max_df) — no broadcast
    # hint; AQE decides (broadcast at demo scale, shuffle at 100 TB)
    kept = exploded.join(hot, "seg", "left_anti")
    rebuilt = (
        kept.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "seg"))).alias("ps"))
        .select(
            "doc_id",
            F.array_join(F.col("ps.seg"), " ").alias("clean_text"),
        )
    )
    ids = df.select(F.col(id_col).alias("doc_id"))
    return ids.join(rebuilt, "doc_id", "left").select(
        "doc_id", F.coalesce("clean_text", F.lit("")).alias("clean_text")
    )


@query(
    "text_boilerplate_scrub",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
    ), segs AS (
      SELECT doc_id,
             unnest(range(0, ((len(ws) - 1) // 10) + 1)) AS pos,
             ws
      FROM w
    ), seg_txt AS (
      SELECT doc_id, pos,
             array_to_string(ws[(pos * 10 + 1):(pos * 10 + 10)], ' ') AS seg
      FROM segs
    ), hot AS (
      SELECT seg FROM (SELECT DISTINCT doc_id, seg FROM seg_txt)
      GROUP BY seg HAVING count(*) > 1
    ), rebuilt AS (
      SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text
      FROM seg_txt WHERE seg NOT IN (SELECT seg FROM hot)
      GROUP BY doc_id
    )
    SELECT d.doc_id, coalesce(r.clean_text, '') AS clean_text
    FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
    """,
)
def text_boilerplate_scrub_q(spark, sf_dir):
    """Cross-document repeated-segment (boilerplate) removal: 10-word
    segments occurring in ≥ 2 distinct documents are scrubbed."""
    docs = load_table(spark, sf_dir, "documents")
    return remove_boilerplate_segments(docs, "doc_id", "text", 10, 1)


@query(
    "profile_corpus_facets",
    oracle="""
    WITH t AS (
      SELECT source, lang,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
             n_chars
      FROM documents
    )
    SELECT source, lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(n_tokens), 4) AS avg_tokens,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY n_tokens), 6)
             AS p50_tokens,
           round(percentile_cont(0.9) WITHIN GROUP (ORDER BY n_tokens), 6)
             AS p90_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM t
    GROUP BY source, lang
    """,
)
def profile_corpus_facets_q(spark, sf_dir):
    """Dataset-card profile: per (source, lang) facet — doc counts,
    token totals/averages/quantiles, char volume.  The first query any
    corpus owner runs; one partial+final agg over a 4-column projection
    (the shuffle carries |facets| rows, the percentile state is the only
    non-algebraic part)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        docs.select("source", "lang", n_tokens.alias("n_tokens"), "n_chars")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
            F.round(F.percentile("n_tokens", F.lit(0.5)), 6).alias("p50_tokens"),
            F.round(F.percentile("n_tokens", F.lit(0.9)), 6).alias("p90_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "text_gopher_filter",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_words,
             length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0
               / length(text) AS alpha_ratio,
             length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) * 1.0
               / length(text) AS symbol_ratio,
             length(text) * 1.0
               / len(string_split_regex(trim(text), '\\s+')) AS mean_word_len
      FROM documents
    )
    SELECT doc_id,
           (n_words BETWEEN 15 AND 10000) AS len_ok,
           (mean_word_len BETWEEN 2 AND 5.8) AS word_len_ok,
           (alpha_ratio >= 0.81) AS alpha_ok,
           (symbol_ratio <= 0.1) AS symbol_ok,
           ((n_words BETWEEN 15 AND 10000) AND (mean_word_len BETWEEN 2 AND 5.8)
            AND alpha_ratio >= 0.81 AND symbol_ratio <= 0.1) AS keep
    FROM m
    """,
)
def text_gopher_filter_q(spark, sf_dir):
    """Gopher-style rule filter (Rae et al. 2021 §A1.1 pattern): word
    count bounds, mean word length bounds, alphabetic ratio, symbol
    ratio — each rule surfaced as its own boolean (audit column) plus
    the conjunctive keep flag.  One narrow projection over the scan;
    the audit booleans make per-rule rejection-rate reporting a single
    groupBy downstream."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_words = F.size(ws_tokens(t))
    alpha_ratio = F.length(F.regexp_replace(t, "[^a-zA-Z]", "")) / F.length(t)
    symbol_ratio = F.length(F.regexp_replace(t, "[a-zA-Z0-9\\s]", "")) / F.length(t)
    mean_word_len = F.length(t) / n_words
    len_ok = n_words.between(15, 10000)
    word_len_ok = mean_word_len.between(2, 5.8)
    alpha_ok = alpha_ratio >= 0.81
    symbol_ok = symbol_ratio <= 0.1
    return docs.select(
        "doc_id",
        len_ok.alias("len_ok"),
        word_len_ok.alias("word_len_ok"),
        alpha_ok.alias("alpha_ok"),
        symbol_ok.alias("symbol_ok"),
        (len_ok & word_len_ok & alpha_ok & symbol_ok).alias("keep"),
    )


# -- PMI collocations (tokenizer/vocab prep) ----------------------------------


def pmi_bigrams(
    df: DataFrame, id_col: str, text_col: str, min_count: int = 5
) -> DataFrame:
    """Corpus-level PMI-scored bigram collocations (the classic
    collocation-mining signal; tokenizer/vocab prep for merges worth a
    single token).  pmi = ln(p(xy) / (p(x)·p(y))).

    Shape: ONE token explode shuffled on doc_id feeds both the bigram
    pairing (window lead — no token self-join) and the unigram counts;
    bigram/unigram count tables reduce to vocabulary size — which still
    grows with the corpus (Heaps' law), so the two unigram lookup joins
    are PLAIN equi-joins (AQE broadcasts them at demo scale; no hint)
    and only the 1-row totals ride along as broadcast literals.  The
    shuffles carry (term, count) pairs — never raw token streams —
    which is what survives a 100 TB corpus.
    Probabilities are composed as double divisions (not integer cross
    products), so the arithmetic cannot overflow however large the
    corpus gets."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(ws_tokens(text_col)).alias("pos", "w"),
    )
    w_next = F.lead("w").over(Window.partitionBy("doc_id").orderBy("pos"))
    pairs = (
        toks.withColumn("w2", w_next)
        .filter(F.col("w2").isNotNull())
        .select(F.col("w").alias("w1"), "w2")
    )
    # count tables reduce to vocabulary size — checkpoint them so the
    # token explode runs ONCE per table (plan audit: 5 scans → 2; the
    # totals and both lookup joins reuse the materialized counts)
    big = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("nxy"))
        .localCheckpoint(eager=True)
    )
    uni = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_uni"))
        .localCheckpoint(eager=True)
    )
    b_total = big.agg(F.sum("nxy").alias("b_total"))
    t_total = uni.agg(F.sum("n_uni").alias("t_total"))
    j = (
        big.filter(F.col("nxy") >= min_count)
        # unigram counts are vocabulary-sized (Heaps' law: unbounded at
        # 100 TB) — plain equi-joins, never a broadcast hint; AQE still
        # broadcasts at demo scale on its own
        .join(uni.select(F.col("w").alias("w1"), F.col("n_uni").alias("nx")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n_uni").alias("ny")), "w2")
        .crossJoin(F.broadcast(b_total))
        .crossJoin(F.broadcast(t_total))
    )
    pmi = F.round(
        F.log(
            (F.col("nxy") / F.col("b_total"))
            / ((F.col("nx") / F.col("t_total")) * (F.col("ny") / F.col("t_total")))
        ),
        6,
    )
    return j.select("w1", "w2", "nxy", pmi.alias("pmi"))


@query(
    "text_pmi_bigrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS pos,
             unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ), pairs AS (
      SELECT a.w AS w1, b.w AS w2
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ), big AS (
      SELECT w1, w2, count(*) AS nxy FROM pairs GROUP BY w1, w2
    ), uni AS (
      SELECT w, count(*) AS n_uni FROM toks GROUP BY w
    ), tot AS (
      SELECT (SELECT CAST(sum(nxy) AS DOUBLE) FROM big) AS b_total,
             (SELECT CAST(sum(n_uni) AS DOUBLE) FROM uni) AS t_total
    )
    SELECT big.w1, big.w2, big.nxy,
           round(ln((big.nxy / tot.b_total) /
                    ((ux.n_uni / tot.t_total) * (uy.n_uni / tot.t_total))), 6)
             AS pmi
    FROM big
    JOIN uni ux ON ux.w = big.w1
    JOIN uni uy ON uy.w = big.w2
    CROSS JOIN tot
    WHERE big.nxy >= 5
    """,
)
def text_pmi_bigrams_q(spark, sf_dir):
    """PMI bigram collocations over the corpus (min count 5)."""
    return pmi_bigrams(load_table(spark, sf_dir, "documents"), "doc_id", "text", 5)


# -- C4-style span-level exact dedup ------------------------------------------


def span_dedup(
    df: DataFrame, id_col: str, text_col: str, span: int = 8
) -> DataFrame:
    """Cross-document span-level exact dedup (the C4/line-dedup move,
    over fixed token windows since this corpus has no line structure):
    split each doc into consecutive `span`-token chunks, keep only the
    FIRST occurrence of each chunk corpus-wide (first = lowest (doc_id,
    span_pos) — deterministic under any partitioning), and reassemble
    every doc from its surviving chunks.

    Scale shape: the chunk array is built per-row (narrow, codegen;
    ~len/span tiny slices), then ONE shuffle keyed on the chunk text
    ranks occurrences and ONE shuffle on doc_id reassembles.  At 100 TB
    the rank shuffle keys on xxhash64(chunk) (8-byte keys, not
    payloads) with the same plan; stop-chunk skew is bounded because a
    chunk is `span` whole tokens — far more selective than single
    tokens.  In-doc order is imposed by array_sort over (pos, text)
    structs, never collect order."""
    arr = ws_tokens(text_col)
    n_sp = F.ceil(F.size(arr) / F.lit(span)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_sp - 1),
        lambda i: F.array_join(F.slice(arr, i * span + 1, span), " "),
    )
    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(spans).alias("span_pos", "span_text"),
    )
    rn = F.row_number().over(
        Window.partitionBy("span_text").orderBy("doc_id", "span_pos")
    )
    flagged = ex.withColumn("keep", (rn == 1).cast("int"))
    kept_struct = F.when(F.col("keep") == 1, F.struct("span_pos", "span_text"))
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.count(kept_struct).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["span_text"]
            ),
        ).alias("clean_text"),
    )


@query(
    "text_span_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             generate_subscripts(string_split_regex(trim(text), '\\s+'), 1) AS pos,
             unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ), sp AS (
      SELECT doc_id, (pos - 1) // 8 AS span_pos,
             string_agg(w, ' ' ORDER BY pos) AS span_text
      FROM toks GROUP BY doc_id, (pos - 1) // 8
    ), ranked AS (
      SELECT doc_id, span_pos, span_text,
             row_number() OVER (PARTITION BY span_text
                                ORDER BY doc_id, span_pos) AS rn
      FROM sp
    )
    SELECT doc_id,
           count(*) AS n_spans,
           count(*) FILTER (WHERE rn = 1) AS n_kept,
           coalesce(string_agg(span_text, ' ' ORDER BY span_pos)
                      FILTER (WHERE rn = 1), '') AS clean_text
    FROM ranked GROUP BY doc_id
    """,
)
def text_span_dedup_q(spark, sf_dir):
    """Corpus-wide 8-token span exact dedup with doc reassembly."""
    return span_dedup(load_table(spark, sf_dir, "documents"), "doc_id", "text", 8)


@query(
    "text_zipf_fit",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
    ), freq AS (
      SELECT w, count(*) AS f FROM toks GROUP BY w
    ), ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, w) AS r FROM freq
    )
    SELECT count(*) AS n_terms,
           round(regr_slope(ln(f), ln(r)), 6) AS zipf_slope,
           round(regr_intercept(ln(f), ln(r)), 6) AS zipf_intercept,
           round(regr_r2(ln(f), ln(r)), 6) AS zipf_r2
    FROM ranked
    """,
)
def text_zipf_fit_q(spark, sf_dir):
    """Zipf-law fit of the corpus frequency spectrum: ln(freq) regressed
    on ln(rank) with the regr_* aggregate family (slope ≈ -1 for
    natural language; deviation is a corpus-health signal — synthetic
    or template text bends the tail).  The rank window is global but
    VOCABULARY-sized (the token stream is already reduced to (term,
    count) pairs), so the sort is a broadcast-scale operation however
    big the corpus; the regression itself is one algebraic aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(ws_tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    ranked = freq.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("f"), "w"))
    )
    lnf, lnr = F.log("f"), F.log("r")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(lnf, lnr), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(lnf, lnr), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(lnf, lnr), 6).alias("zipf_r2"),
    )


@query(
    "text_ngram_diversity",
    oracle=r"""
    WITH grams AS (
      SELECT source, unnest(list_transform(range(greatest(len(string_split_regex(trim(text), '\s+')) - 3, 0) + 1), i -> array_to_string(string_split_regex(trim(text), '\s+')[i+1:i+3], ' '))) AS g
      FROM documents
    )
    SELECT source,
           count(*) AS total_ngrams,
           count(DISTINCT g) AS distinct_ngrams,
           round(count(DISTINCT g) / count(*), 6) AS diversity
    FROM grams GROUP BY source
    """,
)
def text_ngram_diversity_q(spark, sf_dir):
    """Per-source 3-gram diversity (distinct/total) — the standard
    degeneracy metric for generated or templated data (low diversity =
    repetitive corpus; the aggregate twin of the per-doc repetition
    ratio).  The explode reduces immediately into the per-source
    aggregate; exact distinct shuffles (source, gram) pairs — at
    100 TB swap count(DISTINCT) for approx_count_distinct with the
    same plan."""
    from dask_obj_spark.functions.hashing import word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select("source", F.explode(word_ngrams("text", 3)).alias("g"))
    return grams.groupBy("source").agg(
        F.count(F.lit(1)).alias("total_ngrams"),
        F.countDistinct("g").alias("distinct_ngrams"),
        F.round(F.countDistinct("g") / F.count(F.lit(1)), 6).alias("diversity"),
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 keyword retrieval: top-k documents for a bag-of-terms query.

    The retrieval primitive on the lexical side of a hybrid search stack
    (the embedding side is operators/similarity.py).  Corpus statistics
    (document frequency, average length) are computed IN the plan — no
    pre-built index object — which is exactly the batch-retrieval shape:
    score a fixed query list against a snapshot.

    Scale: the exploded token stream is filtered to the query's terms
    BEFORE the per-(doc, term) count, so the shuffle carries only
    matching postings (|docs containing any query term| · |terms|), not
    the corpus vocabulary; per-term df and the global avgdl are tiny
    aggregates broadcast back; the final top-k is TakeOrderedAndProject,
    never a full sort.  At 100 TB the standing form materializes the
    (term, doc, tf) postings table bucketed by term
    (operators/scale.py:write_bucketed) and this plan becomes a
    bucket-pruned probe of the query's terms only.

    Ranking determinism: scores are rounded to 6 dp and ordered by
    (rounded score desc, id) so the cross-engine oracle ranks
    identically (PLANS.md numerics note)."""
    t = F.col(text_col)
    dl = df.select(F.col(id_col), F.size(ws_tokens(t)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    toks = df.select(
        F.col(id_col), F.explode(ws_tokens(t)).alias("term")
    ).withColumn("term", F.lower(F.col("term")))
    posting = (
        toks.filter(F.col("term").isin(*[q.lower() for q in query_terms]))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = posting.groupBy("term").agg(F.count(F.lit(1)).alias("df_"))
    scored = (
        posting.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df_") + 0.5) / (F.col("df_") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


@query(
    "text_bm25_topk",
    oracle="""
    WITH dl AS (
      SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS dl
      FROM documents
    ), stats AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
    ), toks AS (
      SELECT doc_id, lower(unnest(string_split_regex(trim(text), '\\s+'))) AS term
      FROM documents
    ), posting AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ('join', 'hash', 'scan')
      GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, count(*) AS df_ FROM posting GROUP BY term
    ), scored AS (
      SELECT p.doc_id,
             round(sum(
               ln(1.0 + (s.n_docs - f.df_ + 0.5) / (f.df_ + 0.5))
               * (p.tf * 2.2)
               / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))
             ), 6) AS score
      FROM posting p
        JOIN dfreq f ON p.term = f.term
        JOIN dl d ON p.doc_id = d.doc_id
        CROSS JOIN stats s
      GROUP BY p.doc_id
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def text_bm25_topk_q(spark, sf_dir):
    """Top-10 BM25 hits for the query {join, hash, scan}."""
    return bm25_topk(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        ["join", "hash", "scan"], k=10,
    )


def bigram_lm_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document bigram language-model surprisal — the classic
    perplexity-style quality score (KenLM-shaped, trained on the corpus
    itself with add-one smoothing).  High mean surprisal = improbable
    word transitions = likely garbled/TOPIC-foreign text; the standard
    companion signal to the rule-based Gopher filters.

    Model: P(w2|w1) = (C(w1,w2) + 1) / (C(w1) + V), score = mean over a
    doc's bigrams of -ln P, ppl = exp(score).

    Scale: bigrams are sliced out of the token ARRAY per row (zero
    shuffle, no window); the model tables are two hash aggregates of the
    corpus; scoring re-joins the doc bigrams to the bigram table keyed
    on (w1, w2) — at 100 TB that join is the big exchange and is
    bucket-able; the 1-row V broadcasts, while the unigram table is
    vocabulary-sized (unbounded under Heaps' law) and joins PLAIN —
    AQE broadcasts it at demo scale without a hint."""
    toks = df.select(
        F.col(id_col),
        F.transform(ws_tokens(F.col(text_col)), lambda w: F.lower(w)).alias("ws"),
    )
    bigrams = toks.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice(F.col("ws"), 1, F.greatest(F.size("ws") - 1, F.lit(0))),
                F.slice(F.col("ws"), 2, F.greatest(F.size("ws") - 1, F.lit(0))),
                lambda a, b_: F.struct(a.alias("w1"), b_.alias("w2")),
            )
        ).alias("bg"),
    ).select(F.col(id_col), F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    big_counts = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni_counts = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = bigrams.select(
        F.explode(F.array("w1", "w2")).alias("w")
    ).agg(F.countDistinct("w").alias("v"))
    scored = (
        bigrams.join(big_counts, ["w1", "w2"])
        # vocabulary-sized side: plain equi-join (no broadcast hint)
        .join(uni_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "nlp", -F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("v")))
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("nlp"), 6).alias("mean_surprisal"),
        )
    )
    return scored


@query(
    "text_bigram_perplexity",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_transform(string_split_regex(trim(text), '\\s+'),
                            w -> lower(w)) AS ws
      FROM documents
    ), bigrams AS (
      SELECT doc_id,
             unnest(ws[1:len(ws)-1]) AS w1,
             unnest(ws[2:len(ws)]) AS w2
      FROM toks
    ), big_counts AS (
      SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY w1, w2
    ), uni_counts AS (
      SELECT w1, count(*) AS c1 FROM bigrams GROUP BY w1
    ), vocab AS (
      SELECT count(DISTINCT w) AS v FROM (
        SELECT w1 AS w FROM bigrams UNION ALL SELECT w2 FROM bigrams
      )
    )
    SELECT b.doc_id,
           count(*) AS n_bigrams,
           round(avg(-ln((bc.c12 + 1.0) / (uc.c1 + vocab.v))), 6)
             AS mean_surprisal
    FROM bigrams b
      JOIN big_counts bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
      JOIN uni_counts uc ON b.w1 = uc.w1
      CROSS JOIN vocab
    GROUP BY b.doc_id
    """,
)
def text_bigram_perplexity_q(spark, sf_dir):
    """Corpus-trained bigram-LM mean surprisal per document."""
    return bigram_lm_scores(load_table(spark, sf_dir, "documents"), "doc_id", "text")


_PPL_T1 = 0.3333333333333333  # exact double literals, identical in the SQL below
_PPL_T2 = 0.6666666666666666


@query(
    "text_perplexity_buckets",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_transform(string_split_regex(trim(text), '\\s+'),
                            w -> lower(w)) AS ws
      FROM documents
    ), bigrams AS (
      SELECT doc_id,
             unnest(ws[1:len(ws)-1]) AS w1,
             unnest(ws[2:len(ws)]) AS w2
      FROM toks
    ), big_counts AS (
      SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY w1, w2
    ), uni_counts AS (
      SELECT w1, count(*) AS c1 FROM bigrams GROUP BY w1
    ), vocab AS (
      SELECT count(DISTINCT w) AS v FROM (
        SELECT w1 AS w FROM bigrams UNION ALL SELECT w2 FROM bigrams
      )
    ), scored AS (
      SELECT b.doc_id,
             round(avg(-ln((bc.c12 + 1.0) / (uc.c1 + vocab.v))), 6) AS score
      FROM bigrams b
        JOIN big_counts bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
        JOIN uni_counts uc ON b.w1 = uc.w1
        CROSS JOIN vocab
      GROUP BY b.doc_id
    ), th AS (
      SELECT quantile_cont(score, 0.3333333333333333) AS t1,
             quantile_cont(score, 0.6666666666666666) AS t2
      FROM scored
    )
    SELECT s.doc_id, s.score,
           CASE WHEN s.score <= th.t1 THEN 'head'
                WHEN s.score <= th.t2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored s CROSS JOIN th
    """,
)
def text_perplexity_buckets_q(spark, sf_dir):
    """CCNet-style quality bucketing: split the corpus into head /
    middle / tail thirds by language-model surprisal (head = best LM
    fit), the standard pre-training quality stratification that feeds
    per-bucket sampling rates.

    Thresholds are EXACT interpolated percentiles of the 6-dp-rounded
    per-doc score (Spark F.percentile and DuckDB quantile_cont compute
    the identical linear interpolation — verify SKILL.md); the
    two-value threshold row broadcasts onto the scored table.  Scale:
    all corpus-wide work is the bigram-LM scoring (operators/text.py
    `bigram_lm_scores`); exact global percentiles of a per-doc scalar
    are one single-row aggregate — at extreme cardinality swap in
    approx_percentile or the two-phase equidepth scan
    (profile_equidepth_histogram) with documented error."""
    docs = load_table(spark, sf_dir, "documents")
    scored = bigram_lm_scores(docs, "doc_id", "text").select(
        "doc_id", F.col("mean_surprisal").alias("score")
    )
    th = scored.agg(
        F.percentile("score", F.lit(_PPL_T1)).alias("t1"),
        F.percentile("score", F.lit(_PPL_T2)).alias("t2"),
    )
    return scored.crossJoin(F.broadcast(th)).select(
        "doc_id",
        "score",
        F.when(F.col("score") <= F.col("t1"), F.lit("head"))
        .when(F.col("score") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


CMS_DEPTH = 3  # independent hash rows
CMS_WIDTH = 1024  # counters per row


@query(
    "sketch_countmin_freq",
    oracle="""
    WITH toks AS (
      SELECT lower(unnest(string_split_regex(trim(text), '\\s+'))) AS tok
      FROM documents
    ), cms AS (
      SELECT j, idx, count(*) AS c FROM (
        """
    + "\n        UNION ALL\n        ".join(
        f"SELECT {j} AS j, ('0x' || substr(md5(tok || '#cm{j}'), 1, 15))::BIGINT"
        f" % 1024 AS idx FROM toks"
        for j in range(3)
    )
    + """
      ) GROUP BY j, idx
    ), exact AS (
      SELECT tok, count(*) AS exact_n FROM toks GROUP BY tok
    ), probes AS (
      SELECT tok, exact_n FROM (
        SELECT tok, exact_n,
               row_number() OVER (ORDER BY exact_n DESC, tok) AS rn
        FROM exact
      ) WHERE rn <= 20
    ), est AS (
      SELECT p.tok, p.exact_n,
             min(c.c) AS est_n
      FROM probes p
      JOIN cms c
        ON c.idx = ('0x' || substr(md5(p.tok || '#cm' || c.j), 1, 15))::BIGINT % 1024
      GROUP BY p.tok, p.exact_n
    )
    SELECT tok, CAST(exact_n AS BIGINT) AS exact_n,
           CAST(est_n AS BIGINT) AS est_n,
           CAST(est_n >= exact_n AS INT) AS never_undercounts
    FROM est
    """,
)
def sketch_countmin_freq_q(spark, sf_dir):
    """Count-Min sketch token frequencies: a 3 x 1024 counter table
    estimates any token's corpus frequency as min over rows of its
    hashed counter — compared here against exact counts for the top-20
    tokens, with the CMS one-sided guarantee (never undercounts)
    emitted per row.

    Why it matters at 100 TB: the sketch is FIXED-SIZE state (3·1024
    longs) and merge-by-addition — the incremental/streaming frequency
    primitive when the vocabulary itself no longer fits anywhere
    (per-shard sketches sum into the global one, same contract as
    incremental_agg_merge).  All hashes are the portable md5-derived
    `porthash`, so DuckDB replays the sketch bit-for-bit — estimate
    AND guarantee are oracle-checked, not asserted.

    Plan: one token explode feeds both the sketch build (3 codegen'd
    hash columns → 3072-row hash agg) and the exact counts; the
    estimate join touches 20 probe rows x 3 sketch rows."""
    from dask_obj_spark.functions.hashing import porthash

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(ws_tokens(F.col("text"))).alias("tok")
    ).withColumn("tok", F.lower(F.col("tok"))).localCheckpoint(eager=True)
    cms = None
    for j in range(CMS_DEPTH):
        part = toks.select(
            F.lit(j).alias("j"),
            (porthash(F.col("tok"), f"cm{j}") % CMS_WIDTH).alias("idx"),
        )
        cms = part if cms is None else cms.union(part)
    cms = cms.groupBy("j", "idx").agg(F.count(F.lit(1)).alias("c"))
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    # orderBy+limit → TakeOrderedAndProject: distributed per-partition
    # top-20 + tiny driver merge, never a single-partition window over
    # the (vocabulary-sized) exact-count table
    probes = exact.orderBy(F.desc("exact_n"), F.asc("tok")).limit(20)
    probe_pos = probes.select(
        "tok",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (porthash(F.col("tok"), f"cm{j}") % CMS_WIDTH).alias("idx"),
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("pos"),
    ).select("tok", "exact_n", "pos.j", "pos.idx")
    est = (
        probe_pos.join(F.broadcast(cms), ["j", "idx"])
        .groupBy("tok", "exact_n")
        .agg(F.min("c").alias("est_n"))
    )
    return est.select(
        "tok",
        F.col("exact_n").cast("bigint").alias("exact_n"),
        F.col("est_n").cast("bigint").alias("est_n"),
        (F.col("est_n") >= F.col("exact_n")).cast("int").alias("never_undercounts"),
    )


@query(
    "text_tfidf_cosine_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lower(unnest(string_split_regex(trim(text), '\\s+'))) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), stats AS (
      SELECT count(DISTINCT doc_id) AS n_docs FROM toks
    ), df AS (
      SELECT term, count(*) AS df_ FROM tf GROUP BY term
    ), w AS (
      SELECT t.doc_id, t.term, t.tf * ln(s.n_docs * 1.0 / d.df_) AS w
      FROM tf t JOIN df d ON d.term = t.term CROSS JOIN stats s
      WHERE d.df_ <= greatest(50, s.n_docs // 10)
    ), norms AS (
      SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id
    ), dots AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, sum(a.w * b.w) AS dp
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT d.id1, d.id2,
           round(d.dp / (na.nrm * nb.nrm), 6) AS tfidf_cosine
    FROM dots d
      JOIN norms na ON na.doc_id = d.id1
      JOIN norms nb ON nb.doc_id = d.id2
    WHERE round(d.dp / (na.nrm * nb.nrm), 6) >= 0.3
    """,
)
def text_tfidf_cosine_pairs_q(spark, sf_dir):
    """Sparse lexical cosine: tf-idf weighted document similarity over
    the shared-term inverted index — the bag-of-words analog of
    embedding cosine (catches topical near-dups whose wording diverges
    too much for shingle Jaccard but whose term distributions align).

    Sub-quadratic by construction: the pair join runs term-by-term over
    the inverted index, and terms with document frequency above a
    CORPUS-PROPORTIONAL cap (10% of docs, floor 50) are dropped BEFORE
    the join (they carry ~zero idf weight AND generate the hottest
    buckets — the idf-weighted version of the stop-shingle cap).  The
    cap must scale with the corpus: document frequency grows linearly
    with doc count, so the r13-era ABSOLUTE cap (df <= 50) silently
    dropped every shared term at sf0.1 and the query returned 0 rows —
    the vacuous-parity guard added this round caught it, and a fixed
    cap at 100 TB would have filtered out the entire vocabulary.  At
    sf0.01 (500 docs) the proportional cap is exactly the old 50, so
    recorded hashes are unchanged.  Norms are per-doc aggregates
    broadcast onto the pair results.  At 100 TB the weighted postings
    table is the standing bucketed-by-term asset shared with BM25."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(ws_tokens(F.col("text"))).alias("term")
    ).withColumn("term", F.lower(F.col("term")))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = toks.select("doc_id").distinct().count()
    df_cap = max(50, n_docs // 10)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_"))
    # the rare-term df table is VOCABULARY-sized — no broadcast hint
    w = (
        tf.join(df.filter(F.col("df_") <= df_cap), "term")
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_"))).alias("w"),
        )
        .localCheckpoint(eager=True)  # norms + both pair legs
    )
    norms = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dp"))
    )
    na = norms.select(F.col("doc_id").alias("id1"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("id2"), F.col("nrm").alias("nb"))
    cos = F.round(F.col("dp") / (F.col("na") * F.col("nb")), 6)
    # norms are per-doc (corpus-sized): plain joins, AQE decides
    return (
        dots.join(na, "id1")
        .join(nb, "id2")
        .select("id1", "id2", cos.alias("tfidf_cosine"))
        .filter(F.col("tfidf_cosine") >= 0.3)
    )


@query(
    "text_ngram_novelty",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id, unnest("""
    + duck_word_shingles("text", 3)
    + """) AS shingle
      FROM documents
    ), first_seen AS (
      SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle
    )
    SELECT s.doc_id,
           count(*) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS novelty
    FROM sh s JOIN first_seen f ON f.shingle = s.shingle
    GROUP BY s.doc_id
    """,
)
def text_ngram_novelty_q(spark, sf_dir):
    """Per-document n-gram novelty: the fraction of a doc's distinct
    3-gram shingles whose FIRST occurrence (by doc id, the ingestion
    order) is the doc itself — the diminishing-returns curve of a
    growing corpus (novelty trending to zero means new data is
    re-treading old ground; the aggregate signal behind data-pruning
    and crawl-frontier decisions).

    Plan: first-occurrence is one min-aggregate over the shingle
    posting table; novelty is a join back on the shingle key + one
    per-doc aggregate — the same inverted-index shapes as the dedup
    family, no quadratic surface anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(word_shingles("text", 3)).alias("shingle")
    ).localCheckpoint(eager=True)  # first_seen + the join-back leg
    first_seen = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = (F.col("first_doc") == F.col("doc_id")).cast("int")
    return (
        sh.join(first_seen, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(novel).cast("bigint").alias("n_novel"),
            F.round(F.sum(novel) / F.count(F.lit(1)), 6).alias("novelty"),
        )
    )


_HEAPS_BUCKET = 50  # docs per growth-curve bucket


@query(
    "text_vocab_growth_heaps",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lower(unnest(string_split_regex(trim(text), '\\s+'))) AS term
      FROM documents
    ), per_doc AS (
      SELECT doc_id, count(*) AS n_toks FROM toks GROUP BY doc_id
    ), first_seen AS (
      SELECT term, min(doc_id) AS first_doc FROM toks GROUP BY term
    ), tb AS (
      SELECT CAST(doc_id // {_HEAPS_BUCKET} AS BIGINT) AS bucket,
             sum(n_toks) AS toks
      FROM per_doc GROUP BY 1
    ), vb AS (
      SELECT CAST(first_doc // {_HEAPS_BUCKET} AS BIGINT) AS bucket,
             count(*) AS new_terms
      FROM first_seen GROUP BY 1
    ), curve AS (
      SELECT t.bucket,
             CAST(sum(t.toks) OVER w AS BIGINT) AS cum_tokens,
             CAST(sum(coalesce(v.new_terms, 0)) OVER w AS BIGINT) AS cum_vocab
      FROM tb t LEFT JOIN vb v ON v.bucket = t.bucket
      WINDOW w AS (ORDER BY t.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), fit AS (
      SELECT round(
               (count(*) * sum(ln(cum_tokens) * ln(cum_vocab))
                 - sum(ln(cum_tokens)) * sum(ln(cum_vocab)))
               / (count(*) * sum(ln(cum_tokens) * ln(cum_tokens))
                 - sum(ln(cum_tokens)) * sum(ln(cum_tokens))), 6) + 0
               AS heaps_beta
      FROM curve
    )
    SELECT c.bucket, c.cum_tokens, c.cum_vocab, f.heaps_beta
    FROM curve c CROSS JOIN fit f
    """,
)
def text_vocab_growth_heaps_q(spark, sf_dir):
    """Vocabulary growth curve + Heaps'-law exponent: cumulative
    distinct terms vs cumulative tokens over ingestion-ordered buckets
    of documents, with the log-log regression slope (V ≈ K·nᵝ, β
    typically 0.4-0.8) — the companion to text_zipf_fit and
    text_ngram_novelty that forecasts how much NEW vocabulary more data
    will buy.

    Scale: no per-doc prefix scan — growth is computed at BUCKET
    granularity (first-occurrence per term is one min-aggregate; tokens
    and new-term counts roll up per bucket), so the only running-sum
    window is over |buckets| rows, and the regression is one aggregate
    over the same tiny curve."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(ws_tokens(F.col("text"))).alias("term")
    ).withColumn("term", F.lower(F.col("term"))).localCheckpoint(eager=True)
    per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    first_seen = toks.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    tb = per_doc.groupBy(
        F.expr(f"CAST(doc_id DIV {_HEAPS_BUCKET} AS BIGINT)").alias("bucket")
    ).agg(F.sum("n_toks").alias("toks"))
    vb = first_seen.groupBy(
        F.expr(f"CAST(first_doc DIV {_HEAPS_BUCKET} AS BIGINT)").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("new_terms"))
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = (
        tb.join(vb, "bucket", "left")
        .select(
            "bucket",
            F.sum("toks").over(w).cast("bigint").alias("cum_tokens"),
            F.sum(F.coalesce("new_terms", F.lit(0))).over(w).cast("bigint").alias(
                "cum_vocab"
            ),
        )
        .localCheckpoint(eager=True)  # curve feeds the fit AND the output
    )
    lx = F.log("cum_tokens")
    ly = F.log("cum_vocab")
    fit = curve.agg(
        (
            F.round(
                (F.count(F.lit(1)) * F.sum(lx * ly) - F.sum(lx) * F.sum(ly))
                / (F.count(F.lit(1)) * F.sum(lx * lx) - F.sum(lx) * F.sum(lx)),
                6,
            )
            + 0  # IEEE -0.0 guard (verify SKILL.md) on BOTH engines
        ).alias("heaps_beta")
    )
    return curve.crossJoin(F.broadcast(fit)).select(
        "bucket", "cum_tokens", "cum_vocab", "heaps_beta"
    )


# -- n-gram language-model scoring (CCNet-style perplexity filter) ------------


def ngram_lm_fit(
    df: DataFrame, text_col: str, top_k_bigrams: int | None = None
) -> tuple[DataFrame, DataFrame, int]:
    """Train the bigram count model behind `ngram_lm_score`: lowercase
    whitespace unigram and bigram counts plus the vocabulary size for
    add-one smoothing.  Returns (unigrams(w1, c1), bigrams(w1, w2, c2),
    v).

    At 100 TB the model tables are corpus-vocabulary-sized — NOT
    broadcast material: the scoring pass hash-joins the token-pair
    stream against them (bucket both by the leading token and the join
    is co-partitioned).  ``v`` is the one driver scalar — a single
    bounded aggregate, same discipline as heavy_hitters' n_total.
    ``top_k_bigrams`` prunes the bigram table to the K most frequent
    (ties by gram) — the production knob that bounds model size for a
    100 TB fit; a pruned-away bigram backs off to the same smoothing
    mass as a truly unseen one (c2=0 via the scoring left join), so
    pruning only ever LOWERS a document's score, monotonically in K
    (pinned in tests/test_text.py).  The unpruned fit is the exact
    form the oracle replays."""
    toks = df.select(
        F.posexplode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "pos", "w"
        )
    )
    uni = toks.groupBy(F.col("w").alias("w1")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c1")
    )
    big = (
        df.select(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("t")
        )
        .select(
            F.posexplode(
                F.expr("transform(slice(t, 1, size(t) - 1), (x, i) -> struct(x AS w1, t[i + 1] AS w2))")
            ).alias("pos", "p")
        )
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
    )
    if top_k_bigrams is not None:
        # exact top-K by (c2 DESC, w1, w2) WITHOUT a global sort-limit
        # (TakeOrdered funnels K rows through the driver; production K
        # bounds a 100 TB model, so K itself is large).  Instead:
        # count-histogram → Kth-value threshold (the histogram is
        # distinct-count-sized, so its single-partition window is the
        # dimension-sized exception), keep everything strictly above
        # the threshold, and fill the remainder from the boundary
        # count's bucket by the deterministic (w1, w2) tiebreak — the
        # same boundary-bucket pattern budget_select uses.  Result set
        # is identical to ORDER BY c2 DESC, w1, w2 LIMIT K.
        k = int(top_k_bigrams)
        # Materialize the corpus-scale bigram aggregate ONCE before the
        # threshold collect: the histogram collect plus the above/
        # boundary union below would otherwise re-run the full
        # explode+groupBy lineage up to 3x (r9 advice).  localCheckpoint
        # truncates lineage so both union branches read the cached
        # aggregate (distinct-bigram-sized, not corpus-sized).
        big = big.localCheckpoint(eager=True)
        hist = big.groupBy("c2").agg(F.count(F.lit(1)).alias("nb"))
        hist = hist.withColumn(
            "cum",
            F.sum("nb").over(
                Window.orderBy(F.desc("c2")).rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        thr = (
            hist.filter(F.col("cum") >= k)
            .orderBy(F.desc("c2"))
            .limit(1)
            .collect()
        )
        if thr:  # else: fewer than K bigrams exist — keep all
            c_star = thr[0]["c2"]
            n_above = thr[0]["cum"] - thr[0]["nb"]
            above = big.filter(F.col("c2") > F.lit(c_star))
            boundary = (
                big.filter(F.col("c2") == F.lit(c_star))
                .withColumn(
                    "rn",
                    F.row_number().over(
                        Window.partitionBy("c2").orderBy("w1", "w2")
                    ),
                )
                .filter(F.col("rn") <= F.lit(k - n_above))
                .drop("rn")
            )
            big = above.unionByName(boundary)
    v = uni.count()
    return uni, big, v


def ngram_lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    uni: DataFrame,
    big: DataFrame,
    v: int,
) -> DataFrame:
    """Per-document add-one-smoothed bigram log-likelihood — the CCNet
    move: score every document under a reference n-gram LM and filter/
    bucket on the score (a paraphrased spam page and a clean page have
    similar lengths but very different likelihoods).

    Each token pair contributes ``ln((c2 + 1) / (c1 + V))``; the pair's
    double is FLOOR-QUANTIZED to integer micro-units BEFORE the
    per-document sum, so the aggregate is an order-free BIGINT sum (a
    float sum over an unordered group would fold engine partition
    order into the hash; the quantize-then-integer-sum trick is the
    same one the PQ/ADC family uses).  Unseen bigrams of seen words
    back off to the same smoothing mass automatically (c2=0 via left
    join); pairs whose LEADING word is unseen take c1=0 (pure 1/V) —
    every branch stays the identical expression on both engines.

    Scoring is two hash joins (pair stream × bigram counts × unigram
    counts) + one integer aggregate — joins on the gram keys the model
    tables are naturally partitioned by; no broadcast of model state.

    Returns (id, n_pairs, logp_x1m) — consumers divide/threshold
    downstream (no integer division here: Spark DIV truncates toward
    zero, DuckDB // floors, and log-likelihoods are negative).
    """
    pairs = (
        df.select(
            F.col(id_col).alias("sid"),
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("t"),
        )
        .select(
            "sid",
            F.explode(
                F.expr("transform(slice(t, 1, size(t) - 1), (x, i) -> struct(x AS w1, t[i + 1] AS w2))")
            ).alias("p"),
        )
        .select("sid", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    scored = (
        pairs.join(big, ["w1", "w2"], "left")
        .join(uni, ["w1"], "left")
        .select(
            "sid",
            F.floor(
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1).cast("double"))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(int(v)).cast("double"))
                )
                * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("lp_x1m"),
        )
    )
    return (
        scored.groupBy("sid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("lp_x1m").cast("bigint").alias("logp_x1m"),
        )
        .select(F.col("sid").alias(id_col), "n_pairs", "logp_x1m")
    )


_DUCK_LM_TOKS = "string_split_regex(trim(lower(text)), '\\s+')"


def _ngram_lm_oracle() -> str:
    return f"""
    WITH d AS (
      SELECT doc_id, {_DUCK_LM_TOKS} AS t FROM documents
    ),
    toks AS MATERIALIZED (
      SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS w FROM d
    ),
    uni AS MATERIALIZED (
      SELECT w AS w1, count(*)::BIGINT AS c1 FROM toks GROUP BY w
    ),
    pairs AS MATERIALIZED (
      SELECT doc_id, w AS w1,
             lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM toks
    ),
    p2 AS (SELECT doc_id, w1, w2 FROM pairs WHERE w2 IS NOT NULL),
    big AS MATERIALIZED (
      SELECT w1, w2, count(*)::BIGINT AS c2 FROM p2 GROUP BY w1, w2
    ),
    vv AS (SELECT count(*)::BIGINT AS v FROM uni),
    s AS (
      SELECT p2.doc_id,
             floor(ln((coalesce(big.c2, 0) + 1.0)
                      / (coalesce(uni.c1, 0) + (SELECT v FROM vv) * 1.0))
                   * 1000000.0)::BIGINT AS lp_x1m
      FROM p2
      LEFT JOIN big ON p2.w1 = big.w1 AND p2.w2 = big.w2
      LEFT JOIN uni ON p2.w1 = uni.w1
    )
    SELECT doc_id, count(*)::BIGINT AS n_pairs, sum(lp_x1m)::BIGINT AS logp_x1m
    FROM s GROUP BY doc_id
    """


@query("text_ngram_lm_score", oracle=_ngram_lm_oracle())
def text_ngram_lm_score_q(spark, sf_dir):
    """Bigram-LM log-likelihood per document (model = the corpus
    itself, add-one smoothing): the perplexity-filter primitive, with
    per-pair floor-quantized integer sums so the score is partition-
    order-free."""
    docs = load_table(spark, sf_dir, "documents")
    uni, big, v = ngram_lm_fit(docs, "text")
    return ngram_lm_score(docs, "doc_id", "text", uni, big, v)


# -- hashed-feature linear classifier (fastText-style inference) --------------

CLS_BUCKETS = 4096  # hashing-trick feature space (2^12, fastText default-ish)
_CLS_MULT = 2654435761  # Knuth multiplicative constant
_CLS_MOD = 1000003  # prime > 1e6: residues spread over ~[0, 1e6)
_CLS_SHIFT = _CLS_MOD // 2  # center weights on 0 → micro-units in ±0.5


def hashed_classifier_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = CLS_BUCKETS,
    margin_u: int = 0,
) -> DataFrame:
    """Linear text-classifier INFERENCE over hashed bag-of-n-gram
    features — the quality/domain-classifier stage every large
    training-data pipeline runs (CCNet/GPT-3/LLaMA-style: score each
    page with a cheap linear model, keep/bucket by the margin;
    fastText architecture: Joulin et al., "Bag of Tricks for Efficient
    Text Classification", 2017).

    Features: unigrams + bigrams hashed into ``n_buckets`` buckets
    (the hashing trick — no vocabulary table at any scale).  The
    weight TABLE is a deterministic pseudo-random stub standing in for
    trained weights, computed INLINE from the bucket id as pure
    integer algebra (w_b = (b·2654435761) mod 1000003 − 501001, i.e.
    micro-units in ±0.5) — the same bounded-stand-in-model contract as
    the modular PQ codebooks: production swaps in a trained table
    (broadcast k-row join or inline literals), every other moving part
    identical.

    Numerics: the per-doc logit is an exact BIGINT sum of integer
    micro-unit weights (order-free under any partitioning — the
    floor-quantize rule), the mean logit is integer division, and the
    label is an integer comparison — nothing float anywhere, so the
    output hashes bit-exactly cross-engine.

    Scale shape at 100 TB: one corpus scan; the gram explode is a
    narrow flatMap fanned out by the compute-bound-stage rule; hashing
    and the weight lookup are row-level codegen'd expressions (the md5
    chain is JVM-side; no join — the model is compiled into the plan);
    one keyed groupBy with map-side partial sums.  No driver state,
    no UDF, nothing all-pairs."""
    from dask_obj_spark.functions.hashing import word_ngrams

    ncores = df.sparkSession.sparkContext.defaultParallelism
    base = df.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("t")
    ).repartition(ncores, "doc_id")
    grams = base.select(
        "doc_id",
        F.explode(
            F.concat(word_ngrams(F.col("t"), 1), word_ngrams(F.col("t"), 2))
        ).alias("g"),
    )
    bucket = F.pmod(porthash(F.col("g"), "cls"), F.lit(n_buckets))
    w = (bucket * F.lit(_CLS_MULT)) % F.lit(_CLS_MOD) - F.lit(_CLS_SHIFT)
    scored = grams.select("doc_id", w.cast("long").alias("w"))
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams"),
        F.sum("w").cast("bigint").alias("logit_u"),
    ).select(
        "doc_id",
        "n_grams",
        "logit_u",
        F.expr("logit_u div n_grams").alias("mean_logit_u"),
        (F.expr("logit_u div n_grams") > F.lit(int(margin_u)))
        .cast("bigint")
        .alias("label"),
    )


def _hashed_classifier_oracle(
    n_buckets: int = CLS_BUCKETS, margin_u: int = 0
) -> str:
    from dask_obj_spark.functions.hashing import duck_word_ngrams

    return f"""
    WITH grams AS (
      SELECT doc_id,
             unnest(list_concat({duck_word_ngrams('text', 1)},
                                {duck_word_ngrams('text', 2)})) AS g
      FROM documents
    ), bw AS (
      SELECT doc_id,
             ({duck_porthash('g', 'cls')} % {n_buckets}) * {_CLS_MULT}
               % {_CLS_MOD} - {_CLS_SHIFT} AS w
      FROM grams
    ), agg AS (
      SELECT doc_id, count(*)::BIGINT AS n_grams, CAST(sum(w) AS BIGINT) AS logit_u
      FROM bw GROUP BY doc_id
    )
    SELECT doc_id, n_grams, logit_u,
           CAST(logit_u // n_grams AS BIGINT) AS mean_logit_u,
           CAST(CASE WHEN logit_u // n_grams > {margin_u} THEN 1 ELSE 0 END
                AS BIGINT) AS label
    FROM agg
    """


@query("text_hashed_classifier", oracle=_hashed_classifier_oracle())
def text_hashed_classifier_q(spark, sf_dir):
    """fastText-style hashed linear classifier inference over every
    document: exact integer logit over hashed unigram+bigram features,
    mean-logit margin label — the quality-classifier gate as one scan
    + one keyed aggregate, model compiled into the plan."""
    docs = load_table(spark, sf_dir, "documents")
    return hashed_classifier_score(docs, "doc_id", "text")


# -- per-document word entropy (diversity/gibberish filter) --------------------


def word_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document Shannon entropy of the word distribution — the
    diversity filter that separates natural prose from keyword-stuffed
    or looping gibberish (low entropy = few distinct words dominate;
    boilerplate and SEO spam score far below real text of the same
    length).  H = ln(n) − (Σ_w c_w·ln(c_w)) / n over word counts c_w.

    Numerics: the Σ c·ln(c) term is per-(doc, word) floor-quantized to
    integer micro-units BEFORE the per-doc sum (the LM-score pattern —
    a float sum over an unordered group would fold partition order
    into the hash), and the final H assembles from the exact integer
    sum with ln(n) computed once per doc.  Output in integer
    micro-nats: entropy_x1m = floor(ln(n)·1e6) − (Σ floor(c·ln(c)·1e6))
    DIV n — every step replayable bit-exactly.

    Scale: one scan → token explode → (doc, word) count → per-doc sum;
    two keyed aggregates on the same doc partitioning."""
    ncores = df.sparkSession.sparkContext.defaultParallelism
    toks = (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("t"))
        .repartition(ncores, "doc_id")
        .select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.coalesce(F.col("t"), F.lit("")))), r"\s+"),
                    lambda x: x != "",
                )
            ).alias("w"),
        )
    )
    wc = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    per_word = wc.select(
        "doc_id",
        "c",
        F.floor(F.col("c").cast("double") * F.log(F.col("c").cast("double")) * 1e6)
        .cast("bigint")
        .alias("clnc_u"),
    )
    agg = per_word.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum("clnc_u").cast("bigint").alias("sum_clnc_u"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        (
            F.floor(F.log(F.col("n_tokens").cast("double")) * 1e6).cast("bigint")
            - F.expr("sum_clnc_u div n_tokens")
        ).alias("entropy_x1m"),
    )


@query(
    "text_word_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(
               string_split_regex(trim(lower(coalesce(text, ''))), '\\s+'),
               x -> x <> '')) AS w
      FROM documents
    ), wc AS (
      SELECT doc_id, w, count(*)::BIGINT AS c FROM toks GROUP BY doc_id, w
    ), pw AS (
      SELECT doc_id, c,
             floor(c::DOUBLE * ln(c::DOUBLE) * 1e6)::BIGINT AS clnc_u
      FROM wc
    ), agg AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             count(*)::BIGINT AS n_distinct,
             CAST(sum(clnc_u) AS BIGINT) AS sum_clnc_u
      FROM pw GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, n_distinct,
           floor(ln(n_tokens::DOUBLE) * 1e6)::BIGINT
             - (sum_clnc_u // n_tokens) AS entropy_x1m
    FROM agg
    """,
)
def text_word_entropy_q(spark, sf_dir):
    """Word-distribution Shannon entropy per document in integer
    micro-nats — the diversity/gibberish filter, with the per-(doc,
    word) floor-quantize + exact integer sum making the score
    partition-order-free."""
    docs = load_table(spark, sf_dir, "documents")
    return word_entropy(docs, "doc_id", "text")


# -- filter-agreement audit (classifier × heuristic cross-tab) ----------------


def filter_agreement(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Agreement cross-tab between the two independent quality gates —
    the hashed-linear classifier's margin label and the heuristic
    quality-score decile — the audit a pipeline owner reads before
    trusting either filter alone: off-diagonal mass (classifier says
    keep, heuristics say junk, or vice versa) is exactly where manual
    review goes, and a drifting crawl moves mass across the diagonal
    before either gate's pass-rate alone shows it.

    Two corpus scans by necessity (the two scorers traverse different
    shapes: gram explode + keyed aggregate vs per-row HOF projection),
    joined on the id, aggregated onto ≤ 2×10 cells.  The join is
    doc-keyed and disappears into the classifier's existing doc_id
    partitioning; output is dimension-sized."""
    cls = hashed_classifier_score(df, id_col, text_col).select(
        F.col("doc_id"), F.col("label").alias("cls_keep")
    )
    q = quality_scores(df, id_col, text_col).select(
        F.col(id_col).alias("doc_id"),
        F.least(
            F.floor(F.col("quality") * F.lit(10.0)).cast("int"), F.lit(9)
        ).alias("q_decile"),
    )
    return (
        cls.join(q, "doc_id")
        .groupBy("cls_keep", "q_decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


def _filter_agreement_oracle() -> str:
    cls = _hashed_classifier_oracle()
    return f"""
    WITH cls AS ({cls}),
    q AS ({duck_quality_select()})
    SELECT c.label AS cls_keep,
           least(floor(q.quality * 10.0)::INTEGER, 9) AS q_decile,
           count(*)::BIGINT AS n_docs
    FROM cls c JOIN q ON c.doc_id = q.doc_id
    GROUP BY 1, 2
    """


@query("eval_filter_agreement", oracle=_filter_agreement_oracle())
def eval_filter_agreement_q(spark, sf_dir):
    """Classifier-vs-heuristic agreement matrix: (margin label ×
    quality decile) doc counts — the filter-audit readout that
    localizes disagreement mass before either gate runs alone at
    100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    return filter_agreement(docs, "doc_id", "text")


# -- readability (Flesch-style, vowel-group syllable proxy) --------------------


def readability_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Flesch-reading-ease-style readability per document, with the
    standard vowel-group syllable proxy (a syllable ≈ one maximal
    [aeiouy]+ run — the classic approximation when no dictionary is
    available): score = 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words).  The grade-level filter a children's-book
    vs legalese mixture decision reads.

    All three counts are exact integers from one JVM regexp pass each
    (no UDF); the score itself is three IEEE ops on integer-valued
    doubles, floor-quantized to milli-units — deterministic
    cross-engine.  Sentence count is max(1, [.!?]+ runs); empty docs
    emit zero counts and the degenerate score of the constant term."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.size(F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != ""))
    sents = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(t, F.lit(r"[.!?]+"), 0))
    )
    sylls = F.size(F.regexp_extract_all(F.lower(t), F.lit("[aeiouy]+"), 0))
    wps = words.cast("double") / sents.cast("double")
    spw = sylls.cast("double") / F.greatest(words, F.lit(1)).cast("double")
    score = (
        F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        words.cast("bigint").alias("n_words"),
        sents.cast("bigint").alias("n_sentences"),
        sylls.cast("bigint").alias("n_syllables"),
        F.floor(score * F.lit(1000.0)).cast("bigint").alias("flesch_x1k"),
    )


@query(
    "text_readability",
    oracle="""
    WITH c AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(trim(coalesce(text, '')), '\\s+'),
                             x -> x <> ''))::BIGINT AS n_words,
             greatest(1, len(regexp_extract_all(coalesce(text, ''),
                                                '[.!?]+')))::BIGINT AS n_sentences,
             len(regexp_extract_all(lower(coalesce(text, '')),
                                    '[aeiouy]+'))::BIGINT AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           floor((206.835
                  - 1.015 * (n_words::DOUBLE / n_sentences::DOUBLE)
                  - 84.6 * (n_syllables::DOUBLE
                            / greatest(n_words, 1)::DOUBLE)) * 1000.0)::BIGINT
             AS flesch_x1k
    FROM c
    """,
)
def text_readability_q(spark, sf_dir):
    """Flesch-style readability per document (vowel-group syllable
    proxy), floor-quantized to milli-units — exact integer counts,
    three IEEE ops, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    return readability_scores(docs, "doc_id", "text")


# -- code-vs-prose detection (heuristic signals) -------------------------------


def code_detect(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic code-vs-prose detector — the routing signal a mixed
    crawl needs before sending documents to a code pipeline (different
    dedup granularity, different quality rules): counts of code-ish
    tokens (brace/bracket/semicolon/operator characters), indented
    lines, and camelCase/snake_case identifiers, folded into an
    integer code-likelihood in micro-units.  Pure JVM regexp algebra,
    one scan, no UDF — every count exact, the fold a fixed integer
    expression, so the score is engine-portable by construction."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.greatest(F.length(t), F.lit(1))
    sym = F.length(t) - F.length(F.regexp_replace(t, r"[{}\[\]();=<>|&]", ""))
    idents = F.size(
        F.regexp_extract_all(
            t, F.lit(r"\b[a-z]+(?:_[a-z0-9]+|[A-Z][a-z0-9]+)\w*\b"), 0
        )
    )
    indented = F.size(F.regexp_extract_all(t, F.lit(r"(?m)^(?:    |\t)"), 0))
    words = F.greatest(
        F.size(F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != "")),
        F.lit(1),
    )
    score = (
        F.lit(600000) * sym.cast("bigint") / n_chars.cast("bigint")
        + F.lit(300000) * idents.cast("bigint") / words.cast("bigint")
        + F.lit(100000) * F.least(indented.cast("bigint"), F.lit(10)) / F.lit(10)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        sym.cast("bigint").alias("n_sym"),
        idents.cast("bigint").alias("n_idents"),
        indented.cast("bigint").alias("n_indented"),
        F.floor(score).cast("bigint").alias("code_score_u"),
    )


@query(
    "text_code_detect",
    oracle=r"""
    WITH c AS (
      SELECT doc_id, coalesce(text, '') AS t FROM documents
    ), f AS (
      SELECT doc_id,
             (length(t) - length(regexp_replace(t, '[{}\[\]();=<>|&]', '', 'g')))::BIGINT AS n_sym,
             len(regexp_extract_all(t, '\b[a-z]+(?:_[a-z0-9]+|[A-Z][a-z0-9]+)\w*\b'))::BIGINT AS n_idents,
             len(regexp_extract_all(t, '(?m)^(?:    |\t)'))::BIGINT AS n_indented,
             greatest(length(t), 1)::BIGINT AS n_chars,
             greatest(len(list_filter(string_split_regex(trim(t), '\s+'),
                                      x -> x <> '')), 1)::BIGINT AS n_words
      FROM c
    )
    SELECT doc_id, n_sym, n_idents, n_indented,
           floor(600000 * n_sym / n_chars::DOUBLE
                 + 300000 * n_idents / n_words::DOUBLE
                 + 100000 * least(n_indented, 10) / 10.0)::BIGINT AS code_score_u
    FROM f
    """,
)
def text_code_detect_q(spark, sf_dir):
    """Code-vs-prose routing signal per document: symbol density,
    identifier-shape hits, indented lines — integer counts folded to a
    micro-unit score, one regexp scan."""
    docs = load_table(spark, sf_dir, "documents")
    return code_detect(docs, "doc_id", "text")
