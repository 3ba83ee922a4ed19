#!/usr/bin/env python
"""Benchmark harness: BASELINE.md §2 workload (B1-B8) at sf0.1.

Runs each headline query end-to-end (materialized via the `noop` sink so
executor-side work is measured, not driver row transfer), median of 3
warm runs after 1 warmup. Prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"b1_counts": sec, ...}, "sf": 0.1}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dask_obj_spark.queries import QUERIES, load_all_queries
from dask_obj_spark.session import get_spark

# bench name → registered query (BASELINE.md §2 row)
WORKLOAD = {
    "b1_counts": "counts_event_type",
    "b2_foldby_agg": "tpch_q1_agg",
    "b3_join_agg": "join_lineitem_orders",
    "b4_topk": "topk_orders",
    "b5_flatten": "flatten_embeddings",
    "b6_dedup_exact": "dedup_exact_groups",
    "b6_dedup_minhash": "dedup_minhash_pairs",
    "b7_cosine_topk": "sim_cosine_topk_brute",
    "b7_cosine_topk_np": "sim_cosine_topk_numpy_rowsonly",
    "b8_window_agg": "window_tumbling_events",
    # beyond BASELINE.md §2: regression-track the optimized custom operators
    "b9_text_fingerprints": "text_fingerprints",
    "b10_clean_pipeline": "pipeline_clean_corpus",
    "b11_dedup_clusters": "corpus_dedup_clusters",
    "b12_contamination": "corpus_contamination",
    # round-3 operators (baselines recorded in BASELINE.md §3 addendum)
    "b13_semantic_dedup": "dedup_semantic",
    "b14_capstone_pack": "capstone_semantic_chunk_pack",
    "b15_bpe_merges": "corpus_bpe_merges",
    "b16_span_dedup": "text_span_dedup",
    "b17_pmi_bigrams": "text_pmi_bigrams",
    "b18_zorder_keys": "layout_zorder_keys",
    "b19_knn_triangles": "sim_knn_triangles",
    "b20_pca_power": "sim_pca_power",
    # round-4 operators
    "b21_pca_topk": "sim_pca_topk",
    "b22_rrf_hybrid": "retrieval_rrf_hybrid",
    "b23_mmr_topk": "sim_mmr_topk",
    "b24_sorted_neighborhood": "dedup_sorted_neighborhood",
    "b25_bfs_hops": "graph_bfs_hops",
    "b26_bloom_semijoin": "join_bloom_prefilter",
    # round-5 operators
    "b27_bfs_ann": "graph_bfs_ann",
    "b28_tree_reduction": "facade_tree_reduction",
    # round-6 operators
    "b29_dsir_topk": "corpus_dsir_topk",
    "b30_kcenter_coreset": "sim_kcenter_coreset",
    "b31_stream_neardup": "stream_neardup_minhash",
    # round-7 operators
    "b32_maxsim_rerank": "retrieval_maxsim_rerank",
    "b33_binary_hamming": "sim_binary_hamming_topk",
    "b34_heavy_hitters": "sketch_heavy_hitters",
    "b35_bpe_encode": "corpus_bpe_encode_rowsonly",
    # round-8 operators
    "b36_ngram_lm": "text_ngram_lm_score",
    "b37_budget_select": "corpus_budget_select",
    "b38_decayed_topk": "stream_decayed_topk",
    # round-9 operators: matryoshka is the one real pair-pass harness
    # (the others are dimension-sized or streaming-drain-dominated —
    # BASELINE.md §5 round-10 note)
    "b39_matryoshka": "sim_matryoshka_recall",
    # round-10 operators: the classifier (corpus gram explode + inline
    # model) and span corruption (token windows + order-exact assembly)
    # are the two real workloads; fim/entropy/mm rows are sub-second
    # scan-projects and the quantized-kmeans harness is priced by its
    # linear-in-N interpreted fold (BASELINE.md §5 round-10 note)
    "b40_hashed_classifier": "text_hashed_classifier",
    "b41_span_corruption": "corpus_span_corruption",
    # round-12 addition: the completed avro component (write events to a
    # container + split-stream it back + aggregate) gets a per-round
    # official perf record like every other first-class source/sink
    "b42_avro_roundtrip": "source_avro_roundtrip",
}

# per-row (warmup, timed) overrides: b28 is a 4096-task SCHEDULING probe
# (~30 s/run is python-worker task launch, by design) — median of 3 with
# one warmup keeps the bench total sane while still locking the row
RUNS_OVERRIDE = {
    "b28_tree_reduction": (1, 3),
    # b31 stands up a fresh two-batch streaming pipeline (scratch files +
    # checkpoint + foreachBatch upserts) per run — end-to-end cost is
    # dominated by the fixed streaming-job machinery, so 3 timed runs
    # bound the bench total the same way b28's override does
    "b31_stream_neardup": (1, 3),
    # b38 stands up a fresh three-batch streaming pipeline per run (same
    # fixed streaming-job machinery as b31)
    "b38_decayed_topk": (1, 3),
    # b42 re-WRITES the container and re-reads it every run (the write IS
    # the operator under test) — 3 timed runs bound the bench total the
    # same way the streaming rows' overrides do
    "b42_avro_roundtrip": (1, 3),
}

WARMUP_RUNS = 1
# 5 timed runs (median): this host shows multi-second noise spikes under
# concurrent load; a wider median window keeps one spike from defining
# the recorded number
TIMED_RUNS = 5

# Adaptive warm-up extension (BASELINE.md §4 round-13 amendment): the
# locks are medians of WARM runs, but the depth of the JVM's JIT
# tier-up tail varies with host state — r13 observed first runs of 17 s
# settling to the sub-second lock only over ~5 runs (identical code,
# identical plan; the r12 official run settled within the single fixed
# warmup).  After the fixed warm-ups, keep warming while each run is
# still >25% faster than the best seen, up to this many extra runs —
# so the timed median measures steady state on slow-warm-up days and
# costs two extra runs per row on normal days.  RUNS_OVERRIDE rows are
# exempt (their cost is fixed machinery, not JIT tiering).
# TWO consecutive settled runs are required (r13 verdict #7): a single
# mid-descent GC hiccup reads as "settled" by the >25% rule and would
# end the warmup early on a bimodal row; a hiccup does not repeat twice
# in a row, while genuine steady state does.
ADAPTIVE_WARMUP_MAX = 5
ADAPTIVE_DESCENT = 1.25
ADAPTIVE_SETTLED_RUNS = 2


def materialize(df) -> None:
    """Run the full plan on the executors; no rows cross to the driver."""
    df.write.format("noop").mode("overwrite").save()


def _timed_run(fn, spark, sf_dir) -> float:
    t0 = time.perf_counter()
    materialize(fn(spark, sf_dir))
    return time.perf_counter() - t0


def adaptive_warmup(wtimes: list, run_once) -> list:
    """Extend the fixed warmup until ADAPTIVE_SETTLED_RUNS consecutive
    runs are within ADAPTIVE_DESCENT of the best seen (max
    ADAPTIVE_WARMUP_MAX extra runs).  ``wtimes`` (the fixed-warmup
    timings) is mutated in place and returned; ``run_once`` performs
    one run and returns its wall seconds."""
    consec = 0
    for _ in range(ADAPTIVE_WARMUP_MAX):
        t = run_once()
        settled = t >= min(wtimes) / ADAPTIVE_DESCENT
        wtimes.append(t)
        consec = consec + 1 if settled else 0
        if consec >= ADAPTIVE_SETTLED_RUNS:
            break
    return wtimes


class _StreamFailureGuard:
    """Fail a bench row if ANY streaming query it started terminated with
    an exception — a timed run whose stream died mid-flight must not let
    the median silently cover it (round-6 verdict, harness hygiene).
    The b31 trace BENCH_r06 captured turned out NOT to be a dying
    stream: it was the first-batch `read.parquet(<bands history>)`
    FileNotFoundException, logged with its full stack from inside the
    MicroBatchExecution thread before the Python handler swallowed it
    (now exists-guarded in streaming/windows._read_parquet_if_exists) —
    but the guard stays, because with it a REAL stream death turns the
    row into a loud failure instead of a logged curiosity."""

    def __init__(self, spark):
        from pyspark.sql.streaming import StreamingQueryListener

        guard = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                pass

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                if event.exception is not None:
                    guard.failures.append(str(event.exception))

        self.failures: list[str] = []
        self._listener = _L()
        spark.streams.addListener(self._listener)

    def check(self, bench_name: str) -> None:
        if self.failures:
            raise RuntimeError(
                f"{bench_name}: streaming query terminated with exception "
                f"during a bench run: {self.failures}"
            )


def prime_page_cache(sf_dir: str) -> None:
    """Read every input file's bytes once so the OS page cache is warm.

    The BASELINE.md locks are medians of WARM runs (§3 methodology); on a
    freshly booted host the first few runs of an input-heavy row pay cold
    disk reads instead (observed: b7 2.3 s cold vs 1.0 s warm on
    identical code), which is host state, not plan shape.  Priming makes
    the harness match the locked methodology regardless of boot state.
    """
    for root, _dirs, files in os.walk(sf_dir):
        for name in files:
            try:
                with open(os.path.join(root, name), "rb") as fh:
                    while fh.read(1 << 24):
                        pass
            except OSError:
                pass


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    prime_page_cache(sf_dir)
    spark = get_spark(app_name="dask_obj_spark-bench")
    load_all_queries()
    stream_guard = _StreamFailureGuard(spark)

    timings: dict[str, float] = {}
    for bench_name, qname in WORKLOAD.items():
        fn = QUERIES[qname]
        warmups, timed = RUNS_OVERRIDE.get(bench_name, (WARMUP_RUNS, TIMED_RUNS))
        wtimes = []
        for _ in range(warmups):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            wtimes.append(time.perf_counter() - t0)
        if bench_name not in RUNS_OVERRIDE:
            adaptive_warmup(wtimes, lambda: _timed_run(fn, spark, sf_dir))
        runs = []
        for _ in range(timed):
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        stream_guard.check(bench_name)
        timings[bench_name] = round(statistics.median(runs), 3)
        print(f"# {bench_name} ({qname}): {timings[bench_name]}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "baseline_workload_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
