#!/usr/bin/env python
"""r16 adjudication probe (r15 verdict next-round #2): 8 timed reps of
each regression-cluster row under the official bench methodology
(warmups + noop materialization), steal-bracketed per rep, written to
plans/r16/measurements/cluster_probe.json.

Usage: python tools/cluster_probe.py [--reps 8] [rows...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import WORKLOAD, materialize, prime_page_cache  # noqa: E402
from dask_obj_spark.queries import QUERIES, load_all_queries  # noqa: E402
from dask_obj_spark.session import get_spark  # noqa: E402

CLUSTER = [
    "b26_bloom_semijoin",
    "b27_bfs_ann",
    "b29_dsir_topk",
    "b36_ngram_lm",
    "b37_budget_select",
    "b40_hashed_classifier",
    "b41_span_corruption",
]

R14_OFFICIAL = {
    "b26_bloom_semijoin": 0.746,
    "b27_bfs_ann": 3.172,
    "b29_dsir_topk": 1.255,
    "b36_ngram_lm": 1.059,
    "b37_budget_select": 1.205,
    "b40_hashed_classifier": 0.581,
    "b41_span_corruption": 1.047,
}


def steal_jiffies() -> int:
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[9])


def main() -> None:
    args = sys.argv[1:]
    reps = 8
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--reps":
            reps = int(next(it))
        else:
            names.append(a)
    if not names:
        names = CLUSTER

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    prime_page_cache(sf_dir)
    spark = get_spark(app_name="cluster-probe")
    load_all_queries()

    report: dict[str, dict] = {}
    for bench_name in names:
        fn = QUERIES[WORKLOAD[bench_name]]
        # official warmups
        for _ in range(2):
            materialize(fn(spark, sf_dir))
        runs = []
        for _ in range(reps):
            s0 = steal_jiffies()
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            wall = time.perf_counter() - t0
            runs.append(
                {"sec": round(wall, 3),
                 "steal_cpu_s": round((steal_jiffies() - s0) / 100.0, 2)}
            )
        secs = sorted(r["sec"] for r in runs)
        med = secs[len(secs) // 2] if reps % 2 else (
            (secs[reps // 2 - 1] + secs[reps // 2]) / 2
        )
        report[bench_name] = {
            "reps": runs,
            "median": round(med, 3),
            "min": secs[0],
            "r14_official": R14_OFFICIAL.get(bench_name),
            "median_vs_r14": round(med / R14_OFFICIAL[bench_name], 3)
            if bench_name in R14_OFFICIAL
            else None,
        }
        print(
            f"{bench_name}: median {med:.3f} min {secs[0]:.3f} "
            f"(r14 {R14_OFFICIAL.get(bench_name)})",
            file=sys.stderr,
        )

    out = "plans/r16/measurements/cluster_probe.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(out)


if __name__ == "__main__":
    main()
