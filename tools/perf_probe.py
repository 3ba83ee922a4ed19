#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1).

For each requested bench row:
  - writes `.explain("formatted")` to plans/r15/<bench>_<tag>.txt
  - times the noop materialization (guide §1.4) with a job-group label
    (guide §1.5) and, with the UI enabled, attributes wall time to the
    individual Spark jobs/stages via the REST API so the expensive
    stage of each query is identifiable without the interactive UI.

Usage:
    python tools/perf_probe.py [--tag before|after] [--runs 2]
                               [--plans-dir plans/r16] [b15 b23 ...]

Writes a JSON report to /tmp/perf_probe_<tag>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import WORKLOAD  # noqa: E402
from dask_obj_spark.queries import QUERIES, load_all_queries  # noqa: E402
from dask_obj_spark.session import get_spark  # noqa: E402


def rest(app_url: str, path: str):
    with urllib.request.urlopen(app_url + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    runs = 2
    plans_dir = "plans/r16"
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--runs":
            runs = int(next(it))
        elif a == "--plans-dir":
            plans_dir = next(it)
        else:
            names.append(a)
    if not names:
        names = list(WORKLOAD)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="perf-probe", extra_conf={"spark.ui.enabled": "true"}
    )
    load_all_queries()
    sc = spark.sparkContext
    app_id = sc.applicationId
    ui = f"http://localhost:4040/api/v1/applications/{app_id}"
    os.makedirs(plans_dir, exist_ok=True)

    report: dict[str, dict] = {}
    for bench_name in names:
        qname = WORKLOAD[bench_name]
        fn = QUERIES[qname]

        # plan capture (cheap, driver-side)
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"{plans_dir}/{bench_name}_{tag}.txt", "w") as fh:
            fh.write(plan)

        # warm runs, then one attributed run
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            warm = time.perf_counter() - t0

        jobs_before = {j["jobId"] for j in rest(ui, "/jobs")}
        sc.setJobGroup(bench_name, bench_name)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup("", "")

        jobs = [
            j
            for j in rest(ui, "/jobs")
            if j["jobId"] not in jobs_before
        ]
        job_rows = []
        stage_rows = []
        for j in sorted(jobs, key=lambda j: j["jobId"]):
            dur = None
            if j.get("submissionTime") and j.get("completionTime"):
                from datetime import datetime

                f = "%Y-%m-%dT%H:%M:%S.%f%Z"
                t_a = datetime.strptime(j["submissionTime"], f)
                t_b = datetime.strptime(j["completionTime"], f)
                dur = (t_b - t_a).total_seconds()
            job_rows.append(
                {
                    "jobId": j["jobId"],
                    "sec": dur,
                    "numTasks": j.get("numTasks"),
                    "stages": j.get("stageIds"),
                    "desc": (j.get("description") or "")[:80],
                }
            )
            for sid in j.get("stageIds", []):
                try:
                    sts = rest(ui, f"/stages/{sid}")
                except Exception:
                    continue
                for st in sts:
                    if st.get("status") != "COMPLETE":
                        continue
                    stage_rows.append(
                        {
                            "stageId": sid,
                            "jobId": j["jobId"],
                            "numTasks": st.get("numTasks"),
                            "executorRunTime_ms": st.get("executorRunTime"),
                            "name": (st.get("name") or "")[:70],
                        }
                    )
        report[bench_name] = {
            "wall": round(wall, 3),
            "warm_prev": round(warm, 3),
            "n_jobs": len(job_rows),
            "n_tasks": sum(j["numTasks"] or 0 for j in job_rows),
            "jobs": job_rows,
            "stages": sorted(
                stage_rows,
                key=lambda s: -(s["executorRunTime_ms"] or 0),
            )[:12],
        }
        print(
            f"# {bench_name}: wall={wall:.3f}s jobs={len(job_rows)} "
            f"tasks={report[bench_name]['n_tasks']}",
            file=sys.stderr,
        )

    out = f"/tmp/perf_probe_{tag}.json"
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(out)


if __name__ == "__main__":
    main()
