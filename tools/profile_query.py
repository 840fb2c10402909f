#!/usr/bin/env python
"""Per-job profile of one or more headline queries (round 13, guide §1/§7).

Runs each named query in the bench session shape (get_spark, warmed the
way bench.py warms) but with the Spark UI ON, then reads the UI REST API
for per-job wall times and shuffle volumes so the slow *operator* inside
a multi-job query is identifiable without eyeballing logs.

Usage: python tools/profile_query.py q82_triangle_counts text_textrank
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
Writes /tmp/profile_<name>.json per query plus a stdout summary.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_cpc_schema_spark import queries as Q  # noqa: E402
from etl_cpc_schema_spark.session import get_spark  # noqa: E402


def _api(port: int, path: str):
    url = f"http://localhost:{port}/api/v1{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4055"},
    )
    app_id = spark.sparkContext.applicationId
    # bench-shape warm-up: JVM/footers + python workers
    Q.SPARK_QUERIES["q09_group_count"](spark, sf_dir).collect()

    def _warm(batches):
        import numpy  # noqa: F401

        yield from batches

    spark.range(256).repartition(64).mapInPandas(_warm, schema="id long").collect()

    for name in names:
        fn = Q.SPARK_QUERIES[name]
        fn(spark, sf_dir).collect()  # warm run (index caches, codegen)
        jobs_before = {j["jobId"] for j in _api(4055, f"/applications/{app_id}/jobs")}
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"profile:{name}")
        fn(spark, sf_dir).collect()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        jobs = [
            j
            for j in _api(4055, f"/applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        out = []
        for j in jobs:
            dur = None
            if j.get("completionTime") and j.get("submissionTime"):
                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                st = time.mktime(time.strptime(j["submissionTime"], fmt))
                en = time.mktime(time.strptime(j["completionTime"], fmt))
                # sub-second part
                dur = en - st
            out.append(
                {
                    "jobId": j["jobId"],
                    "sec": dur,
                    "stages": j.get("numCompletedStages"),
                    "tasks": j.get("numCompletedTasks"),
                    "desc": (j.get("description") or j.get("name", ""))[:120],
                }
            )
        # per-stage metrics RESTRICTED to the profiled run's own jobs
        # (round 13: the session-wide stage list mixed every previously
        # profiled query into stages_top_runtime, which mis-attributed
        # the single-task-scan diagnosis)
        run_stage_ids = {
            sid for j in jobs for sid in (j.get("stageIds") or [])
        }
        stages = _api(4055, f"/applications/{app_id}/stages?status=complete")
        stage_rows = [
            {
                "stageId": s["stageId"],
                "sec": round(s.get("executorRunTime", 0) / 1000.0, 2),
                "tasks": s.get("numCompleteTasks"),
                "in_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "sh_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "name": s.get("name", "")[:80],
            }
            for s in stages
            if s["stageId"] in run_stage_ids
        ]
        single_task_sec = round(
            sum(r["sec"] for r in stage_rows if r["tasks"] == 1), 2
        )
        total_exec_sec = round(sum(r["sec"] for r in stage_rows), 2)
        report = {
            "query": name,
            "wall_sec": round(wall, 3),
            "n_jobs": len(jobs),
            "exec_sec_total": total_exec_sec,
            "exec_sec_single_task_stages": single_task_sec,
            "jobs": out,
            "stages_top_runtime": sorted(
                stage_rows, key=lambda r: -r["sec"]
            )[:15],
        }
        with open(f"/tmp/profile_{name}.json", "w") as fh:
            json.dump(report, fh, indent=1)
        print(
            f"{name}: wall={wall:.2f}s jobs={len(jobs)} "
            f"(detail /tmp/profile_{name}.json)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
