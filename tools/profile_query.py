"""Per-query profiler for the optimization rounds (guide §1).

For each named query, measures with a warm JVM:
  - t_construct: driver-side DataFrame construction (includes any eager
    checkpoints / count probes the builder runs)
  - t_execute:  the noop-sink materialization of the returned frame
and, via the UI REST API (enabled just for profiling), the number of
jobs/stages/tasks and total shuffle read/write bytes attributed to the
query (job-group scoped), so "where does the time go" can be read off
one JSON instead of eyeballed.

Usage: python tools/profile_query.py [query ...] [--sf DIR] [--out F]
Defaults to the bench HEADLINE list.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_path = "/tmp/profile_queries.json"
    args: list[str] = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--out":
            out_path = next(it)
        else:
            args.append(a)

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    cpus = os.environ["SPARK_GRAFT_CPUS"]
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedJobs", "10000")
        .config("spark.ui.retainedStages", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"
    app_id = spark.sparkContext.applicationId

    import __spark_entry__ as entry

    qs = entry.queries()
    if not args:
        import bench

        args = bench.HEADLINE

    # JVM warmup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs[args[0]](spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()

    results = {}
    for name in args:
        sc = spark.sparkContext
        # warmup run (discarded)
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        sc.setJobGroup(f"prof_{name}", name)
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        sc.setJobGroup(None, None)
        jobs = _rest(base, f"/api/v1/applications/{app_id}/jobs")
        mine = [j for j in jobs if j.get("jobGroup") == f"prof_{name}"]
        stage_ids = sorted({s for j in mine for s in j["stageIds"]})
        n_tasks = sum(j.get("numTasks", 0) for j in mine)
        sread = swrite = 0
        n_stages_run = 0
        for sid in stage_ids:
            try:
                sts = _rest(base, f"/api/v1/applications/{app_id}/stages/{sid}")
            except Exception:
                continue
            for st in sts:
                if st.get("status") == "COMPLETE":
                    n_stages_run += 1
                    sread += st.get("shuffleReadBytes", 0)
                    swrite += st.get("shuffleWriteBytes", 0)
        results[name] = {
            "construct_s": round(t1 - t0, 3),
            "execute_s": round(t2 - t1, 3),
            "total_s": round(t2 - t0, 3),
            "n_jobs": len(mine),
            "n_stages": len(stage_ids),
            "n_stages_run": n_stages_run,
            "n_tasks": n_tasks,
            "shuffle_read_mb": round(sread / 1e6, 2),
            "shuffle_write_mb": round(swrite / 1e6, 2),
        }
        print(name, json.dumps(results[name]), flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"-> {out_path}")


if __name__ == "__main__":
    main()
