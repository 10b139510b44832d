"""Per-stage drill-down profiler (guide §1.1/§7.1): for each named query,
prints every stage the query ran with its executorRunTime, task count,
input/shuffle bytes and the stage's name (first line of the call site),
so the expensive stage can be identified without the UI.

Usage: python tools/profile_stages.py <query> [query ...] [--sf DIR]
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
    args: list[str] = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        else:
            args.append(a)

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    cpus = os.environ["SPARK_GRAFT_CPUS"]
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_stages")
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

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs[args[0]](spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()

    for name in args:
        sc = spark.sparkContext
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
        print(f"\n=== {name}: construct {t1-t0:.2f}s execute {t2-t1:.2f}s "
              f"jobs {len(mine)}")
        rows = []
        for sid in stage_ids:
            try:
                sts = _rest(base, f"/api/v1/applications/{app_id}/stages/{sid}")
            except Exception:
                continue
            for st in sts:
                if st.get("status") != "COMPLETE":
                    continue
                rows.append((
                    st.get("executorRunTime", 0),
                    sid,
                    st.get("numCompleteTasks", 0),
                    st.get("inputBytes", 0) / 1e6,
                    st.get("shuffleReadBytes", 0) / 1e6,
                    st.get("shuffleWriteBytes", 0) / 1e6,
                    (st.get("description") or st.get("name") or "")[:90],
                ))
        rows.sort(reverse=True)
        print(f"{'runtime_ms':>10} {'stage':>5} {'tasks':>5} {'inMB':>7} "
              f"{'srdMB':>7} {'swrMB':>7}  name")
        for r in rows:
            print(f"{r[0]:10d} {r[1]:5d} {r[2]:5d} {r[3]:7.1f} {r[4]:7.1f} "
                  f"{r[5]:7.1f}  {r[6]}")


if __name__ == "__main__":
    main()
