"""Per-JOB profile of one query's construction+execution (guide §1.5/§7.1).

Where profile_query.py reports totals (construct vs execute, job/stage
counts), this dumps EVERY job the query submits — name, duration, task
count — in submission order, so a construct-bound chain (VERDICT r10
"What's wrong" #5) can be read job by job: which eager checkpoint, which
Lloyd round, which collect is paying the latency.

Usage: python tools/profile_jobs.py <query> [--sf DIR] [--out F]
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
    out_path = "/tmp/profile_jobs.json"
    args: list[str] = []
    it = iter(sys.argv[1:])
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--out":
            out_path = next(it)
        else:
            args.append(a)
    name = args[0]

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    cpus = os.environ["SPARK_GRAFT_CPUS"]
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile_jobs")
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
    qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
    # warm run at the bench SF (discarded), then the measured run
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext
    sc.setJobGroup(f"prof_{name}", name)
    t0 = time.perf_counter()
    df = qs[name](spark, sf_dir)
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    sc.setJobGroup(None, None)

    jobs = _rest(base, f"/api/v1/applications/{app_id}/jobs")
    mine = sorted(
        (j for j in jobs if j.get("jobGroup") == f"prof_{name}"),
        key=lambda j: j["jobId"],
    )
    rows = []
    prev_end = None
    for j in mine:
        sub = j.get("submissionTime", "")
        comp = j.get("completionTime", "")

        def _ms(ts: str) -> float:
            from datetime import datetime

            return datetime.strptime(ts[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

        dur = gap = None
        if sub and comp:
            dur = round(_ms(comp) - _ms(sub), 3)
            if prev_end is not None:
                gap = round(_ms(sub) - prev_end, 3)
            prev_end = _ms(comp)
        rows.append(
            {
                "jobId": j["jobId"],
                "name": (j.get("name") or "")[:110],
                "desc": (j.get("description") or "")[:60],
                "dur_s": dur,
                "gap_s": gap,
                "n_tasks": j.get("numTasks"),
            }
        )
    rec = {
        "query": name,
        "construct_s": round(t1 - t0, 3),
        "execute_s": round(t2 - t1, 3),
        "n_jobs": len(rows),
        "jobs": rows,
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec, indent=2))
    print(f"-> {out_path}")


if __name__ == "__main__":
    main()
