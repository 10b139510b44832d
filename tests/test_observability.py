"""observe() metrics (A1/A2) and partition-pruning plan checks."""

from pyspark.sql import functions as F

from aws_vpc_flow_log_appender_spark import fixtures
from aws_vpc_flow_log_appender_spark.observability import observed_decorate_metrics
from aws_vpc_flow_log_appender_spark.pipeline import decorate


def test_observe_counters_match_reference_semantics(spark):
    recs = fixtures.firehose_records_df(spark)  # 200 seeded records
    packaged = decorate(recs, fixtures.eni_dim_df(spark), fixtures.geo_dim_df(spark))
    out, obs = observed_decorate_metrics(packaged)
    rows = out.collect()  # one action -> metrics populated
    m = obs.get
    assert m["n_records"] == len(rows) == 200
    assert m["n_ok"] + m["n_failed"] == m["n_records"]  # decorator/index.js:232
    assert m["n_failed"] > 0


def test_partition_pruning(spark, sf_dir, tmp_path):
    """A dt-partitioned write must let a dt filter prune partitions at scan
    time (PartitionFilters in the plan, not a post-scan filter)."""
    from aws_vpc_flow_log_appender_spark.operators.registry import load

    out = str(tmp_path / "events_by_day")
    events = load(spark, sf_dir, "events").withColumn(
        "dt", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    )
    events.write.mode("overwrite").partitionBy("dt").parquet(out)

    some_day = events.select("dt").first()["dt"]
    q = spark.read.parquet(out).filter(F.col("dt") == some_day)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(dt" in plan
    # every returned row is from the requested partition
    assert q.filter(F.col("dt") != some_day).count() == 0
    assert q.count() > 0