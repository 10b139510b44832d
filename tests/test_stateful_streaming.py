"""Cross-micro-batch state tests for the applyInPandasWithState operators:
maxFilesPerTrigger=1 forces one micro-batch per input file so state carry is
actually exercised."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_vpc_flow_log_appender_spark.streaming.stateful import (
    dedup_first_occurrence_stream,
    running_totals_stream,
)

SCHEMA = T.StructType([
    T.StructField("recordId", T.StringType()),
    T.StructField("interface-id", T.StringType()),
    T.StructField("bytes", T.LongType()),
])


def _write_batches(spark, tmp_path):
    b1 = [("r1", "eni-a", 100), ("r2", "eni-a", 50), ("r3", "eni-b", 10)]
    b2 = [("r1", "eni-a", 100), ("r4", "eni-a", 25), ("r5", "eni-c", 7)]
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(str(src / "f2"))
    return str(src / "f*")


def _run(spark, stream_df, name):
    q = (
        stream_df.writeStream.outputMode("update")
        .format("memory").queryName(name)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_running_totals_accumulate_across_batches(spark, tmp_path):
    glob = _write_batches(spark, tmp_path)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob)
    )
    rows = _run(spark, running_totals_stream(stream), "totals_out")
    # update-mode memory sink keeps every emission; the LAST row per key is
    # the final state
    final = {}
    for r in rows:
        final[r["key"]] = (r["total_bytes"], r["n_flows"])
    # eni-a: batches may arrive as 1 or 2 triggers, but totals must converge
    assert final["eni-a"] == (275, 4)
    assert final["eni-b"] == (10, 1)
    assert final["eni-c"] == (7, 1)
    # state visibly carried across batches: some eni-a emission had
    # batch_rows < n_flows (i.e. a later batch added onto existing state)
    a_rows = [r for r in rows if r["key"] == "eni-a"]
    if len(a_rows) > 1:
        assert any(r["batch_rows"] < r["n_flows"] for r in a_rows)


def test_dedup_first_occurrence(spark, tmp_path):
    glob = _write_batches(spark, tmp_path)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob)
    )
    rows = _run(spark, dedup_first_occurrence_stream(stream), "dedup_out")
    ids = sorted(r["recordId"] for r in rows)
    # r1 appears in both batches but must be emitted exactly once
    assert ids == ["r1", "r2", "r3", "r4", "r5"]


def test_dedup_same_batch_survivor_is_deterministic(spark, tmp_path):
    """Same-key duplicates with DIFFERENT payloads landing in one
    micro-batch: the survivor must be the lexicographically smallest row
    (the within-batch contract — Arrow chunk order is not reproducible, so
    'first in the batch' would make replays emit different rows). Spread
    the duplicates across partitions to exercise the cross-chunk merge."""
    src = tmp_path / "src1"
    src.mkdir()
    dup = [("rX", "eni-z", 900), ("rX", "eni-a", 100), ("rX", "eni-m", 500)]
    spark.createDataFrame(dup, SCHEMA).repartition(3).write.parquet(
        str(src / "f1")
    )
    stream = spark.readStream.schema(SCHEMA).parquet(str(src / "f*"))
    rows = _run(spark, dedup_first_occurrence_stream(stream), "dedup_det_out")
    assert len(rows) == 1
    r = rows[0]
    assert (r["recordId"], r["interface-id"], r["bytes"]) == ("rX", "eni-a", 100)