"""Custom Python DataSource: format('flowlog') must agree with the pipeline's
parse_lines on the same input (connector vs transformation parity)."""

from pyspark.sql import functions as F

from aws_vpc_flow_log_appender_spark import fixtures
from aws_vpc_flow_log_appender_spark.parse import parse_lines
from aws_vpc_flow_log_appender_spark.sources.flowlog_datasource import register


def test_flowlog_datasource_matches_parse_lines(spark, tmp_path):
    register(spark)
    lines = fixtures.make_lines(120)
    f1 = tmp_path / "a.log"
    f2 = tmp_path / "b.log"
    f1.write_text("\n".join(lines[:60]) + "\n")
    f2.write_text("\n".join(lines[60:]) + "\n")

    via_source = spark.read.format("flowlog").load(str(tmp_path / "*.log"))
    assert via_source.rdd.getNumPartitions() == 2  # one partition per file

    via_pipeline = parse_lines(
        spark.createDataFrame([(ln,) for ln in lines if ln], ["value"])
    )
    cols = ["raw", "error"] + [f"`{n}`" for n, _ in
            __import__("aws_vpc_flow_log_appender_spark.schema",
                       fromlist=["FLOW_FIELDS"]).FLOW_FIELDS]
    a = {tuple(r) for r in via_source.select("raw", "error", *cols[2:]).collect()}
    b = {tuple(r) for r in via_pipeline.select("raw", "error", *cols[2:]).collect()}
    # empty lines are skipped by the source and absent from the pipeline input
    assert a == b
    # error routing agrees too
    n_err_src = via_source.filter(F.col("error")).count()
    n_err_pipe = via_pipeline.filter(F.col("error")).count()
    assert n_err_src == n_err_pipe > 0

def test_flowlog_datasource_streaming_tails_files(spark, tmp_path):
    """The streaming form of the connector must deliver each file exactly
    once across checkpointed restarts: run 1 sees file A; after file B
    appears, run 2 on the same checkpoint appends only B's rows."""
    from aws_vpc_flow_log_appender_spark import fixtures

    register(spark)
    src = tmp_path / "logs"
    src.mkdir()
    lines = fixtures.make_lines(40)
    # blank lines are skipped by the reader (both batch and stream forms)
    n_a = sum(1 for ln in lines[:25] if ln)
    n_all = sum(1 for ln in lines if ln)
    (src / "a.log").write_text("\n".join(lines[:25]) + "\n")

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("flowlog")
            .option("path", str(src / "*.log"))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == n_a

    (src / "b.log").write_text("\n".join(lines[25:]) + "\n")
    run_once()
    result = spark.read.parquet(out)
    assert result.count() == n_all  # B appended once, A not re-delivered
    # parsed rows carry the typed fields; malformed lines are dead-lettered
    assert result.filter("error = false").count() > 0


def test_flowlog_datasource_empty_glob_and_overflow(spark, tmp_path):
    """Code-review r6 pair: (a) a glob matching nothing must yield ZERO rows
    (the old [self.path] fallback crashed at read time with
    FileNotFoundError — and the streaming reader already treated the same
    input as empty, so batch and stream disagreed); (b) a regex-valid line
    whose numeric token overflows int64 degrades that FIELD to NULL instead
    of failing the LongType row conversion — mirroring parse.py."""
    register(spark)
    # (a) zero-match glob -> empty result, not a task failure
    empty = spark.read.format("flowlog").load(str(tmp_path / "none" / "*.log"))
    assert empty.count() == 0

    # (b) int64-overflow token -> NULL field, error stays False
    f = tmp_path / "ovf.log"
    f.write_text(
        "2 123456789010 eni-1854f949 72.21.196.65 172.31.16.21 "
        "99999999999999999999 22 6 20 4249 1418530010 1418530070 ACCEPT OK\n"
    )
    r = spark.read.format("flowlog").load(str(f)).collect()[0]
    assert r["error"] is False
    assert r["srcport"] is None and r["dstport"] == 22
