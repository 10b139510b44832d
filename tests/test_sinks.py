import glob

from pyspark.sql import functions as F

from aws_vpc_flow_log_appender_spark.operators.registry import load
from aws_vpc_flow_log_appender_spark.sinks import write_partitioned


def test_write_partitioned_bounds_file_count(spark, sf_dir, tmp_path):
    events = load(spark, sf_dir, "events").withColumn(
        "dt", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    ).repartition(16)  # simulate many upstream tasks
    out = str(tmp_path / "by_day")
    write_partitioned(events, out, ["dt"], files_per_partition=1)
    for part_dir in glob.glob(f"{out}/dt=*"):
        files = glob.glob(f"{part_dir}/*.parquet")
        assert len(files) == 1, part_dir  # not one file per upstream task
    # naive write for contrast: one file per task per partition value
    naive = str(tmp_path / "naive")
    events.write.partitionBy("dt").parquet(naive)
    some_part = glob.glob(f"{naive}/dt=*")[0]
    assert len(glob.glob(f"{some_part}/*.parquet")) > 1

    back = spark.read.parquet(out)
    assert back.count() == events.count()

def _rowgroup_spans(path, col):
    """Per-row-group (max - min) spans of ``col`` across all parquet files."""
    import glob

    import pyarrow.parquet as pq

    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append(st.max - st.min)
    return spans


def test_zorder_write_tightens_rowgroup_stats_on_both_dims(spark, sf_dir, tmp_path):
    """The point of z-order: after clustering on (user_id, value), the
    per-file min/max footer boxes must be small in BOTH dimensions, so a
    filter on either column row-group-prunes. Compare against a round-robin
    write of the same data: average span must shrink substantially."""
    from aws_vpc_flow_log_appender_spark.operators.registry import load
    from aws_vpc_flow_log_appender_spark.sinks import write_zordered

    df = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    write_zordered(df, zpath, ["user_id", "value"], num_files=16)
    df.repartition(16).write.mode("overwrite").parquet(rpath)

    # same rows round-trip
    assert spark.read.parquet(zpath).count() == df.count()

    for col in ("user_id", "value"):
        z_avg = sum(_rowgroup_spans(zpath, col)) / len(_rowgroup_spans(zpath, col))
        r_avg = sum(_rowgroup_spans(rpath, col)) / len(_rowgroup_spans(rpath, col))
        # round-robin files cover ~the whole domain; z-ordered files must
        # cover well under half of it on BOTH dimensions simultaneously
        assert z_avg < 0.5 * r_avg, (col, z_avg, r_avg)


def test_zorder_key_is_deterministic_and_bounded(spark, sf_dir):
    from aws_vpc_flow_log_appender_spark.operators.registry import load
    from aws_vpc_flow_log_appender_spark.sinks import ZORDER_BITS, zorder_by

    df = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    z1 = {r["event_id"]: r["__z"] for r in zorder_by(df, ["user_id", "value"]).collect()}
    z2 = {r["event_id"]: r["__z"] for r in zorder_by(df, ["user_id", "value"]).collect()}
    assert z1 == z2, "z-value must be a pure function of the row"
    assert all(0 <= z < (1 << (2 * ZORDER_BITS)) for z in z1.values())
