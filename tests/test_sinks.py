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