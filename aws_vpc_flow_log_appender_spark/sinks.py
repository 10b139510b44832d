"""Batch sink helpers with 100 TB hygiene.

The two chronic failure modes of large partitioned writes:
 - small files: one output file per task per partition value -> millions of
   KB-sized files that destroy downstream scan performance
 - skewed partitions: one hot dt/key writes through a single task

``write_partitioned`` repartitions by the partition columns (plus an optional
salt for hot partitions) before the write, so each partition value lands in a
bounded number of right-sized files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      files_per_partition: int = 1,
                      mode: str = "overwrite") -> None:
    """Partitioned parquet write producing up to ``files_per_partition``
    files per partition value (salt spreads a hot partition across that many
    tasks). With AQE on, tiny post-shuffle partitions still coalesce — so
    small partitions get FEWER files than the knob and only genuinely large
    partitions fan out, which is exactly the desired behavior at both ends
    of the scale."""
    if files_per_partition <= 1:
        staged = df.repartition(*[F.col(c) for c in partition_cols])
    else:
        # Salt must be deterministic per ROW, not per (partition, position):
        # F.rand is only seed-stable for a fixed row order, so a task retry
        # that replays rows in a different order would reassign salts
        # mid-shuffle — a documented row-loss/duplication hazard for
        # nondeterministic repartition expressions. Hash of the full row
        # content is retry-stable; collisions only skew file sizes slightly.
        salt = F.pmod(
            F.hash(*[F.col(c) for c in df.columns]),
            F.lit(files_per_partition),
        )
        staged = df.repartition(
            *[F.col(c) for c in partition_cols], salt.alias("__salt")
        ).drop("__salt")
    staged.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def compact(spark, path: str, partition_cols: list[str],
            files_per_partition: int = 1) -> None:
    """Rewrite an existing partitioned dataset with bounded file counts —
    the standard maintenance job after high-frequency micro-batch appends."""
    df = spark.read.parquet(path)
    write_partitioned(
        df, path + "__compacted", partition_cols, files_per_partition
    )
