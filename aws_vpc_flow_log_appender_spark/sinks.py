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


# --- multi-dimensional clustering (z-order) ---------------------------------

ZORDER_BITS = 8  # 256 quantile buckets per dimension


def _quantile_bucket(value_expr: str, boundaries_col: str):
    """0..255 bucket of ``value_expr`` given a sorted 255-boundary array:
    bucket = #boundaries <= value. Quantile (not linear) bucketing, so
    skewed columns still spread across the full bucket range."""
    return F.size(
        F.filter(F.col(boundaries_col), lambda b: b <= F.expr(value_expr))
    ).cast("long")


def zorder_by(df: DataFrame, cols: list[str]) -> DataFrame:
    """Stable sort key interleaving the bits of each column's quantile rank
    (Morton / z-order curve). Rows close on the curve are close in EVERY
    listed dimension, so after a range-partitioned write each file's
    parquet min/max footer covers a small box of the space and a filter on
    ANY single z-ordered column prunes most row groups — the data-skipping
    property a single-column sort only gives to its leading column.

    Quantile buckets come from one ``percentile_approx`` aggregate (a
    1-row broadcast — no global sort, no driver collect), so the whole
    clustering adds one tiny agg + one range exchange to the write. Spark
    has no built-in multi-dimensional clustering; this is the standard
    lakehouse OPTIMIZE ZORDER BY technique expressed as a plain column."""
    fracs = [i / 256.0 for i in range(1, 256)]
    frac_arr = "array(" + ", ".join(f"{x}D" for x in fracs) + ")"
    bounds = df.select(
        *[
            F.expr(
                f"percentile_approx(CAST({c} AS DOUBLE), {frac_arr}, 10000)"
            ).alias(f"__b_{c}")
            for c in cols
        ]
    )
    bucketed = df.crossJoin(F.broadcast(bounds))
    z = F.lit(0).cast("long")
    n = len(cols)
    for ci, c in enumerate(cols):
        bucket = _quantile_bucket(f"CAST({c} AS DOUBLE)", f"__b_{c}")
        # interleave: bit i of column ci lands at position i*n + ci
        for i in range(ZORDER_BITS):
            bit = F.shiftright(bucket, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + ci))
    return bucketed.withColumn("__z", z).drop(*[f"__b_{c}" for c in cols])


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   num_files: int, mode: str = "overwrite") -> None:
    """Parquet write clustered on the z-order curve of ``cols``:
    range-partition by the z-value into ``num_files`` tasks (sampled range
    boundaries — no skew pileup), sort within each, drop the key. Each
    output file then owns a contiguous curve segment, i.e. a tight
    min/max box in every clustered dimension."""
    staged = (
        zorder_by(df, cols)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    staged.write.mode(mode).parquet(path)
