"""Query registry backing ``__spark_entry__.queries()`` / ``oracle_sql()``.

Every operator in SURVEY §2 (plus the scale extensions) registers here as a
named query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` and, when
SQL-expressible, a DuckDB oracle string over the same parquet tables.

Output discipline (driver compares row-count + schema + order-insensitive
value-hash, SURVEY §7.4.3):
 - alias every computed column identically on both sides
 - no raw timestamps in outputs (epoch longs / extracted ints instead)
 - no arrays/structs in outputs (explode or concat_ws instead)
 - doubles rounded; integer-typed sums cast to BIGINT in DuckDB (its integer
   SUM returns HUGEINT which arrow-materializes differently)
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERY_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):  # noqa: D401
    """Decorator registering a query under ``name``."""
    def deco(fn):
        QUERY_REGISTRY[name] = QuerySpec(name, fn, oracle, tags)
        return fn
    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided parquet table (columnar scan; Catalyst handles
    projection/predicate pushdown from the downstream plan).

    events.parquet stores ts as INT64 TIMESTAMP(NANOS) which Spark's reader
    rejects; read nanos-as-long and truncate to microseconds (exactly what
    DuckDB's reader does), keeping integer arithmetic to preserve precision.

    The session timezone is pinned to UTC here because the caller may be the
    driver's own session: epoch conversions of NTZ timestamps are session-TZ
    dependent and DuckDB's are UTC-naive (verified: a non-UTC session shifts
    unix_timestamp(date_trunc('day', ...)) by the TZ offset).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # right-size shuffles for the grading host (driver sessions default to
    # 200); AQE coalesces further, so this is an upper bound, not a tuning
    spark.conf.set(
        "spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so queries can use the SQL API."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
