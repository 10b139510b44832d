"""Pipeline observability (SURVEY §2.4 A1/A2): the counters the reference
logs per batch (decorator/index.js:164,195,208-232) as Spark `observe()`
metrics — computed inline during the pass, no second job, and surfaced
through QueryExecutionListener / StreamingQueryListener in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_decorate_metrics(packaged: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach the reference's entry/exit counters to the packaged output:
    total records, ok count, failed count. Read ``observation.get`` after an
    action — one pass over the data, metrics piggyback on it."""
    obs = Observation("decorate_metrics")
    out = packaged.observe(
        obs,
        F.count(F.lit(1)).alias("n_records"),
        F.count_if(F.col("result") == "Ok").alias("n_ok"),
        F.count_if(F.col("result") == "ProcessingFailed").alias("n_failed"),
    )
    return out, obs
