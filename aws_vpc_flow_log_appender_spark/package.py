"""Package stage: Ok/ProcessingFailed tagging + JSON/base64 payload + union.

Reference behavior (decorator/index.js:206-234): every record — parsed or
failed — is re-emitted keyed by recordId with result 'Ok' or
'ProcessingFailed'; Ok payloads are base64(JSON(enriched record)), failed
payloads carry the original data through unchanged. Order is irrelevant
(recordId-keyed), so the ok/failed branches are a single tagged projection
here, not two scans + union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schema import ENRICHED_COLUMNS


def package_records(enriched: DataFrame) -> DataFrame:
    """-> (recordId, result, data) exactly like packageRecords
    (decorator/index.js:206-234).

    Ok rows: data = base64(to_json(enriched struct)) (decorator/index.js:222).
    Failed rows: data = base64(raw payload) passthrough (decorator/index.js:214-220).
    """
    payload_ok = F.base64(
        F.to_json(F.struct(*[F.col(f"`{c}`") for c in ENRICHED_COLUMNS]))
    )
    payload_failed = F.base64(F.col("raw"))
    return enriched.select(
        "recordId",
        F.when(F.col("error"), F.lit("ProcessingFailed"))
        .otherwise(F.lit("Ok"))
        .alias("result"),
        F.when(F.col("error"), payload_failed).otherwise(payload_ok).alias("data"),
    )


def result_counts(packaged: DataFrame) -> DataFrame:
    """The success/failure counters the reference logs per batch
    (decorator/index.js:208-232) as a distributed aggregate."""
    return packaged.groupBy("result").agg(F.count("*").alias("n"))
