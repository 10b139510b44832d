"""Ingest-side operators: the ingestor Lambda's dataflow re-expressed in Spark.

Reference (ingestor/index.js:124-141): CloudWatch Logs pushes
``{awslogs: {data: base64(gzip(JSON))}}``; the ingestor base64-decodes,
gunzips, JSON-parses, drops CONTROL_MESSAGE envelopes, projects
``message + '\\n'``, and re-batches 500 records per Firehose put.

Spark-first: file/Kinesis sources decompress ``.gz`` natively; for in-stream
gzip bytes we use an Arrow-batched pandas UDF (zlib), then built-in
``from_json`` -> ``explode`` -> ``filter`` -> ``concat`` — everything after the
gunzip stays JVM-side.
"""

from __future__ import annotations

import gzip

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..schema import CLOUDWATCH_ENVELOPE_SCHEMA


# returnType as a DataType object (not a DDL string) so the UDF can be defined
# at import time without an active SparkSession.
@pandas_udf(T.BinaryType())
def _gunzip(data: pd.Series) -> pd.Series:
    """Vectorized gunzip (ingestor/index.js:100-110's gunzipPromise).

    Corrupt payloads degrade to None per record (downstream from_json yields a
    NULL envelope) — one bad gzip stream must never fail the whole batch."""

    def safe(b):
        if b is None:
            return None
        try:
            return gzip.decompress(b)
        except Exception:
            return None

    return data.map(safe)


def decode_cloudwatch_events(events: DataFrame, data_col: str = "data") -> DataFrame:
    """base64 -> gunzip -> JSON envelope (ingestor/index.js:125-129).

    Input: DataFrame with one column of base64(gzip(json)) strings.
    Output: the typed CloudWatch envelope struct exploded to one row per
    envelope, with messageType + logEvents columns.
    """
    # try_to_binary, not unbase64: under Spark 4 ANSI defaults unbase64
    # raises on one malformed payload and fails the whole batch, while the
    # adjacent gunzip step deliberately degrades per record — a corrupt
    # base64 string must decode to NULL and yield a NULL envelope the same
    # way a corrupt gzip stream does (code-review r6).
    return events.select(
        F.from_json(
            _gunzip(
                F.try_to_binary(F.col(data_col), F.lit("base64"))
            ).cast("string"),
            CLOUDWATCH_ENVELOPE_SCHEMA,
        ).alias("envelope")
    ).select("envelope.*")


def extract_log_lines(envelopes: DataFrame) -> DataFrame:
    """CONTROL_MESSAGE filter + message projection with newline framing
    (createRecordsFromEvents, ingestor/index.js:68-92).

    Output column ``Data`` matches the Firehose record shape ``{Data: line\\n}``.
    """
    return (
        envelopes
        .filter(
            F.col("messageType").isNull()
            | (F.col("messageType") != "CONTROL_MESSAGE")
        )
        .select(F.explode("logEvents").alias("ev"))
        # a logEvent missing `message` must not become a NULL Data row
        # (F.concat null-propagates and NULL records break Firehose puts);
        # JS `undefined + '\n'` yields the literal 'undefined\n' — replicated
        .select(
            F.concat(
                F.coalesce(F.col("ev.message"), F.lit("undefined")), F.lit("\n")
            ).alias("Data")
        )
    )


def frame_firehose_batches(records: DataFrame, batch_size: int = 500) -> DataFrame:
    """Group records into Firehose-sized batches (ingestor/index.js:84-87's
    500-record flush, the putRecordBatch API max).

    In Spark the sink owns batching; this helper exists for sink adapters that
    need explicit batch framing (e.g. a foreachBatch boto3 writer). Batch ids
    are assigned per partition — no global ordering is implied, matching the
    reference (records are independent, SURVEY §2.8).
    """
    # integer DIV, never float division: monotonically_increasing_id packs
    # the partition id in the high 31 bits, so ids exceed 2^53 once a
    # partition id passes ~2^20 — double division then collapses adjacent
    # ids and can put 501 records in a "500-record" batch, which the
    # putRecordBatch API rejects wholesale (code-review r6)
    return records.withColumn(
        "batch_id",
        F.expr(f"monotonically_increasing_id() DIV {int(batch_size)}"),
    )


# ---------------------------------------------------------------------------
# The full S1-S4 ingest chain as a registered query. Gzip itself has no
# DuckDB twin, so the ORACLE checks the round-trip identity instead: decode
# (the production path) applied to encode (the synthesis) must reproduce the
# per-envelope source lines the oracle derives directly from documents.
# CloudWatch envelopes are synthesized from the documents table, then decoded
# back through the real ingest path.
# ---------------------------------------------------------------------------

from ..operators.registry import load, query  # noqa: E402


@query(
    "ingest_cloudwatch_decode",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) || ':' || string_split(text, ' ')[1] || chr(10) AS line
    FROM (
      SELECT min(doc_id) AS doc_id, arg_min(text, doc_id) AS text
      FROM documents GROUP BY doc_id % 10
    )
    """,
    tags=("source", "ingest"),
)
def ingest_cloudwatch_decode(spark, sf_dir):
    """Round-trip the ingest chain: build base64(gzip(JSON envelope)) payloads
    (one envelope per 10 documents) with a pandas UDF, then decode with the
    production path (unbase64 -> gunzip -> from_json -> explode -> filter ->
    project).

    Oracle-checkable even though DuckDB has no gzip: the encode side and the
    decode side are inverse transport transforms, so the expected output is
    derivable straight from the documents table — the comparison proves the
    b64/gzip/JSON round-trip is lossless end-to-end."""
    import base64 as b64mod
    import gzip as gzmod
    import json

    d = load(spark, sf_dir, "documents")

    @pandas_udf(T.StringType())
    def make_envelope(doc_ids: pd.Series, texts: pd.Series) -> pd.Series:
        # one envelope per ROW (scalar pandas UDFs are row-wise over the
        # batch; building one envelope from the whole Arrow batch would make
        # the output depend on batch boundaries)
        out = []
        for i, t in zip(doc_ids, texts):
            payload = json.dumps({
                "messageType": "DATA_MESSAGE",
                "owner": "123456789010",
                "logGroup": "docs",
                "logStream": "s",
                "subscriptionFilters": ["all"],
                "logEvents": [
                    {"id": str(i), "timestamp": 0, "message": f"{i}:{t.split(' ')[0]}"}
                ],
            })
            out.append(b64mod.b64encode(gzmod.compress(payload.encode())).decode())
        return pd.Series(out)

    grouped = (
        d.withColumn("g", F.col("doc_id") % 10)
        .groupBy("g")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("text", "doc_id").alias("text"),
        )
        .select(make_envelope("doc_id", "text").alias("data"))
    )
    envelopes = decode_cloudwatch_events(grouped)
    lines = extract_log_lines(envelopes)
    return lines.select(F.col("Data").alias("line")).orderBy("line")
