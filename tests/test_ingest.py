"""Ingestor-side operators: CloudWatch envelope decode -> line extraction
(ingestor/index.js:68-92,124-141)."""

import base64
import gzip
import json

from aws_vpc_flow_log_appender_spark import fixtures
from aws_vpc_flow_log_appender_spark.sources import (
    decode_cloudwatch_events,
    extract_log_lines,
    frame_firehose_batches,
)


def _cloudwatch_event(message_type, lines):
    payload = {
        "messageType": message_type,
        "owner": "123456789010",
        "logGroup": "flowlogs",
        "logStream": "eni-1854f949-all",
        "subscriptionFilters": ["all"],
        "logEvents": [
            {"id": str(i), "timestamp": 1418530010000 + i, "message": m}
            for i, m in enumerate(lines)
        ],
    }
    return base64.b64encode(gzip.compress(json.dumps(payload).encode())).decode()


def test_decode_and_extract(spark):
    data = [
        (_cloudwatch_event("DATA_MESSAGE", fixtures.EVENT_JSON_LINES),),
        (_cloudwatch_event("CONTROL_MESSAGE", ["should be dropped"]),),
    ]
    df = spark.createDataFrame(data, ["data"])
    envelopes = decode_cloudwatch_events(df)
    assert envelopes.count() == 2
    lines = extract_log_lines(envelopes).collect()
    # CONTROL_MESSAGE filtered (ingestor/index.js:73-76); newline framing (:79)
    assert sorted(r["Data"] for r in lines) == sorted(
        m + "\n" for m in fixtures.EVENT_JSON_LINES
    )


def test_firehose_batch_framing(spark):
    df = spark.createDataFrame([(str(i),) for i in range(1200)], ["Data"]).coalesce(1)
    batched = frame_firehose_batches(df, batch_size=500)
    sizes = sorted(
        r["n"] for r in batched.groupBy("batch_id").count().withColumnRenamed("count", "n").collect()
    )
    assert sizes == [200, 500, 500]  # 500-record flush + remainder (ingestor/index.js:84-87)
