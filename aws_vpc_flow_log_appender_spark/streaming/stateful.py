"""Custom stateful streaming operators via applyInPandasWithState.

Two canonical shapes a flow-log / training-data pipeline needs that built-in
windowed aggs can't express:

 - running per-key totals that survive across micro-batches (the decorator's
   per-batch counters, decorator/index.js:208-232, upgraded to durable state)
 - streaming first-occurrence dedup keyed by content id (exactly-once-ish
   record semantics on top of an at-least-once source)

State is per-key and checkpointed by Spark; at 100 TB scale the state store
is bounded by key cardinality — pair with watermark-based state TTL
(GroupStateTimeout) so abandoned keys age out.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = "key string, total_bytes long, n_flows long, batch_rows long"
RUNNING_TOTALS_STATE = "total_bytes long, n_flows long"

DEDUP_OUTPUT = "recordId string, first_batch_rows long"
DEDUP_STATE = "seen long"


def running_totals_stream(parsed: DataFrame, key_col: str = "`interface-id`") -> DataFrame:
    """Per-key byte/flow totals accumulated across micro-batches."""

    def update(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        total_bytes, n_flows = state.get if state.exists else (0, 0)
        batch_rows = 0
        for pdf in pdfs:
            b = pdf["bytes"].dropna()
            total_bytes += int(b.sum())
            n_flows += len(pdf)
            batch_rows += len(pdf)
        state.update((total_bytes, n_flows))
        yield pd.DataFrame({
            "key": [key[0]],
            "total_bytes": [total_bytes],
            "n_flows": [n_flows],
            "batch_rows": [batch_rows],
        })

    return (
        parsed.selectExpr(f"{key_col} as key", "bytes")
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_OUTPUT,
            stateStructType=RUNNING_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_first_occurrence_stream(records: DataFrame, key_col: str = "recordId") -> DataFrame:
    """Emit each key's row only the first time it is ever seen (cross-batch).

    The at-least-once upstream (the reference's retry model re-sends whole
    batches, ingestor/index.js:137-140) becomes exactly-once record delivery
    downstream of this operator.
    """

    def update(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        already = state.exists
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if already or n == 0:
            state.update((1,))
            return
            yield  # pragma: no cover - keeps this a generator
        state.update((1,))
        # first_batch_rows = how many copies arrived in the first batch seen
        # (an observability count, NOT a batch id — GroupState exposes none)
        yield pd.DataFrame({"recordId": [key[0]], "first_batch_rows": [n]})

    return (
        records.select(key_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=DEDUP_OUTPUT,
            stateStructType=DEDUP_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
