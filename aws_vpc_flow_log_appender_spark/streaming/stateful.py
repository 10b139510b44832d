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

DEDUP_STATE = "seen long"


def running_totals_stream(parsed: DataFrame, key_col: str = "`interface-id`") -> DataFrame:
    """Per-key byte/flow totals accumulated across micro-batches."""

    def update(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        total_bytes, n_flows = state.get if state.exists else (0, 0)
        batch_rows = 0
        for pdf in pdfs:
            # a NULL anywhere in the column makes Arrow hand us float64;
            # summing in float space would freeze rounding error into the
            # durable counter once it crosses 2^53. astype back to int64
            # AFTER dropna is element-exact (each value was a long) and the
            # accumulation then stays integer (code-review r6).
            b = pdf["bytes"].dropna().astype("int64")
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
    """Emit each key's FULL first-seen record exactly once (cross-batch);
    later duplicates (same batch or any later batch) are swallowed.

    The at-least-once upstream (the reference's retry model re-sends whole
    batches, ingestor/index.js:137-140) becomes exactly-once record delivery
    downstream of this operator — output schema == input schema, so it wires
    in as a transparent dedup stage, not a key stream.

    Cross-batch, "first" is true arrival order (state marks the key seen).
    WITHIN a micro-batch there is no arrival order — Arrow chunking is
    nondeterministic — so the survivor among same-batch duplicates is the
    lexicographically smallest row over all columns: deterministic on
    replay.
    """

    def update(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        # Within one micro-batch, Arrow chunk order is partition/arrival
        # order — NOT deterministic across reruns. "First-seen" is only
        # well-defined cross-batch, so within a batch the survivor is the
        # LEXICOGRAPHICALLY SMALLEST duplicate (all columns): a replay of
        # the same input always emits the same row (code-review r6).
        already = state.exists
        if already:
            # the survivor is guaranteed to be discarded — drain the
            # iterator without the all-column sorts (ADVICE r6 #3: hot
            # duplicate keys otherwise pay per-batch CPU for nothing; the
            # API requires consuming pdfs before returning)
            for _ in pdfs:
                pass
            state.update((1,))
            return
            yield  # pragma: no cover - keeps this a generator
        best = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            cand = pdf.sort_values(by=list(pdf.columns), kind="mergesort").head(1)
            if best is not None:
                both = pd.concat([best, cand], ignore_index=True)
                cand = both.sort_values(
                    by=list(both.columns), kind="mergesort"
                ).head(1)
            best = cand
        state.update((1,))
        if best is None:
            return
            yield  # pragma: no cover - keeps this a generator
        yield best

    return records.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=records.schema,
        stateStructType=DEDUP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
