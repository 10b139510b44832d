"""Stream-stream joins with watermark-bounded state.

The batch twin (`operators/joins.join_interval_events`) is oracle-checked;
the streaming form here must produce the same pairs on the same input (test:
``test_stream_stream_interval_join_matches_batch``). What the watermarks buy
at scale: Spark keeps BOTH join sides in state until the watermark proves no
further match can arrive — without the event-time bound the state grows with
the whole stream; with it, state is (watermark horizon + join interval) ×
arrival rate, independent of how long the query has run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(events: DataFrame,
                                left_type: str = "click",
                                right_type: str = "purchase",
                                interval: str = "1 hour",
                                watermark: str = "10 minutes",
                                how: str = "inner") -> DataFrame:
    """Correlate ``left_type`` -> ``right_type`` events per user where the
    right event lands within ``interval`` after the left one.

    Both sides carry a watermark (required for stream-stream joins so
    either side's state can be evicted) and the join condition includes the
    event-time interval — the two ingredients Spark needs to bound state.
    The equi-key (user_id) drives the shuffle; the time bound is a residual.

    ``how='left_outer'`` adds the second stream-stream semantics class: a
    left row that finds NO match is emitted with NULL right columns — but
    only once the watermark PROVES no match can still arrive (passes
    c_ts + interval), because emitting earlier could contradict a late
    match. Consequence pinned in tests/test_streaming_epochs.py: unmatched
    rows whose no-match proof the final watermark never reaches are NOT
    emitted at all — outer results are eventually-complete per the
    watermark contract, not run-complete.
    """
    left = (
        events.filter(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    right = (
        events.filter(F.col("event_type") == right_type)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    return (
        left.join(
            right,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {interval}")),
            how,
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
        )
    )
