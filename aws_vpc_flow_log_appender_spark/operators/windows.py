"""Window-function operators (free in Spark; absent in the reference —
SURVEY §2.5 'no sort/limit/top-k' and §2.8 'no windows').

Determinism discipline: every window ORDER BY carries a unique-key tiebreaker
so row_number/frames are stable across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions import round_half_up
from .registry import load, query


@query(
    "window_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_topk_per_group(spark, sf_dir):
    """Top-K per group — the scalable alternative to global sort: one shuffle
    on the partition key, per-group heap."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice", "rn"
        )
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           floor((sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100.0 + 0.5) / 100.0 AS running_total,
           CAST(row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS order_seq
    FROM orders
    """,
    tags=("window", "frame"),
)
def window_running_sum(spark, sf_dir):
    """Cumulative frame (running customer spend in order-date order)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        round_half_up(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2).alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(ts) - lag(epoch_us(ts)) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
           lead(event_type) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    """,
    tags=("window", "lag"),
)
def window_lag_lead(spark, sf_dir):
    """lag/lead over per-user event streams (inter-arrival gaps in exact
    microseconds — no float epoch drift between engines)."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.unix_micros("ts")
    return e.select(
        "user_id",
        "event_id",
        (t_us - F.lag(t_us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "window_rank_dense_percent",
    oracle="""
    SELECT c_nationkey, c_custkey,
           CAST(rank() OVER nw AS INTEGER) AS bal_rank,
           CAST(dense_rank() OVER nw AS INTEGER) AS bal_dense_rank,
           floor((percent_rank() OVER nw) * 1000000.0 + 0.5) / 1000000.0 AS bal_pct_rank,
           CAST(ntile(4) OVER nw AS INTEGER) AS bal_quartile
    FROM customer
    WINDOW nw AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window", "rank"),
)
def window_rank_dense_percent(spark, sf_dir):
    o = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return o.select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        round_half_up(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
    )


@query(
    "window_first_last",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER cw AS first_order,
           last_value(o_orderkey)  OVER cw AS last_order
    FROM orders
    WINDOW cw AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "firstlast"),
)
def window_first_last(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("last_order"),
    ).distinct()
