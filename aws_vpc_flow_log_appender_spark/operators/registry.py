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
# registration order. Round 1 proved the generic relational surface, round 2
# proved the flagship + LLM-pipeline surface (CORRECTNESS_r0{1,2}.json: 96
# distinct queries green). Round 3 rotates the window per VERDICT_r02 "Next
# round #2": slots 1-2 are the two round-2 env-drift failures (must re-prove
# green after the NTZ fix in load()), slots 3-50 are exactly 48
# never-driver-checked queries — the remaining TPC-H, graphs, sampling,
# security detectors, text r2 additions, containment/multiprobe, and
# embedding prep. Everything previously proven follows behind the window;
# no-oracle sketches sit at the tail so they never burn a hash-checked slot.
# Still unproven after this round (rotate into round 4's window):
# events_top_paths, events_transition_probs, agg_mode_deterministic,
# agg_weighted_median, join_interval_events, dq_profile_columns,
# skyline_pareto_2d, ts_mad_outliers, ts_weighted_moving_avg,
# ts_rolling_distinct, ts_interpolate_linear, ts_autocorr, ts_ewma,
# dedup_embedding_pairs, multimodal_chunk_manifest, and the round-3
# additions tpch_q2/q11/q12/q20, sim_range_search, sample_dedup_weights.
PRIORITY_ORDER: list[str] = [
    # round-2 driver failures (TIMESTAMP_NTZ drift) — re-prove first
    "ts_sessionize",
    "window_lag_lead",
    # remaining TPC-H (public spec queries; q18/q19 were slots 51-52 in r2)
    "tpch_q18_large_orders",
    "tpch_q19_discounted_revenue",
    "tpch_q3_shipping_priority",
    "tpch_q4_priority_semi",
    "tpch_q5_local_supplier_volume",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_parts_supplier_counts",
    "tpch_q17_small_qty_revenue",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales_opportunity",
    # graph analytics over the events-derived interaction graph
    "graph_degree_distribution",
    "graph_triangle_count",
    "graph_pagerank",
    "graph_common_neighbors",
    # training-data sampling family (ext/sampling.py — all 6)
    "sample_holdout_split",
    "sample_split_rates",
    "sample_stratified",
    "sample_temperature",
    "sample_mix_epochs",
    "text_pack_sequences",
    # security / flow-log detectors
    "flowlog_ddos_targets",
    "flowlog_service_mix",
    "flowlog_port_scans",
    "flowlog_incident_feed",
    "flowlog_beaconing",
    "flowlog_acl_flip_pairs",
    "flowlog_chi2_protocol_action",
    "flowlog_cidr_rollup",
    "flowlog_cusum_drift",
    "flowlog_blast_radius",
    # text analysis round-2 additions
    "text_bpe_token_count",
    "text_chunk_windows",
    "text_repetition_ratio",
    "text_contamination_check",
    "text_unigram_logprob",
    "text_inverted_index",
    "text_bm25_search",
    "text_pii_scrub",
    "text_entropy_by_source",
    "text_cross_doc_repeats",
    # dedup / similarity / embedding-prep round-2 additions
    "dedup_containment",
    "sim_ivf_multiprobe",
    "embed_l2_normalize",
    "embed_quantize_int8",
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
        # ts arrives as one of THREE physical types depending on the host's
        # parquet writer: TIMESTAMP(MICROS, adjustedToUTC) -> timestamp
        # (read natively, nothing to do), INT64 TIMESTAMP(NANOS) -> bigint
        # (via nanosAsLong; truncate to micros like DuckDB's reader), or
        # TIMESTAMP(not adjusted) -> timestamp_ntz. Normalize ALL of them to
        # TIMESTAMP (LTZ) so downstream unix_micros()/withWatermark() — which
        # reject NTZ — see one type everywhere. The NTZ->LTZ cast is
        # value-preserving because the session TZ is pinned UTC above, which
        # also matches DuckDB's UTC-naive epoch semantics.
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so queries can use the SQL API."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
