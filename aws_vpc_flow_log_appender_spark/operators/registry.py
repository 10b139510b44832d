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
# registration order. Rounds 1-3 proved 146 distinct queries
# (CORRECTNESS_r0{1,2,3}.json; r3's window was 50/50 green). Round 4 closes
# the rotation per VERDICT_r03 "Next round #2" and then folds in this
# round's churn:
#  - slots 1-24: every never-driver-proven oracle-backed query — the
#    timeseries tail, r3 TPC-H additions, events/agg/join/dq/skyline
#    singles, and the three promoted-from-rows-only contracts
#    (agg_approx_distinct/quantiles bounded-error booleans, sim_rp_lsh_topk
#    literal-plane oracle) — after this round cumulative driver proof covers
#    every pre-round-4 oracle-backed query;
#  - slots 25-35: everything whose implementation changed this round (the
#    dedup family + capstone after the SQL-string/shingle-profile/CC-fast-
#    path rewrites, the executor-side streaming sink, unrolled pagerank,
#    pushdown-probed contamination check, and flowlog_enrich as the witness
#    for the selectExpr-synthesized flagship path);
#  - slots 36-41: the six queries ADDED this round, so each gets a driver
#    row immediately;
#  - slots 42-49: re-witness of the oldest (r1) proofs across the
#    relational core; the dropped single-join-how / cube / grouping-set /
#    pivot / window-frame / recursive-CTE slots are unchanged since r1 and
#    share code paths with the retained witnesses;
#  - slot 50: multimodal_feature_extract, the one genuinely rows-only query
#    (its features/status are env-dependent by design — PIL presence), takes
#    the final slot for its first driver row; the weaker rows-only check is
#    deliberate and documented.
PRIORITY_ORDER: list[str] = [
    # never-driver-proven: timeseries tail
    "ts_ewma",
    "ts_mad_outliers",
    "ts_weighted_moving_avg",
    "ts_rolling_distinct",
    "ts_interpolate_linear",
    "ts_autocorr",
    # never-driver-proven: round-3 TPC-H additions
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q12_late_shipment_priority",
    "tpch_q20_dominant_supplier",
    # never-driver-proven: events / agg / join / dq / skyline singles
    "events_top_paths",
    "events_transition_probs",
    "agg_mode_deterministic",
    "agg_weighted_median",
    "join_interval_events",
    "dq_profile_columns",
    "skyline_pareto_2d",
    # never-driver-proven: dedup/similarity/multimodal/sampling singles
    "dedup_embedding_pairs",
    "multimodal_chunk_manifest",
    "sim_range_search",
    "sample_dedup_weights",
    # promoted from rows-only to oracle-backed this round (VERDICT_r03 #6)
    "agg_approx_distinct",
    "agg_approx_quantiles",
    "sim_rp_lsh_topk",
    # changed since their green rows: dedup family + capstone (r4 SQL-string
    # rewrites, shared shingle profile, CC fast path, size-gated
    # _spread_input; r3 2-md5 minhash rewrite), the r4-rewritten
    # executor-side streaming sink, the unrolled pagerank, the
    # pushdown-probed contamination check, and the selectExpr-synthesized
    # flagship (flowlog_enrich witnesses the shared synth+parse+enrich path
    # for the whole flowlog family)
    "stream_tumbling_window",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_clusters",
    "corpus_curation_pipeline",
    "graph_pagerank",
    "flowlog_enrich",
    "text_contamination_check",
    # round-4 session additions, never driver-proven
    "sample_weighted_reservoir",
    "stream_session_window",
    "stream_latest_per_key",
    "sim_knn_graph",
    "dq_expectations",
    "ts_holt_trend",
    "stream_flowlog_enrich",
    # oldest proofs (r1): relational core re-witness (the dropped
    # single-join-how and cube/grouping-set slots are unchanged since r1
    # and share their code path with the retained join/rollup witnesses)
    "scan_filter_project",
    "agg_pricing_summary",
    "join_multiway_star",
    "join_inner_broadcast",
    "join_asof_event_order",
    "join_range_bands",
    "agg_rollup",
    # rows-only by design (env-dependent features): final slot, first row
    "multimodal_feature_extract",
]

# Rows-only checks (no oracle) must never occupy a hash-checked slot —
# except the deliberate final-slot placement above. After the round-4
# promotions only multimodal_feature_extract remains oracle-less; it holds
# slot 50, so the tail mechanism is empty.
NO_ORACLE_TAIL: list[str] = []


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


# Scan-plan memo: session -> {(sf_dir, table) -> DataFrame}. A DataFrame is
# an immutable lazy plan, so handing the same scan object to every query is
# the catalog-table behavior users get from spark.table() — and it skips the
# ~150 ms of file listing + parquet footer schema inference that
# spark.read.parquet() pays on EVERY call (measured per table at sf0.1;
# queries touch 1-5 tables each). The file index inside the cached plan is a
# snapshot; the fixture tables are immutable, and a caller that mutates a
# directory can clear the memo (load_cache_clear) the same way they would
# REFRESH TABLE a catalog entry. The outer map is a WeakKeyDictionary on
# the SparkSession itself: stopped/garbage-collected sessions drop their
# plans automatically (no unbounded growth in session-cycling processes),
# and two sessions sharing one SparkContext (newSession(), same
# applicationId) never receive a DataFrame bound to the OTHER session's
# catalog and conf.
import weakref

_SCAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_cache_clear() -> None:
    """Drop memoized scans (the REFRESH TABLE analog for mutated dirs)."""
    _SCAN_CACHE.clear()


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
    per_session = _SCAN_CACHE.setdefault(spark, {})
    cached = per_session.get((sf_dir, name))
    if cached is not None:
        return cached
    df = _read_table(spark, sf_dir, name)
    per_session[(sf_dir, name)] = df
    return df


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
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
