"""Aggregation operators (SURVEY §2.4).

The reference only counts successes/failures (A1/A2, decorator/index.js:
208-232); the flow-log domain implies the full agg surface (SUM bytes/packets
by key over windows). All partial-aggregate (map-side combine) by construction
— Spark plans HashAggregate(partial) -> shuffle -> HashAggregate(final).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import round_half_up
from .registry import load, query


@query(
    "agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
           floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS sum_base_price,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS sum_disc_price,
           floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100.0 + 0.5) / 100.0 AS sum_charge,
           floor((avg(l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS avg_qty,
           floor((avg(l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 AS avg_price,
           floor((avg(l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "groupby"),
)
def agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1: the canonical wide-agg scan. 2 group keys, 8 aggregates, one
    shuffle of (few groups x partials) — the 100 TB shape this must keep."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            round_half_up(F.sum("l_quantity"), 2).alias("sum_qty"),
            round_half_up(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            round_half_up(F.sum(disc_price), 2).alias("sum_disc_price"),
            round_half_up(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            round_half_up(F.avg("l_quantity"), 6).alias("avg_qty"),
            round_half_up(F.avg("l_extendedprice"), 6).alias("avg_price"),
            round_half_up(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(count(*) AS BIGINT) AS n_customers,
           floor((sum(DISTINCT round(c_acctbal, 0))) * 100.0 + 0.5) / 100.0 AS sum_distinct_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("agg", "distinct"),
)
def agg_distinct(spark, sf_dir):
    """Distinct aggregation — planned as a two-stage expand + agg (no
    driver-side dedup)."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count("*").alias("n_customers"),
        round_half_up(F.sum_distinct(F.round("c_acctbal", 0)), 2).alias("sum_distinct_bal"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           floor((stddev_samp(l_extendedprice)) * 10000.0 + 0.5) / 10000.0 AS price_stddev,
           floor((var_samp(l_quantity)) * 10000.0 + 0.5) / 10000.0 AS qty_var,
           floor((min(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS min_price,
           floor((max(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS max_price,
           floor((corr(l_extendedprice, l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS price_qty_corr,
           floor((covar_samp(l_extendedprice, l_quantity)) * 10000.0 + 0.5) / 10000.0 AS price_qty_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_stats(spark, sf_dir):
    """Statistical aggregates (single-pass distributed moments)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        round_half_up(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        round_half_up(F.var_samp("l_quantity"), 4).alias("qty_var"),
        round_half_up(F.min("l_extendedprice"), 2).alias("min_price"),
        round_half_up(F.max("l_extendedprice"), 2).alias("max_price"),
        round_half_up(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        round_half_up(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias("price_qty_covar"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT coalesce(r.r_name, 'ALL') AS region,
           coalesce(n.n_name, 'ALL') AS nation,
           floor((sum(c.c_acctbal)) * 100.0 + 0.5) / 100.0 AS total_balance,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
    tags=("agg", "rollup"),
)
def agg_rollup(spark, sf_dir):
    """Hierarchical rollup (region -> nation -> grand total). Safe for the
    coalesce-as-ALL trick because the grouping keys are non-null."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            round_half_up(F.sum("c_acctbal"), 2).alias("total_balance"),
            F.count("*").alias("n_customers"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "total_balance",
            "n_customers",
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def agg_cube(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            round_half_up(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT c_mktsegment,
           floor((coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0.0)) * 100.0 + 0.5) / 100.0 AS status_O,
           floor((coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0.0)) * 100.0 + 0.5) / 100.0 AS status_F,
           floor((coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0.0)) * 100.0 + 0.5) / 100.0 AS status_P
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c_mktsegment
    """,
    tags=("agg", "pivot"),
)
def agg_pivot(spark, sf_dir):
    """Pivot with an explicit value list (no discovery pass — at 100 TB the
    implicit distinct-values scan is a hidden extra job)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    piv = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum("o_totalprice"))
    )
    return piv.select(
        "c_mktsegment",
        round_half_up(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("status_O"),
        round_half_up(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("status_F"),
        round_half_up(F.coalesce(F.col("P"), F.lit(0.0)), 2).alias("status_P"),
    )


@query(
    "agg_flowlog_domain",
    oracle="""
    SELECT event_type AS action,
           CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS total_bytes,
           CAST(count(*) AS BIGINT) AS n_flows,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_sources,
           CAST(max(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS max_bytes
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "flowlog"),
)
def agg_flowlog_domain(spark, sf_dir):
    """The flow-log domain's natural aggregate (SURVEY §2.4): SUM(bytes) /
    counts by action — modeled on the events table (event_type~action,
    user_id~srcaddr, value*1000~bytes)."""
    e = load(spark, sf_dir, "events")
    # explicit floor: DuckDB CAST(double AS BIGINT) rounds, Spark truncates
    bytes_col = F.floor(F.col("value") * 1000)
    return e.groupBy(F.col("event_type").alias("action")).agg(
        F.sum(bytes_col).alias("total_bytes"),
        F.count("*").alias("n_flows"),
        F.countDistinct("user_id").alias("n_sources"),
        F.max(bytes_col).alias("max_bytes"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS orders_within_tol,
           TRUE AS parts_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++): sketch-based, constant memory at
    any scale. The sketch estimate itself is engine-specific, so instead of
    hashing it the query emits a DETERMINISTIC contract: the exact counts
    (hash-compared against DuckDB) plus ``within_tol`` booleans asserting the
    HLL estimate lies within 3x its configured rsd (0.05 -> 15%) of the exact
    answer — the driver's hash check fails if the sketch ever drifts out of
    bound. Exact twin: `agg_distinct`."""
    li = load(spark, sf_dir, "lineitem")
    rel_bound = 0.15  # 3x default rsd of 0.05
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        "exact_parts",
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            <= rel_bound * F.col("exact_orders")
        ).alias("orders_within_tol"),
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= rel_bound * F.col("exact_parts")
        ).alias("parts_within_tol"),
    )


@query(
    "agg_approx_quantiles",
    oracle="""
    SELECT l_returnflag,
           floor(quantile_cont(l_extendedprice, 0.5) * 100.0 + 0.5) / 100.0 AS exact_p50,
           TRUE AS p50_within_rank_tol,
           TRUE AS p95_within_rank_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_quantiles(spark, sf_dir):
    """percentile_approx (Greenwald-Khanna sketch) — mergeable, single pass.
    The sketch value is engine-specific, so the deterministic contract is:
    the EXACT interpolated median (hash-compared against DuckDB's
    quantile_cont) plus booleans asserting each approx percentile lands
    between the exact quantiles at rank +/- 2% — GK with the default
    accuracy=10000 guarantees rank error <= n/10000, far inside that band."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5).alias("a50"),
        F.percentile_approx("l_extendedprice", 0.95).alias("a95"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("e50"),
        F.expr("percentile(l_extendedprice, 0.48)").alias("e48"),
        F.expr("percentile(l_extendedprice, 0.52)").alias("e52"),
        F.expr("percentile(l_extendedprice, 0.93)").alias("e93"),
        F.expr("percentile(l_extendedprice, 0.97)").alias("e97"),
    )
    return agg.select(
        "l_returnflag",
        round_half_up(F.col("e50"), 2).alias("exact_p50"),
        ((F.col("a50") >= F.col("e48")) & (F.col("a50") <= F.col("e52"))).alias(
            "p50_within_rank_tol"
        ),
        ((F.col("a95") >= F.col("e93")) & (F.col("a95") <= F.col("e97"))).alias(
            "p95_within_rank_tol"
        ),
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(least(floor((o_totalprice - 0.0) / 25000.0), 19) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           floor((min(o_totalprice)) * 100.0 + 0.5) / 100.0 AS lo,
           floor((max(o_totalprice)) * 100.0 + 0.5) / 100.0 AS hi
    FROM orders
    GROUP BY 1
    """,
    tags=("agg", "histogram"),
)
def agg_histogram(spark, sf_dir):
    """Fixed-width histogram via pure bucket arithmetic (portable — no
    engine-specific width_bucket), clamped top bucket. One partial-agg pass;
    the profiling primitive behind range-join band selection and skew
    detection."""
    o = load(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 25000.0), F.lit(19)).cast("long")
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        round_half_up(F.min("o_totalprice"), 2).alias("lo"),
        round_half_up(F.max("o_totalprice"), 2).alias("hi"),
    )


@query(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           floor((regr_slope(l_extendedprice, l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS slope,
           floor((regr_intercept(l_extendedprice, l_quantity)) * 10000.0 + 0.5) / 10000.0 AS intercept,
           floor((regr_r2(l_extendedprice, l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "regression"),
)
def agg_regression(spark, sf_dir):
    """Linear-regression aggregates (price ~ quantity per flag): single-pass
    distributed moments, same formulas both engines."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        round_half_up(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        round_half_up(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        round_half_up(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
    )


@query(
    "agg_mode_deterministic",
    oracle="""
    WITH counts AS (
      SELECT l_returnflag, l_quantity, CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag, l_quantity
    )
    SELECT l_returnflag,
           floor(l_quantity * 10000.0 + 0.5) / 10000.0 AS mode_quantity,
           n AS n_occurrences
    FROM (
      SELECT l_returnflag, l_quantity, n,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY n DESC, l_quantity) AS rk
      FROM counts
    ) WHERE rk = 1
    """,
    tags=("agg", "mode"),
)
def agg_mode_deterministic(spark, sf_dir):
    """Per-group mode with a defined tiebreak (smallest value wins) —
    engines' built-in mode() picks ties arbitrarily, so the portable form
    is count-then-rank: one partial-aggregated shuffle on (group, value),
    then a WindowGroupLimit-prunable rank over value-level rows (group
    cardinality x distinct values, never fact rows)."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("n")
    )
    w = W.partitionBy("l_returnflag").orderBy(
        F.desc("n"), F.asc("l_quantity")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            round_half_up(F.col("l_quantity"), 4).alias("mode_quantity"),
            F.col("n").alias("n_occurrences"),
        )
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS wt
      FROM lineitem
    ), cum AS (
      SELECT l_returnflag, l_extendedprice, wt,
             sum(wt) OVER (PARTITION BY l_returnflag
                           ORDER BY l_extendedprice, l_orderkey, l_linenumber
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_wt,
             sum(wt) OVER (PARTITION BY l_returnflag) AS total_wt,
             l_orderkey, l_linenumber
      FROM w
    )
    SELECT l_returnflag,
           CAST(min(total_wt) AS BIGINT) AS total_weight,
           min(l_extendedprice) AS weighted_median_price
    FROM cum
    WHERE 2 * cum_wt >= total_wt
    GROUP BY l_returnflag
    """,
    tags=("agg", "percentile", "weighted"),
)
def agg_weighted_median(spark, sf_dir):
    """Exact weighted median (lower weighted median: the smallest price at
    which the cumulative quantity reaches half the group's total) — a
    capability Spark has no built-in for (percentile_approx is unweighted).

    Determinism: weights are quantized to BIGINT before the running sum so
    the cumulative is an integer — a float running sum would depend on
    accumulation order. The qualifying rows form a suffix of the unique
    (price, orderkey, linenumber) sort, so min(price) over them IS the
    first qualifying row; no second window needed. One shuffle per group
    key; the window sorts within partitions only."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_quantity") + 0.5).cast("long").alias("wt"),
    )
    order = W.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    cum = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("wt")
        .over(order.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum_wt"),
        F.sum("wt").over(W.partitionBy("l_returnflag")).alias("total_wt"),
    )
    return (
        cum.filter(2 * F.col("cum_wt") >= F.col("total_wt"))
        .groupBy("l_returnflag")
        .agg(
            F.min("total_wt").cast("long").alias("total_weight"),
            F.min("l_extendedprice").alias("weighted_median_price"),
        )
    )


@query(
    "agg_decimal_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1.0 AS DECIMAL(8,4))
                            - CAST(l_discount AS DECIMAL(8,4)))
                    AS DECIMAL(24,6))) * 1000000 AS BIGINT) AS revenue_micros
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "decimal", "exact"),
)
def agg_decimal_exact(spark, sf_dir):
    """Exact DECIMAL money arithmetic — at 100 TB a double-summed revenue
    column drifts by summation ORDER (every AQE re-plan or partition count
    change flips the last digits), so financial aggregates must run on
    fixed-point decimals, where + and * are exact and order-insensitive.
    Price and discount cast to DECIMAL before the multiply, the product
    kept at DECIMAL(24,6) (exact: 2dp x 4dp = 6dp), the sum emitted as
    integer MICROS so the driver hash needs no float tolerance at all.
    Both engines use ANSI decimal semantics; the only portability trap is
    Spark's silent precision-loss on overflow, avoided here by sizing the
    accumulator type to the domain (sum of SF*6M values < 10^5 each fits
    DECIMAL(24,6)'s 10^18 integral headroom through sf100)."""
    l = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.lit(1.0).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)")
    rev = (price * disc).cast("decimal(24,6)")
    return l.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        (F.sum(rev) * F.lit(1000000)).cast("long").alias("revenue_micros"),
    )
