"""Advanced relational operators: grouping sets, array/map functions,
subqueries, range frames, unpivot, exact percentiles, filtered aggregates,
date arithmetic. Completes the classical-operator families the reference
lacks entirely (SURVEY §2.4/§2.5 'none in reference — free in Spark').
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions import round_half_up
from .registry import load, query


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg", "groupingsets"),
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (by-flag, by-status, grand total) — planned as
    a single Expand + one aggregation pass, not three scans."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n_rows,
               -- 100.0D: plain 100.0 parses as DECIMAL in Spark SQL and the
               -- result column would arrive as Decimal objects, not double
               floor(sum(l_extendedprice) * 100.0D + 0.5D) / 100.0D AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
           floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15
    """,
    tags=("agg", "having"),
)
def agg_having(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            round_half_up(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "agg_filtered_count_if",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_discount > 0.05) AS BIGINT) AS n_discounted,
           CAST(count(*) FILTER (WHERE l_quantity >= 25) AS BIGINT) AS n_bulk,
           floor((sum(l_extendedprice) FILTER (WHERE l_tax > 0.04)) * 100.0 + 0.5) / 100.0 AS taxed_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "filter"),
)
def agg_filtered_count_if(spark, sf_dir):
    """Filtered aggregates (count_if / FILTER clause)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.count_if(F.col("l_quantity") >= 25).alias("n_bulk"),
        round_half_up(
            F.sum(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice"))), 2
        ).alias("taxed_price"),
    )


@query(
    "agg_exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           floor((quantile_cont(l_extendedprice, 0.5)) * 1000000.0 + 0.5) / 1000000.0 AS p50,
           floor((quantile_cont(l_extendedprice, 0.9)) * 1000000.0 + 0.5) / 1000000.0 AS p90,
           floor((median(l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS qty_median
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "percentile"),
)
def agg_exact_percentiles(spark, sf_dir):
    """Exact percentiles (linear interpolation) — both engines sort-and-
    interpolate, so values match bit-for-bit; the approx twin is
    agg_approx_quantiles."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        round_half_up(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50"),
        round_half_up(F.percentile("l_extendedprice", F.lit(0.9)), 6).alias("p90"),
        round_half_up(F.median("l_quantity"), 6).alias("qty_median"),
    )


@query(
    "agg_min_max_by",
    oracle="""
    SELECT o_custkey,
           max(CASE WHEN rmax = 1 THEN o_orderkey END) AS biggest_order,
           max(CASE WHEN rmin = 1 THEN o_orderkey END) AS smallest_order,
           floor((max(o_totalprice)) * 100.0 + 0.5) / 100.0 AS max_price
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
             row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
      FROM orders
    )
    GROUP BY o_custkey
    """,
    tags=("agg", "argmax"),
)
def agg_min_max_by(spark, sf_dir):
    """arg_max/arg_min (max_by/min_by): single-pass 'key of the extreme row'.
    The ordering value is a (price, orderkey) struct so price ties resolve
    identically in both engines (bare max_by on a tied value is arbitrary)."""
    o = load(spark, sf_dir, "orders")
    tie = F.struct("o_totalprice", "o_orderkey")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", tie).alias("biggest_order"),
        F.min_by("o_orderkey", tie).alias("smallest_order"),
        round_half_up(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "array_collect_sorted",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list(l_linenumber ORDER BY l_linenumber), ',') AS linenumbers,
           array_to_string(list_sort(list_distinct(list(l_returnflag))), ',') AS flags,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    """,
    tags=("array", "collect"),
)
def array_collect_sorted(spark, sf_dir):
    """Array aggregation (collect_list/collect_set) with deterministic
    ordering, serialized for comparison."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("l_linenumber"))).alias("linenumbers"),
        F.concat_ws(",", F.sort_array(F.collect_set("l_returnflag"))).alias("flags"),
        F.count("*").alias("n_lines"),
    )


@query(
    "array_explode_wordcount",
    oracle="""
    SELECT word, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
    tags=("array", "explode"),
)
def array_explode_wordcount(spark, sf_dir):
    """The canonical explode -> count -> top-k (word count) over documents."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@query(
    "map_funcs",
    oracle="""
    SELECT user_id,
           CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS n_clicks,
           CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS n_purchases,
           CAST(count(DISTINCT event_type) AS INTEGER) AS n_types
    FROM events
    GROUP BY user_id
    """,
    tags=("map",),
)
def map_funcs(spark, sf_dir):
    """Map construction + lookup: per-user event-type histogram built as a
    map column (map_from_entries over collect_list), probed with element_at.
    The oracle checks the extracted scalars (maps don't hash portably)."""
    e = load(spark, sf_dir, "events")
    hist = (
        e.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("event_type", "n"))
            ).alias("type_map")
        )
    )
    return hist.select(
        "user_id",
        F.coalesce(F.element_at("type_map", "click"), F.lit(0)).alias("n_clicks"),
        F.coalesce(F.element_at("type_map", "purchase"), F.lit(0)).alias("n_purchases"),
        F.size("type_map").alias("n_types"),
    )


@query(
    "subquery_scalar_and_in",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_totalprice >
          floor(1.5 * (SELECT avg(o_totalprice) FROM orders) * 100.0 + 0.5) / 100.0
      AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
    """,
    tags=("subquery",),
)
def subquery_scalar_and_in(spark, sf_dir):
    """Scalar subquery + IN subquery (planned as a one-row broadcast and a
    left-semi join). The scalar threshold is rounded to 2dp on BOTH engines
    before comparing (code-review r6: partition-parallel vs sequential
    summation can differ in the last ulp, and an order within an ulp of
    1.5*avg would flip between engines — the float-boundary rule every
    other scalar-subquery threshold here already follows)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice >
              floor(1.5D * (SELECT avg(o_totalprice) FROM orders) * 100.0D + 0.5D) / 100.0D
          AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
    """)


@query(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, epoch_day,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY epoch_day
                RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT) AS orders_30d
    FROM (
      SELECT o_custkey, o_orderkey,
             CAST(floor(epoch(date_trunc('day', o_orderdate)) / 86400) AS BIGINT) AS epoch_day
      FROM orders
    )
    """,
    tags=("window", "range"),
)
def window_range_frame(spark, sf_dir):
    """RANGE frame over a numeric day index: rolling 30-day order count per
    customer (value-based frame, not row-based)."""
    o = load(spark, sf_dir, "orders")
    epoch_day = (F.unix_timestamp(F.date_trunc("day", "o_orderdate")) / 86400).cast("long")
    w = W.partitionBy("o_custkey").orderBy("epoch_day").rangeBetween(-29, 0)
    return (
        o.select("o_custkey", "o_orderkey", epoch_day.alias("epoch_day"))
        .withColumn("orders_30d", F.count("*").over(w))
    )


@query(
    "unpivot_stack",
    oracle="""
    SELECT p_partkey, 'brand' AS attr, p_brand AS val FROM part
    UNION ALL
    SELECT p_partkey, 'type' AS attr, p_type AS val FROM part
    UNION ALL
    SELECT p_partkey, 'size' AS attr, CAST(p_size AS VARCHAR) AS val FROM part
    """,
    tags=("unpivot",),
)
def unpivot_stack(spark, sf_dir):
    """Unpivot (wide -> long) via stack()."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr(
            "stack(3, 'brand', p_brand, 'type', p_type, 'size', cast(p_size as string))"
        ).alias("attr", "val"),
    )


@query(
    "dedup_latest_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_order,
           strftime(o_orderdate, '%Y-%m-%d') AS latest_date
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
    tags=("window", "dedup"),
)
def dedup_latest_per_key(spark, sf_dir):
    """Latest-row-per-key (the SCD/CDC compaction primitive): window
    row_number=1 — one shuffle, WindowGroupLimit-optimized."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_order"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_date"),
        )
    )


@query(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-12-31') AS INTEGER) AS days_to_eoy,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow_1sun
    FROM orders WHERE o_orderkey % 7 = 0
    """,
    tags=("scalar", "datetime"),
)
def date_arithmetic(spark, sf_dir):
    """Date arithmetic family: interval add, diff, month boundaries, dow
    (normalized to Spark's 1=Sunday convention; DuckDB uses 0=Sunday)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate")).alias("days_to_eoy"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.dayofweek("o_orderdate").alias("dow_1sun"),
    )


@query(
    "join_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0 AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-06-01'
      AND l.l_shipdate > TIMESTAMP '1997-06-01'
    GROUP BY l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'), o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def join_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3: selective dim filter -> star join -> agg -> global top-k.
    The mkt-segment filter pushes into the customer scan before broadcast;
    the final top-10 is TakeOrderedAndProject (no global sort)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-06-01")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-06-01")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            round_half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "regexp_extract_all_join",
    oracle="""
    SELECT c_custkey,
           array_to_string(regexp_extract_all(c_name, '\\d+'), '-') AS digit_groups,
           CAST(length(regexp_extract_all(c_name, '\\d+')) AS INTEGER) AS n_groups
    FROM customer
    """,
    tags=("scalar", "regex"),
)
def regexp_extract_all_join(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    # Spark requires a capture group (idx defaults to 1); DuckDB's group 0 is
    # the full match — same strings for this pattern
    groups = F.regexp_extract_all("c_name", F.lit(r"(\d+)"))
    return c.select(
        "c_custkey",
        F.concat_ws("-", groups).alias("digit_groups"),
        F.size(groups).alias("n_groups"),
    )


@query(
    "agg_bitwise",
    oracle="""
    SELECT event_type,
           CAST(bit_and(user_id) AS BIGINT) AS uid_and,
           CAST(bit_or(user_id) AS BIGINT) AS uid_or,
           CAST(bit_xor(user_id) AS BIGINT) AS uid_xor
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "bitwise"),
)
def agg_bitwise(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.bit_and("user_id").alias("uid_and"),
        F.bit_or("user_id").alias("uid_or"),
        F.bit_xor("user_id").alias("uid_xor"),
    )


@query(
    "grouped_map_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS price_rank,
           floor((o_totalprice / max(o_totalprice) OVER (PARTITION BY o_custkey))
                 * 1000000.0 + 0.5) / 1000000.0 AS price_vs_best
    FROM orders
    """,
    tags=("udf", "groupedmap"),
)
def grouped_map_rank(spark, sf_dir):
    """Grouped-map Pandas UDF (applyInPandas): per-customer rank + normalized
    price computed in pandas per group — the custom-per-group-logic escape
    hatch. The oracle is the pure-relational window twin, so the UDF path is
    hash-verified against built-in semantics."""
    import pandas as pd

    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).reset_index(drop=True)
        pdf["price_rank"] = (pdf.index + 1).astype("int32")
        import math

        best = pdf["o_totalprice"].max()
        pdf["price_vs_best"] = [
            math.floor((v / best) * 1e6 + 0.5) / 1e6 for v in pdf["o_totalprice"]
        ]
        return pdf[["o_custkey", "o_orderkey", "price_rank", "price_vs_best"]]

    return o.groupBy("o_custkey").applyInPandas(
        per_group,
        schema="o_custkey long, o_orderkey long, price_rank int, price_vs_best double",
    )
