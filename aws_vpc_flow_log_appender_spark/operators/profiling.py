"""Data-quality profiling and multi-objective selection operators.

``dq_profile_columns`` is the one-pass column profiler every ingestion
pipeline runs before accepting a new drop (null rates, cardinalities,
ranges); ``skyline_pareto_2d`` is the Pareto-frontier selection that turns
"cheap AND big" style multi-objective filters into an O(n log n) sweep
instead of the naive all-pairs dominance join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import round_half_up
from .registry import load, query

# (column, is_numeric) pairs profiled over lineitem.
_PROFILE_COLS = [
    ("l_orderkey", True),
    ("l_quantity", True),
    ("l_extendedprice", True),
    ("l_discount", True),
    ("l_tax", True),
    ("l_returnflag", False),
    ("l_linestatus", False),
]


def _profile_branch_sql(col: str, numeric: bool) -> str:
    if numeric:
        mn = f"floor(min({col}) * 10000.0 + 0.5) / 10000.0"
        mx = f"floor(max({col}) * 10000.0 + 0.5) / 10000.0"
    else:
        mn, mx = "NULL", "NULL"
    return f"""
    SELECT '{col}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({col}) AS BIGINT) AS n_null,
           CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
           {mn} AS min_value,
           {mx} AS max_value
    FROM lineitem
    """


@query(
    "dq_profile_columns",
    oracle=" UNION ALL ".join(
        _profile_branch_sql(c, num) for c, num in _PROFILE_COLS
    ),
    tags=("quality", "profiling"),
)
def dq_profile_columns(spark, sf_dir):
    """Column profiler over lineitem: per-column row/null/distinct counts
    plus rounded numeric ranges, unpivoted to one row per column — the
    acceptance report a data platform emits for every new partition. The
    Spark plan computes EVERY column's stats in a single aggregate pass
    (one scan, one shuffle of partial aggregates) and unpivots the 1-row
    result with a stack(); the oracle states the same result as per-column
    UNION ALL branches, so the one-pass fusion is checked against the
    naive N-scan form. countDistinct on N columns in one agg multiplies
    shuffle width by N — at petabyte scale you'd swap in approx_count
    _distinct per column; exact here because the oracle must match."""
    li = load(spark, sf_dir, "lineitem")
    aggs = []
    for c, numeric in _PROFILE_COLS:
        aggs += [
            F.count("*").alias(f"{c}__rows"),
            (F.count("*") - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__distinct"),
        ]
        if numeric:
            aggs += [
                round_half_up(F.min(c), 4).cast("double").alias(f"{c}__min"),
                round_half_up(F.max(c), 4).cast("double").alias(f"{c}__max"),
            ]
    one = li.agg(*aggs)
    stack_args = []
    for c, numeric in _PROFILE_COLS:
        mn = f"`{c}__min`" if numeric else "CAST(NULL AS DOUBLE)"
        mx = f"`{c}__max`" if numeric else "CAST(NULL AS DOUBLE)"
        stack_args.append(
            f"'{c}', `{c}__rows`, `{c}__null`, `{c}__distinct`, {mn}, {mx}"
        )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {', '.join(stack_args)}) AS "
            "(column_name, n_rows, n_null, n_distinct, min_value, max_value)"
        )
    )


@query(
    "skyline_pareto_2d",
    oracle="""
    SELECT p.p_partkey,
           floor(p.p_retailprice * 10000.0 + 0.5) / 10000.0 AS price,
           p.p_size AS size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
    tags=("quality", "skyline"),
)
def skyline_pareto_2d(spark, sf_dir):
    """2D Pareto skyline over part (minimize retail price, maximize size):
    parts no other part dominates. The oracle is the textbook NOT EXISTS
    dominance test (quadratic, fine at fixture scale); the Spark plan is the
    O(n log n) sweep — collapse to one best-size row per distinct price,
    take the running max of size over strictly-cheaper prices with a lag'd
    prefix window, keep prices whose best size strictly beats every cheaper
    one, and join back to recover the winning parts (price-AND-size ties
    are all skyline members, which the equi-join preserves). The window
    runs over DISTINCT PRICES, not parts — dim-sized after the first
    aggregate, so no single-partition scan over the fact table; the two
    formulations being structurally unrelated is what makes the check
    strong."""
    from pyspark.sql import Window as W

    part = load(spark, sf_dir, "part")
    per_price = part.groupBy("p_retailprice").agg(
        F.max("p_size").alias("best_size")
    )
    w = W.orderBy("p_retailprice").rowsBetween(W.unboundedPreceding, -1)
    frontier = (
        per_price.withColumn(
            "prefix_best", F.max("best_size").over(w)
        )
        .filter(
            F.col("prefix_best").isNull()
            | (F.col("best_size") > F.col("prefix_best"))
        )
        .select(
            F.col("p_retailprice").alias("f_price"),
            F.col("best_size").alias("f_size"),
        )
    )
    return (
        part.join(
            F.broadcast(frontier),
            (F.col("p_retailprice") == F.col("f_price"))
            & (F.col("p_size") == F.col("f_size")),
        )
        .select(
            "p_partkey",
            round_half_up(F.col("p_retailprice"), 4).alias("price"),
            F.col("p_size").alias("size"),
        )
    )
