"""Modern SQL surface: recursive CTEs (Spark 4.0+), LATERAL subqueries,
correlated scalar subqueries — the optimizer-level features (recursion
execution, lateral decorrelation, subquery decorrelation) beyond the
classical operator families.
"""

from __future__ import annotations

from .registry import load, query


@query(
    "recursive_cte_month_spine",
    oracle="""
    WITH RECURSIVE months(m) AS (
      SELECT 1
      UNION ALL
      SELECT m + 1 FROM months WHERE m < 12
    ),
    rev AS (
      SELECT CAST(month(o_orderdate) AS INTEGER) AS m,
             floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS revenue,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders WHERE year(o_orderdate) = 1997
      GROUP BY 1
    )
    SELECT months.m AS month,
           coalesce(rev.revenue, 0.0) AS revenue,
           coalesce(rev.n_orders, 0) AS n_orders
    FROM months LEFT JOIN rev ON months.m = rev.m
    """,
    tags=("modernsql", "recursive"),
)
def recursive_cte_month_spine(spark, sf_dir):
    """Recursive CTE (Spark 4.0+ executes WITH RECURSIVE natively): generate
    the 12-month spine recursively and left-join 1997 revenue — months with
    no orders appear as zero rows. The recursion replaces sequence+explode
    generation where the bound is data- or logic-driven."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        WITH RECURSIVE months(m) AS (
          SELECT 1
          UNION ALL
          SELECT m + 1 FROM months WHERE m < 12
        ),
        rev AS (
          SELECT month(o_orderdate) AS m,
                 floor(sum(o_totalprice) * 100.0D + 0.5D) / 100.0D AS revenue,
                 count(*) AS n_orders
          FROM orders WHERE year(o_orderdate) = 1997
          GROUP BY 1
        )
        SELECT months.m AS month,
               coalesce(rev.revenue, 0.0D) AS revenue,
               coalesce(rev.n_orders, 0L) AS n_orders
        FROM months LEFT JOIN rev ON months.m = rev.m
    """)


@query(
    "lateral_top_nations",
    oracle="""
    SELECT r.r_name AS region, t.n_name AS nation, t.n_customers, t.rnk
    FROM region r, LATERAL (
      SELECT n.n_name, CAST(count(c.c_custkey) AS BIGINT) AS n_customers,
             CAST(row_number() OVER (ORDER BY count(c.c_custkey) DESC, n.n_name) AS INTEGER) AS rnk
      FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
      WHERE n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name
      ORDER BY n_customers DESC, n.n_name
      LIMIT 2
    ) t
    """,
    tags=("modernsql", "lateral"),
)
def lateral_top_nations(spark, sf_dir):
    """LATERAL subquery: per outer row (region), a correlated top-2-nations
    subquery — the 'top-k related rows per row' shape without a self-join +
    global window."""
    load(spark, sf_dir, "region").createOrReplaceTempView("region")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql("""
        SELECT r.r_name AS region, t.n_name AS nation, t.n_customers, t.rnk
        FROM region r, LATERAL (
          SELECT n.n_name, count(c.c_custkey) AS n_customers,
                 CAST(row_number() OVER (ORDER BY count(c.c_custkey) DESC, n.n_name) AS INT) AS rnk
          FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          GROUP BY n.n_name
          ORDER BY n_customers DESC, n.n_name
          LIMIT 2
        ) t
    """)


@query(
    "correlated_scalar_subquery",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           floor((o.o_totalprice) * 100.0 + 0.5) / 100.0 AS totalprice
    FROM orders o
    WHERE o.o_totalprice > floor(1.5 * (
      SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    ) * 100.0 + 0.5) / 100.0
    """,
    tags=("modernsql", "subquery"),
)
def correlated_scalar_subquery(spark, sf_dir):
    """Correlated scalar subquery (orders 50% above their own customer's
    average) — Catalyst decorrelates it into an aggregate + join; no per-row
    re-execution. Threshold rounded to 2dp on BOTH engines before comparing
    (the float-boundary rule: partition-parallel vs sequential avg can
    differ in the last ulp; code-review r6)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT o.o_orderkey, o.o_custkey,
               floor(o.o_totalprice * 100.0D + 0.5D) / 100.0D AS totalprice
        FROM orders o
        WHERE o.o_totalprice > floor(1.5D * (
          SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        ) * 100.0D + 0.5D) / 100.0D
    """)
