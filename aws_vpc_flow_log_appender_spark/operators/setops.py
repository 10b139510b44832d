"""Set operations (SURVEY §2.6 — the reference has only the ok∪failed union;
intersect/except come free in Spark)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import load, query


@query(
    "set_union_all_tagged",
    oracle="""
    SELECT 'customer' AS side, c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT 'supplier' AS side, s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop", "union"),
)
def set_union_all_tagged(spark, sf_dir):
    """UNION ALL with a provenance tag — the reference's SET1 ok∪failed merge
    (decorator/index.js:213-230) generalized."""
    c = load(spark, sf_dir, "customer").select(
        F.lit("customer").alias("side"), F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("side"), F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s)


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop", "intersect"),
)
def set_intersect(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_custkey % 3 = 0
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_custkey % 6 = 0
    """,
    tags=("setop", "except"),
)
def set_except(spark, sf_dir):
    """EXCEPT with distinct semantics (DataFrame.subtract) — non-empty by
    construction (keys ≡ 3 mod 6 survive)."""
    c = load(spark, sf_dir, "customer")
    a = c.filter(F.col("c_custkey") % 3 == 0).select(F.col("c_custkey").alias("custkey"))
    b = c.filter(F.col("c_custkey") % 6 == 0).select(F.col("c_custkey").alias("custkey"))
    return a.subtract(b)


@query(
    "set_except_all",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT ALL
      SELECT s_nationkey FROM supplier
    )
    """,
    tags=("setop", "except"),
)
def set_except_all(spark, sf_dir):
    """EXCEPT ALL (bag semantics): each right-side occurrence cancels one
    left-side occurrence."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@query(
    "set_distinct_union",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey FROM supplier
    )
    """,
    tags=("setop", "distinct"),
)
def set_distinct_union(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_intersect_all",
    oracle="""
    SELECT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT ALL
      SELECT s_nationkey FROM supplier
    )
    """,
    tags=("setop", "intersect"),
)
def set_intersect_all(spark, sf_dir):
    """INTERSECT ALL (bag semantics): keeps min(multiplicity) per value."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)
