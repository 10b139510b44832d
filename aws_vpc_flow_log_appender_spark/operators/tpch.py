"""Classic TPC-H queries adapted to the driver tables' column subset.

Coverage: all 22 (Q1 lives in aggregates.py as ``agg_pricing_summary``).
Q3/Q5/Q6/Q7/Q8/Q10/Q13/Q14/Q15/Q18/Q19 keep their canonical shapes; Q4, Q9,
Q16, Q17, Q21 and Q22 keep the canonical *query shape* (EXISTS semi-join,
profit-by-nation-year, distinct-supplier counts, correlated per-part average,
double-correlated waiting-supplier, rich-customers anti-join) with predicates
adapted to the columns that exist (no commitdate/receiptdate/partsupp/
c_phone here). Q2, Q11, Q12 and Q20 — whose defining columns (partsupp.*,
l_shipmode, l_commitdate/receiptdate, ps_availqty) are absent entirely —
keep their canonical shapes with lineitem's (l_partkey, l_suppkey) pairs as
the part-supplier relationship (the same stand-in Q16 uses); see the section
comment above their definitions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import round_half_up
from .registry import load, query


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT floor((sum(l_extendedprice * l_discount)) * 100.0 + 0.5) / 100.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "agg"),
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """Q6: pure scan-filter-aggregate — the pushdown showcase (all four
    predicates reach the parquet scan; no shuffle beyond the final 1-row agg)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            round_half_up(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0 AS revenue,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q10_returned_items(spark, sf_dir):
    """Q10: who returned the most — selective fact filter, star join, top-20."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            round_half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q14_promo_revenue",
    oracle="""
    SELECT floor((100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                         THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount))) * 1000000.0 + 0.5) / 1000000.0
           AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate < TIMESTAMP '1997-04-01'
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q14_promo_revenue(spark, sf_dir):
    """Q14: promo revenue share — broadcast part dim, conditional aggregate."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    p = load(spark, sf_dir, "part")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            round_half_up(
                100.0
                * F.sum(F.when(F.col("p_type").like("PROMO%"), net).otherwise(0.0))
                / F.sum(net),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           floor((o.o_totalprice) * 100.0 + 0.5) / 100.0 AS totalprice,
           floor((sum(l.l_quantity)) * 100.0 + 0.5) / 100.0 AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d'),
             floor((o.o_totalprice) * 100.0 + 0.5) / 100.0
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("tpch", "subquery", "agg"),
)
def tpch_q18_large_orders(spark, sf_dir):
    """Q18: large-volume orders — the HAVING-subquery semi-join pattern; the
    qualifying-keys set is aggregated first and semi-joined (no fanout)."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            round_half_up(F.col("o_totalprice"), 2).alias("totalprice"),
        )
        .agg(round_half_up(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle="""
    SELECT floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_matches
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 40)
    """,
    tags=("tpch", "join", "disjunctive"),
)
def tpch_q19_discounted_revenue(spark, sf_dir):
    """Q19: disjunctive join predicates (brand/size/quantity triples) — the
    equi-key (partkey) still drives the join; the OR-of-ANDs is a residual."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 40))
    )
    return j.filter(cond).agg(
        round_half_up(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count("*").alias("n_matches"),
    )


@query(
    "tpch_q4_priority_semi",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("tpch", "semi-join", "agg"),
)
def tpch_q4_priority_semi(spark, sf_dir):
    """Q4 shape (order priority checking): EXISTS semi-join from orders into
    lineitem, grouped by priority. The canonical commitdate<receiptdate
    predicate is absent from this column subset; returned-items stands in.
    LEFT SEMI keeps the fact table un-duplicated (no post-join distinct) and
    the orders-side date filter is pushed to the scan."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    """Q5 (local supplier volume), canonical shape: the only TPC-H query with
    a join predicate BETWEEN dimensions (customer.nation = supplier.nation).
    Facts join facts on keys (AQE picks the strategy); every dimension is
    broadcast; the region filter prunes nations before they ever reach the
    fact side."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            round_half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "nation")
    )


@query(
    "tpch_q16_parts_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#15' AND p.p_size IN (5, 10, 15, 20)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("tpch", "agg", "distinct"),
)
def tpch_q16_parts_supplier_counts(spark, sf_dir):
    """Q16 shape (parts/supplier relationship): distinct-supplier counts per
    part attribute, with lineitem standing in for the absent partsupp table.
    countDistinct plans as a two-stage partial/final aggregate; the selective
    part predicates ride the broadcast dim into the fact scan via DPP-style
    filter pushdown."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#15") & F.col("p_size").isin(5, 10, 15, 20)
    )
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0 AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q3_shipping_priority(spark, sf_dir):
    """Q3: unshipped orders of one segment, top-10 by revenue. The segment
    filter rides the broadcast customer dim; ORDER BY the *rounded* revenue
    with the orderkey tiebreak so the LIMIT cut is engine-independent."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            round_half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """Q7: bilateral trade volume between two nations by year. Both nation
    dims broadcast; the OR-of-pairs predicate is applied after the joins so
    Catalyst keeps both joins as plain equi-joins (no cross-product)."""
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            round_half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           floor((sum(CASE WHEN n1.n_name = 'NATION_2'
                           THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0.0 END)
                  / sum(l.l_extendedprice * (1 - l.l_discount))) * 1000000.0 + 0.5)
             / 1000000.0 AS mkt_share
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n2.n_regionkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
      AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
    GROUP BY year(o.o_orderdate)
    ORDER BY o_year
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q8_market_share(spark, sf_dir):
    """Q8: one supplier-nation's share of a region's market for one part
    type, by year. Five broadcast dims around the lineitem-orders join; the
    share is a conditional-sum / sum over the same grouped rows, computed in
    one aggregate pass (no self-join)."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1998-12-31")
    )
    c = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            round_half_up(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", volume).otherwise(0.0)
                )
                / F.sum(volume),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0
             AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(o.o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q9_product_profit(spark, sf_dir):
    """Q9 shape (product-type profit by nation and year), adapted: profit is
    gross discounted revenue because ps_supplycost lives in the absent
    partsupp table. The substring part filter rides the broadcast part dim;
    supplier/nation broadcast too, so only lineitem-orders shuffles."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(F.broadcast(s), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(n), n.n_nationkey == F.col("s_nationkey"))
        .join(o, o.o_orderkey == l.l_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            round_half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q13_customer_distribution(spark, sf_dir):
    """Q13: order-count distribution over ALL customers (zero included), with
    the priority predicate inside the left join (a WHERE would silently drop
    the zero-order customers). Two cheap aggregations; the second groups a
    customer-cardinality input so its shuffle is tiny."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0
                 AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
    tags=("tpch", "join", "subquery"),
)
def tpch_q15_top_supplier(spark, sf_dir):
    """Q15: supplier(s) with the max quarterly revenue. The max is compared
    on the ROUNDED per-supplier revenue so the equality cut is bit-identical
    across engines; the scalar max is a broadcast cross join against the
    supplier-cardinality aggregate (never the fact table)."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(
        round_half_up(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
    WITH pa AS (
        SELECT l_partkey,
               floor((0.2 * avg(l_quantity)) * 1000000.0 + 0.5) / 1000000.0 AS qty_thr
        FROM lineitem GROUP BY l_partkey
    )
    SELECT floor((sum(l.l_extendedprice) / 7.0) * 100.0 + 0.5) / 100.0 AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_small
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa     ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#11' AND l.l_quantity < pa.qty_thr
    """,
    tags=("tpch", "join", "subquery"),
)
def tpch_q17_small_qty_revenue(spark, sf_dir):
    """Q17: revenue lost to small-quantity orders. The correlated scalar
    subquery (per-part average quantity) is decorrelated into a part-keyed
    aggregate joined back to lineitem — at scale a shuffle on l_partkey both
    sides, which AQE turns into a broadcast when the brand filter makes the
    aggregate side small. The 0.2*avg threshold is rounded to 6 places on
    both engines before the < compare (float-boundary rule)."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    pa = l.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        round_half_up(0.2 * F.avg("l_quantity"), 6).alias("qty_thr")
    )
    return (
        l.join(F.broadcast(p), p.p_partkey == l.l_partkey)
        .join(pa, F.col("pa_partkey") == l.l_partkey)
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            round_half_up(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


@query(
    "tpch_q21_waiting_supplier",
    oracle="""
    WITH per AS (
        SELECT l_orderkey, l_suppkey,
               max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
        FROM lineitem GROUP BY l_orderkey, l_suppkey
    ),
    ord AS (
        SELECT l_orderkey, count(*) AS n_supp, CAST(sum(has_r) AS BIGINT) AS n_r
        FROM per GROUP BY l_orderkey
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM per
    JOIN ord    ON per.l_orderkey = ord.l_orderkey
    JOIN orders o ON o.o_orderkey = per.l_orderkey
    JOIN supplier s ON s.s_suppkey = per.l_suppkey
    WHERE o.o_orderstatus = 'F' AND ord.n_supp > 1
      AND per.has_r = 1 AND ord.n_r = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q21_waiting_supplier(spark, sf_dir):
    """Q21 shape (suppliers who kept multi-supplier orders waiting), adapted:
    with no commit/receipt dates, "kept waiting" is "the only supplier whose
    items were returned" on a finished multi-supplier order. The canonical
    EXISTS / NOT EXISTS double correlation is decorrelated into one per-
    (order, supplier) aggregate plus one per-order rollup — two shuffles on
    l_orderkey that AQE coalesces, instead of two correlated re-scans."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    per = l.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r")
    )
    ord_stats = per.groupBy(F.col("l_orderkey").alias("ord_key")).agg(
        F.count("*").alias("n_supp"), F.sum("has_r").alias("n_r")
    )
    return (
        per.join(ord_stats, per.l_orderkey == F.col("ord_key"))
        .join(o, o.o_orderkey == per.l_orderkey)
        .join(F.broadcast(s), s.s_suppkey == per.l_suppkey)
        .filter((F.col("n_supp") > 1) & (F.col("has_r") == 1) & (F.col("n_r") == 1))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH sel AS (
        SELECT c_custkey, c_acctbal, c_nationkey % 7 AS cntrycode
        FROM customer WHERE c_nationkey % 7 IN (0, 1, 2)
    ),
    thr AS (
        SELECT floor((avg(c_acctbal)) * 10000.0 + 0.5) / 10000.0 AS t
        FROM sel WHERE c_acctbal > 0.0
    )
    SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
           floor((sum(c_acctbal)) * 100.0 + 0.5) / 100.0 AS totacctbal
    FROM sel, thr
    WHERE c_acctbal > t
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = sel.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    tags=("tpch", "join", "antijoin"),
)
def tpch_q22_global_sales_opportunity(spark, sf_dir):
    """Q22 shape (rich customers with no recent orders), adapted: the country
    code is derived from c_nationkey (no c_phone column) and the anti-join is
    date-bounded (the dense fixture leaves no customer with zero orders
    overall). The positive-balance average is rounded to 4 places before the
    > compare on both engines; the NOT EXISTS is a left-anti hash join
    against the pre-filtered orders — at scale both sides shuffle on custkey
    with no correlated re-scan."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    sel = c.filter((F.col("c_nationkey") % 7).isin(0, 1, 2)).select(
        "c_custkey", "c_acctbal", (F.col("c_nationkey") % 7).alias("cntrycode")
    )
    thr = sel.filter(F.col("c_acctbal") > 0.0).agg(
        round_half_up(F.avg("c_acctbal"), 4).alias("t")
    )
    return (
        sel.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("t"))
        .join(o, sel.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            round_half_up(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# Q2 / Q11 / Q12 / Q20 — the four queries whose defining columns (partsupp,
# l_shipmode, l_commitdate/receiptdate, ps_availqty) are absent from the
# driver tables. Adapted with lineitem's (l_partkey, l_suppkey) pairs as the
# part-supplier relationship (the same stand-in Q16 already uses): supplycost
# := min unit price ever shipped, availability := shipped quantity. Each
# keeps its canonical query SHAPE — correlated min (Q2), value-share vs a
# scalar subquery (Q11), lateness-split conditional counts (Q12), nested
# aggregate dominance semi-join (Q20).
# ---------------------------------------------------------------------------


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eligible AS (
      SELECT ps.l_partkey AS partkey, ps.supplycost,
             s.s_name, s.s_acctbal, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT floor(e.s_acctbal * 100.0 + 0.5) / 100.0 AS s_acctbal,
           e.s_name, e.n_name AS nation, p.p_partkey,
           floor(e.supplycost * 10000.0 + 0.5) / 10000.0 AS supplycost
    FROM eligible e
    JOIN part p ON p.p_partkey = e.partkey
    WHERE p.p_type = 'LARGE' AND p.p_size <= 10
      AND e.supplycost = (SELECT min(e2.supplycost) FROM eligible e2
                          WHERE e2.partkey = e.partkey)
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 100
    """,
    tags=("tpch", "correlated-subquery", "join"),
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape: cheapest EUROPE supplier per qualifying part. The
    correlated `= (SELECT min ...)` compiles to a min-over-partkey window on
    the region-filtered candidates; equality filters on the UNROUNDED double
    (identical on both engines — same inputs, order-independent min) so ties
    keep every cheapest supplier, exactly like the spec query. All dims
    broadcast; the only shuffle is the (partkey, suppkey) cost aggregate."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        ps.join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select(
            F.col("l_partkey").alias("partkey"),
            "supplycost", "s_name", "s_acctbal",
            F.col("n_name").alias("nation"),
        )
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    wmin = F.min("supplycost").over(W.partitionBy("partkey"))
    return (
        eligible.join(F.broadcast(p), F.col("partkey") == p.p_partkey)
        .withColumn("min_cost", wmin)
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select(
            round_half_up(F.col("s_acctbal"), 2).alias("s_acctbal"),
            "s_name",
            "nation",
            "p_partkey",
            round_half_up(F.col("supplycost"), 4).alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH ps AS (
      SELECT l.l_partkey,
             sum(l.l_extendedprice * (1 - l.l_discount)) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey,
           floor(value * 100.0 + 0.5) / 100.0 AS part_value
    FROM ps
    WHERE floor(value * 100.0 + 0.5) / 100.0
          > (SELECT floor(avg(value) * 3.0 * 100.0 + 0.5) / 100.0 FROM ps)
    ORDER BY part_value DESC, p_partkey
    """,
    tags=("tpch", "scalar-subquery", "agg"),
)
def tpch_q11_important_stock(spark, sf_dir):
    """Q11 shape: parts representing a significant share of one nation's
    supplied value, thresholded by a scalar subquery over the same
    aggregate. The per-part value aggregates once and is reused for both
    the rows and the global threshold (self-referential CTE -> cached-plan
    reuse); the 1-row threshold broadcasts via crossJoin. Both sides of the
    > compare at 2dp so the cut is engine-independent (the z-score-boundary
    lesson from ts_mad_outliers)."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    ps = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value")
        )
    )
    threshold = ps.agg(
        round_half_up(F.avg("value") * F.lit(3.0), 2).alias("threshold")
    )
    return (
        ps.crossJoin(F.broadcast(threshold))
        .filter(round_half_up(F.col("value"), 2) > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            round_half_up(F.col("value"), 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


@query(
    "tpch_q12_late_shipment_priority",
    oracle="""
    SELECT l.l_returnflag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("tpch", "join", "conditional-agg"),
)
def tpch_q12_late_shipment_priority(spark, sf_dir):
    """Q12 shape: late shipments split by order priority, with l_returnflag
    standing in for the absent l_shipmode and ship-after-90-days for the
    absent commit/receipt lateness predicate. The year filter prunes the
    fact scan; the lateness predicate is a join residual; counts are
    integer-exact on both engines."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "tpch_q20_dominant_supplier",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    part_total AS (
      SELECT l_partkey, sum(qty) AS total_qty FROM shipped GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_name, n.n_name AS nation
    FROM shipped sh
    JOIN part_total pt ON pt.l_partkey = sh.l_partkey
    JOIN part p       ON p.p_partkey = sh.l_partkey
    JOIN supplier s   ON s.s_suppkey = sh.l_suppkey
    JOIN nation n     ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE 'red%' AND sh.qty > 0.5 * pt.total_qty
    ORDER BY s_name
    """,
    tags=("tpch", "nested-agg", "semi-join"),
)
def tpch_q20_dominant_supplier(spark, sf_dir):
    """Q20 shape: suppliers who dominate the supply of a part family —
    shipped quantity standing in for ps_availqty, `> half of the part's
    total shipped` for the spec's `availqty > half of qty ordered`.

    The part total comes from a partkey WINDOW over the already-aggregated
    (partkey, suppkey) pairs, not a second groupBy+join: the DataFrame API
    doesn't share subplans, so the join formulation scans and shuffles
    lineitem twice, while the window re-exchanges only the pair-sized
    aggregate. Quantities are integral doubles, so the dominance comparison
    is exact on both engines."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        shipped.withColumn(
            "total_qty", F.sum("qty").over(W.partitionBy("l_partkey"))
        )
        .filter(F.col("qty") > 0.5 * F.col("total_qty"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"))
        .distinct()
        .orderBy("s_name")
    )
