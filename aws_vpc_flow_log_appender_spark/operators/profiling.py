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


# The expectation suite: (name, oracle-SQL producing n_checked/n_violations).
# Referential checks count orphan foreign keys via NOT EXISTS; range/null
# checks count in-row violations. Each branch is a tiny aggregate; the
# report is their union — the Great-Expectations-shaped contract gate an
# ingestion pipeline runs before promoting a drop.
_EXPECTATIONS_SQL = [
    ("lineitem.orderkey_references_orders", """
        SELECT CAST(count(*) AS BIGINT) AS n_checked,
               CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    """),
    ("orders.custkey_references_customer", """
        SELECT CAST(count(*) AS BIGINT) AS n_checked,
               CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """),
    ("lineitem.quantity_in_1_to_50", """
        SELECT CAST(count(*) AS BIGINT) AS n_checked,
               CAST(sum(CASE WHEN l_quantity IS NULL
                               OR l_quantity < 1 OR l_quantity > 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        FROM lineitem
    """),
    ("lineitem.discount_in_0_to_0.1", """
        SELECT CAST(count(*) AS BIGINT) AS n_checked,
               CAST(sum(CASE WHEN l_discount IS NULL
                               OR l_discount < 0 OR l_discount > 0.1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        FROM lineitem
    """),
    ("orders.orderdate_not_null", """
        SELECT CAST(count(*) AS BIGINT) AS n_checked,
               CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations
        FROM orders
    """),
    ("documents.text_not_empty", """
        SELECT CAST(count(*) AS BIGINT) AS n_checked,
               CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        FROM documents
    """),
]


@query(
    "dq_expectations",
    oracle=" UNION ALL ".join(
        f"""SELECT '{name}' AS expectation, n_checked, n_violations,
            CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS pass
            FROM ({sql})"""
        for name, sql in _EXPECTATIONS_SQL
    ),
    tags=("dq", "expectations", "join"),
)
def dq_expectations(spark, sf_dir):
    """Expectation-suite validation (the Great-Expectations contract shape):
    referential-integrity checks (orphan foreign keys via left-join null
    probes — at scale these are the only shuffling branches, keyed on the
    FK), range bounds, and null/empty rules, emitted as one report row per
    expectation with a pass flag. Each branch is a single aggregate over
    one scan; the report union is rows = |suite|, so running the suite on
    a 100 TB drop costs the scans, not the report. A violation COUNT
    (rather than a bare boolean) is what lets a pipeline set tolerance
    thresholds downstream."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    d = load(spark, sf_dir, "documents")

    # n_checked counts the frame's rows (for FK branches: post-join rows —
    # a fanned-out duplicate key multi-counts, which is the desired signal
    # strength when referential data is bad). The old signature carried an
    # unused n_checked_col parameter that implied column-scoped counting it
    # never did (code-review r6).
    def report(name, violation_col, frame):
        return frame.agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(violation_col.cast("int")).cast("long").alias("n_violations"),
        ).select(
            F.lit(name).alias("expectation"),
            "n_checked",
            "n_violations",
            F.when(F.col("n_violations") == 0, 1).otherwise(0).alias("pass"),
        )

    lo = l.join(o, l.l_orderkey == o.o_orderkey, "left")
    oc = o.join(c, o.o_custkey == c.c_custkey, "left")
    branches = [
        report("lineitem.orderkey_references_orders",
               F.col("o_orderkey").isNull(), lo),
        report("orders.custkey_references_customer",
               F.col("c_custkey").isNull(), oc),
        report("lineitem.quantity_in_1_to_50",
               F.col("l_quantity").isNull()
               | (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), l),
        report("lineitem.discount_in_0_to_0.1",
               F.col("l_discount").isNull()
               | (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), l),
        report("orders.orderdate_not_null",
               F.col("o_orderdate").isNull(), o),
        report("documents.text_not_empty",
               F.col("text").isNull() | (F.length("text") == 0), d),
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


# --- PSI drift between corpus snapshots (r10) --------------------------------

# Fixed 8-bin histogram of n_chars (width 80, top bin open-ended): bins are
# CONSTANT, not data-derived quantiles, so two snapshots bin identically
# without sharing state and the per-source sketch is 8 integers forever.
_PSI_BINS = 8
_PSI_BIN_WIDTH = 80
# Laplace-smoothed shares and the PSI sum, quantized to parts-per-billion
# BEFORE summation so the 8-term fold is an order-insensitive integer sum.
_PSI_TERM_SQL = (
    "CAST(floor(((nb + 1.0{D})/(cb + 8.0{D}) - (na + 1.0{D})/(ca + 8.0{D}))"
    " * ln(((nb + 1.0{D}) * (ca + 8.0{D}))/((na + 1.0{D}) * (cb + 8.0{D})))"
    " * 1000000000.0{D} + 0.5{D}) AS BIGINT)"
)
# industry convention: PSI >= 0.1 = noticeable shift worth a retrain review
_PSI_DRIFT_PPB = 100_000_000


@query(
    "dq_psi_drift",
    oracle=f"""
    WITH b AS (
      SELECT source, least({_PSI_BINS - 1}, n_chars // {_PSI_BIN_WIDTH}) AS bin,
             CAST(count(*) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN doc_id % 4 != 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS na
      FROM documents
      GROUP BY source, least({_PSI_BINS - 1}, n_chars // {_PSI_BIN_WIDTH})
    ),
    s AS (SELECT DISTINCT source FROM documents),
    bins AS (SELECT unnest(range({_PSI_BINS})) AS bin),
    dense AS (
      SELECT s.source, bins.bin,
             coalesce(b.na, 0) AS na, coalesce(b.nb, 0) AS nb
      FROM s CROSS JOIN bins
      LEFT JOIN b ON b.source = s.source AND b.bin = bins.bin
    ),
    tot AS (
      SELECT source, na, nb,
             sum(na) OVER (PARTITION BY source) AS ca,
             sum(nb) OVER (PARTITION BY source) AS cb
      FROM dense
    ),
    terms AS (
      SELECT source, ca, cb, {_PSI_TERM_SQL.format(D="")} AS term_ppb
      FROM tot
    )
    SELECT source,
           CAST(max(ca) AS BIGINT) AS n_prev,
           CAST(max(cb) AS BIGINT) AS n_curr,
           CAST(sum(term_ppb) AS BIGINT) AS psi_ppb,
           CAST(sum(term_ppb) >= {_PSI_DRIFT_PPB} AS BOOLEAN) AS drift_flag
    FROM terms GROUP BY source
    """,
    tags=("quality", "drift", "psi"),
)
def dq_psi_drift(spark, sf_dir):
    """Population Stability Index between two corpus snapshots, per source —
    the drift monitor a production curation pipeline runs on every new
    crawl drop: has a source's document-length distribution shifted enough
    (template change, boilerplate injection, crawler regression) that the
    quality thresholds trained on the previous snapshot no longer apply?
    Snapshot A is the incremental-dedup family's 'previous' split
    (doc_id % 4 != 1), snapshot B is the full current corpus.

    PSI = sum over bins of (p_B - p_A) * ln(p_B / p_A) over a FIXED 8-bin
    length histogram with Laplace-smoothed shares ((n+1)/(total+8) — no
    log-of-zero, no data-dependent bin edges, so snapshots bin identically
    without shared state). Each bin term is computed from four integers and
    quantized to parts-per-billion BEFORE the per-source fold, making the
    sum order-insensitive (the scaled-integer determinism discipline);
    drift_flag applies the conventional 0.1 review threshold.

    Scale shape: one corpus scan -> partial-aggregable groupBy(source, bin)
    whose state is at most 8 rows per source; the bin densification and
    total-window run over that 8 x |sources| relation, never the corpus —
    one Exchange on source (the curation_quality_rank_filter class). The
    per-source sketch (8 bin counts) is mergeable across partitions,
    snapshots, and days — constant-size state at 100 TB.

    Reference scope note: extension surface (SURVEY §2 'beyond the
    reference' LLM-pipeline rungs), no reference counterpart."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    b = d.groupBy(
        "source",
        F.expr(f"least({_PSI_BINS - 1}, n_chars div {_PSI_BIN_WIDTH})")
        .alias("bin"),
    ).agg(
        F.count("*").alias("nb"),
        F.sum(
            F.when(F.col("doc_id") % 4 != 1, 1).otherwise(0)
        ).alias("na"),
    )
    srcs = b.select("source").distinct()
    bins = spark.range(_PSI_BINS).select(F.col("id").alias("bin"))
    dense = (
        srcs.crossJoin(F.broadcast(bins))
        .join(b, ["source", "bin"], "left")
        .select(
            "source",
            F.coalesce("na", F.lit(0)).cast("long").alias("na"),
            F.coalesce("nb", F.lit(0)).cast("long").alias("nb"),
        )
    )
    sw = W.partitionBy("source")
    tot = dense.select(
        "source",
        "na",
        "nb",
        F.sum("na").over(sw).alias("ca"),
        F.sum("nb").over(sw).alias("cb"),
    )
    term = F.expr(_PSI_TERM_SQL.format(D="D"))
    return (
        tot.select("source", "ca", "cb", term.alias("term_ppb"))
        .groupBy("source")
        .agg(
            F.max("ca").alias("n_prev"),
            F.max("cb").alias("n_curr"),
            F.sum("term_ppb").alias("psi_ppb"),
        )
        .select(
            "source",
            "n_prev",
            "n_curr",
            "psi_ppb",
            (F.col("psi_ppb") >= _PSI_DRIFT_PPB).alias("drift_flag"),
        )
    )
