"""Mergeable summary sketches — bounded-memory aggregation for 100 TB scans.

Exact `groupBy(key)` answers need state proportional to the number of
distinct keys; on a web-scale corpus (Heaps'-law vocabularies, 10^8+
tokens) that is exactly the unbounded-broadcast / giant-shuffle class the
r5 verdict flagged. Sketches answer the same questions in CONSTANT space:
a count-min matrix is d x w integers however many tokens exist, a KMV
sample is k hashes per group. Both are trivially mergeable (cell-wise sum
/ min-k union), which is what makes them map-side-combinable partial
aggregates in Spark — every executor folds its partition into the same
fixed-size state, one tiny shuffle merges them.

The determinism discipline that makes them ORACLE-CHECKABLE here (the
whole point of this registry): the hash functions are md5-hex-slice
arithmetic shared textually with DuckDB (the ext/dedup simhash idiom —
Spark `conv(substring(md5(..),..),16,10)` == DuckDB
`CAST('0x'||substr(md5(..),..) AS BIGINT)`), and every accumulator is an
integer sum/min, so partition order can never flip a result bit. No
sampling, no RNG, no float accumulation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.registry import load, query

# count-min geometry: d independent rows x w buckets. With w = 512 the
# expected collision overestimate per row is total_count/512 and the min
# over d = 4 rows keeps it near the true count for heavy hitters while the
# sketch stays 2048 BIGINTs — the accuracy/space trade is visible in the
# query output itself (`overestimate` column).
_CM_D = 4
_CM_W = 512


def _cm_bucket_spark(j_col, tok_col):
    """Row-j count-min bucket for a token: first 8 md5 hex chars (32 bits,
    sign-safe in BIGINT) of 'j:token', mod w. Textually mirrored by
    _cm_bucket_sql below."""
    h = F.md5(
        F.encode(F.concat(j_col.cast("string"), F.lit(":"), tok_col), "utf-8")
    )
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _CM_W


def _cm_bucket_sql(j_expr: str, tok_expr: str) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST({j_expr} AS VARCHAR) || ':' || "
        f"{tok_expr}), 1, 8) AS BIGINT) % {_CM_W}"
    )


@query(
    "agg_countmin_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tc AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS true_count
      FROM toks WHERE tok <> '' GROUP BY tok
    ),
    js AS (SELECT unnest(range({_CM_D})) AS j),
    hb AS (
      SELECT j, tok, true_count,
             {_cm_bucket_sql("j", "tok")} AS bucket
      FROM tc CROSS JOIN js
    ),
    sk AS (
      SELECT j, bucket, CAST(sum(true_count) AS BIGINT) AS cnt
      FROM hb GROUP BY j, bucket
    ),
    est AS (
      SELECT hb.tok, hb.true_count,
             CAST(min(sk.cnt) AS BIGINT) AS cm_estimate
      FROM hb JOIN sk ON hb.j = sk.j AND hb.bucket = sk.bucket
      GROUP BY hb.tok, hb.true_count
    )
    SELECT tok, true_count, cm_estimate,
           cm_estimate - true_count AS overestimate, rnk
    FROM (
      SELECT tok, true_count, cm_estimate,
             CAST(row_number() OVER (ORDER BY cm_estimate DESC, tok)
                  AS INTEGER) AS rnk
      FROM est
    ) WHERE rnk <= 20
    """,
    tags=("sketch", "agg"),
)
def agg_countmin_heavy_hitters(spark, sf_dir):
    """Heavy hitters by count-min sketch, differentially checked against
    the exact counts in the same result: top-20 tokens by SKETCH estimate,
    each row carrying `true_count` and the collision `overestimate`
    (cm_estimate >= true_count always — the one-sided error guarantee is
    directly visible, and a driver hash-match certifies both the sketch
    arithmetic and the guarantee on every row).

    Scale shape: the sketch build is `groupBy(j, bucket).sum` over a
    d x w = 4x512 key space — a partial-aggregate-absorbed shuffle whose
    state is CONSTANT (2048 cells) no matter how many distinct tokens the
    corpus holds; this is the bounded-memory alternative the r5
    broadcast-boundedness audit asks for when a vocabulary-sized exact
    table (text_tfidf's term DF) outgrows its Heaps'-law bound. The
    estimate lookup joins tokens to the sketch on (j, bucket) — at
    production scale the d x w sketch is the BROADCAST side by
    construction (fixed bytes, the strongest cardinality bound there is),
    never the token table. The exact `tc` aggregation exists here only as
    the differential witness; a production heavy-hitters pass ships the
    sketch alone.

    All arithmetic is integer (occurrence counts, md5-slice bucket ids);
    tokenization and the `<> ''` filter are the text_tfidf_top_terms idiom
    verbatim, so the two surfaces stay comparable."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tc = toks.groupBy("tok").agg(F.count("*").alias("true_count"))
    js = spark.range(_CM_D).select(F.col("id").cast("long").alias("j"))
    hb = tc.crossJoin(F.broadcast(js)).withColumn(
        "bucket", _cm_bucket_spark(F.col("j"), F.col("tok"))
    )
    sk = hb.groupBy("j", "bucket").agg(F.sum("true_count").alias("cnt"))
    est = (
        hb.join(F.broadcast(sk), ["j", "bucket"])
        .groupBy("tok", "true_count")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc("cm_estimate"), F.asc("tok"))
    return (
        est.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select(
            "tok", "true_count", "cm_estimate",
            (F.col("cm_estimate") - F.col("true_count")).alias("overestimate"),
            "rnk",
        )
    )


# KMV geometry: k smallest distinct 48-bit hashes per group. est =
# (k-1) * 2^48 / h_k — the classic bottom-k estimator with the hash domain
# shifted by +1 so h=0 (possible at probability 2^-48) can never divide by
# zero on either engine. 48 bits (12 md5 hex chars) keeps every value and
# the scaled numerator comfortably inside BIGINT.
_KMV_K = 64
_KMV_NUM = (_KMV_K - 1) << 48  # (k-1) * 2^48


@query(
    "agg_kmv_distinct",
    oracle=f"""
    WITH el AS (
      SELECT DISTINCT event_type,
             CAST(user_id AS VARCHAR) || ':' ||
             CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS elem
      FROM events
    ),
    dh AS (
      SELECT DISTINCT event_type,
             CAST('0x' || substr(md5(elem), 1, 12) AS BIGINT) AS h
      FROM el
    ),
    kth AS (
      SELECT event_type, h AS kth_hash FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM dh
      ) WHERE rn = {_KMV_K}
    ),
    tr AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS true_distinct
      FROM el GROUP BY event_type
    )
    SELECT event_type, kth_hash,
           CAST({_KMV_NUM} // (kth_hash + 1) AS BIGINT) AS kmv_estimate,
           true_distinct
    FROM kth JOIN tr USING (event_type)
    """,
    tags=("sketch", "agg"),
)
def agg_kmv_distinct(spark, sf_dir):
    """Distinct-count by KMV (bottom-k) sketch, differentially checked
    against the exact count in the same result: per event type, the
    estimated and true number of distinct active (user, day) pairs. The
    k-th smallest of the distinct 48-bit element hashes pins the estimate
    — a hash-green row certifies the order statistic, the estimator
    arithmetic, and (readably, in the artifact itself) how close a
    64-hash summary gets to truths spanning 153..16k across the SFs.

    Why KMV and not exact COUNT(DISTINCT) at 100 TB: exact distinct state
    is O(#distinct) per group — the same unbounded class as the
    vocabulary broadcasts. A KMV summary is k hashes per group however
    large the group, MERGEABLE by min-k union (Spark's partial aggregation
    absorbs it map-side exactly like any min/top-k), and composable across
    time partitions (yesterday's sketch + today's = the union's sketch —
    the property approx_count_distinct's HLL shares, exposed here with
    engine-portable determinism instead of an opaque binary register
    blob). Day bucketing is integer epoch-microsecond floor-division
    (TZ-free); the hash is the md5-hex-slice idiom; the +1 domain shift
    (documented at _KMV_NUM) removes the 2^-48 zero-divisor edge on both
    engines identically."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events")
    elem = F.concat(
        F.col("user_id").cast("string"),
        F.lit(":"),
        F.expr("unix_micros(ts) div 86400000000").cast("string"),
    )
    el = e.select("event_type", elem.alias("elem")).distinct()
    dh = el.select(
        "event_type",
        F.conv(F.substring(F.md5(F.encode("elem", "utf-8")), 1, 12), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    w = W.partitionBy("event_type").orderBy("h")
    kth = (
        dh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == _KMV_K)
        .select("event_type", F.col("h").alias("kth_hash"))
    )
    tr = el.groupBy("event_type").agg(F.count("*").alias("true_distinct"))
    return kth.join(tr, "event_type").select(
        "event_type",
        "kth_hash",
        F.expr(f"{_KMV_NUM} div (kth_hash + 1)").alias("kmv_estimate"),
        "true_distinct",
    )


@query(
    "agg_kmv_set_intersection",
    oracle=f"""
    WITH el AS (
      SELECT DISTINCT event_type,
             CAST(user_id AS VARCHAR) || ':' ||
             CAST(epoch_us(ts) // 86400000000 AS VARCHAR) AS elem
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    dh AS (
      SELECT DISTINCT event_type,
             CAST('0x' || substr(md5(elem), 1, 12) AS BIGINT) AS h
      FROM el
    ),
    bk AS (
      SELECT event_type, h, rn FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM dh
      ) WHERE rn <= {_KMV_K}
    ),
    theta AS (
      SELECT min(h) AS theta FROM bk WHERE rn = {_KMV_K}
    ),
    common AS (
      SELECT CAST(count(*) AS BIGINT) AS n_common
      FROM (SELECT h FROM bk WHERE event_type = 'click') a
      JOIN (SELECT h FROM bk WHERE event_type = 'purchase') b USING (h)
      CROSS JOIN theta WHERE h < theta
    ),
    usample AS (
      SELECT CAST(count(DISTINCT h) AS BIGINT) AS n_union
      FROM bk CROSS JOIN theta WHERE h < theta
    ),
    truth AS (
      SELECT
        CAST((SELECT count(*) FROM
                (SELECT elem FROM el WHERE event_type = 'click'
                 INTERSECT
                 SELECT elem FROM el WHERE event_type = 'purchase'))
             AS BIGINT) AS true_intersection,
        CAST((SELECT count(DISTINCT elem) FROM el) AS BIGINT) AS true_union
    )
    SELECT theta.theta AS theta,
           common.n_common AS n_common,
           CAST((common.n_common * CAST(281474976710656 AS BIGINT))
                // theta.theta AS BIGINT) AS est_intersection,
           truth.true_intersection AS true_intersection,
           CAST((usample.n_union * CAST(281474976710656 AS BIGINT))
                // theta.theta AS BIGINT) AS est_union,
           truth.true_union AS true_union
    FROM theta CROSS JOIN common CROSS JOIN usample CROSS JOIN truth
    """,
    tags=("sketch", "agg", "setops"),
)
def agg_kmv_set_intersection(spark, sf_dir):
    """Theta-style SET ALGEBRA on KMV sketches — the reason bottom-k beats
    an opaque distinct counter: two 64-hash summaries built INDEPENDENTLY
    (click-active vs purchase-active (user, day) pairs) answer overlap and
    union questions without rescanning either input. theta = the smaller
    of the two 64th-minima; every retained hash below theta is a fixed-rate
    uniform sample of its set, so |common below theta| * 2^48 / theta
    estimates the intersection and the distinct union sample estimates the
    union — audience-overlap analytics from kilobytes of state. The exact
    intersection/union computed alongside are the in-row differential, as
    in the other sketch rows.

    At 100 TB: each side's bottom-k is a mergeable per-partition top-k
    (min-k union, absorbed map-side); the set algebra afterwards touches
    only 2k hashes. No zero-divisor guard is needed here: theta is the
    64th SMALLEST DISTINCT hash, hence >= 63 (distinct non-negative
    integers), and the estimator numerators stay far inside BIGINT
    (<= 128 * 2^48). Day bucketing, hashing, and k are shared with
    agg_kmv_distinct (one sketch definition, composable across queries —
    the property the docstring there promises)."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    elem = F.concat(
        F.col("user_id").cast("string"),
        F.lit(":"),
        F.expr("unix_micros(ts) div 86400000000").cast("string"),
    )
    el = e.select("event_type", elem.alias("elem")).distinct()
    dh = el.select(
        "event_type",
        F.conv(F.substring(F.md5(F.encode("elem", "utf-8")), 1, 12), 16, 10)
        .cast("long")
        .alias("h"),
    ).distinct()
    w = W.partitionBy("event_type").orderBy("h")
    bk = dh.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _KMV_K
    ).localCheckpoint(eager=False)
    theta = bk.filter(F.col("rn") == _KMV_K).agg(F.min("h").alias("theta"))
    a = bk.filter(F.col("event_type") == "click").select("h")
    b = bk.filter(F.col("event_type") == "purchase").select(
        F.col("h").alias("hb")
    )
    common = (
        a.join(b, F.col("h") == F.col("hb"))
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.count("*").alias("n_common"))
    )
    usample = (
        bk.select("h").distinct()
        .crossJoin(F.broadcast(theta))
        .filter(F.col("h") < F.col("theta"))
        .agg(F.countDistinct("h").alias("n_union"))
    )
    truth = (
        el.groupBy("elem")
        .agg(F.countDistinct("event_type").alias("n_types"))
        .agg(
            F.sum(F.when(F.col("n_types") == 2, 1).otherwise(0))
            .cast("long").alias("true_intersection"),
            F.count("*").alias("true_union"),
        )
    )
    two48 = 281474976710656
    return (
        theta.crossJoin(common).crossJoin(usample).crossJoin(truth)
        .select(
            "theta",
            "n_common",
            F.expr(f"(n_common * {two48}L) div theta").alias(
                "est_intersection"
            ),
            "true_intersection",
            F.expr(f"(n_union * {two48}L) div theta").alias("est_union"),
            "true_union",
        )
    )
