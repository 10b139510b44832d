"""Product-analytics operators over the events stream: sequential funnels,
cohort retention, conversation tracking. The query shapes an events consumer
runs daily — all window/join compositions, one shuffle per stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import round_half_up
from .registry import load, query


@query(
    "funnel_signup_click_purchase",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t_signup,
             min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
      FROM events GROUP BY user_id
    ),
    staged AS (
      SELECT user_id,
             CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END AS did_signup,
             CASE WHEN t_signup IS NOT NULL AND t_click > t_signup THEN 1 ELSE 0 END AS did_click_after,
             CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                   AND t_purchase > t_click THEN 1 ELSE 0 END AS did_purchase_after
      FROM firsts
    )
    SELECT CAST(sum(did_signup) AS BIGINT) AS n_signup,
           CAST(sum(did_click_after) AS BIGINT) AS n_click_after_signup,
           CAST(sum(did_purchase_after) AS BIGINT) AS n_full_funnel,
           CAST(count(*) AS BIGINT) AS n_users
    FROM staged
    """,
    tags=("analytics", "funnel"),
)
def funnel_signup_click_purchase(spark, sf_dir):
    """Ordered funnel: users whose first signup precedes their first
    subsequent click precedes their first subsequent purchase. One
    conditional-min aggregation pass — no self-joins, no explosion."""
    e = load(spark, sf_dir, "events")
    t_us = F.unix_micros("ts")

    def first_of(t):
        return F.min(F.when(F.col("event_type") == t, t_us))

    firsts = e.groupBy("user_id").agg(
        first_of("signup").alias("t_signup"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    did_signup = F.when(F.col("t_signup").isNotNull(), 1).otherwise(0)
    did_click = F.when(
        F.col("t_signup").isNotNull() & (F.col("t_click") > F.col("t_signup")), 1
    ).otherwise(0)
    did_purchase = F.when(
        F.col("t_signup").isNotNull()
        & (F.col("t_click") > F.col("t_signup"))
        & (F.col("t_purchase") > F.col("t_click")),
        1,
    ).otherwise(0)
    return firsts.select(
        did_signup.alias("s"), did_click.alias("c"), did_purchase.alias("p")
    ).agg(
        F.sum("s").alias("n_signup"),
        F.sum("c").alias("n_click_after_signup"),
        F.sum("p").alias("n_full_funnel"),
        F.count("*").alias("n_users"),
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH first_day AS (
      SELECT user_id,
             CAST(floor(epoch(min(date_trunc('day', ts))) / 86400) AS BIGINT) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             CAST(floor(epoch(date_trunc('day', e.ts)) / 86400) AS BIGINT) - f.cohort_day AS day_offset,
             f.cohort_day
      FROM events e JOIN first_day f ON e.user_id = f.user_id
    )
    SELECT cohort_day, day_offset,
           CAST(count(*) AS BIGINT) AS n_active_users
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    """,
    tags=("analytics", "retention"),
)
def retention_cohorts(spark, sf_dir):
    """Cohort retention: users bucketed by first-seen day, counted per
    day-offset for the first week. The first_day side is 1 row/user —
    unbounded at scale — so join strategy is left to Catalyst/AQE (broadcast
    when genuinely small, shuffle on user_id otherwise)."""
    e = load(spark, sf_dir, "events")
    # floor, not cast: cast truncates toward zero, so a pre-1970 timestamp
    # (negative epoch) would land one day later than the oracle's floor()
    # bucket (code-review r6 — same class as ts_rolling_distinct)
    day_num = F.floor(
        F.unix_timestamp(F.date_trunc("day", "ts")) / 86400
    ).cast("long")
    first_day = e.groupBy("user_id").agg(F.min(day_num).alias("cohort_day"))
    activity = (
        e.select("user_id", day_num.alias("day"))
        .join(first_day, "user_id")
        .select(
            "user_id", "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active_users"))
    )


@query(
    "events_top_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type, 1) OVER w AS p1,
             lag(event_type, 2) OVER w AS p2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
      SELECT p2 || '>' || p1 || '>' || event_type AS path
      FROM seq WHERE p2 IS NOT NULL
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(row_number() OVER (ORDER BY count(*) DESC, path) AS INTEGER) AS rnk
    FROM paths
    GROUP BY path
    QUALIFY rnk <= 15
    ORDER BY rnk
    """,
    tags=("analytics", "sequence"),
)
def events_top_paths(spark, sf_dir):
    """Sequential pattern mining: the 15 most common 3-step event paths
    across all user journeys (the n-gram view of behavioral data — what
    MATCH_RECOGNIZE engines sell, expressed as two lags over a per-user
    event-time window). One shuffle keyed by user for the sequence window
    (ties broken by event_id so the path multiset is deterministic), one
    partial-aggregated shuffle on the path trigram; the final top-k window
    runs over |event_types|^3 path rows at most, never the fact table."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    )
    # F.concat, not concat_ws: concat_ws silently SKIPS NULL elements, so
    # a NULL event_type would collapse into a well-formed-looking 2-step
    # path and inflate a real bucket, while the oracle's `||` propagates
    # NULL — concat matches `||` exactly (code-review r6)
    paths = seq.filter(F.col("p2").isNotNull()).select(
        F.concat("p2", F.lit(">"), "p1", F.lit(">"), "event_type").alias("path")
    )
    rank_w = W.orderBy(F.desc("n_occurrences"), F.asc("path"))
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_occurrences"))
        .withColumn("rnk", F.row_number().over(rank_w))
        .filter(F.col("rnk") <= 15)
        .orderBy("rnk")
    )


@query(
    "events_transition_probs",
    oracle="""
    WITH seq AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    counts AS (
      SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    )
    SELECT cur, nxt, n,
           floor((n / CAST(sum(n) OVER (PARTITION BY cur) AS DOUBLE))
                 * 1000000.0 + 0.5) / 1000000.0 AS p
    FROM counts
    """,
    tags=("analytics", "sequence", "markov"),
)
def events_transition_probs(spark, sf_dir):
    """First-order Markov transition matrix over user journeys:
    P(next event_type | current) — the behavioral model behind next-action
    prediction and anomalous-session scoring. One shuffle keyed by user for
    the sequence window (event_id tiebreak keeps the bigram multiset
    deterministic), one partial-aggregated shuffle on the bigram; the
    normalizing row-sum window runs over |event_types|^2 rows. Probabilities
    are ratios of exact integer counts, rounded identically on both
    engines."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    counts = seq.groupBy("cur", "nxt").agg(F.count("*").alias("n"))
    row_w = W.partitionBy("cur")
    return counts.select(
        "cur",
        "nxt",
        "n",
        round_half_up(
            F.col("n") / F.sum("n").over(row_w).cast("double"), 6
        ).alias("p"),
    )


@query(
    "events_markov_perplexity",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    trans AS (SELECT user_id, cur, nxt FROM seq WHERE nxt IS NOT NULL),
    counts AS (
      SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
      FROM trans GROUP BY cur, nxt
    ),
    model AS (
      SELECT cur, nxt,
             CAST(floor(-ln(n / CAST(sum(n) OVER (PARTITION BY cur) AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT) AS nll_micro
      FROM counts
    )
    SELECT t.user_id,
           CAST(count(*) AS BIGINT) AS n_transitions,
           CAST(sum(m.nll_micro) AS BIGINT) AS total_nll_micro,
           CAST({fd} AS BIGINT) AS avg_nll_micro
    FROM trans t JOIN model m ON m.cur = t.cur AND m.nxt = t.nxt
    GROUP BY t.user_id
    """.replace("{fd}", "((sum(m.nll_micro) - (((sum(m.nll_micro) % count(*))"
                " + count(*)) % count(*))) // count(*))"),
    tags=("analytics", "sequence", "markov", "scoring"),
)
def events_markov_perplexity(spark, sf_dir):
    """Sequence scoring under the corpus's own first-order Markov model —
    the language-model-evaluation shape applied to event streams: each
    user's journey gets a total and average negative log-likelihood, the
    anomalous-session score behind behavioral outlier triage (a high avg
    NLL user takes transitions the corpus rarely takes).

    Determinism discipline: each transition's -ln P(next|cur) is rounded to
    INTEGER micro-nats BEFORE summing, so the per-user totals are integer
    sums — order-independent across partitionings and engines, where a
    double sum of 100+ terms could differ in the last ulp by accumulation
    order. The average uses the shared Python-floor division identity. The
    model table is |event_types|^2 rows and broadcast onto the transition
    stream; the only corpus-scale shuffles are the sequence window (keyed
    by user) and the per-user aggregate."""
    from pyspark.sql import Window as W

    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = e.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    counts = trans.groupBy("cur", "nxt").agg(F.count("*").alias("n"))
    row_w = W.partitionBy("cur")
    model = counts.select(
        "cur",
        "nxt",
        F.floor(
            -F.log(F.col("n") / F.sum("n").over(row_w).cast("double"))
            * 1000000.0
            + 0.5
        ).cast("long").alias("nll_micro"),
    )
    total = F.sum("nll_micro")
    n_tr = F.count(F.lit(1))
    # EXACT integer division of the (non-negative) total by the count —
    # `div` is Spark's integral division, mirroring the oracle's
    # floor-division identity bit-for-bit. floor(total / n) on doubles
    # (the r4 form) can round across an integer boundary once per-user
    # totals exceed ~2^52 micro-nats, which the engine's 100 TB scale
    # target makes reachable (ADVICE r4).
    avg = F.expr("sum(nll_micro) div count(1)")
    return (
        trans.join(F.broadcast(model), ["cur", "nxt"])
        .groupBy("user_id")
        .agg(
            n_tr.alias("n_transitions"),
            total.cast("long").alias("total_nll_micro"),
            avg.cast("long").alias("avg_nll_micro"),
        )
    )
