"""Event-time operators (SURVEY §2.8): tumbling/sliding windows and
sessionization as *batch* queries over the events table.

The streaming twins (readStream + watermark over the same semantics) live in
``streaming/``; these batch forms are what the DuckDB oracle can verify.
Window starts are emitted as epoch seconds (BIGINT) — timezone/typing-proof.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions import fdiv_sql, round_half_up
from .registry import load, query


def _hourly_spine(e, alias: str = "window_start"):
    """Dense hourly spine spanning the events frame: (hour_epoch expression,
    spine DataFrame). Shared by ts_gap_fill / ts_interpolate_linear /
    ts_autocorr (code-review r6: the bounds + explode(sequence) construction
    was copy-pasted three times, so a spine-semantics fix had to land in
    three places). The spine derives from a 1-row aggregate, so it
    broadcasts at any corpus scale."""
    hour_epoch = F.unix_timestamp(F.date_trunc("hour", "ts"))
    bounds = e.agg(F.min(hour_epoch).alias("lo"), F.max(hour_epoch).alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(3600))).alias(alias)
    )
    return hour_epoch, spine


@query(
    "ts_tumbling_window",
    oracle="""
    SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("timeseries", "window"),
)
def ts_tumbling_window(spark, sf_dir):
    """Tumbling 1-hour event-time window (the flow-log capture-window rollup
    the reference never does, SURVEY §2.8)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            round_half_up(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "ts_sliding_window",
    oracle="""
    WITH slid AS (
      SELECT e.*,
             CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - k.k * 1800 AS window_start
      FROM events e, (VALUES (0), (1)) AS k(k)
    )
    SELECT window_start,
           CAST(count(*) AS BIGINT) AS n_events,
           floor((sum(value)) * 10000.0 + 0.5) / 10000.0 AS total_value
    FROM slid
    WHERE epoch(ts) >= window_start AND epoch(ts) < window_start + 3600
    GROUP BY window_start
    """,
    tags=("timeseries", "window"),
)
def ts_sliding_window(spark, sf_dir):
    """Sliding window: 1 hour long, 30-minute slide — each event lands in 2
    overlapping windows. Spark's window() generates the assignment natively;
    the oracle reproduces it by crossing with the 2 window offsets."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            round_half_up(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "ts_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_id, epoch_us(ts) AS t_us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 OR
                  lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS is_new_session
      FROM events
    ), sessions AS (
      SELECT user_id, event_id, t_us,
             CAST(sum(is_new_session) OVER
               (PARTITION BY user_id ORDER BY t_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      FROM gaps
    )
    SELECT user_id, session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           (max(t_us) - min(t_us)) / 1000000 AS duration_s
    FROM sessions
    GROUP BY user_id, session_seq
    """,
    tags=("timeseries", "session"),
)
def ts_sessionize(spark, sf_dir):
    """Batch sessionization: 30-minute inactivity gap -> new session, via
    lag + cumulative-sum (one shuffle on user_id; the streaming twin uses
    session_window in streaming/). duration_s uses integer microsecond math
    (1800000000 us = 30 min) so both engines agree exactly. t_us is
    projected BEFORE either window and both windows order by the projected
    (t_us, event_id) ATTRIBUTE — ordering by the unix_micros(ts) expression
    inline makes Spark mint a separate attribute per window and re-sort
    between lag and cumsum; over the shared column the second Window reuses
    the first one's sort."""
    e = load(spark, sf_dir, "events")
    base = e.select(
        "user_id", "event_id", F.unix_micros("ts").alias("t_us")
    )
    w = W.partitionBy("user_id").orderBy("t_us", "event_id")
    prev = F.lag("t_us").over(w)
    gaps = base.select(
        "user_id",
        "event_id",
        "t_us",
        F.when((F.col("t_us") - prev > 1_800_000_000) | prev.isNull(), 1)
        .otherwise(0)
        .alias("is_new_session"),
    )
    w2 = (
        W.partitionBy("user_id")
        .orderBy("t_us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sessions = gaps.withColumn(
        "session_seq", F.sum("is_new_session").over(w2).cast("long")
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        ((F.max("t_us") - F.min("t_us")) / 1_000_000).alias("duration_s"),
    )


@query(
    "ts_daily_activity",
    oracle="""
    SELECT user_id,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           floor((max(value)) * 10000.0 + 0.5) / 10000.0 AS max_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("timeseries", "agg"),
)
def ts_daily_activity(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    return e.groupBy(
        "user_id", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        round_half_up(F.max("value"), 4).alias("max_value"),
    )


@query(
    "ts_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT CAST(floor(epoch(min(date_trunc('hour', ts)))) AS BIGINT) AS lo,
             CAST(floor(epoch(max(date_trunc('hour', ts)))) AS BIGINT) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(range(lo, hi + 3600, 3600)) AS window_start FROM bounds
    ),
    actual AS (
      SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT s.window_start,
           coalesce(a.n_events, 0) AS n_events,
           CASE WHEN a.window_start IS NULL THEN 1 ELSE 0 END AS is_gap
    FROM spine s LEFT JOIN actual a ON s.window_start = a.window_start
    """,
    tags=("timeseries", "gapfill"),
)
def ts_gap_fill(spark, sf_dir):
    """Gap filling / resampling: a generated hourly spine (sequence + explode)
    left-joined against actual counts so empty hours appear as zero rows —
    the dense-series shape dashboards and forecasting need. The spine is
    computed from a 1-row aggregate, so it broadcasts. Counts are restricted
    to purchase events so genuine zero-filled gap hours exist at test SFs."""
    e = load(spark, sf_dir, "events")
    hour_epoch, spine = _hourly_spine(e)
    actual = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(hour_epoch.alias("window_start"))
        .agg(F.count("*").alias("n_events"))
    )
    return (
        spine.join(actual, "window_start", "left")
        .select(
            "window_start",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.when(F.col("n_events").isNull(), 1).otherwise(0).alias("is_gap"),
        )
    )


@query(
    "ts_mad_outliers",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type,
             quantile_cont(abs(e.value - s.med), 0.5) AS mad,
             any_value(s.med) AS med
      FROM events e JOIN stats s USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type,
           floor(e.value * 10000.0 + 0.5) / 10000.0 AS value,
           floor(d.med * 10000.0 + 0.5) / 10000.0 AS med,
           floor(d.mad * 10000.0 + 0.5) / 10000.0 AS mad
    FROM events e JOIN dev d USING (event_type)
    WHERE floor(abs(e.value - d.med) * 10000.0 + 0.5) / 10000.0
          > 6.0 * (floor(d.mad * 10000.0 + 0.5) / 10000.0)
    """,
    tags=("timeseries", "outlier", "percentile"),
)
def ts_mad_outliers(spark, sf_dir):
    """Robust outlier detection: |value - median| > 6 * MAD per event type
    (median absolute deviation shrugs off the very outliers that inflate a
    stddev-based z-score). Two grouped exact-percentile passes over the
    fact, each a (few groups × partials) shuffle, then a broadcast of the
    per-type stats back onto the rows — no window over the whole fact, no
    sort. Both sides of the threshold compare ROUNDED values (the z-score
    boundary lesson): exact percentiles interpolate identically on both
    engines, and rounding first makes the > cut bit-identical."""
    e = load(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = (
        e.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad"),
            F.first("med").alias("med"),
        )
    )
    return (
        e.join(F.broadcast(dev), "event_type")
        .filter(
            round_half_up(F.abs(F.col("value") - F.col("med")), 4)
            > 6.0 * round_half_up(F.col("mad"), 4)
        )
        .select(
            "event_id",
            "event_type",
            round_half_up(F.col("value"), 4).alias("value"),
            round_half_up(F.col("med"), 4).alias("med"),
            round_half_up(F.col("mad"), 4).alias("mad"),
        )
    )


@query(
    "ts_weighted_moving_avg",
    oracle="""
    WITH seq AS (
      SELECT event_id, user_id, value,
             lag(value, 1) OVER uw AS v1,
             lag(value, 2) OVER uw AS v2
      FROM events
      WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id,
           floor(value * 10000.0 + 0.5) / 10000.0 AS value,
           floor(((3.0 * value + 2.0 * v1 + 1.0 * v2) / 6.0) * 10000.0 + 0.5) / 10000.0
             AS wma3
    FROM seq WHERE v2 IS NOT NULL
    """,
    tags=("timeseries", "window", "smoothing"),
)
def ts_weighted_moving_avg(spark, sf_dir):
    """3-point linearly-weighted moving average per user (recency-weighted
    smoothing — the bounded-row-frame shape, distinct from the cumulative
    frame in window_running_sum). Expressed as explicit lag() arithmetic
    rather than an avg() over ROWS BETWEEN: the operation order is then a
    fixed expression tree, identical on both engines, instead of a frame
    scan whose internal summation order is an implementation detail. One
    shuffle on user_id; warm-up rows (fewer than 3 points) are excluded on
    both sides."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    v1 = F.lag("value", 1).over(w)
    v2 = F.lag("value", 2).over(w)
    return (
        e.select(
            "event_id",
            "user_id",
            F.col("value"),
            ((3.0 * F.col("value") + 2.0 * v1 + 1.0 * v2) / 6.0).alias("wma_raw"),
        )
        .filter(F.col("wma_raw").isNotNull())
        .select(
            "event_id",
            "user_id",
            round_half_up(F.col("value"), 4).alias("value"),
            round_half_up(F.col("wma_raw"), 4).alias("wma3"),
        )
    )


@query(
    "ts_rolling_distinct",
    # fdiv_sql, not bare `//`: DuckDB's // truncates toward zero while
    # Spark's floor() floors, so a pre-1970 timestamp (negative epoch)
    # would land in different day buckets on the two engines — the fixture
    # is post-1970 but the oracle must hold for any input (code-review r6)
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT {fdiv_sql('CAST(floor(epoch(ts)) AS BIGINT)', '86400')} AS day,
             user_id
      FROM events
    ),
    spine AS (SELECT DISTINCT day FROM pairs),
    daily AS (
      SELECT day, CAST(count(*) AS BIGINT) AS users_1d FROM pairs GROUP BY day
    ),
    rolling AS (
      SELECT s.day, CAST(count(DISTINCT p.user_id) AS BIGINT) AS users_7d
      FROM spine s JOIN pairs p ON p.day BETWEEN s.day - 6 AND s.day
      GROUP BY s.day
    )
    SELECT d.day, d.users_1d, r.users_7d
    FROM daily d JOIN rolling r ON d.day = r.day
    """,
    tags=("timeseries", "distinct"),
)
def ts_rolling_distinct(spark, sf_dir):
    """Rolling 7-day distinct active users per day (DAU/WAU) — the windowed
    COUNT DISTINCT no window-function engine supports directly. Spark plan:
    dedup to (day, user) pairs FIRST (collapses the fact table to
    active-pairs cardinality), then fan each pair out to the <=7 target days
    it covers via an equi-join-able explode, then count distinct per target
    day — shuffle keys are all (day[, user]), no range join and no
    single-partition window at any corpus size. The oracle states the same
    semantics as a literal interval join, so the two formulations check each
    other."""
    e = load(spark, sf_dir, "events")
    pairs = (
        e.select(
            (F.floor(F.unix_timestamp("ts") / 86400)).cast("long").alias("day"),
            "user_id",
        )
        .distinct()
    )
    spine = pairs.select("day").distinct()
    daily = pairs.groupBy("day").agg(F.count("*").alias("users_1d"))
    fanout = pairs.select(
        "day", "user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k")
    ).select((F.col("day") + F.col("k")).alias("day"), "user_id")
    rolling = (
        fanout.join(spine, "day")  # only materialized days, like the oracle
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("users_7d"))
    )
    return daily.join(rolling, "day")


@query(
    "ts_interpolate_linear",
    oracle="""
    WITH bounds AS (
      SELECT CAST(floor(epoch(min(date_trunc('hour', ts)))) AS BIGINT) AS lo,
             CAST(floor(epoch(max(date_trunc('hour', ts)))) AS BIGINT) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(range(lo, hi + 3600, 3600)) AS window_start FROM bounds
    ),
    actual AS (
      SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start,
             floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    filled AS (
      SELECT s.window_start, a.v,
             last_value(a.v IGNORE NULLS) OVER w_prev AS prev_v,
             last_value(CASE WHEN a.v IS NOT NULL THEN s.window_start END IGNORE NULLS)
               OVER w_prev AS prev_t,
             first_value(a.v IGNORE NULLS) OVER w_next AS next_v,
             first_value(CASE WHEN a.v IS NOT NULL THEN s.window_start END IGNORE NULLS)
               OVER w_next AS next_t
      FROM spine s LEFT JOIN actual a ON s.window_start = a.window_start
      WINDOW
        w_prev AS (ORDER BY s.window_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (ORDER BY s.window_start
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT window_start,
           floor(coalesce(
             v,
             prev_v + (next_v - prev_v)
               * (CAST(window_start - prev_t AS DOUBLE)
                  / CAST(next_t - prev_t AS DOUBLE)),
             prev_v, next_v) * 10000.0 + 0.5) / 10000.0 AS value_filled,
           CASE WHEN v IS NULL THEN 1 ELSE 0 END AS is_interpolated
    FROM filled
    """,
    tags=("timeseries", "gapfill"),
)
def ts_interpolate_linear(spark, sf_dir):
    """Linear interpolation over an hourly series with gaps: missing hours
    get the value interpolated between the nearest known neighbors (edges
    carry the nearest known value) — the resampling step feature pipelines
    apply before fixed-stride models. Known hourly sums are rounded to 4dp
    BEFORE interpolating so both engines interpolate between identical
    endpoints; the interpolation weight is a ratio of exact integer epoch
    gaps.

    Scale shape (round-2 VERDICT "weak" fix): the IGNORE NULLS carry scans
    are CHUNKED, not global. Intra-chunk prev/next run under windows
    partitioned by a day chunk (parallel, bounded 24-row partitions); the
    cross-chunk carry runs over a one-row-per-chunk summary built with a
    plain max/min aggregate — the only unpartitioned window in the plan
    orders by `chunk` over timespan/86400 rows (3.65k rows for a decade),
    an 86400x reduction vs windowing the spine. Boundary stitch:
    prev = coalesce(intra-chunk carry, carry-in from the chunk summary).
    Carrying (t, v) as one struct keeps the endpoint pair consistent
    (struct max orders by t first, so max(known) IS the latest known point).
    """
    e = load(spark, sf_dir, "events")
    hour_epoch, spine = _hourly_spine(e)
    actual = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(hour_epoch.alias("window_start"))
        .agg(round_half_up(F.sum("value"), 4).alias("v"))
    )
    joined = spine.join(actual, "window_start", "left").withColumn(
        "chunk", F.expr("window_start div 86400")
    )
    # (t, v) of a known point, or NULL for gap rows — carried as one struct
    known = F.when(
        F.col("v").isNotNull(),
        F.struct(F.col("window_start").alias("t"), F.col("v").alias("kv")),
    )
    w_prev = (
        W.partitionBy("chunk").orderBy("window_start")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_next = (
        W.partitionBy("chunk").orderBy("window_start")
        .rowsBetween(0, W.unboundedFollowing)
    )
    intra = joined.select(
        "window_start",
        "v",
        "chunk",
        F.last(known, ignorenulls=True).over(w_prev).alias("p_in"),
        F.first(known, ignorenulls=True).over(w_next).alias("n_in"),
    )
    # one row per chunk: latest/earliest known point (no window needed —
    # struct min/max order by t first)
    summary = joined.groupBy("chunk").agg(
        F.max(known).alias("chunk_last"), F.min(known).alias("chunk_first")
    )
    w_carry_in = W.orderBy("chunk").rowsBetween(W.unboundedPreceding, -1)
    w_carry_out = W.orderBy("chunk").rowsBetween(1, W.unboundedFollowing)
    carry = summary.select(
        "chunk",
        F.last("chunk_last", ignorenulls=True).over(w_carry_in).alias("c_in"),
        F.first("chunk_first", ignorenulls=True).over(w_carry_out).alias("c_out"),
    )
    stitched = intra.join(F.broadcast(carry), "chunk").select(
        "window_start",
        "v",
        F.coalesce("p_in", "c_in").alias("p"),
        F.coalesce("n_in", "c_out").alias("n"),
    )
    prev_v, prev_t = F.col("p.kv"), F.col("p.t")
    next_v, next_t = F.col("n.kv"), F.col("n.t")
    interp = prev_v + (next_v - prev_v) * (
        (F.col("window_start") - prev_t).cast("double")
        / (next_t - prev_t).cast("double")
    )
    return stitched.select(
        "window_start",
        round_half_up(
            F.coalesce(F.col("v"), interp, prev_v, next_v), 4
        ).alias("value_filled"),
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("is_interpolated"),
    )


@query(
    "ts_autocorr",
    oracle="""
    WITH bounds AS (
      SELECT CAST(floor(epoch(min(date_trunc('hour', ts)))) AS BIGINT) AS lo,
             CAST(floor(epoch(max(date_trunc('hour', ts)))) AS BIGINT) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(range(lo, hi + 3600, 3600)) AS h FROM bounds
    ),
    actual AS (
      SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    series AS (
      SELECT s.h, coalesce(a.x, 0) AS x
      FROM spine s LEFT JOIN actual a ON s.h = a.h
    ),
    pairs AS (
      SELECT k.lag AS lag, s.x AS x,
             lead(s.x, k.lag) OVER (PARTITION BY k.lag ORDER BY s.h) AS y
      FROM series s CROSS JOIN (VALUES (1), (24)) AS k(lag)
    ),
    sums AS (
      SELECT CAST(lag AS BIGINT) AS lag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM pairs WHERE y IS NOT NULL GROUP BY lag
    )
    SELECT lag, n,
           floor(((n * sxy - sx * sy)
                  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                         * CAST(n * syy - sy * sy AS DOUBLE)))
                 * 1000000.0 + 0.5) / 1000000.0 AS autocorr
    FROM sums
    ORDER BY lag
    """,
    tags=("timeseries", "stats"),
)
def ts_autocorr(spark, sf_dir):
    """Lag-1 and lag-24 autocorrelation of the hourly event-count series —
    the seasonality detector (a strong lag-24 coefficient means diurnal
    traffic; forecasting pipelines gate model choice on exactly this). The
    series is zero-filled on the hourly spine first so gaps count as quiet
    hours, then each lag's (x, y) pairs come from a lead() window. Every
    sum is over exact BIGINT counts — the Pearson formula's products stay
    integer until one final double division, so both engines compute the
    identical value regardless of accumulation order (the same trick as
    the scaled-integer PageRank, applied to second moments). The lag
    window is per-lag over the spine — hours, not events, so its size is
    time-span-bounded at any corpus scale."""
    e = load(spark, sf_dir, "events")
    hour_epoch, spine = _hourly_spine(e, alias="h")
    actual = e.groupBy(hour_epoch.alias("h")).agg(F.count("*").alias("x"))
    series = spine.join(actual, "h", "left").select(
        "h", F.coalesce("x", F.lit(0)).alias("x")
    )
    lags = spark.createDataFrame([(1,), (24,)], ["lag"])
    pairs = series.crossJoin(F.broadcast(lags))
    w = W.partitionBy("lag").orderBy("h")
    # lead() needs a literal offset; lag is a column, so express y via a
    # per-lag conditional on the two known offsets
    pairs = pairs.withColumn(
        "y",
        F.when(F.col("lag") == 1, F.lead("x", 1).over(w)).otherwise(
            F.lead("x", 24).over(w)
        ),
    ).filter(F.col("y").isNotNull())
    sums = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return sums.select(
        "lag",
        "n",
        round_half_up(num / den, 6).alias("autocorr"),
    ).orderBy("lag")


# --- EWMA smoothing ----------------------------------------------------------
# Exponential smoothing is an order-dependent recurrence (like the CUSUM
# operator in streaming/transform_state.py): s_t = s_{t-1} + (v_t -
# s_{t-1})/4, seeded with the first observation. The engine state is
# scaled-integer (milli-units, floor division) so the fold is a pure
# function of the event sequence; the oracle replays it as a recursive CTE
# using the same fdiv identity. alpha is fixed at 1/4 so the smoothing
# factor is an exact integer divisor.
_EWMA_OUTPUT = "user_id long, n_events long, ewma_milli long, last_milli long, dev_milli long"


def _ewma_oracle() -> str:
    from ..functions import fdiv_sql

    step = f"(c.s + {fdiv_sql('s.v - c.s', '4')})"
    return f"""
    WITH RECURSIVE src AS (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
      FROM events
    ), counts AS (
      SELECT user_id, max(rn) AS n_rows FROM src GROUP BY user_id
    ), rec AS (
      SELECT user_id, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS n,
             CAST(0 AS BIGINT) AS s
      FROM counts
      UNION ALL
      SELECT c.user_id, c.rn + 1, c.n + 1,
             CASE WHEN c.n = 0 THEN s.v ELSE {step} END
      FROM rec c JOIN src s ON s.user_id = c.user_id AND s.rn = c.rn + 1
    )
    SELECT c.user_id, c.n AS n_events, c.s AS ewma_milli,
           s.v AS last_milli, s.v - c.s AS dev_milli
    FROM rec c
    JOIN counts t ON c.user_id = t.user_id AND c.rn = t.n_rows
    JOIN src s ON s.user_id = c.user_id AND s.rn = c.rn
    """


@query("ts_ewma", oracle=_ewma_oracle(), tags=("timeseries", "stateful"))
def ts_ewma(spark, sf_dir):
    """Per-user EWMA of event values (alpha = 1/4, seeded with the first
    observation) with the final smoothed level and the last observation's
    deviation from it — the classic smoothing baseline behind anomaly
    scores.

    Execution shape: explicit hash repartition on user_id + sort within
    partitions, then ONE ``mapInPandas`` pass per partition that walks the
    sorted rows and emits a row at each key change. Deliberately NOT
    ``groupBy().applyInPandas``: that form pays a pandas-DataFrame + Python
    call per GROUP (measured 2-3 ms x 1500 users = ~4 s at sf0.1, worse
    still when AQE coalesces the small shuffle to one partition and
    serializes every group through a single worker). The partition-fold is
    a single Arrow stream per task, per-group state is three integers, and
    the explicit numPartitions pins parallelism independent of AQE's
    size-based coalescing — the same shape at 100 TB: one shuffle, O(keys)
    state, no per-key overhead."""
    import pandas as pd

    # NULL user_ids are excluded EXPLICITLY (code-review r6): the oracle's
    # recursive joins drop them anyway, but inside the fold a NULL key
    # becomes float64 NaN in pandas and NaN != NaN makes every null row its
    # own "key change" — emitting NaN user_ids the long output schema
    # cannot hold. The filter pins engine and oracle to the same domain.
    ev = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    ).select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 1000 + 0.5).cast("long").alias("v"),
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def fold_partition(batches):
        import numpy as np

        pdfs = [b for b in batches if len(b)]
        if not pdfs:  # keys << partitions leaves empty tasks
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        uids = pdf["user_id"].to_numpy()
        vs = pdf["v"].to_numpy(dtype=np.int64)
        # Lockstep vectorized fold (optimization r10, guide §4.2): the
        # floor-division recurrence s <- s + (v - s) // 4 is sequential
        # WITHIN a user but independent ACROSS users, so all groups
        # advance one step per iteration as one numpy op — the
        # interpreted per-row loop this replaces was 12 s CPU at sf0.1
        # (~600k rows); the lockstep does max-group-length iterations
        # over shrinking active sets (total element updates = row count).
        # numpy int64 // floors toward -inf exactly like Python int //,
        # so every intermediate equals the row-loop's value.
        starts = np.flatnonzero(np.r_[True, uids[1:] != uids[:-1]])
        lens = np.diff(np.r_[starts, len(uids)])
        # longest groups first: the active set at step k is then a prefix,
        # so each step is two strided numpy ops — no per-step scans
        order = np.argsort(lens, kind="stable")[::-1]
        sstart = starts[order]
        slen = lens[order]
        s = vs[sstart].copy()  # n = 1 seeds with the first observation
        m = len(slen)
        for k in range(1, int(slen[0]) if m else 0):
            while m and slen[m - 1] <= k:
                m -= 1
            sa = s[:m]
            s[:m] = sa + (vs[sstart[:m] + k] - sa) // 4
        last = vs[sstart + slen - 1]
        yield pd.DataFrame(
            {
                "user_id": uids[sstart],
                "n_events": slen.astype(np.int64),
                "ewma_milli": s,
                "last_milli": last,
                "dev_milli": last - s,
            }
        )

    return (
        ev.repartition(n_parts, "user_id")
        .sortWithinPartitions("user_id", "event_id")
        .mapInPandas(fold_partition, schema=_EWMA_OUTPUT)
    )


_HOLT_OUTPUT = (
    "user_id long, n_events long, level_milli long, trend_milli long,"
    " forecast_next_milli long"
)


def _holt_oracle() -> str:
    from ..functions import fdiv_sql

    # alpha = beta = 1/4, all in scaled-integer milli space with Python-floor
    # division so the SQL replay matches the partition-fold bit-for-bit
    lvl = f"(c.l + {fdiv_sql('s.v - (c.l + c.b)', '4')} + c.b)"
    trd = f"(c.b + {fdiv_sql('(#L - c.l) - c.b', '4')})"
    return f"""
    WITH RECURSIVE src AS (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
             CAST(floor(value * 1000 + 0.5) AS BIGINT) AS v
      FROM events
    ), counts AS (
      SELECT user_id, max(rn) AS n_rows FROM src GROUP BY user_id
    ), rec AS (
      SELECT user_id, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS n,
             CAST(0 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b
      FROM counts
      UNION ALL
      SELECT c.user_id, c.rn + 1, c.n + 1,
             CASE WHEN c.n = 0 THEN s.v ELSE {lvl} END,
             CASE WHEN c.n = 0 THEN CAST(0 AS BIGINT)
                  ELSE {trd.replace('#L', lvl)} END
      FROM rec c JOIN src s ON s.user_id = c.user_id AND s.rn = c.rn + 1
    )
    SELECT c.user_id, c.n AS n_events, c.l AS level_milli, c.b AS trend_milli,
           c.l + c.b AS forecast_next_milli
    FROM rec c
    JOIN counts t ON c.user_id = t.user_id AND c.rn = t.n_rows
    """


@query("ts_holt_trend", oracle=_holt_oracle(), tags=("timeseries", "stateful"))
def ts_holt_trend(spark, sf_dir):
    """Holt's linear-trend double exponential smoothing (alpha = beta = 1/4,
    level seeded with the first observation, trend with 0) and the one-step
    forecast level + trend — the forecasting baseline one rung above
    ts_ewma, with the same execution shape: one hash repartition on
    user_id, sort within partitions, a single mapInPandas fold carrying two
    integers of state per key (see ts_ewma's docstring for why this beats
    applyInPandas per-group dispatch). All arithmetic is scaled-integer
    milli with Python-floor division, replayed exactly by the
    recursive-CTE oracle via fdiv_sql."""
    import pandas as pd

    # NULL user_ids excluded for the same NaN-key reason as ts_ewma
    ev = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    ).select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 1000 + 0.5).cast("long").alias("v"),
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def fold_partition(batches):
        pdfs = [bt for bt in batches if len(bt)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        out = {"user_id": [], "n_events": [], "level_milli": [],
               "trend_milli": [], "forecast_next_milli": []}
        uid_prev = None
        l = b = n = 0
        def emit():
            out["user_id"].append(uid_prev); out["n_events"].append(n)
            out["level_milli"].append(l); out["trend_milli"].append(b)
            out["forecast_next_milli"].append(l + b)
        for uid, v in zip(pdf["user_id"].to_numpy(), pdf["v"].to_numpy()):
            if uid != uid_prev:
                if uid_prev is not None:
                    emit()
                uid_prev, l, b, n = uid, 0, 0, 0
            v = int(v)
            n += 1
            if n == 1:
                l, b = v, 0
            else:
                l_prev = l
                l = l_prev + (v - (l_prev + b)) // 4 + b
                b = b + ((l - l_prev) - b) // 4
        emit()
        yield pd.DataFrame(out)

    return (
        ev.repartition(n_parts, "user_id")
        .sortWithinPartitions("user_id", "event_id")
        .mapInPandas(fold_partition, schema=_HOLT_OUTPUT)
    )


@query(
    "ts_scd2_intervals",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, epoch_us(ts) AS t_us, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events WHERE user_id IS NOT NULL
    ), changes AS (
      SELECT user_id, event_type, t_us, event_id
      FROM ordered WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type,
           t_us AS valid_from_us,
           lead(t_us) OVER w AS valid_to_us,
           CAST(row_number() OVER w AS BIGINT) AS version,
           CAST(CASE WHEN lead(t_us) OVER w IS NULL THEN 1 ELSE 0 END
                AS INTEGER) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
    """,
    tags=("timeseries", "scd2", "cdc", "window"),
)
def ts_scd2_intervals(spark, sf_dir):
    """SCD2 (slowly-changing-dimension type 2) interval construction from a
    change log — the CDC/warehouse primitive: collapse each user's event
    stream into validity intervals of their event_type 'state', half-open
    [valid_from, valid_to), the open (is_current) interval last. This is how
    a 100 TB pipeline builds dimension history from an append-only log
    (dedup_latest_per_key keeps only the final state; SCD2 keeps the full
    timeline).

    Plan: ONE shuffle on user_id serves all three window passes (lag to
    detect changes, lead/row_number to close and version the intervals —
    same partitioning, Catalyst plans a single Exchange). Consecutive
    duplicate states collapse (lag filter), so output is bounded by the
    number of STATE CHANGES, not events. Ties broken by event_id so the
    hash is deterministic under equal timestamps."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    t_us = F.unix_micros("ts")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id", "event_type", t_us.alias("t_us"), "event_id",
        F.lag("event_type").over(wo).alias("prev_type"),
    )
    changes = ordered.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    wc = W.partitionBy("user_id").orderBy("t_us", "event_id")
    return changes.select(
        "user_id", "event_type",
        F.col("t_us").alias("valid_from_us"),
        F.lead("t_us").over(wc).alias("valid_to_us"),
        F.row_number().over(wc).cast("long").alias("version"),
        F.when(F.lead("t_us").over(wc).isNull(), 1).otherwise(0)
        .cast("int").alias("is_current"),
    )
