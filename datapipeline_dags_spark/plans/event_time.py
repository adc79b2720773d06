"""Event-time window queries — SURVEY ST7 declared surface.

``window`` / sliding ``window`` / ``session_window`` are the SAME
functions Structured Streaming executes incrementally; running them on
the replayed ``events`` table makes their semantics DuckDB-checkable
(streaming tests in tests/test_streaming.py cover the incremental +
watermark behavior the oracle cannot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from datapipeline_dags_spark.catalog import table
from datapipeline_dags_spark.checkpoint import local_checkpoint
from datapipeline_dags_spark.plans.helpers import (
    cached_count,
    dec,
    exact_audit_frac,
    md5_coin,
    resolve_exact_audit,
    sql_dec,
)
from datapipeline_dags_spark.plans.registry import query


@query(
    "q54_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS w_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS w_end,
           COUNT(*) AS n_events,
           (ROUND(SUM(value), 2) + 0.0) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q54_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (epoch-aligned, matching
    date_trunc) — one shuffle on the window bucket."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"), dec(F.sum("value")).alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q55_sliding_window",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS g, value FROM events),
    hopped AS (
      SELECT g AS w_start, value FROM b
      UNION ALL
      SELECT g - INTERVAL 30 MINUTE AS w_start, value FROM b)
    SELECT w_start, w_start + INTERVAL 1 HOUR AS w_end,
           COUNT(*) AS n_events
    FROM hopped GROUP BY 1, 2
    """,
)
def q55_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window, 30-minute hop — each event lands in two
    windows (Spark's Expand, the oracle's two-way UNION)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
        )
    )


@query(
    "q56_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT user_id,
           MIN(ts) AS s_start,
           MAX(ts) + INTERVAL 30 MINUTE AS s_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def q56_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(gap=30m) per user — Spark's native session operator
    (start = first event, end = last event + gap).  The oracle derives
    identical sessions with the LAG/cumulative-sum construction, tying
    the native operator to q24's hand-rolled batch analogue."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "n_events",
        )
    )


@query(
    "q49_hypertable_rollup",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket, event_type,
             COUNT(*) AS n_events, SUM(value) AS sv
      FROM events GROUP BY 1, 2)
    SELECT 'hour' AS grain, bucket, event_type, n_events,
           (ROUND(sv, 2) + 0.0) AS sum_value
    FROM hourly
    UNION ALL
    SELECT 'day' AS grain, date_trunc('day', bucket) AS bucket, event_type,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           (ROUND(SUM(sv), 2) + 0.0) AS sum_value
    FROM hourly GROUP BY 2, 3
    """,
)
def q49_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hour + day resolutions of
    the same measure in one lineage.

    The raw table is aggregated ONCE, at the finest grain (hour); the
    day level re-aggregates the hourly partials (sum/count compose), so
    the second shuffle moves only #hour-buckets × #event-types rows —
    at 100 TB the coarse grains are near-free, and the hourly aggregate
    is exactly what a streaming materialized view maintains
    incrementally (q54's window shares its shape).  The hourly table is
    persisted because Spark does NOT dedupe the two identical aggregate
    subtrees under a union (no ReusedExchange across differing expr
    ids — verified on the executed plan); without the persist the day
    branch silently re-scans the raw table.  Rounding happens only at
    the output edge; the day level composes unrounded partials on both
    engines, keeping the cut parity-exact.
    """
    from pyspark.storagelevel import StorageLevel

    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("bucket"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sv"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    hour_level = hourly.select(
        F.lit("hour").alias("grain"),
        "bucket",
        "event_type",
        "n_events",
        dec(F.col("sv")).alias("sum_value"),
    )
    day_level = (
        hourly.groupBy(F.date_trunc("day", "bucket").alias("bucket"), F.col("event_type"))
        .agg(F.sum("n_events").alias("n_events"), F.sum("sv").alias("sv"))
        .select(
            F.lit("day").alias("grain"),
            "bucket",
            "event_type",
            "n_events",
            dec(F.col("sv")).alias("sum_value"),
        )
    )
    return hour_level.unionByName(day_level)


@query(
    "q77_funnel_stages",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
          JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
                AND e.ts <= v.t1 + INTERVAL 6 HOUR
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
          JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
                AND e.ts <= c.t2 + INTERVAL 6 HOUR
          WHERE e.event_type = 'purchase' GROUP BY e.user_id),
    s AS (SELECT v.user_id,
          1 + (c.user_id IS NOT NULL)::INT + (p.user_id IS NOT NULL)::INT AS stage
          FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id))
    SELECT CAST(stage AS BIGINT) AS stage, COUNT(*) AS n_users
    FROM s GROUP BY stage
    """,
)
def q77_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: how many users progressed view -> click ->
    purchase, where each step must happen strictly AFTER the previous
    step's first occurrence and within a 6-hour conversion window (the
    ordering + recency constraints that separate a funnel from three
    independent filters).

    Scale shape: three min-timestamp aggregates chained by joins, every
    one keyed on user_id — a single-key family, so each stage reuses
    the same hash partitioning and the data never reshuffles on a new
    key.  No window over per-user event lists, no collect_list of
    event sequences.
    """
    ev = table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 6 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 6 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stage = (
        F.lit(1)
        + F.col("t2").isNotNull().cast("int")
        + F.col("t3").isNotNull().cast("int")
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(stage.cast("long").alias("stage"))
        .groupBy("stage")
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "q78_retention_cohorts",
    oracle="""
    WITH s AS (SELECT user_id, MIN(date_trunc('day', ts)) AS cohort
               FROM events WHERE event_type = 'signup' GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events)
    SELECT s.cohort AS cohort_day,
           CAST(date_diff('day', s.cohort, a.d) AS BIGINT) AS day_offset,
           COUNT(*) AS n_active
    FROM a JOIN s USING (user_id)
    WHERE a.d >= s.cohort
    GROUP BY 1, 2
    """,
)
def q78_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohorts: users grouped by first-signup day; for each
    (cohort, day-offset) cell, how many of that cohort were active —
    the standard retention triangle.

    Scale shape: the (user, day) activity set is deduped FIRST (one
    user_id-keyed distinct), so the cohort join fans out to at most
    users x active-days rows, never raw events; both the signup
    aggregate and the join key on user_id (single-key family), and the
    final cell aggregate is bounded by cohorts x offsets, not users.
    """
    ev = table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.date_trunc("day", "ts")).alias("cohort"))
    )
    a = ev.select("user_id", F.date_trunc("day", "ts").alias("d")).distinct()
    return (
        a.join(s, "user_id")
        .filter(F.col("d") >= F.col("cohort"))
        .select(
            F.col("cohort").alias("cohort_day"),
            F.datediff("d", "cohort").cast("long").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active"))
    )


@query(
    "q79_gapfill_forward",
    oracle="""
    WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS lo,
                      date_trunc('hour', MAX(ts)) AS hi FROM events),
    h AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b),
    u AS (SELECT DISTINCT user_id FROM events WHERE user_id < 5),
    obs AS (SELECT user_id, date_trunc('hour', ts) AS hour,
                   COUNT(*) AS c, (ROUND(AVG(value), 4) + 0.0) AS v
            FROM events WHERE user_id < 5 AND event_type = 'purchase'
            GROUP BY 1, 2)
    SELECT u.user_id, h.hour,
           CAST(COALESCE(obs.c, 0) AS BIGINT) AS n_events,
           last_value(obs.v IGNORE NULLS) OVER (
             PARTITION BY u.user_id ORDER BY h.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_avg_value
    FROM h CROSS JOIN u
    LEFT JOIN obs ON obs.user_id = u.user_id AND obs.hour = h.hour
    """,
)
def q79_gapfill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series with forward fill — the
    time_bucket_gapfill + locf shape of hypertable analytics: a dense
    hour spine per series, observed buckets joined on, missing buckets
    carrying the last observed (rounded) value forward.

    Scale shape: the spine is generated, not scanned — a 1-row min/max
    aggregate exploded into sequence(lo, hi, 1 hour), cross-joined with
    the (bounded) series-key set.  The fill is one window per series
    (last ignoreNulls over the hour order).  Rounding happens BEFORE
    the fill so both engines propagate identical doubles.
    """
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine_h = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    users = ev.filter(F.col("user_id") < 5).select("user_id").distinct()
    obs = (
        ev.filter((F.col("user_id") < 5) & (F.col("event_type") == "purchase"))
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").alias("c"), dec(F.avg("value"), 4).alias("v"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        spine_h.crossJoin(F.broadcast(users))
        .join(obs, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.coalesce("c", F.lit(0)).cast("long").alias("n_events"),
            F.last("v", ignorenulls=True).over(w).alias("filled_avg_value"),
        )
    )


@query(
    "q81_rolling_median",
    oracle="""
    WITH r AS (
      SELECT event_id, user_id, value, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
             quantile_cont(value, 0.5) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS med,
             AVG(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS mn
      FROM events WHERE user_id < 10)
    SELECT event_id, user_id,
           (ROUND(med, 4) + 0.0) AS rolling_median,
           (ROUND(mn, 4) + 0.0) AS rolling_mean
    FROM r WHERE rn > 10
    """,
)
def q81_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling robust statistics: per-user median and mean of the last
    11 events — the outlier-resistant smoothing used on metric streams
    (a rolling mean chases spikes; the median ignores them).

    Scale shape: one shuffle on the series key, then a bounded
    (11-row) sliding frame per row — state is O(frame), never the whole
    series.  Only FULL 11-row frames are emitted (ramp-up rows are
    dropped): an odd frame makes the median an exact element — no
    midpoint interpolation, whose last-ulp arithmetic (and half-way
    rounding) is the one place engines legitimately disagree."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    w = order.rowsBetween(-10, 0)
    return (
        ev.select(
            "event_id",
            "user_id",
            F.row_number().over(order).alias("rn"),
            dec(F.percentile("value", F.lit(0.5)).over(w), 4).alias("rolling_median"),
            dec(F.avg("value").over(w), 4).alias("rolling_mean"),
        )
        .filter(F.col("rn") > 10)
        .drop("rn")
    )


@query(
    "q84_event_transitions",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM events),
    t AS (SELECT prev_type, event_type AS next_type, COUNT(*) AS n
          FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2),
    tot AS (SELECT prev_type, SUM(n) AS tn FROM t GROUP BY prev_type)
    SELECT t.prev_type, t.next_type, CAST(t.n AS BIGINT) AS n,
           (ROUND(t.n * 1.0 / tot.tn, 6) + 0.0) AS p
    FROM t JOIN tot USING (prev_type)
    """,
)
def q84_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavior model: the event-type transition matrix —
    for each (prev, next) pair, its count and conditional probability
    P(next | prev) across all per-user ordered streams.

    Scale shape: ONE shuffle on user_id for the LAG window (the same
    partitioning sessionization uses), then the transition aggregate is
    keyed on the tiny (type x type) domain and the row-count collapses
    map-side; normalization joins a per-prev total that is at most
    |event_type| rows."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    tot = t.groupBy("prev_type").agg(F.sum("n").alias("tn"))
    return t.join(tot, "prev_type").select(
        "prev_type",
        "next_type",
        F.col("n").cast("long").alias("n"),
        dec(F.col("n") / F.col("tn"), 6).alias("p"),
    )


@query(
    "q87_growth_accounting",
    oracle="""
    WITH d AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
    firsts AS (SELECT user_id, MIN(day) AS first_day FROM d GROUP BY user_id),
    daily AS (SELECT day, COUNT(*) AS active_users FROM d GROUP BY day),
    news AS (SELECT first_day AS day, COUNT(*) AS new_users FROM firsts GROUP BY first_day)
    SELECT daily.day,
           CAST(daily.active_users AS BIGINT) AS active_users,
           CAST(COALESCE(news.new_users, 0) AS BIGINT) AS new_users,
           CAST(SUM(COALESCE(news.new_users, 0)) OVER (
             ORDER BY daily.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cumulative_users
    FROM daily LEFT JOIN news USING (day)
    """,
)
def q87_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per day, active users, first-seen (new)
    users, and the cumulative user count — the DAU/new/retained
    decomposition every product dashboard starts from.

    Scale shape: the raw stream collapses to a distinct (user, day) set
    first, then to per-day counts; the only ordered window (cumulative
    sum) runs over the DAY domain — tens of rows per month regardless
    of corpus size, so the unpartitioned window is bounded, not a
    single-partition scan of user data."""
    ev = table(spark, sf_dir, "events")
    d = ev.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    firsts = d.groupBy("user_id").agg(F.min("day").alias("first_day"))
    daily = d.groupBy("day").agg(F.count("*").alias("active_users"))
    news = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    new_users = F.coalesce("new_users", F.lit(0))
    return (
        daily.join(news, "day", "left")
        .select(
            "day",
            F.col("active_users").cast("long").alias("active_users"),
            new_users.cast("long").alias("new_users"),
            F.sum(new_users).over(w).cast("long").alias("cumulative_users"),
        )
    )


@query(
    "q88_ntile_deciles",
    oracle="""
    WITH t AS (
      SELECT event_type, value,
             NTILE(10) OVER (PARTITION BY event_type
                             ORDER BY value, event_id) AS decile
      FROM events)
    SELECT event_type, CAST(decile AS BIGINT) AS decile,
           COUNT(*) AS n,
           (ROUND(MIN(value), 2) + 0.0) AS lo,
           (ROUND(MAX(value), 2) + 0.0) AS hi
    FROM t GROUP BY 1, 2
    """,
)
def q88_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency binning: NTILE(10) deciles of value per event
    type with per-bin bounds — the feature-binning / SLA-banding shape
    (completes the window family: row_number / rank / dense_rank /
    lag / lead / ntile are now all exercised).

    The tile order includes the unique event_id tiebreak so bin
    assignment is total-order deterministic across engines; one shuffle
    on the partition key, then the bin aggregate collapses map-side."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select(
            "event_type", "value", F.ntile(10).over(w).alias("decile")
        )
        .groupBy("event_type", F.col("decile").cast("long").alias("decile"))
        .agg(
            F.count("*").alias("n"),
            dec(F.min("value")).alias("lo"),
            dec(F.max("value")).alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# q100 — time-decayed engagement score (exponential decay aggregate)
# ---------------------------------------------------------------------------

DECAY_TAU_US = 7 * 24 * 3600 * 1_000_000  # 7-day e-folding time
# event-type weights: the "value model" a feature pipeline assigns
DECAY_WEIGHTS = (("purchase", 5.0), ("signup", 3.0), ("click", 1.0), ("view", 0.5))
_W_SQL = " ".join(
    f"WHEN event_type = '{t}' THEN {w}" for t, w in DECAY_WEIGHTS
)


@query(
    "q100_time_decay_engagement",
    oracle=f"""
    WITH ref AS (SELECT MAX(epoch_us(ts)) AS ref_us FROM events),
    scored AS (
      SELECT user_id, ts,
             (CASE {_W_SQL} ELSE 0.0 END)
               * exp(-(ref.ref_us - epoch_us(ts)) / {DECAY_TAU_US}.0) AS s
      FROM events CROSS JOIN ref)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(ts) AS last_seen,
           (ROUND(SUM(s), 4) + 0.0) AS engagement
    FROM scored GROUP BY user_id
    """,
)
def q100_time_decay_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement per user: each event
    contributes weight(event_type) * exp(-age/tau) relative to the
    corpus's newest event — the standard recency-weighted feature a
    ranking/personalization pipeline materializes, and the batch
    equivalent of a decayed streaming accumulator (new_score =
    old_score * exp(-dt/tau) + w, folded over arrivals).

    Scale shape: the reference timestamp collapses to a 1-row broadcast
    scalar; scoring is map-only arithmetic on integer microseconds; the
    per-user reduce is one hash aggregate — the word-count shape.  The
    unordered float sum is pinned by the 4-dp round (cf. q74).
    """
    ev = table(spark, sf_dir, "events")
    ref = ev.agg(F.max(F.unix_micros("ts")).alias("ref_us"))
    weight = F.lit(0.0)
    for t, w in DECAY_WEIGHTS:
        weight = F.when(F.col("event_type") == t, F.lit(w)).otherwise(weight)
    s = weight * F.exp(
        -(F.col("ref_us") - F.unix_micros("ts")) / F.lit(float(DECAY_TAU_US))
    )
    return (
        ev.join(F.broadcast(ref))
        .select("user_id", "ts", s.alias("s"))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.max("ts").alias("last_seen"),
            dec(F.sum("s"), 4).alias("engagement"),
        )
    )


# ---------------------------------------------------------------------------
# q108 — rolling z-score anomaly detection
# ---------------------------------------------------------------------------

ZS_LOOKBACK = 24  # trailing full-window size (rows), current row excluded
ZS_THRESHOLD = 3.0


@query(
    "q108_rolling_zscore_anomalies",
    oracle=f"""
    WITH w AS (
      SELECT event_id, event_type, ts, value,
             AVG(value) OVER tw AS mu,
             STDDEV_SAMP(value) OVER tw AS sigma,
             COUNT(*) OVER tw AS n_prev
      FROM events
      WINDOW tw AS (PARTITION BY event_type ORDER BY ts, event_id
                    ROWS BETWEEN {ZS_LOOKBACK} PRECEDING AND 1 PRECEDING))
    SELECT event_id, event_type, ts, value,
           (ROUND((value - mu) / sigma, 4) + 0.0) AS zscore
    FROM w
    WHERE n_prev = {ZS_LOOKBACK} AND sigma > 0
      AND ABS((value - mu) / sigma) > {ZS_THRESHOLD}
    """,
)
def q108_rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event's value against the
    mean/stddev of the TRAILING {ZS_LOOKBACK} events of the same type
    (current row excluded — no self-contamination); emit events more
    than {ZS_THRESHOLD}σ out.  The monitoring primitive for metric
    streams (data-quality drift, abuse spikes).

    Scale shape: ONE window pass partitioned by event_type (bounded
    cardinality → consider salting by day at extreme per-type volume),
    trailing frame only — mean and stddev are O(1) mergeable frame
    aggregates, full frames only so results are interpolation-free and
    engine-exact (the q81 discipline).
    """
    ev = table(spark, sf_dir, "events")
    tw = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-ZS_LOOKBACK, -1)
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.select(
            "event_id",
            "event_type",
            "ts",
            "value",
            F.avg("value").over(tw).alias("mu"),
            F.stddev_samp("value").over(tw).alias("sigma"),
            F.count("*").over(tw).alias("n_prev"),
        )
        .filter(
            (F.col("n_prev") == ZS_LOOKBACK)
            & (F.col("sigma") > 0)
            & (F.abs(z) > ZS_THRESHOLD)
        )
        .select("event_id", "event_type", "ts", "value", dec(z, 4).alias("zscore"))
    )


# ---------------------------------------------------------------------------
# q113 — mergeable-sketch rollup (daily HLL sketches → weekly union)
# ---------------------------------------------------------------------------


@query(
    "q113_sketch_rollup",
    oracle="""
    SELECT date_trunc('week', ts) AS week,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_weekly_users,
           TRUE AS merged_within_5pct
    FROM events GROUP BY 1
    """,
)
def q113_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-DAY HLL sketches of distinct users,
    union-merged to WEEKLY estimates — the production pattern for
    distinct-count metrics at 100 TB (daily sketch bytes persist once;
    every coarser grain is a cheap sketch union, never a re-scan of
    raw events; cf. q49's additive-partial rollup, which this extends
    to the non-additive COUNT DISTINCT).

    The sketch estimate is engine-specific, so the checked contract is
    the q36 discipline: the merged weekly estimate must land within 5%
    of the exact weekly distinct count (HLL lgConfigK=12 ≈ 1.6% rsd).
    """
    ev = table(spark, sf_dir, "events")
    day_sketches = ev.groupBy(
        F.date_trunc("week", "ts").alias("wk"), F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    weekly = day_sketches.groupBy("wk").agg(
        F.count("*").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    )
    exact = ev.groupBy(F.date_trunc("week", "ts").alias("wk")).agg(
        F.countDistinct("user_id").alias("exact_weekly_users")
    )
    return weekly.join(exact, "wk").select(
        F.col("wk").alias("week"),
        F.col("n_days").cast("long").alias("n_days"),
        F.col("exact_weekly_users").cast("long").alias("exact_weekly_users"),
        (
            F.abs(F.col("est") - F.col("exact_weekly_users"))
            <= 0.05 * F.col("exact_weekly_users")
        ).alias("merged_within_5pct"),
    )


# ---------------------------------------------------------------------------
# q118 — sweep-line concurrency (max concurrent sessions per hour)
# ---------------------------------------------------------------------------


@query(
    "q118_session_concurrency",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions2 AS (
      SELECT user_id, session_id, MIN(ts) AS t_start, MAX(ts) AS t_end
      FROM (
        SELECT user_id, ts,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM flagged) s
      GROUP BY user_id, session_id
    ),
    deltas AS (
      SELECT t_start AS ts, 1 AS d, user_id, session_id FROM sessions2
      UNION ALL
      SELECT t_end AS ts, -1 AS d, user_id, session_id FROM sessions2),
    running AS (
      SELECT ts, d,
             SUM(d) OVER (ORDER BY ts, d, user_id, session_id
                          ROWS UNBOUNDED PRECEDING) AS conc
      FROM deltas)
    SELECT date_trunc('hour', ts) AS hour,
           CAST(MAX(conc) AS BIGINT) AS max_concurrent
    FROM running GROUP BY 1
    """,
)
def q118_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line concurrency: the peak number of simultaneously-active
    user sessions in each hour — the capacity-planning metric computed
    the classic way (each session contributes +1 at t_start and −1 at
    t_end; the running sum of deltas IS the concurrency curve).  Tie
    contract at an identical instant: releases before claims
    (d = −1 sorts first), then (user_id, session_id) for a total order.

    Scale shape: sessions come from q24's one-shuffle sessionization;
    the global running sum does NOT use one giant ORDER BY window — it
    is the q71 two-phase distributed prefix sum (per-hour local cumsum
    + a broadcast table of per-hour offsets, |hours| rows), then one
    bounded per-hour max.  Output cardinality = hour domain.
    """
    from datapipeline_dags_spark.plans.registry import QUERIES as _Q

    sess = _Q["q24_sessionize_events"](spark, sf_dir)
    deltas = sess.select(
        F.col("t_start").alias("ts"), F.lit(1).alias("d"), "user_id", "session_id"
    ).unionAll(
        sess.select(
            F.col("t_end").alias("ts"), F.lit(-1).alias("d"), "user_id", "session_id"
        )
    )
    hour = F.date_trunc("hour", "ts")
    local_w = (
        W.partitionBy("hr")
        .orderBy("ts", "d", "user_id", "session_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = deltas.withColumn("hr", hour).withColumn(
        "local_conc", F.sum("d").over(local_w)
    )
    offsets = (
        local.groupBy("hr")
        .agg(F.sum("d").alias("hr_total"))
        .withColumn(
            "hr_offset",
            F.coalesce(
                F.sum("hr_total").over(
                    W.orderBy("hr").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("hr", "hr_offset")
    )
    return (
        local.join(F.broadcast(offsets), "hr")
        .groupBy(F.col("hr").alias("hour"))
        .agg(
            F.max(F.col("hr_offset") + F.col("local_conc"))
            .cast("long")
            .alias("max_concurrent")
        )
    )


# ---------------------------------------------------------------------------
# q123 — distribution drift (Population Stability Index per event type)
# ---------------------------------------------------------------------------

PSI_BINS = 10
PSI_ALERT = 0.2  # the conventional "significant drift" threshold


@query(
    "q123_psi_drift",
    oracle=f"""
    WITH span AS (SELECT MIN(ts) AS t0, MAX(ts) AS t1 FROM events),
    rng AS (SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
            FROM events GROUP BY event_type),
    binned AS (
      SELECT e.event_type,
             (epoch_us(e.ts) - epoch_us(s.t0)) * 2
               < (epoch_us(s.t1) - epoch_us(s.t0)) AS is_ref,
             CASE WHEN r.hi = r.lo THEN 0
                  ELSE LEAST({PSI_BINS - 1}, GREATEST(0, CAST(FLOOR(
                    (e.value - r.lo) / ((r.hi - r.lo) / {PSI_BINS})) AS INT)))
             END AS bin
      FROM events e, span s JOIN rng r ON e.event_type = r.event_type),
    cnt AS (
      SELECT event_type, bin,
             SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS c_ref,
             SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS c_cur
      FROM binned GROUP BY event_type, bin),
    tot AS (
      SELECT event_type, SUM(c_ref) AS n_ref, SUM(c_cur) AS n_cur
      FROM cnt GROUP BY event_type),
    terms AS (
      SELECT c.event_type,
             ((c.c_ref + 1.0) / (t.n_ref + {PSI_BINS})
              - (c.c_cur + 1.0) / (t.n_cur + {PSI_BINS}))
             * ln(((c.c_ref + 1.0) / (t.n_ref + {PSI_BINS}))
                  / ((c.c_cur + 1.0) / (t.n_cur + {PSI_BINS}))) AS term
      FROM cnt c JOIN tot t ON c.event_type = t.event_type)
    SELECT event_type,
           (ROUND(SUM(term), 6) + 0.0) AS psi,
           SUM(term) > {PSI_ALERT} AS drifted
    FROM terms GROUP BY event_type
    """,
)
def q123_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift via the Population Stability Index: per event
    type, the value distribution of the FIRST half of the time range
    (reference window) vs the SECOND half (current window) over
    {PSI_BINS} fixed-width bins, add-one smoothed — PSI > {PSI_ALERT}
    is the conventional retrain/alert threshold.  The
    distribution-level monitoring complement to q108's per-point
    z-score anomalies.

    Scale shape: the time span and per-type value ranges are 1-row /
    |types|-row broadcast aggregates; binning is map-side arithmetic;
    everything after is hash aggs on (type, bin) — output and
    intermediate cardinality bounded by |types| × {PSI_BINS} at any
    event volume.  The unordered float sum over {PSI_BINS} smoothed
    terms is pinned by the 6-dp round.
    """
    ev = table(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"), F.max(F.unix_micros("ts")).alias("t1")
    )
    rng = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / PSI_BINS
    # hi == lo (a constant-valued type) makes width 0; without the guard
    # Spark folds NaN -> null -> greatest-skips-null into bin 0 while
    # DuckDB's FLOOR(x/0) can diverge — pin bin 0 EXPLICITLY on both
    # sides so the degenerate-but-legal input stays engine-agreed.
    bin_ = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(PSI_BINS - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col("value") - F.col("lo")) / width).cast("int"),
            ),
        )
    )
    is_ref = (F.unix_micros("ts") - F.col("t0")) * 2 < (F.col("t1") - F.col("t0"))
    cnt = (
        ev.crossJoin(F.broadcast(span))
        .join(F.broadcast(rng), "event_type")
        .select("event_type", is_ref.alias("is_ref"), bin_.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("c_ref"),
            F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("c_cur"),
        )
    )
    tot = cnt.groupBy("event_type").agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    p_ref = (F.col("c_ref") + 1.0) / (F.col("n_ref") + PSI_BINS)
    p_cur = (F.col("c_cur") + 1.0) / (F.col("n_cur") + PSI_BINS)
    term = (p_ref - p_cur) * F.log(p_ref / p_cur)
    return (
        cnt.join(tot, "event_type")
        .select("event_type", term.alias("term"))
        .groupBy("event_type")
        .agg(
            dec(F.sum("term"), 6).alias("psi"),
            (F.sum("term") > PSI_ALERT).alias("drifted"),
        )
    )


# ---------------------------------------------------------------------------
# q124 — WOE / IV binning (feature predictive power, no global sort)
# ---------------------------------------------------------------------------

WOE_EDGES = tuple(i / 10 for i in range(1, 10))  # decile edges p10..p90


@query(
    "q124_woe_iv_binning",
    oracle=f"""
    WITH u AS (
      SELECT user_id, COUNT(*) AS n_events,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
      FROM events GROUP BY user_id),
    e AS (SELECT [{", ".join(f"quantile_cont(n_events, {p})" for p in WOE_EDGES)}]
            AS edges FROM u),
    b AS (SELECT u.pos,
                 len(list_filter(e.edges, x -> u.n_events > x)) AS bin
          FROM u, e),
    cnt AS (SELECT bin, COUNT(*) AS n_users, SUM(pos) AS n_pos,
                   COUNT(*) - SUM(pos) AS n_neg
            FROM b GROUP BY bin),
    tot AS (SELECT SUM(n_pos) AS p, SUM(n_neg) AS n,
                   COUNT(*) AS nb FROM cnt)
    SELECT bin,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_pos AS BIGINT) AS n_pos,
           (ROUND(ln(((n_pos + 0.5) / (p + 0.5 * nb))
                     / ((n_neg + 0.5) / (n + 0.5 * nb))), 6) + 0.0) AS woe,
           (ROUND(((n_pos + 0.5) / (p + 0.5 * nb)
                   - (n_neg + 0.5) / (n + 0.5 * nb))
                  * ln(((n_pos + 0.5) / (p + 0.5 * nb))
                       / ((n_neg + 0.5) / (n + 0.5 * nb))), 6) + 0.0)
             AS iv_term
    FROM cnt, tot
    """,
)
def q124_woe_iv_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value binning: how predictive a
    user's activity level (event count) is of conversion (any
    purchase) — the credit-scoring feature-selection staple.  Bins
    come from exact decile EDGES (q59's percentile, one 1-row
    broadcast), NOT a global NTILE sort: bin(x) = #edges below x is
    map-side arithmetic, so no operator ever orders the full user set
    (the q111 broadcast-bounds pattern).  WOE/IV use 0.5-smoothed
    fractions; Σ iv_term is the feature's IV.

    Scale shape: one user-keyed agg; a 1-row edge vector and a 1-row
    pos/neg total, both broadcast; output ≤ 10 rows at any volume.
    """
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "pos"
        ),
    )
    edges = u.agg(
        F.percentile("n_events", F.array(*[F.lit(p) for p in WOE_EDGES])).alias(
            "edges"
        )
    )
    bin_ = F.size(F.filter(F.col("edges"), lambda x: F.col("n_events") > x))
    cnt = (
        u.crossJoin(F.broadcast(edges))
        .select("pos", bin_.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("pos").alias("n_pos"),
            (F.count("*") - F.sum("pos")).alias("n_neg"),
        )
    )
    tot = cnt.agg(
        F.sum("n_pos").alias("p"),
        F.sum("n_neg").alias("n"),
        F.count("*").alias("nb"),
    )
    # totals smoothed by the same 0.5-per-bin mass, so a degenerate
    # all-positive (or all-negative) corpus never divides by zero
    fp = (F.col("n_pos") + 0.5) / (F.col("p") + 0.5 * F.col("nb"))
    fn = (F.col("n_neg") + 0.5) / (F.col("n") + 0.5 * F.col("nb"))
    return cnt.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.col("n_users").cast("long").alias("n_users"),
        F.col("n_pos").cast("long").alias("n_pos"),
        dec(F.log(fp / fn), 6).alias("woe"),
        dec((fp - fn) * F.log(fp / fn), 6).alias("iv_term"),
    )


# ---------------------------------------------------------------------------
# q145 — multi-touch attribution (linear + last-touch)
# ---------------------------------------------------------------------------

ATTR_LOOKBACK_US = 6 * 3600 * 1_000_000  # 6-hour attribution lookback


@query(
    "q145_multitouch_attribution",
    oracle=f"""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id,
             epoch_us(ts) AS p_us,
             CAST(ROUND(value * 10000) AS BIGINT) AS value_u
      FROM events WHERE event_type = 'purchase'),
    t AS (
      SELECT event_id AS touch_id, user_id, event_type AS channel,
             epoch_us(ts) AS t_us
      FROM events WHERE event_type IN ('view', 'click')),
    pt AS (
      SELECT p.purchase_id, p.value_u, t.channel, t.touch_id
      FROM p LEFT JOIN t
        ON p.user_id = t.user_id
       AND t.t_us < p.p_us
       AND t.t_us >= p.p_us - {ATTR_LOOKBACK_US}),
    per_purchase AS (
      SELECT purchase_id, value_u,
             COALESCE(channel, 'unattributed') AS channel,
             COUNT(touch_id) OVER (PARTITION BY purchase_id) AS n_touches,
             CASE WHEN touch_id IS NULL THEN true ELSE
               ROW_NUMBER() OVER (
                 PARTITION BY purchase_id
                 ORDER BY touch_id DESC) = 1 END AS is_last
      FROM pt)
    SELECT channel,
           COUNT(*) AS n_touches,
           (ROUND(SUM(CASE WHEN n_touches = 0 THEN value_u
                           ELSE value_u * 1.0 / n_touches END) / 10000.0, 4)
            + 0.0) AS linear_revenue,
           (ROUND(SUM(CASE WHEN is_last THEN value_u ELSE 0 END) / 10000.0, 4)
            + 0.0) AS last_touch_revenue
    FROM per_purchase
    GROUP BY channel
    """,
)
def q145_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style multi-touch attribution: every purchase's revenue
    is credited to the view/click touches of the SAME user in the 6 h
    before it — linearly (value / n_touches to each touch) and
    last-touch (full value to the latest touch; latest = highest
    event_id, which is assigned in ts order in the fixture and makes
    the tie-break total).  Purchases with no preceding touch report
    under an explicit ``unattributed`` channel rather than vanishing.

    Scale shape: the purchase-touch pair join is keyed on ``user_id``
    (bounded per-user event counts — never a time-only nested loop; cf.
    q48 for the keyless variant), the per-purchase window functions
    shuffle once on ``purchase_id``, and the output is |channels| + 1
    rows at any SF.  Float discipline: revenue is fixed-pointed to
    1e-4 units BEFORE any aggregation, so last-touch sums are exact
    integers and the linear shares differ from the oracle only below
    the rounding threshold.
    """
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
        F.round(F.col("value") * 10000).cast("long").alias("value_u"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("channel"),
        F.unix_micros("ts").alias("t_us"),
    )
    pt = p.join(
        t,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - ATTR_LOOKBACK_US),
        "left",
    ).select("purchase_id", "value_u", "channel", "touch_id")
    w_cnt = W.partitionBy("purchase_id")
    w_last = W.partitionBy("purchase_id").orderBy(F.col("touch_id").desc())
    per = pt.select(
        "purchase_id",
        "value_u",
        F.coalesce(F.col("channel"), F.lit("unattributed")).alias("channel"),
        F.count("touch_id").over(w_cnt).alias("n_touches"),
        F.when(F.col("touch_id").isNull(), F.lit(True))
        .otherwise(F.row_number().over(w_last) == 1)
        .alias("is_last"),
    )
    linear = F.when(
        F.col("n_touches") == 0, F.col("value_u").cast("double")
    ).otherwise(F.col("value_u") / F.col("n_touches"))
    return per.groupBy("channel").agg(
        F.count("*").cast("long").alias("n_touches"),
        dec(F.sum(linear) / 10000.0, 4).alias("linear_revenue"),
        dec(
            F.sum(F.when(F.col("is_last"), F.col("value_u")).otherwise(0)) / 10000.0,
            4,
        ).alias("last_touch_revenue"),
    )


# ---------------------------------------------------------------------------
# q149 — session path analysis (top trigram journeys)
# ---------------------------------------------------------------------------

PATH_TOP_K = 20


@query(
    "q149_session_paths",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)
                       > 1800000000
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged),
    tri AS (
      SELECT event_type AS t1,
             LEAD(event_type, 1) OVER w AS t2,
             LEAD(event_type, 2) OVER w AS t3
      FROM sessions
      WINDOW w AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)),
    counted AS (
      SELECT t1 || '>' || t2 || '>' || t3 AS path, COUNT(*) AS n
      FROM tri WHERE t3 IS NOT NULL GROUP BY 1)
    SELECT path, n FROM counted ORDER BY n DESC, path LIMIT {PATH_TOP_K}
    """,
)
def q149_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top in-session user journeys: the {PATH_TOP_K} most common
    3-step event-type paths WITHIN a session (q24's 30-min-gap
    sessionization — a path never spans a session boundary, which is
    what separates this from q84's global per-user transition matrix).

    Scale shape: both windows (session numbering, LEAD trigrams) share
    ONE shuffle on user_id — the trigram window partitions by
    (user_id, session_id), a refinement of the session window's
    partitioning, so Catalyst reuses the exchange; then one hash agg on
    the path string and a TakeOrderedAndProject top-k (no global sort).
    """
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sessions = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    ws = W.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    tri = sessions.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(ws).alias("t2"),
        F.lead("event_type", 2).over(ws).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        tri.groupBy(
            F.concat_ws(">", "t1", "t2", "t3").alias("path")
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(PATH_TOP_K)
    )


# ---------------------------------------------------------------------------
# q150 — per-type linear trend (mergeable OLS) + next-hour forecast
# ---------------------------------------------------------------------------


@query(
    "q150_value_trend",
    oracle="""
    WITH h AS (
      SELECT event_type, value,
             epoch_us(ts) // 3600000000 -
               (SELECT MIN(epoch_us(ts) // 3600000000) FROM events) AS x
      FROM events)
    SELECT event_type,
           COUNT(*) AS n,
           (ROUND(regr_slope(value, x), 6) + 0.0) AS slope,
           (ROUND(regr_intercept(value, x), 6) + 0.0) AS intercept,
           (ROUND(corr(value, x), 6) + 0.0) AS r,
           (ROUND(regr_intercept(value, x)
                  + regr_slope(value, x) * (MAX(x) + 1), 6) + 0.0) AS forecast_next
    FROM h GROUP BY event_type
    """,
)
def q150_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type linear trend of ``value`` over hour index, with a
    one-step-ahead forecast — the drift/trend monitor next to q108's
    point anomalies and q123's distribution drift.

    Scale shape: ``regr_slope`` / ``regr_intercept`` / ``corr`` are
    single-pass MERGEABLE aggregates (Welford-style moment partials,
    map-side combined — same discipline as q83/q128); the hour index is
    RE-BASED to the corpus minimum (a 1-row aggregate broadcast in)
    so the moment sums stay small — raw epoch-hour x would put the
    cancellation error of n*mean(x)^2 above the rounding threshold.
    Output is |event types| rows at any SF.
    """
    ev = table(spark, sf_dir, "events")
    hour = (F.unix_micros("ts") / F.lit(3_600_000_000)).cast("long")
    base = ev.select("event_type", "value", hour.alias("h"))
    min_h = base.agg(F.min("h").alias("min_h"))
    x = (F.col("h") - F.col("min_h")).cast("double")
    return (
        base.crossJoin(F.broadcast(min_h))
        .select("event_type", "value", x.alias("x"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            dec(F.regr_slope("value", "x"), 6).alias("slope"),
            dec(F.regr_intercept("value", "x"), 6).alias("intercept"),
            dec(F.corr("value", "x"), 6).alias("r"),
            dec(
                F.regr_intercept("value", "x")
                + F.regr_slope("value", "x") * (F.max("x") + 1),
                6,
            ).alias("forecast_next"),
        )
    )


# ---------------------------------------------------------------------------
# q151 — join-key skew diagnosis
# ---------------------------------------------------------------------------

SKEW_TOP_K = 10


@query(
    "q151_key_skew_diagnosis",
    oracle=f"""
    WITH k AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id),
    tot AS (SELECT COUNT(*) AS n_rows, COUNT(DISTINCT user_id) AS n_keys
            FROM events),
    ranked AS (
      SELECT user_id, cnt FROM k ORDER BY cnt DESC, user_id LIMIT {SKEW_TOP_K})
    SELECT r.user_id, r.cnt,
           {sql_dec('r.cnt * 1.0 / t.n_rows', 6)} AS share,
           {sql_dec('r.cnt * t.n_keys * 1.0 / t.n_rows', 4)} AS skew_factor,
           CAST(CEIL(r.cnt * t.n_keys * 1.0 / t.n_rows) AS BIGINT) AS suggested_salt
    FROM ranked r CROSS JOIN tot t
    """,
)
def q151_key_skew_diagnosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew profiler: the {SKEW_TOP_K} heaviest join/agg keys
    with their row share, skew factor (count / mean-count-per-key), and
    the salt-bucket count `operators/skew.py salted_join` would need to
    level them — the diagnosis step that decides BETWEEN plain hash
    join, AQE skew handling, and explicit salting before a 100 TB run.

    Scale shape: one hash agg on the key, a TakeOrderedAndProject
    top-k, and a 1-row totals attach — the profile costs one pass over
    the probe side, which is exactly what you spend before committing
    a multi-hour shuffle to a skewed layout.
    """
    ev = table(spark, sf_dir, "events")
    k = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    tot = ev.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_keys"),
    )
    skew = F.col("cnt") * F.col("n_keys") / F.col("n_rows")
    return (
        k.orderBy(F.col("cnt").desc(), "user_id")
        .limit(SKEW_TOP_K)
        .crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "cnt",
            dec(F.col("cnt") / F.col("n_rows"), 6).alias("share"),
            dec(skew, 4).alias("skew_factor"),
            F.ceil(skew).cast("long").alias("suggested_salt"),
        )
    )


# ---------------------------------------------------------------------------
# q160 — Z-order (Morton) clustering key + layout audit
# ---------------------------------------------------------------------------

ZORD_BITS = 8  # bits per dimension (16-bit interleaved key)


def _z_sql(h: str, u: str) -> str:
    terms = []
    for i in range(ZORD_BITS):
        terms.append(f"((({h}) // {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"((({u}) // {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


@query(
    "q160_zorder_layout",
    oracle=f"""
    WITH b AS (
      SELECT epoch_us(ts) // 3600000000 AS h, user_id AS u FROM events),
    st AS (SELECT MIN(h) AS hlo, MAX(h) AS hhi, MIN(u) AS ulo, MAX(u) AS uhi
           FROM b),
    n AS (
      SELECT CAST(CASE WHEN hhi = hlo THEN 0 ELSE
               FLOOR((h - hlo) * {(1 << ZORD_BITS) - 1}.0 / (hhi - hlo)) END
             AS BIGINT) AS hn,
             CAST(CASE WHEN uhi = ulo THEN 0 ELSE
               FLOOR((u - ulo) * {(1 << ZORD_BITS) - 1}.0 / (uhi - ulo)) END
             AS BIGINT) AS un,
             h, u
      FROM b CROSS JOIN st)
    SELECT ({_z_sql('hn', 'un')}) // {1 << ZORD_BITS} AS zbucket,
           COUNT(*) AS n_rows,
           MIN(h) AS hour_lo, MAX(h) AS hour_hi,
           MIN(u) AS user_lo, MAX(u) AS user_hi
    FROM n GROUP BY 1
    """,
)
def q160_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (event hour, user_id) plus
    the layout audit that justifies it: each dimension is normalized to
    {ZORD_BITS} bits, bits are interleaved into a 16-bit key, and rows
    grouped by the key's top byte report per-bucket min/max of BOTH
    dimensions — the footprint rectangle file-level min/max statistics
    would prune on.  A linear sort clusters one dimension perfectly and
    scatters the other; the Z-curve bounds both, which is why Delta/
    Iceberg `OPTIMIZE ZORDER BY` exists.  Writing
    ``df.repartitionByRange(F.col("zkey")).sortWithinPartitions`` with
    this key is the layout step; the audit here is the measurable
    contract.

    Scale shape: one 1-row min/max attach (broadcast), then the key is
    pure map-side bit arithmetic inside codegen; the audit agg is <= 256
    rows at any SF.  Degenerate constant dimensions normalize to 0 (the
    q123 zero-width guard).
    """
    ev = table(spark, sf_dir, "events")
    b = ev.select(
        (F.unix_micros("ts") / F.lit(3_600_000_000)).cast("long").alias("h"),
        F.col("user_id").alias("u"),
    )
    st = b.agg(
        F.min("h").alias("hlo"),
        F.max("h").alias("hhi"),
        F.min("u").alias("ulo"),
        F.max("u").alias("uhi"),
    )
    top = (1 << ZORD_BITS) - 1

    def norm(v: str, lo: str, hi: str) -> Column:
        return (
            F.when(F.col(hi) == F.col(lo), F.lit(0))
            .otherwise(
                F.floor(
                    (F.col(v) - F.col(lo)) * float(top) / (F.col(hi) - F.col(lo))
                )
            )
            .cast("long")
        )

    n = b.crossJoin(F.broadcast(st)).select(
        "h", "u", norm("h", "hlo", "hhi").alias("hn"), norm("u", "ulo", "uhi").alias("un")
    )
    z = F.lit(0)
    for i in range(ZORD_BITS):
        z = (
            z
            + F.shiftright("hn", i).bitwiseAND(F.lit(1)) * (1 << (2 * i + 1))
            + F.shiftright("un", i).bitwiseAND(F.lit(1)) * (1 << (2 * i))
        )
    return (
        n.withColumn("zbucket", (z / (1 << ZORD_BITS)).cast("long"))
        .groupBy("zbucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("h").alias("hour_lo"),
            F.max("h").alias("hour_hi"),
            F.min("u").alias("user_lo"),
            F.max("u").alias("user_hi"),
        )
    )


# ---------------------------------------------------------------------------
# q161 — incremental rollup maintenance (base partials + delta partials)
# ---------------------------------------------------------------------------


@query(
    "q161_incremental_rollup",
    oracle="""
    SELECT date_trunc('day', ts) AS day, event_type,
           COUNT(*) AS n_events,
           (ROUND(SUM(value), 2) + 0.0) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q161_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the corpus is split at
    its midpoint hour into a BASE batch (yesterday's stored partials)
    and a DELTA batch (newly arrived data); each side aggregates to
    hourly partials INDEPENDENTLY, and the day-level view merges the
    partial streams without ever rescanning base rows — the
    ``foreachBatch`` maintenance loop a streaming rollup runs on every
    trigger (q49's partial-composition made incremental).

    The oracle is deliberately NOT a mirror: it computes the day rollup
    DIRECTLY from the raw table in one pass.  The hash match proves the
    algebraic contract that makes incremental maintenance sound —
    merge(partials(base), partials(delta)) == aggregate(base ∪ delta) —
    rather than proving two engines ran the same plan.

    Scale shape: each side is one (hour, type) hash agg; the merge
    shuffles only |hours| x |types| partial rows; the split predicate
    is a 1-row midpoint broadcast that pushes to the scan at 100 TB
    (partition pruning on the date column).
    """
    ev = table(spark, sf_dir, "events")
    mid = ev.agg(
        F.date_trunc(
            "hour",
            F.timestamp_micros(
                ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2).cast(
                    "long"
                )
            ),
        ).alias("mid")
    )
    with_mid = ev.crossJoin(F.broadcast(mid))

    def partials(side: DataFrame) -> DataFrame:
        return side.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(F.count("*").alias("n"), F.sum("value").alias("sv"))

    base = partials(with_mid.filter(F.col("ts") < F.col("mid")))
    delta = partials(with_mid.filter(F.col("ts") >= F.col("mid")))
    return (
        base.unionByName(delta)
        .groupBy(F.date_trunc("day", "hour").alias("day"), "event_type")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            dec(F.sum("sv"), 2).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# q162 — rolling 7-day active users (DAU / WAU / stickiness)
# ---------------------------------------------------------------------------

WAU_DAYS = 7


@query(
    "q162_rolling_active_users",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT epoch_us(ts) // 86400000000 AS d, user_id FROM events),
    days AS (SELECT DISTINCT d FROM ud),
    contrib AS (
      SELECT DISTINCT ud.d + i.i AS target, ud.user_id
      FROM ud CROSS JOIN
        (SELECT unnest(generate_series(0, {WAU_DAYS - 1})) AS i) i),
    wau AS (
      SELECT c.target AS d, COUNT(*) AS wau
      FROM contrib c JOIN days ON days.d = c.target
      GROUP BY c.target),
    dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY d)
    SELECT dau.d AS epoch_day, dau.dau, wau.wau,
           {sql_dec('dau.dau * 1.0 / wau.wau', 6)} AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def q162_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling engagement: per day, DAU, trailing-{WAU_DAYS}-day WAU,
    and the DAU/WAU stickiness ratio — the growth metric next to q87's
    new/retained accounting.  Rolling DISTINCT is the trap here: a
    distinct count is NOT sum-decomposable over a sliding window, so
    naive per-day windows recount users.  The scalable exact form
    CONTRIBUTES each (day, user) activity to the {WAU_DAYS} target days
    it keeps the user active for (a fixed x{WAU_DAYS} map-side fan-out
    of the deduped user-day table — orders of magnitude smaller than
    events), dedupes (target, user), and counts; the approximate form
    at extreme scale merges per-day HLL sketches instead (q113's
    mergeable discipline — same join shape, constant-size state).

    Scale shape: one (day, user) distinct over the scan, one bounded
    explode, one (target, user) distinct keyed like any big group-by,
    final aggs on |days| rows.  No per-day rescans, no window over raw
    events.
    """
    ev = table(spark, sf_dir, "events")
    ud = (
        ev.select(
            (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("d"),
            "user_id",
        )
        .distinct()
    )
    days = ud.select("d").distinct()
    contrib = (
        ud.select(
            F.explode(
                F.sequence(F.col("d"), F.col("d") + (WAU_DAYS - 1))
            ).alias("target"),
            "user_id",
        )
        .distinct()
    )
    wau = (
        contrib.join(days, contrib["target"] == days["d"])
        .groupBy("target")
        .agg(F.count("*").alias("wau"))
    )
    dau = ud.groupBy("d").agg(F.count("*").alias("dau"))
    return (
        dau.join(wau, dau["d"] == wau["target"])
        .select(
            dau["d"].alias("epoch_day"),
            "dau",
            "wau",
            dec(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# q163 — seasonal-baseline anomalies (hour-of-day profile z-score)
# ---------------------------------------------------------------------------

SEASONAL_Z = 2.0


@query(
    "q163_seasonal_anomalies",
    oracle=f"""
    WITH mid AS (
      SELECT date_trunc('hour', to_timestamp(
               ((MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2) / 1000000.0))
             AS mid
      FROM events),
    hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             EXTRACT(hour FROM ts) AS hod,
             ROUND(SUM(value), 2) AS sv,
             (date_trunc('hour', ts) < mid.mid) AS is_base
      FROM events CROSS JOIN mid
      GROUP BY 1, 2, 3, mid.mid),
    profile AS (
      SELECT event_type, hod,
             ROUND(AVG(sv), 6) AS mu,
             ROUND(STDDEV_SAMP(sv), 6) AS sd
      FROM hourly WHERE is_base GROUP BY 1, 2
      HAVING COUNT(*) > 1 AND STDDEV_SAMP(sv) > 0)
    SELECT h.event_type, h.h AS hour, (h.sv + 0.0) AS sum_value,
           {sql_dec('(h.sv - p.mu) / p.sd', 4)} AS z
    FROM hourly h JOIN profile p
      ON p.event_type = h.event_type AND p.hod = h.hod
    WHERE NOT h.is_base AND ABS((h.sv - p.mu) / p.sd) > {SEASONAL_Z}
    """,
)
def q163_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly detection: the corpus's first half
    builds an hour-of-day profile (mean/sd of HOURLY value totals per
    event type — the "same hour on a normal day" baseline), and each
    second-half hour is z-scored against ITS OWN hour-of-day profile.
    q108's trailing window flags level shifts; this catches "3 AM
    traffic at noon levels", which a trailing window normalizes away
    within hours.  Degenerate profiles (one sample, zero variance) are
    excluded rather than dividing by zero (the q123 guard).

    Scale shape: one (type, hour) hash agg over the scan; the profile
    is a bounded |types| x 24 model (broadcast); scoring is a map-side
    join + filter.  Hourly sums round to 2 and profile moments to 6
    before the z computation, keeping the anomaly cut engine-agreed.
    """
    ev = table(spark, sf_dir, "events")
    mid = ev.agg(
        F.date_trunc(
            "hour",
            F.timestamp_micros(
                ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2).cast(
                    "long"
                )
            ),
        ).alias("mid")
    )
    hourly = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy(
            "event_type",
            F.date_trunc("hour", "ts").alias("h"),
            F.hour("ts").alias("hod"),
            "mid",
        )
        .agg(F.round(F.sum("value"), 2).alias("sv"))
        .withColumn("is_base", F.col("h") < F.col("mid"))
    )
    profile = (
        hourly.filter("is_base")
        .groupBy("event_type", "hod")
        .agg(
            F.round(F.avg("sv"), 6).alias("mu"),
            F.round(F.stddev_samp("sv"), 6).alias("sd"),
            F.count("*").alias("np"),
        )
        .filter((F.col("np") > 1) & (F.col("sd") > 0))
        .drop("np")
    )
    z = (F.col("sv") - F.col("mu")) / F.col("sd")
    return (
        hourly.filter(~F.col("is_base"))
        .join(F.broadcast(profile), ["event_type", "hod"])
        .filter(F.abs(z) > SEASONAL_Z)
        .select(
            "event_type",
            F.col("h").alias("hour"),
            F.col("sv").alias("sum_value"),
            dec(z, 4).alias("z"),
        )
    )


# ---------------------------------------------------------------------------
# q167 — conversion latency percentiles (first view -> first purchase)
# ---------------------------------------------------------------------------


@query(
    "q167_conversion_latency",
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS vt FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    p AS (
      SELECT v.user_id, MIN(e.ts) AS pt
      FROM v JOIN events e
        ON e.user_id = v.user_id AND e.ts > v.vt
      WHERE e.event_type = 'purchase'
      GROUP BY v.user_id),
    lat AS (
      SELECT (epoch_us(p.pt) - epoch_us(v.vt)) / 1000000.0 AS s
      FROM v JOIN p ON v.user_id = p.user_id)
    SELECT COUNT(*) AS n_converted,
           (ROUND(quantile_cont(s, 0.5), 4) + 0.0) AS p50_s,
           (ROUND(quantile_cont(s, 0.9), 4) + 0.0) AS p90_s,
           (ROUND(quantile_cont(s, 0.99), 4) + 0.0) AS p99_s
    FROM lat
    """,
)
def q167_conversion_latency(
    spark: SparkSession, sf_dir: str, exact_audit: str = "auto"
) -> DataFrame:
    """Time-to-convert distribution: seconds from each user's FIRST
    view to their first purchase strictly after it, summarized as
    p50/p90/p99 — the latency dimension q77's funnel counts omit
    (how many convert vs how long conversion takes).

    Scale shape: two user-keyed min-aggregates and one user-keyed
    join — never an event-level self-join.  The percentile is a
    single-group exact aggregate over one latency row per converted
    user — corpus-bounded but not constant — so it takes the
    ``exact_audit`` gate (plans/helpers.py; auto keys on |events|):
    above the threshold the percentiles come from a deterministic
    md5-coin user sample while ``n_converted`` stays an exact count.
    NB the oracle contract: the DuckDB SQL computes full-data
    percentiles, so sampled mode (auto above EXACT_AUDIT_MAX_ROWS) is
    NOT hash-checkable — fine at the fixture-scale driver gate, but a
    large-SF CORRECTNESS run should pin exact_audit='exact' or expect
    latency-percentile drift.  Output is 1 row.
    """
    ev = table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("pu"), F.col("ts").alias("pt"))
        .join(v, (F.col("pu") == F.col("user_id")) & (F.col("pt") > F.col("vt")))
        .groupBy("user_id")
        .agg(F.min("pt").alias("pt"))
    )
    mode = resolve_exact_audit(
        exact_audit, lambda: cached_count(ev, f"{sf_dir}/events")
    )
    if mode == "sampled":
        frac = exact_audit_frac(cached_count(ev, f"{sf_dir}/events"))
        coin = md5_coin(F.col("user_id"), frac)
    else:
        coin = F.lit(True)
    lat = v.join(p, "user_id").select(
        F.when(coin, F.unix_micros("pt") - F.unix_micros("vt")).alias("us")
    )
    return lat.agg(
        F.count("*").alias("n_converted"),
        dec(F.expr("percentile(us / 1000000.0, 0.5)"), 4).alias("p50_s"),
        dec(F.expr("percentile(us / 1000000.0, 0.9)"), 4).alias("p90_s"),
        dec(F.expr("percentile(us / 1000000.0, 0.99)"), 4).alias("p99_s"),
    )


# ---------------------------------------------------------------------------
# q171 — weekly revenue with week-over-week growth
# ---------------------------------------------------------------------------


@query(
    "q171_wow_growth",
    oracle="""
    WITH w AS (
      SELECT date_trunc('week', ts) AS week,
             ROUND(SUM(value), 2) AS revenue,
             COUNT(*) AS n_events
      FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT week, (revenue + 0.0) AS revenue, n_events,
           (ROUND(revenue - LAG(revenue) OVER (ORDER BY week), 2) + 0.0)
             AS wow_delta,
           (ROUND((revenue - LAG(revenue) OVER (ORDER BY week))
                  / LAG(revenue) OVER (ORDER BY week), 6) + 0.0) AS wow_pct
    FROM w
    """,
)
def q171_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly purchase revenue with week-over-week delta and growth
    rate — the standard growth-reporting cut (q87's accounting at the
    revenue level).  First week reports null deltas rather than a
    fabricated zero.

    Scale shape: the corpus collapses to |weeks| rows in one pushed,
    map-side-combinable hash agg; the LAG window runs over that bounded
    table only (the q164 collapse-first discipline — the single-
    partition window is over the model, never the data).  Revenue
    rounds to 2 before the delta so both engines difference identical
    numbers.
    """
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = ev.groupBy(F.date_trunc("week", "ts").alias("week")).agg(
        F.round(F.sum("value"), 2).alias("revenue"),
        F.count("*").alias("n_events"),
    )
    prev = F.lag("revenue").over(W.orderBy("week"))
    return w.select(
        "week",
        "revenue",
        "n_events",
        dec(F.col("revenue") - prev, 2).alias("wow_delta"),
        dec((F.col("revenue") - prev) / prev, 6).alias("wow_pct"),
    )


# ---------------------------------------------------------------------------
# q176 — CUSUM change-point detection over daily event volume
# ---------------------------------------------------------------------------


@query(
    "q176_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, COUNT(*) AS n
      FROM events GROUP BY 1),
    m AS (SELECT ROUND(AVG(n), 6) AS mean_n FROM daily),
    dev AS (SELECT day, n, ROUND(n - mean_n, 6) AS dv FROM daily, m),
    cs AS (SELECT day, n,
                  ROUND(SUM(dv) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                    AS cusum
           FROM dev),
    rk AS (SELECT day, n, cusum,
                  ROW_NUMBER() OVER (ORDER BY ABS(cusum) DESC, day) AS r
           FROM cs)
    SELECT day, CAST(n AS BIGINT) AS n_events, (cusum + 0.0) AS cusum,
           r = 1 AS is_changepoint
    FROM rk
    """,
)
def q176_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily event volume: the
    cumulative sum of mean deviations S_i = Σ (n_j - mean) peaks (in
    absolute value) at the most likely level-shift day — the classic
    non-reset CUSUM statistic behind pipeline-regression and traffic-
    anomaly alarms, complementing q108's pointwise z-scores (which miss
    gradual shifts a cumulative statistic accumulates).

    Scale shape: the corpus collapses to |days| rows in one pushed hash
    agg; the global mean is a 1-row broadcast attach and the cumulative
    sum runs over the bounded day table only (collapse-first, q171).
    Deviations round to 6dp BEFORE the cumsum and the cusum to 4dp
    before the argmax ranking, so both engines accumulate and rank
    identical numbers (day tiebreak for the peak).
    """
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    m = daily.agg(F.round(F.avg("n"), 6).alias("mean_n"))
    dev = daily.crossJoin(F.broadcast(m)).select(
        "day", "n", F.round(F.col("n") - F.col("mean_n"), 6).alias("dv")
    )
    cum_w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    cs = dev.select(
        "day", "n", F.round(F.sum("dv").over(cum_w), 4).alias("cusum")
    )
    rk = F.row_number().over(W.orderBy(F.abs(F.col("cusum")).desc(), "day"))
    return cs.select(
        "day",
        F.col("n").cast("long").alias("n_events"),
        dec(F.col("cusum"), 4).alias("cusum"),
        (rk == 1).alias("is_changepoint"),
    )


# ---------------------------------------------------------------------------
# q187 — window funnel (ordered stages within a time budget of the start)
# ---------------------------------------------------------------------------

WF_WINDOW_S = 7200  # the whole chain must complete within 2h of the view


@query(
    "q187_window_funnel",
    oracle=f"""
    WITH v AS (SELECT user_id, MIN(ts) AS vt FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS ct
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.vt
            AND epoch_us(e.ts) - epoch_us(v.vt) <= CAST({WF_WINDOW_S} AS BIGINT) * 1000000
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS pt
          FROM events e
          JOIN v ON e.user_id = v.user_id
          JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.ct
            AND epoch_us(e.ts) - epoch_us(v.vt) <= CAST({WF_WINDOW_S} AS BIGINT) * 1000000
          GROUP BY e.user_id),
    depth AS (
      SELECT v.user_id,
             CASE WHEN p.user_id IS NOT NULL THEN 3
                  WHEN c.user_id IS NOT NULL THEN 2
                  ELSE 1 END AS funnel_depth
      FROM v
      LEFT JOIN c ON v.user_id = c.user_id
      LEFT JOIN p ON v.user_id = p.user_id)
    SELECT funnel_depth, COUNT(*) AS n_users
    FROM depth GROUP BY funnel_depth
    """,
)
def q187_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window funnel (the ClickHouse ``windowFunnel`` cut): how deep
    each user progresses through view -> click -> purchase where every
    later stage must happen strictly after the previous one AND within
    {WF_WINDOW_S}s of the user's first view — q77's ordered funnel
    measures eventual progression; this measures progression inside a
    time budget, the difference between "converts" and "converts in
    the session that started the journey".

    Scale shape: three user-keyed min-aggregates chained by user-keyed
    joins (never an event-level self-join), two left joins assemble
    the depth, and the output collapses to <= 3 rows.  The time-budget
    comparison is integer epoch microseconds on both engines (DuckDB's
    date_diff('second') truncation trap — see q100's discipline).
    """
    ev = table(spark, sf_dir, "events")
    budget_us = WF_WINDOW_S * 1_000_000
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("cu"), F.col("ts").alias("cts"))
        .join(v, F.col("cu") == v.user_id)
        .filter(
            (F.col("cts") > F.col("vt"))
            & (F.unix_micros("cts") - F.unix_micros("vt") <= budget_us)
        )
        .groupBy(F.col("cu").alias("user_id"))
        .agg(F.min("cts").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("pu"), F.col("ts").alias("pts"))
        .join(v, F.col("pu") == v.user_id)
        .join(c.select(F.col("user_id").alias("pcu"), "ct"), F.col("pu") == F.col("pcu"))
        .filter(
            (F.col("pts") > F.col("ct"))
            & (F.unix_micros("pts") - F.unix_micros("vt") <= budget_us)
        )
        .groupBy(F.col("pu").alias("user_id"))
        .agg(F.min("pts").alias("pt"))
    )
    depth = (
        v.join(c.select(F.col("user_id").alias("cu2")), v.user_id == F.col("cu2"), "left")
        .join(p.select(F.col("user_id").alias("pu2")), v.user_id == F.col("pu2"), "left")
        .select(
            F.when(F.col("pu2").isNotNull(), 3)
            .when(F.col("cu2").isNotNull(), 2)
            .otherwise(1)
            .cast("long")
            .alias("funnel_depth")
        )
    )
    return depth.groupBy("funnel_depth").agg(F.count("*").alias("n_users"))


# ---------------------------------------------------------------------------
# q190 — weekday-uniformity chi-square audit of event volume
# ---------------------------------------------------------------------------


@query(
    "q190_weekday_chisq",
    oracle="""
    WITH d AS (
      SELECT CAST(dayofweek(ts) AS BIGINT) AS dow, COUNT(*) AS n
      FROM events GROUP BY 1),
    t AS (SELECT SUM(n) AS total, COUNT(*) AS k FROM d)
    SELECT dow, n AS n_events,
           (ROUND(total * 1.0 / k, 4) + 0.0) AS expected,
           (ROUND((n - total * 1.0 / k) * (n - total * 1.0 / k)
                  / (total * 1.0 / k), 4) + 0.0) AS chisq_term,
           (ROUND(SUM((n - total * 1.0 / k) * (n - total * 1.0 / k)
                      / (total * 1.0 / k)) OVER (), 4) + 0.0) AS chisq_stat
    FROM d, t
    """,
)
def q190_weekday_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square goodness-of-fit of event volume against a uniform
    weekday distribution: per-weekday observed vs expected counts, the
    per-cell chi-square term, and the overall statistic (dof = 6) —
    the classic load-seasonality test behind capacity planning and
    synthetic-data sanity audits (a generator that forgot weekday
    seasonality shows chisq ~ 0; real traffic shows a huge one).

    Scale shape: the corpus collapses to <= 7 rows in one pushed hash
    agg; the totals attach is a 1-row broadcast and the statistic sums
    over the bounded weekday frame (allowlisted global window on <= 7
    rows).
    """
    ev = table(spark, sf_dir, "events")
    # Spark dayofweek is 1-7 Sunday-first; DuckDB's is 0-6 — align on 0-6
    d = ev.groupBy(
        (F.dayofweek("ts") - 1).cast("long").alias("dow")
    ).agg(F.count("*").alias("n"))
    t = d.agg(F.sum("n").alias("total"), F.count("*").alias("k"))
    exp = F.col("total") * 1.0 / F.col("k")
    term = (F.col("n") - exp) * (F.col("n") - exp) / exp
    full_w = W.partitionBy().rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    return d.crossJoin(F.broadcast(t)).select(
        "dow",
        F.col("n").alias("n_events"),
        dec(exp, 4).alias("expected"),
        dec(term, 4).alias("chisq_term"),
        dec(F.sum(term).over(full_w), 4).alias("chisq_stat"),
    )


# ---------------------------------------------------------------------------
# q224 — Fano-factor burstiness of daily event volume per type
# ---------------------------------------------------------------------------


@query(
    "q224_fano_burstiness",
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    span AS (
      SELECT date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
               + 1 AS dspan
      FROM events),
    m AS (
      SELECT event_type, SUM(n) AS se, SUM(n * n) AS sn2,
             COUNT(*) AS active_days
      FROM d GROUP BY 1)
    SELECT m.event_type,
           CAST(m.se AS BIGINT) AS n_events,
           CAST(m.active_days AS BIGINT) AS n_active_days,
           (ROUND(m.se * 1.0 / s.dspan, 4) + 0.0) AS mean_per_day,
           (ROUND((m.sn2 * 1.0 / s.dspan
                   - (m.se * 1.0 / s.dspan) * (m.se * 1.0 / s.dspan))
                  / (m.se * 1.0 / s.dspan), 4) + 0.0) AS fano
    FROM m CROSS JOIN span s
    """,
)
def q224_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion, var/mean of daily counts over
    the full calendar span, zero days included) per event type: ~1 for
    Poisson-like traffic, >>1 for bursty types — the bot/incident
    screen that flags a type whose volume arrives in spikes, and the
    overdispersion check that decides Poisson vs negative-binomial
    capacity models.

    Parity: the corpus collapses to the bounded (type, day) grid with
    integer counts; the zero-day-inclusive moments need only Σn, Σn²
    over ACTIVE days plus the global span (zeros contribute nothing),
    so variance and mean are single double expressions over exact
    integers with identical association order (the q203 rule); 4-dp
    rounds at the edge.

    Scale shape: one pushed hash agg to the (type, day) collapse, one
    to |types| rows, and a 1-row calendar-span broadcast attach.
    """
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    span = ev.agg(
        (
            F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))) + 1
        ).alias("dspan")
    )
    m = d.groupBy("event_type").agg(
        F.sum("n").alias("se"),
        F.sum(F.col("n") * F.col("n")).alias("sn2"),
        F.count("*").alias("active_days"),
    )
    mean = F.col("se") * 1.0 / F.col("dspan")
    return m.crossJoin(F.broadcast(span)).select(
        "event_type",
        F.col("se").cast("long").alias("n_events"),
        F.col("active_days").cast("long").alias("n_active_days"),
        dec(mean, 4).alias("mean_per_day"),
        dec(
            (F.col("sn2") * 1.0 / F.col("dspan") - mean * mean) / mean, 4
        ).alias("fano"),
    )


# ---------------------------------------------------------------------------
# q239 — cross-correlation lead-lag between event streams (hourly CCF)
# ---------------------------------------------------------------------------

CCF_MAX_LAG = 6  # hours each direction
CCF_X, CCF_Y = "click", "purchase"


def _q239_oracle() -> str:
    xb = "(g.sx * 1e0 / g.n)"
    yb = "(g.sy * 1e0 / g.n)"
    return f"""
    WITH hx AS MATERIALIZED (
      SELECT date_trunc('hour', ts) AS h,
             COUNT(*) FILTER (WHERE event_type = '{CCF_X}') AS x,
             COUNT(*) FILTER (WHERE event_type = '{CCF_Y}') AS y
      FROM events
      WHERE event_type IN ('{CCF_X}', '{CCF_Y}')
      GROUP BY 1),
    g AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * x) AS sxx, SUM(y * y) AS syy
          FROM hx),
    lagk AS (SELECT CAST(k AS BIGINT) AS k
             FROM range(-{CCF_MAX_LAG}, {CCF_MAX_LAG + 1}) t(k)),
    pr AS (
      SELECT l.k, COUNT(*) AS nk,
             SUM(a.x * b.y) AS sxy, SUM(a.x) AS sh, SUM(b.y) AS st
      FROM hx a
      CROSS JOIN lagk l
      JOIN hx b ON b.h = a.h + to_hours(CAST(l.k AS BIGINT))
      GROUP BY 1)
    SELECT pr.k AS lag_hours,
           CAST(pr.nk AS BIGINT) AS n_pairs,
           (ROUND((pr.sxy - {xb} * pr.st - {yb} * pr.sh
                   + pr.nk * {xb} * {yb})
                  / (sqrt(g.sxx - g.n * {xb} * {xb})
                     * sqrt(g.syy - g.n * {yb} * {yb})), 6) + 0.0) AS ccf
    FROM pr CROSS JOIN g
    ORDER BY lag_hours
    """


@query("q239_ccf_lead_lag", oracle=_q239_oracle())
def q239_ccf_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between the hourly {CCF_X} and
    {CCF_Y} volumes at lags ±{CCF_MAX_LAG} h: the lead-lag diagnostic
    ("do clicks lead purchases, and by how many hours?") behind
    attribution-window choices (q145/q207) and marketing-mix timing —
    q223's autocorrelation generalized to TWO series.

    Parity: both series collapse to the bounded hourly calendar with
    integer counts; global and per-lag moments are exact BIGINTs; the
    CCF is a single double expression over them (q223's discipline);
    6-dp edge round.

    Scale shape: ONE pushed hash agg to |hours| rows (both series in
    one pass via filtered counts), a (|hours| × lags) grid join on the
    bounded collapse, a 1-row moment attach.
    """
    ev = table(spark, sf_dir, "events")
    hx = (
        ev.filter(F.col("event_type").isin(CCF_X, CCF_Y))
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count(F.when(F.col("event_type") == CCF_X, 1)).alias("x"),
            F.count(F.when(F.col("event_type") == CCF_Y, 1)).alias("y"),
        )
    )
    g = hx.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    lags = spark.range(-CCF_MAX_LAG, CCF_MAX_LAG + 1).select(
        F.col("id").alias("k")
    )
    a = hx.select(F.col("h").alias("h1"), F.col("x").alias("xa"))
    b = hx.select(F.col("h").alias("h2"), F.col("y").alias("yb"))
    pr = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            F.col("h2")
            == F.col("h1") + F.make_interval(hours=F.col("k").cast("int")),
        )
        .groupBy("k")
        .agg(
            F.count("*").alias("nk"),
            F.sum(F.col("xa") * F.col("yb")).alias("sxy"),
            F.sum("xa").alias("sh"),
            F.sum("yb").alias("st"),
        )
    )
    xb = F.col("sx") * F.expr("1e0") / F.col("n")
    yb = F.col("sy") * F.expr("1e0") / F.col("n")
    return (
        pr.crossJoin(F.broadcast(g))
        .select(
            F.col("k").cast("long").alias("lag_hours"),
            F.col("nk").cast("long").alias("n_pairs"),
            dec(
                (
                    F.col("sxy")
                    - xb * F.col("st")
                    - yb * F.col("sh")
                    + F.col("nk") * xb * yb
                )
                / (
                    F.sqrt(F.col("sxx") - F.col("n") * xb * xb)
                    * F.sqrt(F.col("syy") - F.col("n") * yb * yb)
                ),
                6,
            ).alias("ccf"),
        )
        .orderBy("lag_hours")
    )


# ---------------------------------------------------------------------------
# q251 — sessionization inactivity-threshold sensitivity sweep
# ---------------------------------------------------------------------------

SESS_SWEEP_MINUTES = (5, 15, 30, 60, 120)


def _q251_oracle() -> str:
    rows = []
    for m in SESS_SWEEP_MINUTES:
        us = m * 60 * 1000000
        rows.append(f"""
    SELECT CAST({m} AS BIGINT) AS threshold_minutes,
           CAST(MAX(n_users) + SUM(CASE WHEN gap_us > {us} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sessions,
           (ROUND(MAX(n_events) * 1e0
                  / (MAX(n_users) + SUM(CASE WHEN gap_us > {us}
                                        THEN 1 ELSE 0 END)), 4) + 0.0)
             AS avg_events_per_session
    FROM g""")
    return f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS pt
      FROM events),
    g AS MATERIALIZED (
      SELECT COALESCE(t - pt, NULL) AS gap_us,
             (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
             (SELECT COUNT(*) FROM events) AS n_events
      FROM e)
    {' UNION ALL '.join(rows)}
    """


@query("q251_session_threshold_sweep", oracle=_q251_oracle())
def q251_session_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inactivity-threshold sensitivity of sessionization: for τ ∈
    {SESS_SWEEP_MINUTES} minutes, the session count is
    |users| + |gaps > τ| — computed for ALL thresholds from ONE gap
    pass, so the analyst reads the knee of the curve and picks the τ
    that q24 / ST12 should run with, instead of inheriting a folk
    constant.

    Parity: gaps in integer epoch-microseconds (the repo's
    date_diff-truncation rule), session counts are pure integer sums;
    one division per row.

    Scale shape: ONE user-partitioned LAG window over (user, ts), then
    a single aggregate whose per-threshold counts are filtered sums —
    the sweep costs exactly one sessionization, not five.
    """
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.lag(F.unix_micros("ts")).over(w).alias("pt"),
    )
    aggs = [
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    ]
    for m in SESS_SWEEP_MINUTES:
        us = m * 60 * 1000000
        aggs.append(
            F.sum(((F.col("t") - F.col("pt")) > us).cast("long")).alias(
                f"brk{m}"
            )
        )
    # one gap pass total: the 1-row moment aggregate is checkpointed,
    # so each sweep row reads it instead of re-running the window.
    g = local_checkpoint(e.agg(*aggs), "q251 gap moments")
    out = None
    for m in SESS_SWEEP_MINUTES:
        ns = F.col("n_users") + F.col(f"brk{m}")
        row = g.select(
            F.lit(m).cast("long").alias("threshold_minutes"),
            ns.cast("long").alias("n_sessions"),
            dec(F.col("n_events") * F.expr("1e0") / ns, 4).alias(
                "avg_events_per_session"
            ),
        )
        out = row if out is None else out.unionAll(row)
    return out
