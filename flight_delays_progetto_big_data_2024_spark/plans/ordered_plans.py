"""Order-dependent analytics queries: distributed prefix sums, interval
concurrency, weighted/robust order statistics, bitmap retention, SCD2
time travel.

The reference never needs global order (its frames fit in pandas —
SURVEY.md §2.5); at 100 TB "running total" / "peak concurrent sessions"
are exactly the queries that silently collapse to one task when written
as an unpartitioned window. Every plan here routes through
``operators/ordered.py``'s two-phase prefix sum or a per-group window,
and every one carries a full DuckDB value oracle (DuckDB CAN use the
single-threaded global window — it is the small-scale truth we verify
the distributed decomposition against).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_delays_progetto_big_data_2024_spark.operators.ordered import (
    max_concurrency,
    weighted_median,
    winsorize_bounds,
)
from flight_delays_progetto_big_data_2024_spark.operators.temporal import (
    scd2_from_changes,
    snapshot_as_of,
)
from flight_delays_progetto_big_data_2024_spark.plans.registry import register
from flight_delays_progetto_big_data_2024_spark.sources.readers import (
    Catalog,
    ensure_scan_width,
)


@register(
    "q129_scd2_snapshot_asof",
    sql="""
    WITH hist AS (
        SELECT user_id, value,
               row_number() OVER w AS version,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to
        -- undated changes are dropped (scd2_from_changes contract;
        -- q70's round-7 NULL-ts pair finding — mirrored here too)
        FROM events WHERE event_type = 'view' AND ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, version,
           round(value, 6) AS value,
           strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from
    FROM hist
    WHERE valid_from <= TIMESTAMP '2024-01-15 12:00:00'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 12:00:00')
    ORDER BY user_id
    """,
)
def q129_scd2_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the q70 SCD2 history: the dimension exactly as it
    stood at 2024-01-15 12:00 — one row per user then known, picked by
    ``snapshot_as_of``'s interval filter. The filter composes ONTO the
    scd2 window plan (no extra shuffle), and against a persisted history
    table it is a pushed-down predicate + partition prune."""
    cat = Catalog(spark, sf_dir)
    hist = scd2_from_changes(
        cat.events.filter(F.col("event_type") == "view"),
        keys=["user_id"],
        ts_col="ts",
        attrs=["value"],
        tiebreakers=["event_id"],
    )
    return (
        snapshot_as_of(hist, "2024-01-15 12:00:00")
        .select(
            "user_id",
            "version",
            F.round("value", 6).alias("value"),
            F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        )
        .orderBy("user_id")
    )


@register(
    "q130_daily_peak_concurrency",
    sql="""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 2 HOUR
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        -- undated rows have no timeline place (q41 rule): a user with
        -- ONLY NULL-ts events otherwise yields a NULL-endpoint session
        -- here that Spark's max_concurrency drops — one phantom
        -- NULL-day row (round-7 NULL-ts pair finding)
        WHERE ts IS NOT NULL
        -- event_id tiebreaker: with tied (user_id, ts) rows a ts-only
        -- sort can order the ties differently in this window vs the
        -- running-sum window below (unstable parallel sorts), landing
        -- the new_session=1 flag mid-tie and splitting a session
        -- (round-7 tie-probe finding on q41's twin decomposition)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_id
        FROM marked
    ),
    sessions AS (
        SELECT min(ts) AS start_ts, max(ts) AS end_ts
        FROM numbered GROUP BY user_id, session_id
    ),
    deltas AS (
        SELECT start_ts AS ts, 1 AS delta FROM sessions
        UNION ALL
        SELECT end_ts AS ts, -1 AS delta FROM sessions
    ),
    swept AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day,
               sum(delta) OVER (ORDER BY ts, -delta
                                ROWS UNBOUNDED PRECEDING) AS open_now
        FROM deltas
    )
    SELECT day, max(open_now)::BIGINT AS peak_concurrency
    FROM swept GROUP BY day ORDER BY day
    """,
)
def q130_daily_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneously-open sessions per day — the sweep-line +1/-1
    running sum, decomposed as a DISTRIBUTED prefix sum (per-day partial
    totals -> exclusive offsets over the tiny day aggregate -> within-day
    windows; operators/ordered.py) where the oracle uses DuckDB's
    single-threaded global window. Sessions are the q41 2-hour-gap
    sessionization; intervals count as closed at both ends (+1 sorts
    before -1 at equal timestamps), so zero-length sessions still
    register while open."""
    cat = Catalog(spark, sf_dir)
    # gaps-and-islands sessions with REAL first/last event timestamps
    # (F.session_window's window end is last+gap, not the last event, so
    # the generic operator isn't reused here); both windows are
    # partitioned by user — no global funnel.
    # (ts, event_id) total order: the flag window and the running-sum
    # window are TWO window evaluations — under tied (user_id, ts) rows
    # an unstable sort may permute the ties between them, landing the
    # new_session=1 flag mid-tie and splitting one session in two
    # (round-7 tie-probe finding; nondeterministic under executor load)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # undated rows have no timeline place (q41 rule) — dropped at the
    # scan in BOTH engines rather than relying on min/max NULL-skipping
    # plus max_concurrency's NULL-endpoint drop to coincide
    # gap compare in INTEGER microseconds (r9 ts-domain probe): double-
    # cast seconds are µs-blind past ~2^33 s (ulp ≈ 3.8 µs at year
    # 2260), merging a 2h+1µs gap the oracle's exact INTERVAL splits
    marked = cat.events.filter(F.col("ts").isNotNull()).select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
                > 7_200_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = (
        marked.withColumn("session_id", F.sum("new_session").over(wall))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"))
    )
    return max_concurrency(
        sessions,
        start_col="start_ts",
        end_col="end_ts",
        bucket=F.date_format("__ts", "yyyy-MM-dd"),
        bucket_name="day",
    ).withColumn("peak_concurrency", F.col("peak_concurrency").cast("long"))


@register(
    "q131_user_activity_bitmap",
    sql="""
    WITH masks AS (
        SELECT user_id,
               bit_or(1::BIGINT << date_diff('day', DATE '2024-01-01',
                                             CAST(ts AS DATE))) AS mask,
               count(*) AS n_events
        FROM events
        -- the bitmap's domain is day offsets 0..62 (bit 63 stays clear:
        -- DuckDB's signed shift traps on it) — an event outside the
        -- window, or with no timestamp, is outside the bitmap; a
        -- negative offset hard-errors DuckDB's shift and silently
        -- wraps mod 64 in Java (wave-5 finding)
        WHERE date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              BETWEEN 0 AND 62
        GROUP BY user_id
    )
    SELECT bit_count(mask)::BIGINT AS active_days,
           count(*) AS n_users,
           sum(CASE WHEN (mask & 127) <> 0 THEN 1 ELSE 0 END)::BIGINT
               AS active_first_week,
           round(avg(n_events), 4) AS avg_events
    FROM masks GROUP BY active_days ORDER BY active_days
    """,
)
def q131_user_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-bitmap retention: each user's January activity folds into
    ONE int64 (bit d = active on day d) via ``bit_or`` — the bitmap-index
    idiom that replaces 30 per-day distinct scans with one groupBy, and
    set algebra on cohorts (here "active in week 1") becomes a bitwise
    AND on the aggregate, not a join. Output: distribution of
    active-day counts. The mask travels engine-portably (same shifts in
    DuckDB)."""
    cat = Catalog(spark, sf_dir)
    day_idx = F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
    masks = (
        # bitmap domain = day offsets 0..62 (see oracle comment): a
        # negative offset silently wraps mod 64 in Java shiftleft —
        # garbage bits, not an error — and bit 63 is the DuckDB trap
        cat.events.select("user_id", day_idx.alias("__d"))
        .filter(F.col("__d").between(0, 62))
        .groupBy("user_id")
        .agg(
            F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), __d)")).alias("mask"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return (
        masks.groupBy(F.bit_count("mask").cast("long").alias("active_days"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(
                F.when(F.col("mask").bitwiseAND(F.lit(127)) != 0, 1).otherwise(0)
            ).alias("active_first_week"),
            F.round(F.avg("n_events"), 4).alias("avg_events"),
        )
        .orderBy("active_days")
    )


@register(
    "q132_weighted_median_price",
    sql="""
    WITH per_value AS (
        SELECT l_returnflag, l_extendedprice AS price,
               sum(l_quantity) AS w
        FROM lineitem GROUP BY l_returnflag, l_extendedprice
    ),
    cum AS (
        SELECT l_returnflag, price,
               sum(w) OVER (PARTITION BY l_returnflag ORDER BY price
                            ROWS UNBOUNDED PRECEDING) AS cw,
               sum(w) OVER (PARTITION BY l_returnflag) AS tw
        FROM per_value
    )
    SELECT l_returnflag,
           round(min(price), 2) AS weighted_median
    FROM cum WHERE cw * 2 >= tw
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q132_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag (lower weighted
    median: smallest price whose cumulative quantity reaches half the
    total). Ties aggregate away BEFORE the window (groupBy price), so
    the cumulative window runs over distinct prices per group — both
    deterministic and far smaller than the fact table
    (operators/ordered.py::weighted_median)."""
    cat = Catalog(spark, sf_dir)
    return (
        weighted_median(
            cat.lineitem,
            value_col="l_extendedprice",
            weight_col="l_quantity",
            group_cols=["l_returnflag"],
        )
        .select(
            "l_returnflag",
            F.round("weighted_median", 2).alias("weighted_median"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q136_winsorized_price_stats",
    sql="""
    WITH li AS (
        -- NaN is not a measurement: it sorts above every real value in
        -- both engines but poisons quantile interpolation and the
        -- greatest/least clamp differently (wave-5 finding). NULLs stay:
        -- both engines skip them consistently in avg/percentile.
        -- coalesce: keep NULL prices (both engines' avg/percentile
        -- skip them) — Spark isnan(NULL)=false keeps them, DuckDB
        -- NOT isnan(NULL)=NULL would drop them
        SELECT * FROM lineitem
        WHERE coalesce(NOT isnan(l_extendedprice), TRUE)
    ),
    bounds AS (
        SELECT quantile_cont(l_extendedprice, 0.01) AS lo,
               quantile_cont(l_extendedprice, 0.99) AS hi
        FROM li
    )
    SELECT l_linestatus,
           round(avg(l_extendedprice), 4) AS avg_raw,
           round(avg(least(greatest(l_extendedprice, lo), hi)), 4)
               AS avg_winsorized,
           sum(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END)::BIGINT
               AS n_clipped_low,
           sum(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END)::BIGINT
               AS n_clipped_high
    FROM li, bounds
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q136_winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p01/p99-clipped) price means per line status — the
    outlier-robust preprocessing standard before averaging heavy-tailed
    values. The clip bounds are ONE exact-percentile aggregate broadcast
    to every row (no collect, COVERAGE S6); at fact scale swap
    ``percentile_approx`` into winsorize_bounds (same shape, sketch
    merge instead of exact sort)."""
    cat = Catalog(spark, sf_dir)
    # ensure_scan_width (round-12): F.percentile's partial aggregate
    # buffers every value of its input partition — one task held all
    # 600k prices on the narrow scan (4.0s -> 3.1s at sf0.1); exact
    # percentiles are partitioning-invariant, and the avg round-trip
    # was re-verified against the oracle. No-op at scale.
    # Round-13 (r12 advisor): filter BEFORE the guard so the isnan
    # predicate pushes to the parquet scan and NaN rows never pay the
    # repartition shuffle. (isnan: see oracle)
    li = ensure_scan_width(
        cat.lineitem.filter(~F.isnan("l_extendedprice")), "l_orderkey"
    )
    with_bounds = winsorize_bounds(li, "l_extendedprice", 0.01, 0.99)
    price = F.col("l_extendedprice")
    return (
        with_bounds.groupBy("l_linestatus")
        .agg(
            F.round(F.avg(price), 4).alias("avg_raw"),
            F.round(
                F.avg(F.least(F.greatest(price, F.col("__lo")), F.col("__hi"))), 4
            ).alias("avg_winsorized"),
            F.sum(F.when(price < F.col("__lo"), 1).otherwise(0)).alias(
                "n_clipped_low"
            ),
            F.sum(F.when(price > F.col("__hi"), 1).otherwise(0)).alias(
                "n_clipped_high"
            ),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q162_watermark_lag_profile",
    sql="""
    WITH delayed AS (
        -- the redelivery plant SATURATES in the top-500 arrival band:
        -- event_id + 500 is an int64 overflow there in BOTH engines
        -- (r9 id-domain probe: the largest multiple of 17 under
        -- LONG_MAX sits inside the band)
        SELECT ts, event_id,
               event_id + CASE WHEN event_id % 17 = 0
                               AND event_id <= 9223372036854775307
                               THEN 500 ELSE 0 END AS arrival
        FROM events
    ),
    arr AS (
        SELECT ts,
               max(ts) OVER (ORDER BY arrival, event_id
                             ROWS UNBOUNDED PRECEDING) AS hwm
        FROM delayed
    ),
    lat AS (
        SELECT date_diff('second', ts, hwm) AS lag_s FROM arr
    )
    SELECT CASE WHEN lag_s <= 0 THEN 'on-time'
                WHEN lag_s <= 600 THEN 'late<=10m'
                WHEN lag_s <= 3600 THEN 'late<=1h'
                WHEN lag_s <= 21600 THEN 'late<=6h'
                ELSE 'late>6h' END AS lateness,
           count(*) AS n_events
    FROM lat GROUP BY lateness ORDER BY lateness
    """,
)
def q162_watermark_lag_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-sizing profile: treating event_id as arrival order (the
    q99 convention), compute each event's lag behind the running
    HIGH-WATERMARK (max event time seen so far) and bucket the corpus
    into lateness bands — the table that tells you what
    ``withWatermark`` delay loses how much data. The synthetic corpus's
    arrival order is perfectly time-sorted, so (as with q128's planted
    PII) the disorder under measurement is PLANTED deterministically:
    every 17th event is redelivered 500 arrival slots late — saturating
    in the top-500 arrival band, where ``event_id + 500`` is an int64
    overflow in both engines (r9 id-domain probe). The running
    max is the distributed two-phase decomposition (operators.ordered.
    bucketed_running_max, bucketed on arrival ranges), never a global
    single-task window; the oracle uses DuckDB's global window."""
    from flight_delays_progetto_big_data_2024_spark.operators.ordered import (
        bucketed_running_max,
    )

    cat = Catalog(spark, sf_dir)
    # event time in INTEGER microseconds (r9 ts-domain probe: double-
    # cast seconds are µs-blind past ~2^33 s, and epoch-µs at year 2260
    # exceeds 2^53 so even a double µs count would be inexact)
    ev = cat.events.select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    ).withColumn(
        "arrival",
        F.col("event_id")
        + F.when(
            (F.col("event_id") % 17 == 0)
            & (F.col("event_id") <= 9223372036854775307),
            500,
        ).otherwise(0),
    ).withColumn("__b", F.floor(F.col("arrival") / 1000))
    hwm = bucketed_running_max(
        ev, ["arrival", "event_id"], "ts_us", "__b", out_col="hwm"
    )
    # date_diff('second', a, b) in DuckDB 1.0 is trunc(epoch(b)) -
    # trunc(epoch(a)) — truncation toward ZERO, not floor, at negative
    # pre-1970 epochs (measured: -0.5s -> +0.5s gives 0 where the floor
    # form gives 1; round-10 advisor). Spark's integral `div` is the
    # same trunc-toward-zero on all signs, so the plain division is
    # bit-parity with the oracle for fractional pre-epoch timestamps
    # too — the earlier pmod-floor form was parity-green only because
    # every planted pre-epoch timestamp is a whole second.
    lat = hwm.select(
        (F.expr("hwm div 1000000") - F.expr("ts_us div 1000000")).alias("lag_s")
    )
    band = (
        F.when(F.col("lag_s") <= 0, "on-time")
        .when(F.col("lag_s") <= 600, "late<=10m")
        .when(F.col("lag_s") <= 3600, "late<=1h")
        .when(F.col("lag_s") <= 21600, "late<=6h")
        .otherwise("late>6h")
    )
    return (
        lat.groupBy(band.alias("lateness"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("lateness")
    )
