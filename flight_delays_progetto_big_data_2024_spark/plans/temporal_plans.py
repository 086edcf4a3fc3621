"""Temporal + ANN queries: session windows, sliding windows, as-of
join, IVF similarity search, percentile profiling.

None of these exist in the reference (SURVEY.md §2.9); they're the
event-pipeline / training-data operators a Spark engine at scale must
carry. Every one is SQL-expressible, so each gets a full value-hash
oracle: sessions via gaps-and-islands, the as-of join via DuckDB's
native ASOF JOIN, IVF via deterministic centroids (lowest ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flight_delays_progetto_big_data_2024_spark.operators.similarity import ivf_topk
from flight_delays_progetto_big_data_2024_spark.operators.relational import (
    popular_groups,
)
from flight_delays_progetto_big_data_2024_spark.operators.temporal import (
    asof_join,
    range_join_buckets,
    scd2_from_changes,
    session_windows,
)
from flight_delays_progetto_big_data_2024_spark.plans.registry import register
from flight_delays_progetto_big_data_2024_spark.sources.readers import Catalog
from flight_delays_progetto_big_data_2024_spark.streaming.windowed import (
    sliding_counts,
)


@register(
    "q41_user_session_windows",
    sql="""
    WITH marked AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 2 HOUR
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        -- F.session_window assigns NO session to a NULL event time
        -- (wave-5 dirty-corpus finding)
        WHERE ts IS NOT NULL
        -- event_id tiebreaker: the two-window decomposition is only
        -- sort-stable under a TOTAL order — with tied (user_id, ts)
        -- rows, a ts-only sort may order the ties differently in the
        -- flag window vs the running-sum window (parallel sorts are
        -- unstable), landing the new_session=1 flag mid-tie and
        -- splitting one session in two (round-7 tie-probe finding;
        -- flaked under load, 825 vs 826 sessions)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_id
        FROM marked
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS num_events,
           round(sum(value), 4) AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def q41_user_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (2h) per user via native ``F.session_window``
    — the oracle proves the gaps-and-islands equivalence."""
    cat = Catalog(spark, sf_dir)
    return session_windows(cat.events, gap="2 hours").orderBy(
        "user_id", "session_start"
    )


@register(
    "q42_sliding_window_traffic",
    sql="""
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS num_events,
           round(avg(value), 6) AS avg_value
    FROM (
        SELECT value, date_trunc('hour', ts) - i * INTERVAL 1 HOUR AS ws
        FROM events, unnest([0, 1]) AS t(i)
        WHERE ts IS NOT NULL  -- F.window drops NULL event times
    )
    GROUP BY ws
    ORDER BY window_start
    """,
)
def q42_sliding_window_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding every hour (each event in 2 windows) —
    ``F.window(ts, '2 hours', '1 hour')``; epoch alignment makes the
    unnest-based SQL exactly equivalent."""
    cat = Catalog(spark, sf_dir)
    return sliding_counts(cat.events, "2 hours", "1 hour").orderBy("window_start")


@register(
    "q43_purchase_asof_last_click",
    sql="""
    SELECT a.event_id,
           a.user_id,
           a.value,
           b.value AS value_click,
           strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS ts_click
    FROM (SELECT * FROM events WHERE event_type = 'purchase') a
    ASOF LEFT JOIN (
        -- tie-free right side: DuckDB ASOF picks an ARBITRARY row among
        -- duplicate (user_id, ts); pre-aggregating makes the oracle
        -- deterministic. The Spark side needs NO mirror groupBy:
        -- asof_join tie-breaks equal (key, ts) right rows by greatest
        -- carried struct = (value, ts) with ts equal = max(value) —
        -- the same row this aggregate selects.
        SELECT user_id, ts, max(value) AS value
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ) b
        ON a.user_id = b.user_id AND a.ts >= b.ts
    ORDER BY a.event_id
    """,
)
def q43_purchase_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase picks up the same user's most
    recent click at-or-before it (union + forward-fill idiom — one
    shuffle, no theta-join blow-up; operators.temporal.asof_join).
    Hash-checked against DuckDB's native ASOF JOIN.

    Round-13: the click side feeds asof_join RAW. The former mirror
    ``groupBy(user_id, ts).agg(max(value))`` was redundant — asof_join
    documents that equal (key, ts) right rows tie-break by GREATEST
    carried struct, and the carry is (value, ts_click) with ts_click
    equal inside a tie, so the forward-fill already selects exactly the
    max-value click (NULL value sorts below any value in struct order,
    matching max()'s NULL-skipping). Dropping the aggregate removes an
    Exchange + two HashAggregates — one less shuffle of the click
    stream at any scale (guide §2.4)."""
    cat = Catalog(spark, sf_dir)
    ev = cat.events
    joined = asof_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
        on=["user_id"],
        ts_col="ts",
        right_cols=["value"],
        suffix="_click",
    )
    return joined.select(
        "event_id",
        "user_id",
        "value",
        "value_click",
        F.date_format("ts_click", "yyyy-MM-dd HH:mm:ss").alias("ts_click"),
    ).orderBy("event_id")


_IVF_SQL = """
    WITH n AS (
        -- similarity._prep mirror: defined-cosine subspace only. The
        -- inner WHERE runs before the dot product (DuckDB's vectorized
        -- list_inner_product hard-errors when a chunk carries a NULL
        -- list); isfinite then drops zero/NaN/Inf norms, matching the
        -- Spark-side filter exactly (wave-5 dirty-corpus finding).
        SELECT vec_id, v, nrm FROM (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   -- norm via transform+sum, NOT list_dot_product: DuckDB's
               -- vectorized list_inner_product evaluates over the whole
               -- chunk and hard-errors on a NULL list in a row the WHERE
               -- already deselected; the lambda form is NULL-safe under
               -- any evaluation order (and bitwise-identical on valid
               -- rows — same left-to-right accumulation)
               sqrt(list_aggregate(list_transform(embedding::DOUBLE[],
                    x -> x * x), 'sum')) AS nrm
            FROM embeddings
            WHERE embedding IS NOT NULL
              AND len(embedding) > 0
              AND len(list_filter(embedding, x -> x IS NULL)) = 0
        ) WHERE isfinite(nrm) AND nrm > 0
    ),
    cent AS (
        SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n ORDER BY vec_id LIMIT 16
    ),
    assigned AS (
        -- len(n.v) = len(cv) rides the JOIN (round-10 dimension probe,
        -- pair-level domain): a vector outside its centroid's
        -- dimension has an undefined csim — Spark's struct filter
        -- leaves it an empty cell array (NULL cell, joins nothing)
        -- and the dot here would RAISE in DuckDB
        SELECT vec_id, v, nrm, cid FROM (
            SELECT n.vec_id, n.v, n.nrm, cent.cid,
                   row_number() OVER (
                       PARTITION BY n.vec_id
                       ORDER BY round(list_dot_product(n.v, cv) / (n.nrm * cn), 6) DESC,
                                cid
                   ) AS rn
            FROM n JOIN cent ON len(n.v) = len(cv)
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id AS query_id, v AS qv, nrm AS qn, cid FROM (
            SELECT n.vec_id, n.v, n.nrm, cent.cid,
                   row_number() OVER (
                       PARTITION BY n.vec_id
                       ORDER BY round(list_dot_product(n.v, cv) / (n.nrm * cn), 6) DESC,
                                cid
                   ) AS rn
            FROM n JOIN cent ON len(n.v) = len(cv)
            WHERE n.vec_id < 5
        ) WHERE rn <= 4
    ),
    scored AS (
        SELECT p.query_id, a.vec_id AS candidate_id,
               round(list_dot_product(p.qv, a.v) / (p.qn * a.nrm), 6) AS cosine
        FROM probes p JOIN assigned a
          ON p.cid = a.cid AND len(p.qv) = len(a.v)
        WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, candidate_id, cosine, CAST(rnk AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, candidate_id
        ) AS rnk FROM scored
    ) WHERE rnk <= 5
"""


@register("q44_embedding_ivf_topk", sql=_IVF_SQL)
def q44_embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 for queries vec_id<5: 16 deterministic
    centroids, 4-cell probing, exact re-rank within probed cells
    (operators.similarity.ivf_topk). Fully value-hash-checked because
    centroid choice and tie-breaks are deterministic."""
    cat = Catalog(spark, sf_dir)
    emb = cat.embeddings
    return ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5, n_cells=16, n_probe=4
    ).select("query_id", "candidate_id", "cosine", "rank")


@register(
    "q45_event_value_percentiles",
    sql="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75,
           round(quantile_cont(value, 0.95), 6) AS p95
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q45_event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per event type (the
    profiling pass; swap ``percentile_approx`` in at 100 TB — same
    call shape, sketch-merged instead of exact)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.events.groupBy("event_type")
        .agg(
            *[
                F.round(F.percentile("value", F.lit(p)), 6).alias(name)
                for p, name in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.95, "p95")]
            ]
        )
        .orderBy("event_type")
    )


@register(
    "q69_promo_window_shipments",
    sql="""
    WITH monthly AS (
        SELECT date_trunc('month', o_orderdate) AS month_start,
               count(*) AS num_orders
        FROM orders GROUP BY month_start
    ),
    promo AS (
        SELECT month_start - INTERVAL 3 DAY AS w_start,
               month_start + INTERVAL 10 DAY AS w_end
        FROM (
            SELECT month_start, num_orders,
                   avg(num_orders) OVER () AS avg_orders
            FROM monthly
        ) WHERE num_orders > avg_orders
    )
    SELECT strftime(p.w_start, '%Y-%m-%d') AS promo_start,
           count(*) AS num_items,
           round(sum(l.l_quantity), 2) AS sum_qty
    FROM lineitem l
    JOIN promo p ON l.l_shipdate >= p.w_start AND l.l_shipdate < p.w_end
    GROUP BY promo_start
    ORDER BY promo_start
    """,
)
def q69_promo_window_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment (range) join with NO equi key: lineitems
    shipped inside 'promo windows' (3 days before to 10 days after the
    start of above-average order months). The oracle states it as a
    theta join; the Spark plan uses operators.temporal.range_join_buckets
    — day buckets turn it into an equi-join on bucket + exact residual
    filter, so it hash-joins (and survives both sides being huge)
    instead of falling back to a broadcast nested loop."""
    cat = Catalog(spark, sf_dir)
    monthly = cat.orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month_start")
    ).agg(F.count(F.lit(1)).alias("num_orders"))
    promo = popular_groups(monthly, "num_orders").select(
        F.expr("month_start - INTERVAL 3 DAYS").alias("w_start"),
        F.expr("month_start + INTERVAL 10 DAYS").alias("w_end"),
    )
    matched = range_join_buckets(
        cat.lineitem.select("l_shipdate", "l_quantity"),
        promo,
        ts_col="l_shipdate",
        start_col="w_start",
        end_col="w_end",
        bucket_seconds=86400,
        broadcast_intervals=True,
    )
    return (
        matched.groupBy(
            F.date_format("w_start", "yyyy-MM-dd").alias("promo_start")
        )
        .agg(
            F.count(F.lit(1)).alias("num_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("promo_start")
    )


@register(
    "q70_user_value_scd2",
    sql="""
    WITH hist AS (
        SELECT user_id, value,
               row_number() OVER w AS version,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to
        -- undated changes are dropped (scd2_from_changes contract):
        -- without this mirror, a NULL-ts change sorts LAST here
        -- (DuckDB) and fabricates an extra trailing version the Spark
        -- side never builds (round-7 NULL-ts pair finding)
        FROM events WHERE event_type = 'view' AND ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT version,
           count(*) AS n_rows,
           sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_current,
           round(avg(date_diff('microsecond', valid_from, valid_to)
                     / 3600000000.0), 4) AS avg_hours_valid,
           round(avg(value), 6) AS avg_value
    FROM hist GROUP BY version ORDER BY version
    """,
)
def q70_user_value_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from a change log (view events as
    per-user attribute updates): operators.temporal.scd2_from_changes
    assigns valid_from/valid_to/version in ONE window (one shuffle on
    user_id, no self-join), then the rollup reports per-version counts
    and validity durations. event_id tie-breaks simultaneous changes so
    version numbering is deterministic in both engines."""
    cat = Catalog(spark, sf_dir)
    hist = scd2_from_changes(
        cat.events.filter(F.col("event_type") == "view"),
        keys=["user_id"],
        ts_col="ts",
        attrs=["value"],
        tiebreakers=["event_id"],
    )
    # exact integer-µs duration, ONE float division — mirrors the
    # oracle's date_diff('microsecond', ...)/3.6e9 bit-for-bit (r9
    # ts-domain probe: double-cast seconds lose µs at far-future
    # epochs); the timestamp cast is lossless under the UTC session
    hours = (
        F.unix_micros(F.col("valid_to").cast("timestamp"))
        - F.unix_micros(F.col("valid_from").cast("timestamp"))
    ) / 3_600_000_000.0
    return (
        hist.groupBy("version")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("is_current").cast("int")).alias("n_current"),
            F.round(F.avg(hours), 4).alias("avg_hours_valid"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("version")
    )


@register(
    "q90_daily_user_retention",
    sql="""
    WITH active AS (
        SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day, user_id FROM events
    ),
    counts AS (SELECT day, count(*) AS dau FROM active GROUP BY day),
    retained AS (
        SELECT a.day, count(*) AS returned
        FROM active a
        JOIN active b ON b.user_id = a.user_id
                     AND b.day = strftime(strptime(a.day, '%Y-%m-%d')
                                          + INTERVAL 1 DAY, '%Y-%m-%d')
        GROUP BY a.day
    )
    SELECT c.day, c.dau,
           coalesce(r.returned, 0) AS returned_next_day,
           round(coalesce(r.returned, 0) * 1.0 / c.dau, 6) AS retention
    FROM counts c LEFT JOIN retained r USING (day)
    ORDER BY day
    """,
)
def q90_daily_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-day retention: of each day's active users, the share active
    again the following day. The self-join runs on the DISTINCT
    (day, user) relation — events collapse first, so the join input is
    DAU-sized, not event-sized; both sides share the user_id shuffle
    key."""
    cat = Catalog(spark, sf_dir)
    active = cat.events.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "user_id"
    ).distinct()
    counts = active.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    a = active.select(
        "day",
        F.date_format(F.date_add(F.to_date("day"), 1), "yyyy-MM-dd").alias(
            "day_next"
        ),
        "user_id",
    )
    b = active.select(
        F.col("day").alias("day_b"), F.col("user_id").alias("user_b")
    )
    retained = (
        a.join(
            b,
            (a["user_id"] == b["user_b"]) & (b["day_b"] == a["day_next"]),
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("returned"))
    )
    return (
        counts.join(retained, "day", "left")
        .select(
            "day",
            "dau",
            F.coalesce("returned", F.lit(0)).alias("returned_next_day"),
            F.round(
                F.coalesce("returned", F.lit(0)) / F.col("dau"), 6
            ).alias("retention"),
        )
        .orderBy("day")
    )


@register(
    "q91_trailing_week_order_volume",
    sql="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
               count(*) AS n_orders,
               -- NaN -> NULL: a corrupt price must not poison the
               -- trailing window (sum/avg skip NULL identically in
               -- both engines; NaN propagation differs across frames)
               sum(CASE WHEN isnan(o_totalprice) THEN NULL
                        ELSE o_totalprice END) AS day_value
        FROM orders
        WHERE o_orderdate IS NOT NULL  -- undated orders have no day
        GROUP BY day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n_orders,
           CAST(sum(n_orders) OVER w AS BIGINT) AS trailing_7d_orders,
           round(avg(day_value) OVER w, 4) AS trailing_7d_avg_value
    FROM daily
    WINDOW w AS (ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                                        AND CURRENT ROW)
    ORDER BY day
    """,
)
def q91_trailing_week_order_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day order volume via a RANGE window frame (value-based,
    unlike q51's ROWS frame): days missing from the data contribute
    nothing, so a gap does NOT stretch the window — the semantics ROWS
    frames get wrong. Runs post-aggregation over one row per day
    (module docstring of reshape_plans re the global-window caveat)."""
    from pyspark.sql.window import Window

    cat = Catalog(spark, sf_dir)
    daily = (
        cat.orders.filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.to_date(F.date_trunc("day", "o_orderdate")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # NaN -> NULL so the corrupt measurement skips the window
            # aggregate instead of poisoning 7 days of trailing avg
            F.sum(
                F.when(~F.isnan("o_totalprice"), F.col("o_totalprice"))
            ).alias("day_value"),
        )
    )
    # RANGE frame needs a numeric/date ordering expression: days since
    # epoch makes the 6-preceding bound mean "6 calendar days"
    w = (
        Window.orderBy(F.unix_date("day"))
        .rangeBetween(-6, Window.currentRow)
    )
    return (
        daily.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_orders",
            F.sum("n_orders").over(w).alias("trailing_7d_orders"),
            F.round(F.avg("day_value").over(w), 4).alias("trailing_7d_avg_value"),
        )
        .orderBy("day")
    )


@register(
    "q92_event_type_transitions",
    sql="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
        -- no timestamp, no sequence position (Spark orders NULL ts
        -- FIRST, DuckDB LAST — the transition direction would differ)
        WHERE ts IS NOT NULL
    )
    SELECT prev_type, event_type AS next_type,
           count(*) AS n_transitions,
           round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY prev_type), 6)
               AS p_next_given_prev
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    ORDER BY prev_type, next_type
    """,
)
def q92_event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: P(next event type |
    previous) per user sequence. One lag window partitioned by user
    (event_id tiebreak for simultaneous events), then a count aggregate
    and a per-prev-type normalizing window over the 25-row matrix —
    never over raw events."""
    from pyspark.sql.window import Window

    cat = Catalog(spark, sf_dir)
    seq = (
        cat.events.filter(F.col("ts").isNotNull())  # no ts, no position
        .select(
            "user_id",
            "event_type",
            F.lag("event_type")
            .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
            .alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    norm = Window.partitionBy("prev_type")
    return (
        counts.withColumn(
            "p_next_given_prev",
            F.round(
                F.col("n_transitions") / F.sum("n_transitions").over(norm), 6
            ),
        )
        .orderBy("prev_type", "next_type")
    )


@register(
    "q99_out_of_order_arrivals",
    sql="""
    WITH seq AS (
        SELECT user_id,
               CASE WHEN ts < lag(ts) OVER (
                   PARTITION BY user_id ORDER BY event_id
               ) THEN 1 ELSE 0 END AS ooo
        FROM events
    )
    SELECT CAST(sum(ooo) AS BIGINT) AS out_of_order_events,
           count(*) AS total_events,
           round(sum(ooo) * 1.0 / count(*), 6) AS ooo_ratio
    FROM seq
    """,
)
def q99_out_of_order_arrivals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder diagnostic: per user, how often does event
    time step BACKWARDS along the arrival sequence (event_id as arrival
    order)? This ratio is what sizes streaming watermarks — a watermark
    shorter than the observed disorder horizon silently drops data
    (streaming.windowed docstring). One lag window on the user
    partition, then a global 1-row rollup."""
    from pyspark.sql.window import Window

    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = cat.events.select(
        F.when(F.col("ts") < F.lag("ts").over(w), 1).otherwise(0).alias("ooo")
    )
    return seq.agg(
        F.sum("ooo").cast("long").alias("out_of_order_events"),
        F.count(F.lit(1)).alias("total_events"),
        F.round(F.sum("ooo") / F.count(F.lit(1)), 6).alias("ooo_ratio"),
    )


@register(
    "q106_mad_outlier_detection",
    sql="""
    WITH med AS (
        SELECT event_type, median(value) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           round(any_value(d.med), 6) AS median_value,
           round(any_value(m.mad), 6) AS mad,
           CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
           count(*) AS n_total
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
)
def q106_mad_outlier_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation (immune to
    the outliers themselves, unlike z-scores): two aggregate passes
    (median, then median of absolute deviations) with the per-group
    medians applied through broadcastable joins — the exact-percentile
    form; at fact scale both medians swap to percentile_approx with the
    same plan shape."""
    cat = Catalog(spark, sf_dir)
    med = cat.events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = cat.events.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.any_value("med"), 6).alias("median_value"),
            F.round(F.any_value("mad"), 6).alias("mad"),
            F.sum(F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .orderBy("event_type")
    )


@register(
    "q107_time_to_convert_percentiles",
    sql="""
    WITH v AS (
        SELECT user_id, min(ts) AS first_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS first_purchase
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts >= v.first_view
        GROUP BY e.user_id
    )
    SELECT count(*) AS n_converted,
           round(quantile_cont(date_diff('microsecond', v.first_view,
                                         p.first_purchase) / 3600000000.0,
                               0.50), 4) AS p50_hours,
           round(quantile_cont(date_diff('microsecond', v.first_view,
                                         p.first_purchase) / 3600000000.0,
                               0.90), 4) AS p90_hours
    FROM p JOIN v USING (user_id)
    """,
)
def q107_time_to_convert_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: per user, first view to first
    subsequent purchase; p50/p90 of the gap in hours. The funnel joins
    stay keyed on user_id (q81's shape); the latency percentile is one
    exact aggregate over the converted-user relation."""
    cat = Catalog(spark, sf_dir)
    ev = cat.events
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    # exact integer-µs latency, ONE float division (mirrors the
    # oracle's date_diff('microsecond', ...)/3.6e9 — see q70)
    hours = (
        F.unix_micros(F.col("first_purchase").cast("timestamp"))
        - F.unix_micros(F.col("first_view").cast("timestamp"))
    ) / 3_600_000_000.0
    return (
        p.join(v, "user_id")
        .select(hours.alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.round(F.percentile("h", F.lit(0.5)), 4).alias("p50_hours"),
            F.round(F.percentile("h", F.lit(0.9)), 4).alias("p90_hours"),
        )
    )


@register(
    "q118_corpus_merge_upsert",
    sql="""
    WITH chg AS (
        SELECT doc_id, text, lang, source, n_chars, 'delete' AS op
        FROM documents WHERE doc_id % 11 = 0
        UNION ALL
        SELECT doc_id, upper(text), lang, source, n_chars, 'upsert'
        FROM documents WHERE doc_id % 7 = 0 AND doc_id % 11 <> 0
        UNION ALL
        SELECT doc_id + 1000000, text, lang, 'ingest_batch', n_chars, 'upsert'
        FROM documents WHERE doc_id % 13 = 0
    ),
    merged AS (
        SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
        FROM documents d ANTI JOIN chg c ON d.doc_id = c.doc_id
        UNION ALL
        SELECT doc_id, text, lang, source, n_chars FROM chg WHERE op <> 'delete'
    )
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(len(text))::BIGINT AS sum_chars,
           sum(CASE WHEN text = upper(text) THEN 1 ELSE 0 END)::BIGINT AS n_upper
    FROM merged GROUP BY source ORDER BY source
    """,
)
def q118_corpus_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental snapshot maintenance — the Delta/Iceberg MERGE INTO
    shape as pure DataFrame ops (operators.temporal.merge_upsert): a
    deterministic CDC batch (deletes doc_id%11, uppercasing updates
    doc_id%7, appends doc_id%13 under a new source) applies to the
    documents snapshot in one anti-join + union pass; the per-source
    profile of the merged snapshot is the value probe. At 100 TB the
    snapshot lives bucketed by doc_id so the anti-join is
    shuffle-free per batch.

    Domain note (round-9 id audit): the synthesized-id namespace
    ``doc_id + 1_000_000`` assumes appended ids fit int64; an id inside
    the top 1e6 of the space that lands on the %13 branch overflows
    LOUDLY and identically in both engines (Spark ANSI raises, DuckDB
    raises — no silent divergence), which is the intended behavior for
    an id-namespace collision. The planted LONG_MIN/LONG_MAX probes sit
    on other branches (%13 remainders -8 and 7) by construction."""
    from flight_delays_progetto_big_data_2024_spark.operators.temporal import (
        merge_upsert,
    )

    docs = Catalog(spark, sf_dir).documents
    deletes = docs.filter(F.col("doc_id") % 11 == 0).withColumn("op", F.lit("delete"))
    updates = (
        docs.filter((F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 11 != 0))
        .withColumn("text", F.upper("text"))
        .withColumn("op", F.lit("upsert"))
    )
    inserts = (
        docs.filter(F.col("doc_id") % 13 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
        .withColumn("source", F.lit("ingest_batch"))
        .withColumn("op", F.lit("upsert"))
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    merged = merge_upsert(docs, changes, "doc_id")
    return (
        merged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("sum_chars"),
            F.sum(
                F.when(F.col("text") == F.upper("text"), 1).otherwise(0)
            ).alias("n_upper"),
        )
        .orderBy("source")
    )


@register(
    "q119_hourly_event_ohlc",
    sql="""
    SELECT DISTINCT
        date_trunc('hour', ts) AS bucket_hour,
        first_value(value) OVER w AS open,
        max(value) OVER w AS high,
        min(value) OVER w AS low,
        last_value(value) OVER w AS close,
        nth_value(value, 2) OVER w AS second_fill,
        count(*) OVER w AS volume
    FROM events
    WHERE ts IS NOT NULL  -- no event time, no bucket (F.window's rule)
    WINDOW w AS (
        PARTITION BY date_trunc('hour', ts)
        ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    ORDER BY bucket_hour
    """,
)
def q119_hourly_event_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC downsampling of the event value stream — the window
    VALUE-function surface (first_value/last_value/nth_value with an
    explicit unbounded ROWS frame; Spark's default frame for last_value
    stops at CURRENT ROW, the classic silent-wrong-answer). Ordering
    ties break on event_id so both engines pick identical rows. One
    shuffle on the hour bucket; the distinct collapses the per-row
    window output to one row per bucket."""
    from pyspark.sql.window import Window

    # no event time, no bucket — mirrors the F.window family (q39-q42)
    events = Catalog(spark, sf_dir).events.filter(F.col("ts").isNotNull())
    h = F.date_trunc("hour", F.col("ts"))
    w = (
        Window.partitionBy(h)
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        events.select(
            h.alias("bucket_hour"),
            F.first("value").over(w).alias("open"),
            F.max("value").over(w).alias("high"),
            F.min("value").over(w).alias("low"),
            F.last("value").over(w).alias("close"),
            F.nth_value("value", 2).over(w).alias("second_fill"),
            F.count(F.lit(1)).over(w).alias("volume"),
        )
        .distinct()
        .orderBy("bucket_hour")
    )


_EXACT_TOPK_SQL = """
    WITH n AS (
        -- similarity._prep mirror: defined-cosine subspace only. The
        -- inner WHERE runs before the dot product (DuckDB's vectorized
        -- list_inner_product hard-errors when a chunk carries a NULL
        -- list); isfinite then drops zero/NaN/Inf norms, matching the
        -- Spark-side filter exactly (wave-5 dirty-corpus finding).
        SELECT vec_id, v, nrm FROM (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   -- norm via transform+sum, NOT list_dot_product: DuckDB's
               -- vectorized list_inner_product evaluates over the whole
               -- chunk and hard-errors on a NULL list in a row the WHERE
               -- already deselected; the lambda form is NULL-safe under
               -- any evaluation order (and bitwise-identical on valid
               -- rows — same left-to-right accumulation)
               sqrt(list_aggregate(list_transform(embedding::DOUBLE[],
                    x -> x * x), 'sum')) AS nrm
            FROM embeddings
            WHERE embedding IS NOT NULL
              AND len(embedding) > 0
              AND len(list_filter(embedding, x -> x IS NULL)) = 0
        ) WHERE isfinite(nrm) AND nrm > 0
    ),
    q AS (SELECT * FROM n WHERE vec_id < 5),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS candidate_id,
               round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cosine
        -- same-dim pairs only (pair-level dimension domain, round-10)
        FROM q JOIN n c ON c.vec_id <> q.vec_id AND len(q.v) = len(c.v)
    )
    SELECT query_id, candidate_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, candidate_id
        ) AS rnk FROM scored
    ) WHERE rnk <= 5
"""


@register(
    "q120_ivf_recall_at_k",
    sql=f"""
    WITH exact AS ({_EXACT_TOPK_SQL}),
    approx AS (SELECT query_id, candidate_id FROM ({_IVF_SQL}) t)
    SELECT e.query_id,
           count(*)::BIGINT AS n_exact,
           sum(CASE WHEN a.candidate_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_hit,
           round(sum(CASE WHEN a.candidate_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS recall_at_5
    FROM exact e
    LEFT JOIN approx a
        ON a.query_id = e.query_id AND a.candidate_id = e.candidate_id
    GROUP BY e.query_id ORDER BY e.query_id
    """,
)
def q120_ivf_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN EVALUATION harness: recall@5 of the IVF index against exact
    brute-force ground truth, per query — the measurement loop every
    production ANN deployment needs before trusting an index config
    (n_cells/n_probe here). Both sides are deterministic, so the whole
    eval is value-hash-checked. At 100 TB ground truth comes from a
    query SAMPLE (exact top-k is one corpus pass per query batch —
    affordable for eval-sized query sets, never for all queries)."""
    from flight_delays_progetto_big_data_2024_spark.operators.similarity import (
        cosine_topk,
    )

    emb = Catalog(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=5).select("query_id", "candidate_id")
    approx = ivf_topk(emb, queries, k=5, n_cells=16, n_probe=4).select(
        "query_id", F.col("candidate_id").alias("hit_id")
    )
    joined = exact.join(
        approx,
        (exact["query_id"] == approx["query_id"])
        & (exact["candidate_id"] == approx["hit_id"]),
        "left",
    ).select(exact["query_id"], "candidate_id", "hit_id")
    return (
        joined.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(
                F.when(F.col("hit_id").isNotNull(), 1).otherwise(0)
            ).alias("n_hit"),
            F.round(
                F.sum(F.when(F.col("hit_id").isNotNull(), 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("recall_at_5"),
        )
        .orderBy("query_id")
    )
