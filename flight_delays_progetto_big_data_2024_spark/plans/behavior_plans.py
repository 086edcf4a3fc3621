"""Behavioral / market-basket / language-model analytics.

Classic warehouse analytics (RFM segmentation, co-purchase affinity)
plus the bigram upgrade of the q124 LM quality filter. All
value-checked; the scale notes are in each docstring — the common theme
is that every window here runs over an ENTITY-sized aggregate (users,
vocabulary, part pairs), never the raw fact stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flight_delays_progetto_big_data_2024_spark.functions.text import tokens
from flight_delays_progetto_big_data_2024_spark.plans.llm_plans import _TOKS_SQL
from flight_delays_progetto_big_data_2024_spark.plans.registry import register
from flight_delays_progetto_big_data_2024_spark.sources.readers import (
    Catalog,
    ensure_scan_width,
)


@register(
    "q140_bigram_surprisal",
    sql=f"""
    WITH pairs AS (
        SELECT doc_id, source,
               unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
        FROM (SELECT doc_id, source, {_TOKS_SQL} AS t FROM documents)
        WHERE len(t) >= 2
    ),
    dbc AS (
        SELECT doc_id, any_value(source) AS source, w1, w2,
               count(*) AS c_db
        FROM pairs GROUP BY doc_id, w1, w2
    ),
    bgc AS (SELECT w1, w2, sum(c_db) AS c_bg FROM dbc GROUP BY w1, w2),
    ctx AS (SELECT w1, sum(c_bg) AS c_ctx FROM bgc GROUP BY w1),
    doc_s AS (
        SELECT d.doc_id, any_value(d.source) AS source,
               round(sum(d.c_db * -ln(b.c_bg / c.c_ctx)) / sum(d.c_db), 6)
                   AS surprisal
        FROM dbc d
        JOIN bgc b ON b.w1 = d.w1 AND b.w2 = d.w2
        JOIN ctx c ON c.w1 = d.w1
        GROUP BY d.doc_id
    )
    SELECT source, count(*) AS n_docs,
           round(avg(surprisal), 6) AS avg_surprisal,
           round(max(surprisal), 6) AS max_surprisal
    FROM doc_s GROUP BY source ORDER BY source
    """,
)
def q140_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained BIGRAM-LM quality score (the model upgrade of q124's
    unigram filter): per-document mean -ln p(w_i | w_{i-1}) under the
    corpus's own bigram counts (unsmoothed — the LM scores the corpus it
    was counted from, so no zero events exist). Low = formulaic/
    boilerplate text, high = incoherent token soup; the curation gate
    uses both tails.

    Plan shape: the token stream collapses to (doc, bigram) counts in
    one pass (bigrams built as struct pairs — no string concat in the
    hot path); the bigram model and its context marginals are rollups of
    THAT count table; scoring joins run on count relations that are
    Zipf-bounded far below the corpus size. At 100 TB the bigram table
    still dwarfs the unigram one — bucket it by w1 so the model rollup
    and the scoring join co-locate."""
    docs = Catalog(spark, sf_dir).documents
    # ensure_scan_width (round-12): tokenize + zip + explode all sit
    # before the first groupBy exchange — single-task on the narrow
    # scan (3.1s -> 1.9s at sf0.1); no-op at scale
    toked = ensure_scan_width(docs, "doc_id").select(
        "doc_id", "source", tokens("text").alias("t")
    ).filter(F.size("t") >= 2)
    # bigrams as arrays_zip of two shifted slices — one codegen'd
    # expression (measured ~2x the per-element transform lambda, which
    # evaluates interpreted)
    pairs = toked.select(
        "doc_id",
        "source",
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.size("t") - 1).alias("w1"),
                F.slice("t", 2, F.size("t") - 1).alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", "source", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    dbc = (
        pairs.groupBy("doc_id", "w1", "w2")
        .agg(F.any_value("source").alias("source"), F.count(F.lit(1)).alias("c_db"))
        .persist()
    )
    bgc = dbc.groupBy("w1", "w2").agg(F.sum("c_db").alias("c_bg"))
    ctx = bgc.groupBy("w1").agg(F.sum("c_bg").alias("c_ctx"))
    doc_s = (
        dbc.join(bgc, ["w1", "w2"])
        .join(ctx, "w1")
        .groupBy("doc_id")
        .agg(
            F.any_value("source").alias("source"),
            F.round(
                F.sum(F.col("c_db") * -F.log(F.col("c_bg") / F.col("c_ctx")))
                / F.sum("c_db"),
                6,
            ).alias("surprisal"),
        )
    )
    return (
        doc_s.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("surprisal"), 6).alias("avg_surprisal"),
            F.round(F.max("surprisal"), 6).alias("max_surprisal"),
        )
        .orderBy("source")
    )


@register(
    "q142_copurchase_pairs",
    sql="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS support
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    ),
    top AS (
        SELECT * FROM pairs
        ORDER BY support DESC, part_a, part_b LIMIT 25
    )
    SELECT pa.p_name AS name_a, pb.p_name AS name_b, t.support
    FROM top t
    JOIN part pa ON pa.p_partkey = t.part_a
    JOIN part pb ON pb.p_partkey = t.part_b
    ORDER BY t.support DESC, name_a, name_b
    """,
)
def q142_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-purchase affinity: the 25 part pairs most often
    bought in the same order. The pair join is a SELF-join keyed on the
    order — its cost is Σ(items-per-order choose 2), bounded by the
    per-basket width (≤7 in TPC-H), never |lineitem|² — and the (order,
    part) distinct collapses multi-line duplicates map-side first. Part
    names decorate only the 25 survivors via broadcast."""
    cat = Catalog(spark, sf_dir)
    op = cat.lineitem.select("l_orderkey", "l_partkey").distinct()
    a = op.alias("a")
    b = op.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
    )
    top = pairs.orderBy(F.desc("support"), "part_a", "part_b").limit(25)
    names = cat.part.select("p_partkey", "p_name")
    return (
        top.join(
            F.broadcast(names.select(F.col("p_partkey").alias("part_a"),
                                     F.col("p_name").alias("name_a"))),
            "part_a",
        )
        .join(
            F.broadcast(names.select(F.col("p_partkey").alias("part_b"),
                                     F.col("p_name").alias("name_b"))),
            "part_b",
        )
        .select("name_a", "name_b", "support")
        .orderBy(F.desc("support"), "name_a", "name_b")
    )


@register(
    "q143_rfm_segments",
    sql="""
    WITH per_user AS (
        SELECT user_id, max(ts) AS last_ts,
               count(*) AS freq,
               round(sum(value), 6) AS monetary
        FROM events GROUP BY user_id
    ),
    tiled AS (
        -- every sort level pins its NULL order explicitly: Spark's
        -- defaults are ASC=NULLS FIRST / DESC=NULLS LAST while DuckDB
        -- defaults to NULLS LAST in both directions — the NULL user_id
        -- tiebreak diverged the moment another user tied on last_ts
        -- (r9 events probe: a real user sharing the NULL user's 1997
        -- last-seen date)
        SELECT user_id, freq, monetary,
               ntile(4) OVER (ORDER BY last_ts DESC NULLS LAST,
                              user_id ASC NULLS LAST) AS r,
               ntile(4) OVER (ORDER BY freq DESC NULLS LAST,
                              user_id ASC NULLS LAST) AS f,
               ntile(4) OVER (ORDER BY monetary DESC NULLS LAST,
                              user_id ASC NULLS LAST) AS m
        FROM per_user
    )
    SELECT (r * 100 + f * 10 + m) AS segment,
           count(*) AS n_users,
           round(avg(freq), 4) AS avg_freq,
           round(avg(monetary), 4) AS avg_monetary
    FROM tiled GROUP BY segment ORDER BY segment
    """,
)
def q143_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) quartile segmentation: rank each
    user into ntile(4) on all three axes, code the segment as RFM
    digits, and profile each segment. The ntiles sort the USER aggregate
    (cardinality = users, not events) with user_id tie-breaks — with
    the NULL direction pinned on EVERY level (r9: Spark ASC is NULLS
    FIRST, DuckDB defaults NULLS LAST; the NULL user's tiebreak placement
    diverged the moment a real user tied it on last_ts) — so both
    engines tile identically; monetary is rounded before ranking so the
    sort key is reproducible across engines. At extreme user counts
    swap ntile for approx-quantile cutpoint joins — same output
    contract, no global sort."""
    cat = Catalog(spark, sf_dir)
    per_user = cat.events.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("freq"),
        F.round(F.sum("value"), 6).alias("monetary"),
    )
    # NULL orders pinned on every sort level (see the oracle comment):
    # F.asc defaults NULLS FIRST, the opposite of DuckDB's default —
    # asc_nulls_last makes the NULL user_id tiebreak engine-identical
    tiled = per_user.select(
        "freq",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy(F.desc_nulls_last("last_ts"),
                             F.asc_nulls_last("user_id")))
        .alias("r"),
        F.ntile(4)
        .over(Window.orderBy(F.desc_nulls_last("freq"),
                             F.asc_nulls_last("user_id")))
        .alias("f"),
        F.ntile(4)
        .over(Window.orderBy(F.desc_nulls_last("monetary"),
                             F.asc_nulls_last("user_id")))
        .alias("m"),
    )
    return (
        tiled.groupBy(
            (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("freq"), 4).alias("avg_freq"),
            F.round(F.avg("monetary"), 4).alias("avg_monetary"),
        )
        .orderBy("segment")
    )


@register(
    "q144_approx_percentile_bounds",
    sql="""
    SELECT event_type,
           round(quantile_cont(value, 0.50), 6) AS p50_exact,
           TRUE AS p50_within_bound,
           TRUE AS p95_within_bound
    FROM events
    -- percentiles are defined over real measurements only: NULL joins
    -- drop the NULL-type group asymmetrically on the Spark side, and
    -- NaN sorts above every value in both engines but interpolates
    -- differently (wave-5 finding)
    WHERE value IS NOT NULL AND NOT isnan(value)
    GROUP BY event_type ORDER BY event_type
    """,
)
def q144_approx_percentile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certification harness for the sketch-based percentile path: at
    fact scale the engine swaps exact ``F.percentile`` for
    ``percentile_approx`` (Greenwald-Khanna, mergeable, one pass), whose
    contract is a RANK error ≤ n/accuracy. This query computes BOTH per
    event type and emits the bound check as booleans the oracle pins to
    TRUE — the same certify-don't-copy pattern as q33's recall check: if
    a Spark upgrade or accuracy change ever pushes the sketch estimate
    outside the exact [p-ε, p+ε] quantile window (ε = 1/accuracy = 1e-4
    of rank), the driver's value hash flips and flags it.

    (The approx VALUES themselves are deliberately not output: they are
    sketch-implementation-specific — the portable artifact is the
    guarantee, not the estimate. The check is on RANKS: the estimate is
    an actual element of the multiset, so its min/max rank window must
    intersect [(p-ε)·n, (p+ε)·n + 1] — comparing against interpolated
    VALUE quantiles would false-alarm whenever ε·n < 1 element.)"""
    cat = Catalog(spark, sf_dir)
    eps = 1e-4  # rank tolerance = 1/accuracy
    # measurement domain: see the oracle comment — and the broadcast
    # re-join below is an INNER equi-join, which would silently drop a
    # NULL event_type group the GROUP BY had kept
    events = cat.events.filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    appx = events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50_exact"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("__a50"),
        F.percentile_approx("value", F.lit(0.95), F.lit(10000)).alias("__a95"),
        F.count(F.lit(1)).alias("__n"),
    )
    # eqNullSafe: a NULL event_type is still a GROUP BY group in both
    # engines, and a plain inner equi-join would silently drop it here
    # (still plans BroadcastHashJoin)
    joined = events.select("event_type", "value").join(
        F.broadcast(appx.withColumnRenamed("event_type", "__et")),
        F.col("event_type").eqNullSafe(F.col("__et")),
    ).drop("__et")
    ranked = joined.groupBy("event_type").agg(
        F.any_value("p50_exact").alias("p50_exact"),
        F.any_value("__n").alias("n"),
        F.sum((F.col("value") <= F.col("__a50")).cast("long")).alias("le50"),
        F.sum((F.col("value") < F.col("__a50")).cast("long")).alias("lt50"),
        F.sum((F.col("value") <= F.col("__a95")).cast("long")).alias("le95"),
        F.sum((F.col("value") < F.col("__a95")).cast("long")).alias("lt95"),
    )

    def within(le, lt, p):
        return (F.col(le) >= (p - eps) * F.col("n")) & (
            F.col(lt) < (p + eps) * F.col("n") + 1
        )

    return ranked.select(
        "event_type",
        "p50_exact",
        within("le50", "lt50", 0.5).alias("p50_within_bound"),
        within("le95", "lt95", 0.95).alias("p95_within_bound"),
    ).orderBy("event_type")


@register(
    "q145_sliding_weekly_actives",
    sql="""
    WITH daily AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM daily)
    SELECT strftime(r.d, '%Y-%m-%d') AS day,
           count(DISTINCT a.user_id) AS wau
    FROM days r
    JOIN daily a ON a.d BETWEEN r.d - INTERVAL 6 DAY AND r.d
    GROUP BY r.d ORDER BY day
    """,
)
def q145_sliding_weekly_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day. DISTINCT cannot
    ride a window frame, and the naive fix (self-join on raw events)
    explodes; the scale-right decomposition collapses events to the
    DAU-sized (day, user) relation FIRST, then fans each row out to the
    ≤7 report days it supports via a broadcast offset scaffold — shuffle
    bounded by 7 × DAU regardless of event volume. (The oracle's
    interval self-join is the same math on DuckDB's scale.) For month+
    windows where even 30× DAU hurts, switch the fan-out to per-day HLL
    sketches merged across the window — same shape, bounded error."""
    cat = Catalog(spark, sf_dir)
    daily = (
        cat.events.select(F.to_date("ts").alias("d"), "user_id").distinct()
    )
    days = daily.select("d").distinct()
    offsets = spark.range(7).select(F.col("id").cast("int").alias("off"))
    expanded = daily.crossJoin(F.broadcast(offsets)).select(
        F.date_add("d", F.col("off")).alias("rd"), "user_id"
    )
    return (
        expanded.join(days.select(F.col("d").alias("rd")), "rd")
        .groupBy("rd")
        .agg(F.count_distinct("user_id").alias("wau"))
        .select(F.date_format("rd", "yyyy-MM-dd").alias("day"), "wau")
        .orderBy("day")
    )


@register(
    "q146_quantile_normalization",
    sql="""
    WITH cuts AS (
        SELECT unnest(range(0, 101)) AS g,
               round(unnest(qs), 6) AS cut
        FROM (SELECT quantile_cont(value, [0.0, 0.01, 0.02, 0.03, 0.04, 0.05, 0.06, 0.07, 0.08, 0.09, 0.1, 0.11, 0.12, 0.13, 0.14, 0.15, 0.16, 0.17, 0.18, 0.19, 0.2, 0.21, 0.22, 0.23, 0.24, 0.25, 0.26, 0.27, 0.28, 0.29, 0.3, 0.31, 0.32, 0.33, 0.34, 0.35, 0.36, 0.37, 0.38, 0.39, 0.4, 0.41, 0.42, 0.43, 0.44, 0.45, 0.46, 0.47, 0.48, 0.49, 0.5, 0.51, 0.52, 0.53, 0.54, 0.55, 0.56, 0.57, 0.58, 0.59, 0.6, 0.61, 0.62, 0.63, 0.64, 0.65, 0.66, 0.67, 0.68, 0.69, 0.7, 0.71, 0.72, 0.73, 0.74, 0.75, 0.76, 0.77, 0.78, 0.79, 0.8, 0.81, 0.82, 0.83, 0.84, 0.85, 0.86, 0.87, 0.88, 0.89, 0.9, 0.91, 0.92, 0.93, 0.94, 0.95, 0.96, 0.97, 0.98, 0.99, 1.0]) AS qs FROM events
          -- defined measurements only: a NULL value ranks FIRST in
          -- Spark windows and LAST in DuckDB; NaN poisons quantile
          -- interpolation differently (wave-5 finding)
          WHERE value IS NOT NULL AND NOT isnan(value))
    ),
    r AS (
        SELECT event_type, value,
               (rank() OVER (PARTITION BY event_type ORDER BY value) - 1)
                   AS rk,
               (count(*) OVER (PARTITION BY event_type) - 1) AS nm1
        FROM events
        WHERE value IS NOT NULL AND NOT isnan(value)
    ),
    i AS (
        SELECT event_type,
               CAST(floor(CASE WHEN nm1 = 0 THEN 0.0
                               ELSE rk * 100.0 / nm1 END) AS BIGINT) AS g0,
               (CASE WHEN nm1 = 0 THEN 0.0 ELSE rk * 100.0 / nm1 END)
                   - floor(CASE WHEN nm1 = 0 THEN 0.0
                                ELSE rk * 100.0 / nm1 END) AS frac
        FROM r
    )
    SELECT event_type,
           round(avg(c0.cut + frac * (c1.cut - c0.cut)), 6) AS avg_norm,
           round(min(c0.cut + frac * (c1.cut - c0.cut)), 6) AS min_norm,
           round(max(c0.cut + frac * (c1.cut - c0.cut)), 6) AS max_norm
    FROM i
    JOIN cuts c0 ON c0.g = i.g0
    JOIN cuts c1 ON c1.g = least(i.g0 + 1, 100)
    GROUP BY event_type ORDER BY event_type
    """,
)
def q146_quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across groups — map every event type's
    value distribution onto the GLOBAL distribution (rank within type →
    interpolated global quantile), the harmonization step that makes
    quality scores comparable across corpus sources with different
    scoring scales. Scale shape: the global distribution is compressed
    to a 101-row cutpoint table (one percentile aggregate, broadcast);
    per-row work is a rank window WITHIN each group plus two broadcast
    lookups — no global sort of the fact table. Determinism across
    engines: interpolation positions derive from INTEGER ranks (same
    doubles from the same integer division on both sides), and
    cutpoints round at 1e-6 before interpolating."""
    cat = Catalog(spark, sf_dir)
    # defined measurements only (see oracle comment)
    events = cat.events.filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    fracs = [g / 100.0 for g in range(101)]
    cuts = (
        events.agg(
            F.percentile("value", F.array([F.lit(x) for x in fracs])).alias("cs")
        )
        .select(F.posexplode("cs").alias("g", "cut"))
        .select("g", F.round("cut", 6).alias("cut"))
    )
    w = Window.partitionBy("event_type").orderBy("value")
    wn = Window.partitionBy("event_type")
    r = events.select(
        "event_type",
        (F.rank().over(w) - 1).alias("rk"),
        (F.count(F.lit(1)).over(wn) - 1).alias("nm1"),
    )
    pos = F.when(F.col("nm1") == 0, F.lit(0.0)).otherwise(
        F.col("rk") * 100.0 / F.col("nm1")
    )
    i = r.select(
        "event_type",
        F.floor(pos).cast("long").alias("g0"),
        (pos - F.floor(pos)).alias("frac"),
    )
    c0 = cuts.select(F.col("g").alias("g0"), F.col("cut").alias("cut0"))
    c1 = cuts.select(F.col("g").alias("g1"), F.col("cut").alias("cut1"))
    norm = F.col("cut0") + F.col("frac") * (F.col("cut1") - F.col("cut0"))
    return (
        i.join(F.broadcast(c0), "g0")
        .join(F.broadcast(c1), F.least(F.col("g0") + 1, F.lit(100)) == F.col("g1"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg(norm), 6).alias("avg_norm"),
            F.round(F.min(norm), 6).alias("min_norm"),
            F.round(F.max(norm), 6).alias("max_norm"),
        )
        .orderBy("event_type")
    )


@register(
    "q150_funnel_chain_attribution",
    sql="""
    WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
    pc AS (
        SELECT p.user_id, p.ts AS pts, c.ts AS cts
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    ),
    -- clickless purchases must NOT reach the second as-of: a NULL left
    -- key under DuckDB ASOF matches arbitrarily instead of not at all
    pcv AS (
        SELECT pc.user_id, pc.pts, v.ts AS vts
        FROM (SELECT * FROM pc WHERE cts IS NOT NULL) pc ASOF LEFT JOIN v
          ON pc.user_id = v.user_id AND pc.cts >= v.ts
    ),
    chains AS (
        SELECT strftime(pts, '%Y-%m-%d') AS day,
               sum(CASE WHEN vts IS NOT NULL
                         AND pts - vts <= INTERVAL 24 HOUR THEN 1 ELSE 0
                   END)::BIGINT AS n_full_chains
        FROM pcv GROUP BY day
    ),
    daily AS (
        SELECT strftime(pts, '%Y-%m-%d') AS day, count(*) AS n_purchases
        FROM pc GROUP BY day
    )
    SELECT d.day, d.n_purchases,
           coalesce(c2.n_full_chains, 0)::BIGINT AS n_full_chains,
           round(coalesce(c2.n_full_chains, 0)::DOUBLE / d.n_purchases, 4)
               AS chain_rate
    FROM daily d LEFT JOIN chains c2 ON c2.day = d.day
    ORDER BY d.day
    """,
)
def q150_funnel_chain_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel pattern detection (the MATCH_RECOGNIZE analog
    Spark lacks natively): view → click → purchase chains where the
    whole chain closes within 24 hours, found by CHAINING two backward
    as-of joins (purchase picks its latest preceding click per user,
    that click picks its latest preceding view) — each as-of is one
    keyed union + window (operators.temporal.asof_join), so pattern
    matching over 100 TB of events costs two user-keyed shuffles, not an
    event self-join. The chain carries only timestamps, so tied-instant
    right rows (unspecified order under DuckDB ASOF) cannot diverge the
    output."""
    from flight_delays_progetto_big_data_2024_spark.operators.temporal import (
        asof_join,
    )

    cat = Catalog(spark, sf_dir)
    ev = cat.events
    p = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    c = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    v = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    pc = asof_join(p, c, ["user_id"], ts_col="ts", right_cols=[], suffix="_c").persist()
    # second hop from the CLICK's timestamp — clickless purchases are
    # held out (they can't head a chain, and a null as-of key is
    # undefined under DuckDB ASOF)
    pc2 = pc.filter(F.col("ts_c").isNotNull()).select(
        "user_id", F.col("ts").alias("pts"), F.col("ts_c").alias("ts")
    )
    pcv = asof_join(pc2, v, ["user_id"], ts_col="ts", right_cols=[], suffix="_v")
    # integer-µs window compare (r9 ts-domain probe: double-cast
    # seconds are µs-blind at far-future epochs — see q130)
    chain = F.col("ts_v").isNotNull() & (
        F.unix_micros(F.col("pts").cast("timestamp"))
        - F.unix_micros(F.col("ts_v").cast("timestamp"))
        <= 86_400_000_000
    )
    chains = pcv.groupBy(
        F.date_format("pts", "yyyy-MM-dd").alias("day")
    ).agg(F.sum(chain.cast("long")).alias("n_full_chains"))
    daily = pc.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n_purchases")
    )
    return (
        daily.join(chains, "day", "left")
        .select(
            "day",
            "n_purchases",
            F.coalesce("n_full_chains", F.lit(0)).alias("n_full_chains"),
            F.round(
                F.coalesce("n_full_chains", F.lit(0)) / F.col("n_purchases"), 4
            ).alias("chain_rate"),
        )
        .orderBy("day")
    )


@register(
    "q151_session_path_trigrams",
    sql="""
    WITH marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 2 HOUR
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        -- no event time, no sequence position (q41/q92 rule; Spark
        -- orders NULL ts FIRST, DuckDB LAST)
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                   AS session_id
        FROM marked
    ),
    paths AS (
        SELECT list(event_type ORDER BY ts, event_id) AS path
        FROM numbered GROUP BY user_id, session_id
    ),
    tri AS (
        SELECT unnest(list_transform(range(1, len(path) - 1),
                      i -> path[i] || '>' || path[i+1] || '>' || path[i+2]))
                   AS trigram
        FROM paths WHERE len(path) >= 3
    )
    -- hex(trigram): DuckDB's large top-level sort is NUL-blind (the
    -- round-11 strings-axis finding, see q59's oracle comment), and a
    -- planted NUL-bearing event_type reaches this LIMIT boundary —
    -- hex order IS byte order, matching Spark's sort on every input
    SELECT trigram, count(*) AS n
    FROM tri GROUP BY trigram
    ORDER BY n DESC, hex(trigram) LIMIT 15
    """,
)
def q151_session_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence mining: the 15 most common 3-step event-type
    paths WITHIN a session (2h-gap sessions as q41/q130). The per-session
    path materializes as one sorted collect per session — bounded by
    session length, shuffled once on (user, session) — and trigram
    expansion is a pure array transform (no self-joins over events).
    The (ts, event_id) total order makes path construction
    deterministic in both engines."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # integer-µs gap compare (r9 ts-domain probe: double-cast seconds
    # are µs-blind at far-future epochs — see q130)
    marked = cat.events.filter(F.col("ts").isNotNull()).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
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
    ).withColumn("session_id", F.sum("new_session").over(wall))
    paths = (
        marked.groupBy("user_id", "session_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ).alias("path")
        )
        .filter(F.size("path") >= 3)
    )
    tri = paths.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("path") - 2),
                lambda i: F.concat_ws(
                    ">",
                    F.element_at("path", i),
                    F.element_at("path", i + 1),
                    F.element_at("path", i + 2),
                ),
            )
        ).alias("trigram")
    )
    return (
        tri.groupBy("trigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "trigram")
        .limit(15)
    )


@register(
    "q154_cohort_retention_matrix",
    sql="""
    WITH first_seen AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    ),
    cohorts AS (
        -- FLOOR division, not //: DuckDB's // truncates toward zero, so
        -- a pre-epoch first-seen date (r9 events probe: a real user at
        -- the 1997 timestamp) landed one week off Spark's floor(x/7)
        -- (-1385 vs -1386). Calendar week indexes are floor semantics.
        SELECT user_id,
               CAST(floor(date_diff('day', DATE '2024-01-01', d0) / 7.0)
                    AS BIGINT) AS cohort
        FROM first_seen
    ),
    active AS (
        SELECT DISTINCT e.user_id,
               CAST(floor(date_diff('day', DATE '2024-01-01',
                                    CAST(e.ts AS DATE)) / 7.0)
                    AS BIGINT) AS wk
        FROM events e
    ),
    sizes AS (SELECT cohort, count(*) AS n_users FROM cohorts GROUP BY cohort),
    cells AS (
        SELECT c.cohort, a.wk - c.cohort AS week_offset,
               count(DISTINCT a.user_id) AS n_active
        FROM cohorts c JOIN active a ON a.user_id = c.user_id
        GROUP BY c.cohort, week_offset
    )
    SELECT c.cohort, c.week_offset, c.n_active,
           round(c.n_active::DOUBLE / s.n_users, 4) AS retention
    FROM cells c JOIN sizes s ON s.cohort = c.cohort
    ORDER BY c.cohort, c.week_offset
    """,
)
def q154_cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix: users bucketed by first-seen week,
    each cohort tracked across week offsets as the share still active —
    the standard growth-analytics triangle. Every relation after the
    first aggregate is USER-sized (first-seen, cohort label, distinct
    user-week), so the matrix costs two user-keyed shuffles regardless
    of event volume; the cohort-size decorate joins the ≤5-row size
    table."""
    cat = Catalog(spark, sf_dir)
    week = lambda c: F.floor(
        F.datediff(F.to_date(c), F.lit("2024-01-01").cast("date")) / 7
    )
    first_seen = cat.events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0")
    )
    cohorts = first_seen.select(
        "user_id",
        F.floor(
            F.datediff("d0", F.lit("2024-01-01").cast("date")) / 7
        ).alias("cohort"),
    )
    active = cat.events.select("user_id", week("ts").alias("wk")).distinct()
    sizes = cohorts.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_users"))
    cells = (
        cohorts.join(active, "user_id")
        .groupBy("cohort", (F.col("wk") - F.col("cohort")).alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    return (
        cells.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "week_offset",
            "n_active",
            F.round(F.col("n_active") / F.col("n_users"), 4).alias("retention"),
        )
        .orderBy("cohort", "week_offset")
    )


def _markov_oracle_sql(iters: int = 8) -> str:
    """Unrolled power-iteration oracle: v0 uniform over event types,
    v_{k+1}(j) = Σ_i v_k(i)·P(i,j), P row-normalized transition counts
    rounded at 1e-6 BEFORE iterating (locks both engines to identical
    inputs, so 8 chained matrix-vector products stay bit-comparable)."""
    parts = [
        """
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    counts AS (
        SELECT prev_type AS src, event_type AS dst, count(*) AS c
        FROM seq WHERE prev_type IS NOT NULL GROUP BY src, dst
    ),
    p AS (
        SELECT src, dst,
               round(c / sum(c) OVER (PARTITION BY src), 6) AS prob
        FROM counts
    ),
    types AS (SELECT DISTINCT event_type AS id FROM events),
    n AS (SELECT count(*) AS k FROM types),
    v0 AS (SELECT id, 1.0 / (SELECT k FROM n) AS v FROM types)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
    v{i} AS (
        SELECT p.dst AS id, sum(v{i-1}.v * p.prob) AS v
        FROM v{i-1} JOIN p ON p.src = v{i-1}.id GROUP BY p.dst
    )"""
        )
    parts.append(
        f"""
    SELECT id AS event_type, round(v, 6) AS steady_state
    FROM v{iters} ORDER BY event_type"""
    )
    return "".join(parts)


@register("q157_event_markov_steady_state", sql=_markov_oracle_sql())
def q157_event_markov_steady_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state distribution of the event-type Markov chain (which
    state users spend their behavioral time in): build the q92-style
    row-normalized transition matrix, then POWER-ITERATE π·P eight times
    from uniform. The iteration runs over the AGGREGATE (|types|² rows)
    — unlike PageRank's vertex-relation loop, each step here is a join
    between two tiny relations, so the whole chain analysis costs one
    event-table shuffle (the lag window) plus pocket-change. Transition
    probabilities round at 1e-6 pre-iteration so both engines iterate
    identical matrices (the oracle unrolls all eight steps)."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = cat.events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy(
        F.col("prev_type").alias("src"), F.col("event_type").alias("dst")
    ).agg(F.count(F.lit(1)).alias("c"))
    wrow = Window.partitionBy("src")
    p = counts.select(
        "src", "dst", F.round(F.col("c") / F.sum("c").over(wrow), 6).alias("prob")
    ).persist()
    types = cat.events.select(F.col("event_type").alias("id")).distinct()
    k = types.agg(F.count(F.lit(1)).alias("k"))  # scalar stays in-plan
    v = types.crossJoin(F.broadcast(k)).select(
        "id", (F.lit(1.0) / F.col("k")).alias("v")
    )
    for _ in range(8):
        v = (
            v.join(p, v["id"] == p["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("v") * F.col("prob")).alias("v"))
        )
    return v.select(
        F.col("id").alias("event_type"), F.round("v", 6).alias("steady_state")
    ).orderBy("event_type")


@register(
    "q167_seasonality_variance_share",
    sql="""
    WITH g AS (
        SELECT event_type,
               (dayofweek(ts) * 24 + hour(ts)) AS how,
               value
        FROM events
    ),
    cell AS (
        SELECT event_type, how, count(*) AS n, avg(value) AS m
        FROM g GROUP BY event_type, how
    ),
    tot AS (
        SELECT event_type, count(*) AS n_tot, avg(value) AS gm,
               sum(value * value) AS ss
        FROM g GROUP BY event_type
    )
    SELECT t.event_type,
           round(sum(c.n * (c.m - t.gm) * (c.m - t.gm))
                 / (t.ss - t.n_tot * t.gm * t.gm), 6) AS eta_squared,
           count(*) AS n_cells
    FROM cell c JOIN tot t ON t.event_type = c.event_type
    GROUP BY t.event_type, t.ss, t.n_tot, t.gm
    ORDER BY t.event_type
    """,
)
def q167_seasonality_variance_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality strength as variance decomposition (η² — the ANOVA
    between-group share): what fraction of each event type's value
    variance is explained by the hour-of-week cell it falls in. Two
    grouped aggregates (cells + per-type totals) and a broadcast join —
    the screen that says whether hourly/weekly models are worth
    building, computed without any per-row second pass (SS_total comes
    from Σx² - n·mean², both engines with identical algebra)."""
    cat = Catalog(spark, sf_dir)
    g = cat.events.select(
        "event_type",
        (F.dayofweek("ts") * 24 + F.hour("ts")).alias("how"),
        "value",
    )
    cell = g.groupBy("event_type", "how").agg(
        F.count(F.lit(1)).alias("n"), F.avg("value").alias("m")
    )
    tot = g.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_tot"),
        F.avg("value").alias("gm"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    return (
        cell.join(F.broadcast(tot), "event_type")
        .groupBy("event_type", "ss", "n_tot", "gm")
        .agg(
            # try_divide: a ZERO-VARIANCE type (all values identical —
            # round-11 constant-group probe) has SS_total exactly 0 in
            # both engines' identical algebra, and eta-squared is then
            # UNDEFINED — DuckDB's x/0 yields NULL where ANSI Spark's
            # plain '/' aborts the query on one degenerate group.
            F.round(
                F.try_divide(
                    F.sum(
                        F.col("n") * (F.col("m") - F.col("gm")) * (F.col("m") - F.col("gm"))
                    ),
                    F.col("ss") - F.col("n_tot") * F.col("gm") * F.col("gm"),
                ),
                6,
            ).alias("eta_squared"),
            F.count(F.lit(1)).alias("n_cells"),
        )
        .select("event_type", "eta_squared", "n_cells")
        .orderBy("event_type")
    )


@register(
    "q168_inter_event_time_profile",
    sql="""
    WITH gaps AS (
        SELECT event_type,
               date_diff('microsecond',
                         lag(ts) OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts, event_id),
                         ts) / 1000000.0 AS gap_s
        FROM events
    )
    SELECT event_type,
           count(gap_s) AS n_gaps,
           round(avg(gap_s), 4) AS avg_gap_s,
           round(stddev_samp(gap_s), 4) AS sd_gap_s,
           round(stddev_samp(gap_s) / avg(gap_s), 6) AS cv,
           round(quantile_cont(gap_s, 0.5), 4) AS p50_gap_s
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def q168_inter_event_time_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event time (hazard) profile per event type: mean/sd/median
    gap between consecutive same-type events of the same user, plus the
    coefficient of variation — CV ≈ 1 reads as Poisson arrivals, CV > 1
    as bursty — the first statistic checked before assuming exponential
    inter-arrival models (or sizing session gaps). One lag window per
    (user, type) partition; all downstream relations are
    per-type-sized."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    # exact integer-µs gap, ONE float division — mirrors the oracle's
    # date_diff('microsecond', ...)/1e6 bit-for-bit (r9 ts-domain probe:
    # double-cast seconds lose the µs component at far-future epochs)
    gaps = cat.events.select(
        "event_type",
        (
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
            )
            / 1_000_000.0
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.round(F.avg("gap_s"), 4).alias("avg_gap_s"),
            F.round(F.stddev_samp("gap_s"), 4).alias("sd_gap_s"),
            # try_divide: a type whose every gap is exactly 0 (three
            # same-ts events of a unique type — round-11 constant-group
            # probe, timeline form) makes cv the 0/0 degenerate case:
            # DuckDB's x/0 yields NULL, ANSI '/' aborted the query
            F.round(
                F.try_divide(F.stddev_samp("gap_s"), F.avg("gap_s")), 6
            ).alias("cv"),
            F.round(F.percentile("gap_s", F.lit(0.5)), 4).alias("p50_gap_s"),
        )
        .orderBy("event_type")
    )


@register(
    "q169_brand_share_shift",
    sql="""
    WITH bm AS (
        SELECT p.p_brand AS brand,
               strftime(o.o_orderdate, '%Y-%m') AS month,
               sum(l.l_extendedprice * (1 - l.l_discount)) AS rev
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY brand, month
    ),
    shares AS (
        SELECT brand, month,
               round(rev / sum(rev) OVER (PARTITION BY month), 6) AS share
        FROM bm
    ),
    shifts AS (
        SELECT brand, month, share,
               round(share - lag(share) OVER (PARTITION BY brand
                                              ORDER BY month), 6) AS delta
        FROM shares
    )
    SELECT brand, month, share, delta
    FROM shifts WHERE delta IS NOT NULL
    ORDER BY abs(delta) DESC, brand, month LIMIT 20
    """,
)
def q169_brand_share_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand market-share dynamics: monthly revenue share per brand
    (share-of-total window over the brand×month AGGREGATE) and its
    month-over-month delta (lag over the same aggregate), surfacing the
    20 biggest shifts. The fact table is touched once for the rollup;
    every window after that runs over |brands|×|months| rows — the
    composition pattern for any 'who is gaining share' dashboard."""
    cat = Catalog(spark, sf_dir)
    bm = (
        cat.lineitem.join(
            cat.orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .join(F.broadcast(cat.part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
        )
    )
    w_m = Window.partitionBy("month")
    w_b = Window.partitionBy("brand").orderBy("month")
    shares = bm.select(
        "brand",
        "month",
        F.round(F.col("rev") / F.sum("rev").over(w_m), 6).alias("share"),
    )
    shifts = shares.withColumn(
        "delta", F.round(F.col("share") - F.lag("share").over(w_b), 6)
    ).filter(F.col("delta").isNotNull())
    return shifts.orderBy(F.abs("delta").desc(), "brand", "month").limit(20)


@register(
    "q171_session_depth_conversion",
    sql="""
    WITH marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 2 HOUR
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        -- no event time, no sequence position (q41/q92 rule; Spark
        -- orders NULL ts FIRST, DuckDB LAST)
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, event_type,
               sum(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                   AS session_id
        FROM marked
    ),
    sessions AS (
        SELECT user_id, session_id, count(*) AS depth,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM numbered GROUP BY user_id, session_id
    )
    SELECT least(depth, 10) AS depth_bucket,
           count(*) AS n_sessions,
           sum(converted)::BIGINT AS n_converted,
           round(sum(converted)::DOUBLE / count(*), 4) AS conversion_rate
    FROM sessions GROUP BY depth_bucket ORDER BY depth_bucket
    """,
)
def q171_session_depth_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session depth vs conversion: 2h-gap sessions bucketed by event
    count (capped at 10+), each with its purchase-conversion rate — the
    'does engagement depth buy conversion' curve. Sessionization is the
    q41/q130 gaps-and-islands windows (user-partitioned); everything
    after is session-sized."""
    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # integer-µs gap compare (r9 ts-domain probe: double-cast seconds
    # are µs-blind at far-future epochs — see q130)
    marked = cat.events.filter(F.col("ts").isNotNull()).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
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
    ).withColumn("session_id", F.sum("new_session").over(wall))
    sessions = marked.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("depth"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted"),
    )
    return (
        sessions.groupBy(F.least("depth", F.lit(10)).alias("depth_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("converted").cast("long").alias("n_converted"),
            F.round(F.sum("converted") / F.count(F.lit(1)), 4).alias(
                "conversion_rate"
            ),
        )
        .orderBy("depth_bucket")
    )


@register(
    "q177_user_behavior_similarity",
    sql="""
    WITH vec AS (
        SELECT user_id,
               count(*) FILTER (event_type = 'view')::DOUBLE AS v1,
               count(*) FILTER (event_type = 'click')::DOUBLE AS v2,
               count(*) FILTER (event_type = 'purchase')::DOUBLE AS v3,
               count(*) FILTER (event_type = 'signup')::DOUBLE AS v4,
               count(*) FILTER (event_type = 'error')::DOUBLE AS v5
        FROM events GROUP BY user_id
    ),
    n AS (
        SELECT *, sqrt(v1*v1 + v2*v2 + v3*v3 + v4*v4 + v5*v5) AS nrm
        FROM vec
    ),
    pairs AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               round((a.v1*b.v1 + a.v2*b.v2 + a.v3*b.v3 + a.v4*b.v4
                      + a.v5*b.v5) / (a.nrm * b.nrm), 6) AS cosine
        FROM n a JOIN n b ON a.user_id < b.user_id
        WHERE a.nrm > 0 AND b.nrm > 0
    )
    SELECT user_a, user_b, cosine FROM pairs
    ORDER BY cosine DESC, user_a, user_b LIMIT 10
    """,
)
def q177_user_behavior_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral user similarity WITHOUT an embedding model: each user
    becomes a 5-dim event-type count vector (one pivoted aggregate), and
    the 10 most-similar user pairs surface by cosine — the
    segmentation/fraud-twin primitive. The pair join is user²-sized over
    the USER AGGREGATE (the fact table is touched once); at web-scale
    user counts swap the exact self-join for the LSH bucketing the
    embedding family already provides — same vectors, same contract."""
    cat = Catalog(spark, sf_dir)
    vec = cat.events.groupBy("user_id").agg(
        *[
            F.sum((F.col("event_type") == t).cast("double")).alias(f"v{i+1}")
            for i, t in enumerate(["view", "click", "purchase", "signup", "error"])
        ]
    )
    comp = [F.col(f"v{i}") for i in range(1, 6)]
    nrm = F.sqrt(sum((c * c for c in comp), F.lit(0.0)))
    n = vec.withColumn("nrm", nrm).filter(F.col("nrm") > 0)
    a, b = n.alias("a"), n.alias("b")
    dot = sum(
        (F.col(f"a.v{i}") * F.col(f"b.v{i}") for i in range(1, 6)), F.lit(0.0)
    )
    pairs = a.join(b, F.col("a.user_id") < F.col("b.user_id")).select(
        F.col("a.user_id").alias("user_a"),
        F.col("b.user_id").alias("user_b"),
        F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6).alias("cosine"),
    )
    return pairs.orderBy(F.desc("cosine"), "user_a", "user_b").limit(10)
