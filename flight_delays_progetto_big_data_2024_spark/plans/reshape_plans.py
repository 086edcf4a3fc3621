"""Reshaping and window-function queries: pivot, cube subtotals,
lag/delta trends, ntile quantile bucketing.

The reference's only reshape is a driver-side pandas ``melt``
(reference delayed_flights.py:325-332, covered by q05's unpivot); this
module adds the remaining reshape surface an analytics engine needs,
all Spark-native so results stay distributed:

- q65 pivot: long->wide with a STATIC value list (no distinct-discovery
  scan — the 100TB version of ``pivot()`` without values is a full
  extra pass over the fact table).
- q66 cube: grouping-sets subtotals computed in ONE pass (Expand node)
  instead of unioning four separate aggregations.
- q67 lag: day-over-day deltas via a window partitioned to one row per
  day AFTER a pre-aggregation — the window runs over ~days rows, never
  over raw events.
- q68 ntile: equal-frequency bucketing. NOTE the deliberate scale
  tradeoff: ntile needs a global sort; at 100TB you'd switch to
  ``approxQuantile``-derived range bounds (q45 covers percentiles).
  Orders is a 1-per-customer-ish table, orders of magnitude smaller
  than lineitem, so the global window is acceptable here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flight_delays_progetto_big_data_2024_spark.operators.relational import pivot_table
from flight_delays_progetto_big_data_2024_spark.plans.registry import register
from flight_delays_progetto_big_data_2024_spark.sources.readers import Catalog

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_COLS = ["urgent", "high", "medium", "not_specified", "low"]


@register(
    "q65_orders_month_priority_pivot",
    sql="""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           count(*) FILTER (o_orderpriority = '1-URGENT')        AS urgent,
           count(*) FILTER (o_orderpriority = '2-HIGH')          AS high,
           count(*) FILTER (o_orderpriority = '3-MEDIUM')        AS medium,
           count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS not_specified,
           count(*) FILTER (o_orderpriority = '5-LOW')           AS low
    FROM orders
    GROUP BY order_month
    ORDER BY order_month
    """,
)
def q65_orders_month_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long->wide): monthly order counts with one column per
    priority. Spark compiles the static-values pivot to a single hash
    aggregation of count(CASE WHEN ...) columns — same plan shape as the
    oracle's FILTER clauses, one scan, no distinct-discovery job."""
    cat = Catalog(spark, sf_dir)
    months = cat.orders.withColumn(
        "order_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    wide = pivot_table(
        months,
        ["order_month"],
        "o_orderpriority",
        _PRIORITIES,
        F.count(F.lit(1)),
        renames=dict(zip(_PRIORITIES, _PRIORITY_COLS)),
    )
    # pivot cells with no matching rows are null; counts should read 0
    filled = wide.na.fill(0, _PRIORITY_COLS)
    return filled.orderBy("order_month")


@register(
    "q66_returnflag_status_cube",
    sql="""
    SELECT coalesce(l_returnflag, 'ALL')  AS returnflag,
           coalesce(l_linestatus, 'ALL')  AS linestatus,
           GROUPING(l_returnflag)         AS flag_is_total,
           GROUPING(l_linestatus)         AS status_is_total,
           count(*)                       AS num_items,
           round(sum(l_quantity), 2)      AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    -- empty-input mirror: Spark's Expand emits no grouping-set rows
    -- from an empty relation where DuckDB emits the standard count-0
    -- grand total; real cube groups always aggregate >= 1 row, so the
    -- clause only removes the empty-input artifact (round-12 sweep,
    -- see q47)
    HAVING count(*) > 0
    ORDER BY returnflag, linestatus
    """,
)
def q66_returnflag_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube subtotals: every (returnflag, linestatus) combination plus
    row/column/grand totals in ONE aggregation pass (Catalyst's Expand
    replicates each input row into the 4 grouping sets map-side, so the
    shuffle carries partial aggregates, not 4x the fact table).
    ``grouping()`` flags distinguish a genuine 'ALL' value from a
    subtotal row, mirroring the oracle's GROUPING()."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("flag_is_total"),
            F.grouping("l_linestatus").alias("status_is_total"),
            F.count(F.lit(1)).alias("num_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "flag_is_total",
            "status_is_total",
            "num_items",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "q67_daily_event_delta",
    sql="""
    WITH daily AS (
        SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS num_events
        FROM events
        -- no timestamp, no day: Spark windows order NULLS FIRST where
        -- DuckDB orders NULLS LAST, so a NULL day would shift the
        -- whole lag chain differently (wave-5 finding)
        WHERE ts IS NOT NULL
        GROUP BY day
    )
    SELECT day, num_events,
           num_events - lag(num_events) OVER (ORDER BY day) AS delta,
           round(100.0 * (num_events - lag(num_events) OVER (ORDER BY day))
                 / lag(num_events) OVER (ORDER BY day), 4) AS pct_change
    FROM daily
    ORDER BY day
    """,
)
def q67_daily_event_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day traffic deltas. The lag window is GLOBAL (no
    partition key) but runs AFTER the groupBy collapsed events to one
    row per day — a ~365-rows-per-year single task, fine at any event
    volume. The aggregation, where the data is big, stays fully
    parallel."""
    cat = Catalog(spark, sf_dir)
    daily = (
        cat.events.filter(F.col("ts").isNotNull())  # no ts, no day
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("num_events"))
    )
    w = Window.orderBy("day")
    prev = F.lag("num_events").over(w)
    return (
        daily.withColumn("delta", F.col("num_events") - prev)
        .withColumn(
            "pct_change",
            F.round(100.0 * (F.col("num_events") - prev) / prev, 4),
        )
        .orderBy("day")
    )


@register(
    "q68_order_price_deciles",
    sql="""
    WITH tiled AS (
        SELECT o_totalprice,
               ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders
        -- an undefined price cannot be ranked: NULL sorts FIRST in
        -- Spark windows / LAST in DuckDB, and NaN sorts above every
        -- real value in both — either would shift all decile bounds
        WHERE o_totalprice IS NOT NULL AND NOT isnan(o_totalprice)
    )
    SELECT decile, count(*) AS num_orders,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price,
           round(avg(o_totalprice), 4) AS avg_price
    FROM tiled GROUP BY decile ORDER BY decile
    """,
)
def q68_order_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency deciles of order value. Ordering includes
    o_orderkey as tiebreaker so tile assignment at duplicate prices is
    deterministic and engine-portable. Global-sort caveat in the module
    docstring (at 100TB: approxQuantile range bounds instead)."""
    cat = Catalog(spark, sf_dir)
    w = Window.orderBy("o_totalprice", "o_orderkey")
    tiled = cat.orders.filter(  # undefined prices cannot be ranked
        F.col("o_totalprice").isNotNull() & ~F.isnan("o_totalprice")
    ).select("o_totalprice", F.ntile(10).over(w).alias("decile"))
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("num_orders"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
        .orderBy("decile")
    )


@register(
    "q86_densified_daily_series",
    sql="""
    WITH bounds AS (
        SELECT date_trunc('day', min(ts)) AS d0, date_trunc('day', max(ts)) AS d1
        FROM events
    ),
    calendar AS (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds
    ),
    daily AS (
        SELECT date_trunc('day', ts) AS day, count(*) AS n,
               round(sum(value), 4) AS total_value
        FROM events WHERE event_type = 'signup' GROUP BY day
    )
    SELECT strftime(c.day, '%Y-%m-%d') AS day,
           coalesce(d.n, 0) AS num_events,
           coalesce(d.total_value, 0.0) AS total_value
    FROM calendar c LEFT JOIN daily d USING (day)
    ORDER BY day
    """,
)
def q86_densified_daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification (the calendar-scaffold pattern): days
    with ZERO signups must appear as explicit 0 rows — a groupBy alone
    silently drops them, which corrupts downstream moving averages and
    charts. The scaffold is generated with ``sequence()`` from the
    min/max bounds (one 1-row subquery), exploded, and left-joined to
    the aggregate — never a driver-side date loop."""
    cat = Catalog(spark, sf_dir)
    ev = cat.events.withColumn("ts", F.col("ts").cast("timestamp"))
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    calendar = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    daily = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("tv"),
        )
    )
    return (
        calendar.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("num_events"),
            F.coalesce("tv", F.lit(0.0)).alias("total_value"),
        )
        .orderBy("day")
    )


@register(
    "q87_referential_integrity",
    sql="""
    SELECT
        (SELECT count(*) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_orderkey = l.l_orderkey)) AS orphan_lineitems,
        (SELECT count(*) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM part p
                           WHERE p.p_partkey = l.l_partkey)) AS unknown_parts,
        (SELECT count(*) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c
                           WHERE c.c_custkey = o.o_custkey)) AS orphan_orders,
        (SELECT count(*) FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey)) AS inactive_customers
    """,
)
def q87_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key health across the star schema via left_anti joins —
    the join kind the reference never uses (SURVEY.md §2.3 'missing
    join kinds'). Each anti-join shuffles only its key columns; the
    four scalar counts cross-join into one row (no collect)."""
    cat = Catalog(spark, sf_dir)

    def anti_count(left, right, lk, rk, alias):
        return (
            left.select(lk)
            .join(right.select(F.col(rk).alias(lk)), lk, "left_anti")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    return (
        anti_count(cat.lineitem, cat.orders, "l_orderkey", "o_orderkey", "orphan_lineitems")
        .crossJoin(anti_count(cat.lineitem, cat.part, "l_partkey", "p_partkey", "unknown_parts"))
        .crossJoin(anti_count(cat.orders, cat.customer, "o_custkey", "c_custkey", "orphan_orders"))
        .crossJoin(anti_count(cat.customer, cat.orders, "c_custkey", "o_custkey", "inactive_customers"))
    )


@register(
    "q94_grouping_sets_sql_surface",
    sql="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(strftime(date_trunc('year', l_shipdate), '%Y'), 'ALL')
               AS ship_year,
           count(*) AS num_items,
           round(sum(l_extendedprice), 2) AS gross
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (date_trunc('year', l_shipdate)))
    ORDER BY returnflag, ship_year
    """,
)
def q94_grouping_sets_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither cube nor rollup: two disjoint
    marginal breakdowns in ONE pass), exercised through the engine's
    SQL surface — ``spark.sql`` over registered temp views — which the
    reference never uses (SURVEY.md §2.9 'SQL surface: none'). Same
    Catalyst plan (Expand) as the DataFrame cube/rollup path."""
    cat = Catalog(spark, sf_dir)
    cat.lineitem.createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(date_format(date_trunc('year', l_shipdate), 'yyyy'),
                        'ALL') AS ship_year,
               count(*) AS num_items,
               round(sum(l_extendedprice), 2) AS gross
        FROM v_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (date_trunc('year', l_shipdate)))
        ORDER BY returnflag, ship_year
        """
    )


@register(
    "q95_repeat_customers_intersect",
    sql="""
    WITH jan AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE strftime(o_orderdate, '%m') = '01'
    ),
    feb AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE strftime(o_orderdate, '%m') = '02'
    )
    SELECT count(*) AS both_months,
           (SELECT count(*) FROM jan) AS jan_only_base,
           (SELECT count(*) FROM feb) AS feb_only_base
    FROM (SELECT o_custkey FROM jan INTERSECT SELECT o_custkey FROM feb)
    """,
)
def q95_repeat_customers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (the set op q19/q50 don't cover): customers ordering in
    both January and February (any year). Spark plans intersect as a
    left-semi join over pre-distincted sides — both sides shuffle on
    the key once."""
    cat = Catalog(spark, sf_dir)
    month = F.date_format("o_orderdate", "MM")
    jan = cat.orders.filter(month == "01").select("o_custkey").distinct()
    feb = cat.orders.filter(month == "02").select("o_custkey").distinct()
    return (
        jan.intersect(feb)
        .agg(F.count(F.lit(1)).alias("both_months"))
        .crossJoin(jan.agg(F.count(F.lit(1)).alias("jan_only_base")))
        .crossJoin(feb.agg(F.count(F.lit(1)).alias("feb_only_base")))
    )


@register(
    "q96_orders_above_customer_average",
    sql="""
    SELECT o.o_custkey AS custkey,
           count(*) AS n_above,
           round(max(o.o_totalprice), 2) AS max_above
    FROM orders o
    WHERE o.o_totalprice > (SELECT avg(i.o_totalprice) FROM orders i
                            WHERE i.o_custkey = o.o_custkey)
    GROUP BY o.o_custkey
    HAVING count(*) >= 5
    ORDER BY custkey
    """,
)
def q96_orders_above_customer_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated-subquery classic (orders above their own
    customer's average), DECORRELATED as a window average over the
    customer partition — one shuffle on custkey instead of a
    per-row subquery; exactly the rewrite Catalyst can't always do for
    arbitrary correlations, stated directly."""
    from pyspark.sql.window import Window

    cat = Catalog(spark, sf_dir)
    w = Window.partitionBy("o_custkey")
    flagged = cat.orders.withColumn(
        "cust_avg", F.avg("o_totalprice").over(w)
    ).filter(F.col("o_totalprice") > F.col("cust_avg"))
    return (
        flagged.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_above"),
            F.round(F.max("o_totalprice"), 2).alias("max_above"),
        )
        .filter(F.col("n_above") >= 5)
        .orderBy("custkey")
    )


@register(
    "q110_brand_rank_families",
    sql="""
    WITH brand_rev AS (
        SELECT p.p_brand AS brand,
               round(sum(l.l_extendedprice), 0) AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY brand
    )
    SELECT brand, revenue,
           CAST(row_number() OVER (ORDER BY revenue DESC, brand) AS INTEGER)
               AS rn,
           CAST(rank() OVER (ORDER BY revenue DESC) AS INTEGER) AS rnk,
           CAST(dense_rank() OVER (ORDER BY revenue DESC) AS INTEGER) AS drnk
    FROM brand_rev
    ORDER BY rn
    """,
)
def q110_brand_rank_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three ranking families side by side on brand revenue
    (rounded to whole units so ties actually occur): row_number is a
    total order (needs the brand tiebreak to be deterministic), rank
    leaves gaps after ties, dense_rank doesn't — the difference that
    silently corrupts 'top 10' reports when revenue ties. Window runs
    over the ~25-brand aggregate."""
    cat = Catalog(spark, sf_dir)
    brand_rev = (
        cat.lineitem.join(
            F.broadcast(cat.part), F.col("l_partkey") == F.col("p_partkey")
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.round(F.sum("l_extendedprice"), 0).alias("revenue"))
    )
    by_rev = Window.orderBy(F.desc("revenue"))
    by_rev_tb = Window.orderBy(F.desc("revenue"), "brand")
    return brand_rev.select(
        "brand",
        "revenue",
        F.row_number().over(by_rev_tb).cast("int").alias("rn"),
        F.rank().over(by_rev).cast("int").alias("rnk"),
        F.dense_rank().over(by_rev).cast("int").alias("drnk"),
    ).orderBy("rn")


@register(
    "q111_nation_share_of_region",
    sql="""
    WITH nation_rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               sum(o.o_totalprice) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY region, nation
    )
    SELECT region, nation,
           round(revenue, 2) AS revenue,
           round(100.0 * revenue / sum(revenue) OVER (PARTITION BY region), 4)
               AS pct_of_region,
           round(100.0 * revenue / sum(revenue) OVER (), 4) AS pct_of_total
    FROM nation_rev
    ORDER BY region, nation
    """,
)
def q111_nation_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical share-of-parent: each nation's revenue as a share of
    its region AND of the whole — two window sums over the 25-row
    aggregate (partitioned by region; the global one is the only
    unpartitioned window, and it sees 25 rows, not the fact table).
    The multi-level percentage pattern the reference computed
    driver-side in pandas (SURVEY A11)."""
    cat = Catalog(spark, sf_dir)
    nation_rev = (
        cat.orders.join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    by_region = Window.partitionBy("region")
    overall = Window.partitionBy()
    return nation_rev.select(
        "region",
        "nation",
        F.round("revenue", 2).alias("revenue"),
        F.round(100.0 * F.col("revenue") / F.sum("revenue").over(by_region), 4).alias(
            "pct_of_region"
        ),
        F.round(100.0 * F.col("revenue") / F.sum("revenue").over(overall), 4).alias(
            "pct_of_total"
        ),
    ).orderBy("region", "nation")


@register(
    "q125_order_price_item_correlation",
    sql="""
    WITH per_order AS (
        SELECT o.o_orderpriority AS priority,
               o.o_totalprice / 1000.0 AS price_k,
               count(l.l_orderkey) AS n_items
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_totalprice
    )
    SELECT priority,
           count(*)::BIGINT AS n_orders,
           round(corr(price_k, n_items), 6) AS price_items_corr,
           round(covar_samp(price_k, n_items), 4) AS price_items_covar,
           round(var_samp(price_k), 4) AS price_var_k,
           round(stddev_samp(n_items), 6) AS items_stddev
    FROM per_order GROUP BY priority ORDER BY priority
    """,
)
def q125_order_price_item_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-aggregate surface: Pearson correlation, sample
    covariance and variance/stddev of order price vs line-item count,
    per priority — price rescaled to k$ so the variance magnitude
    (~1e3, not ~1e9) leaves rounding headroom above float
    association-order drift; correlation is scale-invariant. These
    four share identical definitions across engines (unlike skewness/kurtosis, where Spark computes population
    moments and DuckDB bias-corrected sample moments — those are
    deliberately NOT oracle-paired; express them from raw power sums if
    portability is needed). One shuffle for the per-order rollup, one
    for the priority aggregate; corr/covar are algebraic, so both
    map-side combine."""
    cat = Catalog(spark, sf_dir)
    per_order = (
        cat.orders.join(
            cat.lineitem, cat.lineitem["l_orderkey"] == cat.orders["o_orderkey"]
        )
        .groupBy("o_orderkey", "o_orderpriority", "o_totalprice")
        .agg(F.count("l_orderkey").alias("n_items"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            (F.col("o_totalprice") / 1000.0).alias("price_k"),
            "n_items",
        )
    )
    return (
        per_order.groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.corr("price_k", "n_items"), 6).alias("price_items_corr"),
            F.round(F.covar_samp("price_k", "n_items"), 4).alias(
                "price_items_covar"
            ),
            F.round(F.var_samp("price_k"), 4).alias("price_var_k"),
            F.round(F.stddev_samp("n_items"), 6).alias("items_stddev"),
        )
        .orderBy("priority")
    )


@register(
    "q174_encoding_advisor",
    sql="""
    WITH t AS (SELECT count(*) AS n FROM lineitem),
    cols AS (
        SELECT 'l_returnflag' AS col,
               count(DISTINCT l_returnflag) AS n_distinct FROM lineitem
        UNION ALL
        SELECT 'l_linestatus', count(DISTINCT l_linestatus) FROM lineitem
        UNION ALL
        SELECT 'l_suppkey', count(DISTINCT l_suppkey) FROM lineitem
        UNION ALL
        SELECT 'l_partkey', count(DISTINCT l_partkey) FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', count(DISTINCT l_extendedprice) FROM lineitem
    )
    SELECT col, n_distinct,
           round(n_distinct::DOUBLE / t.n, 6) AS distinct_ratio,
           (n_distinct::DOUBLE / t.n) < 0.1 AS dict_encode
    FROM cols, t ORDER BY col
    """,
)
def q174_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-encoding advisor: per candidate column, the distinct-value
    ratio and whether parquet dictionary encoding will pay (ratio <
    0.1 — the heuristic writers use before falling back to plain). ONE
    scan computes every column's exact distinct count as a multi-agg
    (Spark plans count(DISTINCT x), count(DISTINCT y), ... as expand +
    one aggregate — no per-column rescans); at fact scale swap
    approx_count_distinct in, same shape. Pairs with
    sources.maintenance's layout tools: the advisor says WHICH columns
    reward sorting/dictionaries before a rewrite."""
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem
    # round-12 (same rewrite as q188/q28): one independent two-level-
    # distinct branch per column instead of five count_distinct in ONE
    # aggregate — the multi-distinct form plans as an Expand that
    # multiplies every input row 6x before the distinct shuffle. Each
    # branch prunes its scan to a single column; the isNotNull filter
    # mirrors count(DISTINCT c)'s NULL skipping and pushes to the scan.
    agg = li.agg(F.count(F.lit(1)).alias("n"))
    for c in [
        "l_returnflag",
        "l_linestatus",
        "l_suppkey",
        "l_partkey",
        "l_extendedprice",
    ]:
        d = (
            li.select(c)
            .where(F.col(c).isNotNull())
            .distinct()
            .agg(F.count(F.lit(1)).alias(f"d_{c}"))
        )
        agg = agg.crossJoin(F.broadcast(d))
    rows = agg.selectExpr(
        "n",
        "stack(5, "
        "'l_extendedprice', d_l_extendedprice, "
        "'l_linestatus', d_l_linestatus, "
        "'l_partkey', d_l_partkey, "
        "'l_returnflag', d_l_returnflag, "
        "'l_suppkey', d_l_suppkey"
        ") AS (col, n_distinct)",
    )
    # try_divide: an empty table makes every ratio 0/0 — DuckDB yields
    # NULL (and NULL < 0.1 stays NULL) where ANSI '/' aborts
    # (round-12 degenerate-relation sweep)
    return rows.select(
        "col",
        "n_distinct",
        F.round(F.try_divide("n_distinct", "n"), 6).alias("distinct_ratio"),
        (F.try_divide("n_distinct", "n") < 0.1).alias("dict_encode"),
    ).orderBy("col")


@register(
    "q176_multires_rollup_reconciliation",
    sql="""
    WITH m5 AS (
        SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS b5,
               count(*) AS n, round(sum(value), 6) AS v
        FROM events GROUP BY b5
    ),
    h1_direct AS (
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bh,
               count(*) AS n, round(sum(value), 6) AS v
        FROM events GROUP BY bh
    ),
    h1_rolled AS (
        SELECT time_bucket(INTERVAL 1 HOUR, b5) AS bh,
               sum(n) AS n, round(sum(v), 6) AS v
        FROM m5 GROUP BY bh
    )
    SELECT count(*) AS n_hours,
           sum(CASE WHEN d.n = r.n THEN 1 ELSE 0 END)::BIGINT
               AS n_count_match,
           sum(CASE WHEN abs(d.v - r.v) <= 0.001 THEN 1 ELSE 0 END)::BIGINT
               AS n_value_match
    FROM h1_direct d JOIN h1_rolled r ON r.bh = d.bh
    """,
)
def q176_multires_rollup_reconciliation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-resolution downsampling reconciliation: 5-minute cells must
    roll up EXACTLY into the directly-computed hourly aggregates —
    counts bit-equal, sums within the documented rounding tolerance
    (each path rounds its partials at 1e-6, so re-aggregated sums can
    differ by accumulated half-ulps; the certified bound is 1e-3). This
    is the invariant every tiered-retention metrics store (raw → 5m →
    1h → 1d) must hold before deleting the finer tier; both engines
    verify it as value-checked match counters."""
    cat = Catalog(spark, sf_dir)
    m5 = cat.events.groupBy(
        F.window("ts", "5 minutes").alias("w5")
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("v"))
    h_direct = cat.events.groupBy(
        F.window("ts", "1 hour").alias("wh")
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("v"))
    h_rolled = m5.groupBy(
        F.window(F.col("w5.start"), "1 hour").alias("wh")
    ).agg(F.sum("n").alias("n"), F.round(F.sum("v"), 6).alias("v"))
    d = h_direct.select(
        F.col("wh.start").alias("bh"), F.col("n").alias("dn"), F.col("v").alias("dv")
    )
    r = h_rolled.select(
        F.col("wh.start").alias("bh"), F.col("n").alias("rn"), F.col("v").alias("rv")
    )
    return d.join(r, "bh").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum((F.col("dn") == F.col("rn")).cast("long")).alias("n_count_match"),
        F.sum(
            (F.abs(F.col("dv") - F.col("rv")) <= 0.001).cast("long")
        ).alias("n_value_match"),
    )


@register(
    "q178_pareto_skyline",
    sql="""
    WITH pts AS (
        SELECT l_orderkey, l_linenumber, l_extendedprice AS price,
               l_quantity AS qty
        FROM lineitem
    ),
    ranked AS (
        SELECT *,
               max(qty) OVER (ORDER BY price DESC, qty DESC, l_orderkey,
                              l_linenumber
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS best_qty_so_far
        FROM pts
    )
    SELECT l_orderkey, l_linenumber, price, qty
    FROM ranked
    WHERE best_qty_so_far IS NULL OR qty > best_qty_so_far
    ORDER BY price DESC, qty DESC
    """,
)
def q178_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline (the classic SKYLINE operator Spark lacks):
    lineitems not dominated on (price, quantity) — no other row is ≥ on
    both and > on one. The 2-D case reduces to a sort by price plus a
    running max of quantity: a row survives iff its quantity beats every
    better-priced row's. At scale the running max is the two-phase
    bucketed decomposition (operators.ordered.bucketed_running_max with
    price-range buckets); at oracle/test scale the plan uses the global
    window directly — same semantics, and the skyline is tiny by
    definition. Ties on both dims keep the first in the deterministic
    (orderkey, linenumber) order — a strict-domination variant would
    keep all; documented choice."""
    from pyspark.sql.window import Window

    cat = Catalog(spark, sf_dir)
    pts = cat.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").alias("price"),
        F.col("l_quantity").alias("qty"),
    )
    w = (
        Window.orderBy(
            F.desc("price"), F.desc("qty"), F.asc("l_orderkey"), F.asc("l_linenumber")
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = pts.withColumn("best_qty_so_far", F.max("qty").over(w))
    return (
        ranked.filter(
            F.col("best_qty_so_far").isNull()
            | (F.col("qty") > F.col("best_qty_so_far"))
        )
        .select("l_orderkey", "l_linenumber", "price", "qty")
        .orderBy(F.desc("price"), F.desc("qty"))
    )


@register(
    "q179_order_total_integrity",
    sql="""
    WITH li AS (
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                   AS computed
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT o.o_orderstatus AS status,
           count(*) AS n_orders,
           sum(CASE WHEN li.l_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_no_lines,
           sum(CASE WHEN li.l_orderkey IS NOT NULL
                     AND abs(o.o_totalprice - li.computed) > 0.01
                    THEN 1 ELSE 0 END)::BIGINT AS n_mismatch,
           round(avg(CASE WHEN li.l_orderkey IS NOT NULL
                          THEN abs(o.o_totalprice - li.computed) END), 4)
               AS avg_abs_diff
    FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
    GROUP BY status ORDER BY status
    """,
)
def q179_order_total_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table monetary integrity: does every order's stored
    o_totalprice equal the recomputed Σ price·(1-disc)·(1+tax) of its
    lines? Per status: orders with NO lines (referential gap) and
    orders whose stored total drifts beyond a cent, plus the average
    absolute drift — the reconciliation any finance-adjacent warehouse
    runs nightly. One lineitem rollup + one left join keyed on the
    order — at 100 TB both sides bucket by orderkey and the join is
    shuffle-free."""
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.groupBy("l_orderkey").agg(
        F.round(
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ),
            2,
        ).alias("computed")
    )
    joined = cat.orders.join(
        li, F.col("o_orderkey") == F.col("l_orderkey"), "left"
    )
    has_lines = F.col("l_orderkey").isNotNull()
    diff = F.abs(F.col("o_totalprice") - F.col("computed"))
    return (
        joined.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum((~has_lines).cast("long")).alias("n_no_lines"),
            F.sum((has_lines & (diff > 0.01)).cast("long")).alias("n_mismatch"),
            F.round(F.avg(F.when(has_lines, diff)), 4).alias("avg_abs_diff"),
        )
        .orderBy("status")
    )
