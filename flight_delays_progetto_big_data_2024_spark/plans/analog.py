"""Reference-surface queries re-targeted at the driver's TPC-H-ish
testdata (role mapping: FIXTURES.md §2 — lineitem⋈orders = flights fact,
nation = CITY, region = airline-ish decode dim, supplier/customer nation
pair = route).

Each query is the Spark-first re-expression of one reference analysis
(citations per query), built from the operators/ library, with its DuckDB
oracle SQL registered alongside. All float aggregates are rounded
identically on both sides so the driver's value-hash is stable across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flight_delays_progetto_big_data_2024_spark.functions.timeparts import (
    hhmm_to_timestamp,
    time_slot,
)
from flight_delays_progetto_big_data_2024_spark.operators.prep import null_profile
from flight_delays_progetto_big_data_2024_spark.operators.relational import (
    avg_by,
    count_by,
    decode_map,
    popular_groups,
    sum_by,
    top_k,
    top_k_per_group,
    two_sided_totals,
    unpivot_measures,
    with_pct_of_total,
)
from flight_delays_progetto_big_data_2024_spark.plans.registry import register
from flight_delays_progetto_big_data_2024_spark.sources.readers import Catalog


def _cust_nation_lineitems(cat: Catalog) -> DataFrame:
    """lineitem ⋈ orders ⋈ customer ⋈ nation, projected to the analog of
    the reference's flights⋈airports join (reference
    delayed_flights.py:22-23): one row per lineitem with the customer
    nation playing CITY. The nation dim is broadcast explicitly."""
    return (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.col("o_orderpriority").alias("priority"),
            "l_discount",
            "l_tax",
            "l_extendedprice",
            "l_quantity",
        )
    )


_CUST_NATION_SQL = """
    SELECT n.n_name AS nation, o.o_orderpriority AS priority,
           l.l_discount, l.l_tax, l.l_extendedprice, l.l_quantity
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


@register(
    "q01_popular_nations_avg_delay",
    sql=f"""
    WITH joined AS ({_CUST_NATION_SQL}),
    counts AS (
        SELECT nation, count(*) AS num_lineitems FROM joined GROUP BY nation
    ),
    popular AS (
        SELECT nation, num_lineitems FROM (
            SELECT nation, num_lineitems,
                   avg(num_lineitems) OVER () AS avg_cnt
            FROM counts
        ) WHERE num_lineitems > avg_cnt
    ),
    measures AS (
        SELECT nation,
               round(avg(l_discount), 6) AS avg_discount,
               round(avg(l_tax), 6) AS avg_tax
        FROM joined GROUP BY nation
    )
    SELECT p.nation, p.num_lineitems, m.avg_discount, m.avg_tax,
           round((m.avg_discount + m.avg_tax) / 2, 6) AS combined_delay
    FROM popular p JOIN measures m USING (nation)
    ORDER BY combined_delay DESC, nation
    LIMIT 20
    """,
)
def q01_popular_nations_avg_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference's ``most_delay`` shape (reference
    delayed_flights.py:16-88) — groups with above-average volume, ranked
    by the mean of two delay measures. The reference's
    ``collect()[0][0]`` scalar mean (its :33) is a global window here:
    one lazy plan, no driver round-trip (SURVEY.md §4.3-3)."""
    cat = Catalog(spark, sf_dir)
    joined = _cust_nation_lineitems(cat)
    # ONE aggregation pass carries count + both measures: the
    # popular_groups global-avg branch then shares an identical exchange
    # subtree, so Spark plans a ReusedExchange — the expensive 4-way join
    # is scanned once, not three times (visible in .explain: one
    # FileScan per table).
    per_nation = joined.groupBy("nation").agg(
        F.count("*").alias("num_lineitems"),
        F.round(F.avg("l_discount"), 6).alias("avg_discount"),
        F.round(F.avg("l_tax"), 6).alias("avg_tax"),
    )
    result = popular_groups(per_nation, "num_lineitems").withColumn(
        "combined_delay",
        F.round((F.col("avg_discount") + F.col("avg_tax")) / 2, 6),
    )
    return top_k(result, [F.desc("combined_delay"), F.col("nation")], 20)


@register(
    "q02_nation_priority_avg_delay",
    sql=f"""
    WITH joined AS ({_CUST_NATION_SQL})
    SELECT nation, priority,
           round(avg(l_extendedprice), 6) AS avg_price
    FROM joined
    GROUP BY nation, priority
    ORDER BY avg_price DESC, nation, priority
    LIMIT 30
    """,
)
def q02_nation_priority_avg_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key groupBy mean — the reference's city×airline delay
    (reference delayed_flights.py:91-129, SURVEY.md A9)."""
    cat = Catalog(spark, sf_dir)
    joined = _cust_nation_lineitems(cat)
    measures = avg_by(joined, ["nation", "priority"], {"l_extendedprice": "avg_price"})
    return top_k(
        measures, [F.desc("avg_price"), F.col("nation"), F.col("priority")], 30
    )


@register(
    "q03_priority_share_pct",
    sql="""
    SELECT o_orderpriority AS priority,
           count(*) AS num_orders,
           round(count(*) * 100.0 / sum(count(*)) OVER (), 4) AS pct
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
)
def q03_priority_share_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentage-of-total per group — the reference's airline
    market-share pct (reference delayed_flights.py:143-156, SURVEY.md
    A11), windowed instead of collect-based."""
    cat = Catalog(spark, sf_dir)
    counts = count_by(
        cat.orders.select(F.col("o_orderpriority").alias("priority")),
        ["priority"],
        "num_orders",
    )
    return with_pct_of_total(counts, "num_orders", "pct").orderBy("priority")


_NATION_PAIR_SQL = """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           l.l_discount, l.l_quantity
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
"""

_ROUTED_SQL = f"""
    SELECT supp_nation || '-' || cust_nation AS route, l_discount
    FROM ({_NATION_PAIR_SQL})
"""


def _nation_pair_lineitems(cat: Catalog) -> DataFrame:
    """(supplier nation, customer nation) per lineitem — the analog of the
    reference's ORIGIN/DESTINATION airport pair (graph edges, routes).
    nation is joined twice under different aliases (the reference renames
    columns to dodge ambiguity, its delayed_flights.py:95-96; aliasing is
    the idiomatic fix)."""
    cust_n = cat.nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    supp_n = cat.nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_n), F.col("c_nationkey") == F.col("cn_key"))
        # supplier GROWS with SF — no broadcast hint (AQE broadcasts
        # while it fits, falls back to shuffle at scale); only the
        # fixed-size nation dims are forced
        .join(cat.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("sn_key"))
        .select("supp_nation", "cust_nation", "l_discount", "l_quantity")
    )


def _routed_lineitems(cat: Catalog) -> DataFrame:
    """Route key = supplier-nation → customer-nation (reference
    delayed_flights.py:174-175 ``concat_ws('-', ...)``)."""
    return _nation_pair_lineitems(cat).select(
        F.concat_ws("-", "supp_nation", "cust_nation").alias("route"),
        "l_discount",
    )


@register(
    "q04_popular_routes_avg_delay",
    sql=f"""
    WITH routed AS ({_ROUTED_SQL}),
    counts AS (SELECT route, count(*) AS num_lineitems FROM routed GROUP BY route),
    popular AS (
        SELECT route, num_lineitems FROM (
            SELECT route, num_lineitems, avg(num_lineitems) OVER () AS avg_cnt
            FROM counts
        ) WHERE num_lineitems > avg_cnt
    ),
    measures AS (
        SELECT route, round(avg(l_discount), 6) AS avg_discount
        FROM routed GROUP BY route
    )
    SELECT p.route, p.num_lineitems, m.avg_discount
    FROM popular p JOIN measures m USING (route)
    ORDER BY avg_discount DESC, route
    LIMIT 25
    """,
)
def q04_popular_routes_avg_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route-level popularity + delay — the reference's
    ``route_most_delay`` (reference delayed_flights.py:163-215)."""
    cat = Catalog(spark, sf_dir)
    routed = _routed_lineitems(cat)
    # single aggregation pass (see q01): count + measure together, then
    # the popularity filter reuses the same exchange -> one join scan
    per_route = routed.groupBy("route").agg(
        F.count("*").alias("num_lineitems"),
        F.round(F.avg("l_discount"), 6).alias("avg_discount"),
    )
    result = popular_groups(per_route, "num_lineitems")
    return top_k(result, [F.desc("avg_discount"), F.col("route")], 25)


@register(
    "q05_nation_delay_totals_unpivot",
    sql=f"""
    WITH joined AS ({_CUST_NATION_SQL}),
    sums AS (
        SELECT nation,
               round(sum(l_discount), 4) AS total_discount,
               round(sum(l_tax), 4) AS total_tax
        FROM joined GROUP BY nation
    )
    SELECT nation, 'total_discount' AS delay_type, total_discount AS total_delay FROM sums
    UNION ALL
    SELECT nation, 'total_tax' AS delay_type, total_tax AS total_delay FROM sums
    """,
)
def q05_nation_delay_totals_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group totals of two measures, reshaped long — the reference's
    cities_with_most_delays + pandas ``melt`` (reference
    delayed_flights.py:299-332), as Spark ``unpivot`` (SURVEY.md F12)."""
    cat = Catalog(spark, sf_dir)
    joined = _cust_nation_lineitems(cat)
    sums = sum_by(
        joined, ["nation"], {"l_discount": "total_discount", "l_tax": "total_tax"}
    )
    return unpivot_measures(
        sums, ["nation"], ["total_discount", "total_tax"], "delay_type", "total_delay"
    )


@register(
    "q06_supplier_volume_vs_quantity",
    sql="""
    WITH counts AS (
        SELECT l_suppkey, count(*) AS num_lineitems FROM lineitem GROUP BY l_suppkey
    ),
    sums AS (
        SELECT l_suppkey, round(sum(l_quantity), 4) AS total_qty
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT c.l_suppkey, c.num_lineitems, s.total_qty
    FROM counts c JOIN sums s USING (l_suppkey)
    """,
)
def q06_supplier_volume_vs_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """agg⋈agg on the same key — the reference's volume-vs-delay feed
    (reference delayed_flights.py:221-248, SURVEY.md J4)."""
    cat = Catalog(spark, sf_dir)
    counts = count_by(cat.lineitem, ["l_suppkey"], "num_lineitems")
    sums = sum_by(cat.lineitem, ["l_suppkey"], {"l_quantity": "total_qty"})
    return counts.join(sums, "l_suppkey")


@register(
    "q07_shipped_vs_received_by_nation",
    sql=f"""
    WITH base AS ({_NATION_PAIR_SQL}),
    dep AS (
        SELECT supp_nation AS k, round(sum(l_quantity), 4) AS shipped_total
        FROM base GROUP BY supp_nation
    ),
    arr AS (
        SELECT cust_nation AS k, round(sum(l_quantity), 4) AS received_total
        FROM base GROUP BY cust_nation
    )
    SELECT coalesce(dep.k, arr.k) AS nation,
           coalesce(shipped_total, 0) AS shipped_total,
           coalesce(received_total, 0) AS received_total
    FROM dep FULL OUTER JOIN arr ON dep.k = arr.k
    """,
)
def q07_shipped_vs_received_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two aggregates of the same input on different keys, merged
    full-outer with coalesced keys + 0-fill — the reference's
    departures-vs-arrivals per airport (reference
    delayed_flights.py:255-284, SURVEY.md J5)."""
    cat = Catalog(spark, sf_dir)
    pairs = _nation_pair_lineitems(cat)
    return two_sided_totals(
        pairs,
        left_key="supp_nation",
        right_key="cust_nation",
        measure="l_quantity",
        left_alias="shipped_total",
        right_alias="received_total",
        key_alias="nation",
    )


@register(
    "q08_hourly_event_traffic",
    sql="""
    SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day,
           count(*) AS num_events,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY hour(ts)
    ORDER BY hour_of_day
    """,
)
def q08_hourly_event_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly counts + means in ONE groupBy — the reference computes the
    count agg and the two avg aggs separately and outer-joins them on
    HOUR (reference delayed_flights.py:455-491); same key domain, so a
    single aggregate is semantics-preserving (SURVEY.md A4/J6)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.events.groupBy(F.hour("ts").cast("long").alias("hour_of_day"))
        .agg(
            F.count("*").alias("num_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .orderBy("hour_of_day")
    )


@register(
    "q09_time_slot_mean_of_means",
    sql="""
    WITH hourly AS (
        SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day,
               round(avg(value), 6) AS hourly_avg
        FROM events GROUP BY hour(ts)
    ),
    slotted AS (
        SELECT CASE
                 WHEN hour_of_day BETWEEN 6 AND 11 THEN 'Morning'
                 WHEN hour_of_day BETWEEN 12 AND 18 THEN 'Afternoon'
                 WHEN hour_of_day BETWEEN 19 AND 23 THEN 'Evening'
                 ELSE 'Night'
               END AS time_slot,
               hourly_avg
        FROM hourly
    )
    SELECT time_slot, round(avg(hourly_avg), 6) AS avg_of_hourly_avgs
    FROM slotted GROUP BY time_slot
    """,
)
def q09_time_slot_mean_of_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed two-level aggregation: mean over HOURLY means, not over
    rows — the reference's driver-side pandas re-aggregation by time
    slot (reference delayed_flights.py:500-546, SURVEY.md A10/F10),
    pushed into Spark with a when-chain bucket."""
    cat = Catalog(spark, sf_dir)
    hourly = cat.events.groupBy(
        F.hour("ts").cast("long").alias("hour_of_day")
    ).agg(F.round(F.avg("value"), 6).alias("hourly_avg"))
    return (
        hourly.withColumn("time_slot", time_slot("hour_of_day"))
        .groupBy("time_slot")
        .agg(F.round(F.avg("hourly_avg"), 6).alias("avg_of_hourly_avgs"))
    )


@register(
    "q10_order_status_decode_pct",
    sql="""
    SELECT CASE o_orderstatus
             WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Fulfilled'
             WHEN 'P' THEN 'Pending' ELSE o_orderstatus
           END AS status_label,
           count(*) AS num_orders,
           round(count(*) * 100.0 / sum(count(*)) OVER (), 4) AS pct
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status_label
    """,
)
def q10_order_status_decode_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code decode + share — the reference's cancellation-reason decode
    is a driver-side pandas dict map (reference cancelled_flights.py:
    25-34, 64-82); here a when-chain, Spark-side (SURVEY.md F10/A11)."""
    cat = Catalog(spark, sf_dir)
    decoded = decode_map(
        cat.orders,
        "o_orderstatus",
        {"O": "Open", "F": "Fulfilled", "P": "Pending"},
        alias="status_label",
    )
    counts = count_by(decoded, ["status_label"], "num_orders")
    return with_pct_of_total(counts, "num_orders", "pct").orderBy("status_label")


@register(
    "q11_fulfilled_orders_per_month",
    sql="""
    SELECT CAST(month(o_orderdate) AS BIGINT) AS order_month,
           count(*) AS num_orders
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY month(o_orderdate)
    ORDER BY order_month
    """,
)
def q11_fulfilled_orders_per_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered monthly counts — the reference's cancellations-per-month
    (reference cancelled_flights.py:103-137)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.month("o_orderdate").cast("long").alias("order_month"))
        .agg(F.count("*").alias("num_orders"))
        .orderBy("order_month")
    )


@register(
    "q12_orders_per_weekday",
    sql="""
    SELECT CAST(isodow(o_orderdate) AS BIGINT) AS day_of_week,
           count(*) AS num_orders
    FROM orders
    GROUP BY isodow(o_orderdate)
    ORDER BY day_of_week
    """,
)
def q12_orders_per_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week counts (reference cancelled_flights.py:140-173).
    ISO numbering (1=Mon..7=Sun) on both engines: Spark ``weekday()+1``
    == DuckDB ``isodow`` (Spark ``dayofweek`` is 1=Sun — a classic
    cross-engine off-by-one)."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.orders.groupBy(
            (F.weekday("o_orderdate") + 1).cast("long").alias("day_of_week")
        )
        .agg(F.count("*").alias("num_orders"))
        .orderBy("day_of_week")
    )


@register(
    "q13_return_ratio_by_priority",
    sql="""
    SELECT o.o_orderpriority AS priority,
           count(*) AS num_lineitems,
           count(CASE WHEN l.l_returnflag = 'R' THEN 1 END) AS num_returned,
           round(count(CASE WHEN l.l_returnflag = 'R' THEN 1 END) * 100.0
                 / count(*), 4) AS return_pct
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY priority
    """,
)
def q13_return_ratio_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional count + ratio per group — the reference's
    cancelled-share per airline with ``count(col)`` null-skipping
    (reference cancelled_flights.py:176-249, SURVEY.md A6)."""
    cat = Catalog(spark, sf_dir)
    returned = F.count(F.when(F.col("l_returnflag") == "R", 1))
    return (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("num_lineitems"),
            returned.alias("num_returned"),
            F.round(returned * 100.0 / F.count("*"), 4).alias("return_pct"),
        )
        .orderBy("priority")
    )


_PROFILE_COLS = ("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")

_NULL_PROFILE_SQL = (
    "SELECT "
    + ", ".join(
        f"count(CASE WHEN {c} IS NULL THEN 1 END) AS {c}_nulls" for c in _PROFILE_COLS
    )
    + ", count(*) AS total_rows FROM lineitem"
)


@register("q14_null_profile_lineitem", sql=_NULL_PROFILE_SQL)
def q14_null_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column null profile + row count — the reference runs
    a count() action plus a conditional select per table, 4 times with
    no cache (reference preprocessing.py:14-26, SURVEY.md P1/P2/A8/S7)."""
    cat = Catalog(spark, sf_dir)
    return null_profile(cat.lineitem, _PROFILE_COLS)


@register(
    "q15_timestamp_rebuild_roundtrip",
    sql="""
    SELECT count(CASE WHEN strptime(
                   strftime(ts, '%Y-%m-%d ')
                     || lpad(CAST(hour(ts) AS VARCHAR), 2, '0') || ':'
                     || lpad(CAST(minute(ts) AS VARCHAR), 2, '0') || ':00',
                   '%Y-%m-%d %H:%M:%S') = date_trunc('minute', ts)
                 THEN 1 END) AS matched,
           count(*) AS total_rows
    FROM events
    """,
)
def q15_timestamp_rebuild_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HHMM-int → timestamp assembly (lpad/substr/concat/to_timestamp,
    reference preprocessing.py:35-53, SURVEY.md F1-F4): rebuild each
    event's minute-truncated timestamp from integer parts and count
    exact round-trips."""
    cat = Catalog(spark, sf_dir)
    hhmm = F.hour("ts") * 100 + F.minute("ts")
    rebuilt = hhmm_to_timestamp(F.year("ts"), F.month("ts"), F.dayofmonth("ts"), hhmm)
    return cat.events.agg(
        F.count(F.when(rebuilt == F.date_trunc("minute", F.col("ts")), 1)).alias(
            "matched"
        ),
        F.count("*").alias("total_rows"),
    )


#: Distinct directed nation→nation edges — the single definition q16 and
#: every graph_plans query build on (one place to change canonicalization).
_NATION_EDGES_SQL = f"""
    SELECT DISTINCT supp_nation AS src, cust_nation AS dst
    FROM ({_NATION_PAIR_SQL})
"""


def _nation_edges(cat: Catalog) -> DataFrame:
    """Distinct directed nation→nation edges (the reference builds its
    edge list the same way from ORIGIN/DESTINATION columns, reference
    graphframes_flights.py:30-31, 112-113)."""
    return (
        _nation_pair_lineitems(cat)
        .select(F.col("supp_nation").alias("src"), F.col("cust_nation").alias("dst"))
        .distinct()
    )


@register(
    "q16_nation_in_degree",
    sql=f"""
    WITH edges AS ({_NATION_EDGES_SQL})
    SELECT dst, count(*) AS in_degree
    FROM edges GROUP BY dst
    ORDER BY in_degree DESC, dst
    LIMIT 15
    """,
)
def q16_nation_in_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph in-degree natively: distinct edges then groupBy(dst).count —
    exactly GraphFrames' inDegrees semantics without the library
    (reference graphframes_flights.py:37-41, 119-123; SURVEY.md G2)."""
    cat = Catalog(spark, sf_dir)
    in_deg = _nation_edges(cat).groupBy("dst").agg(F.count("*").alias("in_degree"))
    return top_k(in_deg, [F.desc("in_degree"), F.col("dst")], 15)


@register(
    "q17_top_customers_per_nation",
    sql=f"""
    WITH spend AS (
        SELECT nation, c_name, round(sum(l_extendedprice), 2) AS total_spend
        FROM (
            SELECT n.n_name AS nation, c.c_name, l.l_extendedprice
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
        ) GROUP BY nation, c_name
    )
    SELECT nation, c_name, total_spend, CAST(rnk AS INTEGER) AS rank
    FROM (
        SELECT nation, c_name, total_spend,
               row_number() OVER (
                   PARTITION BY nation
                   ORDER BY total_spend DESC, c_name
               ) AS rnk
        FROM spend
    ) WHERE rnk <= 3
    """,
)
def q17_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number — the windowed variant the
    reference lacks entirely (SURVEY.md §2.9)."""
    cat = Catalog(spark, sf_dir)
    joined = (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), "c_name", "l_extendedprice")
    )
    spend = sum_by(joined, ["nation", "c_name"], {"l_extendedprice": "total_spend"}, scale=2)
    return top_k_per_group(
        spend,
        partition_keys=["nation"],
        order=[F.desc("total_spend"), F.col("c_name")],
        k=3,
        rank_alias="rank",
    )


@register(
    "q18_nation_order_counts_left_join",
    sql="""
    WITH counts AS (
        SELECT c.c_nationkey, count(*) AS num_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey
    )
    SELECT n.n_name AS nation, coalesce(counts.num_orders, 0) AS num_orders
    FROM nation n LEFT JOIN counts ON n.n_nationkey = counts.c_nationkey
    ORDER BY nation
    """,
)
def q18_nation_order_counts_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-preserving left join + coalesce(0) — the reference's airport
    totals ⟵ airports dim decorate (reference delayed_flights.py:287-296,
    SURVEY.md J7/F7)."""
    cat = Catalog(spark, sf_dir)
    counts = (
        cat.orders.join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("__num"))
    )
    return (
        cat.nation.join(counts, F.col("n_nationkey") == F.col("c_nationkey"), "left")
        .select(
            F.col("n_name").alias("nation"),
            F.coalesce(F.col("__num"), F.lit(0)).alias("num_orders"),
        )
        .orderBy("nation")
    )


@register(
    "q19_active_nations_union_distinct",
    sql=f"""
    WITH base AS ({_NATION_PAIR_SQL})
    SELECT supp_nation AS nation FROM base
    UNION
    SELECT cust_nation AS nation FROM base
    """,
)
def q19_active_nations_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union + distinct — the reference's graph vertex set (origin states
    ∪ destination states, reference graphframes_flights.py:108-109,
    SURVEY.md U1). ``unionByName`` preferred over positional union."""
    cat = Catalog(spark, sf_dir)
    pairs = _nation_pair_lineitems(cat)
    # explode instead of two union branches: the branches' differing
    # column pruning blocks exchange reuse, so the 6-way join upstream
    # would execute TWICE (the anti-pattern two_sided_totals documents)
    return (
        pairs.select(
            F.explode(F.array("supp_nation", "cust_nation")).alias("nation")
        )
        .distinct()
    )


@register(
    "q48_brand_revenue_topk",
    sql="""
    SELECT p.p_brand AS brand,
           count(*) AS num_lineitems,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    ORDER BY revenue DESC, brand
    LIMIT 10
    """,
)
def q48_brand_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈part-dim revenue rollup, top-10 brands — the J1-shape join
    against the remaining dimension (part). The part table grows with
    SF, so no broadcast hint: AQE broadcasts while it fits and falls
    back to a shuffle join at scale."""
    cat = Catalog(spark, sf_dir)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_brand = (
        cat.lineitem.join(cat.part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").alias("num_lineitems"),
            F.round(F.sum(revenue), 4).alias("revenue"),
        )
    )
    return top_k(per_brand, [F.desc("revenue"), F.col("brand")], 10)


@register(
    "q49_region_nation_customers",
    sql="""
    SELECT r.r_name AS region, n.n_name AS nation, count(*) AS num_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY region, nation
    """,
)
def q49_region_nation_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-level dimension chain (region <- nation <- customer), both
    tiny dims broadcast — the reference's J2 chained-dim shape
    (reference delayed_flights.py:99-100) over the full hierarchy."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.customer.join(
            F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("num_customers"))
        .orderBy("region", "nation")
    )


@register(
    "q50_churned_day1_users",
    sql="""
    SELECT user_id FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-01'
    EXCEPT
    SELECT user_id FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-30'
    ORDER BY user_id
    """,
)
def q50_churned_day1_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: users active on day 1 but not day 30 (cohort
    churn) — the §2.7 family beyond the reference's union+distinct (U1).
    ``subtract`` is EXCEPT DISTINCT (``exceptAll`` is the bag form,
    which would keep a user merely for having MORE day-1 rows than
    day-30 rows). Plans as a left-anti aggregate, one shuffle per side,
    with the date filters pushed to the scans."""
    cat = Catalog(spark, sf_dir)

    def users_on(day: str) -> DataFrame:
        return cat.events.filter(F.to_date("ts") == F.lit(day)).select("user_id")

    return users_on("2024-01-01").subtract(users_on("2024-01-30")).orderBy("user_id")


@register(
    "q51_monthly_order_running_total",
    sql="""
    WITH monthly AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               count(*) AS num_orders
        FROM orders
        -- an undated order has no place on the timeline (and Spark
        -- windows order NULLS FIRST where DuckDB orders NULLS LAST, so
        -- a NULL month would shift every running total differently in
        -- the two engines — wave-5 dirty-corpus finding)
        WHERE o_orderdate IS NOT NULL
        GROUP BY 1
    )
    SELECT strftime(month, '%Y-%m') AS month,
           num_orders,
           CAST(sum(num_orders) OVER (
               ORDER BY month ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS running_total
    FROM monthly ORDER BY month
    """,
)
def q51_monthly_order_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window over the (tiny, post-aggregation) monthly rollup
    — lag/lead/cumsum family (§2.9). The unpartitioned running-total
    window is applied ONLY to the ~months-sized aggregate, never to raw
    rows (single-task funnel rule; functions/windows.py docstring)."""
    from pyspark.sql.window import Window

    cat = Catalog(spark, sf_dir)
    monthly = (
        # undated orders have no month — drop at the scan (see oracle)
        cat.orders.filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.count("*").alias("num_orders"))
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        monthly.withColumn("running_total", F.sum("num_orders").over(w))
        .orderBy("month")
    )


@register(
    "q93_order_size_distribution",
    sql="""
    WITH per_order AS (
        SELECT o.o_orderkey, count(l.l_orderkey) AS n_items
        FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey
    )
    SELECT n_items, count(*) AS n_orders,
           round(count(*) * 100.0 / sum(count(*)) OVER (), 4) AS pct
    FROM per_order GROUP BY n_items ORDER BY n_items
    """,
)
def q93_order_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-size histogram INCLUDING empty orders: the left join +
    count(join-side column) keeps orders with zero lineitems as
    n_items=0 (an inner join silently drops them — the fill-rate bug).
    count(col) null-skipping (SURVEY A6) is what makes the zero bucket
    correct."""
    cat = Catalog(spark, sf_dir)
    per_order = (
        cat.orders.select("o_orderkey")
        .join(
            cat.lineitem.select("l_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_items"))
    )
    hist = per_order.groupBy("n_items").agg(F.count(F.lit(1)).alias("n_orders"))
    return with_pct_of_total(hist, "n_orders", alias="pct", scale=4).orderBy(
        "n_items"
    )


@register(
    "q112_fulfillment_latency",
    sql="""
    SELECT o.o_orderpriority AS priority,
           count(*) AS n_items,
           round(quantile_cont(date_diff('day', o.o_orderdate, l.l_shipdate), 0.5), 1)
               AS p50_days,
           round(quantile_cont(date_diff('day', o.o_orderdate, l.l_shipdate), 0.95), 1)
               AS p95_days,
           CAST(sum(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END)
                AS BIGINT) AS shipped_before_order
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY priority ORDER BY priority
    """,
)
def q112_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency percentiles per priority, plus the
    impossible-negative-latency count (a built-in data-quality probe:
    ship date before order date means a broken feed, and it must be
    COUNTED, not silently clipped). Fact-fact equi-join on the order
    key; the day-difference derives before aggregation so the
    percentile input is one int per row."""
    cat = Catalog(spark, sf_dir)
    days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        cat.lineitem.join(cat.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_orderpriority").alias("priority"), days.alias("d"))
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.percentile("d", F.lit(0.5)), 1).alias("p50_days"),
            F.round(F.percentile("d", F.lit(0.95)), 1).alias("p95_days"),
            F.sum(F.when(F.col("d") < 0, 1).otherwise(0))
            .cast("long")
            .alias("shipped_before_order"),
        )
        .orderBy("priority")
    )


@register(
    "q113_brand_concentration_hhi",
    sql="""
    WITH brand_type AS (
        SELECT p.p_type AS ptype, p.p_brand AS brand,
               sum(l.l_extendedprice) AS revenue
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY ptype, brand
    ),
    shares AS (
        SELECT ptype,
               revenue / sum(revenue) OVER (PARTITION BY ptype) AS s
        FROM brand_type
    )
    SELECT ptype,
           CAST(count(*) AS BIGINT) AS n_brands,
           round(sum(pow(s, 2)), 6) AS hhi
    FROM shares
    GROUP BY ptype
    ORDER BY ptype
    """,
)
def q113_brand_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand concentration per part type via the Herfindahl index (sum
    of squared revenue shares; 1/n = perfectly even, 1.0 = monopoly).
    Shares come from a window over the (type, brand) AGGREGATE — the
    share-then-reaggregate pattern, never a window over lineitem."""
    from pyspark.sql.window import Window

    cat = Catalog(spark, sf_dir)
    brand_type = (
        cat.lineitem.join(
            F.broadcast(cat.part), F.col("l_partkey") == F.col("p_partkey")
        )
        .groupBy(F.col("p_type").alias("ptype"), F.col("p_brand").alias("brand"))
        .agg(F.sum("l_extendedprice").alias("revenue"))
    )
    share = F.col("revenue") / F.sum("revenue").over(Window.partitionBy("ptype"))
    return (
        brand_type.select("ptype", share.alias("s"))
        .groupBy("ptype")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_brands"),
            F.round(F.sum(F.pow(F.col("s"), F.lit(2.0))), 6).alias("hhi"),
        )
        .orderBy("ptype")
    )
