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

from flight_delays_progetto_big_data_2024_spark.operators.relational import (
    avg_by,
    count_by,
    popular_groups,
    sum_by,
    top_k,
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
    counts = count_by(joined, ["nation"], "num_lineitems")
    popular = popular_groups(counts, "num_lineitems")
    measures = avg_by(
        joined, ["nation"], {"l_discount": "avg_discount", "l_tax": "avg_tax"}
    )
    result = popular.join(measures, "nation").withColumn(
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


_ROUTED_SQL = """
    SELECT sn.n_name || '-' || cn.n_name AS route, l.l_discount
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
"""


def _routed_lineitems(cat: Catalog) -> DataFrame:
    """Route key = supplier-nation → customer-nation, the analog of the
    reference's ORIGIN-DESTINATION route (reference
    delayed_flights.py:174-175 ``concat_ws('-', ...)``). nation is joined
    twice under different aliases (the reference renames columns to dodge
    ambiguity, its :95-96; aliasing is the idiomatic fix)."""
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
        .join(F.broadcast(cat.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.concat_ws("-", "supp_nation", "cust_nation").alias("route"),
            "l_discount",
        )
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
    counts = count_by(routed, ["route"], "num_lineitems")
    popular = popular_groups(counts, "num_lineitems")
    measures = avg_by(routed, ["route"], {"l_discount": "avg_discount"})
    result = popular.join(measures, "route")
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
