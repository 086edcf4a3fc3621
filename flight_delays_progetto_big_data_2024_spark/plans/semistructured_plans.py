"""Semi-structured + multi-level aggregation queries.

The reference's data is flat CSV (SURVEY.md §1.3: primitives only).
Real event pipelines carry JSON property bags and need subtotal
rollups; both are first-class Spark surface (``get_json_object``,
``rollup``) and both are fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flight_delays_progetto_big_data_2024_spark.plans.registry import register
from flight_delays_progetto_big_data_2024_spark.sources.readers import Catalog


@register(
    "q46_event_props_json",
    sql="""
    -- json_valid guard: DuckDB's ->> hard-errors on malformed/empty
    -- props where Spark's get_json_object yields NULL (wave-5 finding).
    -- The integral-pattern gate before the cast is the round-10
    -- JSON-value-domain contract: the engines' raw ->>/get_json_object
    -- strings agree byte-for-byte (measured on 10 edge shapes,
    -- duplicate keys and 1e2 included), but their casts DIVERGE —
    -- Spark's ANSI cast CRASHES on any non-integral string
    -- ('2147483648', 'abc', 'true', '[1]', '7.9'), Spark's try_cast
    -- NULLs '7.9' while DuckDB's TRY_CAST rounds it to 8. Gating both
    -- engines on ^-?[0-9]+$ and TRY-casting makes k = "the value when
    -- the bag carries an int32" everywhere (overflow -> NULL via
    -- try_cast in both).
    WITH j AS (
        -- NESTED CASE, not an AND conjunct: DuckDB's adaptive
        -- conjunction reordering may evaluate ->> BEFORE json_valid,
        -- and ->> hard-errors on malformed JSON — with AND the guard
        -- is not short-circuit-safe and the failure only shows up at
        -- sf0.1-scale row counts (round-10 advice: 30/30 failures at
        -- 100k rows with 1% malformed bags, never at <=20k). CASE
        -- branches evaluate lazily, so ->> only runs on valid rows.
        SELECT event_type,
               CASE WHEN json_valid(props) THEN
                    CASE WHEN regexp_matches(props->>'k', '^-?[0-9]+$')
                         THEN TRY_CAST(props->>'k' AS INTEGER) END
               END AS k
        FROM events
    )
    SELECT event_type,
           count(k) AS n_with_k,
           round(avg(k), 6) AS avg_k,
           max(k) AS max_k
    FROM j
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q46_event_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property-bag extraction (``get_json_object`` — JVM-side JSON
    path, no UDF) aggregated per event type; count() skips rows whose
    bag lacks the key, matching SQL NULL semantics.

    Value-domain contract (round-10 JSON probes, see the oracle
    comment): ``k`` counts only when the bag carries an INTEGRAL number
    that fits int32 — the regex gate keeps Spark's ANSI cast from
    crashing on a wrong-typed bag ('{"k": "abc"}' was a full-query
    abort) and pins the '7.9' rounding split between the engines'
    TRY_CASTs to a shared NULL."""
    cat = Catalog(spark, sf_dir)
    raw = F.get_json_object("props", "$.k")
    k = F.when(raw.rlike("^-?[0-9]+$"), raw).try_cast("int")
    return (
        cat.events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q47_nation_priority_rollup",
    sql="""
    SELECT CASE WHEN GROUPING(n.n_name) = 1 THEN 'ALL' ELSE n.n_name END AS nation,
           CASE WHEN GROUPING(o.o_orderpriority) = 1 THEN 'ALL'
                ELSE o.o_orderpriority END AS priority,
           count(*) AS num_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP(n.n_name, o.o_orderpriority)
    -- Spark's Expand-based grouping sets emit NO rows over an empty
    -- input (0 input rows -> 0 expanded rows), while DuckDB follows
    -- the SQL-standard '()' set and emits a count-0 grand total. The
    -- engine semantics is Spark's; every real rollup group aggregates
    -- >= 1 row, so this clause ONLY removes the empty-input artifact
    -- (round-12 degenerate-relation sweep).
    HAVING count(*) > 0
    ORDER BY nation, priority
    """,
)
def q47_nation_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup subtotals (nation, priority) -> (nation) -> grand total in
    one pass — the multi-level aggregation family the reference computes
    with separate queries. Subtotal levels are labeled via grouping()
    (not null-coalescing, which would clash with genuinely-null keys)."""
    cat = Catalog(spark, sf_dir)
    joined = (
        cat.orders.join(cat.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cat.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("n"), F.col("o_orderpriority").alias("p"))
    )
    return (
        joined.rollup("n", "p")
        .agg(
            F.count("*").alias("num_orders"),
            # grouping() is only legal inside the rollup aggregate
            F.grouping("n").alias("__gn"),
            F.grouping("p").alias("__gp"),
        )
        .select(
            F.when(F.col("__gn") == 1, F.lit("ALL")).otherwise(F.col("n")).alias("nation"),
            F.when(F.col("__gp") == 1, F.lit("ALL")).otherwise(F.col("p")).alias("priority"),
            "num_orders",
        )
        .orderBy("nation", "priority")
    )
