#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line with per-query wall
times. Results are fully materialized via collect(); headline queries
return either bounded output (aggregates / top-k / pair sets) or
top-k-per-group output that is O(documents) with a small constant
(q59: 3 rows/doc) — nothing O(tokens) or O(pairs-unfiltered) that
would make driver transfer dominate the measured time at higher SF.
"""

from __future__ import annotations

import json
import os
import sys
import time

#: Headline set: one per operator family — core join+agg shapes, window
#: top-k, graph (PageRank/triangles), dedup (exact/Jaccard/MinHash/
#: SimHash), similarity search, text profiling, windowed events,
#: lexical ranking (TF-IDF).
HEADLINE = [
    "q01_popular_nations_avg_delay",
    "q04_popular_routes_avg_delay",
    "q07_shipped_vs_received_by_nation",
    "q13_return_ratio_by_priority",
    "q17_top_customers_per_nation",
    "q20_nation_pagerank",
    "q21_nation_triangle_count",
    "q23_dedup_exact_documents",
    "q25_doc_quality_scores",
    "q30_embedding_topk_cosine",
    "q31_embedding_cosine_histogram",
    "q32_ngram_jaccard_pairs",
    "q33_minhash_lsh_near_dups",
    "q34_simhash_near_dups",
    "q39_tumbling_hourly_events",
    "q41_user_session_windows",
    "q43_purchase_asof_last_click",
    "q44_embedding_ivf_topk",
    "q59_tfidf_top_terms",
    "q69_promo_window_shipments",
    "q72_heavy_hitter_terms",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from flight_delays_progetto_big_data_2024_spark.plans import registry
    from flight_delays_progetto_big_data_2024_spark.session import get_spark

    spark = get_spark("flight-delays-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warm-up: JVM JIT, parquet footer reads + file listings for
    # every table, and one representative query end-to-end
    from flight_delays_progetto_big_data_2024_spark.sources.readers import (
        TESTDATA_TABLES,
        Catalog,
    )

    cat = Catalog(spark, sf_dir)
    for table in TESTDATA_TABLES:
        # noop write materializes EVERY column (count() prunes them all,
        # which left the first text/embedding-reading query paying the
        # cold page-cache read and made per-query times order-dependent)
        cat.table(table).write.format("noop").mode("overwrite").save()
    registry.QUERIES[HEADLINE[0]](spark, sf_dir).collect()

    times: dict[str, float] = {}
    for name in HEADLINE:
        start = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).collect()
        times[name] = round(time.perf_counter() - start, 3)

    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = None

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_seconds",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
