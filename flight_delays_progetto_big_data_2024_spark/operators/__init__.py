"""Operator namespace: parameterized DataFrame -> DataFrame functions.

Re-exports the most commonly composed operators; specialized families
(dedup, similarity, ranking, sampling, multimodal, quality, skew,
temporal, curation) are imported from their modules directly.
"""

from flight_delays_progetto_big_data_2024_spark.operators.prep import (
    drop_columns,
    drop_null_rows,
    fill_nulls,
    null_profile,
    split_by_flag,
)
from flight_delays_progetto_big_data_2024_spark.operators.quality import (
    constraint_report,
)
from flight_delays_progetto_big_data_2024_spark.operators.relational import (
    avg_by,
    count_by,
    decode_map,
    dim_decorate,
    pivot_table,
    popular_groups,
    sum_by,
    top_k,
    top_k_per_group,
    two_sided_totals,
    unpivot_measures,
    with_pct_of_total,
)
from flight_delays_progetto_big_data_2024_spark.operators.ordered import (
    bucketed_running_sum,
    max_concurrency,
    weighted_median,
    winsorize,
)
from flight_delays_progetto_big_data_2024_spark.operators.temporal import (
    asof_join,
    range_join_buckets,
    scd2_from_changes,
    session_windows,
    snapshot_as_of,
)

__all__ = [
    "asof_join",
    "avg_by",
    "bucketed_running_sum",
    "max_concurrency",
    "snapshot_as_of",
    "weighted_median",
    "winsorize",
    "constraint_report",
    "count_by",
    "decode_map",
    "dim_decorate",
    "drop_columns",
    "drop_null_rows",
    "fill_nulls",
    "null_profile",
    "pivot_table",
    "popular_groups",
    "range_join_buckets",
    "scd2_from_changes",
    "session_windows",
    "split_by_flag",
    "sum_by",
    "top_k",
    "top_k_per_group",
    "two_sided_totals",
    "unpivot_measures",
    "with_pct_of_total",
]
