from flight_delays_progetto_big_data_2024_spark.operators.relational import (
    count_by,
    avg_by,
    sum_by,
    decode_map,
    dim_decorate,
    popular_groups,
    top_k,
    top_k_per_group,
    two_sided_totals,
    unpivot_measures,
    with_pct_of_total,
)
from flight_delays_progetto_big_data_2024_spark.operators.prep import (
    null_profile,
    split_by_flag,
)

__all__ = [
    "count_by",
    "avg_by",
    "sum_by",
    "decode_map",
    "dim_decorate",
    "popular_groups",
    "top_k",
    "top_k_per_group",
    "two_sided_totals",
    "unpivot_measures",
    "with_pct_of_total",
    "null_profile",
    "split_by_flag",
]
