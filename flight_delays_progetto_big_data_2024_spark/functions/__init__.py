from flight_delays_progetto_big_data_2024_spark.functions.windows import (
    global_avg,
    global_sum,
    pct_of_total,
)
from flight_delays_progetto_big_data_2024_spark.functions.timeparts import (
    hhmm_to_time_string,
    hhmm_to_timestamp,
    time_slot,
)

__all__ = [
    "global_avg",
    "global_sum",
    "pct_of_total",
    "hhmm_to_time_string",
    "hhmm_to_timestamp",
    "time_slot",
]
