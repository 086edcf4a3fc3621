"""Time-part column expressions (SURVEY.md §2.6 F1-F4, F10).

The reference assembles timestamps from (YEAR, MONTH, DAY, HHMM-int)
with lpad/substr/concat/to_timestamp (reference preprocessing.py:35-53)
and buckets hours into named time slots with a driver-side Python
function applied in pandas (reference delayed_flights.py:500-511).
Both are pure column expressions here — JVM-side, codegen-friendly,
usable at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from flight_delays_progetto_big_data_2024_spark.functions.coerce import _c


def hhmm_to_time_string(hhmm: str | Column) -> Column:
    """int HHMM (e.g. 637) -> 'HH:MM:00' string (reference
    preprocessing.py:57-72)."""
    padded = F.lpad(_c(hhmm).cast("string"), 4, "0")
    return F.concat(
        F.substring(padded, 1, 2), F.lit(":"), F.substring(padded, 3, 2), F.lit(":00")
    )


def hhmm_to_timestamp(
    year: str | Column, month: str | Column, day: str | Column, hhmm: str | Column
) -> Column:
    """(YEAR, MONTH, DAY, int HHMM) -> timestamp (reference
    preprocessing.py:35-53: lpad + substr + concat + to_timestamp).

    try_to_timestamp, not to_timestamp: the reference ran Spark 3 with
    ANSI off, where an unparseable composite (e.g. the real DOT on-time
    data's midnight encoding 2400, or a corrupt 2461) silently became
    NULL. Under Spark 4's default ANSI mode the same expression ABORTS
    the query — try_to_timestamp reproduces the reference's observable
    NULL-on-invalid behavior."""
    date_part = F.concat_ws(
        "-",
        _c(year).cast("string"),
        F.lpad(_c(month).cast("string"), 2, "0"),
        F.lpad(_c(day).cast("string"), 2, "0"),
    )
    return F.try_to_timestamp(
        F.concat(date_part, F.lit(" "), hhmm_to_time_string(hhmm)),
        F.lit("yyyy-MM-dd HH:mm:ss"),
    )


def time_slot(hour: str | Column) -> Column:
    """Hour-of-day -> slot label (reference delayed_flights.py:500-508).

    Same boundaries as the reference: 6-11 Morning, 12-18 Afternoon,
    19-23 Evening, else Night. (The reference's ``<= 24`` branch is
    unreachable since ``hour() in [0, 23]`` — SURVEY.md §2.6 F10.)
    """
    h = _c(hour)
    return (
        F.when((h >= 6) & (h <= 11), F.lit("Morning"))
        .when((h >= 12) & (h <= 18), F.lit("Afternoon"))
        .when((h >= 19) & (h <= 23), F.lit("Evening"))
        .otherwise(F.lit("Night"))
    )
