"""Global-aggregate column helpers.

The reference computes global scalars by ``.collect()[0][0]`` and
re-filters with the Python scalar (reference delayed_flights.py:29-36,
147-152, 181-187) — a pipeline breaker. Two lazy replacements exist:

1. empty-partition window (these helpers) — convenient as a Column
   expression, but WindowExec with no partition keys moves ALL rows to
   a single task. Only safe when the input is already tiny (a handful
   of group rows).
2. ``crossJoin(broadcast(df.agg(...)))`` — fully parallel; what the
   operators in ``operators.relational`` (popular_groups,
   with_pct_of_total) use. Prefer this at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from flight_delays_progetto_big_data_2024_spark.functions.coerce import _c
from pyspark.sql.window import Window


def global_avg(col: str | Column) -> Column:
    """Grand mean as a per-row column. Single-task window — only for
    already-tiny inputs; prefer crossJoin(broadcast(agg)) at scale."""
    return F.avg(col).over(Window.partitionBy())


def global_sum(col: str | Column) -> Column:
    """Grand total as a per-row column. Same caveat as global_avg."""
    return F.sum(col).over(Window.partitionBy())


def pct_of_total(col: str | Column, scale: int = 4) -> Column:
    """``col / sum(col) * 100`` (reference delayed_flights.py:147-152),
    rounded for stable cross-engine comparison. Same caveat as
    global_avg; operators.relational.with_pct_of_total is the scalable
    form."""
    c = _c(col)
    return F.round(c / global_sum(c) * 100.0, scale)
