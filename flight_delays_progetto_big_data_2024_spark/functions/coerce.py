"""Shared str|Column coercion for the column-expression libraries."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    """Accept a column name or a Column expression."""
    return F.col(col) if isinstance(col, str) else col
