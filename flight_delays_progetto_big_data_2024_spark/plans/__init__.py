"""Import all plan modules so their ``@register`` decorators populate the
registry. ``from ...plans import registry`` is the single entry point."""

from flight_delays_progetto_big_data_2024_spark.plans import registry

from flight_delays_progetto_big_data_2024_spark.plans import analog  # noqa: F401
from flight_delays_progetto_big_data_2024_spark.plans import graph_plans  # noqa: F401
from flight_delays_progetto_big_data_2024_spark.plans import llm_plans  # noqa: F401
from flight_delays_progetto_big_data_2024_spark.plans import pipeline_plans  # noqa: F401
from flight_delays_progetto_big_data_2024_spark.plans import reshape_plans  # noqa: F401
from flight_delays_progetto_big_data_2024_spark.plans import temporal_plans  # noqa: F401
from flight_delays_progetto_big_data_2024_spark.plans import semistructured_plans  # noqa: F401
from flight_delays_progetto_big_data_2024_spark.plans import ordered_plans  # noqa: F401
from flight_delays_progetto_big_data_2024_spark.plans import sketch_plans  # noqa: F401
from flight_delays_progetto_big_data_2024_spark.plans import behavior_plans  # noqa: F401

__all__ = ["registry"]
