"""Explicit schemas for the reference's flight-shaped CSV inputs.

The reference infers these (reference main.py:24-29); column inventory
and types follow SURVEY.md §1.2 / FIXTURES.md §1. A user of the reference
switches by calling ``read_csv(spark, path, FLIGHTS_SCHEMA)`` — one scan,
no inference.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def _st(pairs: list[tuple[str, object]]) -> StructType:
    return StructType([StructField(n, t, nullable=True) for n, t in pairs])


#: ~5.8M-row fact table (Kaggle "2015 Flight Delays and Cancellations").
FLIGHTS_SCHEMA = _st(
    [
        ("YEAR", IntegerType()),
        ("MONTH", IntegerType()),
        ("DAY", IntegerType()),
        ("DAY_OF_WEEK", IntegerType()),
        ("AIRLINE", StringType()),
        ("FLIGHT_NUMBER", IntegerType()),
        ("TAIL_NUMBER", StringType()),
        ("ORIGIN_AIRPORT", StringType()),
        ("DESTINATION_AIRPORT", StringType()),
        ("SCHEDULED_DEPARTURE", IntegerType()),
        ("DEPARTURE_TIME", IntegerType()),
        ("DEPARTURE_DELAY", IntegerType()),
        ("TAXI_OUT", IntegerType()),
        ("WHEELS_OFF", IntegerType()),
        ("SCHEDULED_TIME", IntegerType()),
        ("ELAPSED_TIME", IntegerType()),
        ("AIR_TIME", IntegerType()),
        ("DISTANCE", IntegerType()),
        ("WHEELS_ON", IntegerType()),
        ("TAXI_IN", IntegerType()),
        ("SCHEDULED_ARRIVAL", IntegerType()),
        ("ARRIVAL_TIME", IntegerType()),
        ("ARRIVAL_DELAY", IntegerType()),
        ("DIVERTED", IntegerType()),
        ("CANCELLED", IntegerType()),
        ("CANCELLATION_REASON", StringType()),
        ("AIR_SYSTEM_DELAY", IntegerType()),
        ("SECURITY_DELAY", IntegerType()),
        ("AIRLINE_DELAY", IntegerType()),
        ("LATE_AIRCRAFT_DELAY", IntegerType()),
        ("WEATHER_DELAY", IntegerType()),
    ]
)

#: ~322-row airport dimension.
AIRPORTS_SCHEMA = _st(
    [
        ("IATA_CODE", StringType()),
        ("AIRPORT", StringType()),
        ("CITY", StringType()),
        ("STATE", StringType()),
        ("COUNTRY", StringType()),
        ("LATITUDE", DoubleType()),
        ("LONGITUDE", DoubleType()),
    ]
)

#: 14-row airline dimension.
AIRLINES_SCHEMA = _st(
    [
        ("IATA_CODE", StringType()),
        ("AIRLINE", StringType()),
    ]
)

#: Cancellation-reason decode, as *data* instead of the reference's
#: hard-coded driver-side dict (reference cancelled_flights.py:25-30).
CANCELLATION_REASONS = [
    ("A", "Airline/Carrier"),
    ("B", "Weather"),
    ("C", "National Air System"),
    ("D", "Security"),
]
