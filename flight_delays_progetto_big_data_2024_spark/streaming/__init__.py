from flight_delays_progetto_big_data_2024_spark.streaming.windowed import (
    read_event_stream,
    stream_tumbling_counts,
    tumbling_counts,
)

__all__ = ["read_event_stream", "stream_tumbling_counts", "tumbling_counts"]
