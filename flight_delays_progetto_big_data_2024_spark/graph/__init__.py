from flight_delays_progetto_big_data_2024_spark.graph.algorithms import (
    degrees,
    pagerank,
    triangle_count,
    undirected_edges,
)

__all__ = ["degrees", "pagerank", "triangle_count", "undirected_edges"]
