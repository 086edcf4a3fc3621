from flight_delays_progetto_big_data_2024_spark.sources.readers import (
    TESTDATA_TABLES,
    Catalog,
    load_table,
    read_csv,
)

__all__ = ["Catalog", "TESTDATA_TABLES", "load_table", "read_csv"]
