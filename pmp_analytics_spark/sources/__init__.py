from pmp_analytics_spark.sources.reader import (
    TABLES,
    all_string_schema,
    load_table,
    load_tables,
    read_csv_strings,
)

__all__ = [
    "TABLES",
    "all_string_schema",
    "load_table",
    "load_tables",
    "read_csv_strings",
]
