from .readers import (
    load_table,
    load_tables,
    read_csv_gz,
    read_json_ads,
    read_orc,
    read_parquet_lake,
)

__all__ = [
    "load_table",
    "load_tables",
    "read_csv_gz",
    "read_json_ads",
    "read_orc",
    "read_parquet_lake",
]
