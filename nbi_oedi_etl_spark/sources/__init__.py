from nbi_oedi_etl_spark.sources.parquet import (
    TABLES,
    load_tables,
    read_partitioned,
    read_table,
    register_views,
)

__all__ = ["TABLES", "load_tables", "read_partitioned", "read_table", "register_views"]
