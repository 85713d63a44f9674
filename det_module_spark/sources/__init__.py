"""Source/sink layer: parquet tables, exact-NA CSV, raster/vector loaders."""

from det_module_spark.sources.tables import TABLES, load_table, load_all

__all__ = ["TABLES", "load_table", "load_all"]
