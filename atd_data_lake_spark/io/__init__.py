from atd_data_lake_spark.io.reader import read_table

__all__ = ["read_table"]
