"""Scalar column-expression helpers (SURVEY.md §2.8).

Everything here is a pure Column expression (JVM-side, codegen'd) —
no Python UDFs in the hot path.
"""

from atd_data_lake_spark.functions.ids import md5_concat, device_id, record_id
from atd_data_lake_spark.functions.datetime_fns import timebin_15min, day_of_week_ref
from atd_data_lake_spark.functions.geo import haversine_feet

__all__ = [
    "md5_concat",
    "device_id",
    "record_id",
    "timebin_15min",
    "day_of_week_ref",
    "haversine_feet",
]
