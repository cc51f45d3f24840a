"""MD5 surrogate keys.

The reference derives opaque ids by MD5-hashing concatenated fields:
device_id (bt_ready.py:81-88, wt_ready.py:77-84) and per-dataset
record_id / row_id (bt_extract_soc.py:132-135, wt_extract_soc.py:81-86,
gs_agg_extract_soc.py:126-131).  Exact parity is achievable with the
built-in md5(concat(...)) as long as concat order and string casts match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_concat(*cols: Column | str, sep: str = "") -> Column:
    """md5 of the concatenation of ``cols`` cast to string.

    Null handling: concat_ws skips nulls (the reference formats ``None``
    into f-strings, so pipelines should fillna first when parity with a
    specific reference hash matters).
    """
    cast = [F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
    return F.md5(F.concat_ws(sep, *cast))


def device_id(lat: Column | str, lon: Column | str, sensor_name: Column | str) -> Column:
    """Surrogate device id — md5 over (lat, lon, name) like bt_ready.py:81-88."""
    return md5_concat(lat, lon, sensor_name)


def record_id(*hash_fields: Column | str) -> Column:
    """Content-hash row key making publish upserts idempotent
    (docs/reprocessing.md:5-17); per-type hashFields order matters."""
    return md5_concat(*hash_fields)
