"""Date/time expressions (SURVEY.md §2.8).

Covers the reference's date-part extraction (wt_extract_soc.py:73-79),
the 15-minute ``timebin`` string — which uses *round*, not floor, so
minute 53+ yields "HH:60" (wt_extract_soc.py:79, a quirk preserved for
parity) — and day_of_week = (weekday()+1)%7 i.e. Sunday=0
(wt_extract_soc.py:78, gs_agg_extract_soc.py:124).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_instant(df, ts_col: str) -> Column:
    """Return ``ts_col`` as a TIMESTAMP (instant) column regardless of
    whether the source stored TIMESTAMP or TIMESTAMP_NTZ.

    Parquet `timestamp[us]` with isAdjustedToUTC=false reads as
    TIMESTAMP_NTZ under Spark 4's NTZ inference, and NTZ forbids the
    numeric casts (`CAST(ts AS DOUBLE)` → DATATYPE_MISMATCH) that
    epoch-arithmetic operators rely on.  ``to_utc_timestamp(ntz, 'UTC')``
    reinterprets the naive value as a UTC instant — a pure relabeling:
    monotonic, µs-exact, independent of the session timezone — after
    which every epoch cast/function works.  Already-instant columns pass
    through untouched.
    """
    from pyspark.sql.types import TimestampNTZType

    col = F.col(ts_col)
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return F.to_utc_timestamp(col, "UTC")
    return col


def timebin_15min(ts: Column | str) -> Column:
    """``"%02d:%02d" % (hour, round(minute/15)*15)`` — reference quirk:
    round() not floor(), so :53-:59 emit "HH:60" (wt_extract_soc.py:79).

    Integer minutes never hit the .5 tie, so half-up rounding here equals
    Python 3 banker's rounding on every reachable input.
    """
    ts = _c(ts)
    minute_bin = (F.round(F.minute(ts) / 15.0, 0) * 15).cast("int")
    return F.concat_ws(
        ":",
        F.lpad(F.hour(ts).cast("string"), 2, "0"),
        F.lpad(minute_bin.cast("string"), 2, "0"),
    )


def day_of_week_ref(ts: Column | str) -> Column:
    """Reference day-of-week: Python ``(weekday()+1)%7`` → Sunday=0..Saturday=6
    (wt_extract_soc.py:78).  Spark dayofweek() is Sunday=1..Saturday=7."""
    return F.dayofweek(_c(ts)) - 1


def floor_15min_epoch(ts: Column | str) -> Column:
    """Tumbling 15-minute bucket as epoch seconds (engine-side analog of
    pandas Grouper(freq='900s'), gs_ready_agg.py:69-92)."""
    return (F.floor(F.unix_timestamp(_c(ts)) / 900) * 900).cast("long")
