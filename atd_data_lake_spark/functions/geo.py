"""Geo expressions — haversine distance in feet (util/gps_h.py:9-24).

Pure column expression: no UDF.  Used by the GS fuzzy device-match
cascade's GPS fallback stage (gs_ready.py:187-206, 300 ft threshold).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_FEET = 20902230.0  # mean Earth radius in feet (6371 km)


def haversine_feet(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in feet between two (degree) coordinate pairs."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    c = 2 * F.atan2(F.sqrt(a), F.sqrt(1 - a))
    return F.lit(EARTH_RADIUS_FEET) * c
