"""S4 — JDBC scan (wt_mssql_db.py:76-109).

The reference queries KITS MSSQL with an embedded two-table join and a
date predicate.  Spark-first: ``spark.read.jdbc`` with either (a) the
join pushed down as a dbtable subquery — one round trip, the warehouse
does the join — or (b) two table reads joined Spark-side when the
detector dimension is reused across days (broadcast, J11→J4).

No MSSQL exists in this environment; tests/test_jdbc_executed.py
executes the full round trip against embedded Derby (bundled with
Spark) instead — DDL and rows in through java.sql.DriverManager, the
joined day slice back through this reader, with the plan asserted to be
a single JDBCRelation scan (the database performs the join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: the reference's exact join + projection (wt_mssql_db.py:82-89)
KITS_QUERY = """
    (SELECT a.DETID AS detID, a.CURDATETIME AS curDateTime, a.VOLUME AS volume,
            a.OCCUPANCY AS occupancy, a.SPEED AS speed, a.STATUS AS status,
            a.UPLOADSUCCESS AS uploadSuccess, a.DETCOUNTCOMPARISON AS detCountComparison,
            a.DAILYCUMULATIVE AS dailyCumulative,
            b.INTID AS intID, b.INTNAME AS intName, b.DETNAME AS detName
     FROM SYSDETHISTORYRM a JOIN DETECTORSRM b ON a.DETID = b.DETID
     WHERE a.CURDATETIME >= '{start}' AND a.CURDATETIME < '{end}') q
"""


def read_kits(
    spark: SparkSession,
    url: str,
    start: str,
    end: str,
    properties: dict | None = None,
) -> DataFrame:
    """Day-sliced KITS read with the join and date predicate pushed into
    the source (S4 + P4 pushdown; partitions by predicate would use
    ``partitionColumn='CURDATETIME'`` on a wide range)."""
    return spark.read.jdbc(
        url=url,
        table=KITS_QUERY.format(start=start, end=end),
        properties=properties or {},
    )
