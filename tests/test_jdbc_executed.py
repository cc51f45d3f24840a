"""S4/J11 executed against a REAL JDBC database (embedded Derby).

The reference reads KITS MSSQL with a two-table join + date predicate
pushed into the source (wt_mssql_db.py:76-109).  No MSSQL exists here,
but Spark bundles Derby — an embedded JDBC engine running in the same
JVM — so the S4 scan and the J11 source-side join can be EXECUTED, not
just plan-formed: DDL + rows go in through java.sql.DriverManager, and
``read_kits`` pulls the joined, date-sliced result back through
``spark.read.jdbc`` exactly as it would against the warehouse.

CURDATETIME is stored as ISO-8601 VARCHAR so the reference query's
string-literal date comparison (MSSQL-style implicit cast) stays valid
under Derby's strict typing — lexicographic order == chronological
order for ISO strings, same slicing semantics.
"""

from __future__ import annotations

import pytest

from atd_data_lake_spark.io.jdbc import read_kits

_URL = "jdbc:derby:memory:kitsdb;create=true"
_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

_HIST_ROWS = [
    # (DETID, CURDATETIME, VOLUME, OCCUPANCY, SPEED, STATUS,
    #  UPLOADSUCCESS, DETCOUNTCOMPARISON, DAILYCUMULATIVE)
    (1, "2020-01-01 00:05:00", 10, 5, 35, "OK", 1, 0, 10),
    (1, "2020-01-01 23:55:00", 12, 6, 33, "OK", 1, 0, 22),
    (2, "2020-01-01 12:00:00", 7, 2, 40, "OK", 1, 0, 7),
    (2, "2020-01-02 00:10:00", 9, 3, 41, "OK", 1, 0, 9),  # next day
    (3, "2020-01-01 08:00:00", 5, 1, 30, "BAD", 0, 1, 5),  # no detector row
]

_DET_ROWS = [
    # (DETID, INTID, INTNAME, DETNAME)
    (1, 100, "LAMAR/5TH", "NB_LEFT"),
    (2, 101, "CONGRESS/1ST", "SB_THRU"),
]


@pytest.fixture(scope="module")
def derby_kits(spark):
    jvm = spark.sparkContext._jvm
    jvm.java.lang.Class.forName(_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(_URL)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE SYSDETHISTORYRM ("
        "DETID INT, CURDATETIME VARCHAR(19), VOLUME INT, OCCUPANCY INT, "
        "SPEED INT, STATUS VARCHAR(8), UPLOADSUCCESS INT, "
        "DETCOUNTCOMPARISON INT, DAILYCUMULATIVE INT)"
    )
    st.executeUpdate(
        "CREATE TABLE DETECTORSRM ("
        "DETID INT, INTID INT, INTNAME VARCHAR(32), DETNAME VARCHAR(32))"
    )
    for r in _HIST_ROWS:
        st.executeUpdate(
            "INSERT INTO SYSDETHISTORYRM VALUES "
            f"({r[0]}, '{r[1]}', {r[2]}, {r[3]}, {r[4]}, '{r[5]}', "
            f"{r[6]}, {r[7]}, {r[8]})"
        )
    for r in _DET_ROWS:
        st.executeUpdate(
            f"INSERT INTO DETECTORSRM VALUES ({r[0]}, {r[1]}, '{r[2]}', '{r[3]}')"
        )
    st.close()
    yield _URL
    # in-memory Derby dies with the JVM; drop for test-order hygiene
    st = conn.createStatement()
    st.executeUpdate("DROP TABLE SYSDETHISTORYRM")
    st.executeUpdate("DROP TABLE DETECTORSRM")
    st.close()
    conn.close()


def test_kits_day_slice_joins_and_filters(spark, derby_kits):
    df = read_kits(
        spark,
        derby_kits,
        start="2020-01-01 00:00:00",
        end="2020-01-02 00:00:00",
        properties={"driver": _DRIVER},
    )
    # Derby uppercases unquoted aliases (MSSQL preserves case) — read
    # case-insensitively; the column SET is the dialect-independent fact
    low = [
        {k.lower(): v for k, v in r.asDict().items()} for r in df.collect()
    ]
    rows = sorted((r["detid"], r["curdatetime"], r["intname"]) for r in low)
    # day slice: the 2020-01-02 row is cut by the source-side predicate;
    # the J11 join drops detector 3 (no DETECTORSRM row) — both happened
    # INSIDE Derby, Spark received exactly these three rows
    assert rows == [
        (1, "2020-01-01 00:05:00", "LAMAR/5TH"),
        (1, "2020-01-01 23:55:00", "LAMAR/5TH"),
        (2, "2020-01-01 12:00:00", "CONGRESS/1ST"),
    ]
    # the reference's projection came through, one column per alias
    assert {c.lower() for c in df.columns} == {
        "detid", "curdatetime", "volume", "occupancy", "speed", "status",
        "uploadsuccess", "detcountcomparison", "dailycumulative",
        "intid", "intname", "detname",
    }


def test_kits_scan_is_jdbc_relation(spark, derby_kits):
    """The physical plan must be a JDBC row scan of the pushed-down
    subquery — no Spark-side join node (the warehouse did the J11 join)."""
    df = read_kits(
        spark,
        derby_kits,
        start="2020-01-01 00:00:00",
        end="2020-01-02 00:00:00",
        properties={"driver": _DRIVER},
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "JDBCRelation" in plan or "JDBC" in plan
    assert "Join" not in plan


def test_kits_empty_slice(spark, derby_kits):
    df = read_kits(
        spark,
        derby_kits,
        start="2021-06-01 00:00:00",
        end="2021-06-02 00:00:00",
        properties={"driver": _DRIVER},
    )
    assert df.count() == 0
