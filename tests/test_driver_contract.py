"""Driver-contract type gates (the classes local parity can't catch).

The external driver hashes RAW values: DuckDB renders a HUGEINT
(decimal128(38,0) — what ``sum(BIGINT)`` returns) differently from
Spark's BIGINT even when every value is identical, and its row
canonicalizer sorts raw tuples so nested columns crash it.  The local
parity sweep normalizes values before comparing, so those classes pass
locally and fail only in the driver — exactly how ``cur_token_budget``
shipped red in round 3.  These tests gate the contract at the TYPE
level so the class cannot reenter:

- every oracle's DuckDB output must be HUGEINT-free and nested-free;
- every registered Spark query's schema must be scalars-only.
"""

from __future__ import annotations

import duckdb
import pytest

from atd_data_lake_spark.queries import ORACLES, QUERIES

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def test_oracles_emit_no_hugeint_or_nested_columns(duck):
    bad = {}
    for name, sql in ORACLES.items():
        schema = duck.execute(sql).fetch_arrow_table().schema
        offenders = {
            f.name: str(f.type)
            for f in schema
            if str(f.type) == "decimal128(38, 0)"  # DuckDB HUGEINT
            or str(f.type).startswith(("list", "struct", "map"))
        }
        if offenders:
            bad[name] = offenders
    assert not bad, (
        f"oracle output columns the driver hasher renders unlike Spark "
        f"(cast sums to BIGINT / project scalars): {bad}"
    )


def test_registered_queries_emit_scalars_only(spark, sf_dir):
    from pyspark.sql import types as T

    nested = (T.ArrayType, T.MapType, T.StructType)
    bad = {}
    for name, fn in QUERIES.items():
        # Mostly analysis-only, but not entirely: the four *_executed
        # streaming queries run their micro-batches and
        # cur_semantic_decontaminate collects its (bounded) benchmark at
        # construction time — building every registry frame costs a few
        # real jobs, which is accepted here because this is the only gate
        # that sees every schema the driver will hash.
        schema = fn(spark, sf_dir).schema
        offenders = [
            f.name for f in schema.fields if isinstance(f.dataType, nested)
        ]
        if offenders:
            bad[name] = offenders
    assert not bad, (
        f"registered queries must project scalar columns only (the "
        f"driver canonicalizer sorts raw row tuples): {bad}"
    )
