"""Python UDTF surface (§2.10): SQL-callable table functions."""

from __future__ import annotations


def test_chunk_text_udtf_lateral(spark):
    from atd_data_lake_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a b c d e f g"), (2, ""), (3, None)],
        "doc_id long, text string",
    ).createOrReplaceTempView("t_docs")

    rows = spark.sql(
        "SELECT doc_id, c.chunk_id, c.start_token, c.n_tokens, c.chunk "
        "FROM t_docs d, LATERAL chunk_text(d.text, 3, 1) c "
        "ORDER BY doc_id, c.chunk_id"
    ).collect()
    got = [tuple(r) for r in rows]
    # step = 3 - 1 = 2: windows at 0,2,4 then stop (4+3 >= 7)
    assert got == [
        (1, 0, 0, 3, "a b c"),
        (1, 1, 2, 3, "c d e"),
        (1, 2, 4, 3, "e f g"),
    ]
    # empty / NULL text emit nothing (lateral drops those rows)


def test_chunk_text_udtf_short_tail(spark):
    from atd_data_lake_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    rows = spark.sql(
        "SELECT * FROM chunk_text('a b c d', 3, 0) ORDER BY chunk_id"
    ).collect()
    assert [tuple(r) for r in rows] == [
        (0, 0, 3, "a b c"),
        (1, 3, 1, "d"),
    ]
