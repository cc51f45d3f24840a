"""Python UDTFs — the table-function corner of the §2.10 UDF surface.

The engine's stance (COVERAGE §2.10): built-ins first, Arrow-batched
pandas UDFs where Python is semantically required, row-at-a-time UDFs
never.  UDTFs get the same treatment — every production chunker here
runs as higher-order-function / explode plans (operators/curation.py).
This module exists because the reference's users also write AD-HOC SQL,
and a registered table function is the right surface for "give me rows
out of this value" in SQL text:

    SELECT d.doc_id, c.* FROM documents d,
    LATERAL chunk_text(d.text, 50, 10) c

A UDTF runs row-at-a-time Python (one eval per input row) — fine for a
lateral over an already-filtered slice, wrong for a 100 TB scan; the
docstring of each UDTF names its plan-level equivalent.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, start_token int, n_tokens int, chunk string")
class ChunkText:
    """Overlapping fixed-size token windows over a text value.

    SQL-surface twin of ``operators.curation.chunk_documents`` (the
    scan-scale path: sequence/slice/explode, zero Python).  Emits
    (chunk_id, start_token, n_tokens, chunk); the final chunk may be
    short; empty/whitespace text emits nothing.
    """

    def eval(self, text: str, max_tokens: int, overlap: int):
        if text is None:
            return
        toks = text.split()
        if not toks:
            return
        if max_tokens <= 0 or overlap >= max_tokens:
            raise ValueError("need 0 <= overlap < max_tokens")
        step = max_tokens - overlap
        cid = 0
        for start in range(0, len(toks), step):
            window = toks[start : start + max_tokens]
            yield cid, start, len(window), " ".join(window)
            cid += 1
            if start + max_tokens >= len(toks):
                break


def register_udtfs(spark) -> None:
    """Register the SQL table functions on a session."""
    spark.udtf.register("chunk_text", ChunkText)
