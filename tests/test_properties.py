"""Property-based tests (hypothesis): engine scalar semantics vs direct
Python reference implementations, and operator invariants that must hold
on any input — the automated test discipline the reference lacks
(SURVEY §5)."""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from atd_data_lake_spark.functions.datetime_fns import day_of_week_ref, timebin_15min
from atd_data_lake_spark.functions.ids import md5_concat

TS = st.datetimes(
    min_value=datetime(2018, 1, 1), max_value=datetime(2026, 1, 1)
).map(lambda d: d.replace(microsecond=0))


@settings(max_examples=30, deadline=None)
@given(st.lists(TS, min_size=1, max_size=8, unique=True))
def test_timebin_matches_reference_python(spark, tss):
    """timebin ≡ '%02d:%02d' % (h, round(m/15)*15) — Python 3 banker's
    round, including the HH:60 quirk (wt_extract_soc.py:79)."""
    df = spark.createDataFrame([(t,) for t in tss], "ts timestamp")
    got = {
        str(r["ts"]): r["tb"]
        for r in df.select("ts", timebin_15min("ts").alias("tb")).collect()
    }
    for t in tss:
        want = "%02d:%02d" % (t.hour, round(t.minute / 15.0) * 15)
        assert got[str(t)] == want, t


@settings(max_examples=30, deadline=None)
@given(st.lists(TS, min_size=1, max_size=8, unique=True))
def test_day_of_week_matches_reference_python(spark, tss):
    """(weekday()+1)%7 — Sunday=0 (wt_extract_soc.py:78)."""
    df = spark.createDataFrame([(t,) for t in tss], "ts timestamp")
    got = {
        str(r["ts"]): r["dow"]
        for r in df.select("ts", day_of_week_ref("ts").alias("dow")).collect()
    }
    for t in tss:
        assert got[str(t)] == (t.weekday() + 1) % 7


TEXT = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=127),
    min_size=0,
    max_size=20,
)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(TEXT, TEXT, TEXT), min_size=1, max_size=6))
def test_md5_concat_matches_hashlib(spark, rows):
    """record_id/device_id md5 ≡ hashlib.md5 of the raw concatenation
    (bt_ready.py:81-88 et al.)."""
    df = spark.createDataFrame(rows, "a string, b string, c string")
    got = [r["h"] for r in df.select(md5_concat("a", "b", "c").alias("h")).collect()]
    want = [
        hashlib.md5((a + b + c).encode("utf-8")).hexdigest() for a, b, c in rows
    ]
    assert sorted(got) == sorted(want)


DOC = st.text(
    alphabet=st.sampled_from("ab cd ef gh ij k l m n o p q r s t "),
    min_size=0,
    max_size=120,
)


@settings(max_examples=5, deadline=None)
@given(st.lists(DOC, min_size=2, max_size=12))
def test_jaccard_pairs_match_python_sets(spark, docs):
    """ngram_jaccard_pairs ≡ exact set-Jaccard computed in Python."""
    from atd_data_lake_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, n=2, threshold=0.01).collect()
    }

    def sh(t):
        toks = t.split()
        return {
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        } if len(toks) >= 2 else set()

    want = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = sh(docs[i]), sh(docs[j])
            if a and b and a & b:
                jac = round(len(a & b) / len(a | b), 6)
                if jac >= 0.01:
                    want[(i, j)] = jac
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=1,
        max_size=30,
    )
)
def test_asof_backward_matches_bruteforce(spark, pairs):
    """asof_join(backward) ≡ per-row max of eligible right timestamps."""
    from atd_data_lake_spark.operators.asof import asof_join

    base = datetime(2020, 1, 1)
    left_rows = [
        (k, base + timedelta(minutes=m), i) for i, (k, m) in enumerate(pairs)
    ]
    right_rows = [
        (k, base + timedelta(minutes=m * 2)) for k, m in {(k, m // 2) for k, m in pairs}
    ]
    left = spark.createDataFrame(left_rows, "k int, ts timestamp, row_id long")
    right = spark.createDataFrame(right_rows, "k int, rts timestamp")
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                    direction="backward")
    got = {r["row_id"]: r["rts"] for r in out.collect()}
    for k, ts, rid in left_rows:
        elig = [rt for rk, rt in right_rows if rk == k and rt <= ts]
        assert got[rid] == (max(elig) if elig else None)


WINNOW_TEXT = st.text(
    alphabet=st.sampled_from("abcdefgh XYZ.,!019 "),
    min_size=0,
    max_size=200,
)


@settings(max_examples=15, deadline=None)
@given(st.lists(WINNOW_TEXT, min_size=1, max_size=8))
def test_winnow_matches_python_reference_random(spark, docs):
    """winnow_fingerprints ≡ the pure-Python Rabin-Karp + winnowing
    reference on arbitrary mixed-case/punctuation/digit text."""
    from atd_data_lake_spark.operators.text import winnow_fingerprints
    from tests.test_text_ops import _winnow_ref

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["rk_min"], r["n_fingerprints"])
        for r in winnow_fingerprints(df).collect()
    }
    for i, text in enumerate(docs):
        assert got[i] == _winnow_ref(text), f"doc {i}: {text!r}"


@settings(max_examples=15, deadline=None)
@given(st.lists(WINNOW_TEXT, min_size=1, max_size=8))
def test_bpe_pretoken_count_matches_python_re(spark, docs):
    """bpe_pretoken_count (Java regex, JVM-side) ≡ Python re.findall of
    the same pattern — guards the cross-engine regex-semantics assumption
    the DuckDB oracle also relies on."""
    import re

    from atd_data_lake_spark.operators.text import BPE_PRETOKEN_RE, bpe_pretoken_count

    # Python re lacks \p{...}; translate to the ASCII-equivalent classes
    # (inputs here are ASCII-only by construction)
    py_pat = (
        BPE_PRETOKEN_RE.replace(r"[^\s\p{L}\p{N}]", r"[^\sa-zA-Z0-9]")
        .replace(r"\p{L}", "[a-zA-Z]")
        .replace(r"\p{N}", "[0-9]")
    )
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe_pretoken_count(F.col("text")).alias("n")
        ).collect()
    }
    for i, text in enumerate(docs):
        assert got[i] == len(re.findall(py_pat, text)), f"doc {i}: {text!r}"


# ---------------------------------------------------------------------------
# curation: chunking / packing vs pure-Python references
# ---------------------------------------------------------------------------

WORD = st.text(alphabet="abcdef", min_size=1, max_size=4)
DOC_TEXT = st.lists(WORD, min_size=0, max_size=30).map(" ".join)


def _py_chunks(text: str, chunk: int, stride: int):
    toks = text.split()
    n = len(toks)
    n_chunks = 1 + max(0, -(-max(n - chunk, 0) // stride))
    return [
        (i, toks[i * stride : i * stride + chunk]) for i in range(n_chunks)
    ]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(DOC_TEXT, min_size=1, max_size=6),
    st.integers(min_value=2, max_value=8),
)
def test_chunk_documents_matches_python(spark, texts, stride):
    from atd_data_lake_spark.operators.curation import chunk_documents

    chunk = stride + 2
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(
            df, chunk_tokens=chunk, stride=stride
        ).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        for cid, toks in _py_chunks(t, chunk, stride):
            want[(i, cid)] = (len(toks), " ".join(toks))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["s1", "s2"]), st.integers(0, 200)),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=1, max_value=64),
)
def test_pack_chunks_matches_python(spark, rows, context):
    from atd_data_lake_spark.operators.curation import pack_chunks

    data = [
        (src, i, 0, tok) for i, (src, tok) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "source string, doc_id long, chunk_id long, n_chunk_tokens long"
    )
    got = {
        (r["source"], r["doc_id"]): (r["cum_before"], r["pack_id"])
        for r in pack_chunks(df, context_tokens=context).collect()
    }
    want = {}
    for src in {s for s, _ in rows}:
        cum = 0
        for did, (s, tok) in enumerate(rows):
            if s != src:
                continue
            want[(src, did)] = (cum, cum // context)
            cum += tok
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=30, unique=True))
def test_hash_u16_matches_hashlib(spark, keys):
    from atd_data_lake_spark.operators.curation import hash_u16

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["v"]
        for r in df.select("k", hash_u16(F.col("k"), salt="s").alias("v")).collect()
    }
    want = {
        k: int(hashlib.md5(f"s{k}".encode()).hexdigest()[:4], 16) for k in keys
    }
    assert got == want


# ---------------------------------------------------------------------------
# PII regex: the three-engine-portable subset claim
# ---------------------------------------------------------------------------

PII_CHUNK = st.one_of(
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789 .@-_%+:/()[]",
        max_size=24,
    ),
    st.just("a.b@ex-1.example.org"),
    st.just("x@y"),  # not an email (no dotted alpha TLD)
    st.just("512-555-0147"),
    st.just("55-555-0147"),  # not a phone (2-digit area)
    st.just("10.0.0.255"),
    st.just("1.2.3"),  # not an IP (3 octets)
    st.just("v1.2.3.4rc"),  # word-bounded: 'v' and 'rc' break \b
)


@settings(max_examples=25, deadline=None)
@given(st.lists(PII_CHUNK, min_size=1, max_size=6))
def test_pii_counts_match_python_re(spark, chunks):
    """pii_counts (Java regex, JVM-side) agrees with Python `re` on
    arbitrary concatenations of pii-like and pii-adjacent chunks — the
    patterns deliberately use only the regex subset whose semantics are
    identical across Java, RE2 (the DuckDB oracle), and Python."""
    import re

    from atd_data_lake_spark.operators.pii import (
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
        pii_counts,
    )

    text = " ".join(chunks)
    df = spark.createDataFrame([(text,)], "text string")
    c = pii_counts("text")
    row = df.select(
        c["n_emails"].alias("e"), c["n_phones"].alias("p"), c["n_ips"].alias("i")
    ).first()
    assert row.e == len(re.findall(EMAIL_RE, text))
    assert row.p == len(re.findall(PHONE_RE, text))
    assert row.i == len(re.findall(IPV4_RE, text))


EVT = st.tuples(
    st.sampled_from(["a", "b"]),
    st.integers(min_value=0, max_value=90_000_000),  # µs offsets, ~90s span
)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(EVT, min_size=1, max_size=12),
    st.lists(EVT, min_size=1, max_size=12),
    st.sampled_from([1, 7, 30]),
)
def test_time_window_join_equals_bruteforce(spark, lefts, rights, window_s):
    """Property: the bucketized band join equals the brute-force band
    join for arbitrary µs-grained timestamps and window widths —
    including pairs straddling bucket boundaries and exact-bound hits."""
    import datetime as dt

    from pyspark.sql import functions as F

    from atd_data_lake_spark.operators.rangejoin import time_window_join

    base = dt.datetime(2024, 1, 1)

    def mk(rows):
        return spark.createDataFrame(
            [
                (i, k, base + dt.timedelta(microseconds=us))
                for i, (k, us) in enumerate(rows)
            ],
            "id long, k string, ts timestamp",
        )

    left, right = mk(lefts), mk(rights)
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in time_window_join(
            left, right, on=["k"], window_seconds=window_s
        ).collect()
    )
    l = left.select("k", F.col("id").alias("l_id"), F.col("ts").alias("l_ts"))
    r = right.select(
        F.col("k").alias("rk"), F.col("id").alias("r_id"), F.col("ts").alias("r_ts")
    )
    want = sorted(
        (row["l_id"], row["r_id"])
        for row in l.join(r, l.k == r.rk)
        .filter(
            (F.unix_micros("r_ts") > F.unix_micros("l_ts"))
            & (F.unix_micros("r_ts") - F.unix_micros("l_ts") <= window_s * 1_000_000)
        )
        .collect()
    )
    assert got == want


PT = st.tuples(
    st.floats(min_value=0, max_value=5, allow_nan=False, width=32),
    st.floats(min_value=0, max_value=5, allow_nan=False, width=32),
)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(PT, min_size=1, max_size=10),
    st.lists(PT, min_size=1, max_size=10),
    st.sampled_from([0.3, 1.0, 2.5]),
)
def test_radius_join_equals_bruteforce(spark, lpts, rpts, radius):
    """Property: the grid-bucketed spatial join equals the brute-force
    distance join for arbitrary points and radii — including points on
    cell boundaries and radii larger than the point cloud."""
    from pyspark.sql import functions as F

    from atd_data_lake_spark.operators.spatialjoin import radius_join

    left = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(lpts)],
        "id long, x double, y double",
    )
    right = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(rpts)],
        "id long, x double, y double",
    )
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in radius_join(left, right, radius=radius).collect()
    )
    l = left.select(
        F.col("id").alias("lid"), F.col("x").alias("lx"), F.col("y").alias("ly")
    )
    rr = right.select(
        F.col("id").alias("rid"), F.col("x").alias("rx"), F.col("y").alias("ry")
    )
    d = F.sqrt(
        (F.col("lx") - F.col("rx")) * (F.col("lx") - F.col("rx"))
        + (F.col("ly") - F.col("ry")) * (F.col("ly") - F.col("ry"))
    )
    want = sorted(
        tuple(r)
        for r in l.crossJoin(rr).filter(d <= radius).select("lid", "rid").collect()
    )
    assert got == want


WORD = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])
DOC = st.lists(WORD, min_size=0, max_size=10).map(" ".join)


def _py_jaccard_pairs(texts: list[str], n: int = 3, threshold: float = 0.5):
    """Direct Python reference: distinct word n-gram shingle sets,
    exact Jaccard, half-up round(6) — the oracle the verified MinHash
    operator must never exceed."""
    sh = {}
    for i, t in enumerate(texts):
        toks = t.split()
        if len(toks) >= n:
            sh[i] = {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}
    import math

    out = {}
    ids = sorted(sh)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sh[a] & sh[b])
            if not inter:
                continue
            j = inter / (len(sh[a]) + len(sh[b]) - inter)
            j6 = math.floor(j * 1e6 + 0.5) / 1e6
            if j6 >= threshold:
                out[(a, b)] = j6
    return out


@settings(max_examples=8, deadline=None)
@given(st.lists(DOC, min_size=2, max_size=7))
def test_minhash_verified_pairs_subset_of_exact(spark, texts):
    """Invariant of the verify stage: every emitted pair IS an exact
    Jaccard >= threshold pair with the exact value (precision 1.0 by
    construction — banding can only MISS pairs, never invent them), and
    the output is deterministic across runs."""
    from atd_data_lake_spark.operators.dedup import minhash_near_dups

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_near_dups(
            df, num_hashes=32, bands=10, threshold=0.5
        ).collect()
    }
    exact = _py_jaccard_pairs(texts, threshold=0.5)
    assert set(got) <= set(exact)
    for pair, j in got.items():
        assert j == pytest.approx(exact[pair], abs=1e-9)
    again = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_near_dups(
            df, num_hashes=32, bands=10, threshold=0.5
        ).collect()
    }
    assert again == got
