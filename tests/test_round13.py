"""Round-13 targeted tests: the rows-only ops (banded perceptual-hash
near-dup, product quantization) get the property/stability coverage the
DuckDB oracle cannot provide; the oracle-backed nine are covered by
test_oracle_parity automatically."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from atd_data_lake_spark.round13_queries import (
    _ahash64,
    emb_pq_codes,
    emb_pq_codes_trained,
    media_phash,
    mm_image_phash,
    phash_near_dups,
)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# ---------------------------------------------------------------------------
# mm_image_phash
# ---------------------------------------------------------------------------


def test_ahash64_deterministic_and_int64():
    h1 = _ahash64(b"hello world")
    h2 = _ahash64(b"hello world")
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)
    assert _ahash64(None) == 0


def test_phash_identical_payloads_pair_at_zero(spark):
    rows = [(1, b"payload-a"), (2, b"payload-b"), (3, b"payload-a")]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = phash_near_dups(media_phash(media)).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in pairs] == [(1, 3, 0)]


def test_phash_banded_join_equals_bruteforce(spark):
    """The 4x16-band candidate join must find EXACTLY the Hamming<=3
    pairs a brute-force all-pairs scan finds (pigeonhole guarantees no
    misses at <=3; the exact re-check removes band-collision false
    positives)."""
    rng = random.Random(7)
    base = [rng.getrandbits(64) for _ in range(40)]
    variants = []
    for i, h in enumerate(base[:10]):
        flipped = h
        for bit in rng.sample(range(64), (i % 3) + 1):  # 1..3 flips
            flipped ^= 1 << bit
        variants.append(flipped)
    far = [h ^ 0x00FF00FF00FF00FF for h in base[10:15]]  # 32 flips
    all_h = base + variants + far

    def signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    hashes = spark.createDataFrame(
        [(i, signed(h)) for i, h in enumerate(all_h)],
        "media_id long, phash long",
    )
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_near_dups(hashes).collect()
    }
    want = {
        (i, j, _hamming(all_h[i], all_h[j]))
        for i, j in itertools.combinations(range(len(all_h)), 2)
        if _hamming(all_h[i], all_h[j]) <= 3
    }
    assert got == want
    assert len(want) >= 10  # the planted 1..3-flip variants are present


def test_phash_partition_invariance(spark):
    rows = [(i, f"text-{i % 7}".encode()) for i in range(30)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    a = sorted(
        map(tuple, phash_near_dups(media_phash(media.repartition(1))).collect())
    )
    b = sorted(
        map(tuple, phash_near_dups(media_phash(media.repartition(13))).collect())
    )
    assert a == b and len(a) > 0


def test_mm_image_phash_query_finds_twin_cohort(spark, sf_dir):
    out = mm_image_phash(spark, sf_dir).collect()
    assert len(out) > 0
    # every planted twin (id + 10M) pairs with its original at Hamming 0
    twins = [r for r in out if r.id_b == r.id_a + 10_000_000]
    assert all(r.hamming == 0 for r in twins)
    assert len(twins) > 0


# ---------------------------------------------------------------------------
# emb_pq_codes
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pq_out(spark, sf_dir):
    return emb_pq_codes_trained(spark, sf_dir).collect()


def test_pq_codes_shape_and_range(pq_out):
    assert len(pq_out) > 0
    for r in pq_out[:50]:
        for s in range(8):
            assert 0 <= r[f"c{s}"] < 16
        assert r.recon_mse >= 0.0


def test_pq_codes_deterministic(spark, sf_dir, pq_out):
    again = emb_pq_codes_trained(spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, pq_out))


def test_pq_quantization_beats_global_mean(spark, sf_dir, pq_out):
    """PQ reconstruction must beat the 1-centroid baseline (quantizing
    every vector to the corpus mean) — i.e. the codebooks learned
    something."""
    from atd_data_lake_spark.io.reader import read_table
    import numpy as np

    emb = read_table(spark, sf_dir, "embeddings").select("embedding").collect()
    X = np.array([r[0] for r in emb], dtype=np.float64)
    baseline = ((X - X.mean(axis=0)) ** 2).sum(axis=1).mean() / X.shape[1]
    pq_mse = sum(r.recon_mse for r in pq_out) / len(pq_out)
    assert pq_mse < baseline


def test_pq_model_codes_match_bruteforce(spark, sf_dir):
    """The oracle-checked model-injected PQ variant: codes must equal a
    numpy brute-force nearest-slice assignment with rounded-distance
    decisions and smallest-code tie-breaks."""
    import numpy as np

    from atd_data_lake_spark.io.reader import read_table
    from atd_data_lake_spark.operators.similarity import _round_half_up

    rows = emb_pq_codes(spark, sf_dir).collect()
    emb = sorted(
        read_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r[0] for r in emb])
    X = np.array([r[1] for r in emb], dtype=np.float64)
    books = X[ids < 16]
    got = {r["vec_id"]: r for r in rows}
    assert len(got) == len(ids)
    for i in range(0, len(ids), 97):  # sample every 97th vector
        for s in range(8):
            Xs = X[i, s * 8 : (s + 1) * 8]
            Cs = books[:, s * 8 : (s + 1) * 8]
            d = _round_half_up(np.sqrt(((Cs - Xs) ** 2).sum(axis=1)))
            assert got[ids[i]][f"c{s}"] == int(d.argmin())
            assert got[ids[i]][f"d{s}"] == d[d.argmin()]
