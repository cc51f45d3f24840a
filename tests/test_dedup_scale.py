"""Scale-path guarantees for the dedup/similarity operators (VERDICT r1
#2/#3): the large-corpus ``embedding_near_dups`` path must never collect
the corpus to the driver, and SimHash must reject parameters that break
its pigeonhole recall guarantee.
"""

from __future__ import annotations

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from atd_data_lake_spark.io.reader import read_table
from atd_data_lake_spark.operators.dedup import simhash_near_dups
from atd_data_lake_spark.operators.similarity import embedding_near_dups


def test_large_path_never_collects_corpus(spark, sf_dir, monkeypatch):
    """Force the LSH path (max_collect_rows=0) with DataFrame.collect
    poisoned: plan construction must not pull the corpus to the driver."""
    emb = read_table(spark, sf_dir, "embeddings")

    real_collect = DataFrame.collect

    def poisoned(self):
        raise AssertionError("scale path collected a DataFrame to the driver")

    monkeypatch.setattr(DataFrame, "collect", poisoned)
    out = embedding_near_dups(emb, threshold=0.85, max_collect_rows=0)
    monkeypatch.setattr(DataFrame, "collect", real_collect)

    lsh_pairs = {(r.id_a, r.id_b) for r in out.collect()}
    exact = embedding_near_dups(emb, threshold=0.85)  # small corpus → exact
    exact_pairs = {(r.id_a, r.id_b) for r in exact.collect()}

    # exact re-rank ⇒ every LSH pair is a true pair (precision 1.0)
    assert lsh_pairs <= exact_pairs
    # banded recall with 8 bands of 2 bits is ≈0.999 at these thresholds
    if exact_pairs:
        assert len(lsh_pairs) / len(exact_pairs) >= 0.9


def test_lsh_and_exact_paths_share_scores(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in embedding_near_dups(emb, threshold=0.85).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cos_sim
        for r in embedding_near_dups(emb, threshold=0.85, max_collect_rows=0).collect()
    }
    for pair, sim in lsh.items():
        assert exact[pair] == sim  # identical rounding/scoring on both paths


def test_simhash_rejects_broken_pigeonhole(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dups(df, max_hamming=4, block_bits=16)
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dups(df, max_hamming=8, block_bits=8)


def test_ngram_jaccard_prefix_filter_equivalent(spark, sf_dir):
    """PPJoin prefix path returns EXACTLY the inverted-index result at
    every threshold (prefix pruning is lossless by the prefix-filter
    theorem; the ε-guarded ceil keeps it so at float-hostile t·|S|)."""
    from atd_data_lake_spark.operators.dedup import ngram_jaccard_pairs

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for t in (0.1, 0.5, 0.8):
        a = sorted(
            map(tuple, ngram_jaccard_pairs(d, threshold=t, prefix_filter=False).collect())
        )
        b = sorted(
            map(tuple, ngram_jaccard_pairs(d, threshold=t, prefix_filter=True).collect())
        )
        assert a == b
        if t <= 0.5:
            assert len(a) > 0


def test_embedding_near_dups_banding_scales_with_corpus(spark, sf_dir):
    """The LSH scale path must find every replica pair on a duplicated
    corpus (near-identical vectors ⇒ recall ≈ 1 at any auto-sized r),
    with the corpus never collected (max_collect_rows=0)."""
    from pyspark.sql import functions as F

    from atd_data_lake_spark.operators.similarity import embedding_near_dups

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    reps = spark.range(3).select(F.col("id").alias("_rep"))
    big = (
        emb.crossJoin(F.broadcast(reps))
        .withColumn("vec_id", F.col("vec_id") + F.col("_rep") * F.lit(10**9))
        .drop("_rep")
    )
    n = emb.count()
    pairs = embedding_near_dups(big, threshold=0.999, max_collect_rows=0)
    # every base vector contributes C(3,2)=3 identical-replica pairs
    assert pairs.count() >= 3 * n


def test_incremental_minhash_equals_full_corpus_restriction(spark, sf_dir):
    """Splitting the corpus into standing/incoming and running the
    incremental op must yield exactly the full-corpus LSH candidates
    restricted to pairs touching the incoming set (same geometry)."""
    from pyspark.sql import functions as F

    from atd_data_lake_spark.operators.dedup import (
        incremental_minhash_candidates,
        minhash_lsh_candidates,
    )

    d = read_table(spark, sf_dir, "documents")
    standing = d.filter(F.col("doc_id") % 10 != 7)
    incoming = d.filter(F.col("doc_id") % 10 == 7)

    inc = {
        (r.id_a, r.id_b): r.n_shared_bands
        for r in incremental_minhash_candidates(
            standing, incoming, num_hashes=32, bands=8
        ).collect()
    }
    incoming_ids = {r.doc_id for r in incoming.select("doc_id").collect()}
    full = {}
    for r in minhash_lsh_candidates(d, num_hashes=32, bands=8).collect():
        a_new, b_new = r.id_a in incoming_ids, r.id_b in incoming_ids
        if not (a_new or b_new):
            continue  # standing↔standing: the incremental op excludes these
        # incremental output orients id_b to the incoming doc
        if b_new:
            full[(r.id_a, r.id_b)] = r.n_shared_bands
        else:
            full[(r.id_b, r.id_a)] = r.n_shared_bands
    assert inc == full and inc  # identical pairs AND band counts, non-empty


def test_incremental_near_dup_new_keeps_first_of_group(spark, sf_dir):
    """The append-safe filter drops exactly the candidate id_b set."""
    from pyspark.sql import functions as F

    from atd_data_lake_spark.operators.dedup import (
        incremental_minhash_candidates,
        incremental_near_dup_new,
    )

    d = read_table(spark, sf_dir, "documents")
    standing = d.filter(F.col("doc_id") % 10 != 7)
    incoming = d.filter(F.col("doc_id") % 10 == 7)

    kept = {
        r.doc_id
        for r in incremental_near_dup_new(
            standing, incoming, num_hashes=32, bands=8
        ).collect()
    }
    dup_ids = {
        r.id_b
        for r in incremental_minhash_candidates(
            standing, incoming, num_hashes=32, bands=8
        ).collect()
    }
    all_inc = {r.doc_id for r in incoming.select("doc_id").collect()}
    assert kept == all_inc - dup_ids


def test_incremental_minhash_precomputed_signatures_identical(spark, sf_dir):
    """Passing stored standing signatures (the production pattern) gives
    the identical candidate set as deriving them from text."""
    from pyspark.sql import functions as F

    from atd_data_lake_spark.operators.dedup import (
        incremental_minhash_candidates,
        minhash_signature_df,
    )

    d = read_table(spark, sf_dir, "documents")
    standing = d.filter(F.col("doc_id") % 10 != 7)
    incoming = d.filter(F.col("doc_id") % 10 == 7)
    sig = minhash_signature_df(standing, num_hashes=32)

    derived = sorted(
        tuple(r)
        for r in incremental_minhash_candidates(
            standing, incoming, num_hashes=32, bands=8
        ).collect()
    )
    stored = sorted(
        tuple(r)
        for r in incremental_minhash_candidates(
            standing, incoming, num_hashes=32, bands=8, standing_sig=sig
        ).collect()
    )
    assert derived == stored and derived


def test_incremental_minhash_shared_signature_pass_identical(spark, sf_dir):
    """The r9 batch-9 registry shape: ONE signature pass over the whole
    table, split by the ingest predicate and passed as standing_sig AND
    incoming_sig, must give the identical candidate set as deriving each
    side from its own text (signatures are row-wise, so the filter
    commutes through the Arrow stage)."""
    from pyspark.sql import functions as F

    from atd_data_lake_spark.operators.dedup import (
        incremental_minhash_candidates,
        minhash_signature_df,
    )

    d = read_table(spark, sf_dir, "documents")
    standing = d.filter(F.col("doc_id") % 10 != 7)
    incoming = d.filter(F.col("doc_id") % 10 == 7)
    sig = minhash_signature_df(d, num_hashes=32)

    derived = sorted(
        tuple(r)
        for r in incremental_minhash_candidates(
            standing, incoming, num_hashes=32, bands=8
        ).collect()
    )
    shared = sorted(
        tuple(r)
        for r in incremental_minhash_candidates(
            standing,
            incoming,
            num_hashes=32,
            bands=8,
            standing_sig=sig.filter(F.col("_id") % 10 != 7),
            incoming_sig=sig.filter(F.col("_id") % 10 == 7),
        ).collect()
    )
    assert derived == shared and derived


import pytest as _pytest


@_pytest.mark.parametrize("nh,b", [(32, 10), (64, 21)])
def test_minhash_near_dups_equals_exact_jaccard(spark, sf_dir, nh, b):
    """The verified operator's contract: banding recall ≈ 1 at these
    geometries for this corpus's J ≥ 0.8 pairs (deterministic hash
    family), so the verified output must EQUAL ngram_jaccard_pairs at
    the same threshold — the equality that licenses the SQL oracle for
    dedup_minhash_lsh.  (32,10) is the registry geometry, (64,21) the
    operator default."""
    from atd_data_lake_spark.operators.dedup import (
        minhash_near_dups,
        ngram_jaccard_pairs,
    )

    d = read_table(spark, sf_dir, "documents")
    verified = sorted(
        tuple(r)
        for r in minhash_near_dups(
            d, num_hashes=nh, bands=b, threshold=0.8
        ).collect()
    )
    exact = sorted(
        tuple(r) for r in ngram_jaccard_pairs(d, threshold=0.8).collect()
    )
    assert verified == exact and verified


def test_minhash_near_dups_verify_kills_false_candidates(spark):
    """A loose geometry (r=1) floods candidates; the exact-Jaccard
    verify stage must still emit only true pairs."""
    from atd_data_lake_spark.operators.dedup import minhash_near_dups

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),   # J high vs 1
            (3, "one two three four five six seven"),
            (4, "totally different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_near_dups(
            docs, num_hashes=8, bands=8, threshold=0.3
        ).collect()
    }
    assert set(out) == {(1, 2)}
    # J(1,2): shingles 4 each, 3 shared -> 3/5 = 0.6
    assert out[(1, 2)] == 0.6


def test_incremental_minhash_near_dups_cross_group_only(spark, sf_dir):
    """Verified incremental pairs = verified full-corpus pairs touching
    the incoming batch, with id_b oriented to the incoming doc."""
    from pyspark.sql import functions as F

    from atd_data_lake_spark.operators.dedup import (
        incremental_minhash_near_dups,
        minhash_near_dups,
    )

    d = read_table(spark, sf_dir, "documents")
    standing = d.filter(F.col("doc_id") % 10 != 7)
    incoming = d.filter(F.col("doc_id") % 10 == 7)
    inc = {
        (r.id_a, r.id_b): r.jaccard
        for r in incremental_minhash_near_dups(
            standing, incoming, num_hashes=32, bands=10, threshold=0.8
        ).collect()
    }
    full = {}
    for r in minhash_near_dups(
        d, num_hashes=32, bands=10, threshold=0.8
    ).collect():
        a_new, b_new = r.id_a % 10 == 7, r.id_b % 10 == 7
        if not (a_new or b_new):
            continue
        if b_new:
            full[(r.id_a, r.id_b)] = r.jaccard
        else:
            full[(r.id_b, r.id_a)] = r.jaccard
    assert inc == full and inc


def test_vector_ops_survive_null_and_empty_embeddings(spark):
    """A NULL (or zero-length) embedding row must be dropped at the scan
    — np.stack over a batch containing one would kill the Arrow worker."""
    from atd_data_lake_spark.operators.curation import semantic_decontaminate
    from atd_data_lake_spark.operators.semdedup import semantic_dedup
    from atd_data_lake_spark.operators.similarity import (
        centroid_assign,
        cosine_topk,
        embedding_near_dups,
        ivf_topk,
        lsh_topk,
    )

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0, 0.0]),
            (3, None),
            (4, []),
            (5, [0.0, 0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    q = emb.filter("vec_id = 1").selectExpr(
        "vec_id as query_id", "embedding"
    )
    got = {r.neighbor_id for r in cosine_topk(emb, q, k=3).collect()}
    assert got == {2, 5}  # null/empty rows dropped, not crashed

    assert lsh_topk(emb, q, k=3, dim=4, n_planes=4, bands=2).count() >= 1
    assert ivf_topk(emb, q, k=3, n_cells=2, n_probe=2).count() >= 1
    pairs = {
        (r.id_a, r.id_b)
        for r in embedding_near_dups(emb, threshold=0.9).collect()
    }
    assert pairs == {(1, 2)}
    assert centroid_assign(
        emb, [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 0.0])]
    ).count() == 3
    assert semantic_dedup(emb, n_clusters=2).count() == 3
    bench = emb.filter("vec_id = 5")
    out = semantic_decontaminate(emb.filter("vec_id < 5"), bench)
    assert out.count() == 2  # corpus rows 1,2 scored; 3,4 dropped


def test_incremental_minhash_replay_id_in_both_frames(spark):
    """An id re-ingested (present in BOTH standing and incoming) must
    not double its postings: jaccard values stay exact and no phantom
    self-pair appears."""
    from atd_data_lake_spark.operators.dedup import (
        incremental_minhash_near_dups,
    )

    doc42 = "alpha beta gamma delta epsilon zeta"
    standing = spark.createDataFrame(
        [(42, doc42), (7, "one two three four five six")],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        [(42, doc42), (99, "alpha beta gamma delta epsilon eta")],
        "doc_id long, text string",
    )
    out = {
        (r.id_a, r.id_b): r.jaccard
        for r in incremental_minhash_near_dups(
            standing, incoming, num_hashes=32, bands=10, threshold=0.3
        ).collect()
    }
    # true pairs touching incoming: (42, 99) with J = 3 shared of 5
    # distinct 3-gram shingles = 0.6 — NOT inflated by the replayed 42
    assert (42, 42) not in out
    assert out == {(42, 99): 0.6}


@_pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_registry_geometry_banding_recall_holds_multi_sf(spark, sf):
    """ADVICE r5: the DuckDB oracle for dedup_minhash_lsh /
    dedup_incremental_minhash is licensed by ZERO banding misses at the
    light 32/10 registry geometry (per-pair miss ≈ 7.7e-4 at J = 0.8) —
    a property of the CORPUS, not the operator.  This gate re-proves the
    equality at two SFs in the default suite so a regenerated corpus
    with a borderline pair fails HERE, not in the external driver; the
    round-close multi-SF sweep extends it to sf0.1."""
    import os

    from atd_data_lake_spark.operators.dedup import (
        minhash_near_dups,
        ngram_jaccard_pairs,
    )

    if not os.path.isdir(sf):
        _pytest.skip(f"{sf} absent")
    d = read_table(spark, sf, "documents")
    verified = sorted(
        tuple(r)
        for r in minhash_near_dups(
            d, num_hashes=32, bands=10, threshold=0.8
        ).collect()
    )
    exact = sorted(
        tuple(r) for r in ngram_jaccard_pairs(d, threshold=0.8).collect()
    )
    assert verified == exact and verified


def test_tracked_caches_unpersists_operator_persists(spark, sf_dir):
    """ADVICE r5: operator persists outlived their query in a
    many-query session.  tracked_caches() collects every persist the
    enclosed operator creates and unpersists on exit."""
    from atd_data_lake_spark.operators.dedup import (
        minhash_near_dups,
        tracked_caches,
    )

    # unique analyzed plan → the shared shingle frame (r9
    # dedup.shingle_hashes) is COLD here, so its persist registers in
    # this scope like the operator-private ones; a warm shared frame
    # from an earlier query would legitimately register nothing
    # (sharing across queries is its point — see test_round46)
    d = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 1000 != 998
    )
    with tracked_caches() as reg:
        out = minhash_near_dups(
            d, num_hashes=32, bands=10, threshold=0.8
        ).collect()
        assert out
        # buckets (r7: feeds the small/large expansion branches)
        # + cands + pruned shingles were persisted inside the scope
        # (r9: the signature frame no longer persists — single consumer
        # since the in-partition pair expansion removed the self-join)
        assert len(reg) == 3
        assert all(f.is_cached for f in reg)
    assert all(not f.is_cached for f in reg)


def test_replayed_id_prefers_incoming_copy_deterministically(spark):
    """ADVICE r5: a doc id present in BOTH standing and incoming with
    DIFFERENT text (updated on replay) must be judged by the incoming
    text — not whichever copy a task scanned first."""
    from atd_data_lake_spark.operators.dedup import (
        incremental_minhash_near_dups,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    standing = spark.createDataFrame(
        [
            (1, base),
            # id 3's STANDING text is a near-dup of doc 1 ...
            (3, base + " iota"),
        ],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        # ... but its replayed INCOMING text is unrelated: with the
        # incoming copy preferred, no verified pair may survive
        [(3, "one two three four five six seven eight nine")],
        "doc_id long, text string",
    )
    out = incremental_minhash_near_dups(
        standing, incoming, num_hashes=16, bands=16, threshold=0.5
    ).collect()
    assert out == []
    # and the mirror case: incoming text IS the near-dup
    incoming2 = spark.createDataFrame(
        [(3, base + " iota")], "doc_id long, text string"
    )
    standing2 = spark.createDataFrame(
        [(1, base), (3, "one two three four five six seven eight nine")],
        "doc_id long, text string",
    )
    out2 = incremental_minhash_near_dups(
        standing2, incoming2, num_hashes=16, bands=16, threshold=0.5
    ).collect()
    assert [(r.id_a, r.id_b) for r in out2] == [(1, 3)]


def test_repeated_spans_finds_planted_span(spark):
    """A 30-token span planted inside two otherwise-distinct documents
    must surface as ONE maximal run with exact 1-based starts; unrelated
    docs must produce nothing (Lee et al. substring-dedup semantics)."""
    from atd_data_lake_spark.operators.dedup import repeated_span_pairs

    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(5000)]  # big vocab: no chance windows

    def words(n):
        return [vocab[rng.randrange(len(vocab))] for _ in range(n)]

    span = words(30)
    a = words(10) + span + words(15)   # span at 1-based pos 11
    b = words(4) + span + words(25)    # span at 1-based pos 5
    c = words(60)
    d = words(60)
    docs = spark.createDataFrame(
        [(1, " ".join(a)), (2, " ".join(b)), (3, " ".join(c)),
         (4, " ".join(d))],
        "doc_id long, text string",
    )
    out = repeated_span_pairs(docs, window=8, min_span=12).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert (r["start_a"], r["start_b"]) == (11, 5)
    assert r["span_tokens"] == 30


def test_window_hash_rows_matches_jvm_formulation(spark):
    """The Arrow-batched window hasher (r9) must emit the exact rows of
    the JVM ``transform``/``md5``/``conv`` formulation it replaced —
    same 1-based positions, same 52-bit md5-prefix values, same empty-
    token behavior on consecutive delimiters, same null/short-doc
    handling (this is what keeps DuckDB-oracle parity)."""
    from pyspark.sql import functions as F

    from atd_data_lake_spark.operators.dedup import window_hash_rows

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),      # 3 windows at w=8
            (2, "x  y z a b c d e"),          # double space: empty token
            (3, "short doc"),                 # < window tokens: no rows
            (4, None),                        # null text: no rows
            (5, "a b c d e f g h"),           # exactly one window
        ],
        "doc_id long, text string",
    )
    window = 8
    words = F.split(F.col("text"), " ")
    n_wins = F.size(words) - F.lit(window - 1)
    wins = F.when(n_wins >= 1, F.sequence(F.lit(1), n_wins)).otherwise(
        F.array().cast("array<int>")
    )
    jvm = (
        docs.select(
            F.col("doc_id").alias("_id"),
            F.posexplode(
                F.transform(
                    wins,
                    lambda i: F.concat_ws(" ", F.slice(words, i, window)),
                )
            ).alias("_p0", "_w"),
        )
        .select(
            "_id",
            (F.col("_p0") + 1).alias("_pos"),
            F.conv(F.substring(F.md5("_w"), 1, 13), 16, 10)
            .cast("long")
            .alias("_wh"),
        )
        .collect()
    )
    arrow = window_hash_rows(docs, window=window).collect()
    key = lambda r: (r["_id"], r["_pos"])  # noqa: E731
    assert sorted(map(tuple, arrow)) == sorted(map(tuple, jvm))
    assert {r["_id"] for r in arrow} == {1, 2, 5}


def test_repeated_spans_df_cutoff_drops_boilerplate(spark):
    """A window shared by MORE than max_df documents (boilerplate) must
    not generate pairs — the quadratic-trap guard."""
    from atd_data_lake_spark.operators.dedup import repeated_span_pairs

    import random

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(5000)]
    boiler = [vocab[rng.randrange(len(vocab))] for _ in range(20)]
    rows = []
    for i in range(30):  # 30 docs all carry the same 20-token banner
        filler = [vocab[rng.randrange(len(vocab))] for _ in range(40)]
        rows.append((i, " ".join(boiler + filler)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = repeated_span_pairs(docs, window=8, min_span=12, max_df=20)
    assert out.count() == 0
    # raising the cutoff above the boilerplate df brings the pairs back
    out2 = repeated_span_pairs(docs, window=8, min_span=12, max_df=40)
    assert out2.count() == 30 * 29 // 2


def test_incremental_spans_equal_full_restriction(spark, sf_dir):
    """incremental_repeated_spans == repeated_span_pairs restricted to
    pairs with a new member (exactness of the incremental split), and
    it must emit NO standing-only pairs."""
    from atd_data_lake_spark.operators.dedup import (
        incremental_repeated_spans,
        repeated_span_pairs,
    )
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = d.filter(F.col("doc_id") % 10 == 7)
    standing = d.filter(F.col("doc_id") % 10 != 7)
    inc = sorted(
        tuple(r)
        for r in incremental_repeated_spans(standing, new).collect()
    )
    full = sorted(
        tuple(r)
        for r in repeated_span_pairs(d)
        .filter((F.col("doc_a") % 10 == 7) | (F.col("doc_b") % 10 == 7))
        .collect()
    )
    assert inc == full
    assert all(r[0] % 10 == 7 or r[1] % 10 == 7 for r in inc)


def test_lsh_oversized_bucket_fallback_pairs_identical(spark, monkeypatch):
    """Force the size-gated big-bucket path (cap exceeded) and assert
    the pair multiset equals the in-partition expansion's — the r7
    OOM-guard fallback must be semantics-exact."""
    from atd_data_lake_spark.operators import dedup as dd

    rows = [(i, "identical text for every doc here") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(df):
        return sorted(
            tuple(r)
            for r in dd.minhash_lsh_candidates(
                df, num_hashes=16, bands=4
            ).collect()
        )

    small_path = pairs(docs)  # 12 members <= default cap 512
    src = dd.minhash_lsh_candidates.__code__
    assert small_path  # identical docs: all C(12,2) pairs, 4 bands each
    # shrink the cap so the same buckets route through the join branch
    import atd_data_lake_spark.operators.dedup as mod
    import re as _re
    import inspect

    # cap is a local constant; patch by running with a tiny cap via the
    # module-level function's source is brittle — instead monkeypatch
    # F.size comparisons is worse.  The clean hook: temporarily rebind
    # the function with cap swapped through its closure-free source.
    source = inspect.getsource(mod.minhash_lsh_candidates)
    assert "cap = 512" in source
    patched = source.replace("cap = 512", "cap = 3")
    ns = dict(vars(mod))
    exec(compile(patched, "<patched>", "exec"), ns)
    big_path = sorted(
        tuple(r)
        for r in ns["minhash_lsh_candidates"](
            docs, num_hashes=16, bands=4
        ).collect()
    )
    assert big_path == small_path
