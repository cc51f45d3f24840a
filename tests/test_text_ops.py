"""Text-analysis operators named by the north star: BPE-ish regex token
counting, character-trigram language ID, rolling-hash (winnowing)
fingerprinting.  Edge cases the sf-table oracle gate can't reach: empty
text, text shorter than the k-gram width, deterministic tie-breaks, and
a pure-Python winnowing reference."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from atd_data_lake_spark.operators.text import (
    RK_BASE,
    RK_K,
    RK_MOD,
    RK_W,
    TRIGRAM_PROFILES,
    bpe_pretoken_count,
    langid_trigram_documents,
    winnow_fingerprints,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_pretokens_gpt2_style(spark):
    df = _docs(spark, [(1, "Don't stop, it's 42 héllo-world!"), (2, ""), (3, "   ")])
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", bpe_pretoken_count(F.col("text")).alias("n")).collect()
    }
    # Don|'t| stop|,| it|'s| 42| héllo|-|world|! = 11; whitespace is not a token
    assert got == {1: 11, 2: 0, 3: 0}


def test_langid_trigram_basic_and_ties(spark):
    df = _docs(
        spark,
        [
            (1, "the thing and the other thing"),
            (2, "la casa de los que viven"),
            (3, "der ich sch und ein die"),
            (4, "xyzzy qqq"),  # no profile trigram -> und
            (5, ""),  # empty -> und
        ],
    )
    got = {
        r["doc_id"]: (r["lang_trigram"], r["tri_score"])
        for r in langid_trigram_documents(df).collect()
    }
    assert got[1][0] == "en"
    assert got[2][0] == "es"
    assert got[3][0] == "de"
    assert got[4] == ("und", 0)
    assert got[5] == ("und", 0)


def test_langid_trigram_tie_break_first_lang_wins(spark):
    # " de" is in both es and fr profiles; a text hitting only that trigram
    # scores es=1, fr=1 -> es (first in TRIGRAM_PROFILES order).
    assert list(TRIGRAM_PROFILES) == ["en", "es", "de", "fr"]
    df = _docs(spark, [(1, "zz de zz")])
    row = langid_trigram_documents(df).collect()[0]
    assert (row["lang_trigram"], row["tri_score"]) == ("es", 1)


def _winnow_ref(text: str, k: int = RK_K, w: int = RK_W):
    """Pure-Python winnowing reference (Schleimer et al. 2003)."""
    import re

    s = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    n = len(s) - k + 1
    if n <= 0:
        return 0, -1, 0
    hs = []
    for i in range(n):
        h = 0
        for ch in s[i : i + k]:
            h = (h * RK_BASE + ord(ch)) % RK_MOD
        hs.append(h)
    if n < w:
        mins = {min(hs)}
    else:
        mins = {min(hs[p : p + w]) for p in range(n - w + 1)}
    return n, min(hs), len(mins)


@pytest.mark.parametrize(
    "text",
    [
        "",
        "short",  # normalized length < k
        "exactly8",  # exactly one k-gram
        "The quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaa",  # degenerate: all grams identical -> 1 fingerprint
        "Punct!!! and    WHITESPACE\t\tnoise...",
    ],
)
def test_winnow_matches_python_reference(spark, text):
    df = _docs(spark, [(1, text)])
    row = winnow_fingerprints(df).collect()[0]
    n, rk_min, n_fp = _winnow_ref(text)
    assert (row["n_grams"], row["rk_min"], row["n_fingerprints"]) == (n, rk_min, n_fp)


def test_winnow_fingerprint_stable_under_formatting_noise(spark):
    # Normalization makes the fingerprint set invariant to case /
    # punctuation / whitespace — the property that makes it a near-dup
    # signal rather than an exact hash.
    df = _docs(
        spark,
        [
            (1, "The quick brown fox jumps over the lazy dog"),
            (2, "the QUICK,  brown... FOX jumps over THE lazy dog!!"),
        ],
    )
    rows = {r["doc_id"]: r for r in winnow_fingerprints(df).collect()}
    assert rows[1]["rk_min"] == rows[2]["rk_min"]
    assert rows[1]["n_fingerprints"] == rows[2]["n_fingerprints"]
    assert rows[1]["n_grams"] == rows[2]["n_grams"]


def test_connected_components_chain_and_cliques(spark):
    """Min-label propagation reaches across multi-hop chains (diameter >
    1) and merges cliques that share a member; singletons-with-an-edge
    keep their own pair component."""
    from atd_data_lake_spark.operators.components import (
        connected_components,
        dedup_clusters,
    )

    edges = spark.createDataFrame(
        # chain 1-2-3-4 (diameter 3), triangle 10-11-12, bridge 12-13,
        # isolated pair 20-21
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (12, 13), (20, 21)],
        "id_a long, id_b long",
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}

    clusters = {
        r["doc_id"]: (r["component"], r["n_members"])
        for r in dedup_clusters(edges).collect()
    }
    assert clusters[4] == (1, 4) and clusters[13] == (10, 4) and clusters[21] == (20, 2)


def test_connected_components_chain_converges_logarithmically(spark):
    """A 300-node chain (diameter 299) must converge well within 25
    rounds: the hook+shortcut scheme is O(log n), where pure min-label
    propagation would need ~300 rounds and (now) raise."""
    from atd_data_lake_spark.operators.components import connected_components

    n = 300
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    comp = connected_components(edges, max_iter=15, max_local_edges=0)
    rows = comp.collect()
    assert len(rows) == n
    assert {r["component"] for r in rows} == {0}


def test_connected_components_raises_when_not_converged(spark):
    import pytest

    from atd_data_lake_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2, max_local_edges=0)


def test_components_local_path_equals_distributed(spark):
    """The size gate's two paths compute the identical fixpoint."""
    import random

    from atd_data_lake_spark.operators.components import connected_components

    rng = random.Random(7)
    edges = spark.createDataFrame(
        [(rng.randrange(120), rng.randrange(120)) for _ in range(150)],
        "id_a long, id_b long",
    )
    local = {
        (r["node"], r["component"])
        for r in connected_components(edges).collect()  # gate → local
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(edges, max_local_edges=0).collect()
    }
    assert local == dist


def test_repetition_profile_edges(spark):
    from atd_data_lake_spark.operators.text import repetition_profile

    df = _docs(
        spark,
        [
            (1, ""),                      # no tokens -> 0, 0
            (2, "one"),                   # single token -> 0 bigrams, 0 dups
            (3, "a a a a"),               # one repeated bigram + dup tokens
            (4, "w x y z"),               # all distinct
        ],
    )
    got = {
        r["doc_id"]: (r["top_bigram_frac"], r["dup_token_frac"])
        for r in repetition_profile(df).collect()
    }
    assert got[1] == (0.0, 0.0)
    assert got[2] == (0.0, 0.0)
    assert got[3] == (1.0, 0.75)
    # all-distinct bigrams: the max still takes 1 of 3 occurrences
    assert got[4] == (0.333333, 0.0)


def test_corpus_ops_survive_null_and_empty_text(spark):
    """A single NULL (or empty) text row in a 100 TB corpus must degrade
    to 'no tokens', never crash an Arrow worker mid-job — every per-doc
    text op is exercised over a frame containing both."""
    from atd_data_lake_spark.operators.dedup import (
        minhash_near_dups,
        ngram_jaccard_pairs,
        simhash_near_dups,
    )
    from atd_data_lake_spark.operators.text import (
        langid_trigram_documents,
        ngram_novelty,
        profile_documents,
        repetition_profile,
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),
            (3, None),
            (4, ""),
            (5, "   "),
        ],
        "doc_id long, text string",
    )
    prof = {r.doc_id: r for r in profile_documents(docs).collect()}
    assert prof[3]["n_tokens"] == 0 and prof[4]["n_tokens"] == 0
    assert prof[3]["lang_pred"] == "und"

    rep = {r.doc_id: r for r in repetition_profile(docs).collect()}
    assert rep[3]["dup_token_frac"] == 0.0

    assert langid_trigram_documents(docs).count() == 5
    assert winnow_fingerprints(docs).count() == 5

    # shingle-family ops silently drop sub-n/NULL docs
    nov = {r.doc_id for r in ngram_novelty(docs).collect()}
    assert nov == {1, 2}
    pairs = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert pairs == {(1, 2)}
    assert {
        (r.id_a, r.id_b)
        for r in minhash_near_dups(docs, threshold=0.3).collect()
    } == {(1, 2)}
    # simhash must run through the NULL rows; candidate pairs (if any at
    # this radius — 5-token docs hash far apart) involve real docs only
    sh_pairs = simhash_near_dups(docs, max_hamming=6, block_bits=8).collect()
    assert all(r.id_a in {1, 2} and r.id_b in {1, 2} for r in sh_pairs)
