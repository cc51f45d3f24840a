"""Round-30 operator tests: perplexity buckets, Gopher rule gate,
min-label propagation."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_label_propagate_two_components(spark):
    """Two disjoint 3-cycles converge to their min node id within 3
    rounds; no label leaks across components."""
    from atd_data_lake_spark.operators.graph import label_propagate

    und = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    out = {r.node: r.label for r in label_propagate(edges, n_rounds=3).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_label_propagate_bounded_rounds_on_path(spark):
    """On a directed-both-ways path 1-2-3-4-5-6, k rounds reach k hops:
    after 3 rounds node 5 sees label 2 (3 hops), not 1 (4 hops)."""
    from atd_data_lake_spark.operators.graph import label_propagate

    und = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    out = {r.node: r.label for r in label_propagate(edges, n_rounds=3).collect()}
    assert out[4] == 1
    assert out[5] == 2
    assert out[6] == 3


def test_gopher_rules_pinned(spark, sf_dir, monkeypatch):
    """Rule observables pinned on a constructed doc; keep is the
    conjunction."""
    from atd_data_lake_spark import round30_queries as r30

    text_ok = "the quick brown fox jumps over the lazy dog and runs far " * 2
    # 24 words, has stopwords, no dominant word beyond 'the' (4/24 < .2)
    df = spark.createDataFrame(
        [(1, text_ok.strip()), (2, "spam " * 30 + "spam")],
        "doc_id long, text string",
    )

    def fake_t(spark_, sf, name):
        return df

    monkeypatch.setattr(r30, "_t", fake_t)
    out = {r.doc_id: r for r in r30.cur_gopher_rules(spark, sf_dir).collect()}
    assert out[1].n_words == 24
    assert out[1].stop_hits == 6  # 'the' x4 + 'and' x2
    assert out[1].mean_word_len == 3.75
    assert out[1].top_word_frac == round(4 / 24, 6)
    assert out[1].keep is True
    # doc 2: one word repeated 31 times -> dominance 1.0, no stopwords
    assert out[2].top_word_frac == 1.0
    assert out[2].keep is False


def test_perplexity_buckets_partition_by_lang(spark, sf_dir):
    """Each language gets its own tercile split: bucket sizes within a
    lang differ by at most 1, and every lang has all three buckets when
    it has >= 3 docs."""
    from atd_data_lake_spark.round30_queries import cur_perplexity_buckets

    out = cur_perplexity_buckets(spark, sf_dir).collect()
    from collections import Counter

    per_lang = Counter((r.lang, r.ppl_bucket) for r in out)
    langs = {r.lang for r in out}
    for lang in langs:
        sizes = [per_lang[(lang, b)] for b in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1
        assert all(s > 0 for s in sizes)


def test_label_propagate_keeps_sink_nodes(spark):
    """r6 review: a node appearing only as a destination must still be
    labeled (directed graph; symmetric callers were unaffected)."""
    from atd_data_lake_spark.operators.graph import label_propagate

    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = {r.node: r.label for r in label_propagate(edges, n_rounds=3).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


def test_tracked_caches_reclaims_graph_adjacency(spark):
    """r6 review: the cache scope is shared across operator modules —
    graph.py's adjacency persist registers too."""
    from atd_data_lake_spark.operators.graph import label_propagate
    from atd_data_lake_spark.operators.scale import tracked_caches

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )
    with tracked_caches() as reg:
        out = label_propagate(edges, n_rounds=2).collect()
        assert out
        # the receiver-keyed adjacency + the constant src-only label frame
        assert len(reg) == 2
        assert all(df.is_cached for df in reg)
    assert not any(df.is_cached for df in reg)
