"""Round-37 targeted tests: IVFADC structure invariants.  Oracle value
parity is covered by the driver sweep."""

from __future__ import annotations

from atd_data_lake_spark.round37_queries import sim_ann_ivfpq


def test_ivfpq_ranked_and_deterministic(spark, sf_dir):
    rows = sim_ann_ivfpq(spark, sf_dir).collect()
    assert len(rows) > 0
    per = {}
    for r in rows:
        per.setdefault(r["query_id"], []).append(r)
    for q, rs in per.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        dists = [r["adc_dist"] for r in rs]
        assert dists == sorted(dists)
        assert all(r["neighbor_id"] != q for r in rs)
    again = sorted(map(tuple, sim_ann_ivfpq(spark, sf_dir).collect()))
    assert sorted(map(tuple, rows)) == again


def test_ivfpq_candidates_subset_of_exhaustive_adc(spark, sf_dir):
    """IVFADC scores only probed cells, so each of its results must
    appear in the EXHAUSTIVE ADC scan's scored set with the SAME
    distance — probing changes the candidate set, never a score."""
    from atd_data_lake_spark.round33_queries import sim_ann_pq_adc

    ivfpq = sim_ann_ivfpq(spark, sf_dir).collect()
    # exhaustive top-10 may differ (more candidates), but any overlap
    # pair must carry identical adc_dist
    full = {
        (r["query_id"], r["neighbor_id"]): r["adc_dist"]
        for r in sim_ann_pq_adc(spark, sf_dir).collect()
    }
    overlap = 0
    for r in ivfpq:
        key = (r["query_id"], r["neighbor_id"])
        if key in full:
            overlap += 1
            assert full[key] == r["adc_dist"]
    assert overlap > 0  # probing 4/16 cells still finds shared winners
