"""Round-44 targeted tests — in-plan logistic-regression training:
learning actually happens (loss drops below the w=0 baseline ln 2),
the trained model is partition-invariant (decimal-summed gradients are
order-exact), and a separable toy corpus trains weights of the right
sign.  Full oracle parity runs in test_oracle_parity.py / the driver
sweep.
"""

from __future__ import annotations

import math

import pytest

from atd_data_lake_spark.round44_queries import dq_logreg_quality_train


def test_training_reduces_loss_below_zero_model(spark, sf_dir):
    row = dq_logreg_quality_train(spark, sf_dir).first()
    # at w = 0 every prediction is 0.5 and mean log-loss is exactly ln 2
    assert row["mean_loss"] < math.log(2.0)
    assert row["n_docs"] > 0
    assert any(row[f"w{k}"] != 0.0 for k in range(4))


def test_trained_model_partition_invariant(spark, sf_dir):
    import atd_data_lake_spark.round44_queries as r44

    base = dq_logreg_quality_train(spark, sf_dir).first()
    orig = r44._features

    def shuffled(s, d):
        return orig(s, d).repartition(13)

    r44._features = shuffled
    try:
        re = dq_logreg_quality_train(spark, sf_dir).first()
    finally:
        r44._features = orig
    assert tuple(base) == tuple(re)


def test_separable_toy_corpus_learns_signs(spark, tmp_path):
    # label == en exactly when the text is stopword-dense: w1 must come
    # out positive and the loss well under ln 2
    rows = []
    for i in range(200):
        if i % 2 == 0:
            rows.append((i, "the a of and to in is it on for", "en"))
        else:
            rows.append((i, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "de"))
    df = spark.createDataFrame(
        [(i, t, lang, "src", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    row = dq_logreg_quality_train(spark, str(tmp_path)).first()
    assert row["w1"] > 0.0
    assert row["mean_loss"] < 0.55
