"""Trained match weights: separable fit, native-sigmoid parity with the
pyspark.ml model, and the confusion report."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from australia_company_etl_pipeline_spark.pipeline import learn

FEATS = ["name_sim", "domain_match", "noise"]


def _labeled(spark):
    """name_sim separates perfectly; domain_match helps; noise is an
    id-derived constant-free column with zero signal."""
    rows = []
    for i in range(200):
        is_match = i % 2 == 0
        name_sim = 0.8 + (i % 5) * 0.04 if is_match else 0.1 + (i % 5) * 0.04
        domain = 1.0 if (is_match and i % 3 == 0) else 0.0
        noise = (i % 7) / 7.0
        rows.append((i, name_sim, domain, noise, is_match))
    return spark.createDataFrame(
        rows, "pair_id long, name_sim double, domain_match double, "
              "noise double, is_match boolean")


def test_fit_separates_and_scores_natively(spark):
    df = _labeled(spark)
    model = learn.fit_match_weights(df, FEATS, "is_match", reg_param=0.01)
    assert model.weights["name_sim"] > 0          # signal feature dominates
    assert abs(model.weights["name_sim"]) > abs(model.weights["noise"])
    scored = df.withColumn("p", learn.probability_expr(model))
    rows = scored.select("is_match", "p").collect()
    assert all((r.p >= 0.5) == r.is_match for r in rows)  # separable → 100%


def test_native_expr_matches_ml_transform(spark):
    """The codegen sigmoid must reproduce pyspark.ml's probability —
    the guarantee that inference can skip the ml pipeline entirely."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    df = _labeled(spark)
    model = learn.fit_match_weights(df, FEATS, "is_match", reg_param=0.01)
    prepped = df.select(*FEATS, F.col("is_match").cast("double")
                        .alias("__label"))
    assembled = VectorAssembler(inputCols=FEATS, outputCol="__fv") \
        .transform(prepped)
    fitted = LogisticRegression(featuresCol="__fv", labelCol="__label",
                                maxIter=100, regParam=0.01,
                                standardization=False).fit(assembled)
    ml_probs = [float(r.probability[1])
                for r in fitted.transform(assembled).collect()]
    native = [r.p for r in
              df.select(learn.probability_expr(model).alias("p")).collect()]
    assert max(abs(a - b) for a, b in zip(ml_probs, native)) < 1e-6


def test_evaluate_match_model_report(spark):
    scored = spark.createDataFrame(
        [(0.9, True), (0.8, True), (0.4, True),     # 2 tp, 1 fn
         (0.7, False), (0.2, False), (0.1, False)],  # 1 fp, 2 tn
        "p double, is_match boolean")
    (r,) = learn.evaluate_match_model(scored, "p").collect()
    assert (r.tp, r.fp, r.fn, r.tn) == (2, 1, 1, 2)
    assert r.accuracy == pytest.approx(4 / 6, abs=1e-6)
    assert r.precision == pytest.approx(2 / 3, abs=1e-6)
    assert r.recall == pytest.approx(2 / 3, abs=1e-6)
    assert r.f1 == pytest.approx(2 / 3, abs=1e-6)


def test_fit_validates_inputs(spark):
    df = _labeled(spark)
    with pytest.raises(ValueError, match="non-empty"):
        learn.fit_match_weights(df, [], "is_match")
    with pytest.raises(ValueError, match="not in frame"):
        learn.fit_match_weights(df, ["nope"], "is_match")


def test_evaluate_counts_unscored_and_empty(spark):
    """NULL probability/label rows land in n_unscored instead of
    silently shrinking the denominators; an empty frame reports zeros,
    not NULLs."""
    scored = spark.createDataFrame(
        [(0.9, True), (None, True), (0.2, None), (0.1, False)],
        "p double, is_match boolean")
    (r,) = learn.evaluate_match_model(scored, "p").collect()
    assert (r.tp, r.fp, r.fn, r.tn, r.n_unscored) == (1, 0, 0, 1, 2)
    empty = spark.createDataFrame([], "p double, is_match boolean")
    (e,) = learn.evaluate_match_model(empty, "p").collect()
    assert (e.tp, e.fp, e.fn, e.tn, e.n_unscored) == (0, 0, 0, 0, 0)
    assert e.accuracy is None and e.f1 is None


def test_text_classifier_learns_quality_gate(spark):
    """End-to-end in-engine quality classifier: weak-labeled good docs
    (varied vocabulary) vs bad docs (repeated spam tokens), trained via
    hashed features + distributed LR, scored with the native sigmoid.
    Held-out docs from each population must separate cleanly, and the
    scoring plan must stay UDF-free (pure codegen arithmetic)."""
    import random

    rng = random.Random(11)
    vocab = [f"word{i}" for i in range(300)]
    good = [(" ".join(rng.choice(vocab) for _ in range(30)), 1)
            for _ in range(40)]
    bad = [(" ".join(rng.choice(["buy", "now", "click", "free"])
                     for _ in range(30)), 0)
           for _ in range(40)]
    train = spark.createDataFrame(good[:30] + bad[:30],
                                  "text string, label int")
    model = learn.fit_text_classifier(train, "text", "label", dim=32,
                                      reg_param=0.01)
    assert len(model.weights) == 32 and model.dim == 32

    held = spark.createDataFrame(good[30:] + bad[30:],
                                 "text string, label int")
    scored = learn.score_documents(held, "text", model)
    rows = scored.collect()
    good_p = [r.quality_prob for r in rows if r.label == 1]
    bad_p = [r.quality_prob for r in rows if r.label == 0]
    assert min(good_p) > max(bad_p), (min(good_p), max(bad_p))
    assert all(p > 0.5 for p in good_p) and all(p < 0.5 for p in bad_p)

    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_text_classifier_scoring_requires_matching_config(spark):
    """Scoring under a different embedding config than the model was
    trained with silently misroutes every token — score_documents must
    re-derive the embedding from the model's own stored config, so a
    caller cannot desynchronize them."""
    df = spark.createDataFrame([("alpha beta gamma", 1),
                                ("delta epsilon zeta", 0)] * 6,
                               "text string, label int")
    m = learn.fit_text_classifier(df, "text", "label", dim=16, seed=7,
                                  reg_param=0.1)
    assert (m.dim, m.seed, m.hash_fn) == (16, 7, "native")
    from australia_company_etl_pipeline_spark.operators.embed import (
        embed_documents)
    from pyspark.sql import functions as F

    emb = embed_documents(df, "text", out_col="v", dim=16, seed=7)
    via_expr = emb.select(
        learn.classifier_prob_expr(m, F.col("v")).alias("p"),
        "text").collect()
    via_score = {r.text: r.quality_prob
                 for r in learn.score_documents(df, "text", m).collect()}
    for r in via_expr:
        assert abs(r.p - via_score[r.text]) < 1e-12
