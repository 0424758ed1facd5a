"""Learn the match-probability weights from labeled pairs.

The reference hardcodes its M4 linear weights
(``/root/reference/src/transform/feature_engineering.py:267-275``); this
module closes the loop for deployments that HAVE labels (clerical review
outcomes, golden pairs): fit a logistic regression over the M3 feature
columns with ``pyspark.ml`` (distributed L-BFGS — the fit is one pass
per iteration over the labeled pairs, no data leaves the cluster), then
throw the model object away and keep only ``(intercept, weights)``.

Inference deliberately does NOT use the fitted ``ml`` model: scoring a
100 TB candidate stream through ``model.transform`` drags a
VectorAssembler + prediction UDF into every plan. Instead
``probability_expr`` re-expresses the SAME sigmoid as a native Column
(whole-stage codegen, oracle-expressible) — ``tests/test_learn.py`` pins
native-vs-ml parity at 1e-6, so the translation can't drift.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MatchModel:
    """Portable artifact of ``fit_match_weights`` — plain numbers, no JVM
    handle, safe to serialize into a config or a literal table."""

    intercept: float
    weights: dict[str, float]


def fit_match_weights(labeled: DataFrame, feature_cols: list[str],
                      label_col: str = "is_match",
                      reg_param: float = 0.0,
                      elastic_net: float = 0.0,
                      max_iter: int = 100) -> MatchModel:
    """Fit P(match | features) by distributed logistic regression.

    ``labeled`` carries numeric feature columns (the M3 vector — already
    in [0, 1], so no scaling stage) and a 0/1 or boolean ``label_col``.
    ``reg_param``/``elastic_net`` expose L2/L1 mixing for small labeled
    sets where 12 features can overfit."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    missing = [c for c in feature_cols if c not in labeled.columns]
    if missing:
        raise ValueError(f"feature columns not in frame: {missing}")
    prepped = labeled.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("__label"))
    assembled = VectorAssembler(inputCols=feature_cols,
                                outputCol="__fv").transform(prepped)
    lr = LogisticRegression(featuresCol="__fv", labelCol="__label",
                            maxIter=max_iter, regParam=reg_param,
                            elasticNetParam=elastic_net, standardization=False)
    fitted = lr.fit(assembled)
    coeffs = fitted.coefficients.toArray().tolist()
    return MatchModel(intercept=float(fitted.intercept),
                      weights=dict(zip(feature_cols, coeffs)))


def probability_expr(model: MatchModel,
                     features: dict[str, Column] | None = None) -> Column:
    """The fitted sigmoid as a native Column —
    ``1 / (1 + exp(-(b + Σ wᵢ·fᵢ)))``. With ``features=None`` each
    weight's feature is read from the column of the same name. This is
    the scoring path: plain arithmetic inside codegen, broadcast-free,
    and expressible in ANSI SQL for the oracle gate."""
    z = F.lit(model.intercept)
    for name, w in model.weights.items():
        col = features[name] if features is not None else F.col(name)
        z = z + F.lit(w) * col.cast("double")
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def evaluate_match_model(scored: DataFrame, prob_col: str,
                         label_col: str = "is_match",
                         threshold: float = 0.5) -> DataFrame:
    """One-row confusion report in ONE partial-aggregated pass:
    tp/fp/fn/tn plus accuracy/precision/recall/f1 (NULL-guarded when a
    class is absent). Rows where the probability or label is NULL (a
    pair that never got scored) are counted in ``n_unscored`` instead of
    silently vanishing from the denominators — a join that failed to
    score 10% of pairs must show up in the retrain gate, not inflate
    accuracy. Counts are 0 (not NULL) on an empty frame."""
    pred = (F.col(prob_col) >= threshold).cast("int")
    truth = F.col(label_col).cast("int")
    unscored = F.col(prob_col).isNull() | F.col(label_col).isNull()

    def cnt(cond: Column, name: str) -> Column:
        return F.coalesce(F.sum(cond.cast("long")), F.lit(0)).alias(name)

    agg = scored.agg(
        cnt((pred == 1) & (truth == 1), "tp"),
        cnt((pred == 1) & (truth == 0), "fp"),
        cnt((pred == 0) & (truth == 1), "fn"),
        cnt((pred == 0) & (truth == 0), "tn"),
        cnt(unscored, "n_unscored"))
    n = F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")
    precision = F.col("tp") / F.nullif(F.col("tp") + F.col("fp"), F.lit(0))
    recall = F.col("tp") / F.nullif(F.col("tp") + F.col("fn"), F.lit(0))
    return agg.select(
        "tp", "fp", "fn", "tn", "n_unscored",
        F.round((F.col("tp") + F.col("tn")) / F.nullif(n, F.lit(0)), 6)
        .alias("accuracy"),
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(2 * precision * recall
                / F.nullif(precision + recall, F.lit(0)), 6).alias("f1"))


@dataclass(frozen=True)
class TextClassifierModel:
    """Portable artifact of ``fit_text_classifier`` — the embedding
    config it was trained under (scoring MUST reuse it: a different
    dim/seed/backend hashes tokens into different buckets and the
    weights are meaningless) plus plain-number coefficients."""

    dim: int
    seed: int
    hash_fn: str
    intercept: float
    weights: tuple[float, ...]  # one per embedding dimension


def fit_text_classifier(labeled_docs: DataFrame, text_col: str,
                        label_col: str, dim: int = 64, seed: int = 42,
                        hash_fn: str = "native",
                        reg_param: float = 0.0,
                        elastic_net: float = 0.0,
                        max_iter: int = 100) -> TextClassifierModel:
    """Train a fastText-style linear text classifier entirely in-engine:
    hashed bag-of-words features (``operators/embed.py`` — no
    vocabulary pass, no external model artifact) into the same
    distributed logistic regression ``fit_match_weights`` uses. The
    canonical use is a learned QUALITY GATE: weak-label a corpus slice
    (heuristic ``quality_score`` bands, a hand-audited sample, known
    good/bad sources), fit here, then score the full corpus with
    ``classifier_prob_expr`` — plain codegen arithmetic, no Python in
    the 100 TB scoring path (the CCNet/GPT-3 "quality classifier"
    stage, with feature hashing standing in for fastText n-grams).

    ``labeled_docs`` carries ``text_col`` and a 0/1 or boolean
    ``label_col``. Training cost is one embedding projection over the
    LABELED slice only (not the corpus) + L-BFGS passes."""
    from ..operators.embed import embed_documents

    emb = embed_documents(labeled_docs, text_col, out_col="__emb",
                          dim=dim, seed=seed, hash_fn=hash_fn)
    feat_cols = [f"__f{i}" for i in range(dim)]
    flat = emb.select(
        *[F.element_at("__emb", i + 1).alias(c)
          for i, c in enumerate(feat_cols)],
        F.col(label_col))
    mm = fit_match_weights(flat, feat_cols, label_col=label_col,
                           reg_param=reg_param, elastic_net=elastic_net,
                           max_iter=max_iter)
    return TextClassifierModel(
        dim=dim, seed=seed, hash_fn=hash_fn, intercept=mm.intercept,
        weights=tuple(mm.weights[c] for c in feat_cols))


def classifier_prob_expr(model: TextClassifierModel,
                         vec_col: Column) -> Column:
    """The fitted classifier over an ALREADY-EMBEDDED vector column as a
    native sigmoid — ``1/(1 + exp(-(b + w·v)))`` with the weights
    inlined as an array literal and the dot product a single
    ``zip_with``+``aggregate`` (codegen, no UDF). The vector must come
    from ``embed_documents`` under the model's own dim/seed/hash_fn."""
    w = F.array(*[F.lit(x) for x in model.weights])
    dot = F.aggregate(F.zip_with(vec_col, w, lambda a, b: a * b),
                      F.lit(0.0), lambda s, x: s + x)
    return F.lit(1.0) / (F.lit(1.0)
                         + F.exp(-(F.lit(model.intercept) + dot)))


def score_documents(docs: DataFrame, text_col: str,
                    model: TextClassifierModel,
                    prob_col: str = "quality_prob") -> DataFrame:
    """Append the classifier probability to every document: embedding
    projection under the model's stored config + the native sigmoid —
    the full-corpus scoring pass, one scan, shuffle-free."""
    from ..operators.embed import embed_documents

    emb = embed_documents(docs, text_col, out_col="__emb",
                          dim=model.dim, seed=model.seed,
                          hash_fn=model.hash_fn)
    return (emb.withColumn(prob_col,
                           classifier_prob_expr(model, F.col("__emb")))
            .drop("__emb"))


def classifier_threshold_from_reference(reference: DataFrame,
                                        text_col: str,
                                        model: TextClassifierModel,
                                        pct: float = 0.05,
                                        accuracy: int = 10000) -> float:
    """Calibrated keep-floor for the classifier gate — the twin of
    ``lm.lm_threshold_from_reference`` for the learned-quality side:
    score a curated reference slice with the frozen model and return
    its ``pct`` percentile probability ("keep what scores at least as
    well as all but the worst ``pct`` of text we trust"). Sigmoid
    probabilities are corpus-relative, not absolute — a magic 0.5 gate
    silently shifts meaning whenever the model is refit, while the
    percentile rule re-anchors to trusted text. One distributed
    approx-percentile aggregate; no collect beyond the scalar."""
    if not 0.0 < pct < 1.0:
        raise ValueError(f"pct must be in (0, 1), got {pct}")
    scored = score_documents(reference, text_col, model,
                             prob_col="__qp")
    row = scored.agg(F.percentile_approx(
        "__qp", F.lit(pct), F.lit(accuracy)).alias("t")).collect()[0]
    if row["t"] is None:
        raise ValueError("reference slice produced no scored documents "
                         "— cannot calibrate")
    return float(row["t"])
