"""Model-based document quality filtering.

The second quality layer every production pre-training pipeline adds
after rule filters: a lightweight classifier trained to distinguish
high-quality reference text from crawl noise, used to score (and
stratify or threshold) the whole corpus — the CCNet / WebText-style
"quality classifier" (Wenzek et al. 2020 §4.3 use a fastText model;
GPT-3's data work trained an LR over WebText-vs-crawl). Here the model
is Spark-native logistic regression over the engine's deterministic
text features, so training is a handful of distributed treeAggregate
passes and scoring is pure map work — no Python in either hot path.

Scale: feature extraction is the same zero-shuffle Column-expression
layer as :mod:`goetl_spark.operators.text`; training cost is
O(iterations) full scans of the (tiny) feature matrix; scoring adds one
JVM-side vector transform per row. At 100 TB you train on a sample
(`df.sample` or :func:`~goetl_spark.operators.sampling.hash_sample`)
and score everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from goetl_spark.operators.text import (
    mean_word_length, punct_ratio, stopword_hits, token_count, tokens)

#: feature column names produced by :func:`text_features` — fixed order,
#: part of the model contract
QUALITY_FEATURES = (
    "f_log_chars", "f_log_tokens", "f_mean_word_len", "f_punct_ratio",
    "f_stopword_ratio", "f_alpha_ratio", "f_digit_ratio", "f_upper_ratio",
)


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the :data:`QUALITY_FEATURES` numeric columns — pure Column
    expressions (log-scaled lengths, ratio features in [0,1]), NULL-safe
    (empty docs get zeros, never NULL/NaN, so downstream vector assembly
    cannot poison the model)."""
    c = F.col(text_col)
    n_chars = F.length(c)
    n_tok = token_count(text_col)
    denom_t = F.greatest(n_tok, F.lit(1)).cast("double")
    denom_c = F.greatest(n_chars, F.lit(1)).cast("double")
    alpha_words = F.size(F.filter(tokens(text_col),
                                  lambda w: w.rlike("[A-Za-z]")))
    n_digit = F.length(c) - F.length(F.regexp_replace(c, "[0-9]", ""))
    n_upper = F.length(c) - F.length(F.regexp_replace(c, "[A-Z]", ""))

    feats = {
        "f_log_chars": F.log1p(n_chars.cast("double")),
        "f_log_tokens": F.log1p(n_tok.cast("double")),
        # guard the ratio primitives: under ANSI mode x/0 raises, and an
        # empty/NULL doc has length 0 and token_count 0
        "f_mean_word_len": F.when(n_chars > 0, mean_word_length(text_col)),
        "f_punct_ratio": F.when(n_chars > 0, punct_ratio(text_col)),
        "f_stopword_ratio": stopword_hits(text_col, "en").cast("double")
        / denom_t,
        "f_alpha_ratio": alpha_words.cast("double") / denom_t,
        "f_digit_ratio": n_digit.cast("double") / denom_c,
        "f_upper_ratio": n_upper.cast("double") / denom_c,
    }
    out = df
    for name, expr in feats.items():
        out = out.withColumn(name, F.coalesce(expr, F.lit(0.0)))
    return out


def train_quality_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    max_iter: int = 50,
    reg_param: float = 0.01,
):
    """Train the LR quality model on a labeled frame (label 1 =
    high-quality reference text, 0 = noise). Returns the fitted
    ``pyspark.ml`` PipelineModel (assembler + scaler + LR) — pass it to
    :func:`score_quality`. Standard-scaling the features keeps the
    L2-regularized coefficients comparable across ratio vs log-length
    features."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    feats = text_features(labeled, text_col)
    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=list(QUALITY_FEATURES),
                        outputCol="__raw"),
        StandardScaler(inputCol="__raw", outputCol="__feat",
                       withMean=True, withStd=True),
        LogisticRegression(featuresCol="__feat", labelCol=label_col,
                           maxIter=max_iter, regParam=reg_param),
    ])
    return pipe.fit(feats)


def score_quality(
    df: DataFrame, model, text_col: str = "text",
    out: str = "quality_prob",
) -> DataFrame:
    """Append ``out`` = P(high quality) from a trained model — as a
    PURE Column expression: the LR coefficients, intercept, and scaler
    moments are extracted from the fitted pipeline ONCE on the driver
    and inlined as literals, so scoring is sigmoid(Σ wᵢ·(fᵢ−μᵢ)/σᵢ + b)
    over the feature expressions with no ML runtime in the plan.

    Serving-shaped on purpose: the scoring scan stays inside
    whole-stage codegen (no vector UDFs), the plan serializes like any
    other expression plan (pyspark.ml transform plans trip a Spark 4.1
    task-serialization bug — NotSerializableException:
    ObservationManager — in sessions with registered Observations), and
    a model exported as numbers reproduces identical scores anywhere.
    Matches ``model.transform``'s probabilities to float round-off
    (same per-feature operation order)."""
    lr = model.stages[-1]
    scaler = model.stages[1]
    coefs = [float(c) for c in lr.coefficients]
    mean = [float(m) for m in scaler.mean]
    std = [float(s) for s in scaler.std]

    feats = text_features(df, text_col)
    margin = F.lit(float(lr.intercept))
    for name, w, mu, sd in zip(QUALITY_FEATURES, coefs, mean, std):
        # MLlib StandardScalerModel semantics: zero-variance features
        # scale to 0 (factor 0), not NaN
        scaled = (F.lit(0.0) if sd == 0.0
                  else (F.col(name) - F.lit(mu)) / F.lit(sd))
        margin = margin + F.lit(w) * scaled
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    drop = [c for c in feats.columns if c.startswith("f_")]
    return feats.withColumn(out, prob).drop(*drop)
