"""Model-based document quality filtering — the learned tier above the
heuristic quality score in ``text_analysis``.

This is the GPT-3 / CCNet pattern (Brown et al. 2020, appendix A;
Wenzek et al. 2020): train a linear classifier on hashed bag-of-words
features with a trusted corpus as positives and raw crawl as negatives,
score every document with P(high quality), and keep documents by a
Pareto-thresholded rule so the kept set is quality-skewed without
collapsing onto the classifier's mode. The heuristic score (q21) is a
per-document formula; this operator learns corpus-level signal the
formula cannot express (vocabulary, topicality).

Spark-first shape: tokenization is the engine's shared JVM tokenizer
(``functions.texthash.tokens`` — the same token stream every other text
operator sees), features are ``pyspark.ml.feature.HashingTF`` over the
token array (JVM-side hashing trick, no vocabulary state, no Python),
and the model is ``pyspark.ml.classification.LogisticRegression``
(distributed L-BFGS over Tungsten vectors). Scoring is one
``model.transform`` — a broadcast of ~2^18 coefficients and a dot
product per row, no shuffle at all, so the corpus-wide scoring pass is
a single map stage at any scale.

The keep rule is DETERMINISTIC: GPT-3 keeps a document iff
``score > 1 - pareto(alpha)``; here the Pareto draw derives from
``xxhash64(doc_id, salt)`` by inverse-CDF, so reruns and retries keep
exactly the same documents (the engine-wide reproducible-sampling
discipline, same as ``operators/sampling``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import texthash as TH

QM_NUM_FEATURES = 1 << 18


def _featurize(df: DataFrame, text_col: str, num_features: int) -> DataFrame:
    """token array -> hashed term-frequency SparseVector (JVM-side)."""
    from pyspark.ml.feature import HashingTF

    toks = df.withColumn("_toks", TH.tokens(F.col(text_col)))
    tf = HashingTF(
        inputCol="_toks", outputCol="_features", numFeatures=num_features
    )
    return tf.transform(toks).drop("_toks")


def train_quality_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    text_col: str = "text",
    num_features: int = QM_NUM_FEATURES,
    reg_param: float = 1e-4,
    max_iter: int = 50,
) -> dict:
    """Fit the LR quality model from a trusted-positive / raw-negative
    pair of document relations; returns ``{"model", "num_features",
    "text_col"}`` (the wrapper carries the feature geometry so scoring
    can rebuild the exact same hashed features).

    Both inputs only need ``text_col``; labels are attached here (1 =
    trusted). Training is distributed (L-BFGS aggregates gradients
    tree-wise); the fitted coefficient vector is tiny (num_features
    doubles) and broadcasts to every scoring task.
    """
    from pyspark.ml.classification import LogisticRegression

    labeled = positives.select(
        F.col(text_col).alias(text_col), F.lit(1.0).alias("_label")
    ).unionByName(
        negatives.select(
            F.col(text_col).alias(text_col), F.lit(0.0).alias("_label")
        )
    )
    feats = _featurize(labeled, text_col, num_features)
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol="_label",
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    return {
        "model": lr.fit(feats),
        "num_features": num_features,
        "text_col": text_col,
    }


def score_quality(
    df: DataFrame,
    classifier: dict,
    id_col: str = "doc_id",
    text_col: str | None = None,
) -> DataFrame:
    """(id_col, quality_prob): P(trusted | document) per row — one map
    stage (hash features + broadcast-coefficient dot product), no
    shuffle. Keeps every input row; filtering is ``pareto_keep``'s job
    so callers can audit the score distribution before cutting."""
    from pyspark.ml.functions import vector_to_array

    tcol = text_col or classifier["text_col"]
    feats = _featurize(df, tcol, classifier["num_features"])
    scored = classifier["model"].transform(feats)
    prob_hi = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.select(F.col(id_col), prob_hi.alias("quality_prob"))


def pareto_keep(
    scored: DataFrame,
    alpha: float = 9.0,
    id_col: str = "doc_id",
    score_col: str = "quality_prob",
    salt: int = 0,
) -> DataFrame:
    """GPT-3's stochastic quality cut, made reproducible: keep a
    document iff ``score > 1 - x`` where ``x ~ Pareto(alpha)`` (the
    Lomax form ``x = u^(-1/alpha) - 1``) and ``u`` derives from
    ``xxhash64(id, salt)`` — high-scoring documents almost always
    survive, low-scoring ones survive with heavy-tailed luck, and the
    same ids survive on every rerun. All builtin arithmetic; the filter
    rides the scan."""
    # u in (0, 1]: 53-bit mantissa from the hash, never exactly 0
    u = (
        (F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(1 << 53)) + 1)
        / F.lit(float(1 << 53))
    )
    x = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return scored.filter(F.col(score_col) > (F.lit(1.0) - x))
