"""Trainable document-quality classifier — the fastText-style "does this
crawl page look like reference text?" filter (Joulin et al. 2016 bag-of-
words + bigrams → linear classifier; the weak-supervision setup — curated
reference pages as positives, random crawl as negatives — is the
LLaMA/RefinedWeb quality-filter recipe).

Reference scope note: like lm.py/bpe.py, this is the step the reference
pipeline's webtext user takes next on its routed documents; built on
Spark MLlib (public pyspark.ml), nothing external.

Scale shapes:

* **featurization** is map-only Catalyst + HashingTF: the pinned
  ASCII-whitespace tokens plus word bigrams (fastText's signature
  feature), murmur3-hashed into a fixed-width sparse vector — no vocab
  shuffle, no fitting pass, any corpus size streams through.
* **training** is MLlib LogisticRegression: per-iteration treeAggregate
  of gradients (the classic distributed-GLM shape — model width =
  ``num_features`` doubles, broadcast once per iteration).
* **scoring** is map-only: broadcast coefficients, one dot product per
  row; ``with_quality_prob`` restores the caller's id/type by the
  repo-wide string-cast join.

Determinism note: hashing and scoring are exactly reproducible; L-BFGS
training is deterministic given a fixed partitioning but (like any
float-sum reduction) may differ in the last ulps across different
partitionings — tests therefore pin BEHAVIOR (separation/AUC on crafted
corpora), not coefficients. The LM perplexity filter (lm.py) remains the
bit-reproducible model-based gate; this classifier is the trainable
complement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logagg.textstats import tokens_col

DEFAULT_NUM_FEATURES = 1 << 18


def _word_bigram_col(text: Column) -> Column:
    """tokens + adjacent word bigrams ("a b"), the fastText feature set —
    pure Catalyst (zip_with over the token array and its shift)."""
    toks = tokens_col(text)
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(toks, bigrams)


def featurize(
    docs: DataFrame,
    text_col: str = "text",
    num_features: int = DEFAULT_NUM_FEATURES,
    out_col: str = "features",
) -> DataFrame:
    """Hashed bag-of-(words+bigrams) sparse vectors, map-only."""
    from pyspark.ml.feature import HashingTF

    with_terms = docs.withColumn("_terms", _word_bigram_col(F.col(text_col)))
    tf = HashingTF(inputCol="_terms", outputCol=out_col, numFeatures=num_features)
    return tf.transform(with_terms).drop("_terms")


def train_quality_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    *,
    text_col: str = "text",
    num_features: int = DEFAULT_NUM_FEATURES,
    reg_param: float = 1e-4,
    max_iter: int = 50,
):
    """Fit the linear quality model on weak labels (reference-like docs as
    positives, raw/junk crawl as negatives). Returns the fitted MLlib
    LogisticRegressionModel (``.save``/``.load`` for reuse across jobs,
    the ``--lm-model`` analog)."""
    from pyspark.ml.classification import LogisticRegression

    pos = positives.select(F.col(text_col).alias("text")).withColumn(
        "label", F.lit(1.0)
    )
    neg = negatives.select(F.col(text_col).alias("text")).withColumn(
        "label", F.lit(0.0)
    )
    data = featurize(pos.unionByName(neg), text_col="text", num_features=num_features)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    return lr.fit(data)


def score_quality(
    docs: DataFrame,
    model,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "quality_prob",
) -> DataFrame:
    """(id string, quality_prob double): P(reference-like) per document —
    map-only (broadcast coefficients inside MLlib's transform)."""
    from pyspark.ml.functions import vector_to_array

    feats = featurize(
        docs.select(
            F.col(id_col).cast("string").alias("id"), F.col(text_col).alias("text")
        ),
        text_col="text",
        num_features=model.numFeatures,
    )
    scored = model.transform(feats)
    return scored.select(
        "id", vector_to_array(F.col("probability")).getItem(1).alias(out_col)
    )


def with_quality_prob(
    docs: DataFrame,
    model,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "quality_prob",
) -> DataFrame:
    """``docs`` plus the classifier probability, id type restored."""
    scored = score_quality(
        docs, model, text_col=text_col, id_col=id_col, out_col=out_col
    ).withColumnRenamed("id", "_q_id")
    return docs.join(
        scored, F.col(id_col).cast("string") == F.col("_q_id"), "left"
    ).drop("_q_id")
