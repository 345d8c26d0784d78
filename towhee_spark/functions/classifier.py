"""Hashed-feature linear text classifier (fastText shape) as a pure
Catalyst plan.

The quality-filter stage real pretraining pipelines run (CCNet/fastText
doc classifiers) distilled to its Spark-native skeleton: tokenize with
the codebase's canonical normalizer, hash unigrams + adjacent-pair
bigrams into ``dim`` buckets, broadcast-join a (bucket, weight) table,
mean-pool per document, threshold the logit. The reference ships model
inference as hub ops (towhee/runtime/hub_ops — text_embedding etc.); here
the deployment shape is a DataFrame plan whose model is DATA (a weight
table), so swapping in a really-trained model is a parquet read, not a
code change.

Float-parity design: weights are integers scaled by 2^-10 (exact binary
fractions, |w| <= 1000/1024), so per-document sums are EXACT in double
arithmetic regardless of accumulation order — no rounding discipline or
measured margins needed anywhere in the aggregation, and the logit is
bit-identical across engines (one correctly-rounded division at the
end). Only the sigmoid is engine-ulp-sensitive, which is why gates
compare the logit, not the probability.

Scale story (100 TB): explode(features) → ONE hash aggregate per doc
after a broadcast join against the dim-row weight table — map-side
combine applies, no shuffle carries more than (doc_id, partial sums).
The weight table is dim rows (512-1M) — always broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from towhee_spark.functions.curation import hash60


def feature_array(text_col, include_bigrams: bool = True):
    """array<string> of hashed-feature keys: whitespace unigrams (via the
    shared normalize_text tokenizer) plus ``tok_i + '_' + tok_{i+1}``
    bigrams — fastText's word + wordNgrams=2 feature set."""
    from towhee_spark.functions.ranking import _toks  # noqa: PLC0415

    toks = _toks(text_col)
    if not include_bigrams:
        return toks
    # zip the token list against its own 1-shifted slice — pairwise
    # sequential access. The earlier indexed-transform formulation
    # (transform(slice, (x, i) -> concat(x, element_at(toks, i + 2))))
    # paid an interpreted random-access element_at per element: measured
    # 5.0 s -> 0.7 s (7x) on the sf0.1 feature stream for this form
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat_ws("_", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def hash_weights(spark: SparkSession, dim: int = 512, salt_w: str = "w") -> DataFrame:
    """A deterministic (bucket, w) weight table: w = (hash60(salt_w ||
    bucket) % 2001 - 1000) / 1024 ∈ [-1000/1024, 1000/1024], an exact
    multiple of 2^-10. This is the UNTRAINED stand-in the sandbox can
    gate end-to-end (both engines re-derive it from the formula); a real
    classifier replaces it with a trained table of the same schema —
    every other stage of the plan is unchanged."""
    return spark.range(dim).select(
        F.col("id").cast("int").alias("bucket"),
        ((F.pmod(hash60(F.col("id"), salt_w), F.lit(2001)) - F.lit(1000))
         / F.lit(1024.0)).alias("w"),
    )


def linear_classifier_score(
    docs: DataFrame,
    weights: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 512,
    bias: float = 0.0,
    include_bigrams: bool = True,
    salt: str = "feat",
    keep_threshold: float = 0.0,
) -> DataFrame:
    """Score every document with the linear model: logit = bias +
    mean(w[bucket(feature)]); returns (id_col, n_feats, logit, prob,
    keep). Docs with no features (empty/NULL text) score logit = bias.

    ``weights`` must be (bucket:int ∈ [0, dim), w:double); defaults to
    the deterministic hash_weights table. ``keep`` = logit >=
    keep_threshold — exact when weights are exact binary fractions and
    the threshold is one too (0.0 is)."""
    if weights is None:
        weights = hash_weights(docs.sparkSession, dim)
    from towhee_spark.layout import fan_out  # noqa: PLC0415

    # the feature explode + per-feature md5 hash evaluate in the scan
    # stage — one task on a single-row-group corpus (layout.fan_out:
    # no-op at scale). Order-safe: weights are exact binary fractions
    # (ints/1024), so the per-doc double sums are order-free.
    feats = fan_out(docs).select(
        F.col(id_col),
        F.explode(feature_array(F.col(text_col), include_bigrams)).alias("feat"),
    ).select(
        id_col,
        F.pmod(hash60(F.col("feat"), salt), F.lit(dim)).cast("int").alias("bucket"),
    )
    agg = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum("w").alias("__wsum"), F.count(F.lit(1)).alias("n_feats"))
    )
    logit = F.lit(float(bias)) + F.when(
        F.col("n_feats") > 0, F.col("__wsum") / F.col("n_feats")
    ).otherwise(F.lit(0.0))
    return (
        docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce(logit, F.lit(float(bias))).alias("logit"),
        )
        .withColumn("prob", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))))
        .withColumn("keep", F.col("logit") >= F.lit(float(keep_threshold)))
    )
