"""Rerank op — parity with Towhee's rerank.cross_encoder
(towhee/runtime/hub_ops/rerank.py:23-60: (query, docs) → docs sorted by
score, optional threshold).

The cross-encoder model itself is external; the engine provides the
distributed shape: score every (query, doc) candidate pair with a pluggable
scorer (Arrow kernel or native Column), then per-query top-k via one window.
The default scorer is the deterministic hashed-BoW cosine — swap in a model
kernel cached with towhee_spark.kernels.worker_singleton for real use."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from towhee_spark.kernels import cosine_expr, embed_text_udf


def rerank(
    pairs: DataFrame,
    query_col: str = "query",
    doc_col: str = "doc",
    query_id: str = "query_id",
    k: int | None = None,
    threshold: float | None = None,
    scorer: Column | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Score and rank candidate (query, doc) rows per query.

    Returns the input plus (score, rank), filtered by threshold/top-k.
    ``scorer`` may be any Column over the pair's columns; default =
    cosine(hashed-BoW(query), hashed-BoW(doc)). ``tiebreak`` names the
    column that orders equal-score candidates (default: the doc text) —
    pass a unique id for a total, engine-independent ranking."""
    if scorer is None:
        emb = embed_text_udf(dim=64)
        scorer = cosine_expr(emb(F.col(query_col)), emb(F.col(doc_col)))
    scored = pairs.withColumn("score", scorer)
    if threshold is not None:
        scored = scored.filter(F.col("score") >= threshold)
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(tiebreak or doc_col)
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if k is not None:
        ranked = ranked.filter(F.col("rank") <= k)
    return ranked


def token_jaccard_scorer(query_col: str = "query", doc_col: str = "doc") -> Column:
    """Native lexical-overlap scorer: Jaccard of the distinct normalized
    token sets of query and doc, rounded to 6 dp. Pure Catalyst expressions
    (JVM, codegen) and exactly mirrorable in ANSI SQL (list_intersect /
    list_distinct) — the gate-verifiable default where no model is loaded."""
    from towhee_spark.functions.text import normalize_text  # noqa: PLC0415

    q = F.array_distinct(F.split(normalize_text(query_col), " "))
    d = F.array_distinct(F.split(normalize_text(doc_col), " "))
    inter = F.size(F.array_intersect(q, d)).cast("double")
    union = F.size(F.array_union(q, d)).cast("double")
    return F.round(F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 6)
