"""Similarity search over embedding columns (array<float>).

Replaces Towhee's ann_search.* hub ops (towhee/runtime/hub_ops/
ann_search.py:25-98 — query ndarray → List[(id, score)]) with DataFrame
plans:

* brute_force_topk — exact: broadcast the (small) query set against the
  index, native cosine (zip_with/aggregate — JVM codegen), per-query
  window top-k. Baseline and oracle.
* lsh_topk         — scale path: random-hyperplane LSH buckets on both
  sides with multi-probe (flip-1-bit neighbors), exact rerank within
  buckets. Shuffle O(n·probes), never O(n·m).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from towhee_spark.kernels import cosine_expr


def brute_force_topk(
    queries: DataFrame,
    index: DataFrame,
    k: int = 10,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    i_id: str = "vec_id",
    i_vec: str = "embedding",
    broadcast_queries: bool = True,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (query_id, match_id, score, rank).

    The smaller side must be broadcast — default assumes the query set is
    small (the common batch-lookup shape); the scan side streams through
    without a shuffle, so this scales with the index size linearly.
    ``exclude_self`` drops match_id == query_id rows — correct for
    self-search (queries ⊆ index); pass False when queries and index are
    DIFFERENT tables whose id spaces merely overlap."""
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("__qv"))
    ix = index.select(F.col(i_id).alias("match_id"), F.col(i_vec).alias("__iv"))
    joined = ix.join(F.broadcast(q)) if broadcast_queries else q.join(F.broadcast(ix))
    scored = joined.select(
        "query_id",
        "match_id",
        F.round(cosine_expr(F.col("__qv"), F.col("__iv")), 6).alias("score"),
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("match_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )


def _bucket_expr(vec_col, planes: np.ndarray):
    return sum(
        [
            F.when(
                F.aggregate(
                    F.zip_with(
                        vec_col,
                        F.array(*[F.lit(float(x)) for x in planes[p]]),
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                > 0,
                F.lit(1 << p),
            ).otherwise(F.lit(0))
            for p in range(len(planes))
        ],
        F.lit(0),
    )


def lsh_topk(
    queries: DataFrame,
    index: DataFrame,
    k: int = 10,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    i_id: str = "vec_id",
    i_vec: str = "embedding",
    planes: int = 10,
    probes: int = 4,
    dim: int | None = None,
    seed: int = 7,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket join + exact rerank.

    Queries probe their own bucket plus the ``probes-1`` nearest neighbor
    buckets (1-bit flips) — recall/scan-cost dial. Index side is bucketed
    once (re-usable as a materialized layout at 100 TB scale)."""
    if dim is None:
        dim = len(index.select(i_vec).first()[0])
    rng = np.random.default_rng(seed)
    pl = rng.normal(size=(planes, dim))

    ix = index.select(
        F.col(i_id).alias("match_id"), F.col(i_vec).alias("__iv"),
        _bucket_expr(F.col(i_vec), pl).alias("bucket"),
    )
    q0 = queries.select(
        F.col(q_id).alias("query_id"), F.col(q_vec).alias("__qv"),
        _bucket_expr(F.col(q_vec), pl).alias("__b0"),
    )
    probe_offsets = [0] + [1 << p for p in range(min(probes - 1, planes))]
    q = q0.select(
        "query_id", "__qv",
        F.explode(F.array(*[
            F.col("__b0").bitwiseXOR(F.lit(off)) for off in probe_offsets
        ])).alias("bucket"),
    )
    scored = (
        ix.join(q, "bucket")
        .select(
            "query_id", "match_id",
            F.round(cosine_expr(F.col("__qv"), F.col("__iv")), 6).alias("score"),
        )
        .dropDuplicates(["query_id", "match_id"])
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("match_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )
