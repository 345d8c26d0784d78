"""Lexical retrieval scoring (BM25) as pure Catalyst plans.

Complements the embedding retrievers in ``functions.similarity`` (the ref
delegates retrieval entirely to vector stores, ann_search.py:25-98; a
training-data pipeline also needs the lexical side for hybrid/RAG recall
and dedup triage). Everything here is native Column math — tokenize,
posting lists, document frequencies, Okapi BM25 — with zero Python
stages, so the plan scales like any other shuffle+join pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _toks(c):
    """Whitespace tokens via the codebase's CANONICAL normalization
    (text.normalize_text: lower, collapse whitespace, trim — the same
    tokenizer dedup and rerank use, with the same gate-proven SQL mirror),
    then a plain single-space split. Keeping the regex inside the shared
    normalize mirror avoids a THIRD tokenizer variant and the Java-vs-RE2
    ``\\s`` divergence a fresh split-regex oracle would add."""
    from towhee_spark.functions.text import normalize_text  # noqa: PLC0415

    return F.filter(F.split(normalize_text(c), " "), lambda t: t != "")


def bm25_topk(
    queries: DataFrame,
    docs: DataFrame,
    k: int = 10,
    q_id: str = "query_id",
    q_text: str = "question",
    d_id: str = "doc_id",
    d_text: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Okapi BM25 top-k: (query_id, match_id, score, rank).

    score(q,d) = Σ_{t ∈ distinct(q)} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)   (Lucene's non-negative form).

    Plan shape (100 TB story): postings = one hash aggregate over the
    exploded corpus (map-side combine); df = second aggregate over
    postings, joined back on token SHUFFLED (the vocabulary of a 100 TB
    corpus is not broadcastable); corpus stats (N, avgdl) ride a
    broadcast 1-row crossJoin so plan construction stays action-free;
    the (small) query-term set is broadcast against the posting list
    (``broadcast_queries=False`` for query sets of corpus scale) — cost
    ∝ matched postings, never |q|×|docs|. Ranking uses the
    (score DESC, match_id ASC) total order shared with the similarity
    retrievers."""
    from towhee_spark.functions.dedup import _with_cached_deps  # noqa: PLC0415

    toks_d = _toks(F.col(d_text))
    # base feeds TWO aggregates (postings and the corpus stats); cache it
    # so the corpus is scanned + tokenized once, not twice — the same
    # shared-frame discipline the dedup builders follow; callers that
    # force many plans call dedup.release_cached() afterwards
    base = docs.select(
        F.col(d_id).alias("match_id"),
        toks_d.alias("__toks"),
    ).select("match_id", "__toks", F.size("__toks").alias("dl")).cache()
    postings = (
        base.select("match_id", "dl", F.explode("__toks").alias("tok"))
        .groupBy("match_id", "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = postings.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    qterms = queries.select(
        F.col(q_id).alias("query_id"),
        F.explode(F.array_distinct(_toks(F.col(q_text)))).alias("tok"),
    )
    qside = F.broadcast(qterms) if broadcast_queries else qterms
    scored = (
        postings.join(qside, "tok")
        .join(dfreq, "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "match_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                    + F.lit(1.0)
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("__term_score"),
        )
        .groupBy("query_id", "match_id")
        .agg(F.round(F.sum("__term_score"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("match_id").asc())
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )
    return _with_cached_deps(out, base)


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion over N rankers (Cormack et al.):
    score(q,d) = Σ_r 1/(c + rank_r(q,d)), summed over the rankers that
    returned the pair. Each input frame needs (query_id, match_id, rank).
    The standard hybrid-retrieval combiner (lexical ⊕ vector) — rank-based,
    so no score calibration between rankers is needed. Float-exact across
    engines: each term is one double division and the per-pair sum has ≤N
    commutative addends. Output: (query_id, match_id, score, rank) by the
    shared (score DESC, match_id ASC) total order.

    Cached intermediates tagged on the input rankings (e.g. bm25_topk's
    corpus-token frame) are re-tagged on the fused output, so one
    release_cached() on the result frees every ranker's cache."""
    from functools import reduce  # noqa: PLC0415

    from towhee_spark.functions.dedup import _with_cached_deps  # noqa: PLC0415

    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    tagged = [
        r.select(
            "query_id", "match_id",
            (F.lit(1.0) / (F.lit(float(c)) + F.col("rank"))).alias("__rrf"),
        )
        for r in rankings
    ]
    un = reduce(DataFrame.unionByName, tagged)
    scored = un.groupBy("query_id", "match_id").agg(
        F.round(F.sum("__rrf"), 6).alias("score"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("match_id").asc())
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "score", "rank")
    )
    deps = [d for r in rankings for d in getattr(r, "_cached_deps", [])]
    return _with_cached_deps(out, *deps)


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    d_id: str = "doc_id",
    d_text: str = "text",
    scale_bits: int = 20,
) -> DataFrame:
    """Per-document keyword extraction: (doc_id, term, tf, score_q20,
    rank) — the top-``k`` terms by tf·idf with the smooth non-negative
    idf = ln((N+1)/(df+1)) + 1 (the sklearn form).

    Exact-integer ranking (the round-4 freeze discipline): idf is
    computed ONCE per term — a vocabulary-sized frame — and frozen to
    ROUND(idf·2^scale_bits) BIGINT, so every per-(doc,term) score
    tf·idf_q20 is exact int64 and the (score DESC, term ASC) rank has no
    float surface at all; the only boundary risk is the per-term freeze
    (measured like DSIR's — the one ln is written as a SINGLE log of the
    ratio in both engines, never ln(a)−ln(b), so the operand shapes
    match).

    Plan (100 TB story): postings = one map-side-combined hash aggregate
    over the exploded corpus; df = a second aggregate over postings,
    joined back on term SHUFFLED (a web-scale vocabulary is not
    broadcastable); N rides a broadcast 1-row crossJoin (action-free,
    the bm25 stats shape); the top-k window partitions by DOC — bounded
    by document length, so no mega-key risk. Tokenizer is the shared
    normalize mirror (``_toks``)."""
    from towhee_spark.functions.dedup import _with_cached_deps  # noqa: PLC0415

    if k < 1:
        raise ValueError("tfidf_top_terms: k must be >= 1")
    base = docs.select(
        F.col(d_id).alias("id"), _toks(F.col(d_text)).alias("__toks")
    ).cache()
    post = (
        base.select("id", F.explode("__toks").alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .cache()
    )
    n = base.agg(F.count(F.lit(1)).alias("__n"))
    scale = float(1 << scale_bits)
    idf_q = F.round(
        (F.log((F.col("__n") + 1).cast("double") / (F.col("__df") + 1).cast("double"))
         + F.lit(1.0)) * F.lit(scale),
        0,
    ).cast("long")
    # the freeze runs in the VOCAB-sized dfreq frame (one ln per term),
    # not in the posting-sized post-join projection (review finding: the
    # expression placed after the join ran once per (doc, term) posting)
    dfreq = (
        post.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
        .crossJoin(F.broadcast(n))
        .select("term", idf_q.alias("__idf"))
    )
    w = Window.partitionBy("id").orderBy(F.col("score_q20").desc(), "term")
    out = (
        post.join(dfreq, "term")
        .select("id", "term", "tf", (F.col("tf") * F.col("__idf")).alias("score_q20"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("id").alias(d_id), "term", "tf", "score_q20", "rank")
    )
    return _with_cached_deps(out, base, post)
