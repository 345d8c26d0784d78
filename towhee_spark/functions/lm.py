"""Corpus-trained unigram language-model scoring.

The quality-filter family (text.quality_score, text.gopher_rules) is
rule-based; this module adds the statistical tier every production curation
stack runs next to it (CCNet/RedPajama-style: score documents by a language
model and drop the worst tail). A full KenLM is out of sandbox scope — the
unigram LM with add-one smoothing is the exact same pipeline shape (train a
model over the corpus, broadcast/join it back, score per doc) with
arithmetic simple enough to mirror term-for-term in a DuckDB oracle.

Reference semantics anchor: the LLM-scoring hub op family the reference
dispatches to external models (hub_ops/llm.py:16-60) — here the "model" is
trained inside the engine in one aggregation pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from towhee_spark.functions.text import normalize_text


def doc_token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, token, c): per-document token bag counts over the canonical
    normalize_text tokens (empty tokens dropped, so blank docs contribute
    nothing). One hash aggregation with map-side combine — the shared base
    for both model training and document scoring."""
    return (
        df.select(
            F.col(id_col).cast("long").alias("id"),
            F.explode(F.split(normalize_text(text_col), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def unigram_counts(doc_tok: DataFrame) -> DataFrame:
    """(token, cf): corpus frequencies from the per-doc counts — re-aggregating
    the already-reduced (id, token) frame instead of the raw token stream, so
    the corpus-wide shuffle moves one row per (doc, distinct token)."""
    return doc_tok.groupBy("token").agg(F.sum("c").alias("cf"))


def unigram_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = False,
) -> DataFrame:
    """Per-document perplexity under the corpus's own add-one-smoothed
    unigram LM: p(t) = (cf_t + 1) / (T + V), avg_nll = −(1/n)·Σ ln p over
    the doc's token bag, ppl = exp(avg_nll); both rounded to 6.

    Returns (id_col, n_tokens, avg_nll, ppl); blank documents keep
    n_tokens = 0 with NULL scores. The self-trained model means no OOV
    branch; to score against a reference corpus, join a foreign
    unigram_counts frame instead (same shape).

    Cross-engine float parity: every ln sees bit-identical operands in both
    engines (integer counts → one double division), terms are all-negative
    (no cancellation) so the summation-order error is ~1e-12 against a
    round-to-6; ppl exponentiates the ALREADY-ROUNDED avg_nll so both
    engines feed exp the same double.

    Scale: train = one extra aggregation over the reduced (doc, token)
    frame; score = one join on token. The vocab frame follows Heaps' law
    (~corpus^0.5 rows) — broadcast it with ``broadcast_vocab=True`` when it
    fits (≤ a few GB), else the default shuffle join lets AQE handle the
    Zipf skew on stop-token keys (each (doc, token) row is already unique,
    so the hot token fan-in is bounded by corpus doc count, not token
    count)."""
    # cache: doc_tok feeds BOTH model training and document scoring; the
    # tokenize+explode+agg would otherwise run twice (release with
    # dedup.release_cached on the returned frame)
    doc_tok = doc_token_counts(df, id_col, text_col).cache()
    freq = unigram_counts(doc_tok)
    totals = freq.agg(
        F.sum("cf").alias("__T"), F.count(F.lit(1)).alias("__V")
    )
    if broadcast_vocab:
        freq = F.broadcast(freq)
    nll = F.log((F.col("cf") + F.lit(1.0)) / (F.col("__T") + F.col("__V")))
    scored = (
        doc_tok.join(freq, "token")
        .crossJoin(F.broadcast(totals))
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.round(-F.sum(F.col("c") * nll) / F.sum("c"), 6).alias("avg_nll"),
        )
    )
    from towhee_spark.functions.dedup import _with_cached_deps  # noqa: PLC0415

    out = (
        df.select(F.col(id_col).cast("long").alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "avg_nll",
            F.round(F.exp("avg_nll"), 6).alias("ppl"),
        )
    )
    return _with_cached_deps(out, doc_tok)
