"""Named pipeline registry — parity with Towhee's AutoPipes
(towhee/runtime/auto_pipes.py:43-86: `AutoPipes.pipeline(name)` returns a
ready pipeline built by a registered builder module; builtin example
towhee/pipelines/sentence_embedding.py:61-83).

Builders here are plain functions DataFrame → DataFrame, resolved locally
(no hub download), configured via keyword args (the AutoConfig analogue)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PIPELINES: dict[str, Callable[..., Callable[[DataFrame], DataFrame]]] = {}


def register_pipeline(name: str):
    def deco(builder):
        _PIPELINES[name] = builder
        return builder

    return deco


def pipeline(name: str, **config) -> Callable[[DataFrame], DataFrame]:
    """AutoPipes.pipeline(name, **config) → a DataFrame transform."""
    if name not in _PIPELINES:
        raise KeyError(f"pipeline {name!r} not registered; have {sorted(_PIPELINES)}")
    return _PIPELINES[name](**config)


@register_pipeline("sentence_embedding")
def _sentence_embedding(text_col: str = "text", out_col: str = "embedding", dim: int = 64):
    """Mirror of the builtin sentence_embedding AutoPipe: text → vector,
    model swapped for the deterministic hashed-BoW Arrow kernel."""
    from towhee_spark.kernels import embed_text_udf  # noqa: PLC0415

    def apply(df: DataFrame) -> DataFrame:
        return df.withColumn(out_col, embed_text_udf(dim=dim)(F.col(text_col)))

    return apply


@register_pipeline("text_dedup")
def _text_dedup(id_col: str = "doc_id", text_col: str = "text", threshold: float = 0.8):
    """Corpus near-dedup: exact pass then MinHash-LSH pair detection."""
    from towhee_spark.functions import dedup  # noqa: PLC0415

    def apply(df: DataFrame) -> DataFrame:
        return dedup.minhash_lsh_pairs(df, id_col=id_col, text_col=text_col, threshold=threshold)

    return apply


@register_pipeline("transcript_features")
def _transcript_features(gap: float = 1800.0, tolerance: float | None = 3600.0,
                         embed_dim: int = 32, context: DataFrame | None = None):
    """The north-star feature pipeline: as-of context join + lag/lead +
    LOCF + sessionize + per-turn embedding over a transcript table."""
    from towhee_spark import asof_join, lag_lead, locf, sessionize  # noqa: PLC0415
    from towhee_spark.kernels import embed_text_udf  # noqa: PLC0415

    def apply(df: DataFrame) -> DataFrame:
        j = df
        if context is not None:
            j = asof_join(j, context, direction="backward", tolerance=tolerance)
        j = j.withColumn("text_len", F.length("text"))
        j = lag_lead(j, ["text_len"], [1, 2, -1])
        j = locf(j, ["tool"])
        j = sessionize(j, gap=gap, seq_out="session_seq")
        return j.withColumn("embedding", embed_text_udf(dim=embed_dim)(F.col("text")))

    return apply


@register_pipeline("rag_ingest")
def _rag_ingest(id_col: str = "doc_id", text_col: str = "text",
                chunk_size: int = 64, overlap: int = 16, dim: int = 64):
    """RAG ingestion shape (ref data_source docstring pipeline: loader →
    text_splitter → sentence_embedding → np_normalize → ann_insert):
    fixed-window chunking + hashed-BoW Arrow embedding; feed the result to
    sources.io.write_vectors for the ann_insert leg."""
    from towhee_spark.functions.text import chunk_text  # noqa: PLC0415
    from towhee_spark.kernels import embed_text_udf  # noqa: PLC0415

    def apply(df: DataFrame) -> DataFrame:
        ch = chunk_text(text_col, size=chunk_size, overlap=overlap)
        rows = df.select(F.col(id_col), F.explode(ch).alias("c")).select(
            id_col, F.col("c.start").alias("chunk_start"), F.col("c.chunk").alias("chunk")
        )
        return rows.withColumn("embedding", embed_text_udf(dim=dim)(F.col("chunk")))

    return apply
