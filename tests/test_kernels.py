"""Arrow kernel parity vs the single-node numpy oracle (np.allclose per
BASELINE.json) + native-expression kernels."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from towhee_spark.kernels import (
    cosine_expr,
    dot_expr,
    embed_text_udf,
    embed_tokens_np,
    hashed_bow_expr,
    np_normalize,
    worker_singleton,
)
from towhee_spark.schema import TRANSCRIPT_SCHEMA
from towhee_spark.synth import transcripts_pdf


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = transcripts_pdf(20, seed=11)
    return pdf, spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)


def test_embed_udf_allclose_oracle(corpus):
    pdf, df = corpus
    got = (
        df.select("conv_id", "turn_idx", embed_text_udf(dim=16)(F.col("text")).alias("emb"))
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    srt = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    exp = embed_tokens_np(srt.text.fillna("").tolist(), dim=16)
    got_mat = np.stack([np.asarray(v, dtype="float32") for v in got.emb])
    assert np.allclose(got_mat, exp, atol=1e-6)


def test_embed_unit_norm_or_zero(corpus):
    _, df = corpus
    rows = df.select(embed_text_udf(dim=16)(F.col("text")).alias("emb")).collect()
    for r in rows:
        n = np.linalg.norm(r.emb)
        assert abs(n - 1.0) < 1e-5 or n == 0.0


def test_native_bow_properties(spark):
    """Native xxhash64 BoW: deterministic, unit-norm, word-order-insensitive,
    token-sensitive."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta delta"), (4, "")],
        "id long, text string",
    )
    out = {r.id: np.array(r.emb) for r in
           df.select("id", hashed_bow_expr("text", dim=16).alias("emb")).collect()}
    assert np.allclose(out[1], out[2])          # bag semantics
    assert not np.allclose(out[1], out[3])      # content-sensitive
    assert np.allclose(np.linalg.norm(out[1]), 1.0, atol=1e-6)
    assert np.allclose(out[4], np.zeros(16))    # empty text → zero vector
    again = {r.id: np.array(r.emb) for r in
             df.select("id", hashed_bow_expr("text", dim=16).alias("emb")).collect()}
    assert np.allclose(out[1], again[1])


def test_cosine_dot_exprs(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [2.0, 4.0]), ([0.0, 0.0], [1.0, 1.0])],
        "a array<double>, b array<double>",
    )
    rows = df.select(
        cosine_expr(F.col("a"), F.col("b")).alias("cos"),
        dot_expr(F.col("a"), F.col("b")).alias("dot"),
    ).collect()
    assert abs(rows[0].cos - 0.0) < 1e-9 and rows[0].dot == 0.0
    assert abs(rows[1].cos - 1.0) < 1e-9 and rows[1].dot == 10.0
    assert rows[2].cos == 0.0  # zero-vector guard


def test_np_normalize(spark):
    df = spark.createDataFrame([([3.0, 4.0],), ([0.0, 0.0],)], "v array<float>")
    rows = df.select(np_normalize(F.col("v")).alias("n")).collect()
    assert np.allclose(rows[0].n, [0.6, 0.8])
    assert np.allclose(rows[1].n, [0.0, 0.0])


def test_np_normalize_ragged_batch(spark):
    """Mixed widths + null + empty in ONE Arrow batch exercises the
    segmented reduceat fallback: each vector normalizes independently,
    nulls and empties pass through unchanged."""
    df = spark.createDataFrame(
        [([3.0, 4.0],), ([1.0, 2.0, 2.0],), (None,), ([],), ([0.0, 0.0],),
         ([5.0],)],
        "v array<float>",
    ).coalesce(1)
    rows = df.select(np_normalize(F.col("v")).alias("n")).collect()
    assert np.allclose(rows[0].n, [0.6, 0.8])
    assert np.allclose(rows[1].n, [1 / 3, 2 / 3, 2 / 3])
    assert rows[2].n is None
    assert list(rows[3].n) == []
    assert np.allclose(rows[4].n, [0.0, 0.0])  # zero norm: unchanged
    assert np.allclose(rows[5].n, [1.0])


def test_worker_singleton_caches():
    calls = []
    f1 = worker_singleton("k1", lambda: calls.append(1) or "obj")
    f2 = worker_singleton("k1", lambda: calls.append(1) or "obj2")
    assert f1 == f2 == "obj" and len(calls) == 1


def test_embed_arrow_fast_path_matches_loop():
    """The Arrow dictionary-encoded tokenize path must equal the per-token
    loop bit-for-bit, including empty/whitespace/None/NaN rows."""
    import numpy as np

    from towhee_spark.kernels import _embed_tokens_np_loop, embed_tokens_np

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(80)] + ["héllo", "日本語", "a-b.c"]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 20))) for _ in range(500)]
    texts += ["", "  ", " x ", "x  y", None, float("nan")]
    fast = embed_tokens_np(texts, 32)
    loop = _embed_tokens_np_loop(texts, 32)
    assert fast.shape == loop.shape
    assert np.array_equal(fast, loop)
