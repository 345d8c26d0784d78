"""stream_neardup_static: per-row MinHash signatures (expr/arrow lockstep),
static-index flagging on batch and real micro-batch streams."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from towhee_spark.functions import dedup
from towhee_spark.kernels import (
    MINHASH_H30,
    MINHASH_P,
    minhash_affine_params,
    minhash_sig_np,
)
from towhee_spark.streaming.ops import stream_neardup_static


def _py_sig(text: str, num_hashes: int, n: int) -> list[int]:
    import re

    norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", (text or "").lower()).strip()
    toks = norm.split(" ")
    sh = [norm] if len(toks) < n else [
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    ]
    params = minhash_affine_params(num_hashes)
    out = []
    for a, b in params:
        best = None
        for s in sh:
            h30 = int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_H30
            v = (a * h30 + b) % MINHASH_P
            best = v if best is None else min(best, v)
        out.append(best)
    return out


TEXTS = [
    "the quick brown fox jumps over the lazy dog tonight",
    "the quick brown fox jumps over the lazy cat tonight",
    "completely different content with no overlap at all here",
    "short doc",
    "",
    "  Mixed   CASE\tand \n whitespace  here now ok then  ",
]


def test_row_signature_expr_arrow_python_lockstep(spark):
    df = spark.createDataFrame(list(enumerate(TEXTS)), "doc_id: long, text: string")
    for impl in ("expr", "arrow"):
        got = {
            r["doc_id"]: list(r["sig"])
            for r in df.select(
                "doc_id",
                dedup.minhash_row_signature(
                    "text", num_hashes=8, n=3, impl=impl).alias("sig"),
            ).collect()
        }
        for i, t in enumerate(TEXTS):
            assert got[i] == _py_sig(t, 8, 3), (impl, i)


def test_row_signature_validation():
    with pytest.raises(ValueError, match="md5"):
        dedup.minhash_row_signature("text", hash="crc32", impl="expr")
    with pytest.raises(ValueError, match="impl"):
        dedup.minhash_row_signature("text", impl="nope")


def test_crc32_kernel_shape_and_determinism():
    a = minhash_sig_np(TEXTS, num_hashes=16, n=3, hash="crc32")
    b = minhash_sig_np(TEXTS, num_hashes=16, n=3, hash="crc32")
    assert a.shape == (len(TEXTS), 16) and (a == b).all()
    assert (a >= 0).all() and (a < MINHASH_P).all()


def test_batch_face_flags_near_dups_only(spark):
    ref = spark.createDataFrame(
        [(100, TEXTS[0]), (101, TEXTS[2])], "doc_id: long, text: string"
    )
    stream_side = spark.createDataFrame(
        [(1, TEXTS[1]), (2, "totally unrelated words that match nothing of it"),
         (3, TEXTS[0])],
        "doc_id: long, text: string",
    )
    out = stream_neardup_static(
        stream_side, ref=ref, num_hashes=32, bands=16, threshold=0.5,
        impl="expr",
    )
    got = {(r["doc_id"], r["ref_id"]) for r in out.collect()}
    assert (3, 100) in got          # exact duplicate always flagged
    assert all(d != 2 for d, _ in got)  # unrelated doc never flagged
    ex = {r["doc_id"]: r["est_jaccard"] for r in out.collect()}
    assert ex[3] == 1.0


def test_batch_face_arrow_equals_expr(spark):
    docs = [(i, f"tok{i % 4} alpha beta gamma delta tok{i % 3} epsilon zeta") for i in range(40)]
    ref = spark.createDataFrame(docs[:20], "doc_id: long, text: string")
    sdf = spark.createDataFrame(
        [(i + 1000, t) for i, t in docs[15:]], "doc_id: long, text: string"
    )
    a = stream_neardup_static(sdf, ref=ref, threshold=0.4, impl="expr")
    b = stream_neardup_static(sdf, ref=ref, threshold=0.4, impl="arrow")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_validation_errors(spark):
    df = spark.createDataFrame([(1, "x", 7)], "doc_id: long, text: string, ref_id: long")
    ok = spark.createDataFrame([(1, "x")], "doc_id: long, text: string")
    with pytest.raises(ValueError, match="exactly one"):
        stream_neardup_static(ok)
    with pytest.raises(ValueError, match="divide"):
        stream_neardup_static(ok, ref=ok, num_hashes=32, bands=7)
    with pytest.raises(ValueError, match="collide"):
        stream_neardup_static(df, ref=ok)


def test_streaming_matches_batch_face(spark, tmp_path):
    import time as _time

    ref = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(TEXTS[:3])], "doc_id: long, text: string"
    )
    rows = [
        (10 * b + i, TEXTS[(b + i) % len(TEXTS)], f"2026-01-01 00:{b:02d}:{i:02d}")
        for b in range(3) for i in range(4)
    ]
    bdf = spark.createDataFrame(rows, "doc_id long, text string, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    want = sorted(
        (r["doc_id"], r["ref_id"], r["est_jaccard"])
        for r in stream_neardup_static(
            bdf, ref=ref, threshold=0.5, impl="arrow").collect()
    )
    assert want  # the corpus plants real matches

    src = str(tmp_path / "neardup_src")
    for b in range(3):
        bdf.filter((F.col("doc_id") >= 10 * b) & (F.col("doc_id") < 10 * (b + 1))) \
            .coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)
    sdf = (
        spark.readStream.schema(bdf.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = stream_neardup_static(
        sdf, ref=ref, threshold=0.5, impl="arrow", ts="ts", watermark="1 hour"
    )
    q = (
        out.writeStream.format("memory").queryName("neardup_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["doc_id"], r["ref_id"], r["est_jaccard"])
        for r in spark.sql("select * from neardup_stream").collect()
    )
    spark.catalog.dropTempView("neardup_stream")
    assert got == want


def test_streaming_requires_ts(spark, tmp_path):
    ref = spark.createDataFrame([(1, "a b c d")], "doc_id: long, text: string")
    src = str(tmp_path / "needs_ts")
    bdf = spark.createDataFrame(
        [(2, "a b c d", "2026-01-01 00:00:00")], "doc_id long, text string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    bdf.write.parquet(src)
    sdf = spark.readStream.schema(bdf.schema).parquet(src)
    with pytest.raises(ValueError, match="needs ts="):
        stream_neardup_static(sdf, ref=ref)
