"""Sequence packing: concat-and-chunk layout invariants + model equality.

The model is a 20-line pure-pandas reimplementation of the spec (sort by
(hash60, id), exclusive cumsum, slice every seq_len tokens) — independent
of the two-level distributed prefix sum under test.
"""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from towhee_spark.functions.packing import pack_sequences, pack_stats


def _h60(v, salt="pack"):
    return int(hashlib.md5((salt + str(v)).encode()).hexdigest()[:15], 16)


def _model(rows, seq_len, salt="pack"):
    """rows: [(doc_id, tok_cnt)] → [(doc_id, pack_id, begin, end, off)]."""
    ordered = sorted(
        [(i, c) for i, c in rows if c and c > 0],
        key=lambda t: (_h60(t[0], salt), t[0]),
    )
    out, start = [], 0
    for i, c in ordered:
        lo, hi = start // seq_len, (start + c - 1) // seq_len
        for p in range(lo, hi + 1):
            out.append((
                i, p,
                max(p * seq_len - start, 0),
                min((p + 1) * seq_len - start, c),
                max(start - p * seq_len, 0),
            ))
        start += c
    return out


def _docs(spark, counts):
    rows = [(i, " ".join(f"t{j}" for j in range(c)) if c is not None else None)
            for i, c in counts]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


COUNTS = [(0, 7), (1, 300), (2, 0), (3, None), (4, 1), (5, 256), (6, 90),
          (7, 513), (8, 12), (9, 255)]


def test_matches_model(spark):
    df = _docs(spark, COUNTS)
    got = sorted(
        tuple(r) for r in
        pack_sequences(df, seq_len=256).collect()
    )
    want = sorted(_model([(i, c or 0) for i, c in COUNTS], 256))
    assert got == want


def test_docs_tile_exactly_and_packs_full(spark):
    df = _docs(spark, COUNTS)
    out = pack_sequences(df, seq_len=128).cache()
    per_doc = (
        out.groupBy("doc_id")
        .agg(F.min("tok_begin").alias("b"),
             F.max("tok_end").alias("e"),
             F.sum(F.col("tok_end") - F.col("tok_begin")).alias("tot"))
        .collect()
    )
    counts = {i: c or 0 for i, c in COUNTS}
    for r in per_doc:
        assert r["b"] == 0
        assert r["e"] == counts[r["doc_id"]] == r["tot"]
    st = pack_stats(out, 128).orderBy("pack_id").collect()
    total = sum(c or 0 for _, c in COUNTS)
    assert [r["pack_id"] for r in st] == list(range(len(st)))
    for r in st[:-1]:
        assert r["fill"] == 128 and r["utilization"] == 1.0
    assert st[-1]["fill"] == total - 128 * (len(st) - 1)
    out.unpersist()


def test_count_col_mode_and_bucketing_invisible(spark):
    df = _docs(spark, COUNTS).withColumn(
        "n", F.when(F.col("text").isNull(), None).otherwise(
            F.size(F.split(F.trim("text"), r"\s+"))))
    df = df.withColumn("n", F.when(F.trim("text") == "", 0).otherwise(F.col("n")))
    a = sorted(tuple(r) for r in pack_sequences(df, 64).select(
        "doc_id", "pack_id", "tok_begin", "tok_end", "pack_off").collect())
    b = sorted(tuple(r) for r in pack_sequences(
        df, 64, count_col="n").select(
        "doc_id", "pack_id", "tok_begin", "tok_end", "pack_off").collect())
    c = sorted(tuple(r) for r in pack_sequences(df, 64, bucket_bits=2).select(
        "doc_id", "pack_id", "tok_begin", "tok_end", "pack_off").collect())
    assert a == b == c


def test_guards(spark):
    df = _docs(spark, COUNTS[:2])
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, 0)
    with pytest.raises(ValueError, match="bucket_bits"):
        pack_sequences(df, 16, bucket_bits=0)
    with pytest.raises(ValueError, match="collide"):
        pack_sequences(df.withColumn("pack_id", F.lit(1)), 16)


def test_large_stream_spans_many_buckets(spark):
    # 2k docs, small seq_len: every bucket populated, boundary docs split
    n = 2000
    pdf = pd.DataFrame({"doc_id": range(n), "cnt": [(i * 37) % 90 + 1 for i in range(n)]})
    df = spark.createDataFrame(pdf)
    out = pack_sequences(df, 512, count_col="cnt", text_col=None)
    st = pack_stats(out, 512).collect()
    total = int(pdf["cnt"].sum())
    assert sum(r["fill"] for r in st) == total
    full = [r for r in st if r["fill"] == 512]
    assert len(full) == total // 512


def test_single_corpus_scan_via_reused_exchange(spark):
    """The bucket-totals branch must NOT re-scan + re-tokenize the corpus:
    deriving totals from the windowed frame makes both branches share one
    hashpartitioning(__bkt) exchange, which Spark dedups (ReusedExchange)
    at execution. A second live FileScan at 100 TB doubles the whole job's
    input."""
    df = _docs(spark, COUNTS)
    out = pack_sequences(df, seq_len=64)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan, plan


def test_materialize_packs_reconstructs_stream(spark):
    """Concatenating packs in pack order must equal concatenating each
    doc's ids in the deterministic (hash60, id) stream order; every pack
    except the tail is exactly full; within-doc id order is preserved."""
    from towhee_spark.functions.packing import materialize_packs

    counts = [(i, c) for i, c in COUNTS if c]  # zero/None drop on both sides
    enc = spark.createDataFrame(
        [(i, [i * 1000 + j for j in range(c or 0)]) for i, c in COUNTS],
        "doc_id long, ids array<int>")
    seq_len = 64
    packs = {r.pack_id: (r.n_fill, list(r.ids))
             for r in materialize_packs(enc, seq_len).collect()}
    ordered = sorted(counts, key=lambda t: (_h60(t[0]), t[0]))
    stream = [i * 1000 + j for i, c in ordered for j in range(c)]
    n_packs = (len(stream) + seq_len - 1) // seq_len
    assert set(packs) == set(range(n_packs))
    got = [x for p in range(n_packs) for x in packs[p][1]]
    assert got == stream
    for p in range(n_packs - 1):
        assert packs[p][0] == seq_len and len(packs[p][1]) == seq_len
    assert packs[n_packs - 1][0] == len(stream) - (n_packs - 1) * seq_len


def test_materialize_packs_doc_spans(spark):
    """with_spans=True: the spans tile each pack exactly (contiguous,
    summing to n_fill), equal the pack_sequences layout re-keyed, and
    each span's slice of ids is the corresponding doc slice."""
    from towhee_spark.functions.packing import materialize_packs

    enc = spark.createDataFrame(
        [(i, [i * 1000 + j for j in range(c or 0)]) for i, c in COUNTS],
        "doc_id long, ids array<int>")
    seq_len = 64
    rows = sorted(materialize_packs(enc, seq_len, with_spans=True).collect(),
                  key=lambda r: r.pack_id)
    assert set(rows[0].asDict()) == {"pack_id", "n_fill", "ids", "doc_spans"}
    layout = {(r.doc_id, r.pack_id, r.pack_off): r.tok_end - r.tok_begin
              for r in pack_sequences(
                  enc.withColumn("__n", F.size("ids")), seq_len,
                  count_col="__n").collect()}
    seen = {}
    for r in rows:
        off = 0
        for s in r.doc_spans:
            assert s.off == off, (r.pack_id, s)
            assert r.ids[s.off:s.off + s.len] == [
                s.doc_id * 1000 + j
                for j in range(*_span_doc_range(seen, s.doc_id, s.len))]
            seen[s.doc_id] = seen.get(s.doc_id, 0) + s.len
            off += s.len
        assert off == r.n_fill
        for s in r.doc_spans:
            assert layout[(s.doc_id, r.pack_id, s.off)] == s.len
    assert seen == {i: c for i, c in COUNTS if c}


def _span_doc_range(seen, doc_id, ln):
    start = seen.get(doc_id, 0)
    return start, start + ln


def test_materialize_packs_agrees_with_layout(spark):
    """The materialized fill of every pack equals pack_stats' fill over
    the layout — the two views derive from one pack_sequences call."""
    from towhee_spark.functions.packing import materialize_packs

    enc = spark.createDataFrame(
        [(i, list(range(c or 0))) for i, c in COUNTS],
        "doc_id long, ids array<int>")
    enc2 = enc.withColumn("__n", F.size("ids"))
    st = {r.pack_id: r.fill for r in pack_stats(
        pack_sequences(enc2, 100, count_col="__n"), 100).collect()}
    mt = {r.pack_id: r.n_fill for r in
          materialize_packs(enc, 100).collect()}
    assert mt == st
