"""Hashed-feature linear classifier: feature set, exactness, model swap."""

import pytest
from pyspark.sql import functions as F

from towhee_spark.functions.classifier import (
    feature_array,
    hash_weights,
    linear_classifier_score,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "The quick  brown fox"), (2, "one"), (3, ""), (4, None),
         (5, "a b a b")],
        "doc_id long, text string")


def test_feature_array_unigrams_and_bigrams(spark, docs):
    rows = {r.doc_id: r.f for r in docs.select(
        "doc_id", feature_array(F.col("text")).alias("f")).collect()}
    assert rows[1] == ["the", "quick", "brown", "fox",
                       "the_quick", "quick_brown", "brown_fox"]
    assert rows[2] == ["one"]          # no bigrams from a single token
    assert rows[3] == []
    assert rows[4] == []               # NULL text → no features (coalesced)
    assert rows[5] == ["a", "b", "a", "b", "a_b", "b_a", "a_b"]


def test_empty_and_null_docs_score_bias(docs):
    got = {r.doc_id: r for r in linear_classifier_score(
        docs, dim=64, bias=0.25).collect()}
    for did in (3, 4):
        assert got[did].n_feats == 0
        assert got[did].logit == 0.25
        assert got[did].keep  # 0.25 >= 0.0
    assert got[1].n_feats == 7


def test_trained_weight_table_swap(spark, docs):
    """A custom (trained) weight table drives the same plan: weights that
    put every bucket at +1 give logit == bias + 1 exactly."""
    w = spark.range(64).select(
        F.col("id").cast("int").alias("bucket"), F.lit(1.0).alias("w"))
    got = {r.doc_id: r.logit for r in linear_classifier_score(
        docs, weights=w, dim=64, bias=0.5).collect()}
    assert got[1] == 1.5 and got[5] == 1.5
    assert got[3] == 0.5


def test_logit_matches_python_reference(spark):
    """End-to-end exactness vs an independent Python implementation of
    the same formulas (md5 bucket hash, integer/1024 weights, mean
    pool) on real corpus text."""
    import hashlib

    sf_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(50)
    got = {r.doc_id: (r.n_feats, r.logit) for r in
           linear_classifier_score(sf_docs, dim=256).collect()}
    for r in sf_docs.select("doc_id", "text").collect():
        toks = [t for t in " ".join((r.text or "").lower().split()).split(" ")
                if t]
        feats = toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]

        def h60(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

        ws = [((h60("w" + str(h60("feat" + f) % 256)) % 2001) - 1000) / 1024.0
              for f in feats]
        want = sum(ws) / len(ws) if ws else 0.0
        nf, logit = got[r.doc_id]
        assert nf == len(feats)
        assert logit == want, (r.doc_id, logit, want)


def test_classifier_plan_is_native_and_broadcasts(spark, docs):
    from towhee_spark.plans import plan_stats

    st = plan_stats(linear_classifier_score(docs, dim=64))
    assert st["python_evals"] == 0
    assert st["broadcasts"] >= 1


def test_hash_weights_range(spark):
    rows = hash_weights(spark, dim=512).collect()
    assert len(rows) == 512
    assert all(-1.0 < r.w < 1.0 for r in rows)
    assert all(abs(r.w * 1024 - round(r.w * 1024)) == 0 for r in rows)
