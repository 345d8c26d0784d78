"""lm.cooccurrence_pmi: hand-checked counts and PMI on a tiny corpus,
window semantics, unordered-pair canonicalization, min-count pruning,
and validation."""
import math

import pytest
from pyspark.sql import Row

from towhee_spark.functions.lm import cooccurrence_pmi


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([
        Row(doc_id=0, text="a b a b"),
        Row(doc_id=1, text="a c"),
        Row(doc_id=2, text=""),
        Row(doc_id=3, text=None),
    ])


def test_hand_counts_window1(spark, corpus):
    out = {(r.t1, r.t2): (r.c_pair, r.pmi)
           for r in cooccurrence_pmi(corpus, window=1, min_pair_count=1).collect()}
    # adjacent pairs: (a,b) x3 in doc0, (a,c) x1 in doc1; N=6 tokens, T=4 slots
    assert out[("a", "b")][0] == 3
    assert out[("a", "c")][0] == 1
    n, t = 6, 4
    ca, cb, cc = 3, 2, 1
    assert out[("a", "b")][1] == pytest.approx(
        round(math.log((3 * n * n) / (ca * cb * t)), 6), abs=1e-12)
    assert out[("a", "c")][1] == pytest.approx(
        round(math.log((1 * n * n) / (ca * cc * t)), 6), abs=1e-12)


def test_window_widens_pairs(spark, corpus):
    w1 = {(r.t1, r.t2): r.c_pair
          for r in cooccurrence_pmi(corpus, window=1, min_pair_count=1).collect()}
    w3 = {(r.t1, r.t2): r.c_pair
          for r in cooccurrence_pmi(corpus, window=3, min_pair_count=1).collect()}
    # window 3 adds the (a,a) and (b,b) skip pairs in doc0
    assert ("a", "a") not in w1 and w3[("a", "a")] == 1
    assert w3[("a", "b")] == 4  # one extra a..b at distance 3
    assert all(w3[k] >= v for k, v in w1.items())


def test_unordered_canonical(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="b a")])
    rows = cooccurrence_pmi(df, window=1, min_pair_count=1).collect()
    assert [(r.t1, r.t2) for r in rows] == [("a", "b")]


def test_min_count_prunes(spark, corpus):
    out = {(r.t1, r.t2)
           for r in cooccurrence_pmi(corpus, window=1, min_pair_count=2).collect()}
    assert out == {("a", "b")}


def test_validation(spark, corpus):
    with pytest.raises(ValueError, match="window"):
        cooccurrence_pmi(corpus, window=0)
    with pytest.raises(ValueError, match="min_pair_count"):
        cooccurrence_pmi(corpus, min_pair_count=0)
