"""Property-based checks for the round-4 curation/layout/quantize ops:
random inputs vs independent Python references — catches tie, boundary
and degenerate-stratum cases fixed seeds miss."""
from fractions import Fraction

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from towhee_spark.functions import curation, quantize
from towhee_spark.layout import shard_by_hash

SETTINGS = dict(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


@st.composite
def scored_rows(draw):
    n = draw(st.integers(1, 40))
    strata = draw(st.lists(st.sampled_from(["a", "b", "c"]),
                           min_size=n, max_size=n))
    # coarse score grid → heavy tie probability at the threshold
    scores = draw(st.lists(
        st.one_of(st.none(), st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.5, 0.9])),
        min_size=n, max_size=n))
    return [(s, i, v) for i, (s, v) in enumerate(zip(strata, scores))]


@given(scored_rows(), st.sampled_from([0.07, 0.2, 0.3, 0.5, 1.0]))
@settings(**SETTINGS)
def test_top_quantile_matches_python(spark, rows, q):
    df = spark.createDataFrame(rows, "lang string, doc_id long, s double")
    kept = {r.doc_id for r in
            curation.top_quantile_by(df, "s", "lang", q=q).collect()}
    frac = Fraction(str(q))
    by = {}
    for lang, did, s in rows:
        if s is not None:
            by.setdefault(lang, []).append((round(s * 1e6), did))
    expect = set()
    for lang, vs in by.items():
        k = (frac.numerator * len(vs) + frac.denominator - 1) // frac.denominator
        thr = sorted((si for si, _ in vs), reverse=True)[k - 1]
        expect |= {d for si, d in vs if si >= thr}
    assert kept == expect


@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=60, unique=True),
       st.sampled_from([1, 3, 5]))
@settings(**SETTINGS)
def test_shard_by_hash_dense_ranks_and_total(spark, ids, n_shards):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = shard_by_hash(df, n_shards=n_shards).collect()
    assert len(rows) == len(ids)
    by = {}
    for r in rows:
        assert 0 <= r.shard < n_shards
        by.setdefault(r.shard, []).append(r.shard_pos)
    for ps in by.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))


@given(st.lists(
    st.lists(st.floats(-100, 100, allow_nan=False, width=32),
             min_size=2, max_size=6),
    min_size=1, max_size=20))
@settings(**SETTINGS)
def test_quantize_bound_holds_for_random_vectors(spark, vecs):
    dim = min(len(v) for v in vecs)
    vecs = [[float(x) for x in v[:dim]] for v in vecs]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>")
    rows = quantize.quantize_embeddings(df).collect()
    for r in rows:
        v = vecs[r.vec_id]
        mx = max(abs(x) for x in v)
        if mx == 0:
            assert r.q_codes is None and r.q_scale == 0.0
            continue
        assert r.q_scale == pytest.approx(mx)
        for x, qc in zip(v, r.q_codes):
            assert -127 <= qc <= 127
            assert abs(x - qc * r.q_scale / 127.0) <= r.q_scale / 254.0 + 1e-9
