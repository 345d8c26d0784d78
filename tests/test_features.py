"""Tabular feature engineering: target encoding vs a Python reference
(plain + leave-one-out), feature-hash determinism and collision summing,
scaler fit/apply round trips, degenerate groups, and input validation."""
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from towhee_spark.functions import features as FE

SCALE = 1 << 20


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        Row(i=0, cat="a", y=1.0),
        Row(i=1, cat="a", y=3.0),
        Row(i=2, cat="a", y=5.0),
        Row(i=3, cat="b", y=10.0),
        Row(i=4, cat="b", y=None),   # NULL label
        Row(i=5, cat="c", y=7.0),    # singleton category
    ]
    return spark.createDataFrame(rows).cache()


def _expect_te(rows, cat, m, own=None):
    """Python reference of the exact frozen-integer formula."""
    lf = {i: round(y * SCALE) for i, _, y in rows if y is not None}
    big_n, big_s = len(lf), sum(lf.values())
    cs = sum(v for (i, c, y), v in zip(rows, [lf.get(i) for i, _, _ in rows])
             if c == cat and v is not None)
    cn = sum(1 for i, c, y in rows if c == cat and y is not None)
    o = lf.get(own, 0) if own is not None else 0
    on = 1 if own in lf else 0
    den = (cn - on + m) * big_n * SCALE
    if cn - on + m <= 0:
        return None
    return round(((cs - o) * big_n + m * big_s) / den, 6)


def test_target_stats_matches_reference(tiny):
    rows = [(r.i, r.cat, r.y) for r in tiny.select("i", "cat", "y").collect()]
    got = {r.cat: (r.n, r.te) for r in FE.target_stats(tiny, "cat", "y", 2).collect()}
    assert got["a"][0] == 3 and got["b"][0] == 1 and got["c"][0] == 1
    for c in ("a", "b", "c"):
        assert got[c][1] == pytest.approx(_expect_te(rows, c, 2), abs=0)


def test_target_encode_loo(tiny):
    rows = [(r.i, r.cat, r.y) for r in tiny.select("i", "cat", "y").collect()]
    out = {r.i: r.te for r in
           FE.target_encode(tiny, "cat", "y", smoothing=2, loo=True).collect()}
    for i, c, y in rows:
        assert out[i] == pytest.approx(_expect_te(rows, c, 2, own=i), abs=0), i


def test_target_encode_loo_singleton_zero_smoothing(tiny):
    # singleton category + m=0 + LOO → denominator count 0 → NULL, not inf
    out = {r.i: r.te for r in
           FE.target_encode(tiny, "cat", "y", smoothing=0, loo=True).collect()}
    assert out[5] is None
    # the NULL-label row keeps the plain (all-rows) category encoding
    assert out[4] is not None


def test_target_encode_smoothing_validation(tiny):
    with pytest.raises(ValueError, match="smoothing"):
        FE.target_encode(tiny, "cat", "y", smoothing=1.5)  # type: ignore[arg-type]
    with pytest.raises(ValueError, match="smoothing"):
        FE.target_stats(tiny, "cat", "y", smoothing=-1)


def test_feature_hash_deterministic_and_signed(spark):
    df = spark.createDataFrame(
        [Row(id=0, c="x", v=2.5), Row(id=1, c="x", v=None), Row(id=2, c=None, v=1.0)]
    )
    out = FE.feature_hash(df, "id", ["c", "v"], n_features=8, numeric=["v"])
    rows = {(r.id, r.idx): r.val for r in out.collect()}
    both = [v for (rid, idx), v in rows.items() if rid == 0]
    # row 1 has only the categorical feature (v is NULL), row 2 only numeric
    assert len([k for k in rows if k[0] == 1]) == 1
    assert len([k for k in rows if k[0] == 2]) == 1
    # categorical weight is ±1, numeric weight is ±value
    v1 = [v for (rid, _), v in rows.items() if rid == 1][0]
    assert abs(v1) == 1.0
    v2 = [v for (rid, _), v in rows.items() if rid == 2][0]
    assert abs(v2) == 1.0  # value 1.0
    assert len(both) == 2 or len(both) == 1  # collision sums into one idx


def test_feature_hash_collision_sums(spark):
    # two equal values in the SAME row and column set cannot exist, but a
    # numeric and categorical feature can collide on idx — force n_features=1
    df = spark.createDataFrame([Row(id=0, c="x", v=4.0)])
    out = FE.feature_hash(df, "id", ["c", "v"], n_features=1, numeric=["v"]).collect()
    assert len(out) == 1 and out[0].idx == 0
    # signs are ±1 per feature; sum is one of ±4±1
    assert abs(out[0].val) in (3.0, 5.0)


def test_feature_hash_validation(spark):
    df = spark.createDataFrame([Row(id=0, c="x")])
    with pytest.raises(ValueError, match="n_features"):
        FE.feature_hash(df, "id", ["c"], n_features=0)
    with pytest.raises(ValueError, match="numeric"):
        FE.feature_hash(df, "id", ["c"], numeric=["nope"])


def test_scaler_stats_exact(spark):
    df = spark.createDataFrame([Row(g="a", x=float(v)) for v in (1, 2, 3, 4)]
                               + [Row(g="b", x=5.0)])
    st = {r.g: r for r in FE.scaler_stats(df, "x", by="g").collect()}
    assert st["a"].mean == 2.5
    assert st["a"].min == 1.0 and st["a"].max == 4.0
    # population variance of 1..4 = 1.25
    assert st["a"].std == pytest.approx(round(math.sqrt(1.25), 6), abs=0)
    assert st["b"].std == 0.0


def test_scale_zscore_and_minmax(spark):
    df = spark.createDataFrame([Row(g="a", x=float(v)) for v in (1, 2, 3, 4)]
                               + [Row(g="b", x=5.0)])
    z = {(r.g, r.x): r.scaled for r in FE.scale(df, "x", "zscore", by="g").collect()}
    sd = round(math.sqrt(1.25), 6)
    assert z[("a", 1.0)] == pytest.approx(round((1 - 2.5) / sd, 6), abs=0)
    assert z[("b", 5.0)] is None  # degenerate group → NULL, not inf
    mm = {r.x: r.scaled for r in FE.scale(df, "x", "minmax").collect()}
    assert mm[1.0] == 0.0 and mm[5.0] == 1.0 and mm[3.0] == 0.5


def test_scale_with_prefit_stats(spark):
    # train stats applied to a held-out split: the canonical fit/apply split
    train = spark.createDataFrame([Row(x=0.0), Row(x=10.0)])
    val = spark.createDataFrame([Row(x=5.0), Row(x=20.0)])
    st = FE.scaler_stats(train, "x")
    out = {r.x: r.scaled for r in
           FE.scale(val, "x", "minmax", stats=st).collect()}
    assert out[5.0] == 0.5 and out[20.0] == 2.0  # extrapolates beyond train max


def test_scale_method_validation(spark):
    df = spark.createDataFrame([Row(x=1.0)])
    with pytest.raises(ValueError, match="method"):
        FE.scale(df, "x", method="robust")


# ---------------------------------------------------------------------------
# weight of evidence / IV
# ---------------------------------------------------------------------------


def _ref_woe(cats):
    """Exact Python reference: cats = {cat: (n, n_pos)}."""
    big_n = sum(n for n, _ in cats.values())
    big_p = sum(p for _, p in cats.values())
    out = {}
    for c, (n, p) in cats.items():
        neg, gneg = n - p, big_n - big_p
        woe = round(math.log(((2 * p + 1) * (2 * gneg + 1))
                             / ((2 * neg + 1) * (2 * big_p + 1))), 6)
        pq = (p * gneg - neg * big_p) / (big_p * gneg)
        out[c] = (woe, round(pq * woe, 6))
    return out


def test_woe_stats_matches_reference(spark):
    rows = [Row(cat="a", y=1), Row(cat="a", y=1), Row(cat="a", y=0),
            Row(cat="b", y=0), Row(cat="b", y=0), Row(cat="c", y=1),
            Row(cat="c", y=None)]
    df = spark.createDataFrame(rows)
    got = {r.cat: r for r in FE.woe_stats(df, "cat", "y").collect()}
    ref = _ref_woe({"a": (3, 2), "b": (2, 0), "c": (1, 1)})
    assert got["a"].n == 3 and got["a"].n_pos == 2
    assert got["c"].n == 1  # NULL label excluded
    for c in ("a", "b", "c"):
        assert got[c].woe == pytest.approx(ref[c][0], abs=0), c
        assert got[c].iv_term == pytest.approx(ref[c][1], abs=0), c


def test_woe_stats_pure_category_finite(spark):
    # a pure-negative category would be ln(0) without smoothing — the
    # half-count smoothing keeps it finite
    df = spark.createDataFrame([Row(cat="a", y=0), Row(cat="b", y=1)])
    got = {r.cat: r.woe for r in FE.woe_stats(df, "cat", "y").collect()}
    assert all(w is not None and math.isfinite(w) for w in got.values())


def test_woe_stats_nonbinary_label_raises(spark):
    df = spark.createDataFrame([Row(cat="a", y=2)])
    with pytest.raises(Exception, match="woe_stats"):
        FE.woe_stats(df, "cat", "y").collect()
    # validate=False skips the guard (caller-asserted contract)
    FE.woe_stats(df, "cat", "y", validate=False).collect()


# ---------------------------------------------------------------------------
# count encoding + rare collapse
# ---------------------------------------------------------------------------


def test_count_encode(spark):
    df = spark.createDataFrame(
        [Row(cat="a")] * 3 + [Row(cat="b")] * 2 + [Row(cat="c"), Row(cat=None)]
    )
    got = {r.cat: r for r in FE.count_encode(df, "cat", min_count=2).collect()}
    assert set(got) == {"a", "b", "c"}  # NULL excluded
    assert got["a"].n == 3 and got["a"].kept == "a"
    assert got["b"].kept == "b"
    assert got["c"].kept == "__other__"
    assert got["a"].freq == pytest.approx(round(3 / 6, 6), abs=0)


# ---------------------------------------------------------------------------
# PSI drift
# ---------------------------------------------------------------------------


def _ref_psi(vals_a, vals_b, lo, hi, nb):
    lof, hif = lo * SCALE, hi * SCALE
    width = hif - lof

    def bins(vals):
        c = [0] * nb
        for v in vals:
            xf = round(v * SCALE)
            xc = max(lof, min(xf, hif - 1))
            c[(xc - lof) * nb // width] += 1
        return c

    ca, cb = bins(vals_a), bins(vals_b)
    ta, tb = sum(ca), sum(cb)
    out = []
    for i in range(nb):
        l6 = round(math.log(((2 * ca[i] + 1) * (2 * tb + nb))
                            / ((2 * cb[i] + 1) * (2 * ta + nb))), 6)
        pa = (2 * ca[i] + 1) / (2 * ta + nb)
        pc = (2 * cb[i] + 1) / (2 * tb + nb)
        out.append((i, ca[i], cb[i], round((pa - pc) * l6, 6)))
    return out


def test_drift_psi_matches_reference(spark):
    a = [0.5, 1.5, 2.5, 9.9]      # baseline
    b = [0.5, 7.5, 8.5, 12.0]     # current (12.0 clamps into the top bin)
    rows = [Row(x=v, b=True) for v in a] + [Row(x=v, b=False) for v in b]
    df = spark.createDataFrame(rows)
    got = sorted(
        (r.bin, r.n_base, r.n_cur, r.psi_term)
        for r in FE.drift_psi(df, "x", F.col("b"), lo=0, hi=10, bins=5).collect()
    )
    assert got == _ref_psi(a, b, 0, 10, 5)
    # every bin emits a row even when empty on both sides
    assert len(got) == 5


def test_drift_psi_validation(spark):
    df = spark.createDataFrame([Row(x=1.0, b=True)])
    with pytest.raises(ValueError, match="bins"):
        FE.drift_psi(df, "x", F.col("b"), 0, 10, bins=1)
    with pytest.raises(ValueError, match="hi"):
        FE.drift_psi(df, "x", F.col("b"), 10, 0)
    with pytest.raises(ValueError, match="freeze grid"):
        FE.drift_psi(df, "x", F.col("b"), 0, 1e-9)


def test_drift_psi_identical_slices_near_zero(spark):
    vals = [float(v) for v in range(20)]
    rows = [Row(x=v, b=True) for v in vals] + [Row(x=v, b=False) for v in vals]
    df = spark.createDataFrame(rows)
    out = FE.drift_psi(df, "x", F.col("b"), lo=0, hi=20, bins=4).collect()
    assert sum(abs(r.psi_term) for r in out) < 1e-5


# ---------------------------------------------------------------------------
# Pearson correlation pairs
# ---------------------------------------------------------------------------


def test_corr_pairs_exact_relationships(spark):
    rows = [Row(x=float(v), y=2.0 * v + 1, z=-1.0 * v, c=5.0) for v in range(8)]
    df = spark.createDataFrame(rows)
    got = {(r.col_x, r.col_y): r for r in
           FE.corr_pairs(df, ["x", "y", "z", "c"]).collect()}
    assert got[("x", "y")].corr == 1.0
    assert got[("x", "z")].corr == -1.0
    assert got[("x", "c")].corr is None      # zero-variance column
    assert got[("x", "y")].n == 8
    # unordered pairs, list order: 6 rows for 4 columns
    assert len(got) == 6


def test_corr_pairs_sums_exact(spark):
    bits, vals = 12, [1.25, 2.5, 3.75]
    df = spark.createDataFrame([Row(x=v, y=v * v) for v in vals])
    r = FE.corr_pairs(df, ["x", "y"], bits=bits).collect()[0]
    fx = [round(v * (1 << bits)) for v in vals]
    fy = [round(v * v * (1 << bits)) for v in vals]
    assert (r.sx, r.sy) == (sum(fx), sum(fy))
    assert r.sxy == sum(a * b for a, b in zip(fx, fy))
    assert r.sxx == sum(a * a for a in fx)
    num = r.n * r.sxy - r.sx * r.sy
    den = math.sqrt(r.n * r.sxx - r.sx**2) * math.sqrt(r.n * r.syy - r.sy**2)
    assert r.corr == pytest.approx(round(num / den, 6), abs=0)


def test_corr_pairs_null_rows_dropped(spark):
    df = spark.createDataFrame(
        [Row(x=1.0, y=1.0), Row(x=2.0, y=None), Row(x=3.0, y=3.0)])
    r = FE.corr_pairs(df, ["x", "y"]).collect()[0]
    assert r.n == 2  # complete-case


def test_corr_pairs_validation(spark):
    df = spark.createDataFrame([Row(x=1.0)])
    with pytest.raises(ValueError, match="2 columns"):
        FE.corr_pairs(df, ["x"])


# ------------------------------------------------------------- class_weights


def test_class_weights_balanced_matches_sklearn_rule(spark):
    from towhee_spark.functions import features as fe

    rows = [("a",)] * 70 + [("b",)] * 20 + [("c",)] * 10 + [(None,)]
    df = spark.createDataFrame(rows, "lbl string")
    out = {r["label"]: r for r in fe.class_weights(df, "lbl").collect()}
    assert set(out) == {"a", "b", "c"}  # nulls excluded
    n = {"a": 70, "b": 20, "c": 10}
    for lbl, r in out.items():
        assert r["n"] == n[lbl]
        assert r["weight"] == round(100 / (3 * n[lbl]), 6)


def test_class_weights_inv_sqrt_and_validation(spark):
    from towhee_spark.functions import features as fe
    import math
    import pytest

    df = spark.createDataFrame([("a",)] * 90 + [("b",)] * 10, "lbl string")
    out = {r["label"]: r["weight"]
           for r in fe.class_weights(df, "lbl", scheme="inv_sqrt").collect()}
    assert out["a"] == round(math.sqrt(100 / 90), 6)
    assert out["b"] == round(math.sqrt(100 / 10), 6)
    with pytest.raises(ValueError, match="scheme"):
        fe.class_weights(df, "lbl", scheme="log")


# ----------------------------------------------------- target_encode_timesafe


def test_target_encode_timesafe_vs_python(spark):
    import datetime as dt

    from towhee_spark.functions import features as fe

    base = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=60)
    rows = [("a", 0, base, 10.0), ("a", 1, base + s, 20.0),
            ("b", 2, base + 2 * s, 100.0), ("a", 3, base + 3 * s, None),
            ("a", 4, base + 4 * s, 30.0)]
    df = spark.createDataFrame(
        rows, "cat string, i int, ts timestamp, y double")
    m = 4
    out = {r["i"]: r["te_ts"] for r in fe.target_encode_timesafe(
        df, "cat", "y", ts="ts", smoothing=m).collect()}
    ys = [10.0, 20.0, 100.0, 30.0]
    prior = sum(ys) / len(ys)
    # first 'a' and first 'b': pure prior; later rows mix prior history
    assert out[0] == round(prior, 6)
    assert out[2] == round(prior, 6)
    assert out[1] == round((10 + m * prior) / (1 + m), 6)
    assert out[3] == round((30 + m * prior) / (2 + m), 6)  # NULL y still encoded
    assert out[4] == round((30 + m * prior) / (2 + m), 6)  # NULL y not in history
    # a future high label must never move an earlier row's encoding
    df2 = df.union(spark.createDataFrame(
        [("a", 9, base + 100 * s, 10_000.0)],
        "cat string, i int, ts timestamp, y double"))
    out2 = {r["i"]: r["te_ts"] for r in fe.target_encode_timesafe(
        df2, "cat", "y", ts="ts", smoothing=m).collect()}
    # per-category history identical for old rows; only the PRIOR scalar
    # (documented regularizer) may shift
    prior2 = (sum(ys) + 10_000.0) / 5
    assert out2[1] == round((10 + m * prior2) / (1 + m), 6)


def test_target_encode_timesafe_chunked_and_validation(spark):
    import datetime as dt

    import pytest

    from towhee_spark.functions import features as fe

    base = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=60)
    rows = [("c" if i % 4 else "d", i, base + i * s, float(i % 7))
            for i in range(200)]
    df = spark.createDataFrame(
        rows, "cat string, i int, ts timestamp, y double")
    plain = fe.target_encode_timesafe(df, "cat", "y").select("i", "te_ts")
    chunked = fe.target_encode_timesafe(
        df, "cat", "y", chunk_seconds=600.0,
        broadcast_carry=False).select("i", "te_ts")
    assert plain.exceptAll(chunked).count() == 0
    assert chunked.exceptAll(plain).count() == 0
    with pytest.raises(ValueError, match="smoothing"):
        fe.target_encode_timesafe(df, "cat", "y", smoothing=-1)


# -------------------------------------------------------------- ecdf_transform


def test_ecdf_transform_matches_scipy_style_ecdf(spark):
    from towhee_spark.functions import features as fe

    vals = [1.0, 2.0, 2.0, 3.0, 10.0, None]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, v double")
    out = {r["i"]: r["ecdf"] for r in fe.ecdf_transform(df, "v").collect()}
    nn = [v for v in vals if v is not None]
    n = len(nn)
    for i, v in enumerate(vals):
        if v is None:
            assert out[i] is None
        else:
            assert out[i] == round(sum(1 for x in nn if x <= v) / n, 6)
    # ties share a rank; max maps to 1.0
    assert out[1] == out[2] and out[4] == 1.0
    # shuffled-stats path identical
    big = spark.range(5000).select(
        F.col("id").alias("i"), (F.col("id") % 97).cast("double").alias("v"))
    a = fe.ecdf_transform(big, "v").select("i", "ecdf")
    b = fe.ecdf_transform(big, "v", broadcast_stats=False).select("i", "ecdf")
    assert a.exceptAll(b).count() == 0
    import pytest
    with pytest.raises(ValueError, match="bits"):
        fe.ecdf_transform(df, "v", bits=0)
