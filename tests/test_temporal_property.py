"""Property-based checks for the session-3 temporal feature ops: random
keyed event streams (duplicate timestamps, NULL values, empty windows)
vs independent Python references."""
import datetime as dt
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from towhee_spark import temporal

SETTINGS = dict(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

_T0 = dt.datetime(2026, 1, 1)


@st.composite
def streams(draw):
    """[(key, ts, value)] with clustered timestamps (duplicates likely)."""
    n_keys = draw(st.integers(1, 3))
    rows, uid = [], 0
    for ki in range(n_keys):
        n = draw(st.integers(1, 12))
        offs = draw(st.lists(st.integers(0, 40), min_size=n, max_size=n))
        for off in offs:
            v = draw(st.one_of(st.none(), st.integers(-5, 5)))
            rows.append((f"k{ki}", uid, _T0 + dt.timedelta(seconds=off),
                         None if v is None else float(v)))
            uid += 1
    return rows


def _sdf(spark, rows):
    return spark.createDataFrame(
        rows, "k string, i int, ts timestamp, v double")


@given(streams(), st.integers(1, 30), st.booleans())
@settings(**SETTINGS)
def test_future_agg_matches_python(spark, rows, horizon, include_current):
    d = _sdf(spark, rows)
    out = {r["i"]: (r["n"], r["s"]) for r in temporal.future_agg(
        d, d, on="k", ts="ts", horizon_seconds=float(horizon),
        aggs={"n": ("count", "*"), "s": ("sum", "v")},
        include_current=include_current).collect()}
    for k, i, ts, _v in rows:
        sel = [v for k2, _i2, t2, v in rows
               if k2 == k
               and ((t2 >= ts) if include_current else (t2 > ts))
               and (t2 - ts).total_seconds() <= horizon]
        nn = [v for v in sel if v is not None]
        assert out[i] == (len(sel), sum(nn) if nn else None), (i, ts)


@given(streams(), st.booleans(), st.sampled_from([None, 7.0]))
@settings(**SETTINGS)
def test_expanding_agg_matches_python(spark, rows, include_current, chunk):
    out = {r["i"]: (r["n"], r["s"], r["mx"]) for r in temporal.expanding_agg(
        _sdf(spark, rows), on="k", ts="ts",
        aggs={"n": ("count", "*"), "s": ("sum", "v"), "mx": ("max", "v")},
        include_current=include_current, chunk_seconds=chunk).collect()}
    for k, i, ts, _v in rows:
        sel = [v for k2, _i2, t2, v in rows
               if k2 == k and ((t2 <= ts) if include_current else (t2 < ts))]
        nn = [v for v in sel if v is not None]
        assert out[i] == (len(sel), sum(nn) if nn else None,
                          max(nn) if nn else None), (i, ts, chunk)


@given(streams(), st.integers(1, 30),
       st.sampled_from([0.25, 0.5, 0.9, 1.0]))
@settings(**SETTINGS)
def test_range_quantile_matches_python(spark, rows, window, q):
    d = _sdf(spark, rows)
    out = {r["i"]: r["quantile"] for r in temporal.range_quantile(
        d, d, on="k", ts="ts", window_seconds=float(window),
        value="v", qs=q).collect()}
    for k, i, ts, _v in rows:
        sel = sorted(v for k2, _i2, t2, v in rows
                     if k2 == k and t2 < ts
                     and (ts - t2).total_seconds() <= window
                     and v is not None)
        exp = sel[math.ceil(q * len(sel)) - 1] if sel else None
        assert out[i] == exp, (i, ts)


@given(streams())
@settings(**SETTINGS)
def test_range_zscore_matches_python(spark, rows):
    out = {r["i"]: (r["z_n"], r["z"]) for r in temporal.range_zscore(
        _sdf(spark, rows), on="k", ts="ts", value="v",
        window_seconds=15.0).collect()}
    for k, i, ts, v in rows:
        sel = [x for k2, _i2, t2, x in rows
               if k2 == k and t2 < ts and (ts - t2).total_seconds() <= 15.0
               and x is not None]
        n, z = out[i]
        assert n == len(sel)
        if v is None or len(sel) < 2:
            assert z is None
            continue
        mu = sum(sel) / len(sel)
        var = sum((x - mu) ** 2 for x in sel) / len(sel)
        if var == 0.0:
            assert z is None
        else:
            assert z == pytest.approx((v - mu) / math.sqrt(var), abs=2e-6)
