"""Property-based as-of join parity: random keyed/timestamped tables vs
pd.merge_asof under every (direction, exact) combination. Catches tie/
boundary cases fixed seeds miss."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from towhee_spark import asof_join

TS0 = pd.Timestamp("2026-01-01")


@st.composite
def tables(draw):
    n_keys = draw(st.integers(1, 3))
    keys = [f"k{i}" for i in range(n_keys)]
    n_left = draw(st.integers(1, 25))
    n_right = draw(st.integers(0, 25))
    # integer-second offsets with heavy tie probability
    lts = draw(st.lists(st.integers(0, 30), min_size=n_left, max_size=n_left))
    rts = draw(st.lists(st.integers(0, 30), min_size=n_right, max_size=n_right))
    lkeys = draw(st.lists(st.sampled_from(keys), min_size=n_left, max_size=n_left))
    rkeys = draw(st.lists(st.sampled_from(keys), min_size=n_right, max_size=n_right))
    left = pd.DataFrame(
        {"conv_id": lkeys, "ts": [TS0 + pd.Timedelta(seconds=s) for s in lts],
         "lval": range(n_left)}
    )
    right = pd.DataFrame(
        {"conv_id": pd.Series(rkeys, dtype=str),
         "ts": pd.Series([TS0 + pd.Timedelta(seconds=s) for s in rts]),
         "rval": pd.Series([float(i) for i in range(n_right)], dtype="float64")}
    ).drop_duplicates(["conv_id", "ts"])  # unique (key, ts): well-defined ties
    left["ts"] = left["ts"].astype("datetime64[us]")
    right["ts"] = pd.to_datetime(right["ts"]).astype("datetime64[us]")
    return left, right


@given(tables(),
       st.sampled_from(["backward", "forward"]),
       st.booleans(),
       st.sampled_from([None, 5.0]))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_matches_merge_asof(spark, tc, direction, exact, tol):
    left, right = tc
    sl = spark.createDataFrame(left, schema="conv_id string, ts timestamp, lval long")
    sr = spark.createDataFrame(right, schema="conv_id string, ts timestamp, rval double")
    got = (
        asof_join(sl, sr, direction=direction, allow_exact_matches=exact, tolerance=tol)
        .orderBy("conv_id", "ts", "lval")
        .toPandas()
    )
    exp = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort"),
        on="ts", by="conv_id", direction=direction, allow_exact_matches=exact,
        tolerance=pd.Timedelta(seconds=tol) if tol else None,
    ).sort_values(["conv_id", "ts", "lval"], kind="mergesort")
    np.testing.assert_allclose(
        got.rval.astype(float).to_numpy(),
        exp.rval.astype(float).to_numpy(),
        equal_nan=True,
    )
