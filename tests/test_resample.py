"""temporal.resample_grid: hand-checked linear interpolation, the
exact-hit rule, no-extrapolation NULLs, locf ≡ asof_join backward on the
grid, duplicate-(key, ts) MAX resolution, the grid-size guard, and
input validation."""
import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from towhee_spark import temporal as T


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        # key "a": observations at 00:00, 00:30, 01:30 (values 0, 30, 90)
        Row(k="a", ts=_ts(0), v=0.0),
        Row(k="a", ts=_ts(30), v=30.0),
        Row(k="a", ts=dt.datetime(2024, 1, 1, 1, 30), v=90.0),
        # key "b": one observation → a single aligned tick only if exact
        Row(k="b", ts=dt.datetime(2024, 1, 1, 2, 0), v=7.0),
        # key "c": NULL value at an aligned tick + real neighbors
        Row(k="c", ts=_ts(0), v=None),
        Row(k="c", ts=_ts(20), v=2.0),
        Row(k="c", ts=dt.datetime(2024, 1, 1, 1, 40), v=10.0),
    ]
    return rows


def _grid(spark, rows, method, every=3600.0):
    df = spark.createDataFrame(rows)
    out = T.resample_grid(df, by="k", ts="ts", values=["v"],
                          every=every, method=method)
    return {(r.k, r.grid_us): r.v for r in out.collect()}


def test_linear_hand_values(spark, series):
    g = _grid(spark, series, "linear")
    h = 3_600_000_000
    base = 1_704_067_200_000_000  # 2024-01-01T00:00Z in epoch µs
    # key a, tick 00:00 = exact observation
    assert g[("a", base)] == 0.0
    # key a, tick 01:00: between 00:30 (30) and 01:30 (90) → 60
    assert g[("a", base + h)] == 60.0
    # key b: exact single observation at 02:00
    assert g[("b", base + 2 * h)] == 7.0
    # key c, tick 00:00: NULL observation doesn't count as a neighbor —
    # no prev with a value → NULL (no extrapolation)
    assert g[("c", base)] is None
    # key c, tick 01:00: between 00:20 (2) and 01:40 (10) → 2 + 8*(40/80)
    assert g[("c", base + h)] == 6.0
    # grid never extends past floor(max)/ceil(min)
    assert ("a", base + 2 * h) not in g
    assert ("b", base + 3 * h) not in g


def test_locf_equals_asof_backward(spark, series):
    """resample_grid(method='locf') must be indistinguishable from
    asof_join of the grid spine against the observations."""
    df = spark.createDataFrame(series)
    locf = T.resample_grid(df, by="k", ts="ts", values=["v"], method="locf")
    spine = locf.select("k", "grid_us",
                        F.timestamp_micros("grid_us").alias("ts"))
    obs = df.where(F.col("v").isNotNull()).groupBy("k", "ts").agg(
        F.max("v").alias("v"))
    ref = T.asof_join(spine, obs, on="k", direction="backward",
                      suffix="_o")
    got = {(r.k, r.grid_us): r.v for r in locf.collect()}
    exp = {(r.k, r.grid_us): r.v_o for r in ref.collect()}
    assert got == exp


def test_duplicate_ts_resolves_to_max(spark):
    rows = [
        Row(k="a", ts=_ts(0), v=1.0),
        Row(k="a", ts=_ts(0), v=5.0),   # duplicate ts → MAX wins
        Row(k="a", ts=dt.datetime(2024, 1, 1, 1, 0), v=5.0),
    ]
    g = _grid(spark, rows, "linear")
    base = 1_704_067_200_000_000
    assert g[("a", base)] == 5.0


def test_grid_guard_fires(spark):
    rows = [Row(k="a", ts=_ts(0), v=0.0),
            Row(k="a", ts=dt.datetime(2024, 1, 2), v=1.0)]
    df = spark.createDataFrame(rows)
    out = T.resample_grid(df, by="k", ts="ts", values=["v"],
                          every=60.0, max_grid_points=10)
    with pytest.raises(Exception, match="max_grid_points"):
        out.collect()


def test_validation(spark):
    df = spark.createDataFrame([Row(k="a", ts=1.0, v=0.0)])
    with pytest.raises(ValueError, match="method"):
        T.resample_grid(df, by="k", values=["v"], method="cubic")
    with pytest.raises(ValueError, match="every"):
        T.resample_grid(df, by="k", ts="ts", values=["v"], every=0)
    with pytest.raises(ValueError, match="timestamp"):
        T.resample_grid(df, by="k", ts="ts", values=["v"])
