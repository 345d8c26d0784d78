"""temporal.ewma: pandas-ewm equivalence inside the truncation horizon,
self-normalization at series start, NULL dropping, truncation bound,
and validation."""
import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import Row

from towhee_spark.temporal import ewma


def _df(spark, vals):
    t0 = dt.datetime(2024, 1, 1)
    return spark.createDataFrame([
        Row(k="a", ts=t0 + dt.timedelta(seconds=60 * i), v=v)
        for i, v in enumerate(vals)
    ])


def test_matches_pandas_adjust_true(spark):
    """Inside the first w observations the truncated sum IS pandas
    ewm(alpha, adjust=True).mean() exactly (round-6)."""
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    out = ewma(_df(spark, vals), by="k", ts="ts", col="v",
               alpha=0.4, w=32).orderBy("ts").collect()
    ref = pd.Series(vals).ewm(alpha=0.4, adjust=True).mean()
    for r, e in zip(out, ref):
        assert r.ewma == pytest.approx(round(e, 6), abs=1e-6)


def test_first_row_is_value(spark):
    out = ewma(_df(spark, [7.5]), by="k", ts="ts", col="v").collect()
    assert out[0].ewma == 7.5


def test_nulls_dropped(spark):
    out = ewma(_df(spark, [2.0, None, 4.0]), by="k", ts="ts", col="v",
               alpha=0.5).orderBy("ts").collect()
    assert len(out) == 2
    # the NULL is skipped entirely: second output folds [2, 4]
    assert out[1].ewma == pytest.approx(round((4 + 0.5 * 2) / 1.5, 6), abs=0)


def test_truncation_matches_window_depth(spark):
    """With w=2 only the trailing 2 observations enter."""
    out = ewma(_df(spark, [10.0, 0.0, 0.0]), by="k", ts="ts", col="v",
               alpha=0.5, w=2).orderBy("ts").collect()
    # third row folds [0, 0] — the 10 fell out of the horizon
    assert out[2].ewma == 0.0


def test_validation(spark):
    df = _df(spark, [1.0])
    with pytest.raises(ValueError, match="alpha"):
        ewma(df, by="k", ts="ts", col="v", alpha=0.0)
    with pytest.raises(ValueError, match="w must"):
        ewma(df, by="k", ts="ts", col="v", w=0)
