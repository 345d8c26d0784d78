"""transcripts.funnel_steps: subsequence (not substring) semantics,
no-token-boundary bleed (doubled separators), order sensitivity, NULL
handling, prefix monotonicity, and step validation."""
import datetime as dt

import pytest
from pyspark.sql import Row

from towhee_spark.functions.transcripts import funnel_steps


def _conv(cid, vals):
    t0 = dt.datetime(2024, 1, 1)
    return [
        Row(conv_id=cid, turn_idx=i, role=v,
            ts=t0 + dt.timedelta(seconds=10 * i))
        for i, v in enumerate(vals)
    ]


def _run(spark, convs, steps):
    rows = [r for c in convs for r in c]
    out = funnel_steps(spark.createDataFrame(rows), steps)
    return {r.conv_id: (r.n_turns, r.steps_reached, r.converted)
            for r in out.collect()}


def test_subsequence_not_substring(spark):
    convs = [
        _conv("gap", ["A", "x", "x", "B", "x", "C"]),   # A..B..C with gaps
        _conv("adj", ["A", "B", "C"]),                  # adjacent
        _conv("rev", ["C", "B", "A"]),                  # wrong order
        _conv("part", ["A", "x", "B"]),                 # 2 of 3
        _conv("none", ["x", "y"]),
    ]
    got = _run(spark, convs, ["A", "B", "C"])
    assert got["gap"] == (6, 3, True)
    assert got["adj"] == (3, 3, True)
    assert got["rev"] == (3, 1, False)   # the lone A still matches step 1
    assert got["part"] == (3, 2, False)
    assert got["none"] == (2, 0, False)


def test_no_token_boundary_bleed(spark):
    """'ab' + 'c' must not satisfy a step 'abc'; 'a' must not match
    inside 'abc' — the doubled-separator framing isolates tokens."""
    convs = [
        _conv("split", ["ab", "c"]),
        _conv("inside", ["abc"]),
    ]
    got = _run(spark, convs, ["abc"])
    assert got["split"] == (2, 0, False)
    assert got["inside"] == (1, 1, True)
    got_a = _run(spark, convs, ["a"])
    assert got_a["inside"] == (1, 0, False)


def test_repeated_step_needs_distinct_turns(spark):
    convs = [_conv("one", ["A"]), _conv("two", ["A", "A"])]
    got = _run(spark, convs, ["A", "A"])
    assert got["one"] == (1, 1, False)
    assert got["two"] == (2, 2, True)


def test_null_values_skipped(spark):
    convs = [_conv("n", ["A", None, "B"])]
    got = _run(spark, convs, ["A", "B"])
    assert got["n"] == (2, 2, True)  # n_turns counts non-NULL only


def test_monotone_prefix(spark):
    """steps_reached = k implies every prefix pattern <= k also matched —
    guaranteed by subsequence prefix monotonicity; spot-check the CASE."""
    convs = [_conv("m", ["A", "C", "B", "C"])]
    got = _run(spark, convs, ["A", "B", "C"])
    assert got["m"][1] == 3


def test_validation(spark):
    df = spark.createDataFrame(_conv("x", ["A"]))
    with pytest.raises(ValueError, match="at least one"):
        funnel_steps(df, [])
    with pytest.raises(ValueError, match="charset"):
        funnel_steps(df, ["a.c"])
    with pytest.raises(ValueError, match="charset"):
        funnel_steps(df, [""])
