"""End-to-end Pipeline DSL goldens, mirroring the reference's operator tests
(tests/unittests/runtime/test_*_node.py and pipeline.py docstring examples).
Run in parity mode (run_rows: one invocation per input row)."""

import pytest
from pyspark.sql import types as T

from towhee_spark.pipeline import Pipeline


def test_map_plus_one(spark):
    # pipeline.py:86-91 — p(1).get() == [2]
    p = Pipeline.input("a").map("a", "b", lambda x: x + 1).output("b")
    assert p.run_rows(spark, [1, 5]) == [(2,), (6,)]


def test_map_multi_output(spark):
    p = (
        Pipeline.input("a", "b")
        .map(("a", "b"), ("c", "d"), lambda x, y: (x + y, x - y))
        .output("c", "d")
    )
    assert p.run_rows(spark, [(3, 1)]) == [(4, 2)]


def test_map_python_fallback(spark):
    # a genuinely-Python fn (string manipulation not expressible on Columns)
    p = (
        Pipeline.input("a")
        .map("a", "b", lambda x: f"<{x}>", out_types=[T.StringType()])
        .output("b")
    )
    assert p.run_rows(spark, [(1,), (2,)]) == [("<1>",), ("<2>",)]


def test_flat_map_unroll(spark):
    # pipeline.py:198-209 — flat_map unrolls [x, x+1, x+2]
    p = (
        Pipeline.input("a")
        .flat_map("a", "b", lambda x: [x, x + 1, x + 2], out_types=[T.LongType()])
        .output("b")
    )
    assert p.run_rows(spark, [0]) == [(0,), (1,), (2,)]


def test_filter_pass_block(spark):
    # pipeline.py:246-255 — filter num > 10
    p = (
        Pipeline.input("a")
        .filter("a", "out", "a", lambda x: x > 10)
        .output("out")
    )
    assert p.run_rows(spark, [5, 11, 3, 30]) == [(11,), (30,)]


def test_reduce_sum(spark):
    # pipeline.py:381-388 — flat_map then reduce sums to [10, 14]
    p = (
        Pipeline.input("a", "b")
        .flat_map(("a", "b"), ("a", "b"), lambda x, y: list(zip(x, y)),
                  out_types=[T.LongType(), T.LongType()])
        .reduce(("a", "b"), ("a_sum", "b_sum"), lambda a, b: (sum(a), sum(b)),
                out_types=[T.LongType(), T.LongType()])
        .output("a_sum", "b_sum")
    )
    assert p.run_rows(spark, [([1, 2, 3, 4], [2, 3, 4, 5])]) == [(10, 14)]


def test_concat_branches(spark):
    # pipeline.py:153-161 — p0.input(a,b,c); p1: d=a+1; p2: e=b-c;
    # p2.concat(p1).output(d,e) on (1,2,3) → [2, -1]
    p0 = Pipeline.input("a", "b", "c")
    p1 = p0.map("a", "d", lambda x: x + 1)
    p2 = p0.map(("b", "c"), "e", lambda x, y: x - y)
    p = p2.concat(p1).output("d", "e")
    assert p.run_rows(spark, [(1, 2, 3)]) == [(2, -1)]


def test_window_all(spark):
    p = (
        Pipeline.input("a")
        .flat_map("a", "b", lambda x: x, out_types=[T.LongType()])
        .window_all("b", "s", lambda b: sum(b), out_types=[T.LongType()])
        .output("s")
    )
    assert p.run_rows(spark, [([1, 2, 3],)]) == [(6,)]


@pytest.mark.parametrize(
    "size,step,expected",
    [
        (2, 2, [[1, 2], [3, 4], [5, 6], [7, 8], [9]]),
        (3, 2, [[1, 2, 3], [3, 4, 5], [5, 6, 7], [7, 8, 9], [9]]),
        (2, 5, [[1, 2], [6, 7]]),
    ],
)
def test_count_window_goldens(spark, size, step, expected):
    # reference goldens: tests/unittests/runtime/test_window_node.py:36-118
    p = (
        Pipeline.input("a")
        .flat_map("a", "n", lambda x: x, out_types=[T.LongType()])
        .window("n", "w", size, step, lambda n: list(n),
                out_types=[T.ArrayType(T.LongType())])
        .output("w")
    )
    got = [list(r[0]) for r in p.run_rows(spark, [(list(range(1, 10)),)])]
    assert got == expected


def test_window_chunk_seconds_requires_keys(spark):
    """chunk_seconds without apply(by=, order=) must fail LOUDLY — a silent
    bare-key fallback would resurrect the mega-key serialization the
    parameter exists to remove (advisor r3)."""
    df = spark.createDataFrame([(i,) for i in range(9)], "n long")
    p = (
        Pipeline.input("n")
        .window("n", "w", 3, 3, sum, out_types=("bigint",), chunk_seconds=60.0)
        .output("w")
    )
    with pytest.raises(ValueError, match="chunk_seconds"):
        p.apply(df)  # no by=/order= → bare-key fallback must be refused
    # with by= and order= the chunked path binds (run_rows supplies both
    # implicitly via invocation/row-order) — no raise, results unchanged


def test_time_window_doc_example(spark):
    # pipeline.py:430-443 doc example: sums ([3,6],[8,9],[19,21])
    rows = [(i, i + 1, i * 1000) for i in range(11) if i < 3 or i > 7]
    p = (
        Pipeline.input("d")
        .flat_map("d", ("n1", "n2", "t"), lambda d: d,
                  out_types=[T.LongType(), T.LongType(), T.LongType()])
        .time_window(("n1", "n2"), ("s1", "s2"), "t", 3, 3,
                     lambda n1, n2: (sum(n1), sum(n2)),
                     out_types=[T.LongType(), T.LongType()])
        .output("s1", "s2")
    )
    assert p.run_rows(spark, [(rows,)]) == [(3, 6), (8, 9), (19, 21)]


def test_table_mode_on_parquet(spark):
    """Table mode: same DSL applied to a driver parquet table."""
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p = (
        Pipeline.input("event_type", "value")
        .map("value", "v2", lambda v: v * 2)
        .filter(("event_type", "v2"), ("event_type", "v2"), "v2", lambda v: v > 100)
        .output("event_type", "v2")
    )
    out = p.apply(df)
    rows = out.collect()
    assert all(r.v2 > 100 for r in rows)
    assert out.columns == ["event_type", "v2"]


def test_time_window_fast_path_matches_exact_on_dense_stream(spark):
    """exact=False (aligned-window scale path) == exact=True on gap-free
    ordered streams — the documented equivalence (SURVEY.md §2.1)."""
    from pyspark.sql import types as T

    rows = [(i, i * 1000) for i in range(30)]
    base = (
        Pipeline.input("d")
        .flat_map("d", ("n", "t"), lambda d: d, out_types=[T.LongType(), T.LongType()])
    )
    def run(exact):
        p = base.time_window(
            ("n",), ("s",), "t", 4, 2, lambda n: sum(n),
            out_types=[T.LongType()], exact=exact,
        ).output("s")
        return sorted(r[0] for r in p.run_rows(spark, [(rows,)]))

    assert run(True) == run(False)


def test_nested_pipeline_as_map_fn(spark):
    """Sub-pipeline as a map operator — inlined with schema renaming
    (dag_repr.py:384-430 parity)."""
    sub = Pipeline.input("x").map("x", "y", lambda v: v * 10).output("y")
    p = Pipeline.input("a").map("a", "b", sub).output("b")
    assert p.run_rows(spark, [1, 2]) == [(10,), (20,)]

    # arity mismatch → clear error
    bad = Pipeline.input("x", "z").map(("x", "z"), "y", lambda v, w: v).output("y")
    with pytest.raises(ValueError, match="arity"):
        Pipeline.input("a").map("a", "b", bad).output("b").run_rows(spark, [1])


def test_filter_swap_rename(spark):
    """Positional in→out rename with a SWAP — reference golden
    test_filter_node.py:153-181: inputs (num1,num2)→outputs (num2,num1) on
    rows (i, i+1) filtered by num1>5 yields {num1: i+1, num2: i}."""
    p = (
        Pipeline.input("num1", "num2")
        .filter(("num1", "num2"), ("num2", "num1"), "num1", lambda x: x > 5)
        .output("num1", "num2")
    )
    rows = p.run_rows(spark, [(i, i + 1) for i in range(10)])
    assert rows == [(i + 1, i) for i in range(6, 10)]


def test_map_generator_outputs_materialized(spark):
    """Generator-returning map fns materialize to list cells — reference
    goldens test_map_node.py:278-366 (multi_gen: num=4 → vec=[0,1,2,3])."""
    p = (
        Pipeline.input("num")
        .map("num", "vec", lambda n: (i for i in range(n)),
             out_types=[T.ArrayType(T.LongType())])
        .output("vec")
    )
    assert [list(r[0]) for r in p.run_rows(spark, [4])] == [[0, 1, 2, 3]]

    p2 = (
        Pipeline.input("num")
        .map("num", ("v1", "v2"),
             lambda n: ((i for i in range(n)), (i * 2 for i in range(n))),
             out_types=[T.ArrayType(T.LongType()), T.ArrayType(T.LongType())])
        .output("v1", "v2")
    )
    out = p2.run_rows(spark, [3])
    assert [list(out[0][0]), list(out[0][1])] == [[0, 1, 2], [0, 2, 4]]


def test_reduce_skips_empty_per_column(spark):
    """Empty (NULL) values are dropped from each column's stream
    INDEPENDENTLY — reference golden test_reduce.py:234-276: rows
    (1,2),(1,NULL),(1,3) reduce to sums (3, 5)."""
    df = spark.createDataFrame([(1, 2), (1, None), (1, 3)], "num1 long, num2 long")
    p = (
        Pipeline.input("num1", "num2")
        .reduce(("num1", "num2"), ("sum1", "sum2"),
                lambda a, b: (sum(a), sum(b)),
                out_types=[T.LongType(), T.LongType()])
        .output("sum1", "sum2")
    )
    rows = p.apply(df).collect()
    assert [(r.sum1, r.sum2) for r in rows] == [(3, 5)]


def test_concat_updated_schema_precedence(spark):
    """Conflicting writes resolve to the LATER-listed pipeline; untouched
    columns keep fork values — reference goldens
    test_user_pipeline.py:156-194 (updated_schema1/2, multi_schema)."""
    p0 = Pipeline.input("a", "b", "c")
    p1 = p0.map("a", "a", lambda x: x + 10)
    p2 = p0.map(("b", "c"), "b", lambda x, y: x - y)

    got = p1.concat(p2).output("a", "b", "c").run_rows(spark, [(1, 2, 3)])
    assert got == [(1, -1, 3)]           # p2 wins: its 'a' is the fork value
    got = p2.concat(p1).output("a", "b", "c").run_rows(spark, [(1, 2, 3)])
    assert got == [(11, 2, 3)]           # p1 wins: its 'b' is the fork value

    p1b = p0.map("a", "a", lambda x: x + 10)
    p2b = p0.map(("b", "c"), "a", lambda x, y: x - y)
    assert p2b.concat(p1b).output("a").run_rows(spark, [(1, 2, 3)]) == [(11,)]
    assert p1b.concat(p2b).output("a").run_rows(spark, [(1, 2, 3)]) == [(-1,)]


def test_concat_multi_pipe(spark):
    # test_user_pipeline.py:184-194
    p0 = Pipeline.input("a", "b", "c")
    p1 = p0.map("a", "d", lambda x: x + 10)
    p2 = p0.map(("b", "c"), "e", lambda x, y: x - y)
    p3 = p0.map(("b", "c"), "f", lambda x, y: x * y)
    got = p3.concat(p1, p2).output("d", "e", "f").run_rows(spark, [(1, 2, 3)])
    assert got == [(11, -1, 6)]


def test_concat_scalar_branch_zip(spark):
    """window_all scalar branch replicates against the stream branch —
    reference golden test_user_pipeline.py:288-303 (multi_types)."""
    def f(x):
        n = len(x)
        return n, n + 1, n + 2

    p2 = Pipeline.input("p").flat_map(
        "p", "fv", lambda x: list(x), out_types=[T.ArrayType(T.LongType())]
    )
    p3 = p2.map("fv", "t", lambda v: v[1]).time_window(
        ("fv",), ("e",), "t", 3, 3, lambda v: len(v), out_types=[T.LongType()]
    )
    p4 = p2.window_all("fv", ("l", "s", "v"), f,
                       out_types=[T.LongType(), T.LongType(), T.LongType()])
    pipe = p4.concat(p3).output("e", "l", "s", "v")
    data = [(i, i * 1000) for i in range(10) if i < 3 or i > 7]
    rows = pipe.run_rows(spark, [(data,)])
    assert rows == [(3, 5, 6, 7), (1, 5, 6, 7), (1, 5, 6, 7)]


def test_concat_raises(spark):
    p1 = Pipeline.input("a").map("a", "b", lambda x: x + 1)
    with pytest.raises(ValueError):
        p1.concat()
    with pytest.raises(ValueError):
        p1.concat("a")


def test_map_after_window_chain(spark):
    """map over a windowed column — reference golden
    test_user_pipeline.py:373-383: flat_map → window(3,3,sum) → map(*10)
    on input 4 yields [60, 40]."""
    p = (
        Pipeline.input("a")
        .flat_map("a", "a", lambda x: list(range(1, x + 1)), out_types=[T.LongType()])
        .window("a", "b", 3, 3, sum, out_types=[T.LongType()])
        .map("b", "a", lambda x: x * 10)
        .output("a")
    )
    assert p.run_rows(spark, [4]) == [(60,), (40,)]


def test_filter_rename_overwrites_existing_col_golden(spark):
    """ref test_user_pipeline.py:362-371 (test_filter_coverage): filter's
    out rename may OVERWRITE a live column — flat_map a→1..n, map a→b=a+1,
    filter(b→a, b>3) keeps b=4,5 emitted as 'a'."""
    p = (
        Pipeline.input("a")
        .flat_map("a", "a", lambda x: list(range(1, x + 1)), out_types=("bigint",))
        .map("a", "b", lambda x: x + 1, out_types=("bigint",))
        .filter("b", "a", "b", lambda x: x > 3)
        .output("a")
    )
    assert p.run_rows(spark, [(4,)]) == [(4,), (5,)]
    assert p.run_rows(spark, [(8,)]) == [(4,), (5,), (6,), (7,), (8,), (9,)]


def test_window_of_windows_golden(spark):
    """ref test_user_pipeline.py:406-415 (test_window_coverage): a window
    stream re-windowed — [1..4] → sums [6, 4] → one window → [10]."""
    p = (
        Pipeline.input("a")
        .flat_map("a", "a", lambda x: list(range(1, x + 1)), out_types=("bigint",))
        .window("a", "b", 3, 3, sum, out_types=("bigint",))
        .window("b", "a", 3, 3, sum, out_types=("bigint",))
        .output("a")
    )
    assert p.run_rows(spark, [(4,)]) == [(10,)]


def test_flat_map_after_window_golden(spark):
    """ref test_user_pipeline.py:433-443 (test_flatmap_coverage): fan-out
    over window outputs — sums [6, 4] → [60], [40]."""
    p = (
        Pipeline.input("a")
        .flat_map("a", "a", lambda x: list(range(1, x + 1)), out_types=("bigint",))
        .window("a", "b", 3, 3, sum, out_types=("bigint",))
        .flat_map("b", "a", lambda x: [x * 10], out_types=("bigint",))
        .output("a")
    )
    assert p.run_rows(spark, [(4,)]) == [(60,), (40,)]
