"""Towhee queue-artifact semantics behind compat=True — goldens lifted from
the reference's own unit tests (cited per case). Default (relational) mode
keeps its divergent behavior; both are asserted side by side."""

from towhee_spark.pipeline import Pipeline


def test_filter_side_by_retention_golden(spark):
    """ref test_user_pipeline.py:212-224 (test_multi_filter): the failing row
    survives with the renamed output Empty()."""
    base = (
        Pipeline.input("a", "b", "c")
        .map("c", "c", lambda x: x + 1)
        .filter("c", "d", ("a", "b"), lambda x, y: x > 10 and y > 5)
    )
    p = base.output("a", "b", "c", "d")
    rows = [(5, 6, 7), (15, 6, 7)]
    assert p.run_rows(spark, rows, compat=True) == [(5, 6, 8, None), (15, 6, 8, 8)]
    # default relational mode drops the failing row entirely (and does not
    # forward the consumed input name 'c')
    assert base.output("a", "b", "d").run_rows(spark, rows) == [(15, 6, 8)]


def test_filter_single_output_golden(spark):
    """ref test_user_pipeline.py:203-210 (test_filter): when output()
    references only the filter output, a failing invocation emits NOTHING
    (the all-Empty row is never zipped out) — in compat mode too."""
    p = (
        Pipeline.input("a")
        .filter("a", "b", "a", lambda x: x > 5)
        .output("b")
    )
    rows = [(5,), (7,)]
    assert p.run_rows(spark, rows, compat=True) == [(7,)]
    assert p.run_rows(spark, rows) == [(7,)]


def test_reduce_on_empty_stream_golden(spark):
    """ref test_user_pipeline.py:395-405 (test_reduce_coverage): reduce on a
    fully-filtered stream still calls fn on empty iterables → one row [[0]];
    window_all on the same stream emits nothing (:383-393)."""
    base = (
        Pipeline.input("a")
        .flat_map("a", "a", lambda x: list(range(1, x + 1)), out_types=("bigint",))
        .filter("a", "b", "a", lambda x: x > 100)
    )
    p_reduce = base.reduce("b", "a", sum, out_types=("bigint",)).output("a")
    p_wall = base.window_all("b", "a", sum, out_types=("bigint",)).output("a")
    assert p_reduce.run_rows(spark, [(4,)], compat=True) == [(0,)]
    assert p_wall.run_rows(spark, [(4,)], compat=True) == []
    # default: the group vanished, so neither emits
    assert p_reduce.run_rows(spark, [(4,)]) == []
    assert p_wall.run_rows(spark, [(4,)]) == []


def test_flat_map_empty_padding_golden(spark):
    """ref test_flat_map_node.py:278-318 (test_generator): the parent's side
    columns ride only the FIRST fan-out row; rows 2..N get Empty()."""
    p = (
        Pipeline.input("num")
        .flat_map(
            "num",
            ("res1", "res2"),
            lambda ns: ((n, n + 10) for n in ns),
            out_types=("bigint", "bigint"),
        )
        .output("num", "res1", "res2")
    )
    rows = p.run_rows(spark, [([1, 2],)], compat=True)
    assert rows == [([1, 2], 1, 11), (None, 2, 12)]
    # default replicates the parent value on every child row
    assert p.run_rows(spark, [([1, 2],)]) == [([1, 2], 1, 11), ([1, 2], 2, 12)]


def test_flat_map_padding_native_path(spark):
    """compat padding also applies on the native posexplode path."""
    from pyspark.sql import functions as F

    p = (
        Pipeline.input("doc", "text")
        .flat_map("text", "tok", lambda t: F.split(t, " "), native=True)
        .output("doc", "tok")
    )
    rows = p.run_rows(spark, [("d1", "x y")], compat=True)
    assert rows == [("d1", "x"), (None, "y")]


def test_concat_two_fanout_branches_zip(spark):
    """2+ cardinality-changing concat branches zip positionally with NULL
    padding for the exhausted branch; each column owned by the LAST branch
    carrying it (ref _concat.py:34-66 get_dict-per-queue merge)."""
    base = Pipeline.input("a")
    b1 = base.flat_map("a", "x", lambda v: list(range(v)), out_types=("bigint",))
    b2 = base.flat_map("a", "y", lambda v: [v * 10] * (v + 1), out_types=("bigint",))
    p = b1.concat(b2).output("x", "y")
    rows = p.run_rows(spark, [(2,)])
    assert rows == [(0, 20), (1, 20), (None, 20)]


def test_concat_map_and_fanout_branch_zip(spark):
    """A per-row map branch zips as a length-1 queue against a fan-out
    sibling: its value pairs with the first child only."""
    base = Pipeline.input("a")
    b1 = base.map("a", "m", lambda v: v * 100, out_types=("bigint",), native=False)
    b2 = base.flat_map("a", "y", lambda v: [v, v + 1], out_types=("bigint",))
    p = b1.concat(b2).output("m", "y")
    rows = p.run_rows(spark, [(3,)])
    assert rows == [(300, 3), (None, 4)]


def test_native_probe_semantics_guard(spark):
    """ADVICE fix: a Python fn that merely HAPPENS to compile on Columns
    (str*int → numeric multiply) must take the Arrow path and keep Python
    semantics; a genuinely numeric fn stays native (zero python evals)."""
    from towhee_spark.plans import plan_stats

    sdf = spark.createDataFrame([("ab",)], "s string")
    p = Pipeline.input("s").map("s", "d", lambda s: s * 2).output("d")
    assert p.apply(sdf).collect()[0][0] == "abab"

    ndf = spark.createDataFrame([(3,)], "x long")
    q = Pipeline.input("x").map("x", "y", lambda x: x + 1, out_types=("bigint",)).output("y")
    out = q.apply(ndf)
    assert plan_stats(out)["python_evals"] == 0
    assert out.collect()[0][0] == 4


def test_native_probe_negative_and_zero_samples(spark):
    """ADVICE fix (round 3): Python and Spark MOD agree on positives but
    diverge on negatives (Python (-7) % 5 == 3, Spark == -2), so a
    positive-only probe would silently bless the native compilation. The
    multi-sample probe (3, -7, 0) must route `v % 5` to the Python path and
    keep Python semantics on negative data."""
    from towhee_spark.plans import plan_stats

    ndf = spark.createDataFrame([(-7,), (7,), (0,)], "x long")
    p = Pipeline.input("x").map("x", "m", lambda v: v % 5,
                                out_types=("bigint",)).output("x", "m")
    out = p.apply(ndf)
    got = {r.x: r.m for r in out.collect()}
    assert got == {-7: 3, 7: 2, 0: 0}, got
    assert plan_stats(out)["python_evals"] > 0  # guard rejected the native plan

    # a fn that div-by-zero-raises on the zero probe must not be
    # misclassified as Column-only: remaining rows still discriminate
    q = Pipeline.input("x").map("x", "m", lambda v: (1 if v == 0 else v // abs(v)),
                                out_types=("bigint",)).output("x", "m")
    got2 = {r.x: r.m for r in q.apply(ndf).collect()}
    assert got2 == {-7: -1, 7: 1, 0: 1}

    # genuinely SQL-safe arithmetic still goes native (no false demotion)
    r_ = Pipeline.input("x").map("x", "y", lambda v: v * 2 + 1,
                                 out_types=("bigint",)).output("y")
    out3 = r_.apply(ndf)
    assert plan_stats(out3)["python_evals"] == 0
    assert sorted(r.y for r in out3.collect()) == [-13, 1, 15]


def test_native_probe_mixed_sign_multi_input(spark):
    """Code-review fix: a TWO-input fn diverging only on MIXED signs
    (a % b: Python (-7) % 5 == 3 vs Spark -2) must be demoted — the
    diagonal probe rows (3,3)/(-7,-7)/(0,0) all agree, so the probe must
    cover off-diagonal combinations."""
    from towhee_spark.plans import plan_stats

    df = spark.createDataFrame([(-7, 5), (3, -2), (7, 3)], "a long, b long")
    p = (Pipeline.input("a", "b")
         .map(("a", "b"), "m", lambda a, b: a % b, out_types=("bigint",))
         .output("a", "b", "m"))
    out = p.apply(df)
    got = {(r.a, r.b): r.m for r in out.collect()}
    assert got == {(-7, 5): 3, (3, -2): -1, (7, 3): 1}, got  # Python semantics
    assert plan_stats(out)["python_evals"] > 0

    # 4 numeric inputs (cartesian 81 > old cap of 32): the trap between
    # cols 0 and 3 must STILL be caught — rotated-diagonal sampling left
    # index-distance-3 column pairs in lockstep (review finding)
    df4 = spark.createDataFrame([(-7, 1, 1, 5), (9, 1, 1, 4)],
                                "a long, b long, c long, d long")
    p4 = (Pipeline.input("a", "b", "c", "d")
          .map(("a", "b", "c", "d"), "m", lambda a, b, c, d: a % d,
               out_types=("bigint",))
          .output("a", "m"))
    got4 = {r.a: r.m for r in p4.apply(df4).collect()}
    assert got4 == {-7: 3, 9: 1}, got4  # Python % semantics on negatives
