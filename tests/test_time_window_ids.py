"""Pure-function goldens for the Towhee time-window buffer semantics.

Inputs/expected copied from the reference's own tests
(tests/unittests/runtime/test_time_window_node.py:31-96) and the doc
example (towhee/runtime/pipeline.py:430-443) — see FIXTURES.md §3.
"""

from towhee_spark.pipeline import towhee_time_window_ids


def windows_of(values, ts_ms, size, step):
    return [[values[i] for i in idxs] for idxs in towhee_time_window_ids(ts_ms, size, step)]


def test_dense_tumbling():
    ts = [i * 1000 for i in range(10)]
    vals = list(range(10))
    assert windows_of(vals, ts, 2, 2) == [[0, 1], [2, 3], [4, 5], [6, 7], [8, 9]]


def test_dense_sliding_overlap():
    ts = [i * 1000 for i in range(10)]
    vals = list(range(10))
    # size=3, step=2: starts 0,2,4,6,8
    assert windows_of(vals, ts, 3, 2) == [
        [0, 1, 2], [2, 3, 4], [4, 5, 6], [6, 7, 8], [8, 9]]


def test_step_gt_size():
    ts = [i * 1000 for i in range(10)]
    vals = list(range(10))
    # size=2, step=5: windows [0,2),[5,7)
    assert windows_of(vals, ts, 2, 5) == [[0, 1], [5, 6]]


def test_discontinuous_gap_realign():
    # reference test_time_window_node.py:74-96: i<3 or i>91, range 10 step 5
    idx = [i for i in range(100) if i < 3 or i > 91]
    ts = [i * 1000 for i in idx]
    got = windows_of(idx, ts, 10, 5)
    assert got == [[0, 1, 2], [92, 93, 94, 95, 96, 97, 98, 99],
                   [95, 96, 97, 98, 99]]


def test_doc_example_pipeline_py_430():
    rows = [(i, i + 1, i * 1000) for i in range(11) if i < 3 or i > 7]
    ts = [r[2] for r in rows]
    wins = towhee_time_window_ids(ts, 3, 3)
    sums = [(sum(rows[i][0] for i in w), sum(rows[i][1] for i in w)) for w in wins]
    assert sums == [(3, 6), (8, 9), (19, 21)]


def test_exhaustive_grid_vs_reference_sim():
    """Reference sweep (test_time_window_node.py:46-70 style): dense stream
    0..99s over a (size, step) grid — every window must cover exactly
    [k*step, k*step+size) ∩ [0, 100)."""
    ts = [i * 1000 for i in range(100)]
    for size in range(1, 12):
        for step in range(1, 12):
            got = towhee_time_window_ids(ts, size, step)
            expected = []
            k = 0
            while k * step < 100:
                w = [i for i in range(100) if k * step <= i < k * step + size]
                if w:
                    expected.append(w)
                k += 1
            assert got == expected, (size, step)


def test_chunked_exact_matches_buffer_model(spark):
    """The HOT-KEY chunked recurrence (per-(key, time-chunk) lag/max with a
    tiny cross-chunk carry) must reproduce the Towhee buffer model exactly —
    chunk boundaries chosen small so the carry path fires many times per
    stream."""
    import random

    from towhee_spark.pipeline import Pipeline, towhee_time_window_ids

    rng = random.Random(7)
    for trial in range(12):
        n = rng.randint(1, 40)
        ts = sorted(rng.randint(0, 50) * 1000 for _ in range(n))
        vals = list(range(len(ts)))
        size = rng.randint(1, 9)
        step = rng.randint(1, 11)
        chunk = rng.choice([2, 3, 7, 13])
        rows = [("k", v, t) for v, t in zip(vals, ts)]
        df = spark.createDataFrame(rows, "k string, v long, t long")
        p = (
            Pipeline.input("v")
            .time_window("v", "members", "t", size, step,
                         lambda v: sorted(v),
                         out_types=("array<bigint>",), exact=True,
                         emit_start="wstart", chunk_seconds=chunk)
            .output("k", "wstart", "members")
        )
        got = {
            (r.k, r.wstart): list(r.members)
            for r in p.apply(df, by="k").collect()
        }
        exp = {
            ("k", ws // 1000): sorted(vals[i] for i in idxs)
            for ws, idxs in towhee_time_window_ids(ts, size, step, with_starts=True)
        }
        assert got == exp, (ts, size, step, chunk, got, exp)


def test_chunked_exact_megakey_multitask(spark):
    """A planted mega-key (one conversation, 100k turns): the chunked plan
    must (a) window on (key, chunk) — no per-row window partitioned on the
    bare key, the single-task serialization hazard — and (b) agree with the
    unchunked exact path window-for-window."""
    from pyspark.sql import functions as F

    from towhee_spark.pipeline import Pipeline

    n = 100_000
    df = spark.range(n).select(
        F.lit("mega").alias("k"),
        F.col("id").alias("v"),
        # irregular spacing w/ gaps so realignment fires
        (F.col("id") * 1700 + (F.col("id") % 97) * 3000
         + F.when(F.col("id") % 1000 == 0, 900_000).otherwise(0)).alias("t"),
    )

    def mk(chunk):
        return (
            Pipeline.input("v")
            .time_window("v", ("cnt", "vsum"), "t", 3600, 1800,
                         lambda v: (F.count(v), F.sum(v)),
                         exact=True, emit_start="wstart",
                         chunk_seconds=chunk)
            .output("k", "wstart", "cnt", "vsum")
        )

    chunked = mk(3_600).apply(df, by="k")  # ~47 chunks over the 170k-s span
    plan = chunked._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line and "__ck" not in line and "__wstart" not in line:
            raise AssertionError(f"per-row window without chunk key:\n{line}")
    got = {(r.wstart): (r.cnt, r.vsum) for r in chunked.collect()}
    exp = {(r.wstart): (r.cnt, r.vsum) for r in mk(None).apply(df, by="k").collect()}
    assert got == exp
    assert len(got) > 80  # sanity: ~95 overlapping windows over the span


def test_chunked_count_window_matches_unchunked(spark):
    """COUNT-window hot-key path (chunked_row_number: per-chunk local
    row_number + prefix-sum carry) must equal the bare-key row_number plan
    window-for-window on a planted mega-key, with no per-row window
    partitioned on the key alone."""
    from pyspark.sql import functions as F

    from towhee_spark.pipeline import Pipeline

    n = 60_000
    df = spark.range(n).select(
        F.lit("mega").alias("k"),
        F.col("id").alias("v"),
        (F.col("id") * 37 % 1_000_003).alias("tiebreak"),
        (F.col("id") * 1000).alias("t"),  # ms, 0..60M → many 1h chunks
    )

    def mk(chunk):
        return (
            Pipeline.input("v")
            .window("v", ("cnt", "vsum"), size=7, step=3,
                    fn=lambda v: (F.count(v), F.sum(v)),
                    wid_col="wid", chunk_seconds=chunk)
            .output("k", "wid", "cnt", "vsum")
        )

    chunked = mk(3_600).apply(df, by="k", order=("t", "v"))
    plan = chunked._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if ("windowspecdefinition" in line and "__crn_ck" not in line
                and "__wid" not in line and "row_order" not in line.lower()):
            # the only remaining bare-key windows may be over the AGGREGATED
            # frame (one row per window/chunk), never the per-row frame
            assert "__cnt" in line or "__off" in line or "_w0" in line, line
    got = {r.wid: (r.cnt, r.vsum) for r in chunked.collect()}
    exp = {r.wid: (r.cnt, r.vsum)
           for r in mk(None).apply(df, by="k", order=("t", "v")).collect()}
    assert got == exp and len(got) == (n + 2) // 3


def test_native_exact_plan_matches_buffer_model(spark):
    """The compiled exact time_window (closed-form realign recurrence,
    fully native) must reproduce the Towhee buffer model's window contents
    on randomized sparse streams across a (size, step) grid."""
    import random

    from towhee_spark.pipeline import Pipeline, towhee_time_window_ids

    rng = random.Random(42)
    for trial in range(12):
        n = rng.randint(1, 40)
        ts = sorted(rng.randint(0, 50) * 1000 for _ in range(n))
        # unique-ify values so window contents are comparable as multisets
        vals = list(range(len(ts)))
        size = rng.randint(1, 9)
        step = rng.randint(1, 11)
        rows = [("k", v, t) for v, t in zip(vals, ts)]
        df = spark.createDataFrame(rows, "k string, v long, t long")
        p = (
            Pipeline.input("v")
            .time_window("v", "members", "t", size, step,
                         lambda v: sorted(v),
                         out_types=("array<bigint>",), exact=True,
                         emit_start="wstart")
            .output("k", "wstart", "members")
        )
        got = {
            (r.k, r.wstart): list(r.members)
            for r in p.apply(df, by="k").collect()
        }
        exp = {
            ("k", ws // 1000): sorted(vals[i] for i in idxs)
            for ws, idxs in towhee_time_window_ids(ts, size, step, with_starts=True)
        }
        assert got == exp, (ts, size, step, got, exp)
