"""Property-based checks for the round-5 transcript curation ops: random
conversations vs independent Python references — tie, boundary and
degenerate-conversation cases fixed fixtures miss."""
import datetime as dt
import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from towhee_spark.functions import transcripts as tr

SETTINGS = dict(max_examples=8, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

_T0 = dt.datetime(2026, 1, 1)


def _norm(s):
    return re.sub(r"\s+", " ", (s or "").lower()).strip()


@st.composite
def convs(draw, texts=st.sampled_from(["a", "b b", "c c c", "", "a  A"])):
    n_convs = draw(st.integers(1, 5))
    rows = []
    for ci in range(n_convs):
        n = draw(st.integers(1, 8))
        for ti in range(n):
            rows.append((f"c{ci}", ti,
                         draw(st.sampled_from(["user", "assistant", "tool"])),
                         draw(texts),
                         _T0 + dt.timedelta(minutes=10 * ci + ti)))
    return rows


@given(convs(), st.integers(0, 8))
@settings(**SETTINGS)
def test_truncate_context_keeps_maximal_suffix(spark, rows, budget):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "ts timestamp")
    out = tr.truncate_context(df, budget=budget).collect()
    by = {}
    for r in out:
        by.setdefault(r.conv_id, []).append(r)
    for conv, rs in by.items():
        rs.sort(key=lambda r: r.turn_idx)
        toks = [len(r.text.split()) if r.text.strip() else 0 for r in rs]
        assert [r.n_tokens for r in rs] == toks
        kept = [r.kept for r in rs]
        # kept is a suffix: once True, stays True toward the end
        assert kept == sorted(kept)
        total = sum(t for t, k in zip(toks, kept) if k)
        assert total <= budget
        # maximality: the newest dropped turn would blow the budget
        dropped = [t for t, k in zip(toks, kept) if not k]
        if dropped:
            assert total + dropped[-1] > budget


@given(convs(texts=st.sampled_from(["x", "y y", "z z z", "w w w w"])),
       st.data())
@settings(**SETTINGS)
def test_preference_pairs_matches_python(spark, rows, data):
    scores = {(r[0], r[1]): data.draw(st.integers(0, 3), label="score")
              for r in rows}
    df = spark.createDataFrame(
        [(c, t, role, txt, ts, scores[(c, t)])
         for c, t, role, txt, ts in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "ts timestamp, sc int")
    got = {r.prompt: r for r in tr.preference_pairs(df, "sc").collect()}
    # independent reference: group assistant turns behind a user turn
    by_conv = {}
    for c, t, role, txt, ts in rows:
        by_conv.setdefault(c, []).append((t, role, txt))
    groups = {}
    for c, turns in by_conv.items():
        turns.sort()
        for (t0, r0, x0), (t1, r1, x1) in zip(turns, turns[1:]):
            if r1 == "assistant" and r0 == "user" and x0 is not None:
                groups.setdefault(x0, []).append(
                    (scores[(c, t1)], c, t1, x1))
    for prompt, cands in groups.items():
        fwd = sorted(cands, key=lambda v: (-v[0], v[1], v[2]))
        rev = sorted(cands, key=lambda v: (v[0],
                                           tuple(-ord(ch) for ch in v[1]),
                                           -v[2]))
        ch, rj = fwd[0], rev[0]
        if ch[0] > rj[0]:
            g = got.pop(prompt)
            assert (g.chosen_score, g.chosen_conv_id, g.chosen_turn_idx) == ch[:3]
            assert (g.rejected_score, g.rejected_conv_id,
                    g.rejected_turn_idx) == rj[:3]
            assert g.n_candidates == len(cands)
        else:
            assert prompt not in got
    assert not got


@given(convs())
@settings(**SETTINGS)
def test_self_repetition_matches_python(spark, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "ts timestamp")
    got = {r.conv_id: r for r in tr.self_repetition(df).collect()}
    by = {}
    for c, t, role, txt, ts in rows:
        by.setdefault(c, []).append(_norm(txt))
    for c, texts in by.items():
        r = got[c]
        assert r.n_turns == len(texts)
        assert r.n_distinct_texts == len(set(texts))
        assert r.n_repeats == len(texts) - len(set(texts))
        assert r.repeat_ratio == round(r.n_repeats / r.n_turns, 6)


@given(convs())
@settings(**SETTINGS)
def test_conv_fingerprint_ts_shift_invariant_order_sensitive(spark, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "ts timestamp")
    base = {r.conv_id: r.fp for r in tr.conv_fingerprint(df).collect()}
    # shifting every timestamp by a constant preserves order → same fps
    shifted = df.withColumn("ts", F.col("ts") + F.expr("INTERVAL 7 DAYS"))
    assert {r.conv_id: r.fp
            for r in tr.conv_fingerprint(shifted).collect()} == base
    # reversing turn order changes the fp whenever lines differ in order
    by = {}
    for c, t, role, txt, ts in rows:
        by.setdefault(c, []).append(f"{role}: {_norm(txt)}")
    rev = df.withColumn("turn_idx", -F.col("turn_idx")).withColumn(
        "ts", F.to_timestamp(F.lit("2026-01-01")))  # constant ts → order by turn_idx
    got_rev = {r.conv_id: r.fp for r in tr.conv_fingerprint(rev).collect()}
    fwd = df.withColumn("ts", F.to_timestamp(F.lit("2026-01-01")))
    got_fwd = {r.conv_id: r.fp for r in tr.conv_fingerprint(fwd).collect()}
    for c, lines in by.items():
        if lines == lines[::-1]:
            assert got_rev[c] == got_fwd[c]
        else:
            assert got_rev[c] != got_fwd[c]
