"""conv_features / role_transitions: hand-computed profiles on a tiny
conversation, latency/session/role semantics, and the one-exchange plan."""
import datetime as dt
import re

import pytest
from pyspark.sql import functions as F

from towhee_spark.functions import transcripts as tr


def _ts(minute, second=0):
    return dt.datetime(2026, 1, 1, 9, minute, second)


@pytest.fixture(scope="module")
def conv(spark):
    rows = [
        # conv a: two sessions (40-min gap), one tool call, text lens 3/5/2/4
        ("a", 0, "user", "hi!", None, _ts(0)),
        ("a", 1, "assistant", "hello", None, _ts(0, 30)),
        ("a", 2, "user", "??", None, _ts(50)),          # new session
        ("a", 3, "assistant", "done", "search", _ts(51)),
        # conv b: single turn — no transitions, no responses
        ("b", 0, "user", "lonely", None, _ts(5)),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")


def test_conv_features_hand_computed(conv):
    out = {r.conv_id: r for r in tr.conv_features(conv, gap=1800.0).collect()}
    a = out["a"]
    assert (a.n_turns, a.n_sessions, a.n_tool_calls, a.n_tools) == (4, 2, 1, 1)
    assert a.duration_us == 51 * 60 * 1_000_000
    assert (a.n_turns_user, a.n_turns_assistant) == (2, 2)
    assert (a.n_turns_system, a.n_turns_tool) == (0, 0)
    assert a.total_chars == 3 + 5 + 2 + 4
    assert a.avg_turn_chars == round(14 / 4, 6)
    # responses: turn 1 (30 s after turn 0) and turn 3 (60 s after turn 2)
    assert a.n_responses == 2
    assert a.avg_response_latency_us == round(
        (30_000_000 + 60_000_000) / 2, 6)
    b = out["b"]
    assert (b.n_turns, b.n_sessions, b.n_responses) == (1, 1, 0)
    assert b.avg_response_latency_us is None
    assert b.duration_us == 0


def test_role_transitions_hand_computed(conv):
    corpus = {(r.from_role, r.to_role): r.n
              for r in tr.role_transitions(conv).collect()}
    # conv a only: u→a, a→u, u→a; conv b has no predecessor rows
    assert corpus == {("user", "assistant"): 2, ("assistant", "user"): 1}
    per = {(r.conv_id, r.from_role, r.to_role): r.n
           for r in tr.role_transitions(conv, per_key=True).collect()}
    assert per == {("a", "user", "assistant"): 2, ("a", "assistant", "user"): 1}


def test_conv_features_single_exchange_plan(conv):
    """sessionize's windows, the latency lag and the final aggregate all
    share the conv_id hash partitioning — Catalyst must plan ONE exchange
    (the flagship single-shuffle property)."""
    plan = tr.conv_features(conv)._jdf.queryExecution(
    ).executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "pythonUDF" not in plan  # all-native chain


def test_conv_features_ordering_uses_turn_idx_tiebreak(spark):
    """Equal-ts turns order by turn_idx: the lag that feeds latency must
    see turn 1 after turn 0 even when their timestamps collide."""
    rows = [("c", 1, "assistant", "x", None, _ts(0)),
            ("c", 0, "user", "y", None, _ts(0))]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    r = tr.conv_features(df).collect()[0]
    assert r.n_responses == 1 and r.avg_response_latency_us == 0.0


def test_sft_examples_hand_computed(conv):
    out = {(r.conv_id, r.turn_idx): r
           for r in tr.sft_examples(conv, max_context_turns=8).collect()}
    a1 = out[("a", 1)]
    assert a1.prompt == "user: hi!" and a1.completion == "hello"
    assert a1.n_context_turns == 1
    a3 = out[("a", 3)]
    assert a3.prompt == "user: hi!\nassistant: hello\nuser: ??"
    assert a3.completion == "done" and a3.n_context_turns == 3
    assert len(out) == 2  # conv b has no assistant turn


def test_sft_examples_context_cap_and_empty(spark):
    rows = [("c", i, "user" if i % 2 == 0 else "assistant", f"t{i}",
             None, _ts(i)) for i in range(6)]
    rows.insert(0, ("d", 0, "assistant", "opener", None, _ts(0)))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    out = {(r.conv_id, r.turn_idx): r
           for r in tr.sft_examples(df, max_context_turns=2).collect()}
    # turn 5 sees only turns 3 and 4 — the cap truncates the front
    assert out[("c", 5)].prompt == "assistant: t3\nuser: t4"
    assert out[("c", 5)].n_context_turns == 2
    # zero-context opener dropped by default, kept with include_empty
    assert ("d", 0) not in out
    kept = {(r.conv_id, r.turn_idx): r for r in tr.sft_examples(
        df, max_context_turns=2, include_empty=True).collect()}
    assert kept[("d", 0)].prompt == "" and kept[("d", 0)].n_context_turns == 0
    with pytest.raises(ValueError, match="max_context_turns"):
        tr.sft_examples(df, max_context_turns=0)
