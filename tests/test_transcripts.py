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


# --------------------------------------------------------------------------
# round-5 curation ops: preference_pairs / truncate_context / tool_chains /
# canned_responses / self_repetition


@pytest.fixture(scope="module")
def pref(spark):
    rows = [
        # three convs answer the same prompt with different-length texts
        ("c1", 0, "user", "How do I X?", _ts(0)),
        ("c1", 1, "assistant", "long detailed answer", _ts(1)),
        ("c2", 0, "user", "How do I X?", _ts(2)),
        ("c2", 1, "assistant", "short", _ts(3)),
        ("c3", 0, "user", "How do I X?", _ts(4)),
        ("c3", 1, "assistant", "mid answer", _ts(5)),
        # singleton prompt group — no pair
        ("c4", 0, "user", "unique q", _ts(6)),
        ("c4", 1, "assistant", "resp", _ts(7)),
        # tie group (equal scores) — zero margin, dropped
        ("c5", 0, "user", "tie q", _ts(8)),
        ("c5", 1, "assistant", "aaaa", _ts(9)),
        ("c6", 0, "user", "tie q", _ts(10)),
        ("c6", 1, "assistant", "bbbb", _ts(11)),
        # assistant turn NOT preceded by user — never a candidate
        ("c7", 0, "system", "sys", _ts(12)),
        ("c7", 1, "assistant", "ignored", _ts(13)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "ts timestamp")
    return df.withColumn("sc", F.length("text").cast("int"))


def test_preference_pairs_hand_computed(pref):
    out = tr.preference_pairs(pref, "sc").collect()
    assert len(out) == 1
    p = out[0]
    assert p.prompt == "How do I X?"
    assert (p.chosen, p.chosen_score) == ("long detailed answer", 20)
    assert (p.rejected, p.rejected_score) == ("short", 5)
    assert (p.chosen_conv_id, p.chosen_turn_idx) == ("c1", 1)
    assert (p.rejected_conv_id, p.rejected_turn_idx) == ("c2", 1)
    assert p.n_candidates == 3


def test_preference_pairs_requires_score_col(pref):
    with pytest.raises(ValueError, match="score column"):
        tr.preference_pairs(pref.drop("sc"), "sc")


def test_truncate_context_hand_computed(conv):
    out = {(r.conv_id, r.turn_idx): r
           for r in tr.truncate_context(conv, budget=2).collect()}
    # conv a: each turn is 1 whitespace token; suffix of 2 fits
    assert [out[("a", i)].kept for i in range(4)] == [
        False, False, True, True]
    assert [out[("a", i)].cum_from_end for i in range(4)] == [4, 3, 2, 1]
    assert out[("b", 0)].kept is True
    kept = tr.truncate_context(conv, budget=2, keep_only=True)
    assert kept.count() == 3  # a2, a3, b0


def test_truncate_context_oversize_turn_drops_suffix(spark):
    rows = [("x", 0, "one two", _ts(0)), ("x", 1, "a b c d e", _ts(1))]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, ts timestamp")
    out = {r.turn_idx: r.kept
           for r in tr.truncate_context(df, budget=4).collect()}
    # newest turn alone exceeds the budget → nothing survives
    assert out == {0: False, 1: False}
    with pytest.raises(ValueError, match="budget"):
        tr.truncate_context(df, budget=-1)


def test_tool_chains_hand_computed(spark):
    rows = [
        ("t", 0, "user", None, _ts(0)),
        ("t", 1, "tool", "search", _ts(1)),
        ("t", 2, "tool", "fetch", _ts(2)),
        ("t", 3, "assistant", None, _ts(3)),
        ("t", 4, "tool", "search", _ts(4)),
        ("u", 0, "user", None, _ts(5)),  # conv with no tools → no rows
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string, "
              "ts timestamp")
    out = {(r.conv_id, r.first_turn_idx): r
           for r in tr.tool_chains(df).collect()}
    assert set(out) == {("t", 1), ("t", 4)}
    c = out[("t", 1)]
    assert (c.last_turn_idx, c.chain_len, c.n_tools) == (2, 2, 2)
    assert (c.first_tool, c.last_tool) == ("search", "fetch")
    d = out[("t", 4)]
    assert (d.last_turn_idx, d.chain_len, d.n_tools) == (4, 1, 1)
    assert (d.first_tool, d.last_tool) == ("search", "search")
    with pytest.raises(ValueError, match="order_extra"):
        tr.tool_chains(df, order_extra=())


def test_canned_responses_hand_computed(spark):
    rows = [
        ("c1", "assistant", "Sorry,  I can't help."),
        ("c2", "assistant", "sorry, i CAN'T help. "),
        ("c2", "assistant", "sorry, i can't help."),   # same conv again
        ("c3", "assistant", "unique reply"),
        ("c4", "user", "Sorry,  I can't help."),       # wrong role
    ]
    df = spark.createDataFrame(rows, "conv_id string, role string, text string")
    out = tr.canned_responses(df, min_keys=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r.response == "sorry, i can't help."
    assert (r.n_convs, r.n_uses) == (2, 3)


def test_self_repetition_hand_computed(spark):
    rows = [
        ("c1", "assistant", "a"), ("c1", "assistant", "b"),
        ("c1", "assistant", "a"), ("c1", "user", " A "),
        ("c2", "user", "solo"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, role string, text string")
    out = {r.conv_id: r for r in tr.self_repetition(df).collect()}
    c1 = out["c1"]
    assert (c1.n_turns, c1.n_distinct_texts, c1.n_repeats) == (4, 2, 2)
    assert c1.repeat_ratio == 0.5
    assert (out["c2"].n_repeats, out["c2"].repeat_ratio) == (0, 0.0)
    # role restriction drops the user turns
    only = {r.conv_id: r for r in tr.self_repetition(
        df, role_col="role", roles=["assistant"]).collect()}
    assert (only["c1"].n_turns, only["c1"].n_repeats) == (3, 1)
    assert "c2" not in only
    with pytest.raises(ValueError, match="role_col"):
        tr.self_repetition(df, roles=["assistant"])


# --------------------------------------------------------------------------
# conversation-granularity dedup: conv_fingerprint / conv_dedup_exact /
# conv_neardup_pairs


@pytest.fixture(scope="module")
def convdup(spark):
    rows = [
        # d1 and d2: identical (role, text) sequences, different timestamps
        ("d1", 0, "user", "Hi  there", _ts(0)),
        ("d1", 1, "assistant", "hello", _ts(1)),
        ("d2", 0, "user", "hi there", _ts(30)),
        ("d2", 1, "assistant", "HELLO ", _ts(31)),
        # d3: same turns as d1 but reordered → different fingerprint
        ("d3", 0, "assistant", "hello", _ts(40)),
        ("d3", 1, "user", "hi there", _ts(41)),
        # d4: three turns, shares 'hello'+'hi there' with d1's set
        ("d4", 0, "user", "hi there", _ts(50)),
        ("d4", 1, "assistant", "hello", _ts(51)),
        ("d4", 2, "user", "more stuff", _ts(52)),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "ts timestamp")


def test_conv_fingerprint_order_sensitive_ts_invariant(convdup):
    fp = {r.conv_id: r.fp for r in tr.conv_fingerprint(convdup).collect()}
    assert fp["d1"] == fp["d2"]        # normalization + ts-invariance
    assert fp["d1"] != fp["d3"]        # order matters
    assert fp["d1"] != fp["d4"]


def test_conv_dedup_exact_hand_computed(convdup):
    out = {r.fp: r for r in tr.conv_dedup_exact(convdup).collect()}
    assert len(out) == 3
    by_count = sorted((r.dup_count, r.conv_id) for r in out.values())
    assert by_count == [(1, "d3"), (1, "d4"), (2, "d1")]


def test_conv_neardup_exact_hand_computed(convdup):
    # turn SETS: d1=d2={hi there, hello}, d3 same set, d4 adds 'more stuff'
    out = {(r.id_a, r.id_b): r.jaccard
           for r in tr.conv_neardup_pairs(convdup, threshold=0.5).collect()}
    # d1,d2,d3 all share the identical 2-element set (J=1.0);
    # d4 vs each: 2/(2+3-2) = 2/3
    assert out[("d1", "d2")] == 1.0
    assert out[("d1", "d3")] == 1.0
    assert out[("d2", "d3")] == 1.0
    assert out[("d1", "d4")] == round(2 / 3, 6)
    assert len(out) == 6
    with pytest.raises(ValueError, match="method"):
        tr.conv_neardup_pairs(convdup, method="bogus")


def test_conv_neardup_freq_cap_drops_boilerplate(convdup):
    # 'hello' and 'hi there' occur in 4 conversations each; cap at 3
    # removes them from the index → no intersections survive
    out = tr.conv_neardup_pairs(convdup, threshold=0.1, max_turn_freq=3)
    assert out.count() == 0


def test_conv_neardup_lsh_equals_exact(spark):
    from towhee_spark import synth
    from towhee_spark.sources.tables import transcripts_from_events

    t = synth.transcripts_df(spark, n_convs=40)
    exact = {(r.id_a, r.id_b, r.jaccard) for r in
             tr.conv_neardup_pairs(t, threshold=0.05).collect()}
    lsh = {(r.id_a, r.id_b, r.jaccard) for r in
           tr.conv_neardup_pairs(t, threshold=0.05, method="lsh").collect()}
    assert exact, "synthetic corpus must produce at least one pair"
    assert lsh == exact


# --------------------------------------------------------------------------
# sft_curation preset + preference_length_bias


def test_sft_curation_stages_hand_computed(spark):
    from towhee_spark.pipelines import pipeline

    rows = [
        # e1 and e2: identical conversations → e2 deduped away
        ("e1", 0, "user", "q one", None, _ts(0)),
        ("e1", 1, "assistant", "good answer here", None, _ts(1)),
        ("e2", 0, "user", "q one", None, _ts(10)),
        ("e2", 1, "assistant", "good answer here", None, _ts(11)),
        # e3: completion below the 2-token floor
        ("e3", 0, "user", "q two", None, _ts(20)),
        ("e3", 1, "assistant", "ok", None, _ts(21)),
        # e4/e5: canned completion recurs in 2 distinct convs → dropped
        ("e4", 0, "user", "q three", None, _ts(30)),
        ("e4", 1, "assistant", "canned reply", None, _ts(31)),
        ("e5", 0, "user", "q four", None, _ts(40)),
        ("e5", 1, "assistant", "canned  REPLY", None, _ts(41)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    curate = pipeline("sft_curation", max_context_turns=4,
                      canned_min_convs=2, min_completion_tokens=2)
    out = curate(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.conv_id, r.turn_idx) == ("e1", 1)
    assert r.prompt == "user: q one"
    assert r.completion == "good answer here"
    assert r.example_id == "e1:1"
    assert r.split in {"train", "val", "test"}
    # with the canned filter off, e4/e5 examples survive
    loose = pipeline("sft_curation", min_completion_tokens=2)
    assert {x.conv_id for x in loose(df).collect()} == {"e1", "e4", "e5"}
    with pytest.raises(ValueError, match="order_extra"):
        pipeline("sft_curation", order_extra=())
    with pytest.raises(ValueError, match="split_on"):
        pipeline("sft_curation", split_on="rows")


def test_sft_curation_split_is_conversation_level(spark):
    from towhee_spark.pipelines import pipeline

    # one conv, many assistant turns → every example must share a split
    rows = []
    for i in range(12):
        rows.append(("g1", 2 * i, "user", f"q {i} {i}", None, _ts(i, 0)))
        rows.append(("g1", 2 * i + 1, "assistant", f"ans {i} {i}", None,
                     _ts(i, 30)))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    out = pipeline("sft_curation", min_completion_tokens=1,
                   split_weights={"train": 0.5, "val": 0.5})(df).collect()
    assert len(out) == 12
    assert len({r.split for r in out}) == 1
    # example-level mode on the same conv draws independent splits
    ex = pipeline("sft_curation", min_completion_tokens=1, split_on="example",
                  split_weights={"train": 0.5, "val": 0.5})(df).collect()
    assert len({r.split for r in ex}) == 2


def test_preference_length_bias_hand_computed(spark):
    rows = [("p1", "aaaa", "bb"), ("p2", "c", "ddd"), ("p3", "ee", "ff")]
    pairs = spark.createDataFrame(
        rows, "prompt string, chosen string, rejected string")
    r = tr.preference_length_bias(pairs).collect()[0]
    assert r.n_pairs == 3
    assert r.mean_chosen_len == round(7 / 3, 6)
    assert r.mean_rejected_len == round(7 / 3, 6)
    assert r.frac_chosen_longer == round(1 / 3, 6)
    assert r.frac_equal_len == round(1 / 3, 6)


def test_refusal_stats_hand_computed(spark):
    from towhee_spark.functions.text import is_refusal, refusal_hits

    rows = [
        ("r1", "assistant", "Sure, here you go"),
        ("r1", "assistant", "I'm sorry, I can't do that"),   # 2 markers
        ("r1", "assistant", "As an AI, I cannot comply"),
        ("r1", "user", "i cannot believe it"),               # wrong role
        ("r2", "assistant", "fine"),
        ("r3", "user", "no assistant turns here"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, role string, text string")
    out = {r.conv_id: r for r in tr.refusal_stats(df).collect()}
    r1 = out["r1"]
    assert (r1.n_responses, r1.n_refusals) == (3, 2)
    assert r1.refusal_ratio == round(2 / 3, 6)
    assert (out["r2"].n_refusals, out["r2"].refusal_ratio) == (0, 0.0)
    assert "r3" not in out   # zero response_role turns → no row
    # column fns: hit count and null safety
    probe = spark.createDataFrame(
        [("I'm Sorry... i can't",), (None,)], "t string").select(
        refusal_hits("t").alias("h"), is_refusal("t").alias("b")).collect()
    assert (probe[0].h, probe[0].b) == (2, True)
    assert (probe[1].h, probe[1].b) == (0, False)


def test_truncate_context_chunked_equals_plain(spark):
    from towhee_spark import synth

    t = synth.transcripts_df(spark, n_convs=25)
    plain = {(r.conv_id, r.turn_idx): (r.n_tokens, r.cum_from_end, r.kept)
             for r in tr.truncate_context(t, budget=40).collect()}
    for chunk in (60.0, 900.0):
        ch = {(r.conv_id, r.turn_idx): (r.n_tokens, r.cum_from_end, r.kept)
              for r in tr.truncate_context(
                  t, budget=40, chunk_seconds=chunk).collect()}
        assert ch == plain
    # the chunked plan must window on (key, chunk), never the bare key
    import re as _re
    plan = (tr.truncate_context(t, budget=40, chunk_seconds=60.0)
            ._jdf.queryExecution().executedPlan().toString())
    assert _re.search(r"hashpartitioning\(conv_id#\d+, __tc_ck", plan)
