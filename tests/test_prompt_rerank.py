"""Prompt assembly + rerank ops, and map null-skip parity."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from towhee_spark.functions import prompt, rerank
from towhee_spark.pipeline import Pipeline
from towhee_spark.schema import TRANSCRIPT_SCHEMA
from towhee_spark.synth import transcripts_pdf


def test_template_native(spark):
    df = spark.createDataFrame([("what is spark?", "a cluster engine")], "q string, a string")
    out = df.select(prompt.template("Q: {q}\nA: {a}", q="q", a="a").alias("p")).first()
    assert out.p == "Q: what is spark?\nA: a cluster engine"
    with pytest.raises(ValueError):
        prompt.template("{missing}", q="q")


def test_question_answer_messages(spark):
    df = spark.createDataFrame([("why?", "because")], "q string, ctx string")
    row = df.select(prompt.question_answer("q", context="ctx", system="be brief").alias("m")).first()
    msgs = row.m
    assert msgs[0].role == "system" and msgs[0].content == "be brief"
    assert msgs[1].role == "user" and "Context: because" in msgs[1].content


def test_conversation_prompt_ordering(spark):
    pdf = transcripts_pdf(5, seed=3)
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    out = {r.conv_id: r.prompt for r in prompt.conversation_prompt(df, max_turns=4).collect()}
    srt = pdf.sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
    for conv, g in srt.groupby("conv_id"):
        # max_turns keeps the LAST N turns (the recent context a
        # history-bearing prompt needs — review fix), still in time order
        lines = [f"{r.role}: {r.text or ''}" for r in g.itertuples()][-4:]
        assert out[conv] == "\n".join(lines)


def test_rerank_topk(spark):
    rows = [
        (1, "spark engine", "spark engine fast"),
        (1, "spark engine", "banana fruit salad"),
        (1, "spark engine", "spark engine"),
        (2, "hello world", "hello world"),
    ]
    df = spark.createDataFrame(rows, "query_id long, query string, doc string")
    out = rerank.rerank(df, k=2)
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r.query_id, []).append(r)
    q1 = sorted(by_q[1], key=lambda r: r.rank)
    assert q1[0].doc == "spark engine"          # identical text ranks first
    assert q1[0].score == pytest.approx(1.0, abs=1e-5)
    assert len(q1) == 2 and "banana" not in q1[1].doc
    assert by_q[2][0].score == pytest.approx(1.0, abs=1e-5)


def test_map_null_inputs_skip_fn(spark):
    """Rows with NULL inputs skip the fn and emit NULL (_map.py:58-59)."""
    calls = []

    def fn(x):
        if x is None:
            raise AssertionError("fn must not see missing inputs")
        return x.upper()

    p = Pipeline.input("t").map("t", "u", fn, out_types=[T.StringType()]).output("u")
    df = spark.createDataFrame([("a",), (None,), ("b",)], "t string")
    out = p.apply(df).collect()
    assert [r.u for r in out] == ["A", None, "B"]


def test_map_zero_output_passthrough(spark):
    p = Pipeline.input("t").map("t", (), lambda x: None).output("t")
    df = spark.createDataFrame([("a",), ("b",)], "t string")
    assert [r.t for r in p.apply(df).collect()] == ["a", "b"]
