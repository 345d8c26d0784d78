"""conversations_jsonl ingest (openai + sharegpt layouts) and
write_sft_jsonl export: schema, role mapping, id derivation, round-trip."""
import json
import os

import pytest
from pyspark.sql import functions as F

from towhee_spark.sources import conversations as cv


@pytest.fixture(scope="module")
def openai_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("oai") / "convs.jsonl"
    rows = [
        {"id": "c1", "messages": [
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "hello"},
            {"role": "tool", "content": "{}", "name": "search"},
        ]},
        {"messages": [{"role": "user", "content": "anon"}]},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    return str(p)


def test_openai_ingest(spark, openai_file):
    out = cv.conversations_jsonl(spark, openai_file, format="openai")
    assert out.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    rows = {(r.conv_id, r.turn_idx): r for r in out.collect()}
    assert rows[("c1", 0)].role == "user"
    assert rows[("c1", 1)].text == "hello"
    assert rows[("c1", 2)].tool == "search"
    assert rows[("c1", 0)].tool is None
    # anonymous conversation gets a deterministic md5 conv_id
    anon = [r for r in rows.values() if r.conv_id != "c1"]
    assert len(anon) == 1 and len(anon[0].conv_id) == 32
    again = cv.conversations_jsonl(spark, openai_file).collect()
    assert {r.conv_id for r in again} == {r.conv_id for r in rows.values()}


def test_sharegpt_ingest(spark, tmp_path):
    p = tmp_path / "sg.jsonl"
    p.write_text(json.dumps({"id": "s1", "conversations": [
        {"from": "human", "value": "q"},
        {"from": "gpt", "value": "a"},
        {"from": "observation", "value": "{}"},
        {"from": "weird", "value": "x"},
    ]}))
    rows = {r.turn_idx: r for r in cv.conversations_jsonl(
        spark, str(p), format="sharegpt").collect()}
    assert [rows[i].role for i in range(4)] == [
        "user", "assistant", "tool", "weird"]
    assert rows[2].tool == "observation"
    assert rows[3].tool is None
    with pytest.raises(ValueError, match="format"):
        cv.conversations_jsonl(spark, str(p), format="nope")


def test_ingested_transcripts_feed_sft_ops(spark, openai_file):
    # NULL-ts frames flow through the positional-order transcript ops
    from towhee_spark.functions import transcripts as tr

    t = cv.conversations_jsonl(spark, openai_file)
    ex = tr.sft_examples(t, max_context_turns=2).collect()
    assert len(ex) == 1
    assert ex[0].prompt == "user: hi"
    assert ex[0].completion == "hello"
    fp = tr.conv_fingerprint(t)
    assert fp.count() == 2


def test_write_sft_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("p1", "c1", "train"), ("p2", "c2", "val")],
        "prompt string, completion string, split string")
    out = str(tmp_path / "sft")
    cv.write_sft_jsonl(df, out, extra_cols=("split",), shards=2)
    files = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(files) == 2
    back = spark.read.json(out)
    got = {(r.prompt, r.completion, r.split) for r in back.collect()}
    assert got == {("p1", "c1", "train"), ("p2", "c2", "val")}
