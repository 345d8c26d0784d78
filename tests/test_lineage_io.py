"""Checkpoint/lineage resumability + io layer."""

import json
import os

import pytest
from pyspark.sql import functions as F

from towhee_spark import lineage
from towhee_spark.schema import TRANSCRIPT_SCHEMA
from towhee_spark.sources import io
from towhee_spark.synth import transcripts_pdf


@pytest.fixture()
def corpus_df(spark):
    return spark.createDataFrame(transcripts_pdf(20, seed=7), schema=TRANSCRIPT_SCHEMA)


def test_write_resume_skips_completed(spark, corpus_df, tmp_path):
    base = str(tmp_path / "out")
    r1 = lineage.write_with_lineage(corpus_df, base, n_buckets=8, input_snapshot="s1")
    assert sorted(r1["written"]) == list(range(8))
    assert r1["skipped"] == []
    # simulate crash: delete three manifests → only those recompute
    for b in (1, 4, 6):
        os.remove(os.path.join(base, lineage.MANIFEST_DIR, f"bucket={b}.json"))
    r2 = lineage.write_with_lineage(corpus_df, base, n_buckets=8, input_snapshot="s1")
    assert sorted(r2["written"]) == [1, 4, 6]
    assert sorted(r2["skipped"]) == [0, 2, 3, 5, 7]
    # third run: everything committed → no work
    r3 = lineage.write_with_lineage(corpus_df, base, n_buckets=8, input_snapshot="s1")
    assert r3["written"] == []
    # data round-trips completely
    back = lineage.read_with_lineage(spark, base)
    assert back.count() == corpus_df.count()
    assert set(back.columns) == set(corpus_df.columns)


def test_lineage_verify_detects_tamper(spark, corpus_df, tmp_path):
    base = str(tmp_path / "out2")
    lineage.write_with_lineage(corpus_df, base, n_buckets=4, input_snapshot="s1")
    assert lineage.verify_lineage(corpus_df, base)
    # different input → checksum mismatch
    mutated = corpus_df.withColumn("text", F.concat(F.col("text"), F.lit("x")))
    assert not lineage.verify_lineage(mutated, base)


def test_manifest_contents(spark, corpus_df, tmp_path):
    base = str(tmp_path / "out3")
    lineage.write_with_lineage(corpus_df, base, n_buckets=4, input_snapshot="snap-42")
    with open(os.path.join(base, lineage.MANIFEST_DIR, "bucket=0.json")) as f:
        m = json.load(f)
    assert m["input_snapshot"] == "snap-42"
    assert m["rows"] >= 0 and "checksum" in m and m["n_buckets"] == 4


def test_io_parquet_roundtrip(spark, corpus_df, tmp_path):
    loc = str(tmp_path / "tbl")
    io.write_table(corpus_df, loc)
    back = io.read_table(spark, loc)
    assert back.count() == corpus_df.count()
    assert not io.iceberg_available(spark)  # sandbox: parquet fallback active


def test_read_glob(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"f{i}.txt").write_text(f"line{i}")
    (tmp_path / "skip.dat").write_text("nope")
    df = io.read_glob(spark, str(tmp_path), pattern="*.txt")
    assert df.count() == 3
    dfb = io.read_glob(spark, str(tmp_path), pattern="*.txt", binary=True)
    assert set(dfb.columns) >= {"path", "content"}
