"""Guards the oracle-parity invariant: the Spark builders in
sources/tables.py and the SQL strings they mirror must produce identical
tables (the whole correctness gate rests on this)."""

import duckdb
import pandas as pd
import pytest

from towhee_spark.sources.tables import (
    CONTEXT_SQL,
    TRANSCRIPTS_SQL,
    context_from_events,
    load_events,
    transcripts_from_events,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    return c


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
    return pdf.sort_values(sorted(pdf.columns), kind="mergesort").reset_index(drop=True)


def test_transcripts_derivation_matches_sql(spark, con):
    got = _canon(transcripts_from_events(load_events(spark, SF)).toPandas())
    exp = _canon(con.execute(TRANSCRIPTS_SQL).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_context_derivation_matches_sql(spark, con):
    got = _canon(context_from_events(load_events(spark, SF)).toPandas())
    exp = _canon(con.execute(CONTEXT_SQL).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_transcript_shape_matches_input_hint(spark):
    t = transcripts_from_events(load_events(spark, SF))
    assert [(f.name, f.dataType.simpleString()) for f in t.schema.fields] == [
        ("conv_id", "string"), ("turn_idx", "int"), ("role", "string"),
        ("text", "string"), ("tool", "string"),
        ("ts", t.schema["ts"].dataType.simpleString()),
    ]
    # contiguous unique turn_idx per conversation
    from pyspark.sql import functions as F

    chk = t.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("turn_idx").alias("d"),
        F.min("turn_idx").alias("lo"),
        F.max("turn_idx").alias("hi"),
    )
    bad = chk.filter(
        (F.col("n") != F.col("d")) | (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)
    ).count()
    assert bad == 0
