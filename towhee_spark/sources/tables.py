"""Canonical derived tables over the driver test corpus.

The correctness gate compares Spark plans against DuckDB SQL on the same
parquet files, so the transcript/context tables are *derived* from the
``events`` table by a deterministic, SQL-expressible mapping — both engines
compute byte-identical inputs (BASELINE.json input_hint shape):

    conv_id  = 'conv-' || user_id
    turn_idx = row_number per user ordered by (ts, event_id) - 1
    role     = event_id % 4 → user/assistant/tool/system
    text     = event_type || ':' || props
    tool     = event_type when role = 'tool'
    ts       = event ts

The SQL strings below are the single source of truth for the oracle side;
the Spark builders mirror them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TRANSCRIPTS_SQL = """
SELECT
    'conv-' || CAST(user_id AS VARCHAR)             AS conv_id,
    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST) - 1
         AS INTEGER)                                AS turn_idx,
    CASE CAST(event_id % 4 AS INTEGER)
        WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
        WHEN 2 THEN 'tool' ELSE 'system' END        AS role,
    event_type || ':' || COALESCE(props, '')        AS text,
    CASE WHEN event_id % 4 = 2 THEN event_type END  AS tool,
    ts
FROM events
"""

# context: every 5th event becomes a point-in-time context row; de-duplicated
# to unique (conv_id, ts) so as-of tie-break is well-defined in both engines.
CONTEXT_SQL = """
SELECT conv_id, ts, ctx_score, ctx_label FROM (
    SELECT
        'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
        ts,
        value                               AS ctx_score,
        event_type                          AS ctx_label,
        row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id NULLS FIRST) AS rn
    FROM events
    WHERE event_id % 5 = 0
) WHERE rn = 1
"""


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def transcripts_from_events(events: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    role = (F.col("event_id") % 4).cast("int")
    return events.select(
        F.concat(F.lit("conv-"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.when(role == 0, "user")
        .when(role == 1, "assistant")
        .when(role == 2, "tool")
        .otherwise("system")
        .alias("role"),
        F.concat(F.col("event_type"), F.lit(":"), F.coalesce(F.col("props"), F.lit(""))).alias("text"),
        F.when(F.col("event_id") % 4 == 2, F.col("event_type")).alias("tool"),
        F.col("ts"),
    )


def context_from_events(events: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id", "ts").orderBy("event_id")
    return (
        events.filter(F.col("event_id") % 5 == 0)
        .select(
            F.concat(F.lit("conv-"), F.col("user_id").cast("string")).alias("conv_id"),
            F.col("ts"),
            F.col("value").alias("ctx_score"),
            F.col("event_type").alias("ctx_label"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
