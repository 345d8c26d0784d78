"""Chat-corpus interchange: JSONL conversation ingest + SFT JSONL export.

The two ends of the transcript pipeline a real chat-data user needs:
``conversations_jsonl`` reads the common interchange layouts (OpenAI
fine-tune ``{"messages": [{role, content}]}`` and ShareGPT
``{"conversations": [{from, value}]}``) into the repo's transcripts
schema, and ``write_sft_jsonl`` ships a curated sft_examples /
sft_curation output back out as fine-tune-ready JSONL shards.

Reference anchor: towhee's data_loader surface (SURVEY.md §2.3) reads
documents; it has no conversation interchange — these follow the
transcripts schema from sources/tables.py so every transcript operator
(sft_examples, conv_dedup, preference_pairs, …) applies directly.

Scale notes: the reads use EXPLICIT schemas (no sampling/inference scan —
on 100 TB of JSONL an inference pass would read everything twice), one
posexplode, all-native column ops. The export is to_json over a struct
(field order = struct order, deterministic) written as text; shard count
is the caller's partitioning decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

_MSG = StructType([
    StructField("role", StringType()),
    StructField("content", StringType()),
    StructField("name", StringType()),
])
OPENAI_SCHEMA = StructType([
    StructField("id", StringType()),
    StructField("messages", ArrayType(_MSG)),
])

_SG_TURN = StructType([
    StructField("from", StringType()),
    StructField("value", StringType()),
])
SHAREGPT_SCHEMA = StructType([
    StructField("id", StringType()),
    StructField("conversations", ArrayType(_SG_TURN)),
])

# ShareGPT speaker tags → transcripts roles
_SHAREGPT_ROLES = {"human": "user", "gpt": "assistant",
                   "system": "system", "tool": "tool",
                   "function_call": "tool", "observation": "tool"}


def conversations_jsonl(
    spark: SparkSession,
    path: str,
    format: str = "openai",
) -> DataFrame:
    """Read a JSONL chat corpus into the transcripts schema
    (conv_id, turn_idx, role, text, tool, ts). ``format="openai"``
    expects ``{"id"?, "messages": [{"role", "content", "name"?}]}`` per
    line; ``format="sharegpt"`` expects ``{"id"?, "conversations":
    [{"from", "value"}]}`` (speaker tags mapped via the standard
    human/gpt correspondence; unknown tags pass through).

    Rows without an ``id`` get conv_id = md5 of the serialized message
    array — deterministic, and byte-identical conversations collide by
    construction (conv_dedup_exact would merge them anyway). ``tool`` is
    the message ``name`` when role = tool (openai) / the raw speaker tag
    (sharegpt). ``ts`` is NULL — interchange files carry no timestamps;
    turn order is positional (turn_idx), which every transcript operator
    falls back to (their sorts are (ts, turn_idx) with a constant ts).
    Temporal ops (asof_join, sessionize, …) need a real ts column.
    """
    if format == "openai":
        raw = spark.read.schema(OPENAI_SCHEMA).json(path)
        msgs = F.col("messages")
        conv_id = F.coalesce(F.col("id"), F.md5(F.to_json(msgs)))
        ex = raw.select(
            conv_id.alias("conv_id"),
            F.posexplode(msgs).alias("turn_idx", "m"),
        )
        role = F.col("m.role")
        return ex.select(
            "conv_id",
            F.col("turn_idx").cast("int"),
            role.alias("role"),
            F.col("m.content").alias("text"),
            F.when(role == "tool", F.col("m.name")).alias("tool"),
            F.lit(None).cast("timestamp").alias("ts"),
        )
    if format == "sharegpt":
        raw = spark.read.schema(SHAREGPT_SCHEMA).json(path)
        msgs = F.col("conversations")
        conv_id = F.coalesce(F.col("id"), F.md5(F.to_json(msgs)))
        ex = raw.select(
            conv_id.alias("conv_id"),
            F.posexplode(msgs).alias("turn_idx", "m"),
        )
        tag = F.col("m.from")
        role = tag
        for src, dst in _SHAREGPT_ROLES.items():
            role = F.when(tag == src, F.lit(dst)).otherwise(role)
        return ex.select(
            "conv_id",
            F.col("turn_idx").cast("int"),
            role.alias("role"),
            F.col("m.value").alias("text"),
            F.when(role == "tool", tag).alias("tool"),
            F.lit(None).cast("timestamp").alias("ts"),
        )
    raise ValueError(
        f"conversations_jsonl: unknown format {format!r} "
        "(expected 'openai' or 'sharegpt')")


def write_sft_jsonl(
    df: DataFrame,
    path: str,
    prompt_col: str = "prompt",
    completion_col: str = "completion",
    extra_cols: tuple[str, ...] = (),
    shards: int | None = None,
    mode: str = "error",
) -> None:
    """Write an SFT example frame as fine-tune JSONL: one
    ``{"prompt": ..., "completion": ..., <extra_cols>...}`` object per
    line (the OpenAI legacy fine-tune layout — the prompt/completion
    pairing sft_examples produces). ``shards`` repartitions round-robin
    for a target output file count (None keeps the input partitioning —
    at 100 TB, set it from the downstream trainer's reader parallelism,
    not from the shuffle width the plan happened to end on)."""
    cols = [F.col(prompt_col).alias("prompt"),
            F.col(completion_col).alias("completion"),
            *[F.col(c) for c in extra_cols]]
    out = df.select(F.to_json(F.struct(*cols)).alias("value"))
    if shards is not None:
        out = out.repartition(shards)
    out.write.mode(mode).text(path)
