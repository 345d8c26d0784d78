"""Conversation-level feature vectors over transcript tables.

The temporal core (towhee_spark/temporal.py) produces PER-TURN features
under the strict as-of/no-leakage contract; a training-data pipeline also
needs WHOLE-CONVERSATION profiles — the per-conv feature vector that
feeds curation (filter degenerate conversations), mixture design (strata
by interaction shape), and data cards. These are deliberately
leakage-irrelevant: each row summarizes a finished conversation, never a
turn-in-progress (contrast temporal.asof_join, which must not read the
future).

The reference's closest surface is DataCollection-over-rows aggregation
(towhee/runtime/data_queue.py drains whole queues); it has no
conversation analytics — these follow the repo's transcripts schema
(conv_id, turn_idx, role, text, tool, ts) from sources/tables.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from towhee_spark.temporal import epoch_us, sessionize


def conv_features(
    df: DataFrame,
    gap: float = 1800.0,
    key: str = "conv_id",
    ts: str = "ts",
    order_extra: Sequence[str] = ("turn_idx",),
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    roles: Sequence[str] = ("user", "assistant", "system", "tool"),
    response_role: str = "assistant",
) -> DataFrame:
    """One feature row per conversation: turn/session/tool counts, span,
    per-role turn counts, text volume, and ``response_role`` latency —
    the conversation-shape profile that drives curation filters (drop
    single-turn or zero-assistant convs), mixture strata, and data cards.

    Columns: (key, n_turns, n_sessions, duration_us, n_tool_calls,
    n_tools, n_turns_<role>..., total_chars, avg_turn_chars, n_responses,
    avg_response_latency_us). Latency for a ``response_role`` turn is
    ts − previous turn's ts (any role) in exact epoch-µs integers; the
    conversation's first turn has no predecessor and never counts as a
    response. Averages are ONE IEEE division of an exact integer sum,
    ROUND(·, 6) — bit-identical across engines (the kmeans freeze
    posture); a conv with zero responses gets NULL latency.

    Plan shape: sessionize's lag/run-sum windows and the latency lag
    share the (key) hash partitioning, so Catalyst plans ONE exchange for
    the whole chain (the flagship single-shuffle property), then one hash
    aggregate. Scale: conversations are bounded (10²–10⁴ turns), so the
    per-key window is safe; a degenerate mega-conversation would hotspot
    any whole-conv profile by definition — curate it out first
    (temporal's chunked family covers the per-turn ops that must still
    run on it)."""
    s = sessionize(df, gap=gap, key=key, ts=ts, order_extra=order_extra,
                   out="__sid", seq_out="__sess")
    w = Window.partitionBy(key).orderBy(ts, *order_extra)
    lat = epoch_us(ts) - F.lag(epoch_us(ts)).over(w)
    s = s.withColumn("__lat", lat)
    is_resp = (F.col(role_col) == response_role) & F.col("__lat").isNotNull()
    n_resp = F.sum(is_resp.cast("int")).alias("n_responses")
    resp_sum = F.sum(F.when(is_resp, F.col("__lat")))
    n = F.count(F.lit(1))
    chars = F.sum(F.length(text_col))
    aggs = [
        n.alias("n_turns"),
        F.max("__sess").alias("n_sessions"),
        (F.max(epoch_us(ts)) - F.min(epoch_us(ts))).alias("duration_us"),
        F.count(tool_col).alias("n_tool_calls"),
        F.countDistinct(tool_col).alias("n_tools"),
        *[F.sum((F.col(role_col) == r).cast("int")).cast("long")
          .alias(f"n_turns_{r}") for r in roles],
        chars.cast("long").alias("total_chars"),
        F.round(chars.cast("double") / n, 6).alias("avg_turn_chars"),
        n_resp,
    ]
    g = s.groupBy(key).agg(*aggs,
                           F.round(resp_sum.cast("double")
                                   / F.sum(is_resp.cast("int")), 6)
                           .alias("avg_response_latency_us"))
    return g


def role_transitions(
    df: DataFrame,
    key: str = "conv_id",
    ts: str = "ts",
    order_extra: Sequence[str] = ("turn_idx",),
    role_col: str = "role",
    per_key: bool = False,
) -> DataFrame:
    """Consecutive-turn role bigram counts — the conversation-dynamics
    fingerprint (user→assistant dominance, tool-loop density, system
    interleave): (from_role, to_role, n), or per conversation with
    ``per_key=True``. The first turn of each conversation has no
    predecessor and contributes nothing. One lag window (per-conv, the
    bounded-key argument in :func:`conv_features`) + one hash aggregate;
    corpus-wide output is ≤ |roles|² rows."""
    w = Window.partitionBy(key).orderBy(ts, *order_extra)
    base = df.select(
        F.col(key),
        F.lag(role_col).over(w).alias("from_role"),
        F.col(role_col).alias("to_role"),
    ).where(F.col("from_role").isNotNull())
    keys = ([key] if per_key else []) + ["from_role", "to_role"]
    return base.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))


def sft_examples(
    df: DataFrame,
    max_context_turns: int = 8,
    key: str = "conv_id",
    ts: str = "ts",
    order_extra: Sequence[str] = ("turn_idx",),
    role_col: str = "role",
    text_col: str = "text",
    response_role: str = "assistant",
    sep: str = "\n",
    include_empty: bool = False,
) -> DataFrame:
    """Turn transcripts into supervised fine-tuning pairs: every
    ``response_role`` turn becomes one example whose ``prompt`` is the
    previous ≤ ``max_context_turns`` turns rendered as ``role: text``
    lines (joined by ``sep``) and whose ``completion`` is the turn's own
    text. Output: (key, *order_extra, prompt, completion,
    n_context_turns) — the conversation→example exploder every
    chat-model data pipeline needs (the OpenAI/ShareGPT layout, one row
    per assistant message with a sliding context window).

    The context is a bounded window frame (ROWS BETWEEN k PRECEDING AND
    1 PRECEDING) over the deterministic (ts, *order_extra) total order —
    frame membership and in-frame order both derive from that one sort,
    so the rendered prompt is engine-stable (DuckDB's windowed list()
    and Spark's windowed collect_list both emit frame order; verified in
    the gate). NULL texts render as '' rather than nulling the whole
    line. ``include_empty=False`` (default) drops zero-context examples
    (a conversation-opening assistant turn has nothing to condition on).

    One window + one projection — no shuffle beyond the conv
    partitioning, no Python; the per-conv bounded-key argument from
    :func:`conv_features` applies. Pair with curation.hash_split for
    train/val and packing for the token stream."""
    if max_context_turns < 1:
        raise ValueError("sft_examples: max_context_turns must be >= 1")
    line = F.concat(F.col(role_col), F.lit(": "),
                    F.coalesce(F.col(text_col), F.lit("")))
    w = (Window.partitionBy(key).orderBy(ts, *order_extra)
         .rowsBetween(-max_context_turns, -1))
    out = (
        df.withColumn("__ctx", F.collect_list(line).over(w))
        .where(F.col(role_col) == response_role)
        .select(
            key, *order_extra,
            F.array_join("__ctx", sep).alias("prompt"),
            F.coalesce(F.col(text_col), F.lit("")).alias("completion"),
            F.size("__ctx").alias("n_context_turns"),
        )
    )
    if not include_empty:
        out = out.where(F.col("n_context_turns") > 0)
    return out
