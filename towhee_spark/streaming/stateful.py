"""Custom stateful streaming operators via ``applyInPandasWithState``.

The streaming analogue of the batch sessionizer that LABELS EVERY ROW
(F.session_window only yields per-session aggregates): per-conversation
state carries (last event time µs, session counter) across micro-batches,
so each arriving turn gets its session sequence incrementally — the shape
Towhee's stateful PyOperator (towhee/operator/base.py:240-252) would take
on an unbounded stream.

Contract: these sequential stateful ops assume per-key EVENT-TIME-ORDERED
arrival across micro-batches (within a batch they sort). Out-of-order
sources need an ordered ingestion layer (time-sliced files, Kafka keyed by
conversation with in-partition ordering) or a watermark-delayed sort stage
ahead of them.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_us", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


def stream_sessionize_rows(
    df: DataFrame,
    gap: float = 1800.0,
    key: str = "conv_id",
    ts: str = "ts",
    out_cols: tuple[str, ...] = ("conv_id", "turn_idx", "ts"),
    seq_col: str = "session_seq",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-row session labelling over a stream (or batch df in tests).

    Rows within each micro-batch are processed in (ts) order per key; the
    (last_us, seq) state persists across batches. Late rows beyond the
    watermark are dropped by the engine before reaching the operator."""
    gap_us = int(gap * 1_000_000)
    out_schema = T.StructType(
        [df.schema[c] for c in out_cols] + [T.StructField(seq_col, T.LongType())]
    )
    out_names = [f.name for f in out_schema.fields]

    def fn(key_tuple, batches: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            last_us, seq = state.get
        else:
            last_us, seq = None, 0
        from towhee_spark.temporal import pandas_epoch_us  # noqa: PLC0415

        for pdf in batches:
            pdf = pdf.sort_values(ts, kind="mergesort")
            if pd.api.types.is_datetime64_any_dtype(pdf[ts]):
                us = pandas_epoch_us(pdf[ts])  # unit-aware, not ns-assuming
            else:  # numeric ts column: values are already epoch-µs
                us = pdf[ts].astype("int64")
            seqs = []
            for t_us in us:
                if last_us is None or t_us - last_us > gap_us:
                    seq += 1
                last_us = int(t_us)
                seqs.append(seq)
            out = pdf[list(out_cols)].copy()
            out[seq_col] = seqs
            yield out[out_names]
        state.update((last_us, seq))

    src = df.withWatermark(ts, watermark) if df.isStreaming else df
    return src.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_locf_rows(
    df: DataFrame,
    cols: tuple[str, ...] = ("tool",),
    key: str = "conv_id",
    ts: str = "ts",
    out_cols: tuple[str, ...] = ("conv_id", "turn_idx", "ts"),
    suffix: str = "_ff",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming last-observation-carried-forward: per-key state carries the
    last non-null value of each ``cols`` across micro-batches, so every
    arriving row gets its backfilled features incrementally — the streaming
    face of temporal.locf (north_rule backfill on unbounded transcripts).

    State schema: one nullable string slot per filled column (values are
    carried in their string form; cast downstream if needed)."""
    state_schema = T.StructType(
        [T.StructField(f"last_{c}", T.StringType()) for c in cols]
    )
    out_schema = T.StructType(
        [df.schema[c] for c in out_cols]
        + [T.StructField(f"{c}{suffix}", T.StringType()) for c in cols]
    )
    out_names = [f.name for f in out_schema.fields]

    def fn(key_tuple, batches: Iterator[pd.DataFrame], state: GroupState):
        last = list(state.get) if state.exists else [None] * len(cols)
        for pdf in batches:
            pdf = pdf.sort_values(ts, kind="mergesort")
            filled: dict[str, list] = {f"{c}{suffix}": [] for c in cols}
            for _, row in pdf.iterrows():
                for i, c in enumerate(cols):
                    v = row[c]
                    if v is not None and v == v:  # non-null, non-NaN
                        last[i] = str(v)
                    filled[f"{c}{suffix}"].append(last[i])
            out = pdf[list(out_cols)].copy()
            for name, vals in filled.items():
                out[name] = vals
            yield out[out_names]
        state.update(tuple(last))

    src = df.withWatermark(ts, watermark) if df.isStreaming else df
    return src.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
