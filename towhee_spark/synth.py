"""Deterministic synthetic transcript corpus (FIXTURES.md §1-2).

Two generators, same schema:

* :func:`transcripts_pdf` / :func:`context_pdf` — seeded numpy, pandas
  output. Used by unit tests and the single-node oracle (bit-identical
  inputs on both sides of the parity check).
* :func:`transcripts_spark` — distributed generation from ``spark.range``
  using pure column arithmetic (splitmix-style integer hashing), no driver
  materialization; used at bench scale. Pure function of (seed, n_convs).

Both exercise Zipf-skewed conversation lengths (hot-key salting) and null
tools (LOCF target). Out-of-order (ts, turn_idx) pairs and empty texts are
exercised by the PANDAS generators only (the correctness side);
``transcripts_spark`` emits strictly monotone ts (cumsum of positive gaps)
and non-empty texts by construction — bench numbers measure the ordered
path, and the re-sort/empty-text edge cases are covered by the unit-test
corpora, not the bench corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ROLES = ("user", "assistant", "tool", "system")
TOOLS = ("search", "code", "browse", "db")
_VOCAB = [f"tok{i}" for i in range(500)]
EPOCH0 = pd.Timestamp("2026-01-01", tz=None)


def transcripts_pdf(n_convs: int = 50, seed: int = 42, mean_turns: int = 20) -> pd.DataFrame:
    """Seeded pandas transcript corpus matching TRANSCRIPT_SCHEMA."""
    rng = np.random.default_rng(seed)
    # Zipf-skewed turn counts: ~2% of conversations get ~50x the median.
    base = rng.poisson(mean_turns, n_convs).clip(min=2)
    hot = rng.random(n_convs) < 0.02
    n_turns = np.where(hot, base * 50, base)
    rows = []
    for ci in range(n_convs):
        conv = f"conv-{ci:06d}"
        start = rng.uniform(0, 30 * 86400)  # conversation start within 30 days
        gaps = np.exp(rng.normal(3.0, 2.0, n_turns[ci])).clip(1, 7200)  # 1s..2h
        ts = start + np.cumsum(gaps)
        for ti in range(int(n_turns[ci])):
            role = ROLES[ti % 4] if ti > 0 else ("system" if rng.random() < 0.3 else "user")
            ntok = int(rng.integers(1, 30))
            text = "" if rng.random() < 0.02 else " ".join(
                _VOCAB[int(rng.integers(0, len(_VOCAB)))] for _ in range(ntok)
            )
            tool = TOOLS[int(rng.integers(0, 4))] if role == "tool" else None
            rows.append((conv, ti, role, text, tool, ts[ti]))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    # 5% of conversations get out-of-order (ts, turn_idx): swap two turn ts.
    for ci in range(0, n_convs, 20):
        conv = f"conv-{ci:06d}"
        idx = pdf.index[pdf.conv_id == conv]
        if len(idx) >= 4:
            a, b = idx[1], idx[2]
            pdf.loc[a, "ts"], pdf.loc[b, "ts"] = pdf.loc[b, "ts"], pdf.loc[a, "ts"]
    # microsecond precision: Spark timestamps are µs; ns frames trip Arrow's
    # safe-cast check in createDataFrame (observed: non-Arrow fallback).
    pdf["ts"] = (EPOCH0 + pd.to_timedelta(pdf["ts"], unit="s")).astype("datetime64[us]")
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def context_pdf(transcripts: pd.DataFrame, seed: int = 43) -> pd.DataFrame:
    """Point-in-time context table interleaved with turn timestamps:
    exact-tie ts values (tie-break tests), later-than-any-turn values
    (forward/leakage tests), and 5% unmatched conv_ids (anti-join path)."""
    rng = np.random.default_rng(seed)
    rows = []
    for conv, g in transcripts.groupby("conv_id", sort=True):
        tmin, tmax = g.ts.min(), g.ts.max()
        span = max((tmax - tmin).total_seconds(), 60.0)
        n = max(2, len(g) // 4)
        offs = np.sort(rng.uniform(-0.1 * span, 1.2 * span, n))
        score = np.cumsum(rng.normal(0, 1, n))
        for i in range(n):
            t = tmin + pd.Timedelta(seconds=float(offs[i]))
            if rng.random() < 0.1:  # exact tie with a turn ts
                t = g.ts.iloc[int(rng.integers(0, len(g)))]
            rows.append((conv, t, float(score[i]), f"label{int(rng.integers(0, 5))}"))
    extra = [
        (f"conv-x{j:04d}", EPOCH0 + pd.Timedelta(seconds=float(j * 1000)), 0.0, "orphan")
        for j in range(max(1, len(rows) // 20))
    ]
    pdf = pd.DataFrame(rows + extra, columns=["conv_id", "ts", "ctx_score", "ctx_label"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    # unique (conv_id, ts) so asof tie-break is well-defined for oracles
    return pdf.drop_duplicates(["conv_id", "ts"]).reset_index(drop=True)


def transcripts_df(spark: SparkSession, n_convs: int = 50, seed: int = 42) -> DataFrame:
    from towhee_spark.schema import TRANSCRIPT_SCHEMA  # noqa: PLC0415

    return spark.createDataFrame(transcripts_pdf(n_convs, seed), schema=TRANSCRIPT_SCHEMA)


def context_df(spark: SparkSession, transcripts: pd.DataFrame, seed: int = 43) -> DataFrame:
    from towhee_spark.schema import CONTEXT_SCHEMA  # noqa: PLC0415

    return spark.createDataFrame(context_pdf(transcripts, seed), schema=CONTEXT_SCHEMA)


def transcripts_spark(
    spark: SparkSession,
    n_convs: int = 100_000,
    mean_turns: int = 20,
    seed: int = 42,
    hot_frac: float = 0.001,
    hot_mult: int = 500,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed transcript generator: pure column arithmetic over
    ``spark.range`` — scales to any corpus size with zero driver data.

    Turn counts are two-tier (hot conversations get ``hot_mult`` × mean);
    all pseudo-randomness is ``xxhash64(seed, id, tag)`` so the output is a
    pure function of the arguments (re-runnable for checkpoint tests).
    """
    def h(tag: str, *cols):
        return F.abs(F.xxhash64(F.lit(seed), F.lit(tag), *cols))

    convs = spark.range(0, n_convs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    convs = convs.withColumn(
        "n_turns",
        F.when(
            (h("hot", F.col("id")) % 1_000_000) < int(hot_frac * 1_000_000),
            F.lit(mean_turns * hot_mult),
        ).otherwise((h("nt", F.col("id")) % (2 * mean_turns - 2) + 2).cast("int")),
    ).withColumn("conv_start", (h("st", F.col("id")) % (30 * 86400)).cast("double"))
    turns = convs.select(
        F.col("id").alias("cid"),
        F.col("conv_start"),
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    gap = (h("gap", F.col("cid"), F.col("turn_idx")) % 7200 + 1).cast("double")
    ntok = (h("ntok", F.col("cid"), F.col("turn_idx")) % 29 + 1).cast("int")
    role = F.when(F.col("turn_idx") == 0, F.lit("user")).otherwise(
        F.element_at(F.array(*[F.lit(r) for r in ROLES]), (F.col("turn_idx") % 4) + 1)
    )
    out = (
        turns.withColumn(
            "ts_off", F.sum(gap).over(Window.partitionBy("cid").orderBy("turn_idx"))
        )
        .select(
            F.format_string("conv-%09d", F.col("cid")).alias("conv_id"),
            F.col("turn_idx").cast("int").alias("turn_idx"),
            role.alias("role"),
            F.concat(
                F.lit("tok"), (h("w0", F.col("cid"), F.col("turn_idx")) % 500).cast("string"),
                F.lit(" tok"), (h("w1", F.col("cid"), F.col("turn_idx")) % 500).cast("string"),
                F.lit(" n"), ntok.cast("string"),
            ).alias("text"),
            F.when(
                (F.col("turn_idx") % 4) == 2,
                F.element_at(
                    F.array(*[F.lit(t) for t in TOOLS]),
                    ((h("tool", F.col("cid"), F.col("turn_idx")) % 4) + 1).cast("int"),
                ),
            ).alias("tool"),
            F.timestamp_seconds(
                F.lit(EPOCH0.value // 10**9) + F.col("conv_start") + F.col("ts_off")
            ).alias("ts"),
        )
    )
    return out
