"""Approximate sketch aggregations for 100 TB-scale profiling.

At the target scale, exact countDistinct / exact percentiles force full
shuffles of every distinct value; sketches (HyperLogLog++, Greenwald-
Khanna quantiles — both built into Spark, both mergeable map-side) answer
profiling queries in one pass with bounded memory. (Related: "Every Row
Counts: Combining Sketches and Sampling", CIDR 2019 — PAPERS.md.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_profile(
    df: DataFrame,
    group_by: Sequence[str],
    distinct_col: str,
    value_col: str,
    rsd: float = 0.02,
    quantiles: Sequence[float] = (0.5, 0.95),
) -> DataFrame:
    """Per-group profile: approximate distinct count (HLL++, relative std
    dev ``rsd``) + approximate quantiles of ``value_col`` + exact count."""
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(distinct_col, rsd=rsd).alias(f"approx_n_{distinct_col}"),
    ]
    for q in quantiles:
        aggs.append(
            F.percentile_approx(value_col, q).alias(f"p{int(round(q * 100))}_{value_col}")
        )
    return df.groupBy(*group_by).agg(*aggs)


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as (r:int, c:int,
    cnt:long) rows — ≤ depth·width cells, built by ONE map-side-combined
    hash aggregate over the exploded probe positions. Mergeable: sketches
    of two corpora merge by unioning rows and re-summing per (r, c), the
    property HLL/GK share and exact counts don't — build per-day sketches
    once, answer frequency queries over any day range without rescanning.
    Positions are ``pmod(hash60(salt||r||value), width)`` — the
    cross-engine md5 contract, so a SQL engine probes the identical
    cells. Estimates OVERcount only: est(v) ≥ true(v), and
    est(v) ≤ true(v) + e/width · N with prob ≥ 1 − (1/e)^depth."""
    from towhee_spark.functions.curation import hash60  # noqa: PLC0415

    if depth < 1 or width < 1:
        raise ValueError("cms_build: depth and width must be >= 1")
    w = F.col(weight_col) if weight_col else F.lit(1)
    c = F.col(value_col)
    probes = F.explode(F.array(*[
        F.struct(
            F.lit(r).alias("r"),
            F.pmod(hash60(c, f"{salt}{r}"), F.lit(width)).cast("int").alias("c"),
        )
        for r in range(depth)
    ]))
    return (
        df.select(probes.alias("__p"), w.alias("__w"))
        .groupBy(F.col("__p.r").alias("r"), F.col("__p.c").alias("c"))
        .agg(F.sum("__w").cast("long").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    values: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
    out_col: str = "est",
) -> DataFrame:
    """Point-query a count-min sketch per DISTINCT row of ``values``:
    est = MIN over the depth rows of the probed cell (a missing cell is
    0 — nothing ever hashed there). The final aggregate groups by all of
    ``values``' columns, so duplicate rows COLLAPSE to one output row
    (pass a distinct frame, or carry your own row id if you need
    per-occurrence annotation; map-typed columns are not groupable).
    The sketch is ≤ depth·width rows — always broadcast; cost ∝
    |values|·depth with no shuffle of the values side beyond the final
    per-value MIN aggregate. ``depth``, ``width`` and ``salt`` must
    match the build call (no metadata rides the sketch frame — it is
    just rows)."""
    from towhee_spark.functions.curation import hash60  # noqa: PLC0415

    clash = {"r", "c", "cnt"} & set(values.columns)
    if clash:  # loud, like kmeans_assign's cell guard — the join below
        # would silently resolve these against the sketch side
        raise ValueError(
            f"cms_estimate: values has sketch-reserved columns {sorted(clash)}"
            " — rename them first")
    v = F.col(value_col)
    probes = F.explode(F.array(*[
        F.struct(
            F.lit(r).alias("r"),
            F.pmod(hash60(v, f"{salt}{r}"), F.lit(width)).cast("int").alias("c"),
        )
        for r in range(depth)
    ]))
    cols = values.columns
    return (
        values.select(*cols, probes.alias("__p"))
        .join(
            F.broadcast(cms),
            (F.col("__p.r") == F.col("r")) & (F.col("__p.c") == F.col("c")),
            "left",
        )
        .groupBy(*cols)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias(out_col))
    )
