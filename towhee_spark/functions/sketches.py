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
