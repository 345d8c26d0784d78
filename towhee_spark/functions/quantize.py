"""Int8 embedding quantization — the storage/bandwidth lever for
100 TB vector columns (4× smaller scans than float32, 8× than the
double arrays the oracles use; the simple symmetric scheme every vector
store ships alongside PQ).

Scheme: per-vector symmetric scale mx = max(|x_j|); code
q_j = floor(x_j·127/mx + 0.5) ∈ [-127, 127]; dequantize x̂_j = q_j·mx/127.
Rounding is EXPLICIT floor(·+0.5) (round half toward +∞) — identical in
Spark, DuckDB and numpy, unlike ROUND (numpy rounds half-to-even, the
engines half-away-from-zero), so codes are bit-identical everywhere.
Reconstruction error ≤ mx/254 per component. An all-zero (or NULL)
vector gets scale 0 and NULL codes — dequantize returns NULL for it.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_embeddings(
    df: DataFrame,
    i_vec: str = "embedding",
    code_col: str = "q_codes",
    scale_col: str = "q_scale",
) -> DataFrame:
    """Add (code_col: array<int> in [-127,127], scale_col: double) next
    to the float vector. Pure Column math — one projection at the scan,
    no shuffle; drop the float column after writing to realize the 4×.
    The per-element transform is an interpreted HOF over dim elements —
    the same cost class as cosine_expr, fine for a write-once pass; keep
    hot per-batch math in Arrow kernels (CLAUDE.md HOF rule)."""
    for c in (code_col, scale_col):
        if c in df.columns:
            raise ValueError(
                f"quantize_embeddings: column {c!r} already exists — rename it")
    v = F.col(i_vec).cast("array<double>")
    # materialize mx into its OWN column first and reference the COLUMN
    # everywhere: embedding the array_max subtree in the codes lambda
    # would re-run the O(dim) max per element (the CLAUDE.md no-CSE
    # trap), and referencing it twice in the scale CASE (condition +
    # value) re-ran the O(dim) fold twice per row — as a multi-use
    # non-cheap alias CollapseProject keeps it materialized once
    mx_col = "__qz_mx"
    if mx_col in df.columns:
        raise ValueError(
            f"quantize_embeddings: column {mx_col!r} already exists — rename it")
    mx0 = F.array_max(F.transform(v, lambda x: F.abs(x)))
    mx = F.col(mx_col)
    with_scale = df.withColumn(mx_col, mx0).withColumn(
        scale_col,
        F.when(v.isNull(), F.lit(None).cast("double"))
        .when(mx > 0, mx).otherwise(F.lit(0.0)),
    ).drop(mx_col)
    sc = F.col(scale_col)
    codes = F.transform(
        v, lambda x: F.floor(x * F.lit(127.0) / sc + F.lit(0.5)).cast("int")
    )
    return with_scale.withColumn(
        code_col,
        F.when(v.isNotNull() & (sc > 0), codes)
        .otherwise(F.lit(None).cast("array<int>")),
    )


def dequantize_expr(codes: Column, scale: Column) -> Column:
    """x̂ = q·scale/127 as array<double> (NULL codes → NULL): the read
    side of the int8 layout, usable inside any scoring expression."""
    return F.transform(codes, lambda q: q * scale / F.lit(127.0))
