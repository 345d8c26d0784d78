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
    from towhee_spark.layout import fan_out  # noqa: PLC0415

    # depth md5 probes per value + the partial cell aggregate evaluate in
    # the scan stage — one task on a single-row-group corpus (fan_out note)
    return (
        fan_out(df).select(probes.alias("__p"), w.alias("__w"))
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


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) over the cross-engine md5 hash


def _hll_rank(h, p: int):
    """Register + rank split of a 60-bit hash: low ``p`` bits pick the
    register, the remaining W = 60 − p bits give rank = leading zeros + 1
    = W + 1 − bitlen(rem). bitlen via length(bin(x)) — bin() emits no
    leading zeros and bin(0) = '0' in BOTH Spark and DuckDB, so the
    formula is engine-identical (rem = 0 → rank W + 1)."""
    w = 60 - p
    rem = F.shiftright(h, p)
    rank = F.when(rem == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - F.length(F.bin(rem)))
    return (
        h.bitwiseAND(F.lit((1 << p) - 1)).cast("int").alias("reg"),
        rank.cast("int"),
    )


def hll_build(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    p: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """HyperLogLog sketch of ``count(DISTINCT value_col)`` per ``by``
    group, as (*by, reg:int, mx:int) rows — max leading-zero rank per
    register, ≤ 2^p rows per group, built by ONE map-side-combined hash
    aggregate (max is the ideal partial-agg: register rows collapse on
    the map side, so the shuffle moves ≤ 2^p rows per group per task
    regardless of corpus size).

    Mergeable like cms_build: sketches of two corpora (or two days)
    merge by :func:`hll_merge` — union + re-max — the property that lets
    profiling run incrementally at 100 TB without rescans. Unlike
    Spark's built-in approx_count_distinct / hll_sketch_agg (binary,
    engine-private), these registers are exact INTEGERS derived from the
    cross-engine md5 hash60 contract, so a SQL engine reproduces the
    sketch bit for bit (the gate) and any engine can merge or estimate
    it. NULL values are ignored (count(DISTINCT) semantics). Standard
    error of the estimate ≈ 1.04/√(2^p)."""
    if not 4 <= p <= 16:
        raise ValueError(f"hll_build: p must be in [4, 16], got {p}")
    from towhee_spark.functions.curation import hash60  # noqa: PLC0415

    keys = list(by)
    reg, rank = _hll_rank(hash60(F.col(value_col), salt), p)
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*keys, reg, rank.alias("__rk"))
        .groupBy(*keys, "reg")
        .agg(F.max("__rk").alias("mx"))
    )


def hll_merge(sketches: Sequence[DataFrame], by: Sequence[str] = ()) -> DataFrame:
    """Union HLL sketches built with the SAME (p, salt): max per
    (*by, reg). Estimating the merge == estimating the unioned corpora —
    HLL's defining property (register max commutes with set union)."""
    if not sketches:
        raise ValueError("hll_merge: need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*list(by), "reg").agg(F.max("mx").alias("mx"))


def hll_estimate(
    sketch: DataFrame,
    by: Sequence[str] = (),
    p: int = 8,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Distinct-count estimate from a :func:`hll_build` sketch: the
    bias-corrected harmonic mean α_m·m²/Σ2^(−M_j) with the small-range
    linear-counting correction (m·ln(m/V) when the raw estimate ≤ 2.5m
    and V empty registers remain). Registers absent from the frame are
    empty (contribute 2^0 each). One k-register aggregate per group; the
    float harmonic sum is order-dependent at the 1e-16 level, so the
    estimate column is engine-side only — the gated artifact is the
    integer register table (the kmeans freeze-discipline split)."""
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    keys = list(by)
    g = sketch.groupBy(*keys).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("__s"),
        F.count(F.lit(1)).alias("__nz"),
    )
    v = F.lit(m) - F.col("__nz")
    raw = F.lit(alpha * m * m) / (F.col("__s") + v.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return g.select(*keys, F.round(est).cast("long").alias(out_col))


def hll_sliding(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    ts: str = "ts",
    bucket_seconds: float = 3600.0,
    window_buckets: int = 24,
    p: int = 8,
    salt: str = "hll",
    emit: str = "existing",
) -> DataFrame:
    """Sliding-window distinct-count sketches: for every (group, time
    bucket), the HLL registers of ``count(DISTINCT value_col)`` over the
    TRAILING ``window_buckets`` buckets — "distinct users in the last
    24 h, hourly" — computed WITHOUT rescanning the window per bucket.

    Mechanics: one per-bucket :func:`hll_build` (map-side-combined, ≤2^p
    rows per (group, bucket)), then each register row is exploded to the
    ≤ ``window_buckets`` target buckets whose trailing window covers it
    and re-maxed per (group, target bucket, reg) — register max commutes
    with set union, so the re-max IS the window merge. Work is
    O(sketch rows · window_buckets), independent of corpus size; no
    window function re-scans raw data. A naive per-(group,reg) sliding
    window over the sparse register rows would silently DROP carryover
    registers at buckets where that register saw no new value — the
    explode formulation keeps them.

    ``emit='existing'`` (default) keeps only target buckets where the
    group actually has events (sparse activity series, semi-join);
    ``emit='covered'`` keeps every bucket any trailing window covers
    (dense until sketches age out — no join).

    Output: (*by, bucket:long, reg:int, mx:int) — exact integers under
    the cross-engine md5 contract (gateable bit for bit, SQL-mergeable).
    Feed to :func:`hll_estimate` with ``by=(*by, 'bucket')`` for the
    float estimates (engine-side, the kmeans freeze split).
    """
    if window_buckets < 1:
        raise ValueError("hll_sliding: window_buckets must be >= 1")
    if emit not in ("existing", "covered"):
        raise ValueError(f"hll_sliding: bad emit {emit!r}")
    from towhee_spark.temporal import _chunk_id  # noqa: PLC0415

    keys = list(by)
    bucket = _chunk_id(ts, df.schema[ts].dataType, bucket_seconds)
    base = df.withColumn("__hb", bucket.cast("long"))
    sk = hll_build(base, value_col, by=[*keys, "__hb"], p=p, salt=salt)
    spread = (
        sk.select(
            *keys, "reg", "mx",
            F.explode(
                F.sequence(F.col("__hb"),
                           F.col("__hb") + F.lit(window_buckets - 1))
            ).alias("bucket"))
        .groupBy(*keys, "bucket", "reg")
        .agg(F.max("mx").alias("mx"))
    )
    if emit == "covered":
        return spread
    existing = base.select(*keys, F.col("__hb").alias("bucket")).distinct()
    return spread.join(existing, [*keys, "bucket"], "left_semi")
