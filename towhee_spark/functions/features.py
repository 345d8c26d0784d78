"""Classic tabular feature engineering: target encoding, the hashing
trick, and column scaling — the transforms a feature pipeline applies
between raw tables and model input.

The reference stops at "map a Python function over rows"
(towhee/runtime/nodes/_map.py:21 — any per-row transform is user code);
these make the three standard encoders first-class *distributed* plans:

1. **Target (mean) encoding** — replace a categorical value with the
   smoothed mean of a numeric label over that category, the classic
   high-cardinality encoder (Micci-Barreca, SIGKDD Explorations 2001).
   One hash aggregate over the category + a 1-row global aggregate +
   one join back; the leave-one-out variant subtracts the row's own
   label so a rare category can't leak its own target.
2. **Feature hashing** (Weinberger et al., ICML 2009) — project any set
   of categorical/numeric columns into a fixed-width sparse vector via
   a signed hash, with no vocabulary to train or broadcast. Pure
   column expressions + one (id, idx) hash aggregate.
3. **Scaling** — z-score / min-max per column, optionally per group.
   Fit is one hash aggregate; apply is a broadcast join + codegen
   projection.

Cross-engine float parity follows the repo's integer-freeze discipline
(CLAUDE.md): labels/values freeze to ``ROUND(x * 2^scale_bits)``
BIGINTs once, every aggregate is an EXACT integer (DECIMAL(38,0) sums
so 100-TB row counts don't overflow), and each output makes exactly ONE
float division — ``ROUND(CAST(num AS DOUBLE)/CAST(den AS DOUBLE), 6)``
— written with the same operand shape in the DuckDB oracles.

Scale notes (100 TB): target/scale stats frames are one row per
category/group (broadcast-sized unless the category is genuinely
high-cardinality, in which case the join-back is a plain shuffled
equi-join on the category — still one exchange); feature_hash's only
exchange is the (id, idx) aggregate, and its width B is a literal so
the scan projection stays in whole-stage codegen. Exact z-score sums
of squares stay within DECIMAL(38,0) for n·(x·2^20)² < 10^38 — about
1e10 rows at |x| ≤ 1e4; shard the fit by group beyond that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .curation import hash60

#: integer-freeze scale (kmeans_train convention, clustering.py)
SCALE_BITS = 20
_SCALE = 1 << SCALE_BITS
_DEC = "decimal(38,0)"


def _freeze(col: Column) -> Column:
    """ROUND(x * 2^20) as BIGINT — exact for the test corpus's 2-decimal
    values; one rounding, after which all math is integral."""
    return F.round(col.cast("double") * F.lit(_SCALE), 0).cast("long")


def _ratio6(num: Column, den: Column) -> Column:
    """The repo's one-float-division shape: exact integer numerator and
    denominator, cast to DOUBLE separately, divide once, ROUND 6."""
    return F.round(num.cast("double") / den.cast("double"), 6)


# ---------------------------------------------------------------------------
# target (mean) encoding
# ---------------------------------------------------------------------------


def target_stats(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    smoothing: int = 20,
) -> DataFrame:
    """Per-category smoothed-mean-target table ``(cat_col, n, te)``.

    te = (sum_c + m·global_mean) / (n_c + m), computed as the exact
    rational (sum_c·N + m·S) / ((n_c + m)·N·2^20) over frozen labels —
    both engines ROUND the same integer ratio, so the gate hash-matches.

    The global (N, S) row joins in via a broadcast 1-row cross join
    (the ranking.py stats-join convention): two aggregates, zero
    additional shuffles beyond the category hash agg.
    """
    m = _smoothing_int(smoothing)
    lf = _freeze(F.col(label_col))
    per_cat = (
        df.where(F.col(label_col).isNotNull())
        .groupBy(cat_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(lf.cast(_DEC)).alias("__s"),
        )
    )
    glob = (
        df.where(F.col(label_col).isNotNull())
        .agg(
            F.count(F.lit(1)).cast(_DEC).alias("__gn"),
            F.sum(lf.cast(_DEC)).alias("__gs"),
        )
    )
    j = per_cat.crossJoin(F.broadcast(glob))
    num = F.col("__s") * F.col("__gn") + F.lit(m) * F.col("__gs")
    den = (F.col("n") + F.lit(m)).cast(_DEC) * F.col("__gn") * F.lit(_SCALE)
    return j.select(cat_col, "n", _ratio6(num, den).alias("te"))


def target_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    smoothing: int = 20,
    out_col: str = "te",
    loo: bool = False,
) -> DataFrame:
    """Append the smoothed mean-target encoding of ``cat_col`` to ``df``.

    ``loo=True`` excludes the row's own label (leave-one-out — the
    standard anti-leakage variant for training folds):
    te_i = ((sum_c − y_i)·N + m·S) / ((n_c − 1 + m)·N·2^20), NULL when
    the denominator count hits zero (singleton category, m = 0). Rows
    with a NULL label get the plain (all-rows) encoding in both modes.

    Plan: category stats aggregate + 1-row global (broadcast) + one
    equi-join back on the category — the join is broadcast when the
    stats frame is small, a single shuffled exchange otherwise.
    """
    m = _smoothing_int(smoothing)
    stats = (
        df.where(F.col(label_col).isNotNull())
        .groupBy(cat_col)
        .agg(
            F.count(F.lit(1)).cast(_DEC).alias("__n"),
            F.sum(_freeze(F.col(label_col)).cast(_DEC)).alias("__s"),
        )
    )
    glob = (
        df.where(F.col(label_col).isNotNull())
        .agg(
            F.count(F.lit(1)).cast(_DEC).alias("__gn"),
            F.sum(_freeze(F.col(label_col)).cast(_DEC)).alias("__gs"),
        )
    )
    j = df.join(stats, on=cat_col, how="left").crossJoin(F.broadcast(glob))
    own = F.when(
        F.col(label_col).isNotNull() & F.lit(loo),
        _freeze(F.col(label_col)).cast(_DEC),
    ).otherwise(F.lit(0).cast(_DEC))
    own_n = F.when(
        F.col(label_col).isNotNull() & F.lit(loo), F.lit(1)
    ).otherwise(F.lit(0)).cast(_DEC)
    num = (F.coalesce(F.col("__s"), F.lit(0).cast(_DEC)) - own) * F.col("__gn") \
        + F.lit(m) * F.col("__gs")
    cnt = F.coalesce(F.col("__n"), F.lit(0).cast(_DEC)) - own_n + F.lit(m)
    den = cnt * F.col("__gn") * F.lit(_SCALE)
    te = F.when(cnt > 0, _ratio6(num, den))
    return j.withColumn(out_col, te).drop("__n", "__s", "__gn", "__gs")


def _smoothing_int(smoothing: int) -> int:
    if not isinstance(smoothing, int) or smoothing < 0:
        raise ValueError(
            f"target_encode: smoothing must be a non-negative int literal "
            f"(got {smoothing!r}) — integer smoothing keeps the encoded "
            f"ratio exact on both engines"
        )
    return smoothing


# ---------------------------------------------------------------------------
# feature hashing
# ---------------------------------------------------------------------------


def feature_hash(
    df: DataFrame,
    id_col: str,
    cols: list[str],
    n_features: int = 256,
    numeric: list[str] | None = None,
) -> DataFrame:
    """Hashing-trick sparse features: ``(id, idx, val)``, idx < n_features.

    Each non-NULL input value contributes sign·w at index
    ``(h DIV 2) % B`` with ``sign = 1 − 2·(h % 2)``, where
    h = hash60('col=' || value) — the repo's cross-engine md5 hash, so
    the oracle reproduces indexes and signs bit-for-bit. Categorical
    columns contribute weight 1; columns named in ``numeric`` contribute
    their value (frozen, summed exactly, one ROUND-6 division at the
    end). Same-index collisions within a row sum (the standard signed
    CBF estimator — signs make collisions mean-zero).

    Plan: a per-column STACK (inline union of column expressions via
    explode of a literal-shaped array — no real union of scans), then
    ONE (id, idx) hash aggregate. NULL values contribute nothing.
    """
    if n_features <= 0:
        raise ValueError("feature_hash: n_features must be positive")
    numeric = set(numeric or ())
    unknown = numeric - set(cols)
    if unknown:
        raise ValueError(f"feature_hash: numeric cols {sorted(unknown)} not in cols")
    entries = []
    for c in cols:
        h = hash60(F.concat(F.lit(c + "="), F.col(c).cast("string")))
        idx = F.shiftright(h, 1) % F.lit(n_features)
        sign = F.lit(1) - F.lit(2) * (h % F.lit(2))
        w = _freeze(F.col(c)) if c in numeric else F.lit(_SCALE).cast("long")
        entries.append(
            F.when(
                F.col(c).isNotNull(),
                F.struct(idx.alias("idx"), (sign * w).cast(_DEC).alias("wf")),
            )
        )
    e = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(*entries)).alias("f"),
    ).where(F.col("f").isNotNull())
    return (
        e.groupBy("id", F.col("f.idx").alias("idx"))
        .agg(F.sum("f.wf").alias("__w"))
        .select("id", "idx", _ratio6(F.col("__w"), F.lit(_SCALE)).alias("val"))
    )


# ---------------------------------------------------------------------------
# scaling
# ---------------------------------------------------------------------------


def scaler_stats(
    df: DataFrame,
    col: str,
    by: str | None = None,
) -> DataFrame:
    """Fit frame for ``scale``: one row per group (or one row total) with
    exact frozen aggregates: n, sum, sum of squares, min, max.

    Variance is the exact rational (n·Σx² − (Σx)²) / (n²·2^40) — all
    integer until the single ROUND-6 division; mean/std/min/max come out
    as ROUND-6 doubles so ``scale`` can treat them as literals.
    """
    xf = _freeze(F.col(col))
    keys = [by] if by else []
    g = (
        df.where(F.col(col).isNotNull())
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).cast(_DEC).alias("__n"),
            F.sum(xf.cast(_DEC)).alias("__s"),
            F.sum(xf.cast(_DEC) * xf).alias("__ss"),
            F.min(xf).alias("__mn"),
            F.max(xf).alias("__mx"),
        )
    )
    n, s, ss = F.col("__n"), F.col("__s"), F.col("__ss")
    var6 = _ratio6(
        n * ss - s * s,
        n * n * F.lit(_SCALE).cast(_DEC) * F.lit(_SCALE),
    )
    return g.select(
        *keys,
        n.cast("long").alias("n"),
        _ratio6(s, n * F.lit(_SCALE)).alias("mean"),
        F.round(F.sqrt(var6), 6).alias("std"),
        _ratio6(F.col("__mn"), F.lit(_SCALE)).alias("min"),
        _ratio6(F.col("__mx"), F.lit(_SCALE)).alias("max"),
    )


def scale(
    df: DataFrame,
    col: str,
    method: str = "zscore",
    by: str | None = None,
    out_col: str = "scaled",
    stats: DataFrame | None = None,
) -> DataFrame:
    """Append a scaled copy of ``col``: z-score ((x − mean)/std) or
    min-max ((x − min)/(max − min)), fit globally or per ``by`` group.

    Degenerate groups (std = 0 / max = min) scale to NULL rather than
    ±inf — the caller decides whether a constant feature is dropped or
    imputed. Pass a pre-fit ``stats`` frame (from :func:`scaler_stats`,
    e.g. train-split stats applied to a validation split) to skip the
    fit; otherwise stats are fit on ``df`` itself.

    The apply step is one equi-join (broadcast for the 1-row global
    fit) + a codegen projection; mean/std/min/max are already ROUND-6
    doubles, so both engines evaluate the identical double expression.
    """
    if method not in ("zscore", "minmax"):
        raise ValueError(f"scale: unknown method {method!r}")
    st = stats if stats is not None else scaler_stats(df, col, by=by)
    st = st.select(
        *( [by] if by else [] ),
        F.col("mean").alias("__mean"),
        F.col("std").alias("__std"),
        F.col("min").alias("__min"),
        F.col("max").alias("__max"),
    )
    j = df.join(st, on=by, how="left") if by else df.crossJoin(F.broadcast(st))
    x = F.col(col).cast("double")
    if method == "zscore":
        out = F.when(
            F.col("__std") > 0, F.round((x - F.col("__mean")) / F.col("__std"), 6)
        )
    else:
        rng = F.col("__max") - F.col("__min")
        out = F.when(rng > 0, F.round((x - F.col("__min")) / rng, 6))
    return j.withColumn(out_col, out).drop("__mean", "__std", "__min", "__max")
