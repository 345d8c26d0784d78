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


# ---------------------------------------------------------------------------
# weight-of-evidence encoding (binary-label categorical encoder)
# ---------------------------------------------------------------------------


def woe_stats(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    validate: bool = True,
) -> DataFrame:
    """Per-category weight of evidence over a BINARY 0/1 label:
    ``(cat_col, n, n_pos, woe, iv_term)`` — the credit-scoring /
    feature-selection encoder (Siddiqi, *Credit Risk Scorecards*).

    woe_c = ln( ((2·pos_c+1)·(2·NEG+1)) / ((2·neg_c+1)·(2·POS+1)) ) —
    the Laplace-half-count smoothed log-odds ratio (never ±inf on a pure
    category), written as ONE log of an exact integer ratio (the tfidf
    freeze rule: never ln(a)−ln(b) — operand shapes must match before
    ROUND), ROUND 6. iv_term = ROUND(((pos_c·NEG − neg_c·POS) /
    (POS·NEG)) · woe, 6); total information value = SUM(iv_term)
    (engine-side — the per-category rows are the gate surface; summing
    ROUND-6 doubles is order-dependent, so a cross-engine total would
    need the int-freeze trick the caller can apply if needed).

    Plan: one category hash aggregate + a 1-row global derived from the
    tiny stats frame itself + broadcast cross join — a single exchange
    regardless of corpus size. NULL labels are excluded; ``validate``
    weaves an ``assert_true(label IN (0,1))`` guard into the plan
    (action-free at build, loud at execution — the pool_embeddings
    convention).
    """
    lbl = F.col(label_col).cast("long")
    if validate:
        guard = F.assert_true(
            lbl.isin(0, 1),
            F.concat(
                F.lit(f"woe_stats: {label_col} must be a binary 0/1 "
                      f"label (got "), F.col(label_col).cast("string"),
                F.lit(") — derive it first, e.g. (x > t)::int")),
        )
        lbl = F.when(guard.isNull(), lbl)
    per_cat = (
        df.where(F.col(label_col).isNotNull())
        .groupBy(cat_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(lbl).alias("n_pos"),
        )
    )
    glob = per_cat.agg(
        F.sum("n").cast(_DEC).alias("__N"),
        F.sum("n_pos").cast(_DEC).alias("__P"),
    )
    j = per_cat.crossJoin(F.broadcast(glob))
    pos = F.col("n_pos").cast(_DEC)
    neg = (F.col("n") - F.col("n_pos")).cast(_DEC)
    gpos, gneg = F.col("__P"), F.col("__N") - F.col("__P")
    two = F.lit(2).cast(_DEC)
    one = F.lit(1).cast(_DEC)
    num = (two * pos + one) * (two * gneg + one)
    den = (two * neg + one) * (two * gpos + one)
    woe = F.round(F.log(num.cast("double") / den.cast("double")), 6)
    pq = (pos * gneg - neg * gpos).cast("double") / (gpos * gneg).cast("double")
    return j.select(
        cat_col,
        "n",
        "n_pos",
        woe.alias("woe"),
        F.round(pq * woe, 6).alias("iv_term"),
    )


# ---------------------------------------------------------------------------
# count / frequency encoding + rare-category collapse
# ---------------------------------------------------------------------------


def count_encode(
    df: DataFrame,
    cat_col: str,
    min_count: int = 1,
    other_label: str = "__other__",
) -> DataFrame:
    """Per-category count/frequency table ``(cat_col, n, freq, kept)``:
    the zero-vocabulary encoder (n and ROUND-6 freq = n/N replace the
    category) plus the rare-category collapse rule — ``kept`` is the
    category itself when n >= min_count, else ``other_label``, the
    standard guard against one-off categories memorizing rows. Join
    ``kept`` back on ``cat_col`` for the row-level column (broadcast
    when the vocabulary is small — the target_encode join shape).

    One hash aggregate + a 1-row total derived from the stats frame
    itself (no second corpus scan); NULL categories are excluded (a
    NULL never equals a join key anyway — impute first if NULL is a
    real level)."""
    per_cat = (
        df.where(F.col(cat_col).isNotNull())
        .groupBy(cat_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    glob = per_cat.agg(F.sum("n").cast(_DEC).alias("__N"))
    j = per_cat.crossJoin(F.broadcast(glob))
    kept = F.when(F.col("n") >= F.lit(int(min_count)), F.col(cat_col)) \
        .otherwise(F.lit(other_label))
    return j.select(
        cat_col,
        "n",
        _ratio6(F.col("n").cast(_DEC), F.col("__N")).alias("freq"),
        kept.alias("kept"),
    )


# ---------------------------------------------------------------------------
# population-stability-index drift between two slices
# ---------------------------------------------------------------------------


def _snap_scaled(x, name: str) -> int:
    """lo/hi literal → exact 2^20-frozen integer, loudly rejecting
    literals that don't land on the freeze grid (Fraction(str(x)) — the
    top_quantile_by / mixture_rates snap rule)."""
    from fractions import Fraction  # noqa: PLC0415

    fx = Fraction(str(x)) * _SCALE
    if fx.denominator != 1:
        raise ValueError(
            f"drift_psi: {name}={x!r} does not land on the 2^{SCALE_BITS} "
            f"freeze grid — use a literal with <= 6 decimal places")
    return int(fx)


def drift_psi(
    df: DataFrame,
    col: str,
    baseline,
    lo,
    hi,
    bins: int = 10,
) -> DataFrame:
    """Population Stability Index drift of ``col`` between a baseline
    slice and the rest: one row per bin, ``(bin, n_base, n_cur,
    psi_term)``; total PSI = SUM(psi_term) (engine-side — the
    woe_stats rounding note applies). The standard deploy-time
    drift monitor: PSI < 0.1 stable, > 0.25 action.

    ``baseline`` is a boolean Column splitting df into the two slices;
    ``lo``/``hi``/``bins`` define equal-width bins over [lo, hi) —
    values outside clamp into the edge bins (a drifted tail SHOWS UP in
    the edge bin rather than being dropped). Binning is exact integer
    math on 2^20-frozen values — bin = (clamp(xf) − lo_f)·bins DIV
    (hi_f − lo_f) — so both engines agree bit-for-bit; per-bin
    probabilities use Laplace half-counts (p = (2n+1)/(2N+bins)) so an
    empty bin contributes a finite term. psi_term = ROUND(
    (p_base − p_cur) · ROUND(ln(p_base/p_cur), 6), 6) with the ln
    written as ONE log of an exact integer ratio (the tfidf rule).

    Plan: one projected bin expression evaluated at the scan, one small
    hash aggregate on (bin), totals derived from the tiny bin frame
    itself (never a second corpus scan), and a literal bin spine
    exploded from the 1-row totals — every bin row exists even when no
    data lands in it. Zero Python, one exchange.
    """
    if bins < 2:
        raise ValueError("drift_psi: need at least 2 bins")
    lof, hif = _snap_scaled(lo, "lo"), _snap_scaled(hi, "hi")
    if hif <= lof:
        raise ValueError("drift_psi: hi must be > lo")
    width = hif - lof
    xf = _freeze(F.col(col))
    xc = F.greatest(F.lit(lof), F.least(xf, F.lit(hif - 1)))
    cnts = (
        df.where(F.col(col).isNotNull())
        .select(
            ((xc - F.lit(lof)) * F.lit(bins)).alias("__xr"),
            F.when(baseline, 1).otherwise(0).alias("__b"),
        )
        .select(F.expr(f"__xr DIV {width}").alias("bin"), "__b")
        .groupBy("bin")
        .agg(
            F.sum("__b").alias("__na"),
            F.sum(F.lit(1) - F.col("__b")).alias("__nc"),
        )
    )
    spine = cnts.agg(
        F.coalesce(F.sum("__na"), F.lit(0)).cast(_DEC).alias("__ta"),
        F.coalesce(F.sum("__nc"), F.lit(0)).cast(_DEC).alias("__tb"),
    ).select(
        F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("bin"),
        "__ta", "__tb",
    )
    j = spine.join(cnts, on="bin", how="left")
    na = F.coalesce(F.col("__na"), F.lit(0)).cast(_DEC)
    nc = F.coalesce(F.col("__nc"), F.lit(0)).cast(_DEC)
    two, one = F.lit(2).cast(_DEC), F.lit(1).cast(_DEC)
    nb = F.lit(bins).cast(_DEC)
    # p_base = (2·na+1)/(2·TA+bins), p_cur likewise; ln as ONE ratio of
    # exact integers, each probability as ONE division
    lnum = (two * na + one) * (two * F.col("__tb") + nb)
    lden = (two * nc + one) * (two * F.col("__ta") + nb)
    l6 = F.round(F.log(lnum.cast("double") / lden.cast("double")), 6)
    pa = (two * na + one).cast("double") / (two * F.col("__ta") + nb).cast("double")
    pc = (two * nc + one).cast("double") / (two * F.col("__tb") + nb).cast("double")
    return j.select(
        "bin",
        na.cast("long").alias("n_base"),
        nc.cast("long").alias("n_cur"),
        F.round((pa - pc) * l6, 6).alias("psi_term"),
    )


# ---------------------------------------------------------------------------
# pairwise Pearson correlation (exact frozen sufficient statistics)
# ---------------------------------------------------------------------------


def corr_pairs(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
) -> DataFrame:
    """Pairwise Pearson correlations over numeric columns: one row per
    unordered pair ``(col_x, col_y, n, sx, sy, sxy, sxx, syy, corr)``
    with col_x < col_y by list order — the feature-redundancy screen.

    The kmeans freeze discipline end-to-end: every value freezes ONCE to
    ROUND(x·2^bits) BIGINT, the five sufficient statistics are exact
    order-free integer sums, and corr makes the single float step
    ROUND((n·sxy − sx·sy) / (√(n·sxx − sx²)·√(n·syy − sy²)), 6) — all
    operands exact integers cast to DOUBLE, so both engines evaluate the
    identical IEEE expression (sqrt/÷/× are correctly rounded). corr is
    NULL for a zero-variance column. Rows with a NULL in ANY listed
    column are dropped (complete-case — a shared n keeps the matrix
    positive semidefinite).

    ``bits`` trades quantization against overflow: sums are exact while
    n·(x·2^bits)² < 2^63 (bits=12, |x| ≤ 500 → n ≲ 2·10^6; the internal
    DECIMAL(38,0) aggregate never overflows first — the output BIGINT
    cast fails loudly under ANSI if the envelope is exceeded; lower
    bits or pre-scale for larger corpora).

    Plan: ONE map-side-combined hash aggregate computing all
    d + d·(d+1)/2 sums in a single pass (d is a literal — the
    expressions stay in whole-stage codegen), then the 1-row result
    unpivots to pair rows via a literal-shaped explode. No join, no
    second scan, no window.
    """
    if len(cols) < 2:
        raise ValueError("corr_pairs: need at least 2 columns")
    scale = 1 << bits
    fz = {
        c: F.round(F.col(c).cast("double") * F.lit(scale), 0).cast("long")
        for c in cols
    }
    base = df.where(
        F.lit(True) & F.expr(" AND ".join(f"`{c}` IS NOT NULL" for c in cols))
    ).select(*[fz[c].alias(f"__f_{c}") for c in cols])
    aggs = [F.count(F.lit(1)).cast(_DEC).alias("__n")]
    for c in cols:
        fc = F.col(f"__f_{c}").cast(_DEC)
        aggs.append(F.sum(fc).alias(f"__s_{c}"))
        aggs.append(F.sum(fc * F.col(f"__f_{c}")).alias(f"__ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(
                F.sum(F.col(f"__f_{a}").cast(_DEC) * F.col(f"__f_{b}"))
                .alias(f"__sp_{a}_{b}")
            )
    one = base.agg(*aggs)
    pair_structs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            pair_structs.append(F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                F.col("__n").alias("n"),
                F.col(f"__s_{a}").alias("sx"),
                F.col(f"__s_{b}").alias("sy"),
                F.col(f"__sp_{a}_{b}").alias("sxy"),
                F.col(f"__ss_{a}").alias("sxx"),
                F.col(f"__ss_{b}").alias("syy"),
            ))
    p = one.select(F.explode(F.array(*pair_structs)).alias("p")).select("p.*")
    n = F.col("n")
    vnum = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    corr = F.when(
        (vx > 0) & (vy > 0), F.round(vnum / (F.sqrt(vx) * F.sqrt(vy)), 6)
    )
    return p.select(
        "col_x", "col_y",
        n.cast("long").alias("n"),
        F.col("sx").cast("long").alias("sx"),
        F.col("sy").cast("long").alias("sy"),
        F.col("sxy").cast("long").alias("sxy"),
        F.col("sxx").cast("long").alias("sxx"),
        F.col("syy").cast("long").alias("syy"),
        corr.alias("corr"),
    )


def class_weights(
    df: DataFrame,
    label_col: str,
    scheme: str = "balanced",
) -> DataFrame:
    """Per-class loss weights for imbalanced training: one row per
    distinct label with ``(label, n, weight)``.

    * ``scheme="balanced"`` — sklearn's rule ``w = n_total / (k · n_c)``
      (uniform-prior reweighting: every class contributes equally).
    * ``scheme="inv_sqrt"`` — ``w = sqrt(n_total / n_c)`` (the softer
      up-weighting used for skewed text corpora, e.g. multilingual
      sampling temperatures around 0.5).

    Cross-engine parity: ``n_total``, ``k`` and ``n_c`` are exact
    integers from two stacked hash aggregates; the weight is a single
    IEEE division of exact operands (+ one exactly-rounded sqrt for
    inv_sqrt), then ROUND-6 — identical in Spark and DuckDB. Plan: one
    hash aggregate on the label (map-side combine absorbs any label
    skew) + a broadcast 1-row stats join; no window, no second scan."""
    if scheme not in ("balanced", "inv_sqrt"):
        raise ValueError(f"class_weights: unknown scheme {scheme!r}")
    per = (
        df.filter(F.col(label_col).isNotNull())
        .groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    g = per.agg(
        F.sum("n").cast("long").alias("__gn"),
        F.count(F.lit(1)).alias("__k"),
    )
    out = per.crossJoin(F.broadcast(g))
    if scheme == "balanced":
        w = F.round(
            F.col("__gn").cast("double")
            / (F.col("__k") * F.col("n")).cast("double"), 6)
    else:
        w = F.round(
            F.sqrt(F.col("__gn").cast("double") / F.col("n").cast("double")), 6)
    return out.select("label", "n", w.alias("weight"))


def target_encode_timesafe(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    ts: str = "ts",
    smoothing: int = 20,
    out_col: str = "te_ts",
    chunk_seconds: float | None = None,
    broadcast_carry: bool | None = True,
) -> DataFrame:
    """TIME-SAFE target encoding: each row's category is encoded with the
    smoothed mean label of the category's STRICTLY-PRIOR rows only —
    ``te_i = (Σ_prior y + m·prior) / (n_prior + m)`` over
    :func:`towhee_spark.temporal.expanding_agg`'s leakage-free frame.
    Where :func:`target_encode` (``loo=True``) removes only the row's OWN
    label (right for shuffled iid folds), this removes every label from
    the row's future — the correct encoder for time-ordered training
    data, where a category's future mean is exactly what the model must
    not see. A category's first occurrence gets the pure prior.

    The prior is the corpus-wide mean label, folded algebraically so the
    whole expression stays ONE exact-integer division (the target_encode
    shape): ``te = (s·N + m·S) / ((n + m)·N·2^20)`` with (s, n) the
    expanding frozen sums and (S, N) the global 1-row broadcast stats.
    The global prior sees all rows including future ones — a scalar
    regularizer, not a per-row signal; pass a frozen split if even that
    bothers the protocol (then s/n stay the only data-dependent terms).

    Skew: the expanding window partitions by CATEGORY — a dominant
    category is a textbook mega-key; ``chunk_seconds=`` engages
    expanding_agg's chunked carry. One category exchange + one window
    (+ tiny carry when chunked), broadcast global join."""
    if smoothing < 0:
        raise ValueError("target_encode_timesafe: smoothing must be >= 0")
    from towhee_spark.temporal import expanding_agg  # noqa: PLC0415

    m = _smoothing_int(smoothing)
    d = df.withColumn("__te_lf", _freeze(F.col(label_col)).cast(_DEC))
    d = expanding_agg(
        d, on=cat_col, ts=ts,
        aggs={"__te_n": ("count", "__te_lf"), "__te_s": ("sum", "__te_lf")},
        chunk_seconds=chunk_seconds, broadcast_carry=broadcast_carry)
    glob = (
        df.where(F.col(label_col).isNotNull())
        .agg(
            F.count(F.lit(1)).cast(_DEC).alias("__gn"),
            F.sum(_freeze(F.col(label_col)).cast(_DEC)).alias("__gs"),
        )
    )
    j = d.crossJoin(F.broadcast(glob))
    s = F.coalesce(F.col("__te_s"), F.lit(0).cast(_DEC))
    n = F.col("__te_n").cast(_DEC)
    num = s * F.col("__gn") + F.lit(m) * F.col("__gs")
    den = (n + F.lit(m)) * F.col("__gn") * F.lit(_SCALE)
    te = F.when((n + F.lit(m)) > 0, _ratio6(num, den))
    return j.withColumn(out_col, te).drop(
        "__te_lf", "__te_n", "__te_s", "__gn", "__gs")


def ecdf_transform(
    df: DataFrame,
    value: str = "value",
    out_col: str = "ecdf",
    bits: int = 20,
    broadcast_stats: bool | None = True,
) -> DataFrame:
    """Quantile (rank) normalization: map each value to its empirical CDF
    ``P(X <= x)`` over the corpus — the transform that makes any feature
    distribution uniform on (0, 1] for rank-based models and
    drift-robust scaling. NULL values map to NULL.

    Distributed shape: the naive formulation (a global ``percent_rank``
    window) sorts the whole corpus on ONE task — a scale-killer. Here
    values freeze ONCE to ``ROUND(x·2^bits)`` BIGINTs, the ECDF table is
    a hash aggregate per DISTINCT frozen value + a running sum over that
    tiny table, and the apply is one equi-join back on the frozen value
    (broadcast by default; ``broadcast_stats=False`` for a shuffled
    join, None for AQE). Pick ``bits`` so the table stays bounded — it
    has one row per distinct frozen value (2-decimal corpora: ≤
    range·100 rows at bits=20; truly continuous data: lower bits, the
    drift_psi binning posture). ``ecdf`` is exact-integer
    ``cum_le / n`` with the repo's single ROUND-6 division; ties share
    the frozen bucket, so equal values always get equal ranks."""
    if not 1 <= bits <= 40:
        raise ValueError("ecdf_transform: bits must be in [1, 40]")
    from pyspark.sql import Window  # noqa: PLC0415

    scale = 1 << bits
    xf = F.round(F.col(value).cast("double") * F.lit(scale), 0).cast("long")
    d = df.withColumn("__e_xf", xf)
    counts = (
        d.filter(F.col("__e_xf").isNotNull())
        .groupBy("__e_xf").agg(F.count(F.lit(1)).alias("__e_n"))
    )
    w = Window.orderBy("__e_xf").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    cum = counts.select(
        "__e_xf", F.sum("__e_n").over(w).cast("long").alias("__e_cle"))
    g = counts.agg(F.sum("__e_n").cast("long").alias("__e_gn"))
    from towhee_spark.temporal import carry_join  # noqa: PLC0415

    out = (
        carry_join(d, cum, ["__e_xf"], broadcast=broadcast_stats)
        .crossJoin(F.broadcast(g))
        .withColumn(
            out_col,
            F.when(
                F.col("__e_xf").isNotNull(),
                _ratio6(F.col("__e_cle"), F.col("__e_gn"))),
        )
        .drop("__e_xf", "__e_cle", "__e_gn")
    )
    return out.select(*df.columns, out_col)
