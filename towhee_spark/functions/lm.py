"""Corpus-trained unigram language-model scoring.

The quality-filter family (text.quality_score, text.gopher_rules) is
rule-based; this module adds the statistical tier every production curation
stack runs next to it (CCNet/RedPajama-style: score documents by a language
model and drop the worst tail). A full KenLM is out of sandbox scope — the
unigram LM with add-one smoothing is the exact same pipeline shape (train a
model over the corpus, broadcast/join it back, score per doc) with
arithmetic simple enough to mirror term-for-term in a DuckDB oracle.

Reference semantics anchor: the LLM-scoring hub op family the reference
dispatches to external models (hub_ops/llm.py:16-60) — here the "model" is
trained inside the engine in one aggregation pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from towhee_spark.functions.text import normalize_text


def doc_token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """(id, token, c): per-document token bag counts over the canonical
    normalize_text tokens (empty tokens dropped, so blank docs contribute
    nothing). One hash aggregation with map-side combine — the shared base
    for both model training and document scoring.

    ``tokens_col`` switches the unit to a precomputed array<string>
    column (wordpiece_tokenize / bpe_encode ``pieces``) — the model-token
    passthrough, same shape as sample_to_token_budget(count_col=) and
    pack_sequences(count_col=); ``text_col`` is ignored when set."""
    from towhee_spark.layout import fan_out  # noqa: PLC0415

    tok = (F.explode(F.col(tokens_col)) if tokens_col is not None
           else F.explode(F.split(normalize_text(text_col), " ")))
    # token explode + the partial (id, token) aggregate evaluate in the
    # scan stage — one task on a single-row-group corpus (fan_out note)
    return (
        fan_out(df).select(F.col(id_col).cast("long").alias("id"), tok.alias("token"))
        .filter(F.col("token") != "")
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def unigram_counts(doc_tok: DataFrame) -> DataFrame:
    """(token, cf): corpus frequencies from the per-doc counts — re-aggregating
    the already-reduced (id, token) frame instead of the raw token stream, so
    the corpus-wide shuffle moves one row per (doc, distinct token)."""
    return doc_tok.groupBy("token").agg(F.sum("c").alias("cf"))


def unigram_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = False,
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-document perplexity under the corpus's own add-one-smoothed
    unigram LM: p(t) = (cf_t + 1) / (T + V), avg_nll = −(1/n)·Σ ln p over
    the doc's token bag, ppl = exp(avg_nll); both rounded to 6.

    Returns (id_col, n_tokens, avg_nll, ppl); blank documents keep
    n_tokens = 0 with NULL scores. The self-trained model means no OOV
    branch; to score against a reference corpus, join a foreign
    unigram_counts frame instead (same shape).

    Cross-engine float parity: every ln sees bit-identical operands in both
    engines (integer counts → one double division), terms are all-negative
    (no cancellation) so the summation-order error is ~1e-12 against a
    round-to-6; ppl exponentiates the ALREADY-ROUNDED avg_nll so both
    engines feed exp the same double.

    Scale: train = one extra aggregation over the reduced (doc, token)
    frame; score = one join on token. The vocab frame follows Heaps' law
    (~corpus^0.5 rows) — broadcast it with ``broadcast_vocab=True`` when it
    fits (≤ a few GB), else the default shuffle join lets AQE handle the
    Zipf skew on stop-token keys (each (doc, token) row is already unique,
    so the hot token fan-in is bounded by corpus doc count, not token
    count)."""
    # cache: doc_tok feeds BOTH model training and document scoring; the
    # tokenize+explode+agg would otherwise run twice (release with
    # dedup.release_cached on the returned frame)
    doc_tok = doc_token_counts(df, id_col, text_col, tokens_col).cache()
    freq = unigram_counts(doc_tok)
    totals = freq.agg(
        F.sum("cf").alias("__T"), F.count(F.lit(1)).alias("__V")
    )
    if broadcast_vocab:
        freq = F.broadcast(freq)
    nll = F.log((F.col("cf") + F.lit(1.0)) / (F.col("__T") + F.col("__V")))
    scored = (
        doc_tok.join(freq, "token")
        .crossJoin(F.broadcast(totals))
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.round(-F.sum(F.col("c") * nll) / F.sum("c"), 6).alias("avg_nll"),
        )
    )
    from towhee_spark.functions.dedup import _with_cached_deps  # noqa: PLC0415

    out = (
        df.select(F.col(id_col).cast("long").alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "avg_nll",
            F.round(F.exp("avg_nll"), 6).alias("ppl"),
        )
    )
    return _with_cached_deps(out, doc_tok)


def doc_bigram_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, w1, w2, c): per-document bigram bag counts — the shingles
    arrays_zip pattern (two shifted slices zipped then exploded; all
    whole-stage codegen, never an indexed-transform lambda). Docs with
    < 2 tokens contribute nothing."""
    from towhee_spark.layout import fan_out  # noqa: PLC0415

    toks = F.split(normalize_text(text_col), " ")
    base = fan_out(df).select(
        F.col(id_col).cast("long").alias("id"),
        F.filter(toks, lambda t: t != "").alias("__toks"),
    ).select("id", "__toks", F.size("__toks").alias("__sz"))
    zipped = F.arrays_zip(
        F.slice("__toks", 1, F.col("__sz") - 1),
        F.slice("__toks", 2, F.col("__sz") - 1),
    )
    return (
        base.filter(F.col("__sz") >= 2)
        .select("id", F.explode(zipped).alias("__g"))
        .select("id", F.col("__g.0").alias("w1"), F.col("__g.1").alias("w2"))
        .groupBy("id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bigram_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
) -> DataFrame:
    """Per-document perplexity under the corpus's own INTERPOLATED bigram
    LM — the Jelinek-Mercer smoothing KenLM-class models use, one order
    up from unigram_perplexity:

        p(w2|w1) = λ·cb(w1,w2)/c1(w1) + (1−λ)·(cf(w2)+1)/(T+V)

    with cb = corpus bigram counts, c1(w1) = Σ_w2 cb(w1,w2) (the TRUE
    context count — doc-final tokens never open a bigram, so this is not
    the unigram count), and the add-one unigram as the backoff mass.
    Self-trained ⇒ every scored bigram exists in the model (cb ≥ 1); the
    backoff term keeps the formula total anyway so a foreign-corpus model
    (pass precomputed frames in a variant) would not produce −inf.

    Returns (id_col, n_bigrams, avg_nll, ppl); docs with < 2 tokens keep
    n_bigrams = 0 and NULL scores. avg_nll = −(1/n)·Σ c·ln p rounded to
    6; ppl = exp of the already-rounded avg_nll (the unigram_perplexity
    float-parity posture: ln operands are identical doubles in both
    engines — integer counts through a fixed-shape arithmetic tree with
    an exactly-representable λ — terms are all-negative so no
    cancellation, and exp sees the rounded value).

    Scale: model training re-aggregates the already-reduced per-doc
    bigram frame (shuffle rows ∝ distinct (doc, bigram)); scoring is one
    join on (w1, w2), one on w1, one on w2, all AQE-skew-handled; corpus
    totals ride a broadcast 1-row crossJoin. Default λ = 0.75 is exactly
    representable so both engines scale with the identical double."""
    if not 0.0 < lam < 1.0:
        raise ValueError("bigram_perplexity: lam must be in (0, 1)")
    doc_bi = doc_bigram_counts(df, id_col, text_col).cache()
    doc_tok = doc_token_counts(df, id_col, text_col).cache()
    cb = doc_bi.groupBy("w1", "w2").agg(F.sum("c").alias("cb"))
    c1 = cb.groupBy("w1").agg(F.sum("cb").alias("c1"))
    freq = unigram_counts(doc_tok)
    totals = freq.agg(F.sum("cf").alias("__T"), F.count(F.lit(1)).alias("__V"))
    p = (
        F.lit(float(lam)) * (F.col("cb") / F.col("c1"))
        + F.lit(1.0 - float(lam))
        * ((F.col("cf") + F.lit(1.0)) / (F.col("__T") + F.col("__V")))
    )
    scored = (
        doc_bi.join(cb, ["w1", "w2"])
        .join(c1, "w1")
        .join(freq.withColumnRenamed("token", "w2"), "w2")
        .crossJoin(F.broadcast(totals))
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.round(-F.sum(F.col("c") * F.log(p)) / F.sum("c"), 6).alias("avg_nll"),
        )
    )
    from towhee_spark.functions.dedup import _with_cached_deps  # noqa: PLC0415

    out = (
        df.select(F.col(id_col).cast("long").alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "avg_nll",
            F.round(F.exp("avg_nll"), 6).alias("ppl"),
        )
    )
    return _with_cached_deps(out, doc_bi, doc_tok)


def cooccurrence_pmi(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 4,
    min_pair_count: int = 5,
) -> DataFrame:
    """Skip-gram co-occurrence PMI: ``(t1, t2, c_pair, pmi)`` for every
    unordered token pair observed within ``window`` positions of each
    other at least ``min_pair_count`` times — the collocation statistic
    (Church & Hanks 1990) behind phrase mining, word-association
    features, and tokenizer-merge diagnostics (a high-PMI pair is a
    merge candidate bpe_train would pick early).

    pmi = ln( (c_ab·N²) / (c_a·c_b·T) ): the empirical
    log(p(a,b)/(p(a)p(b))) with p(a,b) = c_ab/T (T = generated pair
    slots), p(t) = c_t/N. Written as ONE log-of-ratio over exact
    integers (the tfidf/bigram freeze rule — DECIMAL(38,0) products
    here, HUGEINT in the oracle) and ROUND-6'd, so the gate
    hash-matches.

    Plan: positions come from one posexplode of the normalize_text
    split; pair slots from a ``window``-way explode of offset literals
    joined back on (doc, pos+d) — one shuffled equi-join whose left side
    is ``window``× the token stream, never a per-document quadratic.
    Unigram/total stats are hash aggregates; the two c_t lookups are
    equi-joins against the (token, c) frame (broadcast-sized for real
    vocabularies). ``min_pair_count`` prunes the heavy tail BEFORE the
    stats joins.

    Reference anchor: towhee has no corpus statistics surface at all
    (data_queue.py drains rows; stats are user map() code).
    """
    if window < 1:
        raise ValueError("cooccurrence_pmi: window must be >= 1")
    if min_pair_count < 1:
        raise ValueError("cooccurrence_pmi: min_pair_count must be >= 1")
    dec = "decimal(38,0)"
    toks = (
        df.select(
            F.col(id_col).alias("__id"),
            F.posexplode(F.split(normalize_text(text_col), " ")).alias(
                "__pos", "__tok"),
        )
        # normalize_text collapses whitespace, so the only empty token is
        # the blank-document singleton — dropping it cannot shift positions
        .where(F.col("__tok") != "")
        # three consumers (unigram counts + both join sides) would each
        # re-run the corpus explode — cache, release via release_cached
        # (the simhash shingle-frame convention)
        .cache()
    )
    uni = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    # N re-derives from the already-reduced unigram frame, never a 4th
    # scan of the token stream
    tot = uni.agg(F.sum("__c").cast(dec).alias("__N"))
    left = toks.select(
        "__id", "__tok", "__pos",
        F.explode(F.array(*[F.lit(d) for d in range(1, window + 1)])).alias("__d"),
    ).select(
        "__id", "__tok", (F.col("__pos") + F.col("__d")).alias("__tpos"))
    right = toks.select(
        F.col("__id").alias("__rid"), F.col("__pos").alias("__rpos"),
        F.col("__tok").alias("__rtok"))
    pairs_raw = left.join(
        right,
        (F.col("__id") == F.col("__rid")) & (F.col("__tpos") == F.col("__rpos")),
        "inner",
    ).select(
        F.least("__tok", "__rtok").alias("t1"),
        F.greatest("__tok", "__rtok").alias("t2"),
    )
    pc_all = pairs_raw.groupBy("t1", "t2").agg(
        F.count(F.lit(1)).alias("c_pair"))
    # T = Σ c_pair over the UNFILTERED pair counts — one row per distinct
    # pair instead of a second pass over the exploded pair stream
    pt = pc_all.agg(F.sum("c_pair").cast(dec).alias("__T"))
    pc = pc_all.where(F.col("c_pair") >= min_pair_count)
    u1 = uni.select(F.col("__tok").alias("t1"), F.col("__c").alias("__c1"))
    u2 = uni.select(F.col("__tok").alias("t2"), F.col("__c").alias("__c2"))
    j = (
        pc.join(u1, "t1").join(u2, "t2")
        .crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(pt))
    )
    num = F.col("c_pair").cast(dec) * F.col("__N") * F.col("__N")
    den = F.col("__c1").cast(dec) * F.col("__c2") * F.col("__T")
    out = j.select(
        "t1", "t2", "c_pair",
        F.round(F.log(num.cast("double") / den.cast("double")), 6).alias("pmi"),
    )
    from towhee_spark.functions.dedup import _with_cached_deps  # noqa: PLC0415

    return _with_cached_deps(out, toks)
