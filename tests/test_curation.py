"""Curation ops: decontamination + deterministic sampling/splitting."""

import pytest
from pyspark.sql import functions as F

from towhee_spark.functions import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_hash_split_total_deterministic_and_proportional(spark):
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    out = curation.hash_split(df, weights={"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # total: every row gets a label
    assert 1500 < counts["train"] < 1700  # ~1600 ± sampling noise
    assert 120 < counts["val"] < 280
    assert 120 < counts["test"] < 280
    # pure function of (salt, id): a second run is row-identical
    again = curation.hash_split(df, weights={"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0


def test_hash_split_stable_under_corpus_growth(spark):
    """A doc keeps its split when the corpus around it changes — the
    property that keeps eval sets stable across pipeline versions."""
    w = {"train": 0.9, "val": 0.1}
    small = curation.hash_split(
        spark.range(100).select(F.col("id").alias("doc_id")), weights=w)
    big = curation.hash_split(
        spark.range(10000).select(F.col("id").alias("doc_id")), weights=w)
    joined = small.alias("s").join(
        big.alias("b"), "doc_id").filter(F.col("s.split") != F.col("b.split"))
    assert joined.count() == 0


def test_hash_split_validation():
    with pytest.raises(ValueError, match="at least one"):
        curation._thresholds({})
    with pytest.raises(ValueError, match="positive"):
        curation._thresholds({"a": 0.0})
    with pytest.raises(ValueError, match="negative"):
        curation._thresholds({"a": 1.0, "b": -0.1})


def test_sample_by_hash_rates_and_stability(spark):
    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"))
    out = curation.sample_by_hash(
        df, rates={"en": 0.5, "zh": 0.1}, strata_col="lang")
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 850 < counts["en"] < 1150  # 2000 * 0.5
    assert 120 < counts["zh"] < 280   # 2000 * 0.1
    # kept set for a stratum is unchanged when OTHER strata rates move
    out2 = curation.sample_by_hash(
        df, rates={"en": 0.5, "zh": 0.9}, strata_col="lang")
    en1 = {r.doc_id for r in out.filter("lang = 'en'").collect()}
    en2 = {r.doc_id for r in out2.filter("lang = 'en'").collect()}
    assert en1 == en2
    # default_rate=0 drops unknown strata entirely
    df2 = df.withColumn("lang", F.lit("fr"))
    assert curation.sample_by_hash(
        df2, rates={"en": 0.5}, strata_col="lang").count() == 0
    with pytest.raises(ValueError, match="outside"):
        curation.sample_by_hash(df, rates={"en": 1.5}, strata_col="lang")


def test_decontaminate_flags_overlap_only(spark):
    bench = _docs(spark, [(0, "the quick brown fox jumps over", "en")])
    docs = _docs(spark, [
        # shares 2 distinct 3-grams: "the quick brown", "quick brown fox"
        (10, "prefix the quick brown fox suffix", "en"),
        # shares 1 ("fox jumps over")
        (11, "lazy fox jumps over fences", "en"),
        # no shared 3-gram
        (12, "completely different text entirely here", "en"),
    ])
    out = curation.decontaminate(docs, bench, n=3, threshold=2)
    rows = {r.doc_id: (r.hits, r.sample_shingle) for r in out.collect()}
    assert set(rows) == {10}
    assert rows[10][0] == 2
    assert rows[10][1] == "quick brown fox"  # lexicographic min of the hits
    # threshold=1 picks up the single-hit doc too
    out1 = curation.decontaminate(docs, bench, n=3, threshold=1)
    assert {r.doc_id for r in out1.collect()} == {10, 11}
    with pytest.raises(ValueError, match="threshold"):
        curation.decontaminate(docs, bench, threshold=0)


def test_decontaminate_short_doc_rule(spark):
    """Docs under n words compare by their full normalized text — the
    dedup.shingles rule, so a short benchmark answer still decontaminates
    its exact copies."""
    bench = _docs(spark, [(0, "Paris", "en")])
    docs = _docs(spark, [(10, "  PARIS ", "en"), (11, "paris france", "en")])
    out = curation.decontaminate(docs, bench, n=3, threshold=1)
    assert {r.doc_id for r in out.collect()} == {10}


def test_gopher_rules_fire_individually(spark):
    """Each rule trips on a doc crafted to violate exactly that rule
    (plus keep=True on a healthy doc) — synthetic corpora leave some
    rules always-true, so the gate alone can't show they fire."""
    from towhee_spark.functions.text import gopher_rules

    rows = [
        (1, " ".join(["the", "and", "word"] * 30)),           # healthy
        (2, "short the and text"),                            # too few words
        (3, " ".join(["supercalifragilistic"] * 60)),         # long words, no stops
        (4, " ".join(["123", "456"] * 40) + " the and"),      # numeric words
        (5, " ".join(["word"] * 60) + " the and " + "# " * 30),  # symbol-heavy
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in df.select(
        "doc_id", gopher_rules("text").alias("g")).select("doc_id", "g.*").collect()}
    assert out[1].keep is True
    assert out[2].words_ok is False and out[2].keep is False
    assert out[3].mean_len_ok is False and out[3].stops_ok is False
    assert out[4].alpha_ok is False and out[4].words_ok is True
    assert out[5].symbols_ok is False
    assert out[1].word_count == 90 and out[1].stop_hits == 60


def test_token_budget_hits_target_and_clamps(spark):
    import random

    rng = random.Random(9)
    rows = [
        (i, " ".join(f"w{rng.randrange(50)}" for _ in range(rng.randrange(5, 25))),
         "big" if i < 800 else "small")
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")
    from towhee_spark.functions.text import token_count

    totals = {
        r["lang"]: r["t"]
        for r in df.groupBy("lang").agg(
            F.sum(token_count("text")).alias("t")).collect()
    }
    out = curation.sample_to_token_budget(
        df, budgets={"big": totals["big"] / 3.0, "small": 10_000_000.0},
        strata_col="lang")
    kept = {
        r["lang"]: r["t"]
        for r in out.groupBy("lang").agg(
            F.sum(token_count("text")).alias("t")).collect()
    }
    # clamped stratum lands near its budget (rate filter: ~1/sqrt(n) error)
    assert abs(kept["big"] - totals["big"] / 3.0) / totals["big"] < 0.05
    # over-budgeted stratum keeps everything
    assert kept["small"] == totals["small"]


def test_token_budget_drops_unbudgeted_and_is_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "a b c", "en"), (2, "d e", "xx"), (3, "", "zz")],
        "doc_id: long, text: string, lang: string",
    )
    out = curation.sample_to_token_budget(
        df, budgets={"en": 100.0, "zz": 5.0}, strata_col="lang")
    got = sorted(r["doc_id"] for r in out.collect())
    # xx unbudgeted -> dropped; zz total tokens 0 -> budgeted -> full keep
    assert got == [1, 3]
    again = sorted(
        r["doc_id"]
        for r in curation.sample_to_token_budget(
            df, budgets={"en": 100.0, "zz": 5.0}, strata_col="lang").collect()
    )
    assert again == got


def test_token_budget_validation(spark):
    df = spark.createDataFrame([(1, "a", "en")], "doc_id: long, text: string, lang: string")
    with pytest.raises(ValueError, match="at least one"):
        curation.sample_to_token_budget(df, budgets={}, strata_col="lang")
    with pytest.raises(ValueError, match="negative"):
        curation.sample_to_token_budget(df, budgets={"en": -1.0}, strata_col="lang")


# -- DSIR importance resampling ---------------------------------------------


def _dsir_corpus(spark):
    target_rows = [(i, "alpha beta gamma delta alpha beta", "en")
                   for i in range(10)]
    mixed = [(100 + i, "alpha beta zeta yot", "xx") for i in range(5)]
    junk = [(200 + i, "zeta yot omicron kappa zeta yot", "xx")
            for i in range(5)]
    empty = [(300, "", "xx")]
    raw = spark.createDataFrame(
        target_rows + mixed + junk + empty, "doc_id long, text string, lang string")
    return raw, raw.filter(F.col("lang") == "en")


def test_dsir_orders_target_like_docs_first(spark):
    """Docs built from target-distribution tokens must out-weigh docs of
    tokens the target never uses; mixed docs sit between."""
    raw, target = _dsir_corpus(spark)
    out = curation.dsir_logweights(raw, target, dim=64)
    got = {r.doc_id: r.lw_scaled for r in out.collect()}
    curation_release(out)
    assert got[0] > got[100] > got[200]
    assert got[300] == 0  # no features → additive-identity weight
    sel = curation.dsir_select(raw, target, k=10, dim=64)
    top = {r.doc_id for r in sel.collect()}
    curation_release(sel)
    assert top == set(range(10))  # the 10 target docs win the top-10


def test_dsir_logratio_reuse_roundtrip(spark, tmp_path):
    """dsir_logratio_table written to parquet and read back must drive
    dsir_select to the identical ranking — the train-once 100 TB shape."""
    raw, target = _dsir_corpus(spark)
    lr = curation.dsir_logratio_table(raw, target, dim=64)
    path = str(tmp_path / "dsir_lr")
    lr.write.parquet(path)
    curation_release(lr)
    back = spark.read.parquet(path)
    inline = [(r.doc_id, r.lw_scaled, r.rank) for r in
              curation.dsir_select(raw, target, k=8, dim=64).collect()]
    reused = [(r.doc_id, r.lw_scaled, r.rank) for r in
              curation.dsir_select(raw, target, k=8, dim=64,
                                   logratios=back).collect()]
    assert inline == reused


def test_dsir_gumbel_is_deterministic_sampling(spark):
    """gumbel=True draws a seeded Gumbel-top-k: stable across reruns,
    different under a different salt, and biased toward high weights."""
    raw, target = _dsir_corpus(spark)

    def sel(salt):
        out = curation.dsir_select(raw, target, k=8, dim=64, gumbel=True,
                                   gumbel_salt=salt)
        got = [r.doc_id for r in out.collect()]
        curation_release(out)
        return got

    a1, a2, b = sel("g1"), sel("g1"), sel("g2")
    assert a1 == a2
    assert set(a1) != set(b) or a1 != b
    # exp(logweight) of target docs dwarfs junk: junk never sampled
    assert not ({200, 201, 202, 203, 204} & set(a1))


def curation_release(df):
    from towhee_spark.functions.dedup import release_cached

    release_cached(df)


SF001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sfdocs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet").cache()


def test_bloom_decontaminate_no_false_negatives(spark, sfdocs):
    """Bloom guarantee: every exact hit survives the filter, with
    bloom-hits >= exact-hits per doc (FPs only ever ADD counts)."""
    corpus = sfdocs.filter(F.col("doc_id") >= 10)
    bench = sfdocs.filter(F.col("doc_id") < 10)
    exact = {r.doc_id: r.hits for r in curation.decontaminate(
        corpus, bench, n=3, threshold=1).collect()}
    bloom = {r.doc_id: r.hits for r in curation.bloom_decontaminate(
        corpus, bench, n=3, threshold=1, m_bits=2048, k=3).collect()}
    assert exact, "fixture produced no contamination — test is vacuous"
    for did, h in exact.items():
        assert bloom.get(did, 0) >= h, (did, h, bloom.get(did))


def test_bloom_decontaminate_sized_filter_equals_exact(spark, sfdocs):
    """At the documented sizing (m_bits >= 16x distinct bench shingles)
    the deterministic FP set is empty on this corpus and the Bloom path
    reproduces the exact answer row-for-row."""
    corpus = sfdocs.filter(F.col("doc_id") >= 10)
    bench = sfdocs.filter(F.col("doc_id") < 10)
    exact = sorted(curation.decontaminate(
        corpus, bench, n=3, threshold=1).collect())
    bloom = sorted(curation.bloom_decontaminate(
        corpus, bench, n=3, threshold=1, m_bits=1 << 20, k=3).collect())
    assert bloom == exact


def test_bloom_decontaminate_inline_equals_join_path(spark, sfdocs):
    """The inlined constant-bitmap filter (m_bits <= inline_bits_max)
    emits row-identical output to the broadcast-join path — same
    bloom_build bits, same deterministic FP set, at a deliberately
    undersized m_bits so real FPs flow through both."""
    corpus = sfdocs.filter(F.col("doc_id") >= 10)
    bench = sfdocs.filter(F.col("doc_id") < 10)
    kw = dict(n=3, threshold=1, m_bits=2048, k=3)
    inline = sorted(curation.bloom_decontaminate(
        corpus, bench, inline_bits_max=1 << 17, **kw).collect())
    joined = sorted(curation.bloom_decontaminate(
        corpus, bench, inline_bits_max=0, **kw).collect())
    assert inline == joined
    assert inline, "fixture produced no contamination — test is vacuous"


def test_bloom_build_shape_and_validation(spark):
    vals = spark.createDataFrame([(f"s{i}",) for i in range(100)], "shingle string")
    bl = curation.bloom_build(vals, "shingle", m_bits=1024, k=3).collect()
    assert len(bl) <= 1024 // 32
    assert all(0 <= r.word < 1024 // 32 for r in bl)
    # popcount over all words <= k * n distinct values
    pop = sum(bin(r.bits & ((1 << 64) - 1)).count("1") for r in bl)
    assert 0 < pop <= 300
    with pytest.raises(ValueError, match="m_bits"):
        curation.bloom_build(vals, "shingle", m_bits=100)
    with pytest.raises(ValueError, match="k must"):
        curation.bloom_build(vals, "shingle", k=0)
    with pytest.raises(ValueError, match="threshold"):
        curation.bloom_decontaminate(vals, vals, threshold=0)


def test_tfidf_top_terms_matches_python(spark, sfdocs):
    """Cross-check against a plain Python tf-idf over the same tokenizer:
    same winners, same integer scores, ranks dense per doc."""
    import math
    from collections import Counter

    from towhee_spark.functions import ranking
    from towhee_spark.functions.dedup import release_cached

    out = ranking.tfidf_top_terms(sfdocs, k=3)
    rows = out.collect()
    release_cached(out)
    py_docs = {
        r.doc_id: [t for t in (r.text or "").lower().split() if t]
        for r in sfdocs.select("doc_id", "text").collect()
    }
    n = len(py_docs)
    df = Counter()
    for toks in py_docs.values():
        df.update(set(toks))
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append((r.rank, r.term, r.tf, r.score_q20))
    for did, entries in got.items():
        toks = py_docs[did]
        tf = Counter(toks)
        scored = sorted(
            ((-tf[t] * round((math.log((n + 1) / (df[t] + 1)) + 1) * (1 << 20)), t)
             for t in tf),
        )[:3]
        expect = [(i + 1, t, tf[t], -s) for i, (s, t) in enumerate(scored)]
        assert sorted(entries) == expect, (did, sorted(entries), expect)


def test_tfidf_validates_k(spark, sfdocs):
    from towhee_spark.functions import ranking

    with pytest.raises(ValueError, match="k must"):
        ranking.tfidf_top_terms(sfdocs, k=0)


def test_pretraining_curation_preset_stages(spark, sfdocs):
    """The composite preset filters monotonically stage by stage, the
    near-dup option drops non-representative duplicates, and survivors
    carry a split label."""
    from towhee_spark.pipelines import pipeline

    corpus = sfdocs.filter(F.col("doc_id") >= 5)
    bench = sfdocs.filter(F.col("doc_id") < 5)
    # relaxed thresholds so every stage keeps something at sf0.001
    base = pipeline("pretraining_curation", benchmark=bench, min_words=5,
                    decon_threshold=1)(corpus)
    rows = base.collect()
    assert 0 < len(rows) < corpus.count()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    assert len({r.doc_id for r in rows}) == len(rows)
    # adding the near-dup stage can only shrink the survivor set
    with_nd = pipeline("pretraining_curation", benchmark=bench, min_words=5,
                       decon_threshold=1, neardup_threshold=0.5)(corpus)
    nd_ids = {r.doc_id for r in with_nd.collect()}
    assert nd_ids <= {r.doc_id for r in rows}


def test_cms_overestimates_and_merges(spark, sfdocs):
    """CMS guarantees: est >= true for every value; sketches of two
    corpus halves merged by per-cell re-sum equal the whole-corpus
    sketch (mergeability — the property that makes it usable per-shard)."""
    from towhee_spark.functions import sketches
    from towhee_spark.functions.ranking import _toks

    toks = sfdocs.select("doc_id", F.explode(_toks(F.col("text"))).alias("term"))
    cms = sketches.cms_build(toks, "term", depth=4, width=16)
    true = {r.term: r.n for r in
            toks.groupBy("term").agg(F.count("*").alias("n")).collect()}
    cand = toks.select("term").distinct()
    est = {r.term: r.est for r in
           sketches.cms_estimate(cms, cand, "term", depth=4, width=16).collect()}
    assert set(est) == set(true)
    assert all(est[t] >= n for t, n in true.items())
    assert any(est[t] > true[t] for t in true), "width=16 must collide"
    # mergeability
    a = sketches.cms_build(toks.filter(F.col("doc_id") % 2 == 0), "term",
                           depth=4, width=16)
    b = sketches.cms_build(toks.filter(F.col("doc_id") % 2 == 1), "term",
                           depth=4, width=16)
    merged = (a.unionByName(b).groupBy("r", "c")
              .agg(F.sum("cnt").alias("cnt")))
    whole = {(r.r, r.c): r.cnt for r in cms.collect()}
    assert {(r.r, r.c): r.cnt for r in merged.collect()} == whole
    with pytest.raises(ValueError, match="depth"):
        sketches.cms_build(toks, "term", depth=0)


def test_top_quantile_by_matches_python_selection(spark, sfdocs):
    """Per stratum: every kept row outscores every dropped row (or ties
    the threshold), kept count >= ceil(q*n) with keep-ties semantics, and
    the result equals a plain Python histogram-threshold selection."""
    from towhee_spark.functions import curation, text

    scored = sfdocs.select("doc_id", "lang",
                           text.quality_score("text").alias("s"))
    out = curation.top_quantile_by(scored, "s", "lang", q=0.3)
    kept = {(r.doc_id) for r in out.collect()}
    rows = scored.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append((round(r.s * 1e6), r.doc_id))
    expect = set()
    def k_of(n):  # exact integer ceil(3n/10) — the Fraction rule the op uses
        return (3 * n + 9) // 10
    for lang, vs in by_lang.items():
        k = k_of(len(vs))
        thr = sorted((s for s, _ in vs), reverse=True)[k - 1]
        expect |= {d for s, d in vs if s >= thr}
    assert kept == expect
    for lang, vs in by_lang.items():
        n_kept = sum(1 for s, d in vs if d in kept)
        assert n_kept >= k_of(len(vs))
    with pytest.raises(ValueError, match="q must"):
        curation.top_quantile_by(scored, "s", "lang", q=0.0)


def test_top_quantile_null_scores_do_not_inflate_k(spark):
    """A stratum of 2 scored + 8 NULL-score rows at q=0.3 keeps
    ceil(0.3*2)=1 row — NULL scores are excluded from the histogram AND
    the total (the review finding: counting them made k=3 > n_scored
    and emptied the stratum entirely)."""
    rows = [("a", 1, 0.5), ("a", 2, 0.9)] + [("a", i, None) for i in range(3, 11)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, s double")
    out = curation.top_quantile_by(df, "s", "lang", q=0.3).collect()
    assert [(r.doc_id, r.s) for r in out] == [(2, 0.9)]


# --------------------------------------------------------------------------
# mixture_sample / mixture_rates (epoch-repeat domain mixture)


def test_mixture_sample_epoch_counts_and_determinism(spark):
    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col("id") % 3 + 1).cast("int")).alias("lang"))
    out = curation.mixture_sample(
        df, rates={"en": 0.5, "de": 2.25, "fr": 3.0}, strata_col="lang")
    per = {(r.lang, r.epoch): r.n for r in
           out.groupBy("lang", "epoch").agg(F.count("*").alias("n")).collect()}
    # whole epochs are exact full copies; fractional epochs ≈ frac·n
    assert per[("de", 0)] == 1000 and per[("de", 1)] == 1000
    assert 180 < per[("de", 2)] < 320          # 0.25 · 1000
    assert per[("fr", 0)] == per[("fr", 1)] == per[("fr", 2)] == 1000
    assert ("fr", 3) not in per
    assert 400 < per[("en", 0)] < 600 and ("en", 1) not in per
    # deterministic: a second run produces the identical (id, epoch) set
    pairs = {(r.doc_id, r.epoch) for r in out.collect()}
    out2 = curation.mixture_sample(
        df, rates={"en": 0.5, "de": 2.25, "fr": 3.0}, strata_col="lang")
    assert {(r.doc_id, r.epoch) for r in out2.collect()} == pairs


def test_mixture_sample_monotone_in_rate_and_defaults(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    lo = {(r.doc_id, r.epoch) for r in curation.mixture_sample(
        df, rates={"en": 1.3}, strata_col="lang").collect()}
    hi = {(r.doc_id, r.epoch) for r in curation.mixture_sample(
        df, rates={"en": 2.6}, strata_col="lang").collect()}
    assert lo < hi  # raising a rate only ADDS (id, epoch) pairs
    # default_rate=0 drops unlisted strata; epoch col name collision is loud
    assert curation.mixture_sample(
        df, rates={"zz": 2.0}, strata_col="lang").count() == 0
    import pytest as _pt
    with _pt.raises(ValueError, match="epoch"):
        curation.mixture_sample(
            df.withColumn("epoch", F.lit(0)), rates={"en": 1.0},
            strata_col="lang")
    with _pt.raises(ValueError, match="negative rate"):
        curation.mixture_sample(df, rates={"en": -0.1}, strata_col="lang")


def test_mixture_rates_budget_and_caps(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 800, "en").otherwise("de").alias("lang"),
        (F.col("id") % 7 + 1).alias("n_tok"))
    # equal weights, budget 1000 rows → en 500/800, de 500/200
    r = curation.mixture_rates(
        df, weights={"en": 1.0, "de": 1.0}, strata_col="lang", budget=1000)
    assert r == {"en": 0.625, "de": 2.5}
    # max_rate caps the repeat factor
    r2 = curation.mixture_rates(
        df, weights={"en": 1.0, "de": 1.0}, strata_col="lang", budget=1000,
        max_rate=2.0)
    assert r2["de"] == 2.0
    # token-unit budget via count_col; absent strata omitted
    r3 = curation.mixture_rates(
        df, weights={"en": 1.0, "zz": 1.0}, strata_col="lang",
        budget=800, count_col="n_tok")
    assert "zz" not in r3 and 0 < r3["en"] < 1
    # round-trip: rates feed mixture_sample and land near the budget
    out = curation.mixture_sample(df, rates=r, strata_col="lang")
    assert 900 < out.count() < 1100


# --------------------------------------------------------------------------
# HyperLogLog (hll_build / hll_merge / hll_estimate)


def test_hll_estimate_accuracy_and_grouping(spark):
    """Estimates land within ~3 standard errors (3·1.04/√m) of the true
    distinct count, per group and globally; duplicates don't move the
    sketch (count-DISTINCT semantics); NULLs are ignored."""
    from towhee_spark.functions import sketches

    rows = ([("a", f"v{i}") for i in range(5000)]
            + [("a", f"v{i}") for i in range(5000)]      # exact duplicates
            + [("b", f"w{i}") for i in range(700)]
            + [("b", None)])
    df = spark.createDataFrame(rows, "g string, v string")
    p = 8
    sk = sketches.hll_build(df, "v", by=["g"], p=p)
    assert sk.groupBy().max("mx").collect()[0][0] <= 60 - p + 1
    est = {r.g: r.n_distinct for r in
           sketches.hll_estimate(sk, by=["g"], p=p).collect()}
    for g, true in (("a", 5000), ("b", 700)):
        assert abs(est[g] - true) / true < 3 * 1.04 / (1 << p) ** 0.5, (g, est)
    # dup-free rebuild produces the identical register table
    sk2 = sketches.hll_build(df.dropDuplicates(), "v", by=["g"], p=p)
    assert sorted(map(tuple, sk.collect())) == sorted(map(tuple, sk2.collect()))
    with pytest.raises(ValueError, match="p must be"):
        sketches.hll_build(df, "v", p=2)


def test_hll_merge_equals_union_build(spark):
    """Sketch of A ∪ B == merge(sketch(A), sketch(B)) — register max
    commutes with set union; estimating the merge counts the union's
    distincts (overlap NOT double-counted, unlike CMS sums)."""
    from towhee_spark.functions import sketches

    a = spark.createDataFrame([(f"v{i}",) for i in range(1500)], "v string")
    b = spark.createDataFrame([(f"v{i}",) for i in range(1000, 3000)], "v string")
    p = 7
    merged = sketches.hll_merge(
        [sketches.hll_build(a, "v", p=p), sketches.hll_build(b, "v", p=p)])
    direct = sketches.hll_build(a.union(b), "v", p=p)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect()))
    est = sketches.hll_estimate(merged, p=p).collect()[0].n_distinct
    assert abs(est - 3000) / 3000 < 3 * 1.04 / (1 << p) ** 0.5
    with pytest.raises(ValueError, match="at least one"):
        sketches.hll_merge([])


def test_data_card_hand_computed(spark):
    """Counts, exact-dup detection and one-division means on a tiny
    corpus with a known duplicate and an empty doc."""
    df = spark.createDataFrame(
        [(1, "en", "the cat sat"), (2, "en", "THE  cat   sat"),  # dup of 1
         (3, "en", ""), (4, "de", "hallo welt")],
        "doc_id long, lang string, text string")
    card = {r.strata: r for r in curation.data_card(df).collect()}
    en = card["en"]
    assert (en.n_docs, en.n_dup_docs) == (3, 1)   # normalize → same print
    assert en.n_tokens == 6 and en.total_chars == 11 + 14 + 0
    assert en.avg_tokens == 2.0
    de = card["de"]
    assert (de.n_docs, de.n_dup_docs, de.n_tokens) == (1, 0, 2)
    assert 0.0 <= en.avg_quality <= 1.0
    # single hash aggregate — no joins, no windows, no Python in the plan
    plan = curation.data_card(df)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan
    assert "pythonUDF" not in plan


def test_hll_sliding_equals_per_bucket_window_build(spark):
    """The exploded re-max must equal building a sketch directly over
    each trailing window's raw rows (register max == set-union merge),
    including buckets where a register sees no NEW value (carryover)."""
    import datetime

    from towhee_spark.functions import sketches

    base = datetime.datetime(2026, 3, 1)
    rows = []
    for g in ("a", "b"):
        for i in range(40):
            # bursty: values repeat across buckets, some buckets sparse
            if (i + (g == "b")) % 5 == 3:
                continue
            rows.append((g, base + datetime.timedelta(hours=i),
                         f"u{(i * 7 + (g == 'b') * 3) % 11}"))
    df = spark.createDataFrame(rows, "g string, ts timestamp, v string")
    p, k = 5, 4
    got = sorted(tuple(r) for r in sketches.hll_sliding(
        df, "v", by=["g"], ts="ts", bucket_seconds=3600.0,
        window_buckets=k, p=p).collect())

    from pyspark.sql import functions as F

    from towhee_spark.temporal import _chunk_id

    hb = df.withColumn(
        "__hb", _chunk_id("ts", df.schema["ts"].dataType, 3600.0)
        .cast("long"))
    buckets = [r["__hb"] for r in
               hb.select("__hb").distinct().collect()]
    exp = []
    for b in sorted(set(buckets)):
        w = hb.where((F.col("__hb") > b - k) & (F.col("__hb") <= b))
        sk = sketches.hll_build(w, "v", by=["g"], p=p)
        for r in sk.collect():
            # emit='existing': only (g, b) pairs with events in bucket b
            if hb.where((F.col("g") == r["g"])
                        & (F.col("__hb") == b)).count() > 0:
                exp.append((r["g"], b, r["reg"], r["mx"]))
    assert got == sorted(exp)


def test_hll_sliding_covered_and_estimate(spark):
    import datetime

    from pyspark.sql import functions as F

    from towhee_spark.functions import sketches

    base = datetime.datetime(2026, 3, 1)
    rows = [("g", base + datetime.timedelta(hours=h), f"u{v}")
            for h, v in [(0, 1), (0, 2), (1, 2), (5, 3)]]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v string")
    cov = sketches.hll_sliding(df, "v", by=["g"], window_buckets=3, p=5,
                               emit="covered")
    ex = sketches.hll_sliding(df, "v", by=["g"], window_buckets=3, p=5)
    cov_b = {r["bucket"] for r in cov.select("bucket").distinct().collect()}
    ex_b = {r["bucket"] for r in ex.select("bucket").distinct().collect()}
    assert ex_b < cov_b  # covered includes trailing empty buckets
    # estimates over the sliding sketch: distinct in (bucket-2..bucket]
    est = {r["bucket"]: r["n_distinct"] for r in sketches.hll_estimate(
        ex, by=["g", "bucket"], p=5).collect()}
    b0 = min(est)
    assert est[b0] >= 2       # u1, u2 in bucket 0 (small-range exact-ish)
    with pytest.raises(ValueError, match="window_buckets"):
        sketches.hll_sliding(df, "v", window_buckets=0)
    with pytest.raises(ValueError, match="emit"):
        sketches.hll_sliding(df, "v", emit="dense")


# ---------------------------------------------------------------- stratified


def test_stratified_sample_exact_quotas(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "a").otherwise("b").alias("lang"))
    out = curation.stratified_sample(
        df, {"a": 50, "b": 10}, "lang", id_col="doc_id")
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 50, "b": 10}
    # quota above the stratum size keeps the whole stratum
    out2 = curation.stratified_sample(df, {"a": 10**6}, "lang", id_col="doc_id")
    assert out2.count() == 334  # every 'a', no 'b' (default_quota=0)


def test_stratified_sample_int_quota_and_rank(spark):
    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("string").alias("lang"))
    out = curation.stratified_sample(
        df, 7, "lang", id_col="doc_id", rank_col="rank")
    rows = out.collect()
    assert len(rows) == 14
    assert sorted(r["rank"] for r in rows if r["lang"] == "0") == list(range(1, 8))
    # ranks follow hash order: rank 1 has the stratum's minimal hash60
    h = {r["doc_id"]: r["rank"] for r in rows}
    hashed = df.select(
        "doc_id", "lang", curation.hash60("doc_id", "strat").alias("h")
    ).collect()
    kept = {r["doc_id"]: r["h"] for r in hashed if r["doc_id"] in h}
    per = {}
    for r in hashed:
        per.setdefault(r["lang"], []).append((r["h"], r["doc_id"]))
    for lang, pairs in per.items():
        expect = [d for _, d in sorted(pairs)[:7]]
        got = sorted((r["doc_id"] for r in rows if r["lang"] == lang),
                     key=lambda d: kept[d])
        assert got == expect


def test_stratified_sample_chunked_matches_unchunked(spark):
    df = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, "rare").otherwise("hot").alias("lang"))
    plain = curation.stratified_sample(
        df, {"hot": 1234, "rare": 77}, "lang", rank_col="rank")
    chunked = curation.stratified_sample(
        df, {"hot": 1234, "rare": 77}, "lang", rank_col="rank", chunk_bits=3)
    assert plain.exceptAll(chunked).count() == 0
    assert chunked.exceptAll(plain).count() == 0
    shuffled = curation.stratified_sample(
        df.repartition(13), {"hot": 1234, "rare": 77}, "lang",
        rank_col="rank", chunk_bits=3, broadcast_carry=False)
    assert plain.exceptAll(shuffled).count() == 0


def test_stratified_sample_validation(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"),
                                F.lit("x").alias("lang"))
    with pytest.raises(ValueError, match="quota"):
        curation.stratified_sample(df, {"x": -1}, "lang")
    with pytest.raises(ValueError, match="quota"):
        curation.stratified_sample(df, -5, "lang")
    with pytest.raises(ValueError, match="chunk_bits"):
        curation.stratified_sample(df, 5, "lang", chunk_bits=0)


def test_stratified_sample_rank_col_collision_raises(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"),
                                F.lit("x").alias("lang"),
                                F.lit(0).alias("rank"))
    with pytest.raises(ValueError, match="rank_col"):
        curation.stratified_sample(df, 5, "lang", rank_col="rank")
