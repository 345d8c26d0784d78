"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The flagship measurement is the north-star pipeline (as-of join + lag/lead +
sessionize + backfill + Arrow embedding kernel) over a synthetic transcript
corpus generated distributed-side (towhee_spark.synth.transcripts_spark),
reported as turns/sec. Driver-table queries cover the relational/dedup/
similarity surface. Every timing forces full computation through the noop
sink (count() would let Catalyst prune the feature columns away).

Scaling evidence (local[8] vs local[32]) is produced by
tools/bench_scaling.py, which shells out to this file per parallelism level.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _host_speed_probe() -> float:
    """Deterministic single-core canary: seconds for a fixed 1e7-iteration
    Python add loop. ~0.6 s on this host when healthy; round-4 measured a
    persistent ~2x-degraded window (1.2 s) that also slowed every Spark
    phase uniformly — recording the probe lets round-over-round bench
    numbers be host-normalized instead of misread as plan regressions."""
    t0 = time.perf_counter()
    x = 0
    for i in range(10**7):
        x += i
    return round(time.perf_counter() - t0, 3)


def _cpu_sample() -> tuple[int, ...]:
    with open("/proc/stat") as f:
        return tuple(int(x) for x in f.readline().split()[1:9])


def _cpu_pcts(a: tuple[int, ...], b: tuple[int, ...]) -> dict[str, float]:
    """user/sys/steal as % of elapsed jiffies between two /proc/stat
    samples. Purpose: round-4 observed a hypervisor-starvation mode where
    32-vCPU Spark runs go 10-100x slow with ~69% SYSTEM time (guest
    spinlock lock-holder preemption; dmesg: 'hrtimer: interrupt took
    53ms') while local[8] runs are normal — embedding the host state in
    the JSON lets a degraded flagship number be read as host, not plan
    (BENCH/BASELINE.md 'Host-degradation window')."""
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    return {
        "user_pct": round(100 * (d[0] + d[1]) / tot, 1),
        "sys_pct": round(100 * d[2] / tot, 1),
        "steal_pct": round(100 * d[7] / tot, 1) if len(d) > 7 else 0.0,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_convs = int(os.environ.get("BENCH_CONVS", "200000"))  # ≈6.3M turns

    from towhee_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))

    import __spark_entry__ as entry

    from towhee_spark import asof_join, lag_lead, locf, sessionize
    from towhee_spark.kernels import embed_text_udf
    from towhee_spark.layout import repartition_by_key
    from towhee_spark.synth import transcripts_spark

    from pyspark.sql import functions as F

    host_probe = _host_speed_probe()

    timings: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        # warm once (codegen + python workers), report best of 2 — cold
        # compile costs are session artifacts, not plan properties
        fn()
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)

    # --- north-star: synthetic transcript feature pipeline ---------------
    # Every phase is timed separately so the headline DECOMPOSES: corpus
    # generation and the first (cold: JVM codegen + 32 python workers) run
    # are session artifacts, not pipeline throughput — reporting them
    # explains why a cold single-shot measurement reads ~10x slower than the
    # warm number (BENCH/BASELINE.md "headline reconciliation").
    t0 = time.perf_counter()
    corpus = transcripts_spark(spark, n_convs=n_convs, partitions=cpus * 2)
    corpus = repartition_by_key(corpus, "conv_id", num_partitions=cpus * 2).cache()
    n_turns = corpus.count()  # materialize cache outside the timing
    corpus_gen_sec = round(time.perf_counter() - t0, 3)

    ctx = corpus.filter(F.col("turn_idx") % 5 == 0).select(
        "conv_id", "ts", F.length("text").cast("double").alias("ctx_score")
    )

    def flagship_prefix(upto: int):
        j = asof_join(corpus, ctx, direction="backward", tolerance=3600.0)
        if upto >= 1:
            j = j.withColumn("text_len", F.length("text"))
            j = lag_lead(j, ["text_len"], [1, 2, -1])
        if upto >= 2:
            j = locf(j, ["tool"])
        if upto >= 3:
            j = sessionize(j, gap=1800.0, seq_out="session_seq")
        if upto >= 4:
            j = j.withColumn("emb", embed_text_udf(dim=32)(F.col("text")))
        return j

    def flagship_pipeline():
        force(flagship_prefix(4))

    # first run boots Python workers + codegen (one-time session cost that
    # would otherwise be billed to whichever parallelism level runs first);
    # report it as cold_first_run_sec, then best of 2 warm runs
    t0 = time.perf_counter()
    flagship_pipeline()
    cold_first_run_sec = round(time.perf_counter() - t0, 3)
    runs = []
    cpu0 = _cpu_sample()
    for _ in range(3):  # best-of-3: the host shows minute-scale
        # noisy-neighbor spikes (BENCH/BASELINE.md); identical-plan replays
        # have measured 4.9 s and 67 s in one session
        t0 = time.perf_counter()
        flagship_pipeline()
        runs.append(round(time.perf_counter() - t0, 3))
    host_cpu = _cpu_pcts(cpu0, _cpu_sample())
    # SELF-HEAL (round-4 finding): the hypervisor-starvation window is
    # triggered by the burst START and decays over ~2 min — a single bench
    # invocation (the driver's) lands its flagship phase squarely inside
    # it (measured warm runs [63, 6.0, 5.6]: the first replay absorbed the
    # tail). While the window is still visibly open (sys%>40 or steal%>5
    # across the replays), keep replaying — up to 5 extra runs — and
    # report every run + the LAST window's telemetry, so the steady-state
    # number survives a degraded start without hiding the degradation.
    extra = 0
    while (host_cpu["sys_pct"] > 40 or host_cpu["steal_pct"] > 5) and extra < 5:
        cpu0 = _cpu_sample()
        t0 = time.perf_counter()
        flagship_pipeline()
        runs.append(round(time.perf_counter() - t0, 3))
        host_cpu = _cpu_pcts(cpu0, _cpu_sample())
        extra += 1
    timings["flagship_synth"] = min(runs)
    turns_per_sec = round(n_turns / timings["flagship_synth"], 1)

    # cumulative warm cost of each pipeline prefix (one pass each): shows
    # where the flagship time goes (asof → +lag/lead → +locf → +sessionize
    # → +embed kernel)
    stage_names = ["asof", "lag_lead", "locf", "sessionize", "embed"]
    stages_cum: dict[str, float] = {}
    for i, sname in enumerate(stage_names):
        t0 = time.perf_counter()
        force(flagship_prefix(i))
        stages_cum[sname] = round(time.perf_counter() - t0, 3)

    # range_agg production shapes on the big synth corpus: spine = every
    # turn, trailing 1 h window (~hundreds of events per window at synth
    # cadence). The window impl re-scans its sliding frame per row —
    # O(rows · window); the prefix sweep is O(n log n) regardless of
    # window width, so the gap widens with window span (the reason both
    # exist; see temporal.range_agg docstring).
    corpus_tl = corpus.withColumn("tl", F.length("text").cast("long"))
    ra_spine = corpus.select("conv_id", "turn_idx", "ts")
    ra_aggs = {"n": ("count", "*"), "s": ("sum", "tl")}
    from towhee_spark.temporal import range_agg as _range_agg
    timed("prod_range_agg_window_1h", lambda: force(_range_agg(
        ra_spine, corpus_tl, window_seconds=3600.0, aggs=ra_aggs)))
    timed("prod_range_agg_prefix_1h", lambda: force(_range_agg(
        ra_spine, corpus_tl, window_seconds=3600.0, aggs=ra_aggs,
        impl="prefix", spine_id=("conv_id", "turn_idx"))))

    # --- driver-table headline queries ------------------------------------
    # each query's plan is built ONCE (dedup builders cache their shingle/
    # signature frames; repeated builds would re-cache), timed warm, then its
    # cached intermediates are released so storage doesn't accumulate
    from towhee_spark.functions.dedup import release_cached

    def timed_df(name: str, builder) -> None:
        d = builder()
        timed(name, lambda: force(d))
        release_cached(d)

    qs = entry.queries()
    for name in [
        "asof_backward",
        "asof_static",
        "asof_chunked",
        "lag_lead",
        "locf_chunked",
        "sessionize",
        "sessionize_chunked",
        "session_stats",
        "towhee_window_sliding",
        "towhee_window_sliding_chunked",
        "towhee_time_window",
        "towhee_time_window_exact",
        "towhee_time_window_exact_chunked",
        "tpch_q1",
        "tpch_q5ish",
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_ngram_capped",
        "minhash_lsh",
        "simhash_pairs",
        "simhash_weighted",
        "simhash_permuted",
        "embedding_neardup",
        "similarity_topk",
        "scan_topk",
        "lsh_topk",
        "ivf_topk",
        "bm25_topk",
        "tfidf_terms",
        "rrf_hybrid",
        "decontaminate",
        "bloom_decontaminate",
        "hash_split",
        "sample_by_hash",
        "gopher_quality",
        "curated_corpus",
        "heavy_hitters",
        "quality_quantile",
        "embed_text",
        "rag_search",
        "rag_search_lsh",
        "text_stats",
        "text_repetition",
        "pii_scrub",
        "duplicate_spans",
        "strip_spans",
        "unigram_ppl",
        "token_budget",
        "neardup_static",
        "pack_sequences",
        "semdedup",
        "pq_topk",
        "ivfpq_topk",
        "classifier_score",
        "dsir_select",
        "bigram_ppl",
        "kmeans_assign",
        "pooled_embeddings",
        "shard_layout",
        "quantized_embeddings",
        "ivfsq_topk",
        "ann_recall",
        "domain_mixture",
        "hard_negatives",
        "hll_registers",
        "conv_features",
        "role_transitions",
        "sft_examples",
        # curriculum's B−1-row boundary action runs once at plan build
        # (the ivf_topk train-at-build treatment); the row times the scan
        "curriculum",
        "data_card",
        "preference_pairs",
        "truncate_context",
        "tool_chains",
        "canned_responses",
        "self_repetition",
        "conv_dedup",
        "conv_neardup",
        "sft_corpus",
        "length_bias",
        "refusals",
        "truncate_context_chunked",
        "range_features",
        "range_features_prefix",
        "range_features_prefix_chunked",
        "multi_range_features",
        "pit_enrich",
        "interval_label",
        "scd_intervals",
        "hll_sliding",
        "last_k_ctx",
        "stratified",
        "stratified_chunked",
        "class_weights",
        "cohort_retention",
        "future_features",
        "future_features_prefix",
        "range_quantiles",
        "feature_matrix",
        "calendar_features",
        "skew_report",
        "range_zscore",
        "lifetime_features",
        "lifetime_features_chunked",
        "target_encoding_timesafe",
        "session_features",
        "asof_nearest",
        "multi_future_features",
        "ecdf_features",
        "join_coverage",
        "rows_features",
    ]:
        timed_df(name, lambda n=name: qs[n](spark, sf_dir))

    # tree_flatten's doubling rounds materialize at plan build (lazy
    # localCheckpoints are scheduled under AQE), so the honest number
    # times build + force together (the dedup_groups treatment)
    timed("tree_flatten_full",
          lambda: force(qs["tree_flatten"](spark, sf_dir)))

    # tokenize/token_budget_wp TRAIN their vocab at plan build (one action,
    # like ivf_topk's centroid train) — the _full rows time train + scan
    timed("tokenize_full", lambda: force(qs["tokenize"](spark, sf_dir)))
    timed("token_budget_wp_full",
          lambda: force(qs["token_budget_wp"](spark, sf_dir)))
    # BPE train is 24 driver round-trips (one pair aggregate each) — the
    # _full row is dominated by train latency, the prod row below times
    # the recurring encode scan against a pre-trained merge list
    timed("bpe_tokenize_full", lambda: force(qs["bpe_tokenize"](spark, sf_dir)))
    timed("encode_ids_full", lambda: force(qs["encode_ids"](spark, sf_dir)))
    timed("pack_wp_full", lambda: force(qs["pack_wp"](spark, sf_dir)))
    timed("chunk_ids_full", lambda: force(qs["chunk_ids"](spark, sf_dir)))
    timed("packed_shards_full",
          lambda: force(qs["packed_shards"](spark, sf_dir)))
    timed("packed_spans_full",
          lambda: force(qs["packed_spans"](spark, sf_dir)))

    # dedup_groups is ITERATIVE (large-star/small-star rounds run at plan
    # build), so the honest number times build + force together — a
    # timed_df row would bill only the final star join
    timed("dedup_groups_full", lambda: force(qs["dedup_groups"](spark, sf_dir)))
    # dedup_best builds the same CC at plan time — bench it _full likewise
    timed("dedup_best_full", lambda: force(qs["dedup_best"](spark, sf_dir)))

    # --- PRODUCTION configs next to their oracle-hardened gate configs ----
    # (VERDICT r2: oracle-determinism configs — minhash 64 bands/exact
    # verify, md5-parity embed — read as regressions unless the production
    # shapes are benched alongside)
    from towhee_spark.functions import dedup as _dedup
    from towhee_spark.kernels import embed_text_udf as _crc32_udf

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    timed_df("prod_minhash_lsh_16x4", lambda: _dedup.minhash_lsh_pairs(
        docs, bands=16, threshold=0.8, verify="estimate"))
    timed_df("prod_embedding_neardup_16x16", lambda: _dedup.embedding_neardup_pairs(
        embs, threshold=0.95, dim=64))
    timed_df("prod_embed_text_crc32", lambda: docs.select(
        "doc_id", _crc32_udf(dim=32)(F.col("text")).alias("e")))
    # simhash production shape (VERDICT r3 ask #2): xxhash64 sketch (the
    # gate pins md5-parity for the oracle) at the default 63-bit/8-block
    # sizing — candidates ∝ blocks·n²/2^(bits/blocks), see
    # dedup._simhash_candidates for the per-corpus segment-width rule
    timed_df("prod_simhash_xxhash64", lambda: _dedup.simhash_jaccard_pairs(
        docs, threshold=0.5, hash="xxhash64"))
    # conversation near-dup, LSH tier (gate pins the exact inverted-index
    # path; 1-row bands because conversation Jaccard sits low — see
    # transcripts.conv_neardup_pairs)
    from towhee_spark.functions import transcripts as _tr
    from towhee_spark.sources.tables import (
        load_events as _lev, transcripts_from_events as _tfe)
    timed_df("prod_conv_neardup_lsh", lambda: _tr.conv_neardup_pairs(
        _tfe(_lev(spark, sf_dir)), threshold=0.14, method="lsh"))
    timed_df("prod_simhash_weighted_xxhash64", lambda: _dedup.simhash_sketch(
        docs, "doc_id", "text", ngram=3, hash="xxhash64", weight="count"
    ).select(F.col("id").alias("doc_id"), "simhash"))
    timed_df("prod_simhash_permuted_xxhash64", lambda: _dedup.simhash_pairs_permuted(
        docs, "doc_id", "text", max_hamming=4, blocks=6, ngram=3))
    # RAG LSH-index path with Arrow bucket kernel (gate pins impl="expr"
    # for the SQL-mirror oracle; arrow is the production signature path)
    # streaming near-dup front door, production shape: Arrow signature
    # kernel + crc32 base hash (the gate pins impl="expr"+md5 for the
    # SQL-mirror oracle; expr runs the shingle slice in the interpreted
    # HOF evaluator)
    from towhee_spark.streaming.ops import stream_neardup_static as _snd
    timed_df("prod_neardup_static_arrow_crc32", lambda: _snd(
        docs.filter(F.col("doc_id") % 7 == 3),
        ref=docs.filter(F.col("doc_id") % 7 != 3),
        num_hashes=32, bands=8, threshold=0.5, hash="crc32", impl="arrow"))
    timed_df("prod_rag_search_lsh_arrow",
             lambda: entry.q_rag_search_lsh(spark, sf_dir, impl="arrow"))
    # IVF production shape: Arrow matmul assignment, 64 cells probe 8
    # (gate pins nlist=8 expr for the SQL-mirror oracle). ivf_topk's
    # centroid TRAIN action runs at plan-construction time (inside the
    # untimed builder), so the ivf rows time probe+rerank only — the train
    # scan is reported separately below so the full per-invocation cost is
    # train + probe (code-review finding)
    from towhee_spark.functions import similarity as _sim
    # SemDeDup production shape: Arrow assignment, 16 cells (gate pins
    # nlist=8 expr for the SQL-mirror oracle); per-cell candidate volume
    # ~ n^2/(2*nlist) — grow nlist with the corpus (see dedup.semdedup)
    timed_df("prod_semdedup_arrow", lambda: _dedup.semdedup(
        embs, nlist=16, threshold=0.3, impl="arrow"))
    # PQ production shape: Arrow encode kernel, 16 codes x 8 subspaces
    # (gate pins m=4 ksub=8 expr for the SQL-mirror oracle); the encode is
    # one matmul per batch per subspace, the ADC scan is native lookups
    timed_df("prod_pq_topk_arrow", lambda: _sim.pq_adc_topk(
        embs.filter(F.col("vec_id") < 10), embs, k=3,
        m=8, ksub=16, impl="arrow"))
    # IVF-PQ production shape: 64 cells probe 8, 8x16 PQ — the
    # compressed inverted file (codes scanned: ~nprobe/nlist of corpus)
    timed_df("prod_ivfpq_topk_arrow", lambda: _sim.ivfpq_topk(
        embs.filter(F.col("vec_id") < 10), embs, k=3,
        nlist=64, nprobe=8, m=8, ksub=16, impl="arrow"))
    timed_df("prod_ivfsq_topk_arrow", lambda: _sim.ivfsq_topk(
        embs.filter(F.col("vec_id") < 10), embs, k=3,
        nlist=64, nprobe=8, impl="arrow"))
    timed_df("prod_ivf_topk_arrow", lambda: _sim.ivf_topk(
        embs.filter(F.col("vec_id") < 10), embs, k=3,
        nlist=64, nprobe=8, impl="arrow"))
    # hard-negative mining production shape: LSH-bucketed candidates
    # (arrow signatures), band-filtered then ranked — the gate row runs
    # the exact-scan method over the same band
    timed_df("prod_hard_negatives_lsh", lambda: _sim.hard_negatives(
        embs.filter(F.col("vec_id") < 1000), embs, k=8, band=(0.2, 0.9),
        method="lsh", planes=10, probes=4, dim=64, impl="arrow"))
    # k-means production shape: Arrow assignment kernel, 16 cells (gate
    # pins k=8 expr for the unrolled SQL-mirror oracle). kmeans_train is
    # ITERATIVE (one aggregate job per Lloyd round at plan build), so the
    # honest number times train + assign together, like dedup_groups_full
    from towhee_spark.functions import clustering as _clu
    timed("prod_kmeans_arrow_full", lambda: force(_clu.kmeans_assign(
        embs, _clu.kmeans_train(embs, k=16, iters=2, impl="arrow"),
        impl="arrow", score_col="cos6")))
    # WordPiece production shape: Arrow greedy kernel over a pre-trained
    # vocab (train amortizes across runs — benched separately as the gate
    # _full row, which pins impl="expr" + train for the SQL mirror)
    from towhee_spark.functions import tokenize as _tok
    _wp_vocab = _tok.wordpiece_vocab(docs, n_words=256, n_suffix=64)
    timed_df("prod_tokenize_arrow", lambda: _tok.wordpiece_tokenize(
        docs, _wp_vocab, impl="arrow"))
    timed_df("prod_tokenize_expr", lambda: _tok.wordpiece_tokenize(
        docs, _wp_vocab, impl="expr"))
    _bpe_merges = _tok.bpe_train(docs, n_merges=24)
    timed_df("prod_bpe_encode_arrow", lambda: _tok.bpe_encode(
        docs, _bpe_merges, impl="arrow"))
    timed_df("prod_bpe_encode_expr", lambda: _tok.bpe_encode(
        docs, _bpe_merges, impl="expr"))
    # piece→id + model-token packing: recurring-scan cost over the
    # production Arrow tokenizer (id table trained once outside the timer)
    _wp_pieces = _tok.wordpiece_tokenize(docs, _wp_vocab, impl="arrow")
    # materialize the id table once (encode_ids re-collects its id_table
    # per plan build — keep that to a tiny local frame, not a re-tokenize)
    _idt = spark.createDataFrame(
        _tok.piece_id_table(_wp_pieces).collect(),
        "piece string, piece_id int")
    timed_df("prod_encode_ids_arrow",
             lambda: _tok.encode_ids(_wp_pieces, _idt, impl="arrow"))
    from towhee_spark.functions import packing as _pack
    timed_df("prod_pack_wp", lambda: _pack.pack_sequences(
        _wp_pieces.select("doc_id", "n_tokens"),
        seq_len=64, count_col="n_tokens"))
    # full shard materialization with doc spans, over the production
    # Arrow encode (id table pre-materialized above)
    _wp_enc = _tok.encode_ids(_wp_pieces, _idt, impl="arrow")
    timed_df("prod_materialize_spans", lambda: _pack.materialize_packs(
        _wp_enc, seq_len=64, with_spans=True))
    # the epoch-repeat mixture production shape: lang mix over documents
    from towhee_spark.functions import curation as _cur
    timed_df("prod_domain_mixture", lambda: _cur.mixture_sample(
        docs, rates={"en": 0.4, "de": 2.25, "fr": 3.0, "zh": 1.6},
        strata_col="lang", default_rate=0.5))
    # --- tabular feature engineering (functions/features.py) ---
    from towhee_spark.functions import features as _fe
    _ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    timed_df("target_encoding_loo",
             lambda: _fe.target_encode(_ev, "event_type", "value",
                                       smoothing=20, loo=True))
    timed_df("hashed_features", lambda: _fe.feature_hash(
        docs, "doc_id", ["lang", "source", "n_chars"],
        n_features=64, numeric=["n_chars"]))
    timed_df("scaled_features", lambda: _fe.scale(
        _fe.scale(_ev, "value", "zscore", by="event_type", out_col="z"),
        "value", method="minmax", out_col="mm"))
    from towhee_spark import temporal as _te
    timed_df("resampled_linear_1h", lambda: _te.resample_grid(
        _ev, by="user_id", ts="ts", values=["value"],
        every=3600.0, method="linear"))
    timed_df("fuzzy_pairs_p96_k5", lambda: _dedup.fuzzy_pairs(
        docs, "doc_id", "text", max_dist=5, prefix=96))
    timed_df("funnel_tool_5step", lambda: qs["funnel"](spark, sf_dir))
    from towhee_spark.functions import lm as _lm
    timed_df("pmi_pairs_w4", lambda: _lm.cooccurrence_pmi(
        docs, window=4, min_pair_count=20))
    timed_df("ewma_w32", lambda: _te.ewma(
        _ev, by="user_id", ts="ts", col="value", alpha=0.3, w=32,
        order_extra=("event_id",)))
    # --- feature statistics / drift / CV-fold batch ---
    for nm in ("woe_iv", "count_encoding", "drift_psi", "corr_matrix",
               "time_folds", "leakage_audit"):
        timed_df(nm, lambda n=nm: qs[n](spark, sf_dir))
    timed("prod_ivf_train_scan", lambda: (
        embs.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
        .where(F.col("cv").isNotNull())
        .withColumn("__h", _sim._md5_id_hash(F.col("cid")))
        .orderBy("__h", "cid").limit(64).collect()))

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "turns/sec feature-engineering throughput (flagship pipeline)",
                "value": turns_per_sec,
                "unit": "turns/sec",
                "queries": timings,
                "sf": sf_dir,
                "cpus": cpus,
                "n_turns": n_turns,
                "total_sec": total,
                "corpus_gen_sec": corpus_gen_sec,
                "host_speed_probe_sec": host_probe,
                "cold_first_run_sec": cold_first_run_sec,
                "flagship_warm_runs": runs,
                "flagship_stages_cum_sec": stages_cum,
                "host_cpu_during_flagship": host_cpu,
            }
        )
    )
    # VERDICT r04 ask #7: the driver truncates the BENCH artifact to its
    # TAIL, which in r04 cut the front of the (single) JSON line and with
    # it the headline metric. Emit a second, compact line AFTER the full
    # one — whatever suffix the driver keeps always parses and carries the
    # flagship number plus the ten heaviest queries.
    top10 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "turns/sec feature-engineering throughput (flagship pipeline)",
                "value": turns_per_sec,
                "unit": "turns/sec",
                "sf": sf_dir,
                "cpus": cpus,
                "n_turns": n_turns,
                "total_sec": total,
                "queries": top10,
                "note": "compact tail line (full per-query map on the previous line)",
            }
        )
    )


if __name__ == "__main__":
    main()
