"""Named pipeline registry — parity with Towhee's AutoPipes
(towhee/runtime/auto_pipes.py:43-86: `AutoPipes.pipeline(name)` returns a
ready pipeline built by a registered builder module; builtin example
towhee/pipelines/sentence_embedding.py:61-83).

Builders here are plain functions DataFrame → DataFrame, resolved locally
(no hub download), configured via keyword args (the AutoConfig analogue)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PIPELINES: dict[str, Callable[..., Callable[[DataFrame], DataFrame]]] = {}


def register_pipeline(name: str):
    def deco(builder):
        _PIPELINES[name] = builder
        return builder

    return deco


def pipeline(name: str, **config) -> Callable[[DataFrame], DataFrame]:
    """AutoPipes.pipeline(name, **config) → a DataFrame transform."""
    if name not in _PIPELINES:
        raise KeyError(f"pipeline {name!r} not registered; have {sorted(_PIPELINES)}")
    return _PIPELINES[name](**config)


@register_pipeline("sentence_embedding")
def _sentence_embedding(text_col: str = "text", out_col: str = "embedding", dim: int = 64):
    """Mirror of the builtin sentence_embedding AutoPipe: text → vector,
    model swapped for the deterministic hashed-BoW Arrow kernel."""
    from towhee_spark.kernels import embed_text_udf  # noqa: PLC0415

    def apply(df: DataFrame) -> DataFrame:
        return df.withColumn(out_col, embed_text_udf(dim=dim)(F.col(text_col)))

    return apply


@register_pipeline("text_dedup")
def _text_dedup(id_col: str = "doc_id", text_col: str = "text", threshold: float = 0.8):
    """Corpus near-dedup: exact pass then MinHash-LSH pair detection."""
    from towhee_spark.functions import dedup  # noqa: PLC0415

    def apply(df: DataFrame) -> DataFrame:
        return dedup.minhash_lsh_pairs(df, id_col=id_col, text_col=text_col, threshold=threshold)

    return apply


@register_pipeline("transcript_features")
def _transcript_features(gap: float = 1800.0, tolerance: float | None = 3600.0,
                         embed_dim: int = 32, context: DataFrame | None = None):
    """The north-star feature pipeline: as-of context join + lag/lead +
    LOCF + sessionize + per-turn embedding over a transcript table."""
    from towhee_spark import asof_join, lag_lead, locf, sessionize  # noqa: PLC0415
    from towhee_spark.kernels import embed_text_udf  # noqa: PLC0415

    def apply(df: DataFrame) -> DataFrame:
        j = df
        if context is not None:
            j = asof_join(j, context, direction="backward", tolerance=tolerance)
        j = j.withColumn("text_len", F.length("text"))
        j = lag_lead(j, ["text_len"], [1, 2, -1])
        j = locf(j, ["tool"])
        j = sessionize(j, gap=gap, seq_out="session_seq")
        return j.withColumn("embedding", embed_text_udf(dim=embed_dim)(F.col("text")))

    return apply


@register_pipeline("image_embedding")
def _image_embedding(content_col: str = "content", out_col: str = "embedding",
                     dim: int = 32, height: int = 8, width: int = 8):
    """image_embedding AutoPipe shape (ref hub_ops/image_embedding.py:
    decode → model → vector): stub codec + histogram model, real Arrow
    plumbing — swap the two mapInPandas kernels for cv2/timm when
    available."""
    from towhee_spark.functions import multimodal  # noqa: PLC0415

    def apply(df: DataFrame) -> DataFrame:
        img = multimodal.decode_images(df, content_col=content_col,
                                       height=height, width=width)
        return multimodal.image_embed(
            img, image_col="image", out_col=out_col, dim=dim).drop("image")

    return apply


@register_pipeline("video_copy_detection")
def _video_copy_detection(content_col: str = "content",
                          id_cols: tuple[str, ...] = ("path",),
                          n_frames: int = 4, dim: int = 32,
                          out_col: str = "embedding"):
    """Video fingerprint shape (ref video_decode.ffmpeg → image_embedding →
    aggregate, the video-copy-detection tutorial flow): sample frames,
    embed each, mean-pool to ONE vector per video — all native after the
    frame kernels (posexplode → per-dim avg → array_sort(collect_list)
    reassembly; collect_list has no order guarantee, the struct sort
    restores it)."""
    from towhee_spark.functions import multimodal  # noqa: PLC0415

    def apply(df: DataFrame) -> DataFrame:
        frames = multimodal.sample_video_frames(
            df, content_col=content_col, id_cols=id_cols, n_frames=n_frames)
        emb = multimodal.image_embed(
            frames, image_col="frame", out_col="__femb", dim=dim)
        ex = emb.select(*id_cols, F.posexplode("__femb").alias("pos", "v"))
        per_dim = ex.groupBy(*id_cols, "pos").agg(F.avg("v").alias("v"))
        return per_dim.groupBy(*id_cols).agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))),
                lambda s: s["v"].cast("float"),
            ).alias(out_col)
        )

    return apply


@register_pipeline("rag_qa")
def _rag_qa(docs: DataFrame = None, id_col: str = "doc_id",
            text_col: str = "text", k: int = 2, dim: int = 32,
            chunk_size: int = 12, overlap: int = 4,
            index: str = "exact", nlist: int = 16, nprobe: int = 4):
    """Retrieval-augmented QA shape (ref data_source docstring flow +
    prompt.question_answer + LLM.*): chunk+embed the corpus, retrieve the
    top-k chunks per question, assemble a grounded prompt JVM-side,
    complete with the batched LLM op (offline fake client — swap via
    llm_map(client_factory=)). Input frame: (query_id, question).

    ``index``: "exact" (brute-force cosine — small corpora/gold runs) or
    "ivf" (similarity.ivf_topk coarse cells, nlist/nprobe — the huge-index
    shape; cf. the lsh variant exercised by the rag_search_lsh gate)."""
    if docs is None:
        raise ValueError("rag_qa needs docs= (the corpus DataFrame)")
    if index not in ("exact", "ivf"):
        raise ValueError(f"rag_qa index must be 'exact' or 'ivf', got {index!r}")
    from towhee_spark.functions import similarity  # noqa: PLC0415
    from towhee_spark.functions.llm import llm_map  # noqa: PLC0415
    from towhee_spark.functions.prompt import template  # noqa: PLC0415
    from towhee_spark.functions.text import chunk_text  # noqa: PLC0415
    from towhee_spark.kernels import embed_text_udf  # noqa: PLC0415

    emb = embed_text_udf(dim=dim)

    def apply(qdf: DataFrame) -> DataFrame:
        ch = chunk_text(text_col, size=chunk_size, overlap=overlap)
        cindex = (
            docs.select(F.col(id_col), F.explode(ch).alias("c"))
            .select(
                id_col, F.col("c.start").alias("start"),
                F.col("c.chunk").alias("chunk"),
            )
            .withColumn(
                "cid",
                F.col(id_col) * 1_000_000_000 + F.col("start"),
            )
            .withColumn("cv", emb(F.col("chunk")))
        )
        qe = qdf.withColumn("qv", emb(F.col("question")))
        if index == "ivf":
            top = similarity.ivf_topk(
                qe, cindex, k=k, q_id="query_id", q_vec="qv",
                i_id="cid", i_vec="cv", exclude_self=False,
                nlist=nlist, nprobe=nprobe,
            )
        else:
            top = similarity.brute_force_topk(
                qe, cindex, k=k, q_id="query_id", q_vec="qv",
                i_id="cid", i_vec="cv", exclude_self=False,
            )
        ctx = (
            top.join(cindex.select("cid", "chunk"), top.match_id == F.col("cid"))
            .groupBy("query_id")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("rank", "chunk"))),
                        lambda s: s["chunk"],
                    ),
                    "\n",
                ).alias("context")
            )
        )
        prompted = qdf.join(ctx, "query_id", "left").withColumn(
            "prompt",
            template(
                "Answer from the context.\nContext:\n{context}\nQ: {question}\nA:",
                context=F.coalesce(F.col("context"), F.lit("")),
                question=F.col("question"),
            ),
        )
        return llm_map(prompted, in_col="prompt", out_col="answer")

    return apply


@register_pipeline("rag_ingest")
def _rag_ingest(id_col: str = "doc_id", text_col: str = "text",
                chunk_size: int = 64, overlap: int = 16, dim: int = 64):
    """RAG ingestion shape (ref data_source docstring pipeline: loader →
    text_splitter → sentence_embedding → np_normalize → ann_insert):
    fixed-window chunking + hashed-BoW Arrow embedding; feed the result to
    sources.io.write_vectors for the ann_insert leg."""
    from towhee_spark.functions.text import chunk_text  # noqa: PLC0415
    from towhee_spark.kernels import embed_text_udf  # noqa: PLC0415

    def apply(df: DataFrame) -> DataFrame:
        ch = chunk_text(text_col, size=chunk_size, overlap=overlap)
        rows = df.select(F.col(id_col), F.explode(ch).alias("c")).select(
            id_col, F.col("c.start").alias("chunk_start"), F.col("c.chunk").alias("chunk")
        )
        return rows.withColumn("embedding", embed_text_udf(dim=dim)(F.col("chunk")))

    return apply


@register_pipeline("pretraining_curation")
def _pretraining_curation(benchmark: DataFrame | None = None,
                          id_col: str = "doc_id", text_col: str = "text",
                          min_words: int = 50,
                          decon_n: int = 3, decon_threshold: int = 3,
                          neardup_threshold: float | None = None,
                          split_weights: dict | None = None,
                          split_salt: str = "split"):
    """End-to-end pretraining corpus curation — the composite a pipeline
    user runs as ONE call, each stage an individually-gated operator:

    1. Gopher quality gate (``text.gopher_rules().keep`` — one codegen
       projection, evaluated at the scan)
    2. exact dedup, min-id survivor per normalized text (one hash agg +
       survivor semi-join)
    3. optional MinHash-LSH near-dup drop (``neardup_threshold`` set →
       pairs → connected components → min-id survivors)
    4. benchmark decontamination (broadcast shingle set, drop flagged)
    5. deterministic train/val/test ``hash_split``

    Stages apply SEQUENTIALLY: dedup survivors are chosen among
    quality-kept docs, contamination is checked on dedup survivors —
    the order a production curation run uses (cheapest filters first,
    so each later stage scans a smaller corpus). Survivor rows keep all
    original columns + ``split``."""
    from towhee_spark.functions import curation, dedup, text  # noqa: PLC0415

    def apply(df: DataFrame) -> DataFrame:
        from towhee_spark.functions.dedup import _with_cached_deps  # noqa: PLC0415

        deps = []
        # NOT fanned out (layout.fan_out): A/B'd at sf0.1 — curated_corpus
        # 1.38 -> 1.57 s with a fan-out here (the regex/hash scan work is
        # cheap; the extra exchange only adds overhead)
        kept = df.filter(
            text.gopher_rules(text_col, min_words=min_words).getField("keep"))
        ex = dedup.dedup_exact(kept, id_col, text_col).select(id_col)
        kept = kept.join(ex, id_col)
        if neardup_threshold is not None:
            pairs = dedup.minhash_lsh_pairs(
                kept, id_col=id_col, text_col=text_col,
                threshold=neardup_threshold)
            # the pairs frame carries cached deps (MinHash signatures) —
            # propagate them to the preset's output or they leak
            # (the rrf_fuse combinator rule, CLAUDE.md round 4)
            deps += getattr(pairs, "_cached_deps", [])
            surv = dedup.dedup_survivors(kept, pairs, id_col).select(id_col)
            kept = kept.join(surv, id_col)
        if benchmark is not None:
            flagged = curation.decontaminate(
                kept, benchmark, n=decon_n, threshold=decon_threshold,
                id_col=id_col, text_col=text_col).select(id_col)
            deps += getattr(flagged, "_cached_deps", [])
            kept = kept.join(flagged, id_col, "left_anti")
        out = curation.hash_split(
            kept, id_col=id_col, weights=split_weights, salt=split_salt)
        return _with_cached_deps(out, *deps) if deps else out

    return apply


@register_pipeline("sft_curation")
def _sft_curation(max_context_turns: int = 4,
                  canned_min_convs: int | None = None,
                  min_completion_tokens: int = 1,
                  split_weights: dict | None = None,
                  split_salt: str = "sft",
                  split_on: str = "conversation",
                  key: str = "conv_id", ts: str = "ts",
                  order_extra=("turn_idx",),
                  role_col: str = "role", text_col: str = "text",
                  response_role: str = "assistant"):
    """End-to-end transcripts → SFT corpus — the chat-data twin of
    pretraining_curation, each stage an individually-gated operator:

    1. exact CONVERSATION dedup (conv_dedup_exact: lowest-conv survivor
       per order-sensitive fingerprint — replayed/forked sessions drop)
    2. explode to (prompt, completion) pairs (sft_examples, ≤
       ``max_context_turns`` context turns)
    3. canned-completion drop (``canned_min_convs`` set → completions
       whose normalized text recurs in that many distinct SURVIVING
       conversations are removed — detection runs post-dedup so a
       replayed conversation doesn't flag its own unique completions
       as boilerplate)
    4. completion length floor (whitespace tokens ≥
       ``min_completion_tokens``)
    5. deterministic hash_split — ``split_on="conversation"`` (default)
       hashes the conv key so every example of a conversation lands in
       the SAME split (an example's prompt contains its neighbours'
       completions; splitting per example would leak train completions
       into val prompts). ``split_on="example"`` hashes example_id =
       key:order_extra[0] for iid example-level splits (pretraining-style
       corpora where examples don't share text).

    Stages apply sequentially (dedup before explode keeps the window
    pass off duplicate conversations). Output: sft_examples columns +
    example_id + split."""
    from towhee_spark.functions import curation, transcripts as tr  # noqa: PLC0415
    from towhee_spark.functions.text import normalize_text, token_count  # noqa: PLC0415

    if not order_extra:
        raise ValueError("sft_curation: order_extra must be non-empty "
                         "(example_id needs a turn coordinate)")
    if split_on not in ("conversation", "example"):
        raise ValueError("sft_curation: split_on must be 'conversation' "
                         f"or 'example', got {split_on!r}")

    def apply(df: DataFrame) -> DataFrame:
        surv = tr.conv_dedup_exact(
            df, key, ts, order_extra, role_col, text_col).select(key)
        kept = df.join(surv, key)
        ex = tr.sft_examples(
            kept, max_context_turns=max_context_turns, key=key, ts=ts,
            order_extra=order_extra, role_col=role_col, text_col=text_col,
            response_role=response_role)
        if canned_min_convs is not None:
            canned = tr.canned_responses(
                kept, min_keys=canned_min_convs, key=key, role_col=role_col,
                text_col=text_col, response_role=response_role
            ).select("response")
            ex = ex.join(
                F.broadcast(canned),
                normalize_text(ex["completion"]) == canned["response"],
                "left_anti")
        if min_completion_tokens > 0:
            ex = ex.filter(
                token_count("completion") >= min_completion_tokens)
        ex = ex.withColumn(
            "example_id",
            F.concat_ws(":", F.col(key),
                        F.col(order_extra[0]).cast("string")))
        return curation.hash_split(
            ex, id_col=key if split_on == "conversation" else "example_id",
            weights=split_weights, salt=split_salt)

    return apply


@register_pipeline("feature_matrix")
def _feature_matrix(context: dict[str, DataFrame] | None = None,
                    key: str = "conv_id", ts: str = "ts",
                    spine_filter=None,
                    feature_windows: dict[str, float] | None = None,
                    feature_aggs: dict | None = None,
                    label_horizon: float = 600.0,
                    label_aggs: dict | None = None,
                    tolerances: dict[str, float] | None = None,
                    matched_ts: bool = True):
    """End-to-end point-in-time TRAINING MATRIX — the north-rule composite
    as one call: a spine of prediction points gains backward-only features
    and forward-only labels, leakage-free on both sides by construction.

    1. ``spine_filter`` (Column) picks the prediction points from the
       event stream (default: every row).
    2. BACKWARD features: :func:`temporal.multi_range_agg` over
       ``feature_windows`` × ``feature_aggs`` — N trailing horizons in
       one exchange, open upper bound (no event at/after the as-of
       instant can leak in).
    3. Point-in-time enrichment: :func:`temporal.point_in_time_enrich`
       attaches the as-of-latest row of every ``context`` table in one
       sweep (``matched_ts=True`` keeps per-table matched timestamps so
       :func:`temporal.leakage_audit` can PROVE the no-leakage invariant
       on the finished matrix).
    4. FORWARD label: :func:`temporal.future_agg` over ``(t, t+horizon]``
       — open at the as-of instant, so a (feature, label) pair can never
       share an event.

    Cost: one key-partitioned exchange per stage (features, labels, +1
    if ``context``) — each stage is individually gated; the composite is
    gated end-to-end (``feature_matrix`` gate chains the proven oracle
    mirrors). Returns spine columns + ``{agg}_{window}`` features +
    context columns (+ ``{name}_ts``) + label columns."""
    from towhee_spark import temporal  # noqa: PLC0415

    fw = feature_windows or {"10m": 600.0}
    fa = feature_aggs or {"n_prev": ("count", "*")}
    la = label_aggs or {"n_next": ("count", "*")}

    def apply(df: DataFrame) -> DataFrame:
        spine = df.filter(spine_filter) if spine_filter is not None else df
        m = temporal.multi_range_agg(
            spine, df, on=key, ts=ts, windows=fw, aggs=fa)
        if context:
            m = temporal.point_in_time_enrich(
                m, context, on=key, ts=ts, tolerances=tolerances,
                matched_ts=matched_ts)
        return temporal.future_agg(
            m, df, on=key, ts=ts, horizon_seconds=label_horizon, aggs=la,
            impl="window")

    return apply
