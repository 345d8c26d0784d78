"""Layout (salting/hot keys) + named pipeline registry."""

import pytest
from pyspark.sql import functions as F

from towhee_spark import pipelines
from towhee_spark.layout import add_salt, hot_keys, repartition_by_key
from towhee_spark.schema import TRANSCRIPT_SCHEMA
from towhee_spark.synth import transcripts_pdf


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(transcripts_pdf(30, seed=9), schema=TRANSCRIPT_SCHEMA)


def test_hot_keys_sketch(spark, corpus_df):
    hot = hot_keys(corpus_df, threshold=50).collect()
    counts = {r.conv_id: r["count"] for r in corpus_df.groupBy("conv_id").count().collect()}
    assert {r.conv_id for r in hot} == {c for c, n in counts.items() if n > 50}


def test_add_salt_spreads_hot_only(spark, corpus_df):
    hot = hot_keys(corpus_df, threshold=50)
    salted = add_salt(corpus_df, hot=hot, buckets=8)
    agg = salted.groupBy("conv_id").agg(F.countDistinct("salted_key").alias("n")).collect()
    hot_ids = {r.conv_id for r in hot.collect()}
    for r in agg:
        if r.conv_id in hot_ids:
            assert r.n > 1, f"hot key {r.conv_id} not spread"
        else:
            assert r.n == 1
    # deterministic: same salt on re-run (checkpoint resumability)
    again = add_salt(corpus_df, hot=hot, buckets=8)
    a = {(r.conv_id, r.turn_idx): r.salted_key for r in salted.collect()}
    b = {(r.conv_id, r.turn_idx): r.salted_key for r in again.collect()}
    assert a == b


def test_suggest_chunk_seconds(spark):
    """The chunked-path adoption rule, executable: sizes chunk_seconds so
    the worst hot key's (key, chunk) groups hold ≈ target rows; None when
    nothing is hot; 0.0 (salt instead) on zero-span hot keys."""
    from towhee_spark.layout import suggest_chunk_seconds

    # hot key: 5000 rows over 1000s (5 rows/s); cold key: 10 rows
    rows = [("hot", float(i) * 0.2) for i in range(5000)]
    rows += [("cold", float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "conv_id string, ts double")
    got = suggest_chunk_seconds(
        df, hot_threshold=1000, target_rows_per_chunk=500)
    # span 999.8s / 5000 rows * 500 target ≈ 100s chunks
    assert got is not None and abs(got - 100.0) < 1.0, got
    assert suggest_chunk_seconds(
        df, hot_threshold=10_000, target_rows_per_chunk=500) is None
    zero = spark.createDataFrame(
        [("z", 5.0)] * 2000, "conv_id string, ts double")
    assert suggest_chunk_seconds(
        zero, hot_threshold=1000, target_rows_per_chunk=500) == 0.0
    # timestamp ts: same rule through the epoch-µs path
    tdf = spark.createDataFrame(rows, "conv_id string, off double").select(
        "conv_id",
        (F.lit("2026-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("off"))).alias("ts"),
    )
    got_t = suggest_chunk_seconds(
        tdf, hot_threshold=1000, target_rows_per_chunk=500)
    assert got_t is not None and abs(got_t - 100.0) < 1.0, got_t


def test_repartition_preserves_rows(spark, corpus_df):
    out = repartition_by_key(corpus_df, num_partitions=4)
    assert out.count() == corpus_df.count()
    assert out.rdd.getNumPartitions() == 4


def test_named_pipeline_transcript_features(spark, corpus_df):
    p = pipelines.pipeline("transcript_features", gap=1800.0, embed_dim=8)
    out = p(corpus_df)
    assert out.count() == corpus_df.count()
    assert {"text_len_lag1", "tool_ff", "session_seq", "embedding"} <= set(out.columns)


def test_named_pipeline_sentence_embedding(spark, corpus_df):
    p = pipelines.pipeline("sentence_embedding", dim=8)
    row = p(corpus_df).select("embedding").first()
    assert len(row.embedding) == 8
    with pytest.raises(KeyError):
        pipelines.pipeline("nope")


def test_named_pipeline_image_and_video(spark):
    """image_embedding and video_copy_detection presets: stub codecs, real
    plumbing — unit-norm image vectors; one mean-pooled vector per video,
    equal to the numpy mean of its frame embeddings."""
    import numpy as np

    binaries = spark.createDataFrame(
        [("a.jpg", b"img-a"), ("b.jpg", b"img-b")], "path string, content binary"
    )
    img = pipelines.pipeline("image_embedding", dim=16)(binaries)
    rows = img.collect()
    assert {r.path for r in rows} == {"a.jpg", "b.jpg"}
    for r in rows:
        assert len(r.embedding) == 16
        assert abs(float(np.linalg.norm(r.embedding)) - 1.0) < 1e-5

    vids = spark.createDataFrame(
        [("v1.mp4", b"vid-1"), ("v2.mp4", b"vid-2")], "path string, content binary"
    )
    vcd = pipelines.pipeline("video_copy_detection", n_frames=3, dim=8)(vids)
    got = {r.path: list(r.embedding) for r in vcd.collect()}
    assert set(got) == {"v1.mp4", "v2.mp4"} and all(len(v) == 8 for v in got.values())
    # identical content → identical fingerprint; different → different
    same = pipelines.pipeline("video_copy_detection", n_frames=3, dim=8)(
        spark.createDataFrame([("copy.mp4", b"vid-1")], "path string, content binary")
    ).first()
    assert np.allclose(list(same.embedding), got["v1.mp4"])
    assert not np.allclose(got["v1.mp4"], got["v2.mp4"])
    # fingerprint == numpy mean of the frame embeddings
    from towhee_spark.functions import multimodal

    frames = multimodal.image_embed(
        multimodal.sample_video_frames(vids, n_frames=3),
        image_col="frame", out_col="e", dim=8)
    fe = [list(r.e) for r in frames.filter(F.col("path") == "v1.mp4").collect()]
    assert np.allclose(got["v1.mp4"], np.mean(fe, axis=0), atol=1e-6)


def test_named_pipeline_rag_qa(spark):
    """rag_qa preset: retrieve → grounded prompt → batched fake LLM."""
    docs = spark.createDataFrame(
        [(1, "spark joins shuffle data across the cluster nodes fast"),
         (2, "cats purr softly when they nap in warm sunny spots")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(10, "how do spark joins move data")], "query_id long, question string"
    )
    out = pipelines.pipeline("rag_qa", docs=docs, k=1, dim=16)(qs).first()
    assert out.query_id == 10 and out.answer  # completed
    assert "spark" in out.prompt.lower() and "Context:" in out.prompt
    # IVF index variant: nprobe == nlist probes every cell, so retrieval
    # (and thus the grounded prompt) must match the exact path
    ivf = pipelines.pipeline("rag_qa", docs=docs, k=1, dim=16,
                             index="ivf", nlist=2, nprobe=2)(qs).first()
    assert ivf.prompt == out.prompt and ivf.answer
    with pytest.raises(ValueError, match="docs="):
        pipelines.pipeline("rag_qa")
    with pytest.raises(ValueError, match="index must be"):
        pipelines.pipeline("rag_qa", docs=docs, index="hnsw")


def test_data_collection_entity(spark):
    from towhee_spark.collection import DataCollection, Entity, data_loader

    df = spark.createDataFrame([(1, "a"), (2, "b")], "x long, y string")
    dc = DataCollection(df)
    assert len(dc) == 2
    assert sorted(e.x for e in dc) == [1, 2]
    dc2 = dc + DataCollection([Entity(x=3, y="c")])
    assert len(dc2) == 3
    d = dc.to_dict()
    assert sorted(d["x"]) == [1, 2] and set(d) == {"x", "y"}
    rt = DataCollection.from_dict(d)
    assert sorted(e.x for e in rt) == [1, 2]

    # round-3 conveniences: column access, copy semantics, show() grid
    assert sorted(dc["x"]) == [1, 2]
    shallow, deep = dc.copy(), dc.copy(deep=True)
    assert shallow[0] is dc[0] and deep[0] is not dc[0] and deep[0] == dc[0]
    assert Entity.from_dict({"x": 9}).x == 9
    headers, rows = dc.prepare_table_data(limit=1)
    assert headers == ["x", "y"] and len(rows) == 1
    big = DataCollection([Entity(v=list(range(100)), s="x" * 100)])
    _, brows = big.prepare_table_data()
    assert all(len(c) <= 40 for c in brows[0])  # cells truncated
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        dc.show(limit=1)
    out = buf.getvalue()
    assert "| x" in out and "showing 1 of 2" in out

    # round-4: html face of show() — escaped cells, header row, all rows
    html = dc.to_html(limit=-1)
    assert html.count("<tr>") == 3 and "<th>x</th>" in html and "<td>a</td>" in html
    esc = DataCollection([Entity(x="<b>&")])
    assert "&lt;b&gt;&amp;" in esc.to_html()
    img = DataCollection([Entity(pic=b"\x89PNG fake")])  # binary → inline img
    assert 'src="data:image/png;base64,' in img.to_html()
    jpg = DataCollection([Entity(pic=b"\xff\xd8\xff\xe0 fake")])
    assert 'src="data:image/jpeg;base64,' in jpg.to_html()
    # hash/eq contract + value-sensitive hashing (same-shape entities must
    # not all collide; unhashable cells fall back to field names)
    assert hash(Entity(x=1)) == hash(Entity(x=1.0))
    assert hash(Entity(x=1)) != hash(Entity(x=2))  # buckets spread
    assert len({Entity(x=i) for i in range(50)} ) == 50
    hash(Entity(v=[1, 2]))  # unhashable cell tolerated
    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        dc.show(tablefmt="html")
    assert "<table" in buf2.getvalue()

    # DataLoader parity: iterable + parser → distributed DataFrame
    loaded = data_loader(
        spark, range(10), parser=lambda i: (i, i * i), schema="i long, sq long"
    )
    rows = {(r.i, r.sq) for r in loaded.collect()}
    assert rows == {(i, i * i) for i in range(10)}
    assert loaded.rdd.getNumPartitions() > 1


def test_rag_ingest_pipeline(spark):
    """rag_ingest AutoPipe: chunk fan-out with overlap carry + normalized
    chunk embeddings (the loader→splitter→embedding→insert reference shape)."""
    import numpy as np
    from towhee_spark.pipelines import pipeline

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20))), (2, "short doc")],
        "doc_id long, text string",
    )
    out = pipeline("rag_ingest", chunk_size=8, overlap=2, dim=16)(docs).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    starts = sorted(r.chunk_start for r in by_doc[1])
    # stride = size - overlap; NO start 18: tokens 19..20 sit fully
    # inside chunk 12's window (subset chunks dropped - review fix)
    assert starts == [0, 6, 12]
    first = next(r for r in by_doc[1] if r.chunk_start == 0)
    assert first.chunk == " ".join(f"w{i}" for i in range(8))
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk == "short doc"
    for r in out:
        assert abs(np.linalg.norm(np.array(r.embedding)) - 1.0) < 1e-5


def test_bucketed_join_and_agg_plan_without_exchange(spark, tmp_path):
    """The pay-the-shuffle-once layout: two tables bucketed on the same
    key/count join with ZERO Exchange, and groupBy(key) reuses the bucket
    partitioning too, while the unbucketed control shuffles. Broadcast is
    disabled so the bucketed join can't pass vacuously (a broadcast join
    also has no shuffle)."""
    from towhee_spark.layout import read_bucketed, write_bucketed
    from towhee_spark.plans.explain import plan_stats

    a = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("vb"))
    write_bucketed(a, "t_bucket_a", "k", 8, path=str(tmp_path / "a"))
    write_bucketed(b, "t_bucket_b", "k", 8, path=str(tmp_path / "b"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ba, bb = read_bucketed(spark, "t_bucket_a"), read_bucketed(spark, "t_bucket_b")
        j = ba.join(bb, "k")
        assert plan_stats(j)["exchanges"] == 0
        assert j.count() == 20000
        # the identical join without the layout shuffles both sides
        assert plan_stats(a.join(b, "k"))["exchanges"] >= 1
        # aggregation on the bucket key: no exchange either
        g = ba.groupBy("k").agg(F.sum("va").alias("s"))
        assert plan_stats(g)["exchanges"] == 0
        assert g.count() == 20000
        # reading the files WITHOUT the catalog loses the layout
        raw = spark.read.parquet(str(tmp_path / "a"))
        assert plan_stats(raw.join(bb, "k"))["exchanges"] >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_shard_by_hash_layout(spark):
    """Deterministic, balanced-ish, dense per-shard positions, and
    stable across reruns; loud on column collisions."""
    import pytest
    from pyspark.sql import functions as F

    from towhee_spark.layout import shard_by_hash

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    out = shard_by_hash(df, n_shards=4)
    rows = out.collect()
    assert len(rows) == 1000
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    assert set(by_shard) == {0, 1, 2, 3}
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))  # dense ranks
        assert 150 < len(ps) < 350  # hash balance at n=1000
    again = {(r.doc_id, r.shard, r.shard_pos) for r in
             shard_by_hash(df, n_shards=4).collect()}
    assert again == {(r.doc_id, r.shard, r.shard_pos) for r in rows}
    # a different salt draws an independent epoch ordering
    other = {(r.doc_id, r.shard, r.shard_pos) for r in
             shard_by_hash(df, n_shards=4, salt="epoch2").collect()}
    assert other != again
    with pytest.raises(ValueError, match="rename"):
        shard_by_hash(out, n_shards=4)
    with pytest.raises(ValueError, match="n_shards"):
        shard_by_hash(df, n_shards=0)


# --------------------------------------------------------------------------
# curriculum ordering (curriculum_boundaries / curriculum_order)


def test_curriculum_equal_frequency_and_determinism(spark):
    from towhee_spark import layout

    df = spark.createDataFrame(
        [(i, (i * 37 % 1000) / 1000.0) for i in range(4000)],
        "doc_id long, q double")
    bnd = layout.curriculum_boundaries(df, "q", n_buckets=4)
    assert bnd == sorted(bnd) and len(bnd) == 3
    out = layout.curriculum_order(df, "q", bnd)
    sizes = {r.bucket: r.n for r in
             out.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == {0, 1, 2, 3}
    for b, n in sizes.items():
        assert abs(n - 1000) <= 40, (b, sizes)   # score ties drift slightly
    # bucket is monotone in score; order_key is a pure hash (re-run equal)
    rows = out.orderBy("q").collect()
    assert all(a.bucket <= b.bucket for a, b in zip(rows, rows[1:]))
    again = layout.curriculum_order(df, "q", bnd).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_curriculum_guards_and_nulls(spark):
    from towhee_spark import layout

    df = spark.createDataFrame(
        [(1, 0.2), (2, None), (3, 0.9)], "doc_id long, q double")
    out = {r.doc_id: r for r in
           layout.curriculum_order(df, "q", [500000]).collect()}
    assert out[2].bucket is None            # NULL score → NULL bucket, loud
    assert out[1].bucket == 0 and out[3].bucket == 1
    with pytest.raises(ValueError, match="ascending"):
        layout.curriculum_order(df, "q", [3, 1])
    with pytest.raises(ValueError, match="already has column"):
        layout.curriculum_order(
            df.withColumn("bucket", F.lit(1)), "q", [1])
    with pytest.raises(ValueError, match="n_buckets"):
        layout.curriculum_boundaries(df, "q", n_buckets=1)


def test_feature_matrix_preset_leakage_free_and_plan(spark):
    """The training-matrix preset must be leakage-free on BOTH sides:
    leakage_audit proves no context match is later than its as-of point,
    and a planted future-only event contributes to the label but never
    to the backward features."""
    import datetime as dt

    from pyspark.sql import functions as F

    from towhee_spark import temporal
    from towhee_spark.pipelines import pipeline
    from towhee_spark.plans import assert_max_exchanges, plan_stats

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    ev = spark.createDataFrame(
        [("c", 0, "user", base),
         ("c", 1, "assistant", base + 30 * s),   # spine point
         ("c", 2, "user", base + 90 * s)],       # future-only event
        "conv_id string, turn_idx int, role string, ts timestamp")
    ctx = spark.createDataFrame(
        [("c", base + 10 * s, 1.5),
         ("c", base + 60 * s, 9.9)],             # after the spine point
        "conv_id string, ts timestamp, ctx_score double")
    fm = pipeline(
        "feature_matrix", context={"ctx": ctx}, key="conv_id", ts="ts",
        spine_filter=(F.col("role") == "assistant"),
        feature_windows={"1m": 60.0},
        feature_aggs={"n_prev": ("count", "*")},
        label_horizon=120.0, label_aggs={"n_next": ("count", "*")})
    out = fm(ev)
    r = out.collect()[0]
    assert r["n_prev_1m"] == 1          # only the earlier user turn
    assert r["ctx_score"] == 1.5        # never the later 9.9 row
    assert r["n_next"] == 1             # the future event counts ONLY here
    audit = temporal.leakage_audit(out, "ts", ["ctx_ts"]).collect()[0]
    assert audit["n_violations"] == 0
    # plan budget: one key exchange per stage (features / enrich / label).
    # Assert on a FRESH build — executed frames print initial+final AQE
    # sections and double the textual exchange count.
    fresh = fm(ev)
    assert_max_exchanges(fresh, 3)
    assert plan_stats(fresh)["python_evals"] == 0


def test_skew_report_counts_shares_and_nulls(spark):
    from pyspark.sql import functions as F

    from towhee_spark.layout import skew_report

    df = spark.createDataFrame(
        [("a", 1)] * 6 + [("b", 1)] * 3 + [("c", None)] * 1,
        "k string, u int")
    out = skew_report(df, ["k", "u"], k=2)
    rows = {(r["col_name"], r["key_value"]): r for r in out.collect()}
    assert set(rows) == {("k", "a"), ("k", "b"), ("u", "1"), ("u", "__null__")}
    r = rows[("k", "a")]
    assert (r["n"], r["share"], r["total"], r["n_distinct"], r["rank"]) == \
        (6, 0.6, 10, 3, 1)
    assert rows[("u", "1")]["n"] == 9
    assert rows[("u", "__null__")]["rank"] == 2
    import pytest
    with pytest.raises(ValueError, match="column"):
        skew_report(df, [])
    with pytest.raises(ValueError, match="k must"):
        skew_report(df, ["k"], k=0)


def test_join_coverage_hand_computed(spark):
    from towhee_spark.layout import join_coverage

    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "c"), (3, "d"), (None, "e")],
        "k long, x string")
    right = spark.createDataFrame(
        [(2, "r1"), (2, "r2"), (9, "r3"), (None, "r4")], "k long, y string")
    r = join_coverage(left, right, on="k").collect()[0]
    assert (r["n_left"], r["n_right"]) == (5, 4)
    assert r["n_left_matched"] == 2          # the two k=2 rows
    assert r["left_match_rate"] == 0.4
    assert r["n_right_matched"] == 2         # r1, r2 (k=9 and NULL miss)
    assert r["right_match_rate"] == 0.5
    assert (r["n_left_null_key"], r["n_right_null_key"]) == (1, 1)
    # multi-key + broadcast hint path
    l2 = left.withColumn("k2", F.lit(1))
    r2 = right.withColumn("k2", F.lit(1))
    r = join_coverage(l2, r2, on=["k", "k2"],
                      broadcast_keys=True).collect()[0]
    assert r["n_left_matched"] == 2


def test_join_coverage_empty_side_reports_instead_of_crashing(spark):
    from towhee_spark.layout import join_coverage

    left = spark.createDataFrame([(1, "a")], "k long, x string")
    empty = spark.createDataFrame([], "k long, y string")
    r = join_coverage(empty, left, on="k").collect()[0]
    assert (r["n_left"], r["left_match_rate"]) == (0, None)
    assert r["n_right"] == 1 and r["right_match_rate"] == 0.0
    r2 = join_coverage(left, empty, on="k").collect()[0]
    assert r2["n_right"] == 0 and r2["right_match_rate"] is None
