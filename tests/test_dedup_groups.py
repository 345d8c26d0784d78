"""Connected-components dedup grouping: large-star/small-star vs a
driver-side union-find ground truth, plus the groups/survivors wrappers."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from towhee_spark.functions import dedup


def _union_find(n_nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {v: v for v in n_nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in n_nodes}


def _cc_dict(spark, edges):  # noqa: F811
    pairs = spark.createDataFrame(edges, "id_a: long, id_b: long")
    out = dedup.connected_components(pairs)
    return {r["id"]: r["component"] for r in out.collect()}


def test_path_graph_converges_past_its_diameter(spark):  # noqa: F811
    # a 64-node path is the classic worst case for plain min-propagation
    # (diameter 63); star alternation must close it in O(log n) rounds
    edges = [(i, i + 1) for i in range(63)]
    got = _cc_dict(spark, edges)
    assert got == {i: 0 for i in range(64)}


def test_random_graphs_match_union_find(spark):  # noqa: F811
    rng = random.Random(41)
    for trial in range(3):
        nodes = list(range(200))
        edges = [
            (rng.randrange(200), rng.randrange(200)) for _ in range(120 + 40 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        want = _union_find(nodes, edges)
        got = _cc_dict(spark, edges)
        touched = {v for e in edges for v in e}
        assert set(got) == touched
        for v in touched:
            assert got[v] == want[v], f"trial {trial} node {v}"


def test_empty_and_self_pairs(spark):  # noqa: F811
    pairs = spark.createDataFrame([(7, 7)], "id_a: long, id_b: long")
    assert dedup.connected_components(pairs).count() == 0


def test_groups_and_survivors_cover_singletons(spark):  # noqa: F811
    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 4), (4, 9), (2, 3)], "id_a: long, id_b: long"
    )
    groups = {
        r["doc_id"]: r["group_id"]
        for r in dedup.dedup_groups(docs, pairs).collect()
    }
    assert groups == {0: 0, 1: 1, 2: 2, 3: 2, 4: 1, 5: 5, 6: 6, 7: 7, 8: 8, 9: 1}
    surv = {
        r["doc_id"]: r["group_size"]
        for r in dedup.dedup_survivors(docs, pairs).collect()
    }
    assert surv == {0: 1, 1: 3, 2: 2, 5: 1, 6: 1, 7: 1, 8: 1}


def test_fixpoint_is_a_star_per_node(spark):  # noqa: F811
    # every node maps to exactly one component (no duplicate rows survive
    # the final star join)
    rng = random.Random(5)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a: long, id_b: long")
    out = dedup.connected_components(pairs)
    assert out.groupBy("id").count().filter(F.col("count") > 1).count() == 0


def test_nonconvergence_raises(spark):  # noqa: F811
    # collect_edges=0 forces the distributed star loop (the local
    # union-find path has no convergence concept)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a: long, id_b: long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iter=1, collect_edges=0)


def test_cc_distributed_local_lockstep(spark):  # noqa: F811
    """collect_edges=0 forces the star loop; the default collects the
    edge set and solves with union-find — identical (id, component)
    tables on path and random graphs."""
    rng = random.Random(17)
    cases = [[(i, i + 1) for i in range(63)]]
    cases.append([(rng.randrange(150), rng.randrange(150))
                  for _ in range(200)])
    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, "id_a: long, id_b: long")
        dist = sorted(
            (r["id"], r["component"])
            for r in dedup.connected_components(
                pairs, collect_edges=0).collect())
        local = sorted(
            (r["id"], r["component"])
            for r in dedup.connected_components(pairs).collect())
        assert dist == local


def test_strip_duplicate_spans_surgery(spark):
    """Detection and removal agree: the shared 10-token run is cut from
    both docs (k=8 windows merge into one maximal span), unique tokens
    survive in order, untouched docs round-trip their normalized text."""
    from towhee_spark.functions import dedup
    from towhee_spark.functions.dedup import release_cached

    df = spark.createDataFrame([
        (1, "a b c d e f g h i j unique one"),
        (2, "x a b c d e f g h i j other tail"),
        (3, "totally different words here nothing shared at all ok"),
    ], "doc_id long, text string")
    out = dedup.strip_duplicate_spans(df, k=8)
    rows = {r.doc_id: r for r in out.collect()}
    release_cached(out)
    assert rows[1].clean_text == "unique one" and rows[1].kept_tokens == 2
    assert rows[2].clean_text == "x other tail" and rows[2].kept_tokens == 3
    assert rows[3].clean_text == "totally different words here nothing shared at all ok"
    assert rows[3].kept_tokens == rows[3].n_tokens
    # detection half sees the same spans (shared _dup_islands)
    ds = {r.doc_id: r for r in dedup.duplicate_spans(df, k=8).collect()}
    assert ds[1].dup_tokens == rows[1].n_tokens - rows[1].kept_tokens
    assert ds[2].dup_tokens == rows[2].n_tokens - rows[2].kept_tokens
    assert ds[3].dup_tokens == 0


def test_dedup_best_survivors_quality_rule(spark):
    """The kept member is the group's highest score (lowest id on ties);
    singletons survive as themselves; group sizes match dedup_survivors."""
    from towhee_spark.functions import dedup

    df = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5)],
        "doc_id long, q double")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {r.group_id: r for r in
           dedup.dedup_best_survivors(df, pairs, "q").collect()}
    assert out[1].doc_id == 2 and out[1].group_size == 3 and out[1].q == 0.9
    assert out[4].doc_id == 4 and out[4].group_size == 1


def test_dedup_best_survivors_rejects_non_integral_id(spark):
    """ADVICE r04: a string id would silently cast('long') to NULL and
    drop every row — the loud-guard convention must fire instead."""
    from towhee_spark.functions import dedup

    df = spark.createDataFrame(
        [("a", 0.2), ("b", 0.9)], "doc_id string, q double")
    pairs = spark.createDataFrame(
        [("a", "b")], "id_a string, id_b string")
    with pytest.raises(ValueError, match="must be integral"):
        dedup.dedup_best_survivors(df, pairs, "q")
