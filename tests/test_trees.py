"""tree_paths: branching-dialog flattening via pointer doubling.

Differential strategy: hand trees with known paths, plus a randomized
forest checked against a direct Python parent-walk; the cycle / depth
guard and the log-round join count are pinned separately.
"""

import random

import pytest
from pyspark.sql import functions as F

from towhee_spark.functions.transcripts import tree_paths

SCHEMA = "conv_id string, turn_id int, parent_id int"


def test_hand_tree_paths(spark):
    #      0           d: 10 - 11
    #     / \
    #    1   2
    #    |   | \
    #    3   4  5
    rows = [("c", 0, None), ("c", 1, 0), ("c", 2, 0), ("c", 3, 1),
            ("c", 4, 2), ("c", 5, 2), ("d", 10, None), ("d", 11, 10)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = [tuple(r) for r in
           tree_paths(df).orderBy("conv_id", "path_id", "pos").collect()]
    assert got == [
        ("c", 3, 0, 0), ("c", 3, 1, 1), ("c", 3, 2, 3),
        ("c", 4, 0, 0), ("c", 4, 1, 2), ("c", 4, 2, 4),
        ("c", 5, 0, 0), ("c", 5, 1, 2), ("c", 5, 2, 5),
        ("d", 11, 0, 10), ("d", 11, 1, 11),
    ]
    # ancestor mode: one chain per NODE; total rows = sum(depth+1)
    assert tree_paths(df, leaves_only=False).count() == 17


def test_multiple_roots_per_conv(spark):
    rows = [("c", 0, None), ("c", 1, 0), ("c", 7, None), ("c", 8, 7)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["path_id"]: r["pos"] for r in
           tree_paths(df).where(F.col("pos") == 1).collect()}
    assert set(got) == {1, 8}


def python_walk(rows):
    parent = {(c, i): p for c, i, p in rows}
    children = {(c, p) for c, i, p in rows if p is not None}
    out = []
    for (c, i), _ in parent.items():
        if (c, i) in children:
            continue
        path = []
        node = i
        while node is not None:
            path.append(node)
            node = parent[(c, node)]
        path.reverse()
        out.extend((c, i, pos, n) for pos, n in enumerate(path))
    return sorted(out)


def test_random_forest_vs_python_walk(spark):
    rng = random.Random(11)
    rows = []
    for conv in range(12):
        n = rng.randint(1, 40)
        for i in range(n):
            parent = None if i == 0 else rng.randint(0, i - 1)
            rows.append((f"c{conv}", i, parent))
    df = spark.createDataFrame(rows, SCHEMA)
    got = sorted(tuple(r) for r in tree_paths(df, max_depth=64).collect())
    assert got == python_walk(rows)


def test_local_equals_distributed(spark):
    """The driver-local walk (collect_nodes cap, the CC/bpe_train
    convention) emits row-identical output to the pointer-doubling
    plan on a random forest, and raises the same max_depth guard."""
    rng = random.Random(23)
    rows = []
    for conv in range(10):
        n = rng.randint(1, 40)
        for i in range(n):
            parent = None if i == 0 else rng.randint(0, i - 1)
            rows.append((f"c{conv}", i, parent))
    df = spark.createDataFrame(rows, SCHEMA)
    loc = sorted(tuple(r) for r in tree_paths(df, max_depth=64).collect())
    dist = sorted(tuple(r) for r in tree_paths(
        df, max_depth=64, collect_nodes=0).collect())
    assert loc == dist
    loc_all = sorted(tuple(r) for r in tree_paths(
        df, max_depth=64, leaves_only=False).collect())
    dist_all = sorted(tuple(r) for r in tree_paths(
        df, max_depth=64, leaves_only=False, collect_nodes=0).collect())
    assert loc_all == dist_all


def test_cycle_and_depth_guard(spark):
    cyc = spark.createDataFrame([("c", 1, 2), ("c", 2, 1)], SCHEMA)
    with pytest.raises(Exception, match="max_depth"):
        tree_paths(cyc, max_depth=4).collect()
    deep = spark.createDataFrame(
        [("c", i, i - 1 if i else None) for i in range(10)], SCHEMA)
    with pytest.raises(Exception, match="max_depth"):
        tree_paths(deep, max_depth=4).collect()
    # but the same chain passes with room
    assert tree_paths(deep, max_depth=16).count() == 10
    with pytest.raises(ValueError, match="max_depth"):
        tree_paths(deep, max_depth=0)


def test_lineage_truncation_plan_shapes(spark):
    """Truncated (default): the visible plan is the LAST round's join over
    checkpointed LogicalRDDs — constant size however deep. Declarative
    mode: ceil(log2(max_depth+1)) doubling self-joins, each side
    duplicating the previous round (why truncation is the default)."""
    df = spark.createDataFrame([("c", 0, None)], SCHEMA)
    plan = tree_paths(df, max_depth=64, collect_nodes=0)._jdf \
        .queryExecution().optimizedPlan().toString()
    assert plan.count("Join LeftOuter") == 1
    assert "LogicalRDD" in plan
    assert plan.count("Join LeftAnti") == 1
    decl = tree_paths(df, max_depth=7, truncate_lineage=False,
                      collect_nodes=0) \
        ._jdf.queryExecution().optimizedPlan().toString()
    # 3 rounds (2^3 = 8 > 7): exponential nesting -> 2^3 - 1 = 7 joins
    # (createDataFrame scans are LogicalRDDs too, so only count joins)
    assert decl.count("Join LeftOuter") == 7


def test_declarative_mode_matches_truncated(spark):
    rows = [("c", 0, None), ("c", 1, 0), ("c", 2, 0), ("c", 3, 1)]
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(tuple(r) for r in tree_paths(df, max_depth=7).collect())
    b = sorted(tuple(r) for r in
               tree_paths(df, max_depth=7, truncate_lineage=False).collect())
    assert a == b
