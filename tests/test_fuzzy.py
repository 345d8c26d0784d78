"""dedup.fuzzy_pairs: completeness vs a brute-force Python reference
(the length banding must be lossless), adjacent-band dedup, extra_block
narrowing, prefix semantics, and validation."""
import itertools

import pytest
from pyspark.sql import Row

from towhee_spark.functions.dedup import fuzzy_pairs


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, k):
    out = set()
    for (i, a), (j, b) in itertools.combinations(rows, 2):
        d = _lev(a, b)
        if d <= k:
            out.add((min(i, j), max(i, j), d))
    return out


WORDS = [
    (0, "kitten"), (1, "sitting"), (2, "kitten"), (3, "mitten"),
    (4, "flitting"), (5, "abcdefghij"), (6, "abcdefghix"), (7, "xy"),
    (8, "yx"), (9, "a"), (10, ""), (11, "abcdefghijklmno"),
]


@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_complete_vs_bruteforce(spark, k):
    """Banding may never lose a qualifying pair, at any max_dist."""
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in WORDS])
    got = {(r.id_a, r.id_b, r.dist)
           for r in fuzzy_pairs(df, max_dist=k).collect()}
    assert got == _brute(WORDS, k)


def test_no_duplicate_pairs(spark):
    """Same-band and adjacent-band paths must each emit a pair once."""
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in WORDS])
    rows = fuzzy_pairs(df, max_dist=3).collect()
    assert len(rows) == len({(r.id_a, r.id_b) for r in rows})


def test_extra_block_narrows(spark):
    rows = [Row(doc_id=0, text="abc", lang="en"),
            Row(doc_id=1, text="abd", lang="en"),
            Row(doc_id=2, text="abe", lang="de")]
    df = spark.createDataFrame(rows)
    got = {(r.id_a, r.id_b)
           for r in fuzzy_pairs(df, max_dist=1, extra_block="lang").collect()}
    assert got == {(0, 1)}  # cross-language pair blocked out


def test_prefix_compares_truncated(spark):
    rows = [Row(doc_id=0, text="same-prefix-AAAA"),
            Row(doc_id=1, text="same-prefix-BBBB")]
    df = spark.createDataFrame(rows)
    assert fuzzy_pairs(df, max_dist=1).count() == 0
    got = fuzzy_pairs(df, max_dist=1, prefix=11).collect()
    assert [(r.id_a, r.id_b, r.dist) for r in got] == [(0, 1, 0)]


def test_null_text_never_pairs(spark):
    df = spark.createDataFrame([Row(doc_id=0, text=None),
                                Row(doc_id=1, text="abc")])
    assert fuzzy_pairs(df, max_dist=2).count() == 0


def test_validation(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="x")])
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_pairs(df, max_dist=-1)
    with pytest.raises(ValueError, match="prefix"):
        fuzzy_pairs(df, max_dist=1, prefix=0)
