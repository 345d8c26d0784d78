"""Plan audit over EVERY gate query: walks each `__spark_entry__.queries()`
plan (no execution — pure Catalyst planning) and tabulates the features
that matter at 100 TB — shuffles, broadcasts, sorts, window operators,
Python eval stages, whole-stage-codegen spans, scans. Writes
BENCH/PLAN_AUDIT.md so plan regressions (a new shuffle, a Python stage
sneaking into a native path) are diffable round over round.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entry

    from towhee_spark.plans.explain import plan_stats
    from towhee_spark.session import get_spark

    spark = get_spark("plan-audit", master="local[4]", shuffle_partitions=4)

    # codegen spans are omitted: under AQE the "*(n)" annotation only
    # renders once stages compile (isFinalPlan=true), i.e. after execution
    cols = ["exchanges", "broadcasts", "sorts", "windows",
            "python_evals", "scans"]
    rows = []
    for name, fn in sorted(entry.queries().items()):
        try:
            stats = plan_stats(fn(spark, sf_dir))
            rows.append((name, [stats[c] for c in cols], None))
        except Exception as e:  # noqa: BLE001
            rows.append((name, None, f"{type(e).__name__}: {str(e)[:80]}"))

    lines = [
        "# Plan audit — every gate query, Catalyst-planned (no execution)",
        "",
        f"Input: {sf_dir}. Regenerate: `python tools/plan_audit.py`.",
        "",
        "Columns: hash/range shuffles, broadcast joins/exchanges, sorts,",
        "window operators, Python eval stages (Arrow UDF / mapInPandas /",
        "applyInPandas), file scans. python_evals",
        "> 0 is EXPECTED only for Arrow-kernel queries (embed, scan_topk,",
        "arrow-bucket paths) and Python-fold Towhee parity queries; a native",
        "query growing one is a regression.",
        "",
        "| query | " + " | ".join(cols) + " |",
        "|---|" + "|".join(["---"] * len(cols)) + "|",
    ]
    for name, vals, err in rows:
        if err:
            lines.append(f"| {name} | planning error: {err} |" + " |" * (len(cols) - 1))
        else:
            lines.append(f"| {name} | " + " | ".join(str(v) for v in vals) + " |")
    out = os.path.join(REPO, "BENCH", "PLAN_AUDIT.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(rows)} queries")


if __name__ == "__main__":
    main()
