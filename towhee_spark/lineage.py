"""Per-partition checkpointed writes with lineage manifests (north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

A run writes the output bucketed by a deterministic partition id
(pmod(xxhash64(key), n_buckets)). Each completed bucket gets a manifest
JSON — bucket id, input snapshot tag, row count, feature checksum — written
AFTER the bucket's data commit. Resuming the same run recomputes only
buckets without manifests: crash-safe because the manifest is the commit
marker, and idempotent because bucket contents are a pure function of
(input snapshot, bucket id).

At cluster scale each bucket is a directory partition
(``.../bucket=K/``) written with dynamic partition overwrite, so a retry
of bucket K replaces only bucket K.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_lineage"
BUCKET_COL = "__bucket"


def _manifest_path(base: str, bucket: int) -> str:
    return os.path.join(base, MANIFEST_DIR, f"bucket={bucket}.json")


def completed_buckets(base: str) -> set[int]:
    d = os.path.join(base, MANIFEST_DIR)
    if not os.path.isdir(d):
        return set()
    out = set()
    for f in os.listdir(d):
        if f.startswith("bucket=") and f.endswith(".json"):
            out.add(int(f[len("bucket="):-len(".json")]))
    return out


def add_bucket(df: DataFrame, key: str, n_buckets: int) -> DataFrame:
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )


def row_checksum(cols: list[str]):
    """Order-insensitive content checksum: modular sum of per-row xxhash64
    over the stable string forms of ``cols`` (map-side partial agg; one long
    per bucket). Mod 1e9+7 keeps the running sum overflow-safe under ANSI
    semantics up to ~9e9 rows per bucket."""
    h = F.pmod(F.xxhash64(*[F.col(c).cast("string") for c in cols]), F.lit(1_000_000_007))
    return F.sum(h).alias("checksum")


def write_with_lineage(
    df: DataFrame,
    base: str,
    key: str = "conv_id",
    n_buckets: int = 16,
    input_snapshot: str = "unknown",
    checksum_cols: list[str] | None = None,
    attach_profile: bool = True,
) -> dict:
    """Write ``df`` to ``base`` partitioned by bucket, skipping buckets whose
    manifest already exists. Returns {written: [...], skipped: [...]}.

    The data for all missing buckets is written in ONE Spark job (dynamic
    partition overwrite), then manifests are committed per bucket from one
    aggregation pass — two jobs total regardless of bucket count.
    """
    checksum_cols = checksum_cols or [c for c in df.columns if not c.startswith("__")]
    done = completed_buckets(base)
    bdf = add_bucket(df, key, n_buckets)
    missing = sorted(set(range(n_buckets)) - done)
    if not missing:
        return {"written": [], "skipped": sorted(done)}
    todo = bdf.filter(F.col(BUCKET_COL).isin([int(b) for b in missing]))

    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    t_write0 = time.perf_counter()
    try:
        (
            todo.write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(os.path.join(base, "data"))
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    job_wall_sec = round(time.perf_counter() - t_write0, 3)
    # execution-config snapshot: the manifest records HOW the data was
    # produced (north_rule: "explicit shuffle-partition and skew-handling
    # configuration"), so a resume on a differently-tuned cluster is visible
    exec_conf = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.master",
        )
    }

    # stats come from the data JUST WRITTEN (read-back), not from
    # re-executing the upstream plan — a nondeterministic upstream (new
    # source files, sampling) would otherwise make manifests describe
    # different data than what is on disk
    written_df = spark.read.parquet(os.path.join(base, "data")).filter(
        F.col(BUCKET_COL).isin([int(b) for b in missing])
    )
    stats_df = written_df.groupBy(BUCKET_COL).agg(
        F.count(F.lit(1)).alias("rows"), row_checksum(checksum_cols)
    )
    stats = stats_df.collect()
    # per-operator SQLMetrics of the verification pass (scan + checksum agg
    # over the data JUST committed) — the Towhee time_profiler analogue
    # attached to lineage (SURVEY §7.1 item 9). The collect() above ran this
    # exact plan instance, so its metrics are populated; zero-valued metrics
    # are dropped to keep manifests small.
    plan_prof = None
    if attach_profile:
        try:
            from towhee_spark.plans.profile import plan_profile  # noqa: PLC0415

            plan_prof = [
                {"op": p["op"], "depth": p["depth"],
                 "metrics": {k: v for k, v in p["metrics"].items() if v}}
                for p in plan_profile(stats_df)
            ]
        except Exception:  # noqa: BLE001  # py4j metric walk is best-effort
            plan_prof = None
    os.makedirs(os.path.join(base, MANIFEST_DIR), exist_ok=True)
    # the profile describes the whole verification JOB — write it ONCE and
    # reference it from every bucket manifest instead of duplicating the
    # multi-operator metrics tree n_buckets times (code-review finding)
    profile_rel = None
    if plan_prof:
        profile_rel = os.path.join(MANIFEST_DIR, "profile.json")
        ptmp = os.path.join(base, profile_rel) + ".tmp"
        with open(ptmp, "w") as f:
            json.dump({"verify_plan_profile": plan_prof}, f)
        os.replace(ptmp, os.path.join(base, profile_rel))

    def _bucket_bytes(b: int) -> int:
        d = os.path.join(base, "data", f"{BUCKET_COL}={b}")
        try:
            return sum(
                os.path.getsize(os.path.join(d, f))
                for f in os.listdir(d)
                if not f.startswith((".", "_"))
            )
        except OSError:
            return 0

    written = []
    for r in stats:
        manifest = {
            "bucket": int(r[BUCKET_COL]),
            "input_snapshot": input_snapshot,
            "rows": int(r["rows"]),
            "checksum": int(r["checksum"]) if r["checksum"] is not None else 0,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "key": key,
            "n_buckets": n_buckets,
            "metrics": {
                "bytes": _bucket_bytes(int(r[BUCKET_COL])),
                "write_job_wall_sec": job_wall_sec,  # shared across this job's buckets
                **({"verify_profile_ref": profile_rel} if profile_rel else {}),
            },
            "exec_conf": exec_conf,
        }
        tmp = _manifest_path(base, manifest["bucket"]) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, _manifest_path(base, manifest["bucket"]))  # atomic commit
        written.append(manifest["bucket"])
    # buckets with zero rows still need commit markers (else every resume
    # recomputes them)
    for b in set(missing) - set(written):
        manifest = {
            "bucket": b, "input_snapshot": input_snapshot, "rows": 0,
            "checksum": 0, "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "key": key, "n_buckets": n_buckets,
        }
        tmp = _manifest_path(base, b) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, _manifest_path(base, b))
        written.append(b)
    return {"written": sorted(written), "skipped": sorted(done)}


def read_with_lineage(spark: SparkSession, base: str) -> DataFrame:
    return spark.read.parquet(os.path.join(base, "data")).drop(BUCKET_COL)


def verify_lineage(df: DataFrame, base: str, key: str = "conv_id") -> bool:
    """Recompute per-bucket checksums from ``df`` and compare with the
    committed manifests (end-to-end integrity check)."""
    done = completed_buckets(base)
    if not done:
        return False
    manifests = {}
    for b in done:
        with open(_manifest_path(base, b)) as f:
            manifests[b] = json.load(f)
    n_buckets = next(iter(manifests.values()))["n_buckets"]
    checksum_cols = [c for c in df.columns if not c.startswith("__")]
    stats = {
        int(r[BUCKET_COL]): (int(r["rows"]), int(r["checksum"]) if r["checksum"] is not None else 0)
        for r in add_bucket(df, key, n_buckets)
        .groupBy(BUCKET_COL)
        .agg(F.count(F.lit(1)).alias("rows"), row_checksum(checksum_cols))
        .collect()
    }
    for b, m in manifests.items():
        got = stats.get(b, (0, 0))
        if got != (m["rows"], m["checksum"]):
            return False
    return True
