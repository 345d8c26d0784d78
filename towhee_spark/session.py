"""SparkSession factory with the engine's scale-oriented defaults.

Defaults chosen for the local[N] sandbox but written for cluster use:
AQE on (runtime re-plan + skew-join splitting), Arrow on (every Python
boundary is batched, never per-row), shuffle partitions sized to cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "towhee_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, else all cores).
    On a real cluster, pass ``master=None`` with a pre-configured
    ``spark-submit`` and these confs become no-op overrides.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = int(cpus) if cpus.isdigit() else n

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # InferFiltersFromGenerate synthesizes a size(arr)>0 filter below
        # every explode/posexplode and pushdown INLINES the generator's
        # expression into it — for HOF-derived arrays (quantize codes,
        # tokenizer piece streams) the interpreted transform chain then
        # re-evaluates per row in the filter, the projection AND the
        # generate: measured 2.1 s -> 0.4 s on the quantized_embeddings
        # gate, -0.3..-0.6 s on each tokenize-family gate at sf0.1. The
        # rule is semantics-free (Generate itself skips empty arrays), so
        # excluding it never changes results.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
