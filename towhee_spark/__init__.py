"""towhee_spark — a PySpark-native feature-engineering engine.

A from-scratch re-expression of towhee-io/towhee's dataflow capabilities
(reference: /root/reference, snapshot 2024-10-20) on the Spark
DataFrame/Catalyst/Arrow stack, extended with the temporal relational core
Towhee lacks (as-of join, lag/lead, backfill, sessionization) and
training-data-pipeline operators (dedup, similarity search, text analysis).

Nothing here ports Towhee's threaded DataQueue runtime
(towhee/runtime/runtime_pipeline.py); the operator *semantics* are preserved
(towhee/runtime/nodes/*) while execution is delegated to Catalyst plans and
vectorized Arrow UDFs.
"""

from towhee_spark.pipeline import Pipeline, pipe
from towhee_spark.temporal import asof_join, lag_lead, locf, bfill, sessionize
from towhee_spark.layout import repartition_by_key

__version__ = "0.1.0"

__all__ = [
    "Pipeline",
    "pipe",
    "asof_join",
    "lag_lead",
    "locf",
    "bfill",
    "sessionize",
    "repartition_by_key",
]
