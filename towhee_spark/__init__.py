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

from towhee_spark.collection import DataCollection, Entity, data_loader
from towhee_spark.config import AutoConfig
from towhee_spark.layout import repartition_by_key
from towhee_spark.pipeline import Pipeline, pipe
from towhee_spark.pipelines import pipeline, register_pipeline
from towhee_spark.registry import ops, register
from towhee_spark.serve import APIService
from towhee_spark.temporal import (
    asof_join, bfill, interval_join, lag_lead, last_k_join, locf,
    multi_range_agg, point_in_time_enrich, range_agg, sessionize,
    validity_intervals)

__version__ = "0.1.0"

# mirrors the reference's top-level surface (towhee/__init__.py:36-46):
# pipe/ops/register/AutoConfig/AutoPipes(pipeline)/DataLoader(data_loader)/
# api_service(APIService) — triton_client/build_docker_image stay descoped.
__all__ = [
    "Pipeline",
    "pipe",
    "ops",
    "register",
    "AutoConfig",
    "pipeline",
    "register_pipeline",
    "DataCollection",
    "Entity",
    "data_loader",
    "asof_join",
    "lag_lead",
    "locf",
    "bfill",
    "sessionize",
    "range_agg",
    "multi_range_agg",
    "point_in_time_enrich",
    "interval_join",
    "last_k_join",
    "validity_intervals",
    "repartition_by_key",
    "APIService",
]
