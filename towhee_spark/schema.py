"""Canonical table schemas (BASELINE.json input_hint).

The engine's primary input is a transcript table of multi-turn
conversation/agent turns; Towhee's untyped name-only schemas
(towhee/runtime/check_utils.py:49-61 — identifiers, no value types) are
replaced with pinned Spark types.
"""

from __future__ import annotations

from pyspark.sql import types as T

# input_hint: (conv_id:string, turn_idx:int32, role:string, text:string,
#              tool:string, ts:timestamp)
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# Right side of the as-of join: point-in-time context feature source
# (FIXTURES.md §2).
CONTEXT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("ctx_score", T.DoubleType(), True),
        T.StructField("ctx_label", T.StringType(), True),
    ]
)

# Embedding feature output: ArrayType(FloatType()) mirrors Towhee's ndarray
# columns (towhee/types/__init__.py) in an Arrow-friendly, allclose-comparable
# representation.
EMBEDDING_TYPE = T.ArrayType(T.FloatType())
