"""AutoConfig parity (towhee/runtime/auto_config.py:43-120): named
configuration presets. Towhee's configs select device/Triton batching; the
Spark engine's equivalents are session/conf presets consumed by
towhee_spark.session.get_spark(extra_conf=...).

TritonCPUConfig's dynamic-batching knobs (max_batch_size,
preferred_batch_size, batch_latency_micros — the lever behind the
reference's published 5x claim, BASELINE.md) map onto the one Spark knob
with the same role: the Arrow record batch size at the Python boundary.
"""

from __future__ import annotations


class AutoConfig:
    """Factory namespace mirroring AutoConfig.LocalCPUConfig() etc."""

    @staticmethod
    def LocalCPUConfig(parallelism: int | None = None) -> dict[str, str]:
        import os  # noqa: PLC0415

        n = parallelism or os.cpu_count() or 8
        return {
            "spark.sql.shuffle.partitions": str(n),
            "spark.sql.adaptive.enabled": "true",
        }

    @staticmethod
    def TritonCPUConfig(max_batch_size: int = 128, **_ignored) -> dict[str, str]:
        """Dynamic batching ≙ Arrow batch size (see module docstring)."""
        return {"spark.sql.execution.arrow.maxRecordsPerBatch": str(max_batch_size * 64)}

    @staticmethod
    def TritonGPUConfig(**_kwargs):
        raise NotImplementedError(
            "GPU serving configs are out of engine scope (SURVEY.md §3.3); "
            "executor GPU scheduling belongs to cluster config"
        )
