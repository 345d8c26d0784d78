"""LLM completion op shape — parity with Towhee's LLM.* hub ops
(ref hub_ops/llm.py:24-292: messages List[Dict{system,question,answer}] →
next assistant answer), re-expressed as a batched Arrow operator.

The network client is pluggable: ``client_factory`` returns a
``Callable[[list[str]], list[str]]`` (batched prompts → batched answers)
and is instantiated ONCE per executor Python worker (worker_singleton — the
OperatorPool reuse pattern), so connection pools / models survive across
Arrow batches. The default is a deterministic offline fake (md5-tagged
echo) so pipelines are buildable and testable without a service; pass a
real factory (OpenAI-compatible HTTP client, local model) for production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from towhee_spark.kernels import worker_singleton


def render_messages(messages) -> str:
    """Flatten the reference's message-dict list to one prompt string:
    [{'system': ...}, {'question': q, 'answer': a}, {'question': q2}] →
    'system: ...\\nuser: q\\nassistant: a\\nuser: q2'. A plain string passes
    through unchanged."""
    if messages is None:
        return ""
    if isinstance(messages, str):
        return messages
    lines: list[str] = []
    for m in messages:
        d = m.asDict() if hasattr(m, "asDict") else dict(m)
        for role, label in (("system", "system"), ("question", "user"),
                            ("answer", "assistant")):
            v = d.get(role)
            if v is not None:
                lines.append(f"{label}: {v}")
    return "\n".join(lines)


def _fake_client() -> Callable[[list[str]], list[str]]:
    """Deterministic offline completion: tag + truncated echo. Useful for
    plumbing tests and dry runs; obviously not a language model."""

    def complete(prompts: list[str]) -> list[str]:
        out = []
        for p in prompts:
            tag = hashlib.md5((p or "").encode("utf-8")).hexdigest()[:8]
            out.append(f"[fake-llm {tag}] " + " ".join((p or "").split()[:16]))
        return out

    return complete


def llm_map(
    df: DataFrame,
    in_col: str = "messages",
    out_col: str = "answer",
    client_factory: Callable[[], Callable[[list[str]], list[str]]] | None = None,
    cache_key: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """Append ``out_col`` = completion of ``in_col`` (a prompt string OR the
    reference's message-struct array). One client per worker, one call per
    Arrow batch — the service round-trip amortizes over the batch, never
    per row. ``strict=True`` refuses to run on the offline fake.

    ``cache_key`` defaults to the factory's identity (module.qualname), so
    two llm_map calls with DIFFERENT factories get different worker-cached
    clients — a shared fixed key silently served the first factory's client
    to both (code-review finding). Pass an explicit key to deliberately
    share or separate clients."""
    if strict and client_factory is None:
        raise NotImplementedError(
            "no LLM service in this environment; pass client_factory= with a "
            "batched Callable[[list[str]], list[str]]"
        )
    factory = client_factory or _fake_client
    key = cache_key or (
        f"llm_client:{getattr(factory, '__module__', '?')}."
        f"{getattr(factory, '__qualname__', repr(factory))}"
    )
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(out_col, T.StringType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = worker_singleton(key, factory)
        for pdf in batches:
            prompts = [render_messages(m) for m in pdf[in_col]]
            pdf[out_col] = client(prompts)
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
