"""Named-operator registry: the engine's analogue of Towhee's
``@register`` + ``ops.<ns>.<name>(...)`` factory
(towhee/runtime/operator_registry.py:22-95, factory.py:25-135).

Differences by design: resolution is import-time and local-only — no hub
download, no runtime pip (operator_loader.py:105-137's network boundary is
deliberately absent; distribution is spark-submit --py-files per the
north_rule). An op is any callable returning a Column, a DataFrame
transform, or a pandas_udf.
"""

from __future__ import annotations

from collections.abc import Callable

_REGISTRY: dict[str, Callable] = {}


def register(name: str | None = None):
    """Decorator: @register or @register('ns/my-op') (name normalization
    mirrors factory.py:73 — '.'→'/', '_'→'-')."""
    def deco(fn: Callable) -> Callable:
        key = (name or fn.__name__).replace(".", "/").replace("_", "-")
        prev = _REGISTRY.get(key)
        if prev is not None and prev is not fn and getattr(prev, "__qualname__", None) != getattr(fn, "__qualname__", None):
            # distinct names can normalize to one key ('ns/my_op' vs
            # 'ns/my-op'): surface the silent replacement (review finding);
            # same-qualname re-registration (notebook cell re-runs) stays quiet
            import warnings  # noqa: PLC0415

            warnings.warn(
                f"operator {key!r} re-registered: replacing "
                f"{getattr(prev, '__qualname__', prev)!r} with "
                f"{getattr(fn, '__qualname__', fn)!r}",
                stacklevel=3,
            )
        _REGISTRY[key] = fn
        return fn

    if callable(name):  # bare @register
        fn, name = name, None
        return deco(fn)
    return deco


def resolve(name: str) -> Callable:
    key = name.replace(".", "/").replace("_", "-")
    if key not in _REGISTRY:
        raise KeyError(f"operator {name!r} not registered; have {sorted(_REGISTRY)}")
    return _REGISTRY[key]


class _OpsNamespace:
    def __init__(self, prefix: str = ""):
        self._prefix = prefix

    def __getattr__(self, item: str):
        path = f"{self._prefix}.{item}" if self._prefix else item
        key = path.replace(".", "/").replace("_", "-")
        if key in _REGISTRY:
            return _REGISTRY[key]
        return _OpsNamespace(path)

    def __call__(self, *args, **kwargs):
        raise KeyError(f"operator {self._prefix!r} not registered")


#: `ops.text.token_count` style accessor (factory.py parity)
ops = _OpsNamespace()


def _register_builtins() -> None:
    from towhee_spark.functions import text as _text  # noqa: PLC0415
    from towhee_spark.kernels import embed_text_udf, np_normalize  # noqa: PLC0415

    register("text/token-count")(_text.token_count)
    register("text/lang-id")(_text.lang_id)
    register("text/quality-score")(_text.quality_score)
    register("text/fingerprint")(_text.fingerprint)
    register("text/normalize")(_text.normalize_text)
    register("embedding/hashed-bow")(embed_text_udf)
    register("utils/np-normalize")(lambda: np_normalize)


_register_builtins()
