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


def _cell_str(v) -> str:
    """Stringify + truncate one display cell (console-table form)."""
    if isinstance(v, (list, tuple)) and len(v) > 6:
        s = "[" + ", ".join(_short(x) for x in v[:3]) + f", …] len={len(v)}"
    else:
        s = _short(v)
    return s if len(s) <= 40 else s[:37] + "..."


def _short(v) -> str:
    if isinstance(v, float):
        return f"{v:.4g}"
    if isinstance(v, bytes):
        return f"<{len(v)} bytes>"
    return str(v)


class Entity:
    """Dynamic attribute bag (entity.py:17-39)."""

    def __init__(self, **kwargs):
        self.__dict__.update(kwargs)

    def to_dict(self) -> dict:
        return dict(self.__dict__)

    @staticmethod
    def from_dict(d: dict) -> "Entity":
        """entity.py:36-39 parity."""
        return Entity(**d)

    def __repr__(self) -> str:
        fields = ", ".join(f"{k}={v!r}" for k, v in self.__dict__.items())
        return f"<Entity {fields}>"

    def __eq__(self, other) -> bool:
        return isinstance(other, Entity) and self.__dict__ == other.__dict__

    def __hash__(self) -> int:
        # defining __eq__ alone would leave Entity UNHASHABLE (review
        # finding). Hash (name, hash(value)) pairs: Python guarantees
        # __eq__-equal hashable values hash equal (1 vs 1.0, np.int64(1)
        # vs 1 — the advisor-r3 repr traps), so the hash/eq contract
        # holds, and same-shape entities with different values no longer
        # collapse into one bucket (name-only hashing made set()/dict of
        # n same-column entities probe O(n²) — advisor r4). Unhashable
        # cells (lists/arrays) contribute the field name only.
        items = []
        for k in sorted(self.__dict__):
            try:
                items.append((k, hash(self.__dict__[k])))
            except TypeError:
                items.append((k, -1))
        return hash(tuple(items))


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
        """Row access by int/slice (data_collection.py:73-88); a string key
        returns that COLUMN as a list (convenience beyond the reference —
        its tutorials reach columns via per-entity attributes)."""
        if isinstance(index, str):
            return [getattr(e, index, None) for e in self._data]
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

    def copy(self, deep: bool = False) -> "DataCollection":
        """data_collection.py:187-212 parity: shallow copies share Entities,
        deep copies duplicate them."""
        if deep:
            return DataCollection([Entity(**e.to_dict()) for e in self._data])
        return DataCollection(list(self._data))

    def prepare_table_data(self, limit: int = 5) -> tuple[list[str], list[list]]:
        """(headers, rows) for display (display.py:21-26 shape); negative
        limit = all rows; cells stringified + truncated like the
        reference's console table."""
        rows = self._data if limit < 0 else self._data[:limit]
        headers = list(self._data[0].to_dict().keys()) if self._data else []

        return headers, [[_cell_str(getattr(e, h, None)) for h in headers]
                         for e in rows]

    def to_html(self, limit: int = 5) -> str:
        """First ``limit`` rows as an HTML table — the notebook face of
        ``show`` (DisplayMixin tablefmt='html' → NestedHTMLTable,
        utils/html_table.py:21-66). Binary cells (the engine's opaque
        multimodal columns) render as inline base64 ``<img>`` like the
        reference's Image/VideoFrame cells (html_table.py:85-121); other
        cells take the truncated string form."""
        from base64 import b64encode  # noqa: PLC0415
        from html import escape  # noqa: PLC0415

        ents = self._data if limit < 0 else self._data[:limit]
        headers = list(self._data[0].to_dict().keys()) if self._data else []
        if not headers:
            return "<i>empty DataCollection</i>"

        def mime(b: bytes) -> str:
            # RFC 2397 needs a full type/subtype ("data:image;base64" is
            # malformed and falls back to text/plain in strict renderers)
            # — sniff the common magics, default to the reference's
            # image/png (html_table.py:120)
            if b.startswith(b"\xff\xd8\xff"):
                return "image/jpeg"
            if b.startswith((b"GIF87a", b"GIF89a")):
                return "image/gif"
            if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WEBP":
                return "image/webp"
            return "image/png"

        def td(v) -> str:
            if isinstance(v, (bytes, bytearray)):
                raw = bytes(v)
                b64 = b64encode(raw).decode()
                return ('<td><img style="max-height: 128px;" '
                        f'src="data:{mime(raw)};base64,{b64}"/></td>')
            return f"<td>{escape(_cell_str(v))}</td>"

        th = "".join(f"<th>{escape(h)}</th>" for h in headers)
        trs = "".join(
            "<tr>" + "".join(td(getattr(e, h, None)) for h in headers) + "</tr>"
            for e in ents
        )
        return (
            '<table style="border-collapse: collapse;">'
            f"<tr>{th}</tr>{trs}</table>"
        )

    def show(self, limit: int = 5, tablefmt: str = "grid") -> None:
        """Print the first ``limit`` rows (DisplayMixin.show,
        display.py:28-49): tablefmt='grid' renders a console grid,
        'html' prints the to_html table (no notebook frontend here to
        display it in-place)."""
        if tablefmt == "html":
            print(self.to_html(limit))
            return
        headers, rows = self.prepare_table_data(limit)
        if not headers:
            print("<empty DataCollection>")
            return
        widths = [
            max(len(h), *(len(r[i]) for r in rows)) if rows else len(h)
            for i, h in enumerate(headers)
        ]
        sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
        def line(vals):
            return "| " + " | ".join(v.ljust(w) for v, w in zip(vals, widths)) + " |"
        out = [sep, line(headers), sep] + [line(r) for r in rows] + [sep]
        if limit >= 0 and len(self._data) > limit:
            out.append(f"(showing {limit} of {len(self._data)} rows)")
        print("\n".join(out))

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
