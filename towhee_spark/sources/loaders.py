"""Document loaders — parity with Towhee's data_loader hub ops
(towhee/runtime/hub_ops/data_loader.py:24-238: doc/excel/markdown/pdf/text/
html/notebook/powerpoint loaders → text).

Shape: ``binaryFile``/``text`` scan → Arrow-batched parse UDF → (path,
text) rows. Text-based formats (text, markdown, html, notebook) parse for
real with stdlib-only code; binary formats (pdf, excel, powerpoint, docx)
need external libs absent from this environment, so they raise
NotImplementedError at *plan construction* with a clear message — the scan
+ UDF plumbing is identical, only the innermost parser differs.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from towhee_spark.sources.io import read_glob

_OUT = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("text", T.StringType()),
])


def _parse_df(df: DataFrame, parse) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"path": pdf["path"], "text": [parse(b) for b in pdf["content"]]}
            )

    return df.select("path", "content").mapInPandas(run, schema=_OUT)


def _decode(b: bytes) -> str:
    return (b or b"").decode("utf-8", errors="replace")


def text_loader(spark: SparkSession, path: str, pattern: str = "*.txt") -> DataFrame:
    """data_loader.text_loader: plain text files → (path, text)."""
    return _parse_df(read_glob(spark, path, pattern, binary=True), _decode)


def markdown_loader(spark: SparkSession, path: str, pattern: str = "*.md") -> DataFrame:
    """data_loader.markdown_loader: strip common markdown syntax → text."""
    def parse(b: bytes) -> str:
        t = _decode(b)
        t = re.sub(r"```.*?```", " ", t, flags=re.S)       # code fences
        t = re.sub(r"!\[[^\]]*\]\([^)]*\)", " ", t)          # images
        t = re.sub(r"\[([^\]]*)\]\([^)]*\)", r"\1", t)       # links → label
        t = re.sub(r"^#{1,6}\s*", "", t, flags=re.M)          # headings
        t = re.sub(r"[*_`>#]+", " ", t)
        return re.sub(r"\s+", " ", t).strip()

    return _parse_df(read_glob(spark, path, pattern, binary=True), parse)


def html_loader(spark: SparkSession, path: str, pattern: str = "*.html") -> DataFrame:
    """data_loader.html_loader: strip tags/scripts → text (stdlib regex)."""
    def parse(b: bytes) -> str:
        t = _decode(b)
        t = re.sub(r"<(script|style)[^>]*>.*?</\1>", " ", t, flags=re.S | re.I)
        t = re.sub(r"<[^>]+>", " ", t)
        t = t.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
        return re.sub(r"\s+", " ", t).strip()

    return _parse_df(read_glob(spark, path, pattern, binary=True), parse)


def notebook_loader(spark: SparkSession, path: str, pattern: str = "*.ipynb") -> DataFrame:
    """data_loader.notebook_loader: concatenate markdown+code cell sources."""
    def parse(b: bytes) -> str:
        try:
            nb = json.loads(_decode(b))
            cells = nb.get("cells", [])
            return "\n".join("".join(c.get("source", [])) for c in cells)
        except (json.JSONDecodeError, AttributeError):
            return ""

    return _parse_df(read_glob(spark, path, pattern, binary=True), parse)


def _needs_external(fmt: str, lib: str):
    def loader(spark: SparkSession, path: str, pattern: str = "*"):
        raise NotImplementedError(
            f"{fmt} parsing requires {lib}, unavailable in this environment; "
            "the scan+UDF plumbing matches text_loader — swap the parser in."
        )

    return loader


pdf_loader = _needs_external("pdf", "pypdf")
excel_loader = _needs_external("excel", "openpyxl")
powerpoint_loader = _needs_external("powerpoint", "python-pptx")
doc_loader = _needs_external("docx", "python-docx")
