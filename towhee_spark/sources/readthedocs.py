"""data_source.readthedocs parity (ref hub_ops/data_source.py:142-176):
enumerate a Read-the-Docs project's pages from its index, filter with
include/exclude, and fetch+extract text distributed-side.

Two transports behind one API:

* http(s) ``page_prefix`` — the index is fetched once on the driver
  (urllib), page bodies are fetched INSIDE the executors' Arrow batches
  (the crawl parallelizes with the cluster). Raises a clear RuntimeError
  when the sandbox has no network.
* local mirror directory — offline/test path: the same link extraction and
  parsing over files (how the tests run, and how an air-gapped corpus
  ingest would).
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_HREF = re.compile(r"""href=["']([^"'#?]+)["']""", re.I)


def _as_list(x) -> list[str]:
    if not x:
        return []
    return [x] if isinstance(x, str) else list(x)


def _read_page(url: str) -> str:
    if url.startswith(("http://", "https://")):
        import urllib.request  # noqa: PLC0415

        try:
            with urllib.request.urlopen(url, timeout=30) as r:  # noqa: S310
                return r.read().decode("utf-8", errors="replace")
        except Exception as e:  # noqa: BLE001
            raise RuntimeError(
                f"readthedocs fetch failed for {url!r} (no network in this "
                f"environment?): {e}"
            ) from e
    with open(url, "rb") as f:
        return f.read().decode("utf-8", errors="replace")


def _join(prefix: str, href: str) -> str:
    if href.startswith(("http://", "https://")) or os.path.isabs(href):
        return href
    return prefix.rstrip("/") + "/" + href.lstrip("./")


def readthedocs_urls(
    spark: SparkSession,
    page_prefix: str,
    index_page: str | None = None,
    include: list[str] | str = "",
    exclude: list[str] | str | None = None,
) -> DataFrame:
    """(url) rows for every doc page linked from the index — same signature
    semantics as the reference op (page_prefix splicing, include/exclude
    substring filters)."""
    index = index_page or (
        page_prefix
        if page_prefix.startswith(("http://", "https://"))
        else os.path.join(page_prefix, "index.html")
    )
    body = _read_page(index)
    inc, exc = _as_list(include), _as_list(exclude)
    urls: list[str] = []
    for href in _HREF.findall(body):
        if not href.endswith((".html", ".htm")):
            continue
        url = _join(page_prefix, href)
        if inc and not any(s in url for s in inc):
            continue
        if exc and any(s in url for s in exc):
            continue
        if url not in urls:
            urls.append(url)
    return spark.createDataFrame([(u,) for u in urls], T.StructType(
        [T.StructField("url", T.StringType())]
    ))


def readthedocs_texts(
    spark: SparkSession,
    page_prefix: str,
    index_page: str | None = None,
    include: list[str] | str = "",
    exclude: list[str] | str | None = None,
) -> DataFrame:
    """(url, text) rows: the page list from readthedocs_urls, fetched and
    html-stripped inside executor Arrow batches (distributed crawl)."""
    urls = readthedocs_urls(spark, page_prefix, index_page, include, exclude)
    out_schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("text", T.StringType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import html as _html  # noqa: PLC0415

        for pdf in batches:
            texts = []
            for u in pdf["url"]:
                # best-effort per page (the loaders' 'unparseable → empty'
                # degrade contract): one dead link must not kill a crawl of
                # thousands of pages; the hard raise stays on the
                # driver-side index fetch where it means misconfiguration
                try:
                    t = _read_page(u)
                except Exception:  # noqa: BLE001
                    texts.append("")
                    continue
                t = re.sub(r"<(script|style)[^>]*>.*?</\1>", " ", t, flags=re.S | re.I)
                t = re.sub(r"<[^>]+>", " ", t)
                # single stdlib unescape — a manual &amp;-first replace chain
                # double-unescapes entity-escaped code samples
                t = _html.unescape(t)
                texts.append(re.sub(r"\s+", " ", t).strip())
            yield pd.DataFrame({"url": pdf["url"], "text": texts})

    return urls.mapInPandas(run, schema=out_schema)
