"""Link + text extraction from HTML bytes.

The production path is vectorized pandas/Arrow UDFs (Series in, Series
out — no per-row Python, per BASELINE.json input_hint). Alongside each
UDF lives an *independent* per-row reference implementation built on
stdlib ``html.parser`` — the per-row invariant from the input_hint is
"byte-identical extracted text per url" between the two, enforced in
tests (SURVEY.md §5).

Extraction spec (both implementations):
- links: every ``href`` attribute of every ``<a>`` tag, document order;
- text:  contents of every ``<p>`` element, joined with ``"\\n"``.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

_A_HREF = re.compile(rb'<a\s[^>]*?href="([^"]*)"', re.IGNORECASE | re.DOTALL)
_P_BODY = re.compile(rb"<p>(.*?)</p>", re.IGNORECASE | re.DOTALL)


# --------------------------------------------------------------------------
# Vectorized path (pandas UDFs over Arrow batches). Return types are
# DataType objects, not DDL strings: string parsing needs an active
# SparkContext, which doesn't exist at import time.
# --------------------------------------------------------------------------

@pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    """binary html → array<string> of href targets, document order."""
    return html.map(
        lambda b: [m.decode("utf-8", "replace") for m in _A_HREF.findall(b)]
        if b is not None
        else []
    )


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """binary html → extracted text (\\n-joined <p> contents)."""
    return html.map(
        lambda b: "\n".join(m.decode("utf-8", "replace") for m in _P_BODY.findall(b))
        if b is not None
        else ""
    )


# --------------------------------------------------------------------------
# Per-row reference implementations (independent: stdlib HTMLParser, no
# regex) — the differential oracle for the byte-identical invariant.
# --------------------------------------------------------------------------

class _RefParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self.links: list[str] = []
        self.paras: list[str] = []
        self._in_p = 0
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.links.append(v)
        elif tag == "p":
            self._in_p += 1
            self._buf = []

    def handle_endtag(self, tag):
        if tag == "p" and self._in_p:
            self._in_p -= 1
            self.paras.append("".join(self._buf))

    def handle_data(self, data):
        if self._in_p:
            self._buf.append(data)


def reference_extract_links(html_bytes: bytes | None) -> list[str]:
    if html_bytes is None:
        return []
    p = _RefParser()
    p.feed(html_bytes.decode("utf-8", "replace"))
    return p.links


def reference_extract_text(html_bytes: bytes | None) -> str:
    if html_bytes is None:
        return ""
    p = _RefParser()
    p.feed(html_bytes.decode("utf-8", "replace"))
    return "\n".join(p.paras)
