"""HTML → text extraction with the per-row byte-identity invariant.

BASELINE input_hint mandates: *byte-identical extracted text per url* between
the pure-Python reference extractor and its vectorized Spark application.
``extract_text`` is the single source of truth; the Spark path applies the
very same function per Arrow batch (``mapInPandas``) so the bytes cannot
diverge — the test suite asserts equality row by row anyway.

The extractor is deliberately simple and total (tag stripping + entity
unescape + whitespace normalization): the point of the invariant is the
*plumbing* (binary column in, deterministic string out, at any parallelism),
not HTML fidelity.
"""

from __future__ import annotations

import html as _htmllib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_SCRIPT_RE = re.compile(
    rb"<(script|style)\b[^>]*>.*?</\1>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html_bytes: bytes) -> str:
    """Pure-Python reference extractor (total function, bytes → str)."""
    if html_bytes is None:
        return ""
    no_script = _SCRIPT_RE.sub(b" ", html_bytes)
    no_tags = _TAG_RE.sub(b" ", no_script)
    decoded = no_tags.decode("utf-8", errors="replace")
    unescaped = _htmllib.unescape(decoded)
    return _WS_RE.sub(" ", unescaped).strip()


def with_extracted_text(
    pages: DataFrame, html_col: str = "html", out_col: str = "extracted"
) -> DataFrame:
    """Vectorized application of :func:`extract_text` over Arrow batches.
    Appends ``out_col`` (string) to the pages DataFrame."""
    schema = pages.schema.simpleString()[7:-1] + f", {out_col} string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            b = b.copy()
            b[out_col] = b[html_col].map(extract_text)
            yield b

    return pages.mapInPandas(run, schema)
