"""Hilbert space-filling-curve index, vectorized.

The reference maps box centers onto a 2^16 x 2^16 Hilbert grid to bulk-pack
its R-tree (``/root/reference/locus/_core/hilbert.py:7-35``, used at
``/root/reference/locus/_core/r.py:112-134``).  We use the same curve for the
same purpose — clustering spatially-near rows into the same partitions — via
``repartitionByRange(hilbert_key)``.

Implementation is the classic public-domain xy2d algorithm (Wikipedia,
"Hilbert curve — Applications and mapping algorithms"), vectorized over numpy
arrays: the loop runs once per bit level (16 iterations for order 16), each
iteration a handful of elementwise uint64 ops — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

#: grid order used by the reference (SQUARE_SIZE = 2**16,
#: /root/reference/locus/_core/hilbert.py:3-4)
DEFAULT_ORDER = 16


def hilbert_d_py(order: int, x: int, y: int) -> int:
    """Pure-Python scalar oracle (classic xy2d loop) — used only in tests,
    mirroring the reference's own independent-loop cross-check
    (``/root/reference/tests/utils.py:229-246``)."""
    rx = ry = 0
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def hilbert_d_np(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized xy2d: (x, y) int arrays in [0, 2**order) -> Hilbert index."""
    x = x.astype(np.int64, copy=True)
    y = y.astype(np.int64, copy=True)
    d = np.zeros(x.shape, dtype=np.int64)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= 1
    return d


def make_hilbert_udf(order: int = DEFAULT_ORDER):
    """pandas UDF ``(cx long, cy long) -> long`` Hilbert index at ``order``."""

    @pandas_udf("long")
    def hilbert_key(cx: pd.Series, cy: pd.Series) -> pd.Series:
        d = hilbert_d_np(order, cx.to_numpy(), cy.to_numpy())
        return pd.Series(d)

    return hilbert_key
