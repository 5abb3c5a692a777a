"""Hilbert index: vectorized numpy vs independent pure-Python loop oracle —
the same cross-check style the reference uses
(/root/reference/tests/utils.py:229-246)."""

from __future__ import annotations

import numpy as np
from hypothesis import given
from hypothesis import strategies as st

from locus_spark.functions.hilbert import hilbert_d_np, hilbert_d_py

coords16 = st.integers(min_value=0, max_value=2**16 - 1)


@given(st.lists(st.tuples(coords16, coords16), min_size=1, max_size=64))
def test_np_matches_py_oracle(pairs):
    xs = np.array([p[0] for p in pairs], dtype=np.int64)
    ys = np.array([p[1] for p in pairs], dtype=np.int64)
    got = hilbert_d_np(16, xs, ys)
    want = [hilbert_d_py(16, x, y) for x, y in pairs]
    assert got.tolist() == want


def test_bijective_small_order():
    n = 2**5
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    d = hilbert_d_np(5, xs.ravel(), ys.ravel())
    assert sorted(d.tolist()) == list(range(n * n))


def test_locality_adjacent_cells():
    # consecutive Hilbert indices are adjacent cells (curve property)
    n = 2**4
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    d = hilbert_d_np(4, xs.ravel(), ys.ravel())
    order = np.argsort(d)
    px, py = xs.ravel()[order], ys.ravel()[order]
    step = np.abs(np.diff(px)) + np.abs(np.diff(py))
    assert (step == 1).all()
