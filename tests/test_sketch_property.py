"""Property-based tests for the pure-python sketch kernels (no Spark).

The KLL compactor kernel (operators/kll._make_kll_core) and the PNM
parser (operators/multimodal._parse_pnm) are deterministic pure
functions, so hypothesis can hammer them directly — breadth comes from
the generators, not from Spark jobs.

KLL invariants, for ANY value sequence, batch split, and merge shape:
- exact weight conservation: state n == number of values fed, through
  every compaction and merge;
- the rank-error certificate: for every quantile q, the estimate's true
  rank span padded by err_bound contains ceil(q * n);
- determinism: the same feed order yields the identical state.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from example_dms_dataexport_spark.operators.kll import _make_kll_core
from example_dms_dataexport_spark.operators.multimodal import _parse_pnm

values = st.lists(
    st.floats(min_value=-1e9, max_value=1e9, allow_nan=False),
    min_size=1,
    max_size=400,
)


def _ceil(x: float) -> int:
    return int(-(-x // 1))


def _check_certificate(state, vals, quantile_fn):
    svals = sorted(vals)
    for q in (0.01, 0.25, 0.5, 0.9, 1.0):
        est, tol = quantile_fn(state, q)
        target = _ceil(q * len(svals))
        lt = sum(1 for v in svals if v < est)
        le = sum(1 for v in svals if v <= est)
        assert lt < target + tol, (q, est, tol, lt, target)
        assert le >= target - tol, (q, est, tol, le, target)


@given(values, st.integers(min_value=4, max_value=64))
@settings(max_examples=200, deadline=None)
def test_kll_conservation_and_certificate_single_feed(vals, k):
    new_state, add_values, _, quantile = _make_kll_core(k)
    st_ = add_values(new_state(), vals)
    assert st_["n"] == len(vals)
    _check_certificate(st_, vals, quantile)


@given(
    values,
    st.integers(min_value=4, max_value=32),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=150, deadline=None)
def test_kll_split_merge_conserves_and_certifies(vals, k, n_parts):
    new_state, add_values, merge_states, quantile = _make_kll_core(k)
    parts = [vals[i::n_parts] for i in range(n_parts)]
    merged = new_state()
    for p in parts:
        merged = merge_states(merged, add_values(new_state(), p))
    assert merged["n"] == len(vals)
    _check_certificate(merged, vals, quantile)


@given(values, st.integers(min_value=4, max_value=32))
@settings(max_examples=100, deadline=None)
def test_kll_deterministic_same_feed(vals, k):
    new_state, add_values, _, quantile = _make_kll_core(k)
    a = add_values(new_state(), vals)
    b = add_values(new_state(), vals)
    assert a == b
    assert quantile(a, 0.5) == quantile(b, 0.5)


pnm_pixels = st.lists(
    st.integers(min_value=0, max_value=255), min_size=1, max_size=200
)


@given(pnm_pixels, st.integers(min_value=1, max_value=20), st.booleans())
@settings(max_examples=200, deadline=None)
def test_pnm_roundtrip_any_geometry(pixels, width, rgb):
    import numpy as np

    h = -(-len(pixels) // width)
    padded = pixels + [0] * (width * h - len(pixels))
    body = bytes(
        b for px in padded for b in (([px] * 3) if rgb else [px])
    )
    magic = "P6" if rgb else "P5"
    raw = f"{magic}\n{width} {h}\n255\n".encode() + body
    m, w, hh, c, arr = _parse_pnm(raw)
    assert (m, w, hh, c) == (magic, width, h, 3 if rgb else 1)
    assert int(np.asarray(arr, dtype=np.int64).sum()) == sum(padded) * c
