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
from example_dms_dataexport_spark.operators.multimodal import (
    _decode_png,
    _encode_png,
    _parse_pnm,
)

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


@given(values, st.integers(min_value=4, max_value=32))
@settings(max_examples=100, deadline=None)
def test_kll_drops_nan_and_counts_nonnull(vals, k):
    # NULL/NaN inputs must be dropped (a NaN in a buffer breaks sorted()'s
    # total order and silently voids the certificate) and must not count
    # toward n — count(value IS NOT NULL) semantics.
    new_state, add_values, _, quantile = _make_kll_core(k)
    with_nans = []
    for i, v in enumerate(vals):
        with_nans.append(v)
        if i % 3 == 0:
            with_nans.append(float("nan"))
    st_ = add_values(new_state(), with_nans)
    clean = add_values(new_state(), vals)
    assert st_["n"] == len(vals)
    assert st_ == clean


# --- PNG codec (compressed-format decode, stdlib zlib + unfilter) -----------

png_pixels = st.lists(
    st.integers(min_value=0, max_value=255), min_size=1, max_size=200
)
png_color = st.sampled_from([(0, 1), (2, 3), (6, 4)])


@given(
    png_pixels,
    st.integers(min_value=1, max_value=20),
    png_color,
    st.integers(min_value=0, max_value=3124),  # base-5 digit soup
)
@settings(max_examples=200, deadline=None)
def test_png_roundtrip_any_geometry_filters(pixels, width, color, filter_seed):
    import numpy as np

    color_type, c = color
    h = -(-len(pixels) // width)
    padded = pixels + [0] * (width * h - len(pixels))
    img = np.repeat(np.asarray(padded, dtype=np.uint8), c).reshape(h, width, c)
    filters = [(filter_seed // (5**(r % 5))) % 5 for r in range(h)]
    raw = _encode_png(img, color_type, filters)
    ct, w, hh, cc, arr, mask = _decode_png(raw)
    assert (ct, w, hh, cc) == (color_type, width, h, c)
    assert np.array_equal(arr, img.reshape(-1))
    assert mask == __import__("functools").reduce(
        lambda a, f: a | (1 << f), filters, 0
    )


def test_png_rejects_bad_payloads():
    import numpy as np
    import pytest

    img = np.zeros((2, 2, 1), dtype=np.uint8)
    raw = _encode_png(img, 0, [0, 1])
    with pytest.raises(ValueError, match="signature"):
        _decode_png(b"\x89PNX" + raw[4:])
    tampered = bytearray(raw)
    tampered[-5] ^= 0xFF  # inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        _decode_png(bytes(tampered))
    # 16-bit depth is an explicit Pillow-gate rejection, not a wrong answer
    deep = bytearray(raw)
    depth_off = 8 + 8 + 8  # sig + IHDR len/type + w/h
    deep[depth_off] = 16
    import struct
    import zlib

    ihdr = bytes(deep[16 : 16 + 13])
    deep[16 + 13 : 16 + 17] = struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        _decode_png(bytes(deep))


# --- baseline JPEG codec (operators/multimodal._make_jpeg_codec) -----------

jpeg_bytes = st.lists(
    st.integers(min_value=0, max_value=255), min_size=0, max_size=40
)


@given(jpeg_bytes, st.integers(min_value=1, max_value=6))
@settings(max_examples=60, deadline=None)
def test_jpeg_structured_roundtrip_exact_property(bytes_, bw):
    """For ANY byte sequence and grid width, the q132 fixture structure
    (constant level + frequency-4 stripe per block) survives the full
    encode -> Huffman -> IDCT pipeline EXACTLY, and the AC accounting
    matches the byte rule."""
    import numpy as np

    from example_dms_dataexport_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg,
    )

    stripe = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int64)
    nb = max(1, len(bytes_))
    bh = -(-nb // bw)
    img = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
    for k in range(bw * bh):
        byte = bytes_[k] if k < len(bytes_) else 0
        v = min(239, max(16, byte))
        blk = np.full((8, 8), v, dtype=np.int64)
        blk += (byte % 3) * stripe[np.newaxis, :]
        by, bx = divmod(k, bw)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk.astype("uint8")
    w, h, n_blocks, px, acn, aca = _decode_jpeg(_encode_jpeg(img))
    assert (w, h, n_blocks) == (bw * 8, bh * 8, bw * bh)
    assert np.array_equal(px, img)
    padded = list(bytes_) + [0] * (bw * bh - len(bytes_))
    assert acn == sum(1 for b in padded if b % 3)
    assert aca == 8 * sum(b % 3 for b in padded)


@given(
    st.integers(min_value=0, max_value=2**32 - 1),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_generic_roundtrip_error_bounded_property(seed, bh, bw):
    """ANY image round-trips within the unit-quant rounding bound — the
    general (non-fixture) encoder path with ZRL and arbitrary run/size
    symbols stays correct, just lossy."""
    import numpy as np

    from example_dms_dataexport_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(bh * 8, bw * 8), dtype=np.uint8)
    w, h, nb, px, _, _ = _decode_jpeg(_encode_jpeg(img))
    assert (w, h, nb) == (bw * 8, bh * 8, bw * bh)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 4
