"""Property suite for the pure PQ math (no Spark session): the
training geometry, assignment optimality, and ADC-vs-explicit-dot
identity over arbitrary small vector sets."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from example_dms_dataexport_spark.operators.pq import _subspaces

dims = st.sampled_from([4, 8, 16])


def _vecs(n, dim, seed):
    rng = np.random.RandomState(seed)
    return rng.randn(n, dim).round(3)


@given(
    n=st.integers(min_value=4, max_value=24),
    dim=dims,
    m=st.sampled_from([1, 2, 4]),
    seed=st.integers(min_value=0, max_value=999),
)
@settings(max_examples=100, deadline=None)
def test_subspace_reshape_preserves_values(n, dim, m, seed):
    x = _vecs(n, dim, seed)
    xs = _subspaces(x, m)
    assert xs.shape == (n, m, dim // m)
    assert np.array_equal(xs.reshape(n, dim), x)
    # subvector j of row i is exactly the contiguous slice
    for i in (0, n - 1):
        for j in range(m):
            s = dim // m
            assert np.array_equal(xs[i, j], x[i, j * s : (j + 1) * s])


@given(
    n=st.integers(min_value=4, max_value=24),
    k=st.integers(min_value=2, max_value=6),
    seed=st.integers(min_value=0, max_value=999),
)
@settings(max_examples=100, deadline=None)
def test_shifted_argmin_equals_true_nearest(n, k, seed):
    """The encode kernel drops the |x|^2 term (constant per row); its
    argmin must still equal the full squared-distance argmin, ties to
    the lowest index, for any centroid set."""
    dim, m = 8, 2
    x = _vecs(n, dim, seed)
    cent = _subspaces(_vecs(k, dim, seed + 1), m).transpose(1, 0, 2)  # (m,k,s)
    xs = _subspaces(x, m)
    shifted = -2.0 * np.einsum("nms,mks->nmk", xs, cent) + (cent**2).sum(-1)[
        None, :, :
    ]
    full = ((xs[:, :, None, :] - cent[None, :, :, :]) ** 2).sum(-1)
    assert np.array_equal(shifted.argmin(-1), full.argmin(-1))


@given(
    n=st.integers(min_value=2, max_value=12),
    k=st.integers(min_value=2, max_value=5),
    seed=st.integers(min_value=0, max_value=999),
)
@settings(max_examples=100, deadline=None)
def test_adc_lookup_equals_explicit_reconstruction_dot(n, k, seed):
    """sum_j lut[j, code_j] == dot(probe, reconstructed_vector) up to
    float associativity — ADC scores the quantized reconstruction."""
    dim, m = 8, 4
    x = _vecs(n, dim, seed)
    cent = _subspaces(_vecs(k, dim, seed + 1), m).transpose(1, 0, 2)  # (m,k,s)
    probe = _vecs(1, dim, seed + 2)[0]
    ps = probe.reshape(m, dim // m)
    lut = np.einsum("ms,mks->mk", ps, cent)  # (m, k)
    xs = _subspaces(x, m)
    d2 = -2.0 * np.einsum("nms,mks->nmk", xs, cent) + (cent**2).sum(-1)[
        None, :, :
    ]
    codes = d2.argmin(-1)  # (n, m)
    for i in range(n):
        adc = sum(float(lut[j, codes[i, j]]) for j in range(m))
        recon = np.concatenate([cent[j, codes[i, j]] for j in range(m)])
        assert abs(adc - float(np.dot(probe, recon))) < 1e-9
