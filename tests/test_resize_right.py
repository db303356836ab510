"""resize_right port verification (round-2 VERDICT missing #2 / next #4).

The installed-package comparison is impossible offline, so the matrix-form
port (`minimagen_tpu/ops/resize_right.py`) is checked against an INDEPENDENT
gather-based numpy implementation that follows the upstream v0.0.2 code
structure literally (pad array -> field-of-view gather -> weighted sum,
`resize_right.py::apply_weights` upstream), plus golden invariants.
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from minimagen_tpu.ops import resize_right as rr


# --------------------------------------------------------------------- #
# independent reference: literal gather-based transliteration of the      #
# published algorithm (pad + fov gather), no shared code with the port    #
# --------------------------------------------------------------------- #
def _cubic(x):
    ax = np.abs(x)
    return ((1.5 * ax**3 - 2.5 * ax**2 + 1.0) * (ax <= 1.0)
            + (-0.5 * ax**3 + 2.5 * ax**2 - 4.0 * ax + 2.0)
            * ((ax > 1.0) & (ax <= 2.0)))


def _resize_1d_gather(arr, dim, scale, out_sz, pad_mode):
    eps = np.finfo(np.float32).eps
    in_sz = arr.shape[dim]
    grid = (np.arange(out_sz) / scale + (in_sz - 1) / 2
            - (out_sz - 1) / (2 * scale))
    if scale < 1.0:
        support = 4.0 / scale
        kernel = lambda x: scale * _cubic(scale * x)
    else:
        support, kernel = 4.0, _cubic
    left = np.ceil(grid - support / 2 - eps).astype(int)
    width = math.ceil(support - eps)
    fov = left[:, None] + np.arange(width)
    weights = kernel(grid[:, None] - fov)
    s = weights.sum(1, keepdims=True)
    s[s == 0] = 1.0
    weights = weights / s
    # upstream pads the swapped-to-front array, then gathers the fov
    tmp = np.moveaxis(arr, dim, 0)
    pad_l, pad_r = -fov.min(), fov.max() - in_sz + 1
    pad_vec = [(max(pad_l, 0), max(pad_r, 0))] + [(0, 0)] * (tmp.ndim - 1)
    padded = np.pad(tmp, pad_vec, mode=pad_mode)
    neighbors = padded[fov + max(pad_l, 0)]          # (out, width, ...)
    w = weights.reshape(weights.shape + (1,) * (tmp.ndim - 1))
    return np.moveaxis((neighbors * w).sum(1), 0, dim)


def resize_gather(arr, scale, out_shape, dims=(-2, -1), pad_mode="reflect"):
    dims = [d % arr.ndim for d in dims]
    scales = [scale] * 2 if np.isscalar(scale) else list(scale)
    order = sorted(range(len(dims)), key=lambda k: scales[k])
    out = arr.astype(np.float64)
    for k in order:
        if scales[k] == 1.0:
            continue
        out = _resize_1d_gather(out, dims[k], scales[k], out_shape[k], pad_mode)
    return out


@pytest.mark.parametrize("in_sz,out_sz", [(8, 16), (16, 8), (8, 24), (24, 8),
                                          (16, 12), (12, 16), (7, 13), (13, 7)])
@pytest.mark.parametrize("pad_mode", ["reflect", "edge", "symmetric", "constant"])
def test_matrix_port_matches_gather_reference(in_sz, out_sz, pad_mode):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, in_sz, in_sz, 3))
    scale = out_sz / in_sz
    ref = resize_gather(x, scale, (out_sz, out_sz), dims=(1, 2), pad_mode=pad_mode)
    got = rr.resize(jnp.asarray(x, jnp.float32), scale_factors=scale,
                    dims=(1, 2), pad_mode=pad_mode)
    assert got.shape == (2, out_sz, out_sz, 3)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=2e-5)


def test_constant_image_preserved_exactly():
    """Weight normalization before boundary handling -> constants survive."""
    x = jnp.full((1, 8, 8, 3), 0.73, jnp.float32)
    up = rr.resize(x, scale_factors=2.0, dims=(1, 2))
    down = rr.resize(x, scale_factors=0.5, dims=(1, 2))
    np.testing.assert_allclose(np.asarray(up), 0.73, atol=1e-6)
    np.testing.assert_allclose(np.asarray(down), 0.73, atol=1e-6)


def test_symmetry_preserved():
    """The projection grid is symmetric around the center, so a left-right
    symmetric image resizes to a symmetric image (reflect padding)."""
    rng = np.random.default_rng(1)
    half = rng.normal(size=(1, 8, 4, 1))
    x = np.concatenate([half, half[:, :, ::-1]], axis=2)
    out = np.asarray(rr.resize(jnp.asarray(x, jnp.float32),
                               scale_factors=2.0, dims=(1, 2)))
    np.testing.assert_allclose(out, out[:, :, ::-1], atol=1e-5)


def test_out_shape_defaults_to_ceil():
    x = jnp.zeros((1, 10, 10, 1))
    out = rr.resize(x, scale_factors=0.75, dims=(1, 2))
    assert out.shape == (1, 8, 8, 1)  # ceil(7.5)


def test_matrix_rows_sum_to_one_inside():
    """Every output pixel's folded weights sum to 1 for non-constant modes."""
    for pad_mode in ("reflect", "edge", "symmetric"):
        m = rr.resize_matrix(8, 16, 2.0, pad_mode)
        np.testing.assert_allclose(m.sum(1), 1.0, atol=1e-12)
        m = rr.resize_matrix(16, 8, 0.5, pad_mode)
        np.testing.assert_allclose(m.sum(1), 1.0, atol=1e-12)


def test_gradients_flow():
    import jax

    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 8, 8, 1)),
                    jnp.float32)
    g = jax.grad(lambda im: rr.resize(im, scale_factors=2.0, dims=(1, 2)).sum())(x)
    assert g.shape == x.shape and np.all(np.isfinite(np.asarray(g)))


def test_identity_scale_is_noop():
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 8, 8, 1)),
                    jnp.float32)
    out = rr.resize(x, scale_factors=1.0, dims=(1, 2))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
