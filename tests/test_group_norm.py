"""Fused GroupNorm+scale-shift+SiLU kernel vs the XLA reference path
(interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from minimagen_tpu.ops import group_norm as gn


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("MINIMAGEN_TPU_PALLAS_INTERPRET", "1")
    yield


def _inputs(b=2, h=8, w=8, c=32, groups=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (b, h, w, c)) * 3.0 + 0.5
    gamma = jax.random.normal(ks[1], (c,)) * 0.2 + 1.0
    beta = jax.random.normal(ks[2], (c,)) * 0.1
    ss = (jax.random.normal(ks[3], (b, 1, 1, c)) * 0.3,
          jax.random.normal(ks[4], (b, 1, 1, c)) * 0.3)
    return x, gamma, beta, ss


@pytest.mark.parametrize("silu", [False, True])
@pytest.mark.parametrize("with_ss", [False, True])
def test_fused_forward_matches_xla(silu, with_ss):
    x, gamma, beta, ss = _inputs()
    ss = ss if with_ss else None
    out = gn.group_norm_silu(x, gamma, beta, groups=8, scale_shift=ss, silu=silu)
    ref = gn._xla_forward(x, gamma, beta, ss, silu, groups=8, eps=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_forward_nonuniform_channels():
    # c not a multiple of 128 and multiple groups per lane span
    x, gamma, beta, ss = _inputs(b=1, h=4, w=4, c=48, groups=8, seed=3)
    out = gn.group_norm_silu(x, gamma, beta, groups=8, scale_shift=ss, silu=True)
    ref = gn._xla_forward(x, gamma, beta, ss, True, groups=8, eps=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("silu", [False, True])
def test_fused_gradients_match_xla(silu):
    x, gamma, beta, ss = _inputs(b=2, h=4, w=4, c=32)

    def loss_fused(x, gamma, beta, s, t):
        y = gn.group_norm_silu(x, gamma, beta, groups=8, scale_shift=(s, t), silu=silu)
        return jnp.sum(y * y)

    def loss_ref(x, gamma, beta, s, t):
        y = gn._xla_forward(x, gamma, beta, (s, t), silu, groups=8, eps=1e-5)
        return jnp.sum(y * y)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, *ss)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, *ss)
    for name, gf, gr in zip(["dx", "dgamma", "dbeta", "dss_s", "dss_t"], g_fused, g_ref):
        gf, gr = np.asarray(gf).reshape(np.asarray(gr).shape), np.asarray(gr)
        scale = max(1e-6, float(np.abs(gr).max()))
        np.testing.assert_allclose(gf / scale, gr / scale, atol=1e-4,
                                   err_msg=f"{name} mismatch")


def test_fused_gradients_batch_accumulation():
    """dgamma/dbeta accumulate across the sequential batch grid (b > 1)."""
    x, gamma, beta, ss = _inputs(b=4, h=4, w=4, c=16, seed=7)

    def loss(x, gamma, beta):
        y = gn.group_norm_silu(x, gamma, beta, groups=8, silu=True)
        return jnp.sum(jnp.sin(y))

    def loss_ref(x, gamma, beta):
        y = gn._xla_forward(x, gamma, beta, None, True, groups=8, eps=1e-5)
        return jnp.sum(jnp.sin(y))

    g = jax.grad(loss, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for name, a, b_ in zip(["dx", "dgamma", "dbeta"], g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-3,
                                   err_msg=f"{name} mismatch")


def test_bwd_xla_fallback_for_large_slabs(monkeypatch):
    """Backward falls back to the XLA-recompute path above the slab budget
    and still matches."""
    monkeypatch.setattr(gn, "_BWD_SLAB_BUDGET", 0)
    x, gamma, beta, ss = _inputs(b=2, h=4, w=4, c=32, seed=1)

    def loss_fused(x, gamma, beta, s, t):
        y = gn.group_norm_silu(x, gamma, beta, groups=8, scale_shift=(s, t), silu=True)
        return jnp.sum(y * y)

    def loss_ref(x, gamma, beta, s, t):
        y = gn._xla_forward(x, gamma, beta, (s, t), True, groups=8, eps=1e-5)
        return jnp.sum(y * y)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, *ss)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, *ss)
    for name, gf, gr in zip(["dx", "dgamma", "dbeta", "dss_s", "dss_t"], g_fused, g_ref):
        gf, gr = np.asarray(gf).reshape(np.asarray(gr).shape), np.asarray(gr)
        np.testing.assert_allclose(gf, gr, atol=1e-4, rtol=1e-3, err_msg=f"{name} mismatch")


def test_block_module_uses_fused_path():
    """models.layers.Block output is unchanged whether the fused kernel or the
    XLA path runs."""
    from minimagen_tpu.models.layers import Block

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    ss = (jnp.full((2, 1, 1, 16), 0.2), jnp.full((2, 1, 1, 16), -0.1))
    blk = Block(dim=16, dim_out=24)
    params = blk.init(jax.random.PRNGKey(1), x)
    out_fused = blk.apply(params, x, scale_shift=ss)

    import os
    os.environ["MINIMAGEN_TPU_DISABLE_PALLAS"] = "1"
    try:
        out_xla = blk.apply(params, x, scale_shift=ss)
    finally:
        del os.environ["MINIMAGEN_TPU_DISABLE_PALLAS"]
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                               atol=2e-5, rtol=2e-5)


def test_bf16_activations():
    x, gamma, beta, ss = _inputs(b=2, h=8, w=8, c=32)
    xb = x.astype(jnp.bfloat16)
    out = gn.group_norm_silu(xb, gamma, beta, groups=8, scale_shift=ss, silu=True)
    assert out.dtype == jnp.bfloat16
    ref = gn._xla_forward(x, gamma, beta, ss, True, groups=8, eps=1e-5)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.05, rtol=0.05)


class TestMomentsPath:
    """The dtype-flow-restructured XLA path (round-3 VERDICT #1) must match
    the round-2 two-pass formulation numerically in all configurations."""

    @pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)])
    @pytest.mark.parametrize("silu", [False, True])
    @pytest.mark.parametrize("with_ss", [False, True])
    def test_matches_reference_formulation(self, monkeypatch, dtype, atol, silu, with_ss):
        from minimagen_tpu.ops.group_norm import (
            _xla_forward, _xla_forward_reference,
        )

        rng = np.random.default_rng(0)
        b, h, w, c, g = 2, 8, 8, 32, 8
        x = jnp.asarray(rng.normal(size=(b, h, w, c)) * 1.7 + 0.4, dtype)
        gamma = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.2 + 1.0)
        beta = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
        ss = None
        if with_ss:
            ss = (jnp.asarray(rng.normal(size=(b, 1, 1, c)), jnp.float32) * 0.3,
                  jnp.asarray(rng.normal(size=(b, 1, 1, c)), jnp.float32) * 0.3)
        monkeypatch.setenv("MINIMAGEN_TPU_GN_MOMENTS", "1")
        out = _xla_forward(x, gamma, beta, ss, silu, g, 1e-5)
        ref = _xla_forward_reference(x, gamma, beta, ss, silu, g, 1e-5)
        assert out.dtype == x.dtype
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=atol, rtol=1e-2 if dtype == jnp.bfloat16 else 1e-5)

    def test_env_zero_selects_reference_path(self, monkeypatch):
        from minimagen_tpu.ops import group_norm as gn

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 8)), jnp.float32)
        gamma = jnp.ones((8,), jnp.float32)
        beta = jnp.zeros((8,), jnp.float32)
        monkeypatch.setenv("MINIMAGEN_TPU_GN_MOMENTS", "0")
        a = gn._xla_forward(x, gamma, beta, None, False, 2, 1e-5)
        b = gn._xla_forward_reference(x, gamma, beta, None, False, 2, 1e-5)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_gradients_match(self, monkeypatch):
        from minimagen_tpu.ops.group_norm import (
            _xla_forward, _xla_forward_reference,
        )

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 16)), jnp.float32)
        gamma = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) + 1.0)
        beta = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
        monkeypatch.setenv("MINIMAGEN_TPU_GN_MOMENTS", "1")
        g1 = jax.grad(lambda x, g, b: _xla_forward(x, g, b, None, True, 4, 1e-5).sum(),
                      argnums=(0, 1, 2))(x, gamma, beta)
        g2 = jax.grad(lambda x, g, b: _xla_forward_reference(x, g, b, None, True, 4, 1e-5).sum(),
                      argnums=(0, 1, 2))(x, gamma, beta)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4)
