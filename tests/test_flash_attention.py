"""Pallas fused attention vs the XLA reference path (interpret mode on CPU)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from minimagen_tpu.ops import attention as attn_ops
from minimagen_tpu.ops.flash_attention import mha_flash, mqa_flash


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("MINIMAGEN_TPU_PALLAS_INTERPRET", "1")
    # force the fused backward path in tests (default dispatch only uses it
    # above a memory threshold)
    monkeypatch.setenv("MINIMAGEN_TPU_FUSED_BWD_THRESHOLD", "0")
    yield


def _xla_mqa(q, k, v):
    s = jnp.einsum("bhnd,bjd->bhnj", q, k).astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnj,bjd->bhnd", p.astype(v.dtype), v).astype(q.dtype)


def _xla_mha(q, k, v):
    s = jnp.einsum("bhnd,bhjd->bhnj", q, k).astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnj,bhjd->bhnd", p.astype(v.dtype), v).astype(q.dtype)


@pytest.mark.parametrize("n,j", [(64, 65), (256, 259)])
def test_mqa_flash_matches_xla(n, j):
    key = jax.random.PRNGKey(0)
    b, h, d = 2, 2, 64
    q = jax.random.normal(key, (b, h, n, d)) * d**-0.5
    k = jax.random.normal(jax.random.PRNGKey(1), (b, j, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, j, d))
    out = mqa_flash(q, k, v)
    ref = _xla_mqa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-3)


def test_mha_flash_matches_xla():
    key = jax.random.PRNGKey(0)
    b, h, n, j, d = 2, 2, 64, 37, 64
    q = jax.random.normal(key, (b, h, n, d)) * d**-0.5
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, j, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, j, d))
    out = mha_flash(q, k, v)
    ref = _xla_mha(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-3)


def test_mqa_flash_gradients_match_xla():
    """custom_vjp backward (XLA recompute) must match autodiff through the
    plain implementation."""
    b, h, n, j, d = 1, 2, 16, 17, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d)) * d**-0.5
    k = jax.random.normal(jax.random.PRNGKey(1), (b, j, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, j, d))

    def loss_flash(q, k, v):
        return jnp.sum(mqa_flash(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_mqa(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=5e-4, rtol=5e-3)


def test_dispatch_uses_pallas_when_enabled():
    """attention ops route through the fused kernel when enabled and unmasked."""
    b, h, n, j, d = 1, 2, 16, 17, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, j, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, j, d))
    out = attn_ops.multi_query_attention(q, k, v)
    ref = _xla_mqa(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-3)

    # masked path must still work (falls back to XLA)
    mask = jnp.ones((b, j), bool)
    out_m = attn_ops.multi_query_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref), atol=2e-4, rtol=2e-3)


def _xla_mha_masked(q, k, v, mask):
    s = jnp.einsum("bhnd,bhjd->bhnj", q, k).astype(jnp.float32)
    s = jnp.where(mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnj,bhjd->bhnd", p.astype(v.dtype), v).astype(q.dtype)


@pytest.mark.parametrize("n,j", [(64, 37), (256, 259)])
def test_mha_flash_bias_matches_masked_xla(n, j):
    """Biased (masked) fused MHA forward == XLA masked attention."""
    from minimagen_tpu.ops.flash_attention import mha_flash_bias

    b, h, d = 2, 2, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d)) * d**-0.5
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, j, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, j, d))
    mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.8, (b, j))
    mask = mask.at[:, 0].set(True)  # never fully-masked rows (null tokens)
    bias = jnp.where(mask[:, None, None, :], 0.0, -1e30).astype(jnp.float32)
    out = mha_flash_bias(q, k, v, bias)
    ref = _xla_mha_masked(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-3)


def test_mha_flash_bias_gradients_match_masked_xla():
    """Fused Pallas masked-MHA backward == autodiff through the XLA masked
    path, across multiple q-blocks and heads (dk/dv accumulation)."""
    from minimagen_tpu.ops.flash_attention import mha_flash_bias

    b, h, n, j, d = 1, 3, 512, 67, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d)) * d**-0.5
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, j, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, j, d))
    mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.7, (b, j)).at[:, 0].set(True)
    bias = jnp.where(mask[:, None, None, :], 0.0, -1e30).astype(jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(mha_flash_bias(q, k, v, bias) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_mha_masked(q, k, v, mask) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, gf, gr in zip("qkv", g_flash, g_ref):
        gf, gr = np.asarray(gf), np.asarray(gr)
        scale = max(1e-6, float(np.abs(gr).max()))
        np.testing.assert_allclose(gf / scale, gr / scale, atol=5e-4,
                                   err_msg=f"d{name} mismatch")


def test_fused_cross_dispatch_in_training_graph(monkeypatch):
    """multi_head_attention routes masked shapes through mha_flash_bias only
    inside training_graph() with the env flag on, and matches XLA numerics."""
    monkeypatch.setenv("MINIMAGEN_TPU_PALLAS_CROSS_BWD", "1")
    monkeypatch.setenv("MINIMAGEN_TPU_PALLAS_CROSS_MIN_Q", "64")
    b, h, n, j, d = 1, 2, 64, 19, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d)) * d**-0.5
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, j, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, j, d))
    mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.8, (b, j)).at[:, 0].set(True)
    ref = _xla_mha_masked(q, k, v, mask)

    with attn_ops.training_graph():
        out = attn_ops.multi_head_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-3)
    # outside a training graph the flag must NOT reroute (inference HLO stable)
    out_inf = attn_ops.multi_head_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out_inf), np.asarray(ref), atol=2e-4, rtol=2e-3)


def test_mqa_pallas_backward_multiblock_accumulation():
    """dk/dv accumulate across (head, q-block) grid revisits: exercise
    multiple q-blocks (n=512 -> 2 blocks of 256) and multiple heads."""
    b, h, n, j, d = 1, 3, 512, 33, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, h, n, d)) * d**-0.5
    k = jax.random.normal(jax.random.PRNGKey(1), (b, j, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, j, d))

    def loss_flash(q, k, v):
        return jnp.sum(mqa_flash(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_mqa(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, gf, gr in zip("qkv", g_flash, g_ref):
        gf, gr = np.asarray(gf), np.asarray(gr)
        scale = max(1e-6, float(np.abs(gr).max()))
        np.testing.assert_allclose(gf / scale, gr / scale, atol=5e-4,
                                   err_msg=f"d{name} mismatch")
