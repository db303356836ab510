"""Training-graph XLA attention backward (ops/attention.py::training_graph).

Inside `training_graph()`, XLA-path attention shapes above the size threshold
route through a custom VJP whose backward recomputes the probabilities and
runs the (n x j) matmuls in the activation dtype with f32 accumulation —
instead of autodiff's f32 einsum chain (round-3 train-step profile,
BASELINE.md). These tests pin:

- forward outputs identical to the plain path (the additive mask bias is
  absorbed exactly by NEG_INF in f32),
- gradients matching plain autodiff within mixed-precision tolerance,
- the dispatch gate: off outside training_graph(), off under the size
  threshold, off when MINIMAGEN_TPU_XLA_ATTN_BWD=0.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from minimagen_tpu.ops import attention as attn_ops


def _inputs(kind, b=2, h=2, n=64, j=37, d=64, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = (jax.random.normal(ks[0], (b, h, n, d)) * d**-0.5).astype(dtype)
    kv_shape = (b, j, d) if kind == "mqa" else (b, h, j, d)
    k = jax.random.normal(ks[1], kv_shape).astype(dtype)
    v = jax.random.normal(ks[2], kv_shape).astype(dtype)
    # mask with real padding (True = keep), never all-False per row
    mask = jax.random.bernoulli(ks[3], 0.7, (b, j)).at[:, 0].set(True)
    return q, k, v, mask


def _apply(kind, q, k, v, mask):
    fn = (attn_ops.multi_query_attention if kind == "mqa"
          else attn_ops.multi_head_attention)
    return fn(q, k, v, mask=mask)


@pytest.fixture(autouse=True)
def _engage(monkeypatch):
    # the rework ships OFF (measured 1.6% negative on the flagship train
    # step — table in ops/attention.py); enable it for these tests, with the
    # size gate low enough for test shapes and Pallas off so the XLA path is
    # hit
    monkeypatch.setenv("MINIMAGEN_TPU_XLA_ATTN_BWD", "1")
    monkeypatch.setenv("MINIMAGEN_TPU_XLA_ATTN_BWD_MIN", "1")
    monkeypatch.setenv("MINIMAGEN_TPU_DISABLE_PALLAS", "1")
    yield


@pytest.mark.parametrize("kind", ["mqa", "mha"])
@pytest.mark.parametrize("masked", [True, False])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_plain_path(kind, masked, dtype):
    q, k, v, mask = _inputs(kind, dtype=dtype)
    mask = mask if masked else None
    plain = _apply(kind, q, k, v, mask)
    with attn_ops.training_graph():
        fast = _apply(kind, q, k, v, mask)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(fast))


@pytest.mark.parametrize("kind", ["mqa", "mha"])
@pytest.mark.parametrize("masked", [True, False])
def test_gradients_match_autodiff_f32(kind, masked):
    q, k, v, mask = _inputs(kind)
    mask = mask if masked else None

    def loss_plain(q, k, v):
        return jnp.sum(jnp.sin(_apply(kind, q, k, v, mask)))

    def loss_fast(q, k, v):
        with attn_ops.training_graph():
            return jnp.sum(jnp.sin(_apply(kind, q, k, v, mask)))

    ref = jax.grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss_fast, argnums=(0, 1, 2))(q, k, v)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(r), np.asarray(g),
                                   atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize("kind", ["mqa", "mha"])
def test_gradients_match_autodiff_bf16(kind):
    q, k, v, mask = _inputs(kind, dtype=jnp.bfloat16)

    def loss_plain(q, k, v):
        return jnp.sum(_apply(kind, q, k, v, mask).astype(jnp.float32))

    def loss_fast(q, k, v):
        with attn_ops.training_graph():
            return jnp.sum(_apply(kind, q, k, v, mask).astype(jnp.float32))

    ref = jax.grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss_fast, argnums=(0, 1, 2))(q, k, v)
    for r, g in zip(ref, got):
        # backward matmuls run in bf16 (vs autodiff's f32 chain): bf16-level
        # tolerance; near-cancelled elements can differ by one bf16 ulp scaled
        # by the reduction, hence the absolute floor
        np.testing.assert_allclose(np.asarray(r, jnp.float32),
                                   np.asarray(g, jnp.float32),
                                   atol=5e-2, rtol=5e-2)


def test_dispatch_gating(monkeypatch):
    q, k, v, mask = _inputs("mqa")

    def used_custom():
        def f(q):
            with attn_ops.training_graph():
                return jnp.sum(_apply("mqa", q, k, v, mask))
        jaxpr = jax.make_jaxpr(jax.grad(f))(q)
        return "custom_vjp_call" in str(jaxpr)

    assert used_custom()
    # below the size threshold -> plain autodiff
    monkeypatch.setenv("MINIMAGEN_TPU_XLA_ATTN_BWD_MIN", str(10**9))
    assert not used_custom()
    monkeypatch.setenv("MINIMAGEN_TPU_XLA_ATTN_BWD_MIN", "1")
    # kill switch / default-off
    monkeypatch.setenv("MINIMAGEN_TPU_XLA_ATTN_BWD", "0")
    assert not used_custom()
    monkeypatch.delenv("MINIMAGEN_TPU_XLA_ATTN_BWD")
    assert not used_custom()  # ships OFF by default (measured negative)
    monkeypatch.setenv("MINIMAGEN_TPU_XLA_ATTN_BWD", "1")
    # outside training_graph() the plain path is used
    def g(q):
        return jnp.sum(_apply("mqa", q, k, v, mask))
    assert "custom_vjp_call" not in str(jax.make_jaxpr(jax.grad(g))(q))


def test_loss_graph_engages_flag():
    """Imagen._p_losses traces its U-Net forward inside training_graph()."""
    seen = []
    orig = attn_ops._use_train_bwd

    def spy(n, j):
        r = orig(n, j)
        seen.append((n, j, attn_ops._training_graph_depth > 0))
        return r

    from minimagen_tpu.models.imagen import Imagen
    from minimagen_tpu.models.unet import UnetConfig

    imagen = Imagen(
        unets=[UnetConfig(dim=16, dim_mults=(1, 2), num_resnet_blocks=1,
                          layer_attns=(False, True), layer_cross_attns=(False, True))],
        image_sizes=(16,), timesteps=25, text_encoder_name="t5_small",
        text_embed_dim=64,
    )
    loss_fn = imagen.stage_loss_fn(0)
    params = imagen.init_params(jax.random.PRNGKey(0), batch_size=2, text_len=8)
    imgs = jnp.zeros((2, 16, 16, 3))
    emb = jnp.zeros((2, 8, 64))
    msk = jnp.ones((2, 8), bool)

    attn_ops._use_train_bwd = spy
    try:
        jax.eval_shape(lambda p: loss_fn(p, imgs, emb, msk, jax.random.PRNGKey(1)),
                       params["unet_0"])
    finally:
        attn_ops._use_train_bwd = orig
    assert seen and all(flag for *_, flag in seen)
