"""Fused CrossEmbed stem (kernel merging + space-to-depth) vs the reference
parallel-convs formulation — exact to float tolerance, fwd and grad."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from minimagen_tpu.ops import stem_conv as sc


def _weights(kernel_sizes, cin, dim_out, seed=0):
    ks = sorted(kernel_sizes)
    dim_scales = [int(dim_out / (2**i)) for i in range(1, len(ks))]
    dim_scales = [*dim_scales, dim_out - sum(dim_scales)]
    rng = np.random.default_rng(seed)
    kernels = [jnp.asarray(rng.normal(size=(k, k, cin, d)) * 0.1, jnp.float32)
               for k, d in zip(ks, dim_scales)]
    biases = [jnp.asarray(rng.normal(size=(d,)) * 0.1, jnp.float32) for d in dim_scales]
    return kernels, biases


@pytest.mark.parametrize("cin", [3, 6])
@pytest.mark.parametrize("hw", [16, 64])
def test_fused_matches_reference(cin, hw):
    kernels, biases = _weights((3, 7, 15), cin, 32)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, hw, hw, cin)), jnp.float32)
    ref = sc.cross_embed_reference(x, kernels, biases, stride=1, dtype=jnp.float32)
    out = sc.cross_embed_fused(x, kernels, biases, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_fused_matches_reference_single_kernel():
    kernels, biases = _weights((7,), 3, 16, seed=2)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 32, 32, 3)), jnp.float32)
    ref = sc.cross_embed_reference(x, kernels, biases, stride=1, dtype=jnp.float32)
    out = sc.cross_embed_fused(x, kernels, biases, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_fused_gradients_match_reference():
    kernels, biases = _weights((3, 7, 15), 3, 32, seed=4)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 16, 16, 3)), jnp.float32)

    def loss_fused(x, kernels, biases):
        return jnp.sum(sc.cross_embed_fused(x, kernels, biases, dtype=jnp.float32) ** 2)

    def loss_ref(x, kernels, biases):
        return jnp.sum(sc.cross_embed_reference(x, kernels, biases, 1, jnp.float32) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, kernels, biases)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, kernels, biases)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_dispatch_custom_vjp_gradients(monkeypatch):
    """cross_embed_conv's dispatched path (fwd=reference, bwd=fused VJP)
    produces the same gradients as plain autodiff through the reference."""
    monkeypatch.setenv("MINIMAGEN_TPU_STEM_FUSED", "1")
    kernels, biases = _weights((3, 7, 15), 3, 32, seed=11)
    x = jnp.asarray(np.random.default_rng(12).normal(size=(2, 16, 16, 3)), jnp.float32)

    def loss_disp(x, kernels, biases):
        y = sc.cross_embed_conv(x, kernels, biases, stride=1, dtype=jnp.float32)
        return jnp.sum(y ** 2)

    def loss_ref(x, kernels, biases):
        return jnp.sum(sc.cross_embed_reference(x, kernels, biases, 1, jnp.float32) ** 2)

    out_d = loss_disp(x, kernels, biases)
    out_r = loss_ref(x, kernels, biases)
    np.testing.assert_allclose(float(out_d), float(out_r), rtol=1e-6)
    gd = jax.grad(loss_disp, argnums=(0, 1, 2))(x, kernels, biases)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, kernels, biases)
    for a, b in zip(jax.tree_util.tree_leaves(gd), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4)


def test_module_dispatch_env_override(monkeypatch):
    """CrossEmbedLayer output identical with the fused path forced on vs off,
    and the param tree keeps nn.Conv's layout (conv_i/{kernel,bias})."""
    from minimagen_tpu.models.layers import CrossEmbedLayer

    layer = CrossEmbedLayer(dim_in=3, kernel_sizes=(3, 7, 15), dim_out=32, stride=1)
    x = jnp.asarray(np.random.default_rng(6).normal(size=(2, 16, 16, 3)), jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x)

    tree = jax.tree_util.tree_map(lambda a: a.shape, params)["params"]
    assert set(tree.keys()) == {"conv_0", "conv_1", "conv_2"}
    assert tree["conv_0"]["kernel"] == (3, 3, 3, 16)
    assert tree["conv_2"]["kernel"] == (15, 15, 3, 8)
    assert tree["conv_1"]["bias"] == (8,)

    monkeypatch.setenv("MINIMAGEN_TPU_STEM_FUSED", "0")
    out_ref = layer.apply(params, x)
    monkeypatch.setenv("MINIMAGEN_TPU_STEM_FUSED", "1")
    out_fused = layer.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)


def test_stride2_keeps_reference_path(monkeypatch):
    """Stride-2 cross-embeds (downsample option) always run the reference
    formulation, whatever the env says."""
    assert not sc.use_fused_stem(2, 16, 16)
    monkeypatch.setenv("MINIMAGEN_TPU_STEM_FUSED", "1")
    # env forces fused for stride 1 only at the dispatcher level; the module
    # asserts parity separately — here just exercise stride-2 reference math
    from minimagen_tpu.models.layers import CrossEmbedLayer

    layer = CrossEmbedLayer(dim_in=4, kernel_sizes=(2, 4), dim_out=16, stride=2)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(1, 16, 16, 4)), jnp.float32)
    monkeypatch.setenv("MINIMAGEN_TPU_STEM_FUSED", "0")
    params = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(params, x)
    assert out.shape == (1, 8, 8, 16)


def test_bf16_fused():
    kernels, biases = _weights((3, 7, 15), 3, 32, seed=8)
    x = jnp.asarray(np.random.default_rng(9).normal(size=(2, 16, 16, 3)), jnp.bfloat16)
    ref = sc.cross_embed_reference(x, kernels, biases, stride=1, dtype=jnp.bfloat16)
    out = sc.cross_embed_fused(x, kernels, biases, dtype=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               atol=0.15, rtol=0.1)


@pytest.mark.parametrize("f", [2, 4, 8])
@pytest.mark.parametrize("cin,hw", [(3, 16), (6, 64)])
def test_s2d_conv_matches_reference(f, cin, hw):
    kernels, biases = _weights((3, 7, 15), cin, 32)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, hw, hw, cin)), jnp.float32)
    ref = sc.cross_embed_reference(x, kernels, biases, stride=1, dtype=jnp.float32)
    out = sc.cross_embed_s2d_conv(x, kernels, biases, f, dtype=jnp.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_s2d_env_selects_forward(monkeypatch):
    kernels, biases = _weights((3, 7, 15), 3, 32)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(1, 32, 32, 3)), jnp.float32)
    ref = sc.cross_embed_reference(x, kernels, biases, stride=1, dtype=jnp.float32)
    monkeypatch.setenv(sc._S2D_ENV, "4")
    out = sc._stem_forward(x, kernels, biases, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)
    # the custom-VJP stem must produce the same forward under the env too
    vjp_out = sc._stem_vjp_fns(jnp.float32)(x, list(kernels), list(biases))
    np.testing.assert_allclose(np.asarray(vjp_out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_default_tpu_dispatch_is_s2d4(monkeypatch):
    """With no env override, _stem_forward picks the measured-fastest s2d-4
    formulation for 4-divisible sizes and falls back to the reference convs
    otherwise — both numerically equal to the reference."""
    monkeypatch.delenv(sc._S2D_ENV, raising=False)
    kernels, biases = _weights((3, 7, 15), 3, 32)
    for hw in (64, 18):  # 4-divisible and not
        x = jnp.asarray(np.random.default_rng(6).normal(size=(1, hw, hw, 3)), jnp.float32)
        ref = sc.cross_embed_reference(x, kernels, biases, stride=1, dtype=jnp.float32)
        out = sc._stem_forward(x, kernels, biases, jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)
    monkeypatch.setenv(sc._S2D_ENV, "0")
    x = jnp.asarray(np.random.default_rng(7).normal(size=(1, 16, 16, 3)), jnp.float32)
    ref = sc.cross_embed_reference(x, kernels, biases, stride=1, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(sc._stem_forward(x, kernels, biases, jnp.float32)),
        np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_s2d_env_invalid_value_raises(monkeypatch):
    """Unrecognized MINIMAGEN_TPU_STEM_S2D values (e.g. the plausible '1')
    must error rather than silently select a path (round-2 ADVICE item 2)."""
    kernels, biases = _weights((3, 7, 15), 3, 32)
    x = jnp.asarray(np.random.default_rng(8).normal(size=(1, 16, 16, 3)), jnp.float32)
    monkeypatch.setenv(sc._S2D_ENV, "1")
    with pytest.raises(ValueError):
        sc._stem_forward(x, kernels, biases, jnp.float32)


def test_s2d_forced_factor_nondivisible_falls_back(monkeypatch):
    """A forced factor whose H/W aren't divisible would truncate the output;
    the dispatcher must fall back to the exact reference formulation."""
    kernels, biases = _weights((3, 7, 15), 3, 32)
    x = jnp.asarray(np.random.default_rng(9).normal(size=(1, 18, 18, 3)), jnp.float32)
    ref = sc.cross_embed_reference(x, kernels, biases, stride=1, dtype=jnp.float32)
    monkeypatch.setenv(sc._S2D_ENV, "4")
    out = sc._stem_forward(x, kernels, biases, jnp.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_fused_env_respects_preconditions(monkeypatch):
    """MINIMAGEN_TPU_STEM_FUSED=1 is a dispatch override, not a correctness
    override: stride-2 or odd-H/W stems stay on the reference path
    (round-2 ADVICE item 1)."""
    monkeypatch.setenv(sc._FUSED_ENV, "1")
    assert not sc.use_fused_stem(2, 16, 16)
    assert not sc.use_fused_stem(1, 15, 16)
    assert not sc.use_fused_stem(1, 16, 15)
    assert sc.use_fused_stem(1, 16, 16)


@pytest.mark.parametrize("f", [2, 4])
def test_pallas_d2s_matches_xla(f, monkeypatch):
    """Fused depth-to-space+bias Pallas kernel (interpret mode) == the XLA
    reshape/transpose formulation, and the env gate routes the s2d conv
    through it with identical outputs."""
    monkeypatch.setenv("MINIMAGEN_TPU_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(3)
    c = 16
    y2 = jnp.asarray(rng.normal(size=(2, 8, 8, f * f * c)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    ref = sc._depth_to_space(y2, f) + bias
    out = sc._depth_to_space_bias_pallas(y2, bias, f)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6, rtol=1e-6)

    kernels, biases = _weights((3, 7, 15), 3, 32)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    plain = sc.cross_embed_s2d_conv(x, kernels, biases, f, jnp.float32)
    monkeypatch.setenv("MINIMAGEN_TPU_PALLAS_D2S", "1")
    fused = sc.cross_embed_s2d_conv(x, kernels, biases, f, jnp.float32)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               atol=1e-6, rtol=1e-6)
