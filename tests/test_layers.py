"""Shape/behavior tests for the NN building blocks (reference shapes per
/root/reference/minimagen/layers.py, see SURVEY.md §2a rows B-F)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from minimagen_tpu.models.layers import (
    Attention,
    Block,
    ChanFeedForward,
    ChanLayerNorm,
    CrossAttention,
    CrossEmbedLayer,
    Downsample,
    GroupNorm,
    LayerNorm,
    ParallelSum,
    ResnetBlock,
    TransformerBlock,
    Upsample,
    sinusoidal_pos_emb,
)

KEY = jax.random.PRNGKey(0)


def _init_apply(module, *args, **kwargs):
    variables = module.init(KEY, *args, **kwargs)
    return module.apply(variables, *args, **kwargs), variables


def test_layernorm_normalizes_last_axis():
    x = jax.random.normal(KEY, (2, 5, 16)) * 3 + 7
    out, _ = _init_apply(LayerNorm(16), x)
    np.testing.assert_allclose(np.mean(np.asarray(out), -1), 0, atol=1e-5)
    np.testing.assert_allclose(np.std(np.asarray(out), -1), 1, atol=1e-3)


def test_chan_layernorm_matches_layernorm_math_in_nhwc():
    # in NHWC the channel axis is last, so ChanLayerNorm == scale-only LN
    x = jax.random.normal(KEY, (2, 4, 4, 8)) * 2 + 1
    out, _ = _init_apply(ChanLayerNorm(8), x)
    np.testing.assert_allclose(np.mean(np.asarray(out), -1), 0, atol=1e-5)


def test_groupnorm_per_group_stats():
    x = jax.random.normal(KEY, (2, 6, 6, 16)) * 4 - 2
    out, _ = _init_apply(GroupNorm(groups=4, dim=16), x)
    o = np.asarray(out).reshape(2, 6, 6, 4, 4)
    # with init scale=1 bias=0, each (spatial x group-channels) slice is standardized
    for b in range(2):
        for g in range(4):
            sl = o[b, :, :, g, :]
            assert abs(sl.mean()) < 1e-5
            assert abs(sl.std() - 1) < 1e-2


def test_sinusoidal_pos_emb_shape_and_values():
    emb = sinusoidal_pos_emb(jnp.array([0.0, 1.0, 2.0]), 16)
    assert emb.shape == (3, 16)
    # position 0: sin part 0, cos part 1
    np.testing.assert_allclose(np.asarray(emb[0, :8]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 8:]), 1.0, atol=1e-6)


def test_multi_query_attention_param_shapes():
    """The multi-query detail: shared single-head K/V (reference layers.py:42)."""
    attn = Attention(dim=32, dim_head=16, heads=4)
    x = jnp.ones((2, 10, 32))
    out, variables = _init_apply(attn, x)
    assert out.shape == (2, 10, 32)
    p = variables["params"]
    assert p["to_q"]["kernel"].shape == (32, 64)  # per-head queries
    assert p["to_kv"]["kernel"].shape == (32, 32)  # ONE shared kv head (2*dim_head)
    assert p["null_kv"].shape == (2, 16)


def test_attention_with_context_tokens():
    attn = Attention(dim=32, dim_head=16, heads=4, context_dim=24)
    x = jnp.ones((2, 10, 32))
    ctx = jnp.ones((2, 7, 24))
    out, _ = _init_apply(attn, x, context=ctx)
    assert out.shape == (2, 10, 32)


def test_attention_mask_blocks_tokens():
    attn = Attention(dim=16, dim_head=8, heads=2)
    variables = attn.init(KEY, jnp.ones((1, 6, 16)))
    x = jax.random.normal(KEY, (1, 6, 16))
    full = attn.apply(variables, x, mask=jnp.ones((1, 6), bool))
    # masking all tokens forces attention onto the null kv only
    none = attn.apply(variables, x, mask=jnp.zeros((1, 6), bool))
    assert not np.allclose(np.asarray(full), np.asarray(none))


def test_cross_attention_full_multihead_shapes():
    xattn = CrossAttention(dim=32, context_dim=48, dim_head=16, heads=4)
    x = jnp.ones((2, 9, 32))
    ctx = jnp.ones((2, 5, 48))
    out, variables = _init_apply(xattn, x, ctx)
    assert out.shape == (2, 9, 32)
    p = variables["params"]
    assert p["to_kv"]["kernel"].shape == (48, 128)  # per-head K/V (inner*2)


def test_block_scale_shift():
    blk = Block(dim=8, dim_out=8, groups=4)
    x = jnp.ones((2, 4, 4, 8))
    variables = blk.init(KEY, x)
    base = blk.apply(variables, x)
    shifted = blk.apply(variables, x, scale_shift=(jnp.zeros((2, 1, 1, 8)), jnp.ones((2, 1, 1, 8))))
    assert base.shape == (2, 4, 4, 8)
    assert not np.allclose(np.asarray(base), np.asarray(shifted))


@pytest.mark.parametrize("dim,dim_out", [(8, 8), (8, 16)])
def test_resnet_block_shapes_and_residual_projection(dim, dim_out):
    rb = ResnetBlock(dim, dim_out, time_cond_dim=12, groups=4)
    x = jnp.ones((2, 4, 4, dim))
    t = jnp.ones((2, 12))
    out, variables = _init_apply(rb, x, t)
    assert out.shape == (2, 4, 4, dim_out)
    has_res_conv = "res_conv" in variables["params"]
    assert has_res_conv == (dim != dim_out)


def test_resnet_block_with_cross_attention():
    rb = ResnetBlock(8, 8, cond_dim=16, time_cond_dim=12, groups=4)
    x = jnp.ones((2, 4, 4, 8))
    t = jnp.ones((2, 12))
    cond = jnp.ones((2, 6, 16))
    out, variables = _init_apply(rb, x, t, cond)
    assert out.shape == (2, 4, 4, 8)
    assert "cross_attn" in variables["params"]


def test_transformer_block_preserves_shape():
    tb = TransformerBlock(dim=16, heads=2, dim_head=8)
    x = jnp.ones((2, 8, 8, 16))
    out, _ = _init_apply(tb, x)
    assert out.shape == (2, 8, 8, 16)


def test_chan_feedforward_shapes():
    ff = ChanFeedForward(dim=16, mult=2)
    x = jnp.ones((2, 4, 4, 16))
    out, variables = _init_apply(ff, x)
    assert out.shape == (2, 4, 4, 16)
    assert variables["params"]["expand"]["kernel"].shape == (16, 32)


def test_cross_embed_layer_channel_split():
    """Kernel (3,7,15), dim_out=128: filters split 64/32/32 (reference
    layers.py:254-300 docstring example)."""
    cel = CrossEmbedLayer(dim_in=3, kernel_sizes=(3, 7, 15), dim_out=128, stride=1)
    x = jnp.ones((1, 16, 16, 3))
    out, variables = _init_apply(cel, x)
    assert out.shape == (1, 16, 16, 128)
    p = variables["params"]
    assert p["conv_0"]["kernel"].shape == (3, 3, 3, 64)
    assert p["conv_1"]["kernel"].shape == (7, 7, 3, 32)
    assert p["conv_2"]["kernel"].shape == (15, 15, 3, 32)


def test_downsample_halves_spatial():
    out, _ = _init_apply(Downsample(dim_out=16), jnp.ones((1, 8, 8, 8)))
    assert out.shape == (1, 4, 4, 16)


def test_upsample_doubles_spatial():
    out, _ = _init_apply(Upsample(dim_out=4), jnp.ones((1, 8, 8, 8)))
    assert out.shape == (1, 16, 16, 4)


def test_parallel_sum_shape():
    out, _ = _init_apply(ParallelSum(dim_out=16), jnp.ones((1, 8, 8, 8)))
    assert out.shape == (1, 8, 8, 16)


def test_attention_softmax_is_f32_under_bf16():
    attn = Attention(dim=32, dim_head=16, heads=2, dtype=jnp.bfloat16)
    x = jnp.ones((1, 4, 32), jnp.bfloat16)
    variables = attn.init(KEY, x)
    out = attn.apply(variables, x)
    assert out.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(out, dtype=np.float32)))
