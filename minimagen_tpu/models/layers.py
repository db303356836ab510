"""U-Net building blocks (flax.linen, NHWC layout).

Capability parity with the reference block zoo (/root/reference/minimagen/
layers.py): Attention (multi-query), CrossAttention, Block/ResnetBlock with
time scale-shift, TransformerBlock + ChanFeedForward, CrossEmbedLayer,
Down/Upsample, LayerNorm/ChanLayerNorm, SinusoidalPosEmb.

TPU-first design notes:
- NHWC everywhere (XLA's preferred conv layout on TPU; the reference is NCHW).
  A 1x1 conv in NHWC is exactly a Dense over the trailing channel axis, so
  ChanFeedForward / residual 1x1 convs are Dense layers that XLA maps
  straight onto the MXU.
- All normalization statistics and all softmaxes run in float32 even when
  activations are bfloat16 (`dtype` field), matching the reference's fp32
  softmax (layers.py:97,247) and protecting GroupNorm/LayerNorm accuracy.
- Attention math is delegated to `minimagen_tpu.ops.attention` so the hot
  path has a single seam for the Pallas flash-attention kernel.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import multi_head_attention, multi_query_attention
from ..ops.group_norm import group_norm_silu
from ..ops.helpers import default, exists
from ..ops.stem_conv import cross_embed_conv

ATTN_DIM_HEAD = 64  # reference Unet.py:86
NUM_TIME_TOKENS = 2  # reference Unet.py:87
RESNET_GROUPS = 8  # reference Unet.py:88


# --------------------------------------------------------------------------- #
# normalization                                                               #
# --------------------------------------------------------------------------- #
def _norm_f32(x: jnp.ndarray, axis: int, eps: float = 1e-5) -> jnp.ndarray:
    """(x - mean) / sqrt(var + eps) with stats in float32, biased variance."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axis, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=axis, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class LayerNorm(nn.Module):
    """Scale-only LayerNorm over the trailing axis (reference layers.py:333-343:
    learned gamma, frozen-zero beta)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        return _norm_f32(x, axis=-1, eps=self.eps) * gamma.astype(x.dtype)


class ChanLayerNorm(nn.Module):
    """Channel LayerNorm (reference layers.py:164-177). In NHWC the channel is
    the trailing axis, so this is the same normalization as :class:`LayerNorm`
    (scale-only, biased variance, eps inside the sqrt)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.param("g", nn.initializers.ones, (self.dim,), jnp.float32)
        return _norm_f32(x, axis=-1, eps=self.eps) * g.astype(x.dtype)


class AffineLayerNorm(nn.Module):
    """Standard LayerNorm with learned scale and bias (torch nn.LayerNorm
    equivalent; used for `norm_cond` / context norms, reference Unet.py:142)."""

    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.dim,), jnp.float32)
        return _norm_f32(x, axis=-1, eps=self.eps) * gamma.astype(x.dtype) + beta.astype(x.dtype)


class GroupNorm(nn.Module):
    """GroupNorm over (group-channels, H, W) per sample with f32 statistics
    (torch nn.GroupNorm semantics, used by reference Block, layers.py:127).

    Optionally fuses the Block's time scale-shift and SiLU into the same op
    (one Pallas VMEM pass on TPU; plain XLA elsewhere) — see
    `ops.group_norm.group_norm_silu`.
    """

    groups: int
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        scale_shift: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        silu: bool = False,
    ) -> jnp.ndarray:
        c = x.shape[-1]
        assert c == self.dim and c % self.groups == 0, f"channels {c} not divisible into {self.groups} groups"
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return group_norm_silu(
            x, scale, bias, groups=self.groups, eps=self.eps,
            scale_shift=scale_shift, silu=silu,
        )


# --------------------------------------------------------------------------- #
# embeddings                                                                  #
# --------------------------------------------------------------------------- #
def sinusoidal_pos_emb(t: jnp.ndarray, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """Standard sin/cos timestep embedding (reference layers.py:442-465).

    :param t: (b,) float or int positions.
    :return: (b, dim) embedding, [sin | cos] concatenated.
    """
    half_dim = dim // 2
    emb_scale = math.log(10000) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb_scale)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1).astype(dtype)


# --------------------------------------------------------------------------- #
# attention blocks                                                            #
# --------------------------------------------------------------------------- #
class Attention(nn.Module):
    """Multi-query self-attention over token sequences.

    Per-head Q, one shared K/V head (reference layers.py:42: `to_kv` emits a
    single dim_head-wide K and V shared by all heads), learned null K/V
    prepended for classifier-free guidance (layers.py:40,65-67), optional
    extra context K/V (layers.py:44-45,71-75), fp32 softmax.
    """

    dim: int
    dim_head: int = ATTN_DIM_HEAD
    heads: int = 8
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        attn_bias: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, n, _ = x.shape
        scale = self.dim_head**-0.5
        inner_dim = self.dim_head * self.heads

        x = LayerNorm(self.dim, name="norm")(x)

        q = nn.Dense(inner_dim, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(self.dim_head * 2, use_bias=False, dtype=self.dtype, name="to_kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)

        q = q.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3) * scale

        # learned null key/value so attention can "attend to nothing" (CFG anchor)
        null_kv = self.param("null_kv", nn.initializers.normal(1.0), (2, self.dim_head), jnp.float32)
        nk = jnp.broadcast_to(null_kv[0].astype(k.dtype), (b, 1, self.dim_head))
        nv = jnp.broadcast_to(null_kv[1].astype(v.dtype), (b, 1, self.dim_head))
        k = jnp.concatenate([nk, k], axis=-2)
        v = jnp.concatenate([nv, v], axis=-2)

        if exists(context):
            assert exists(self.context_dim), "context passed but context_dim not configured"
            ctx = AffineLayerNorm(self.context_dim, name="context_norm")(context)
            ckv = nn.Dense(self.dim_head * 2, dtype=self.dtype, name="to_context")(ctx)
            ck, cv = jnp.split(ckv, 2, axis=-1)
            k = jnp.concatenate([ck, k], axis=-2)
            v = jnp.concatenate([cv, v], axis=-2)

        if exists(mask):
            # account for the prepended null token (always attendable); context
            # tokens (if any) are prepended before null in reference order —
            # the reference pads exactly one True (layers.py:90-93)
            pad = k.shape[-2] - mask.shape[-1]
            mask = jnp.pad(mask, ((0, 0), (pad, 0)), constant_values=True)

        out = multi_query_attention(q, k, v, mask=mask, attn_bias=attn_bias)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner_dim)

        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)
        return LayerNorm(self.dim, name="out_norm")(out)


class CrossAttention(nn.Module):
    """Full multi-head cross-attention over context tokens with per-head null
    K/V (reference layers.py:180-251)."""

    dim: int
    context_dim: Optional[int] = None
    dim_head: int = ATTN_DIM_HEAD
    heads: int = 8
    norm_context: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, n, _ = x.shape
        scale = self.dim_head**-0.5
        inner_dim = self.dim_head * self.heads
        context_dim = default(self.context_dim, self.dim)

        x = LayerNorm(self.dim, name="norm")(x)
        if self.norm_context:
            context = LayerNorm(context_dim, name="norm_context")(context)

        q = nn.Dense(inner_dim, use_bias=False, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(inner_dim * 2, use_bias=False, dtype=self.dtype, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)

        j = k.shape[1]
        q = q.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, j, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, j, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        null_kv = self.param("null_kv", nn.initializers.normal(1.0), (2, self.dim_head), jnp.float32)
        nk = jnp.broadcast_to(null_kv[0].astype(k.dtype), (b, self.heads, 1, self.dim_head))
        nv = jnp.broadcast_to(null_kv[1].astype(v.dtype), (b, self.heads, 1, self.dim_head))
        k = jnp.concatenate([nk, k], axis=-2)
        v = jnp.concatenate([nv, v], axis=-2)

        q = q * scale

        if exists(mask):
            mask = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)

        out = multi_head_attention(q, k, v, mask=mask)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner_dim)

        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)
        return LayerNorm(self.dim, name="out_norm")(out)


# --------------------------------------------------------------------------- #
# conv blocks                                                                 #
# --------------------------------------------------------------------------- #
class Block(nn.Module):
    """GroupNorm -> (scale-shift) -> SiLU -> 3x3 Conv (reference layers.py:107-145).

    The scale-shift from the time MLP lands between the norm and the
    activation, applied as x * (scale + 1) + shift (layers.py:140-142).
    """

    dim: int
    dim_out: int
    groups: int = RESNET_GROUPS
    norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, scale_shift: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None) -> jnp.ndarray:
        if self.norm:
            x = GroupNorm(self.groups, self.dim, name="groupnorm")(x, scale_shift=scale_shift, silu=True)
        else:
            if exists(scale_shift):
                scale, shift = scale_shift
                x = x * (scale + 1.0) + shift
            x = jax.nn.silu(x)
        return nn.Conv(self.dim_out, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="project")(x)


class ResnetBlock(nn.Module):
    """Two :class:`Block`s with a time scale-shift on the second, an optional
    cross-attention on flattened spatial tokens between them, and a 1x1-conv
    residual when channel counts change (reference layers.py:371-439)."""

    dim: int
    dim_out: int
    cond_dim: Optional[int] = None
    time_cond_dim: Optional[int] = None
    groups: int = RESNET_GROUPS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        time_emb: Optional[jnp.ndarray] = None,
        cond: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, h, w, _ = x.shape

        scale_shift = None
        if exists(self.time_cond_dim) and exists(time_emb):
            t = jax.nn.silu(time_emb)
            t = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="time_mlp")(t)
            t = t[:, None, None, :]  # (b, 1, 1, 2*dim_out) broadcasting over H, W
            scale_shift = jnp.split(t, 2, axis=-1)

        hid = Block(self.dim, self.dim_out, groups=self.groups, dtype=self.dtype, name="block1")(x)

        if exists(self.cond_dim):
            assert exists(cond), "ResnetBlock configured with cond_dim requires cond tokens"
            tokens = hid.reshape(b, h * w, self.dim_out)
            attn_out = CrossAttention(
                dim=self.dim_out, context_dim=self.cond_dim, dtype=self.dtype, name="cross_attn"
            )(tokens, context=cond)
            hid = hid + attn_out.reshape(b, h, w, self.dim_out)

        hid = Block(self.dim_out, self.dim_out, groups=self.groups, dtype=self.dtype, name="block2")(
            hid, scale_shift=scale_shift
        )

        if self.dim != self.dim_out:
            res = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="res_conv")(x)
        else:
            res = x
        return hid + res


class ChanFeedForward(nn.Module):
    """Channel MLP: ChanLayerNorm -> 1x1 expand -> GELU -> ChanLayerNorm -> 1x1
    project (reference layers.py:148-161).  In NHWC the 1x1 convs are Dense."""

    dim: int
    mult: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden_dim = int(self.dim * self.mult)
        x = ChanLayerNorm(self.dim, name="norm_in")(x)
        x = nn.Dense(hidden_dim, use_bias=False, dtype=self.dtype, name="expand")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = ChanLayerNorm(hidden_dim, name="norm_mid")(x)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="project")(x)


class TransformerBlock(nn.Module):
    """Residual multi-query self-attention on spatial tokens + residual channel
    feed-forward (reference layers.py:468-499)."""

    dim: int
    heads: int = 8
    dim_head: int = 32
    ff_mult: int = 2
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        attn_out = Attention(
            dim=self.dim, heads=self.heads, dim_head=self.dim_head, context_dim=self.context_dim,
            dtype=self.dtype, name="attn",
        )(tokens, context=context)
        x = x + attn_out.reshape(b, h, w, c)
        x = x + ChanFeedForward(dim=self.dim, mult=self.ff_mult, dtype=self.dtype, name="ff")(x)
        return x


# --------------------------------------------------------------------------- #
# resampling / stem                                                           #
# --------------------------------------------------------------------------- #
class _ConvParams(nn.Module):
    """Parameter factory with nn.Conv's exact tree ({kernel, bias}) and
    initializers, so CrossEmbedLayer can route the math through
    `ops.stem_conv` without changing checkpoints or the torch-import map."""

    features: int
    kernel_size: int
    dim_in: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, self.dim_in, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class CrossEmbedLayer(nn.Module):
    """Inception-style stem: parallel convs with kernel sizes (3, 7, 15...) and
    geometrically-split channel counts, concatenated (reference layers.py:254-305).

    On TPU the stride-1 stem dispatches to `ops.stem_conv.cross_embed_fused`
    (kernel merging + space-to-depth) — the small-cin convs otherwise run the
    MXU at ~4% and cost ~8% of the flagship denoise step."""

    dim_in: int
    kernel_sizes: Sequence[int]
    dim_out: Optional[int] = None
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert all((k % 2) == (self.stride % 2) for k in self.kernel_sizes)
        dim_out = default(self.dim_out, self.dim_in)

        kernel_sizes = sorted(self.kernel_sizes)
        num_scales = len(kernel_sizes)
        dim_scales = [int(dim_out / (2**i)) for i in range(1, num_scales)]
        dim_scales = [*dim_scales, dim_out - sum(dim_scales)]

        kernels, biases = [], []
        for i, (kernel, dim_scale) in enumerate(zip(kernel_sizes, dim_scales)):
            k, b = _ConvParams(dim_scale, kernel, x.shape[-1], name=f"conv_{i}")()
            kernels.append(k)
            biases.append(b)
        return cross_embed_conv(x, kernels, biases, stride=self.stride, dtype=self.dtype)


class Downsample(nn.Module):
    """4x4 stride-2 conv halving spatial dims (reference layers.py:308-319)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.dim_out, (4, 4), strides=2, padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """Nearest-neighbor 2x upsample + 3x3 conv (reference layers.py:502-515)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.dim_out, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv")(x)


class ParallelSum(nn.Module):
    """Sum of a 3x3 conv and a 1x1 conv (the reference's last-layer
    `Parallel(Conv3x3, Conv1x1)` post-downsample, Unet.py:233-234)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = nn.Conv(self.dim_out, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv3")(x)
        b = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="conv1")(x)
        return a + b
