"""Conditional denoising U-Net: config surface + flax module.

Capability parity with the reference Unet (/root/reference/minimagen/
Unet.py:25-750): the same 13 constructor parameters (so existing
`parameters/unet_<i>_params_*.json` files load unchanged), the same topology
(CrossEmbed stem -> down path with cross-attn ResnetBlock + N ResnetBlocks +
TransformerBlock per resolution -> middle -> mirrored up path with
2^-0.5-scaled skip concats -> final ResnetBlock + 3x3 conv), the same
conditioning contract: a time/text vector `t` consumed by every ResnetBlock's
scale-shift and token sequence `c` = [time_tokens; text_tokens] consumed by
cross-attention (Unet.py:508-634).

TPU-first differences:
- **Config and module are separate.** `UnetConfig` is a frozen dataclass
  (JSON round-trip, `cast_model_parameters` as a functional `replace`,
  reference Unet.py:332-353); `UnetModel` is a pure flax module built from
  it.  Params are an explicit pytree — no CPU<->device swap management.
- **NHWC** activations; bf16-able compute with f32 norms/softmax.
- **Classifier-free guidance dropout is an explicit boolean input**
  (`text_keep_mask`), computed outside the traced function from an explicit
  PRNG key — no RNG inside jit.  Guided sampling runs cond+uncond as ONE
  pair-batched forward (see models/imagen.py), not two sequential calls
  (reference Unet.py:474-506).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, ClassVar, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.helpers import cast_tuple, default, exists
from .layers import (
    ATTN_DIM_HEAD,
    NUM_TIME_TOKENS,
    RESNET_GROUPS,
    AffineLayerNorm,
    Attention,
    CrossEmbedLayer,
    Downsample,
    ParallelSum,
    ResnetBlock,
    TransformerBlock,
    Upsample,
    sinusoidal_pos_emb,
)
from .t5 import get_encoded_dim

MAX_TEXT_LEN = 256  # reference Unet.py:150


# --------------------------------------------------------------------------- #
# configuration                                                               #
# --------------------------------------------------------------------------- #
@dataclass(frozen=True)
class UnetConfig:
    """The reference Unet's 13 constructor parameters (Unet.py:31-47), as an
    immutable config whose dict form matches the reference JSON schema."""

    dim: int = 128
    dim_mults: Tuple[int, ...] = (1, 2, 4)
    channels: int = 3
    channels_out: Optional[int] = None
    cond_dim: Optional[int] = None
    text_embed_dim: Optional[int] = None  # resolved to get_encoded_dim('t5_small')=512 like reference Unet.py:39
    num_resnet_blocks: Union[int, Tuple[int, ...]] = 1
    layer_attns: Union[bool, Tuple[bool, ...]] = True
    layer_cross_attns: Union[bool, Tuple[bool, ...]] = True
    attn_heads: int = 8
    lowres_cond: bool = False
    memory_efficient: bool = False
    attend_at_middle: bool = False

    defaults: ClassVar[Dict[str, Any]] = {}

    def __post_init__(self):
        # normalize JSON lists to tuples so the config hashes / is static under jit
        for f in ("dim_mults", "num_resnet_blocks", "layer_attns", "layer_cross_attns"):
            v = getattr(self, f)
            if isinstance(v, list):
                object.__setattr__(self, f, tuple(v))
        if self.text_embed_dim is None:
            object.__setattr__(self, "text_embed_dim", get_encoded_dim("t5_small"))

    # -- reference-JSON round trip ---------------------------------------- #
    _JSON_KEYS: ClassVar[Tuple[str, ...]] = (
        "dim", "dim_mults", "channels", "channels_out", "cond_dim", "text_embed_dim",
        "num_resnet_blocks", "layer_attns", "layer_cross_attns", "attn_heads",
        "lowres_cond", "memory_efficient", "attend_at_middle",
    )

    def to_dict(self) -> Dict[str, Any]:
        """Dict with exactly the reference `unet_<i>_params_*.json` keys."""
        out = {}
        for k in self._JSON_KEYS:
            v = getattr(self, k)
            out[k] = list(v) if isinstance(v, tuple) else v
        return out

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "UnetConfig":
        return cls(**{k: v for k, v in d.items() if k in cls._JSON_KEYS})

    def cast_model_parameters(self, *, lowres_cond: bool, text_embed_dim: int,
                              channels: int, channels_out: Optional[int]) -> "UnetConfig":
        """Re-derive the config for its position in a cascade
        (reference `_cast_model_parameters`, Unet.py:332-353)."""
        if (lowres_cond == self.lowres_cond and channels == self.channels
                and text_embed_dim == self.text_embed_dim and channels_out == self.channels_out):
            return self
        return dataclasses.replace(
            self, lowres_cond=lowres_cond, text_embed_dim=text_embed_dim,
            channels=channels, channels_out=channels_out,
        )

    # -- derived statics --------------------------------------------------- #
    @property
    def resolved_channels_out(self) -> int:
        return default(self.channels_out, self.channels)

    @property
    def resolved_cond_dim(self) -> int:
        return default(self.cond_dim, self.dim)

    @property
    def time_cond_dim(self) -> int:
        # doubled for super-res models (reference Unet.py:98)
        return self.dim * 4 * (2 if self.lowres_cond else 1)

    @property
    def num_resolutions(self) -> int:
        return len(self.dim_mults)

    def layer_params(self):
        """Per-resolution (dim_in, dim_out, n_blocks, groups, attn, cross_attn)."""
        dims = [self.dim, *(self.dim * m for m in self.dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))
        n = len(in_out)
        nblocks = cast_tuple(self.num_resnet_blocks, n)
        groups = cast_tuple(RESNET_GROUPS, n)
        attns = cast_tuple(self.layer_attns, n)
        cross = cast_tuple(self.layer_cross_attns, n)
        return list(zip(in_out, nblocks, groups, attns, cross))


def _preset(name: str, defaults: Dict[str, Any]):
    """Create a UnetConfig preset class with a `.defaults` dict, matching the
    reference preset surface (Unet.py:637-750).

    Note: the reference's `BaseTest.__init__` mistakenly applies
    `Base.defaults` (Unet.py:722) and `SuperTest.__init__` applies
    `Super.defaults` (Unet.py:750); their tiny `defaults` dicts only take
    effect through `get_default_args`.  Here the presets are fixed to apply
    their OWN defaults on construction — a deliberate, documented deviation;
    `get_default_args` behaves identically to the reference either way.
    """

    def __init__(self, **kwargs):  # noqa: ANN001
        UnetConfig.__init__(self, **{**defaults, **kwargs})

    return type(name, (UnetConfig,), {"defaults": defaults, "__init__": __init__})


# Reference presets (Unet.py:637-692)
Base = _preset("Base", dict(
    dim=512, dim_mults=(1, 2, 3, 4), num_resnet_blocks=3,
    layer_attns=(False, True, True, True), layer_cross_attns=(False, True, True, True),
    memory_efficient=False,
))
Super = _preset("Super", dict(
    dim=128, dim_mults=(1, 2, 4, 8), num_resnet_blocks=(2, 4, 8, 8),
    layer_attns=(False, False, False, True), layer_cross_attns=(False, False, False, True),
    memory_efficient=True,
))
BaseTest = _preset("BaseTest", dict(
    dim=8, dim_mults=(1, 2), num_resnet_blocks=1,
    layer_attns=False, layer_cross_attns=False, memory_efficient=False,
))
SuperTest = _preset("SuperTest", dict(
    dim=8, dim_mults=(1, 2), num_resnet_blocks=(1, 2),
    layer_attns=False, layer_cross_attns=False, memory_efficient=True,
))

# API-parity alias: in the reference `Unet(**params)` constructs the model;
# here it constructs the (serializable) config that `Imagen` builds into a
# pure flax module.
Unet = UnetConfig


# --------------------------------------------------------------------------- #
# model                                                                       #
# --------------------------------------------------------------------------- #
class UnetModel(nn.Module):
    """Pure flax U-Net built from a :class:`UnetConfig`.

    Input/output images are NHWC.  All config-dependent branching is static
    (resolved at trace time); the only runtime conditionals are tensor
    `where`s, so the whole forward compiles to one XLA computation.
    """

    config: UnetConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # rematerialize Resnet/Transformer blocks (memory for FLOPs)

    def _time_condition(self, time: jnp.ndarray, lowres_noise_times: Optional[jnp.ndarray]):
        """time -> (t, time_tokens); duplicate pathway for the low-res
        noise-augmentation times (reference `_generate_t_tokens`, Unet.py:508-536)."""
        cfg = self.config
        cond_dim = cfg.resolved_cond_dim
        tcd = cfg.time_cond_dim

        def branch(times, prefix):
            hid = sinusoidal_pos_emb(times, cfg.dim, dtype=self.dtype)
            hid = nn.Dense(tcd, dtype=self.dtype, name=f"{prefix}time_hiddens")(hid)
            hid = jax.nn.silu(hid)
            t = nn.Dense(tcd, dtype=self.dtype, name=f"{prefix}time_cond")(hid)
            tokens = nn.Dense(cond_dim * NUM_TIME_TOKENS, dtype=self.dtype, name=f"{prefix}time_tokens")(hid)
            tokens = tokens.reshape(tokens.shape[0], NUM_TIME_TOKENS, cond_dim)
            return t, tokens

        t, time_tokens = branch(time, "to_")
        if cfg.lowres_cond:
            assert exists(lowres_noise_times), "lowres_cond model requires lowres_noise_times"
            lr_t, lr_tokens = branch(lowres_noise_times, "to_lowres_")
            t = t + lr_t
            time_tokens = jnp.concatenate([time_tokens, lr_tokens], axis=-2)
        return t, time_tokens

    def _text_condition(
        self,
        text_embeds: Optional[jnp.ndarray],
        text_mask: Optional[jnp.ndarray],
        text_keep_mask: Optional[jnp.ndarray],
        t: jnp.ndarray,
        time_tokens: jnp.ndarray,
    ):
        """Project/pad text tokens, swap dropped rows for learned null
        embeddings, fold pooled text into `t`, build `c`
        (reference `_text_condition`, Unet.py:538-634)."""
        cfg = self.config
        cond_dim = cfg.resolved_cond_dim
        tcd = cfg.time_cond_dim

        text_tokens = None
        if exists(text_embeds):
            b = text_embeds.shape[0]
            text_tokens = nn.Dense(cond_dim, dtype=self.dtype, name="text_to_cond")(text_embeds)
            text_tokens = text_tokens[:, :MAX_TEXT_LEN]
            remainder = MAX_TEXT_LEN - text_tokens.shape[1]
            if remainder > 0:
                text_tokens = jnp.pad(text_tokens, ((0, 0), (0, remainder), (0, 0)))

            if text_keep_mask is None:
                text_keep_mask = jnp.ones((b,), dtype=jnp.bool_)
            keep_embed = text_keep_mask[:, None, None]  # (b, 1, 1)
            if exists(text_mask):
                if remainder > 0:
                    text_mask = jnp.pad(text_mask, ((0, 0), (0, remainder)), constant_values=False)
                text_mask = text_mask[:, :MAX_TEXT_LEN]
                keep_embed = text_mask[:, :, None] & keep_embed  # (b, 256, 1)

            null_text_embed = self.param(
                "null_text_embed", nn.initializers.normal(1.0), (1, MAX_TEXT_LEN, cond_dim), jnp.float32
            )
            text_tokens = jnp.where(keep_embed, text_tokens, null_text_embed.astype(text_tokens.dtype))

            # pooled (over all 256 rows incl. null-replaced ones, matching
            # reference Unet.py:610) non-attention text conditioning into `t`
            mean_pooled = jnp.mean(text_tokens, axis=-2)
            hid = AffineLayerNorm(cond_dim, name="text_nonattn_norm")(mean_pooled)
            hid = nn.Dense(tcd, dtype=self.dtype, name="text_nonattn_dense1")(hid)
            hid = jax.nn.silu(hid)
            hid = nn.Dense(tcd, dtype=self.dtype, name="text_nonattn_dense2")(hid)

            null_text_hidden = self.param(
                "null_text_hidden", nn.initializers.normal(1.0), (1, tcd), jnp.float32
            )
            keep_hidden = text_keep_mask[:, None]
            hid = jnp.where(keep_hidden, hid, null_text_hidden.astype(hid.dtype))
            t = t + hid

        c = time_tokens if not exists(text_tokens) else jnp.concatenate([time_tokens, text_tokens], axis=-2)
        c = AffineLayerNorm(c.shape[-1], name="norm_cond")(c)
        return t, c

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        time: jnp.ndarray,
        *,
        lowres_cond_img: Optional[jnp.ndarray] = None,
        lowres_noise_times: Optional[jnp.ndarray] = None,
        text_embeds: Optional[jnp.ndarray] = None,
        text_mask: Optional[jnp.ndarray] = None,
        text_keep_mask: Optional[jnp.ndarray] = None,
        encoder_cache: Optional[Tuple] = None,
        return_encoder_cache: bool = False,
    ) -> jnp.ndarray:
        """Denoise `x` at `time` under text/low-res conditioning.

        :param x: (b, s, s, c) noisy images (NHWC).
        :param time: (b,) integer timesteps.
        :param lowres_cond_img: (b, s, s, c) upsampled low-res conditioning
            image for super-res stages (channel-concatenated, Unet.py:396-397).
        :param lowres_noise_times: (b,) noise-augmentation times for the
            low-res conditioning image.
        :param text_embeds: (b, L, text_embed_dim) T5 encodings.
        :param text_mask: (b, L) bool validity mask.
        :param text_keep_mask: (b,) bool classifier-free-guidance keep mask
            (False rows get the learned null conditioning).  None keeps all.
        :param encoder_cache: `(x_bottleneck, hiddens)` from a previous call's
            `return_encoder_cache=True` — when given, the stem + DOWN path are
            skipped entirely and these features are reused (encoder-feature
            caching across sampler steps; "Faster Diffusion",
            arXiv 2312.09608 — encoder features vary slowly over adjacent t,
            so recomputing only mid+up on cached steps trades ~45% of the
            per-step FLOPs for negligible drift). Time/text conditioning is
            always recomputed (it feeds mid/up too).
        :param return_encoder_cache: also return the `(x, hiddens)` cache.
        :return: (b, s, s, channels_out) predicted noise
            (plus the cache when requested).
        """
        cfg = self.config
        x = x.astype(self.dtype)

        assert not (cfg.lowres_cond and not exists(lowres_cond_img)), "low-res conditioning image must be present"
        assert not (cfg.lowres_cond and not exists(lowres_noise_times)), "low-res conditioning times must be present"

        # conditioning: t (b, time_cond_dim) and c (b, tokens, cond_dim)
        t, time_tokens = self._time_condition(time, lowres_noise_times)
        t, c = self._text_condition(text_embeds, text_mask, text_keep_mask, t, time_tokens)

        layer_params = cfg.layer_params()
        num_resolutions = len(layer_params)
        skip_connect_scale = 2**-0.5  # reference Unet.py:194
        cond_dim = cfg.resolved_cond_dim
        tcd = cfg.time_cond_dim
        # per-resolution skip width (static): the pre-downsampled dim in
        # memory_efficient mode, the incoming dim otherwise
        skip_dims = [dim_out if cfg.memory_efficient else dim_in
                     for (dim_in, dim_out), *_ in layer_params]

        # optional rematerialization of the heavy blocks: activations inside
        # each block are recomputed during backward instead of stored
        # (jax.checkpoint via nn.remat), trading ~30% FLOPs for O(depth)
        # activation memory — the TPU-native answer to the reference's
        # CPU<->GPU unet swapping (Imagen.py:180-259)
        RB = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        TB = nn.remat(TransformerBlock) if self.remat else TransformerBlock

        if encoder_cache is not None:
            # reuse a previous step's stem+DOWN features wholesale
            x, hiddens = encoder_cache[0], list(encoder_cache[1])
        else:
            if exists(lowres_cond_img):
                x = jnp.concatenate([x, lowres_cond_img.astype(self.dtype)], axis=-1)

            # stem (reference Unet.py:169-172)
            x = CrossEmbedLayer(
                dim_in=x.shape[-1], kernel_sizes=(3, 7, 15), dim_out=cfg.dim, stride=1,
                dtype=self.dtype, name="init_conv",
            )(x)

            # DOWN path (reference Unet.py:204-261, forward :412-432)
            hiddens = []
            for ind, ((dim_in, dim_out), nblocks, groups, layer_attn, layer_cross) in enumerate(layer_params):
                is_last = ind == (num_resolutions - 1)
                layer_cond = cond_dim if layer_cross else None
                current_dim = dim_in

                if cfg.memory_efficient:
                    x = Downsample(dim_out, dtype=self.dtype, name=f"down{ind}_pre")(x)
                    current_dim = dim_out

                x = RB(
                    current_dim, current_dim, cond_dim=layer_cond, time_cond_dim=tcd,
                    groups=groups, dtype=self.dtype, name=f"down{ind}_init_block",
                )(x, t, c)

                for j in range(nblocks):
                    x = RB(
                        current_dim, current_dim, time_cond_dim=tcd, groups=groups,
                        dtype=self.dtype, name=f"down{ind}_block{j}",
                    )(x, t)
                    hiddens.append(x)

                if layer_attn:
                    x = TB(
                        dim=current_dim, heads=cfg.attn_heads, dim_head=ATTN_DIM_HEAD,
                        dtype=self.dtype, name=f"down{ind}_attn",
                    )(x)
                hiddens.append(x)

                if not cfg.memory_efficient:
                    if not is_last:
                        x = Downsample(dim_out, dtype=self.dtype, name=f"down{ind}_post")(x)
                    else:
                        x = ParallelSum(dim_out, dtype=self.dtype, name=f"down{ind}_post")(x)

        cache = (x, tuple(hiddens)) if return_encoder_cache else None

        # MIDDLE (reference Unet.py:263-278, forward :437-440)
        mid_dim = cfg.dim * cfg.dim_mults[-1]
        mid_groups = layer_params[-1][2]  # resnet_groups of the deepest layer
        x = RB(
            mid_dim, mid_dim, cond_dim=cond_dim, time_cond_dim=tcd, groups=mid_groups,
            dtype=self.dtype, name="mid_block1",
        )(x, t, c)
        if cfg.attend_at_middle:
            b, h, w, cch = x.shape
            tokens = x.reshape(b, h * w, cch)
            tokens = tokens + Attention(
                dim=mid_dim, heads=cfg.attn_heads, dim_head=ATTN_DIM_HEAD,
                dtype=self.dtype, name="mid_attn",
            )(tokens)
            x = tokens.reshape(b, h, w, cch)
        x = RB(
            mid_dim, mid_dim, cond_dim=cond_dim, time_cond_dim=tcd, groups=mid_groups,
            dtype=self.dtype, name="mid_block2",
        )(x, t, c)

        # UP path (reference Unet.py:280-315, forward :445-461)
        for rev_ind, ((dim_in, dim_out), nblocks, groups, layer_attn, layer_cross) in enumerate(
            reversed(layer_params)
        ):
            is_last = rev_ind == (num_resolutions - 1)
            layer_cond = cond_dim if layer_cross else None
            skip_dim = skip_dims.pop()

            x = jnp.concatenate([x, hiddens.pop() * skip_connect_scale], axis=-1)
            x = RB(
                dim_out + skip_dim, dim_out, cond_dim=layer_cond, time_cond_dim=tcd,
                groups=groups, dtype=self.dtype, name=f"up{rev_ind}_init_block",
            )(x, t, c)

            for j in range(nblocks):
                x = jnp.concatenate([x, hiddens.pop() * skip_connect_scale], axis=-1)
                x = RB(
                    dim_out + skip_dim, dim_out, time_cond_dim=tcd, groups=groups,
                    dtype=self.dtype, name=f"up{rev_ind}_block{j}",
                )(x, t)

            if layer_attn:
                x = TB(
                    dim=dim_out, heads=cfg.attn_heads, dim_head=ATTN_DIM_HEAD,
                    dtype=self.dtype, name=f"up{rev_ind}_attn",
                )(x)

            if not is_last or cfg.memory_efficient:
                x = Upsample(dim_in, dtype=self.dtype, name=f"up{rev_ind}_upsample")(x)

        # final block + projection (reference Unet.py:317-328, forward :468-472)
        x = RB(
            cfg.dim, cfg.dim, time_cond_dim=tcd, groups=layer_params[0][2],
            dtype=self.dtype, name="final_res_block",
        )(x, t)
        out = nn.Conv(
            cfg.resolved_channels_out, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="final_conv",
        )(x)
        out = out.astype(jnp.float32)
        return (out, cache) if return_encoder_cache else out
