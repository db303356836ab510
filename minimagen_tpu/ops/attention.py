"""Attention compute ops.

Two attention flavors are used by the U-Net (mirroring the reference's two
classes, /root/reference/minimagen/layers.py:14-104 and :180-251):

- **multi-query self-attention**: per-head queries, a single shared K/V head
  (`to_kv = Linear(dim, dim_head*2)`, einsum 'b h i d, b j d -> b h i j'),
- **multi-head cross-attention**: standard MHA over context tokens.

Both prepend learned null K/V (classifier-free-guidance anchor) and compute
softmax in float32 regardless of activation dtype (reference layers.py:97,247).

These functions take already-projected q/k/v; the projections live in the
flax modules (models/layers.py).  This split keeps the hot compute in one
place so it can dispatch to the Pallas flash-attention kernel on TPU
(`minimagen_tpu.ops.flash_attention`) and to a plain-XLA path everywhere else.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large negative for masking pre-softmax logits (f32-safe)


def _masked_softmax_f32(sim: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Softmax over the last axis in float32, with optional boolean mask.

    `mask` broadcasts against `sim` and is True where attention is allowed
    (reference layers.py:88-97 uses masked_fill + fp32 softmax).
    """
    sim = sim.astype(jnp.float32)
    if mask is not None:
        sim = jnp.where(mask, sim, NEG_INF)
    return jax.nn.softmax(sim, axis=-1)


def multi_query_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    attn_bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Multi-query attention: q (b, h, n, d); shared single-head k/v (b, j, d).

    Returns (b, h, n, d) in q's dtype.  `q` must already be scaled by the
    caller (matching reference layers.py:61).  `mask` (b, j) True=keep.

    Dispatches to the Pallas fused kernel on TPU when no mask/bias is given
    (the U-Net's hot path); falls back to plain XLA otherwise.
    """
    if mask is None and attn_bias is None:
        from .flash_attention import mqa_flash, use_pallas  # noqa: PLC0415

        if use_pallas(q.shape[2], k.shape[1]):
            return mqa_flash(q, k, v)
    sim = jnp.einsum("bhnd,bjd->bhnj", q, k, preferred_element_type=jnp.float32)
    if attn_bias is not None:
        sim = sim + attn_bias
    if mask is not None:
        mask = mask[:, None, None, :]
    attn = _masked_softmax_f32(sim, mask)
    out = jnp.einsum("bhnj,bjd->bhnd", attn.astype(v.dtype), v)
    return out.astype(q.dtype)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Standard MHA: q (b, h, n, d); k/v (b, h, j, d); mask (b, j) True=keep.

    `q` must already be scaled.  Softmax in float32 (reference layers.py:247).
    Dispatches to the Pallas fused kernel on TPU when unmasked.
    """
    if mask is None:
        from .flash_attention import mha_flash, use_pallas  # noqa: PLC0415

        if use_pallas(q.shape[2], k.shape[2]):
            return mha_flash(q, k, v)
    sim = jnp.einsum("bhnd,bhjd->bhnj", q, k, preferred_element_type=jnp.float32)
    if mask is not None:
        mask = mask[:, None, None, :]
    attn = _masked_softmax_f32(sim, mask)
    out = jnp.einsum("bhnj,bhjd->bhnd", attn.astype(v.dtype), v)
    return out.astype(q.dtype)
