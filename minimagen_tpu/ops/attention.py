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

import contextlib
import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # large negative for masking pre-softmax logits (f32-safe)

# --------------------------------------------------------------------------- #
# trace-time training-graph flag                                              #
#                                                                             #
# Loss builders (Imagen._p_losses) trace their U-Net forward inside           #
# `training_graph()`.  With MINIMAGEN_TPU_XLA_ATTN_BWD=1, attention shapes    #
# that stay on the XLA path (short KV under the Pallas dispatch threshold —   #
# notably cross-attention, n up to 4096 queries over ~259 text tokens) route  #
# through a custom-VJP whose backward recomputes the probabilities and runs   #
# every (n x j) matmul in the activation dtype with f32 accumulation,         #
# instead of autodiff's f32 einsum chain.                                     #
#                                                                             #
# SHIPS OFF: measured a 1.6% NEGATIVE on the flagship train step (same-       #
# session A/B through tools/profile_tpu.py, one v5e chip, 2026-08-17):        #
#                                                                             #
#   | config                   | ms/step | copy  | fusion  |                  #
#   |--------------------------|---------|-------|---------|                  #
#   | autodiff (default)       | 21.575  | 2.039 | 16.188  |                  #
#   | custom-VJP rework (=1)   | 21.910  | 2.065 | 16.474  |                  #
#                                                                             #
# The hypothesized win (killing the f32[8,8,1024,259] relayout copy pairs     #
# around the cross-attention backward) did not materialize: the copies        #
# persisted at ~135 us/step each (XLA's layout assignment re-emits them       #
# around the recomputed ds), and the extra QK^T+softmax recompute pass        #
# outweighed the bf16 matmul savings — the autodiff chain's big wgrad/einsum  #
# fusions were already near roofline.  Kept behind the env for future shapes  #
# (e.g. much longer text contexts) where the f32 (b,h,n,j) traffic dominates. #
# Sampling graphs never set the flag either way, so inference HLO — and the   #
# warm TPU compile cache for the cascade graphs — is untouched.               #
# --------------------------------------------------------------------------- #
_TRAIN_BWD_ENV = "MINIMAGEN_TPU_XLA_ATTN_BWD"          # '1' enables the rework
_TRAIN_BWD_MIN_ENV = "MINIMAGEN_TPU_XLA_ATTN_BWD_MIN"  # min n*j to engage
_TRAIN_BWD_MIN_DEFAULT = 65536                          # ~256 queries x 257 kv
_training_graph_depth = 0

# Fused Pallas masked-MHA fwd+bwd for cross-attention TRAINING graphs
# (round-3 VERDICT next #5): keeps every f32 (n x j) intermediate in VMEM
# instead of autodiff's three (b,h,n,j) HBM arrays + relayout copy pairs.
# Structurally different from the (negative) custom-VJP XLA rework above —
# that one still materialized p/dp/ds in HBM; this one never writes them.
# Gated by env + a min query length; sampling graphs are untouched (the
# measured XLA forward wins for short-KV inference, see use_pallas note).
# SHIPS OFF: the in-context A/B (tools/profile_tpu.py train, batch 8
# flagship, 2026-08-19) measured a NET LOSS — the kernel removes what it
# promised (copy 2040 -> 1890 us/step, fusion 16187 -> 15830) but its own
# runtime exceeds XLA's recomputed bwd (attention 1733 -> 2391 us/step):
# total 21.58 -> 21.72 ms/step (+0.6%). At these shapes (n=1024, j=67-259)
# the relayout pairs are cheaper than a Pallas bwd that revisits KV per
# q-block. Keep OFF; revisit only for much longer text contexts where the
# (b,h,n,j) HBM traffic actually dominates.
_CROSS_FUSED_ENV = "MINIMAGEN_TPU_PALLAS_CROSS_BWD"     # '1' enables
_CROSS_FUSED_MIN_Q_ENV = "MINIMAGEN_TPU_PALLAS_CROSS_MIN_Q"
_CROSS_FUSED_MIN_Q_DEFAULT = 1024


def _use_fused_cross(n: int, j: int) -> bool:
    if _training_graph_depth == 0 or os.environ.get(_CROSS_FUSED_ENV, "0") != "1":
        return False
    from .flash_attention import _pick_block_q, pallas_enabled  # noqa: PLC0415

    min_q = int(os.environ.get(_CROSS_FUSED_MIN_Q_ENV, _CROSS_FUSED_MIN_Q_DEFAULT))
    return pallas_enabled() and n >= min_q and _pick_block_q(n, j) > 0


@contextlib.contextmanager
def training_graph():
    """Mark the enclosed trace as a training (differentiated) graph."""
    global _training_graph_depth
    _training_graph_depth += 1
    try:
        yield
    finally:
        _training_graph_depth -= 1


def _use_train_bwd(n: int, j: int) -> bool:
    if _training_graph_depth == 0 or os.environ.get(_TRAIN_BWD_ENV, "0") == "0":
        return False
    return n * j >= int(os.environ.get(_TRAIN_BWD_MIN_ENV, _TRAIN_BWD_MIN_DEFAULT))


def _mask_bias(mask: Optional[jnp.ndarray], b: int, j: int) -> jnp.ndarray:
    """Additive f32 logit bias equivalent to the boolean mask (True=keep).

    NEG_INF absorbs any finite logit in f32 (|sim| << 1e30), so `sim + bias`
    softmaxes identically to the where-replacement in `_masked_softmax_f32`.
    """
    if mask is None:
        return jnp.zeros((b, 1, 1, j), jnp.float32)
    return jnp.where(mask[:, None, None, :], 0.0, NEG_INF).astype(jnp.float32)


@jax.custom_vjp
def _mqa_xla_attn(q, k, v, bias):
    """XLA multi-query attention with a bandwidth-lean training backward."""
    sim = jnp.einsum("bhnd,bjd->bhnj", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(sim + bias, axis=-1)
    out = jnp.einsum("bhnj,bjd->bhnd", p.astype(v.dtype), v)
    return out.astype(q.dtype)


def _mqa_xla_fwd(q, k, v, bias):
    return _mqa_xla_attn(q, k, v, bias), (q, k, v, bias)


def _mqa_xla_bwd(res, g):
    q, k, v, bias = res
    sim = jnp.einsum("bhnd,bjd->bhnj", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(sim + bias, axis=-1)               # recomputed, f32
    pb = p.astype(v.dtype)
    gb = g.astype(v.dtype)
    dp = jnp.einsum("bhnd,bjd->bhnj", gb, v, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dsb = ds.astype(q.dtype)
    dq = jnp.einsum("bhnj,bjd->bhnd", dsb, k, preferred_element_type=jnp.float32)
    dk = jnp.einsum("bhnj,bhnd->bjd", dsb, q, preferred_element_type=jnp.float32)
    dv = jnp.einsum("bhnj,bhnd->bjd", pb, gb, preferred_element_type=jnp.float32)
    # bias is always mask-derived (jnp.where over a bool) or literal zeros —
    # its cotangent dies upstream; zeros avoid an extra pass over (b,h,n,j).
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(bias))


_mqa_xla_attn.defvjp(_mqa_xla_fwd, _mqa_xla_bwd)


@jax.custom_vjp
def _mha_xla_attn(q, k, v, bias):
    """XLA multi-head attention with a bandwidth-lean training backward."""
    sim = jnp.einsum("bhnd,bhjd->bhnj", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(sim + bias, axis=-1)
    out = jnp.einsum("bhnj,bhjd->bhnd", p.astype(v.dtype), v)
    return out.astype(q.dtype)


def _mha_xla_fwd(q, k, v, bias):
    return _mha_xla_attn(q, k, v, bias), (q, k, v, bias)


def _mha_xla_bwd(res, g):
    q, k, v, bias = res
    sim = jnp.einsum("bhnd,bhjd->bhnj", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(sim + bias, axis=-1)
    pb = p.astype(v.dtype)
    gb = g.astype(v.dtype)
    dp = jnp.einsum("bhnd,bhjd->bhnj", gb, v, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dsb = ds.astype(q.dtype)
    dq = jnp.einsum("bhnj,bhjd->bhnd", dsb, k, preferred_element_type=jnp.float32)
    dk = jnp.einsum("bhnj,bhnd->bhjd", dsb, q, preferred_element_type=jnp.float32)
    dv = jnp.einsum("bhnj,bhnd->bhjd", pb, gb, preferred_element_type=jnp.float32)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(bias))


_mha_xla_attn.defvjp(_mha_xla_fwd, _mha_xla_bwd)


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
    if attn_bias is None and _use_train_bwd(q.shape[2], k.shape[1]):
        return _mqa_xla_attn(q, k, v, _mask_bias(mask, q.shape[0], k.shape[1]))
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
    if _use_fused_cross(q.shape[2], k.shape[2]):
        from .flash_attention import mha_flash_bias  # noqa: PLC0415

        return mha_flash_bias(q, k, v, _mask_bias(mask, q.shape[0], k.shape[2]))
    if _use_train_bwd(q.shape[2], k.shape[2]):
        return _mha_xla_attn(q, k, v, _mask_bias(mask, q.shape[0], k.shape[2]))
    sim = jnp.einsum("bhnd,bhjd->bhnj", q, k, preferred_element_type=jnp.float32)
    if mask is not None:
        mask = mask[:, None, None, :]
    attn = _masked_softmax_f32(sim, mask)
    out = jnp.einsum("bhnj,bhjd->bhnd", attn.astype(v.dtype), v)
    return out.astype(q.dtype)
