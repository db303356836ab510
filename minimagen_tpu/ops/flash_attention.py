"""Pallas TPU fused attention kernels (forward) with XLA-recompute backward.

The U-Net's hot attention shapes (SURVEY.md §5 "long-context" note): spatial
self-attention over up to 64x64=4096 tokens with a shared single K/V head
(multi-query, reference layers.py:42), and cross-attention over ~259
conditioning tokens.  The K/V streams are tiny (J x 64 floats <= ~1 MB) and
fit in VMEM whole, so the kernels tile the *query* axis and fuse
QK^T -> f32 softmax -> PV into one VMEM-resident pass per tile — the (N x J)
logits matrix never touches HBM (a plain XLA einsum materializes it:
b*h*4096*4097 floats ~ 0.5 GB per forward at b=8).

Gradients: `jax.custom_vjp` with the standard attention backward recomputed
in XLA ops — training works through the Pallas forward; a fused backward
kernel is a later optimization.

Use `attention_dispatch`-level helpers in ops/attention.py; these kernels
assume no mask / no bias (the U-Net paths never pass one — padded text rows
are replaced by learned null embeddings, reference Unet.py:598-606).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256  # kept for backward compat; _pick_block_q now adapts

_DISABLE_ENV = "MINIMAGEN_TPU_DISABLE_PALLAS"
_INTERPRET_ENV = "MINIMAGEN_TPU_PALLAS_INTERPRET"


def pallas_enabled() -> bool:
    if os.environ.get(_DISABLE_ENV):
        return False
    if os.environ.get(_INTERPRET_ENV):
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _interpret() -> bool:
    return bool(os.environ.get(_INTERPRET_ENV))


# Dispatch policy thresholds (env-overridable). Measured on one v5e chip with
# tools/attn_bench.py (device-busy timing, b=8 h=8 d=64 bf16):
#   self  n=4096 j=4097: pallas 7.5x faster than XLA
#   self  n=1024 j=1025: pallas 2.3x faster
#   self  n=256  j=257 : XLA 4x faster (small logits fuse fully in XLA)
#   cross n=1024 j=66  : XLA 8x faster (flash blocking is pure overhead)
# => use the fused kernel only when BOTH the query and KV axes are long.
_MIN_KV_ENV = "MINIMAGEN_TPU_PALLAS_MIN_KV"
_MIN_Q_ENV = "MINIMAGEN_TPU_PALLAS_MIN_Q"
_MIN_KV_DEFAULT = 512
_MIN_Q_DEFAULT = 512


def use_pallas(n: int, j: int) -> bool:
    """Should the fused Pallas kernel handle (query len n, KV len j)?"""
    if not pallas_enabled():
        return False
    min_kv = int(os.environ.get(_MIN_KV_ENV, _MIN_KV_DEFAULT))
    min_q = int(os.environ.get(_MIN_Q_ENV, _MIN_Q_DEFAULT))
    return j >= min_kv and n >= min_q and _pick_block_q(n, j) > 0


# --------------------------------------------------------------------------- #
# kernels                                                                     #
# --------------------------------------------------------------------------- #
def _softmax_pv(q, k, v, out_dtype):
    """Fused QK^T -> f32 softmax -> PV for one VMEM-resident block.

    Late-divide: the output block (BQ, D) is divided by the row sums instead
    of the (BQ, J) probability matrix — one full pass over the big matrix
    saved (measured 10-17% kernel time at the flagship shapes on v5e)."""
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BQ, J) f32
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return (o / denom).astype(out_dtype)


def _mqa_kernel(q_ref, k_ref, v_ref, o_ref):
    """One (batch*head, q-block): q (BQ, D); shared k/v (J, D); out (BQ, D)."""
    o_ref[0, 0] = _softmax_pv(q_ref[0, 0], k_ref[0], v_ref[0], o_ref.dtype)


def _mha_kernel(q_ref, k_ref, v_ref, o_ref):
    """One (batch*head, q-block) with per-head k/v: q (BQ, D); k/v (J, D)."""
    o_ref[0, 0] = _softmax_pv(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], o_ref.dtype)


# scoped VMEM budget for the (BQ, J-padded) f32 logits block: v5e's scoped
# vmem limit is 16 MB; leave headroom for q/k/v/o blocks and double buffering
_VMEM_LOGITS_BUDGET = 12 * 1024 * 1024
MAX_BLOCK_Q = 1024


def _pick_block_q(n: int, j: Optional[int] = None) -> int:
    """Largest q-block that divides n, fits the VMEM logits budget for KV
    length j, and is <= MAX_BLOCK_Q. Bigger blocks amortize the per-block
    max/sum reductions and K/V fetches (measured: bq=1024 beats the old fixed
    256 by 1.2x at 1024 tokens on v5e). Returns 0 if nothing fits."""
    cap = MAX_BLOCK_Q
    if j is not None:
        j_pad = ((j + 127) // 128) * 128  # lane-padded logits row length
        cap = min(cap, _VMEM_LOGITS_BUDGET // (4 * j_pad))
    bq = min(cap, n)
    # round down to a power of two (shapes here are powers of two)
    while bq & (bq - 1):
        bq &= bq - 1
    while bq >= 8 and n % bq != 0:
        bq //= 2
    return bq if bq >= 8 else 0


# --------------------------------------------------------------------------- #
# multi-query attention (shared single K/V head)                              #
# --------------------------------------------------------------------------- #
def _mqa_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    b, h, n, d = q.shape
    j = k.shape[1]
    bq = _pick_block_q(n, j)
    assert bq > 0, f"unsupported query length {n}"

    grid = (b * h, n // bq)
    return pl.pallas_call(
        _mqa_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bh, i: (bh // h, bh % h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, d), lambda bh, i: (bh // h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, d), lambda bh, i: (bh // h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda bh, i: (bh // h, bh % h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * j * d,
            bytes_accessed=(q.size + k.size * h + v.size * h + q.size) * q.dtype.itemsize,
            transcendentals=b * h * n * j,
        ),
        interpret=_interpret(),
    )(q, k, v)


@jax.custom_vjp
def mqa_flash(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Fused multi-query attention: q (b,h,n,d) pre-scaled; k/v (b,j,d)."""
    return _mqa_forward(q, k, v)


def _mqa_fwd(q, k, v):
    return _mqa_forward(q, k, v), (q, k, v)


# --------------------------------------------------------------------------- #
# fused MQA backward: two kernels, logits/probabilities never reach HBM       #
# (the plain-XLA backward materializes p (b,h,n,j) — 4+ GB at 4096 tokens).   #
# dk/dv accumulate across (head, q-block) grid steps into the same output     #
# block — TPU pallas grids run sequentially per core, so revisiting an output #
# block accumulates in VMEM and flushes when the batch index advances.        #
# --------------------------------------------------------------------------- #
def _mqa_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref):
    """One pass per (batch, head, q-block): recompute p once, emit the dq
    block, accumulate dk/dv into the per-batch output block (revisited across
    the sequential (head, q-block) grid steps)."""
    h = pl.program_id(1)
    i = pl.program_id(2)

    @pl.when(jnp.logical_and(h == 0, i == 0))
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0, 0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    dp = jax.lax.dot_general(g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))

    dq = jnp.dot(ds.astype(k.dtype), k, preferred_element_type=jnp.float32)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    # dk += ds^T @ q ; dv += p^T @ g   (accumulate over heads and q-blocks)
    dk_ref[0] += jax.lax.dot_general(ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32).astype(dk_ref.dtype)
    dv_ref[0] += jax.lax.dot_general(p, g, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _mqa_bwd_pallas(q, k, v, g):
    b, h, n, d = q.shape
    j = k.shape[1]
    bq = _pick_block_q(n, j)

    dq, dk, dv = pl.pallas_call(
        _mqa_bwd_kernel,
        grid=(b, h, n // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, i: (bb, hh, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, d), lambda bb, hh, i: (bb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, d), lambda bb, hh, i: (bb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, i: (bb, hh, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, i: (bb, hh, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, d), lambda bb, hh, i: (bb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, d), lambda bb, hh, i: (bb, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, j, d), jnp.float32),
            jax.ShapeDtypeStruct((b, j, d), jnp.float32),
        ),
        interpret=_interpret(),
    )(q, k, v, g)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


_FUSED_BWD_THRESHOLD_ENV = "MINIMAGEN_TPU_FUSED_BWD_THRESHOLD"
# Default 0: always use the fused backward when the forward ran fused.
# Round-1 measured the XLA recompute ~15% faster when p fits — that result is
# obsolete with the round-2 kernel (adaptive q-blocks + dispatch keeping
# short-KV shapes out of Pallas entirely): re-profiled on v5e 2026-08-16, the
# fused backward is 4.5x faster than the XLA recompute at the flagship
# 1024-token shape (617 us vs ~2.8 ms device time) and cut the whole train
# step 26.3 -> 21.2 ms. The env knob remains as an escape hatch (set a byte
# threshold to fall back to XLA recompute below it).


def _fused_bwd_threshold() -> int:
    return int(os.environ.get(_FUSED_BWD_THRESHOLD_ENV, 0))


def _mqa_bwd(res, g):
    """Fused Pallas backward when the XLA recompute would materialize an
    oversized probability matrix; XLA recompute otherwise (faster when p
    fits — see threshold note above)."""
    q, k, v = res
    b, h, n, _ = q.shape
    j = k.shape[1]
    p_bytes = 4 * b * h * n * j  # f32 probability matrix the XLA path builds
    if (pallas_enabled() and _pick_block_q(q.shape[2], j) > 0
            and p_bytes > _fused_bwd_threshold()):
        return _mqa_bwd_pallas(q, k, v, g)
    s = jnp.einsum("bhnd,bjd->bhnj", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dp = jnp.einsum("bhnd,bjd->bhnj", g32, v32)
    dv = jnp.einsum("bhnj,bhnd->bjd", p, g32)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnj,bjd->bhnd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bhnj,bhnd->bjd", ds, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


mqa_flash.defvjp(_mqa_fwd, _mqa_bwd)


# --------------------------------------------------------------------------- #
# multi-head attention (per-head K/V)                                          #
# --------------------------------------------------------------------------- #
def _mha_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    b, h, n, d = q.shape
    j = k.shape[2]
    bq = _pick_block_q(n, j)
    assert bq > 0, f"unsupported query length {n}"

    grid = (b * h, n // bq)
    return pl.pallas_call(
        _mha_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bh, i: (bh // h, bh % h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, j, d), lambda bh, i: (bh // h, bh % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, j, d), lambda bh, i: (bh // h, bh % h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda bh, i: (bh // h, bh % h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * j * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * h * n * j,
        ),
        interpret=_interpret(),
    )(q, k, v)


@jax.custom_vjp
def mha_flash(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Fused multi-head attention: q (b,h,n,d) pre-scaled; k/v (b,h,j,d)."""
    return _mha_forward(q, k, v)


def _mha_fwd(q, k, v):
    return _mha_forward(q, k, v), (q, k, v)


def _mha_bwd(res, g):
    q, k, v = res
    s = jnp.einsum("bhnd,bhjd->bhnj", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    dp = jnp.einsum("bhnd,bhjd->bhnj", g32, v.astype(jnp.float32))
    dv = jnp.einsum("bhnj,bhnd->bhjd", p, g32)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnj,bhjd->bhnd", ds, k.astype(jnp.float32))
    dk = jnp.einsum("bhnj,bhnd->bhjd", ds, q.astype(jnp.float32))
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


mha_flash.defvjp(_mha_fwd, _mha_bwd)


# --------------------------------------------------------------------------- #
# biased (masked) MHA with a FUSED Pallas backward — the cross-attention      #
# training path (round-3 VERDICT next #5, second structural attempt at the    #
# 2.0 ms/step relayout-copy category).                                        #
#                                                                             #
# Cross-attention always carries a text mask (as an additive f32 logit bias,  #
# (b,1,1,j)), so it can never take the unmasked mha_flash path above. The     #
# autodiff/XLA backward materializes p, dp, ds as f32 (b,h,n,j) HBM arrays    #
# (68 MB each at the flagship 8x8x1024x259) and layout-assignment wraps them  #
# in relayout copy pairs (~2.0 ms/step, BASELINE.md train breakdown). These   #
# kernels keep every (n x j) intermediate in VMEM: the forward never writes   #
# p, the backward recomputes it per q-block and emits only dq/dk/dv.          #
# --------------------------------------------------------------------------- #
def _mha_bias_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """Forward, one (batch*head, q-block): logits + per-batch bias row."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + bias_ref[0, 0]                     # (1, j) broadcasts over (BQ, j)
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / denom).astype(o_ref.dtype)


def _mha_bias_forward(q, k, v, bias):
    b, h, n, d = q.shape
    j = k.shape[2]
    bq = _pick_block_q(n, j)
    assert bq > 0, f"unsupported query length {n}"
    grid = (b * h, n // bq)
    return pl.pallas_call(
        _mha_bias_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bh, i: (bh // h, bh % h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, j, d), lambda bh, i: (bh // h, bh % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, j, d), lambda bh, i: (bh // h, bh % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, j), lambda bh, i: (bh // h, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda bh, i: (bh // h, bh % h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * j * d,
            bytes_accessed=(2 * q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * n * j,
        ),
        interpret=_interpret(),
    )(q, k, v, bias)


def _mha_bias_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref,
                         dq_ref, dk_ref, dv_ref):
    """One (batch, head, q-block): recompute p in VMEM, emit the dq block,
    accumulate dk/dv into the per-(batch,head) output block (revisited across
    the sequential q-block grid steps)."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    g = g_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + bias_ref[0, 0]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    dp = jax.lax.dot_general(g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))

    dq = jnp.dot(ds.astype(k.dtype), k, preferred_element_type=jnp.float32)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)
    dv_ref[0, 0] += jax.lax.dot_general(
        p, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _mha_bias_bwd_pallas(q, k, v, bias, g):
    b, h, n, d = q.shape
    j = k.shape[2]
    bq = _pick_block_q(n, j)
    dq, dk, dv = pl.pallas_call(
        _mha_bias_bwd_kernel,
        grid=(b, h, n // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, i: (bb, hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, j, d), lambda bb, hh, i: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, j, d), lambda bb, hh, i: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, j), lambda bb, hh, i: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, i: (bb, hh, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bq, d), lambda bb, hh, i: (bb, hh, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, j, d), lambda bb, hh, i: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, j, d), lambda bb, hh, i: (bb, hh, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, j, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h, j, d), jnp.float32),
        ),
        interpret=_interpret(),
    )(q, k, v, bias, g)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


@jax.custom_vjp
def mha_flash_bias(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   bias: jnp.ndarray) -> jnp.ndarray:
    """Fused masked MHA: q (b,h,n,d) pre-scaled; k/v (b,h,j,d); additive f32
    logit bias (b,1,1,j) (mask-derived: 0 keep / -1e30 drop). Forward AND
    backward run as Pallas kernels — no (n x j) intermediate reaches HBM.

    The bias cotangent is hard zero: callers derive it from a boolean mask
    (no gradient) — do not differentiate w.r.t. a learned bias through this.
    """
    return _mha_bias_forward(q, k, v, bias)


def _mha_bias_fwd(q, k, v, bias):
    return _mha_bias_forward(q, k, v, bias), (q, k, v, bias)


def _mha_bias_bwd(res, g):
    q, k, v, bias = res
    dq, dk, dv = _mha_bias_bwd_pallas(q, k, v, bias, g)
    return dq, dk, dv, jnp.zeros_like(bias)


mha_flash_bias.defvjp(_mha_bias_fwd, _mha_bias_bwd)
