"""TPU-friendly CrossEmbed stem convolution.

The reference stem (/root/reference/minimagen/layers.py:254-305, used as
`init_conv`, Unet.py:169) runs three parallel convs with kernels 3/7/15 over
the 3(/6)-channel input image. XLA lowers each as a separate conv whose
contraction is k*k*cin; with cin=3 the MXU runs at ~4% utilization and the
stem costs ~460 us — ~8% of the flagship denoise step (BASELINE.md round-2
profile) for ~0.3% of its FLOPs.

This module rewrites the stem as ONE dense conv in two exact steps:

1. **Kernel merging**: all three kernels are zero-embedded into a single
   (15, 15, cin, dim_out) weight (a k-kernel conv with pad (k-1)/2 equals a
   15x15 conv with pad 7 whose weight is centered), so the whole stem is one
   convolution — one pass over the input instead of three.
2. **Space-to-depth factor 2**: the stride-1 conv over (H, W, cin) becomes a
   VALID conv over (H/2+7, W/2+7, 4*cin) with an (8, 8, 4*cin, 4*dim_out)
   weight whose output phases are depth-to-spaced back to (H, W, dim_out).
   The contraction grows from 3 to 8*8*12 = 768 and the MXU tiles it
   efficiently (the MLPerf-ResNet "conv1 space-to-depth" trick, adapted to
   stride 1 by merging the 2x2 output phases into the channel axis).

Both steps are algebraically exact (verified to float tolerance in
tests/test_stem_conv.py) and fully differentiable.

Dispatch — measured IN CONTEXT on the flagship graphs (tools/profile_tpu.py,
one v5e chip, 2026-08-16), not just in micro-benches, because chained-loop
micro-timings mislead here (XLA slices dead channels out of feedback loops
and re-layouts loop-carried small tensors):

- FORWARD: the dense space-to-depth-4 conv (no im2col patch tensor) is the
  TPU default — measured 4.970 vs 5.317 ms on the flagship denoise step
  (table in `_stem_forward`). The earlier space-to-depth-2 im2col+matmul
  variant reached full MXU tiling but materialized a 50 MB patch tensor
  (~590 us in context) and ships only as `cross_embed_fused` for reference.
- BACKWARD (weight gradients): custom VJP through an explicit
  space-to-depth im2col + dot_general wgrad ((K2*K2*4cin) x (b*H*W/4) @
  (b*H*W/4) x (4cout) — every dimension lane-aligned). XLA's native wgrad
  for the reference convs contracts over batch (8 of 128 lanes, ~16x MXU
  waste): 380+ us for the 15x15 scale alone vs ~45 us for the fused matmul.
- dx rides the reference formulation and is kept separable so it dead-code
  eliminates when the stem is the first layer (x is data, not a
  differentiated input — the usual case).

`MINIMAGEN_TPU_STEM_FUSED=0/1` overrides the TPU-only stride-1 dispatch.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .flash_attention import _INTERPRET_ENV, pallas_enabled

_FUSED_ENV = "MINIMAGEN_TPU_STEM_FUSED"


def use_fused_stem(stride: int, h: int, w: int) -> bool:
    # The fused math is only defined for stride-1 even-H/W stems; the env is
    # a TPU-dispatch override, never a correctness override, so the
    # preconditions gate both branches.
    if not (stride == 1 and h % 2 == 0 and w % 2 == 0):
        return False
    env = os.environ.get(_FUSED_ENV)
    if env is not None:
        return env not in ("0", "")
    return pallas_enabled()


def merge_cross_embed_kernels(
    kernels: Sequence[jnp.ndarray],
) -> jnp.ndarray:
    """Zero-embed per-scale conv kernels into one (K, K, cin, sum(cout)).

    ``kernels``: list of (k_i, k_i, cin, cout_i), odd k_i, sorted or not.
    A k conv with SAME-style pad (k-1)//2 equals a K conv with pad (K-1)//2
    whose weight is centered at offset (K-k)//2.
    """
    K = max(k.shape[0] for k in kernels)
    cin = kernels[0].shape[2]
    parts = []
    for kern in kernels:
        k = kern.shape[0]
        off = (K - k) // 2
        parts.append(jnp.pad(kern, ((off, K - k - off), (off, K - k - off), (0, 0), (0, 0))))
    return jnp.concatenate(parts, axis=-1)  # (K, K, cin, sum(cout))


def _s2d_kernel_size(K: int, f: int) -> int:
    """Spatial size of the factor-``f`` space-to-depth weight for an odd-K
    stride-1 conv: dy = f*a + q - p with q, p in [0, f) must cover [0, K)."""
    return (K + f - 2) // f + 1


def _space_to_depth_weight(w: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    """Transform (K, K, cin, cout), odd K, into the equivalent space-to-depth
    factor-``f`` weight (Kf, Kf, f*f*cin, f*f*cout), Kf = (K+f-2)//f + 1.

    Derivation: with pad P = (K-1)//2 and xp the padded input,
      out(fY'+py, fX'+px, co) = sum_{dy,dx,ci} xp(fY'+py+dy, fX'+px+dx, ci) W(dy,dx,ci,co).
    Substituting fY'+py+dy = f(Y'+a)+qy gives dy = f*a+qy-py, so the phase-
    (py,px) output is a VALID conv of Xf(Y,X,(qy,qx,ci)) = xp(fY+qy, fX+qx, ci)
    with weight Wf[a,b,(qy,qx,ci),co] = W(f*a+qy-py, f*b+qx-px, ci, co)
    (zero when the index leaves [0, K)). The f*f phases stack on cout in
    (py, px) order, matching the caller's depth-to-space.
    """
    K, _, cin, cout = w.shape
    Kf = _s2d_kernel_size(K, f)
    a = jnp.arange(Kf)
    q = jnp.arange(f)
    phases = []
    for py in range(f):
        iy = f * a[:, None] + q[None, :] - py  # (Kf, f)
        my = ((iy >= 0) & (iy < K)).astype(w.dtype)
        ty = w[jnp.clip(iy, 0, K - 1)] * my[..., None, None, None]  # (Kf, f, K, cin, cout)
        for px in range(f):
            ix = f * a[:, None] + q[None, :] - px
            mx = ((ix >= 0) & (ix < K)).astype(w.dtype)
            t = ty[:, :, jnp.clip(ix, 0, K - 1)] * mx[None, None, :, :, None, None]
            # (Kf, f(qy), Kf, f(qx), cin, cout) -> (Kf, Kf, f*f*cin, cout)
            t = t.transpose(0, 2, 1, 3, 4, 5).reshape(Kf, Kf, f * f * cin, cout)
            phases.append(t)
    return jnp.concatenate(phases, axis=-1)  # (Kf, Kf, f*f*cin, f*f*cout)


def _space_to_depth(x: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    """(b, H, W, c) -> (b, H/f, W/f, f*f*c) with channel order (qy, qx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)


def _depth_to_space(x: jnp.ndarray, f: int = 2) -> jnp.ndarray:
    """(b, H', W', f*f*c) with channel order (py, px, c) -> (b, fH', fW', c)."""
    b, h, w, cf = x.shape
    c = cf // (f * f)
    x = x.reshape(b, h, w, f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, f * h, f * w, c)


_D2S_PALLAS_ENV = "MINIMAGEN_TPU_PALLAS_D2S"


def _depth_to_space_bias_pallas(x: jnp.ndarray, bias: jnp.ndarray,
                                f: int) -> jnp.ndarray:
    """Fused depth-to-space + bias add as one Pallas pass.

    XLA lowers `_depth_to_space` as a physical reshape + transpose copy —
    two HBM round trips over the full stem activation (measured 453 + 409
    us/step on the 256px SR stage, tools/profile_tpu.py sr256, 2026-08-18,
    ~5% of the step). One kernel would do the shuffle VMEM-locally per
    (batch, row) block and fold the stem bias in, so the activation crosses
    HBM once. Grid (b, H'); in block (1, 1, W', f*f*c) -> out block
    (1, f, f*W', c); channel order (py, px, c) matches `_depth_to_space`.

    STATUS (retried 2026-08-19 under jax 0.9 Mosaic; round-3 VERDICT #10):
    now COMPILES AND RUNS BIT-EXACT on hardware when the output channel
    count fills the 128-lane register (c % 128 == 0: the 64px dim-128 stem,
    probe max|diff|=0) — but c=64 (the 256px SR stem, the shape the kernel
    was built FOR) still fails with the original "infer-vector-layout:
    unsupported shape cast". And where it does compile it LOSES in context:
    denoise step 4.970 -> 5.649 ms/step (+13.7%, tools/profile_tpu.py
    denoise A/B, jax 0.9) — the pallas_call boundary breaks XLA's
    surrounding fusions (fusion category 3816 -> 4564 us/step), the same
    failure mode as the fused-GN kernel (ops/group_norm.py). The d2s
    reshape+transpose copies it replaces are cheaper than the fusion breaks.
    Ships OFF behind MINIMAGEN_TPU_PALLAS_D2S; category closed as a
    measured negative unless Mosaic gains sub-128-lane shape casts AND the
    kernel can be fused into a neighbor.

    History (jax 0.8.x Mosaic, 2026-08-18): not compilable at all — (a)
    `reshape (W,4,4,c) + transpose`: "infer-vector-layout: unsupported
    shape cast"; (b) per-py 2D fold `(W, f*c) -> (f*W, c)`: same;
    (c) per-(py,px) strided sublane stores: "Strided store with non 32-bit
    data" (bf16).
    """
    from jax.experimental import pallas as pl  # noqa: PLC0415

    b, h, w, cf = x.shape
    c = cf // (f * f)

    def kernel(x_ref, b_ref, o_ref):
        v = x_ref[0, 0]                       # (W', f*f*c), lanes (py, px, c)
        v = v.reshape(w, f, f, c)             # (w, py, px, c)
        v = v.transpose(1, 0, 2, 3)           # (py, w, px, c)
        o_ref[0] = v.reshape(f, f * w, c) + b_ref[:]

    interpret = bool(os.environ.get(_INTERPRET_ENV))
    return pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, w, cf), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((c,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((1, f, f * w, c), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, f * h, f * w, c), x.dtype),
        interpret=interpret,
    )(x, bias.astype(x.dtype))


def _use_pallas_d2s() -> bool:
    env = os.environ.get(_D2S_PALLAS_ENV)
    if env is not None:
        return env not in ("0", "")
    return False  # measured dispatch pending (see module docstring table)


def _s2d_patches(x: jnp.ndarray, K: int) -> jnp.ndarray:
    """Pad + space-to-depth + im2col for a K x K (odd) stride-1 conv.

    Returns (b, H/2, W/2, K2*K2*4cin) patches whose channel order matches
    `_space_to_depth_weight`'s (a, b, (qy, qx, ci)) layout.
    """
    K2, pad = K // 2 + 1, (K - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    x2 = _space_to_depth(xp)
    h2, w2 = x2.shape[1] - K2 + 1, x2.shape[2] - K2 + 1
    return jnp.concatenate(
        [x2[:, a:a + h2, b:b + w2, :] for a in range(K2) for b in range(K2)],
        axis=-1)


def cross_embed_fused(
    x: jnp.ndarray,
    kernels: Sequence[jnp.ndarray],
    biases: Sequence[Optional[jnp.ndarray]],
    dtype: jnp.dtype,
) -> jnp.ndarray:
    """Fused stride-1 CrossEmbed stem: space-to-depth im2col + one matmul.

    The contraction (K2*K2*4cin = 768 for the 15/7/3 stem) and the output
    width (4*dim_out) are both lane-aligned, so the MXU runs dense — XLA's
    conv lowering pads cin to the lane width instead (~4% utilization).

    :param x: (b, H, W, cin), H and W even.
    :param kernels: per-scale (k, k, cin, cout_i) conv weights.
    :param biases: per-scale (cout_i,) biases (or None).
    """
    w = merge_cross_embed_kernels([k.astype(dtype) for k in kernels])
    K = w.shape[0]
    w2 = _space_to_depth_weight(w)  # (K2, K2, 4cin, 4cout)
    patches = _s2d_patches(x.astype(dtype), K)
    b, h2, w2c, _ = patches.shape
    out2 = jnp.dot(patches.reshape(b * h2 * w2c, -1),
                   w2.reshape(-1, w2.shape[-1]))
    out = _depth_to_space(out2.reshape(b, h2, w2c, -1)).astype(dtype)
    bias_parts = [
        bb if bb is not None else jnp.zeros(k.shape[-1], dtype)
        for bb, k in zip(biases, kernels)
    ]
    return out + jnp.concatenate(bias_parts).astype(dtype)


def cross_embed_s2d_conv(
    x: jnp.ndarray,
    kernels: Sequence[jnp.ndarray],
    biases: Sequence[Optional[jnp.ndarray]],
    f: int,
    dtype: jnp.dtype,
) -> jnp.ndarray:
    """Exact stride-1 CrossEmbed stem as ONE dense space-to-depth-``f`` conv.

    Unlike `cross_embed_fused` (explicit im2col + matmul, whose 50 MB patch
    tensor measured slower in context), this keeps the conv a conv: the input
    is space-to-depth'd by ``f`` (cin 3/6 -> 48/96 channels, filling the
    128-lane contraction XLA pads today) and the merged 15x15 weight becomes
    an equivalent (Kf, Kf, f*f*cin, f*f*cout) VALID conv — nothing larger
    than the output is ever materialized.
    """
    w = merge_cross_embed_kernels([k.astype(dtype) for k in kernels])
    K = w.shape[0]
    P = (K - 1) // 2
    wf = _space_to_depth_weight(w, f)
    b, h, ww, cin = x.shape
    eh = (-(h + 2 * P)) % f
    ew = (-(ww + 2 * P)) % f
    xp = jnp.pad(x.astype(dtype), ((0, 0), (P, P + eh), (P, P + ew), (0, 0)))
    x2 = _space_to_depth(xp, f)
    y2 = jax.lax.conv_general_dilated(
        x2, wf.astype(dtype), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # the trailing eh/ew zero-pad rows only feed windows past the real image
    y2 = y2[:, : h // f, : ww // f, :]
    bias_parts = [
        bb if bb is not None else jnp.zeros(k.shape[-1], dtype)
        for bb, k in zip(biases, kernels)
    ]
    bias = jnp.concatenate(bias_parts)
    if _use_pallas_d2s():
        return _depth_to_space_bias_pallas(y2, bias, f)
    return _depth_to_space(y2, f) + bias.astype(dtype)


_S2D_ENV = "MINIMAGEN_TPU_STEM_S2D"


def _stem_forward(x, kernels, biases, dtype):
    """Forward formulation dispatch. Default ON TPU: the dense
    space-to-depth-4 conv — measured IN CONTEXT on the flagship denoise step
    (tools/profile_tpu.py, one v5e chip, 2026-08-17):

    | stem forward | denoise step | MFU |
    |---|---|---|
    | reference parallel convs | 5.317 ms | 56.6% |
    | **s2d-4 dense conv** | **4.970 ms** | **61.4%** |
    | s2d-8 dense conv | 5.081 ms | 60.5% |

    s2d-4 lifts the stem contraction from cin=3/6 (XLA pads to 128 lanes,
    ~4% MXU) to 5x5x(16*cin) with no im2col patch tensor — the conv category
    drops 749 -> 269 us/step. `MINIMAGEN_TPU_STEM_S2D=0` forces the
    reference formulation; 2/4/8 force a factor. Only dispatched where the
    custom-VJP gate already applies (TPU, stride 1, even H/W) — CPU/tests
    keep reference numerics."""
    env = os.environ.get(_S2D_ENV, "")
    if env in ("2", "4", "8"):
        f = int(env)
        if x.shape[1] % f or x.shape[2] % f:
            # depth_to_space would truncate to f*(h//f) rows — fall back to
            # the exact reference formulation rather than return a wrong shape
            return cross_embed_reference(x, kernels, biases, 1, dtype)
        return cross_embed_s2d_conv(x, kernels, biases, f, dtype)
    if env not in ("0", ""):
        raise ValueError(
            f"{_S2D_ENV}={env!r}: expected one of 0 (reference), 2, 4, 8")
    if env == "" and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
        return cross_embed_s2d_conv(x, kernels, biases, 4, dtype)
    return cross_embed_reference(x, kernels, biases, 1, dtype)


def cross_embed_reference(
    x: jnp.ndarray,
    kernels: Sequence[jnp.ndarray],
    biases: Sequence[Optional[jnp.ndarray]],
    stride: int,
    dtype: jnp.dtype,
) -> jnp.ndarray:
    """Reference formulation: parallel convs, concatenated on channels
    (bit-identical to the nn.Conv stack it replaces)."""
    fmaps = []
    x = x.astype(dtype)
    for kern, bias in zip(kernels, biases):
        k = kern.shape[0]
        pad = (k - stride) // 2
        y = jax.lax.conv_general_dilated(
            x, kern.astype(dtype), window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(dtype)
        fmaps.append(y)
    return jnp.concatenate(fmaps, axis=-1)


def _stem_vjp_fns(dtype):
    """custom_vjp pair: reference math forward, patches-matmul weight grads
    (see the module docstring for the measured dispatch rationale)."""

    @jax.custom_vjp
    def stem(x, kernels, biases):
        # forward: _stem_forward's measured dispatch — s2d-4 dense conv by
        # default on TPU when H/W are 4-divisible (denoise step 5.317 ->
        # 4.970 ms in context), reference parallel convs otherwise.
        # MINIMAGEN_TPU_STEM_S2D=0 forces reference, 2/4/8 force a factor
        # (with a reference fallback when H/W aren't divisible).
        return _stem_forward(x, kernels, biases, dtype)

    def stem_fwd(x, kernels, biases):
        return stem(x, kernels, biases), (x, kernels, biases)

    def stem_bwd(res, g):
        x, kernels, biases = res
        g16 = g.astype(dtype)

        # --- weight grads: patches-matmul wgrad in the space-to-depth domain.
        # XLA's native wgrad lowering for this conv contracts over the batch
        # axis (8 lanes of 128 used -> ~16x MXU waste, measured ~1.4 ms at
        # base 64px). An explicit im2col + dot_general is a perfect MXU shape
        # ((K2*K2*4cin, b*H2*W2) @ (b*H2*W2, 4cout), measured ~10x faster).
        K = max(k.shape[0] for k in kernels)
        K2 = K // 2 + 1
        patches = _s2d_patches(x.astype(dtype), K)    # (b, H2, W2, K2*K2*4cin)
        g2 = _space_to_depth(g16)                     # (b, H2, W2, 4cout)
        dw2 = jax.lax.dot_general(
            patches.reshape(-1, patches.shape[-1]), g2.reshape(-1, g2.shape[-1]),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(K2, K2, 4 * x.shape[-1], g2.shape[-1])

        def to_w2(ks):
            w = merge_cross_embed_kernels([k.astype(dtype) for k in ks])
            return _space_to_depth_weight(w)

        (dk,) = jax.linear_transpose(to_w2, list(kernels))(dw2.astype(dtype))

        # --- bias grads: plain channel sums, split per scale
        db_full = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
        db, off = [], 0
        for kern, bias in zip(kernels, biases):
            cout = kern.shape[-1]
            db.append(None if bias is None else db_full[off:off + cout].astype(bias.dtype))
            off += cout

        # --- dx through the reference formulation, kept SEPARABLE so that
        # when the stem is the first layer (x is data, not a differentiated
        # input) the whole dgrad is DCE'd instead of riding along.
        def fwd_x(xi):
            return cross_embed_reference(xi, kernels, [None] * len(kernels), 1, dtype)

        (dx,) = jax.linear_transpose(
            fwd_x, jax.ShapeDtypeStruct(x.shape, x.dtype))(g16)
        return dx, dk, db

    stem.defvjp(stem_fwd, stem_bwd)
    return stem


def cross_embed_conv(
    x: jnp.ndarray,
    kernels: List[jnp.ndarray],
    biases: List[Optional[jnp.ndarray]],
    *,
    stride: int,
    dtype: jnp.dtype,
) -> jnp.ndarray:
    """Dispatching CrossEmbed stem (see module docstring)."""
    if use_fused_stem(stride, x.shape[1], x.shape[2]):
        return _stem_vjp_fns(dtype)(x, list(kernels), list(biases))
    return cross_embed_reference(x, kernels, biases, stride, dtype)
