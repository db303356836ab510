"""Functional utilities (JAX-native layer L0).

Capability-parity with the reference helper layer (/root/reference/minimagen/
helpers.py:1-183), re-expressed for a functional JAX codebase: no device
management (`module_device`), no eval-mode toggling (`eval_decorator`) — those
concepts do not exist here because params are explicit pytrees and modules are
pure functions.  Randomness helpers take explicit `jax.random` keys.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def exists(val: Any) -> bool:
    """True if `val` is not None (reference helpers.py:49-53)."""
    return val is not None


def default(val: Any, d: Any) -> Any:
    """`val` unless it is None; then `d` (or `d()` if callable).

    Reference helpers.py:25-32.
    """
    if exists(val):
        return val
    return d() if callable(d) else d


def cast_tuple(val: Any, length: Optional[int] = None) -> tuple:
    """Casts input to a tuple, repeating scalars to `length`.

    Reference helpers.py:9-22.
    """
    if isinstance(val, list):
        val = tuple(val)
    output = val if isinstance(val, tuple) else ((val,) * default(length, 1))
    if exists(length):
        assert len(output) == length, f"tuple of length {len(output)} != {length}"
    return output


def identity(t, *args, **kwargs):
    return t


def maybe(fn: Callable) -> Callable:
    """Apply `fn` only when the input is not None (reference helpers.py:81-95)."""

    def inner(x):
        if not exists(x):
            return x
        return fn(x)

    return inner


def log(t: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Natural log with the input clamped to a minimum of `eps`.

    Reference helpers.py:74-78.
    """
    return jnp.log(jnp.clip(t, eps, None))


def extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep scalars and right-pad to `ndim` dims for broadcasting.

    `a` is a (T,) schedule buffer, `t` is (b,) integer timesteps; the result is
    shaped (b, 1, ..., 1) with `ndim` total dims.  Reference helpers.py:56-67
    (there the target shape is passed; here just its rank, which is all that
    is needed and keeps the function shape-polymorphic under jit).
    """
    out = jnp.take(a, t, axis=-1)
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))


def right_pad_dims_to(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Pad `t` with trailing singleton dims up to `x.ndim` (reference helpers.py:167-175)."""
    padding_dims = x.ndim - t.ndim
    if padding_dims <= 0:
        return t
    return t.reshape(*t.shape, *((1,) * padding_dims))


def normalize_neg_one_to_one(img: jnp.ndarray) -> jnp.ndarray:
    """[0, 1] -> [-1, 1] (reference helpers.py:105-110)."""
    return img * 2.0 - 1.0


def unnormalize_zero_to_one(normed_img: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] -> [0, 1] (reference helpers.py:178-183)."""
    return (normed_img + 1.0) * 0.5


def prob_mask_like(key: jax.Array, shape: Sequence[int], prob: float) -> jnp.ndarray:
    """Boolean mask with `prob` probability of True, from an explicit key.

    Reference helpers.py:121-135 (which draws from torch's implicit global
    RNG; here the key is explicit so the same key reproduces the same mask).
    The prob==0/1 fast paths keep those cases deterministic and trace-free.
    """
    if prob == 1:
        return jnp.ones(shape, dtype=jnp.bool_)
    elif prob == 0:
        return jnp.zeros(shape, dtype=jnp.bool_)
    return jax.random.uniform(key, shape) < prob


def abs_quantile_bisect(x: jnp.ndarray, q: float, iters: int = 22) -> jnp.ndarray:
    """Per-row quantile of ``|x|`` by CDF bisection — TPU-fast for huge rows.

    ``x`` (b, n) any float dtype; returns (b,) f32 ``s`` with
    ``mean(|x| <= s) >= q``, within ``max|x| / 2**iters`` of the smallest
    such value.  Exact sorting (what ``jnp.quantile`` lowers to) is the
    right call for small rows, but XLA:TPU sorts are slow at megapixel
    scale: the 1024px sampling stage spent 2.7 s of its 16.7 s device time
    in two f32[4, 3.1M] sorts (~27 ms per call, tools/cascade1024_bench.py
    --profile, 2026-08-17).  ``iters`` bandwidth-bound counting passes cost
    ~1.4 ms for the same shape — the comparisons re-fuse with the |x|
    compute, so no sorted copy is ever materialized.

    Differences vs the exact interpolated quantile are O(1/n) from the CDF
    definition plus the bisection resolution — used for the dynamic-
    thresholding clamp scale (reference Imagen.py:309-323), where s is a
    heuristic already clamped to >= 1.
    """
    ax = jnp.abs(x).astype(jnp.float32)
    hi = jnp.max(ax, axis=-1)
    lo = jnp.zeros_like(hi)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        done = jnp.mean((ax <= mid[:, None]).astype(jnp.float32), axis=-1) >= q
        return jnp.where(done, lo, mid), jnp.where(done, mid, hi)

    _, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return hi
