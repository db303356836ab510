"""GroupNorm+scale-shift+SiLU micro-bench at the flagship's real shapes.

Times the fused Pallas kernel (ops/group_norm.py) vs the plain-XLA path at
every (h, w, c) the flagship base U-Net hits (pair-batched CFG batch 8,
RESNET_GROUPS=8), forward and forward+backward. Device-busy timing via
xplane traces (wall clock through the tunnel is garbage — CLAUDE.md).

Usage: python tools/gn_bench.py [--reps 30] [--fwd-only]
Prints a markdown table + one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/minimagen_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from attn_bench import _device_busy  # noqa: E402  (same timing harness)

from minimagen_tpu.ops import group_norm as gn  # noqa: E402

GROUPS = 8


def _time_fwd(fn, x, gamma, beta, ss_s, ss_t, reps):
    @partial(jax.jit, static_argnums=5)
    def run(x, gamma, beta, ss_s, ss_t, n):
        def body(_, xi):
            return fn(xi, gamma, beta, (ss_s, ss_t)).astype(xi.dtype)
        return jax.lax.fori_loop(0, n, body, x)

    return _device_busy(lambda: np.asarray(run(x, gamma, beta, ss_s, ss_t, reps)), reps)


def _time_fbwd(fn, x, gamma, beta, ss_s, ss_t, reps):
    def loss(x, gamma, beta, ss_s, ss_t):
        return jnp.sum(fn(x, gamma, beta, (ss_s, ss_t)).astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(0, 1, 2, 3, 4))

    @partial(jax.jit, static_argnums=5)
    def run(x, gamma, beta, ss_s, ss_t, n):
        def body(_, carry):
            x, gamma, beta = carry
            dx, dg, db, _, _ = grad(x, gamma, beta, ss_s, ss_t)
            return (x + 1e-6 * dx.astype(x.dtype), gamma + 1e-6 * dg, beta + 1e-6 * db)
        return jax.lax.fori_loop(0, n, body, (x, gamma, beta))

    return _device_busy(
        lambda: jax.tree_util.tree_map(np.asarray, run(x, gamma, beta, ss_s, ss_t, reps)),
        reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    # the kernel is off by default (measured slower than XLA — module
    # docstring); force it on here so the bench keeps tracking it
    os.environ["MINIMAGEN_TPU_GN_FUSED"] = "1"

    def fused(x, gamma, beta, ss):
        return gn.group_norm_silu(x, gamma, beta, groups=GROUPS, scale_shift=ss, silu=True)

    def xla(x, gamma, beta, ss):
        return gn._xla_forward(x, gamma, beta, ss, True, groups=GROUPS, eps=1e-5)

    b = 8  # pair-batched CFG at bench batch 4
    shapes = [(64, 64, 128), (32, 32, 256), (16, 16, 384), (8, 8, 512)]
    rng = np.random.default_rng(0)
    rows = []
    for h, w, c in shapes:
        x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.bfloat16)
        gamma = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
        beta = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
        ss_s = jnp.asarray(rng.normal(size=(b, 1, 1, c)) * 0.2, jnp.float32)
        ss_t = jnp.asarray(rng.normal(size=(b, 1, 1, c)) * 0.2, jnp.float32)

        t_xla = _time_fwd(xla, x, gamma, beta, ss_s, ss_t, args.reps)
        t_pls = _time_fwd(fused, x, gamma, beta, ss_s, ss_t, args.reps)
        slab_mb = h * w * c * 4 / 2**20
        row = {
            "shape": f"{h}x{w}x{c}", "slab_f32_mb": round(slab_mb, 2),
            "xla_us": round(t_xla * 1e6, 1), "pallas_us": round(t_pls * 1e6, 1),
            "speedup": round(t_xla / t_pls, 2),
            "pallas_gbps": round(2 * b * h * w * c * 2 / t_pls / 1e9, 0),
        }
        if not args.fwd_only:
            breps = max(args.reps // 3, 5)
            row["xla_fbwd_us"] = round(_time_fbwd(xla, x, gamma, beta, ss_s, ss_t, breps) * 1e6, 1)
            row["pallas_fbwd_us"] = round(_time_fbwd(fused, x, gamma, beta, ss_s, ss_t, breps) * 1e6, 1)
            row["fbwd_speedup"] = round(row["xla_fbwd_us"] / row["pallas_fbwd_us"], 2)
        rows.append(row)
        print(row, file=sys.stderr)

    cols = list(rows[0].keys())
    print("| " + " | ".join(cols) + " |", file=sys.stderr)
    print("|" + "---|" * len(cols), file=sys.stderr)
    for r in rows:
        print("| " + " | ".join(str(r[c]) for c in cols) + " |", file=sys.stderr)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
