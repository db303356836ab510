"""CrossEmbed stem micro-bench: reference parallel convs vs the fused
space-to-depth formulation (ops/stem_conv.py), at the shapes the flagship
hits (base 64px cin=3, SR 256px cin=6; pair-batched CFG batch 8).

Usage: python tools/stem_bench.py [--reps 30] [--fwd-only]
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

from attn_bench import _device_busy  # noqa: E402

from minimagen_tpu.ops import stem_conv as sc  # noqa: E402


def _weights(cin, dim_out, dtype, seed=0):
    ks = (3, 7, 15)
    dim_scales = [dim_out // 2, dim_out // 4, dim_out - dim_out // 2 - dim_out // 4]
    rng = np.random.default_rng(seed)
    kernels = [jnp.asarray(rng.normal(size=(k, k, cin, d)) * 0.1, dtype)
               for k, d in zip(ks, dim_scales)]
    biases = [jnp.asarray(rng.normal(size=(d,)) * 0.1, dtype) for d in dim_scales]
    return kernels, biases


def _time_fwd(fn, x, kernels, biases, reps):
    @partial(jax.jit, static_argnums=3)
    def run(x, kernels, biases, n):
        def body(_, xi):
            y = fn(xi, kernels, biases)
            # feed ALL output channels back in so nothing can be hoisted or
            # dead-code-eliminated (a y[..., :cin] slice lets XLA delete the
            # convs not contributing to the first cin channels!)
            return xi + 1e-6 * jnp.mean(y, axis=-1, keepdims=True).astype(xi.dtype)
        return jax.lax.fori_loop(0, n, body, x)

    return _device_busy(lambda: np.asarray(run(x, kernels, biases, reps)), reps)


def _time_fbwd(fn, x, kernels, biases, reps):
    def loss(x, kernels, biases):
        return jnp.sum(fn(x, kernels, biases).astype(jnp.float32) ** 2)

    grad = jax.grad(loss, argnums=(1, 2))

    @partial(jax.jit, static_argnums=3)
    def run(x, kernels, biases, n):
        def body(_, kb):
            kernels, biases = kb
            dk, db = grad(x, kernels, biases)
            upd = lambda a, g: a + 1e-6 * g.astype(a.dtype)  # noqa: E731
            return (jax.tree_util.tree_map(upd, kernels, dk),
                    jax.tree_util.tree_map(upd, biases, db))
        return jax.lax.fori_loop(0, n, body, (kernels, biases))

    return _device_busy(
        lambda: jax.tree_util.tree_map(np.asarray, run(x, kernels, biases, reps)), reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    dtype = jnp.bfloat16
    ref = partial(sc.cross_embed_reference, stride=1, dtype=dtype)
    fused = partial(sc.cross_embed_fused, dtype=dtype)

    rows = []
    rng = np.random.default_rng(1)
    for label, b, hw, cin, dim in [("base 64px", 8, 64, 3, 128),
                                   ("SR 256px", 8, 256, 6, 128)]:
        kernels, biases = _weights(cin, dim, dtype)
        x = jnp.asarray(rng.normal(size=(b, hw, hw, cin)), dtype)
        t_ref = _time_fwd(ref, x, kernels, biases, args.reps)
        t_fus = _time_fwd(fused, x, kernels, biases, args.reps)
        flops = 2 * b * hw * hw * sum(k.shape[0] ** 2 * cin * k.shape[-1] for k in kernels)
        row = {
            "shape": label, "ref_us": round(t_ref * 1e6, 1),
            "fused_us": round(t_fus * 1e6, 1),
            "speedup": round(t_ref / t_fus, 2),
            "fused_tflops": round(flops / t_fus / 1e12, 2),
        }
        if not args.fwd_only:
            breps = max(args.reps // 3, 5)
            row["ref_fbwd_us"] = round(_time_fbwd(ref, x, kernels, biases, breps) * 1e6, 1)
            row["fused_fbwd_us"] = round(_time_fbwd(fused, x, kernels, biases, breps) * 1e6, 1)
            row["fbwd_speedup"] = round(row["ref_fbwd_us"] / row["fused_fbwd_us"], 2)
            # the shipped dispatch: reference fwd + custom VJP through the
            # fused formulation (the fused forward inside the VJP is DCE'd —
            # the conv is linear in w, so its output is not a residual)
            os.environ["MINIMAGEN_TPU_STEM_FUSED"] = "1"
            disp = partial(sc.cross_embed_conv, stride=1, dtype=dtype)
            row["disp_fbwd_us"] = round(_time_fbwd(disp, x, kernels, biases, breps) * 1e6, 1)
            row["disp_fbwd_speedup"] = round(row["ref_fbwd_us"] / row["disp_fbwd_us"], 2)
            del os.environ["MINIMAGEN_TPU_STEM_FUSED"]
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
