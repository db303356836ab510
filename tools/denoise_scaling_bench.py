"""Serving-throughput scaling bench: guided denoise step rate vs batch.

The headline bench (bench.py) fixes batch 4; production serving picks the
batch that maximizes images/s under a latency budget. This measures the
flagship guided denoise step (pair-batched CFG, bf16) at a sweep of batch
sizes with bench.py's exact methodology (slope-timed jit-chained
`lax.fori_loop` = pure device rate).

Env: DENOISE_BATCHES="4,8,16,32" (each new batch is a fresh XLA graph —
budget a cold compile through the remote tunnel), DENOISE_STEPS chain
length (default 50). One JSON line per row.

Reference anchor: the reference serves one image per 2 sequential U-Net
forwards per timestep with no batching lever at all
(/root/reference/minimagen/Imagen.py:404, Unet.py:498-506).
"""
import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/minimagen_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_TFLOPS = 197.0


def _slope_time(run, n_small: int, n_big: int) -> float:
    run(n_small)
    run(n_big)
    t0 = time.perf_counter()
    run(n_small)
    t1 = time.perf_counter()
    run(n_big)
    t2 = time.perf_counter()
    return max(((t2 - t1) - (t1 - t0)) / (n_big - n_small), 1e-9)


def bench_row(batch: int, steps: int):
    from __graft_entry__ import _flagship_imagen
    from minimagen_tpu.parallel.mesh import cast_params

    imagen = _flagship_imagen(dtype=jnp.bfloat16)
    L = 64
    params = imagen.init_params(jax.random.PRNGKey(0), batch_size=2,
                                text_len=L, stages=[0])["unet_0"]
    params = cast_params(params, jnp.bfloat16)
    scheduler = imagen.noise_schedulers[0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 64, 64, 3)), jnp.float32)
    text_embeds = jnp.asarray(rng.normal(size=(batch, L, 768)), jnp.float32)
    text_mask = jnp.ones((batch, L), jnp.bool_)
    t = jnp.full((batch,), 500, jnp.int32)

    def one_step(params, x, key):
        mean, _, log_var = imagen._p_mean_variance(
            0, scheduler, params, x, t, text_embeds=text_embeds,
            text_mask=text_mask, lowres_cond_img=None, lowres_noise_times=None,
            cond_scale=jnp.float32(3.0), guided=True,
        )
        noise = jax.random.normal(key, x.shape, x.dtype)
        return mean + jnp.exp(0.5 * log_var) * noise

    @partial(jax.jit, static_argnums=2)
    def chain(params, x, n):
        def body(i, x):
            return one_step(params, x, jax.random.fold_in(jax.random.PRNGKey(0), i))
        return jax.lax.fori_loop(0, n, body, x)

    t0 = time.perf_counter()
    sec_per_step = _slope_time(lambda n: np.asarray(chain(params, x, n)),
                               steps, steps * 3)
    total_s = time.perf_counter() - t0

    flops = 0.0
    try:
        cost = jax.jit(one_step).lower(params, x,
                                       jax.random.PRNGKey(0)).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        pass
    mfu = flops / sec_per_step / (V5E_BF16_TFLOPS * 1e12) if flops else None
    row = {
        "metric": "base64px_guided_denoise_scaling",
        "batch": batch,
        "steps_per_sec": round(1.0 / sec_per_step, 3),
        "images_ddim50_per_sec": round(batch / (50 * sec_per_step), 3),
        "ms_per_step": round(sec_per_step * 1e3, 3),
        "mfu_vs_197tflops": round(mfu, 4) if mfu else None,
        "method": "slope-timed jit-chained fori_loop (device rate)",
        "wall_s_incl_compile": round(total_s, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    steps = int(os.environ.get("DENOISE_STEPS", "50"))
    for spec in os.environ.get("DENOISE_BATCHES", "4,8,16,32").split(","):
        spec = spec.strip()
        if not spec:
            continue
        try:
            bench_row(int(spec), steps)
        except Exception as e:
            print(json.dumps({"metric": "base64px_guided_denoise_scaling",
                              "batch": int(spec), "error": repr(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
