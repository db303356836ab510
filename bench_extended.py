"""Extended benchmarks beyond the driver headline (bench.py):

1. 64->256 two-stage guided cascade sampling latency per image (DDIM-50 on
   both stages) — the BASELINE.md north-star metric (< 1 s/image).
2. Training step throughput on the flagship base stage (fused jitted update,
   Adam + clip), comparable against the PyTorch-CPU reference loop.

Writes one JSON object per line. Heavy on cold compiles (remote-compile
tunnel); run with a generous timeout. Env: EXT_WHICH=cascade|train|all,
EXT_CACHE_INTERVAL=N for encoder-feature caching (0 = off; unset = 'auto',
the per-stage cost-model dispatch that is also sample()'s default).
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/minimagen_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_cascade():
    from __graft_entry__ import _flagship_imagen
    from minimagen_tpu.parallel.mesh import cast_params

    imagen = _flagship_imagen(dtype=jnp.bfloat16)
    L = 64
    params = imagen.init_params(jax.random.PRNGKey(0), batch_size=1, text_len=L)
    params = cast_params(params, jnp.bfloat16)
    imagen.params = params

    b = int(os.environ.get("EXT_BATCH", "4"))
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(rng.normal(size=(b, L, 768)), jnp.float32)
    mask = jnp.ones((b, L), jnp.bool_)

    # default 'auto': the per-stage cost model enables N=2 where it wins
    # (flagship stages) — matches sample()'s production default
    env = os.environ.get("EXT_CACHE_INTERVAL", "auto")
    cache_interval = "auto" if env == "auto" else (int(env) or None)
    # EXT_SAMPLE_STEPS: int or comma list for per-stage budgets ("50,20")
    steps_env = os.environ.get("EXT_SAMPLE_STEPS", "50")
    sample_steps = (tuple(int(s) for s in steps_env.split(","))
                    if "," in steps_env else int(steps_env))

    def run(key):
        return imagen.sample(text_embeds=embeds, text_masks=mask, cond_scale=3.0,
                             sampler="ddim", sample_steps=sample_steps, key=key,
                             cache_interval=cache_interval)

    t0 = time.perf_counter()
    out = run(jax.random.PRNGKey(0))
    np.asarray(out)  # host readback: true sync through the remote tunnel
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        out = run(jax.random.PRNGKey(i + 1))
        np.asarray(out)
    per_image = (time.perf_counter() - t0) / reps / b
    print(json.dumps({
        "metric": "cascade_64_to_256_ddim50_guided_sec_per_image",
        "value": round(per_image, 4), "unit": "s/image",
        "batch": b, "compile_s": round(compile_s, 1),
        "sample_steps": sample_steps,
        "cache_interval": cache_interval,
        "north_star": "< 1 s/image",
    }), flush=True)


def bench_train():
    from __graft_entry__ import _flagship_imagen
    from minimagen_tpu.parallel.mesh import (
        create_train_state, make_optimizer, make_train_step,
    )
    from minimagen_tpu.models.imagen import Imagen

    flag = _flagship_imagen(dtype=jnp.bfloat16)
    # base stage only (single-stage Imagen so the fused step covers one unet)
    imagen = Imagen(unets=[flag.unet_configs[0]], image_sizes=(64,), timesteps=1000,
                    cond_drop_prob=0.1, text_encoder_name="t5_base", dtype=jnp.bfloat16)
    imagen.init_params(jax.random.PRNGKey(0), batch_size=2, text_len=64)

    b = int(os.environ.get("EXT_TRAIN_BATCH", "8"))
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (b, 64, 64, 3)), jnp.float32),
        "encoding": jnp.asarray(rng.normal(size=(b, 64, 768)), jnp.float32),
        "mask": jnp.ones((b, 64), jnp.bool_),
    }
    opt = make_optimizer(1e-4)
    state = create_train_state(imagen.params, opt)
    step = make_train_step(imagen, opt)

    t0 = time.perf_counter()
    state, losses = step(state, batch, jax.random.PRNGKey(0))
    np.asarray(losses)  # host readback: true sync through the remote tunnel
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    reps = 10
    for i in range(reps):
        state, losses = step(state, batch, jax.random.PRNGKey(i))
    np.asarray(losses)  # state is chained through all reps
    sps = reps / (time.perf_counter() - t0)
    # METHODOLOGY: this is DISPATCH-INCLUSIVE wall time — one host->device
    # dispatch per step, each paying this sandbox's tunnel latency
    # (~0.1-0.3 s jitter/dispatch). bench.py's train metric slope-times a
    # jit-chained fori_loop instead (pure device rate, what a production
    # input pipeline achieves); the two are expected to differ — e.g.
    # round 2 measured 45.2 device-rate vs 37.2 wall-dispatch for the same
    # config (BASELINE.md "train-throughput methodology").
    print(json.dumps({
        "metric": "flagship_base64_train_steps_per_sec_per_chip",
        "value": round(sps, 3), "unit": "steps/s", "batch": b,
        "method": "wall-clock, dispatch-inclusive (per-step dispatch through the tunnel)",
        "compile_s": round(compile_s, 1),
        "north_star": "> 5x PyTorch-CPU reference",
    }), flush=True)


if __name__ == "__main__":
    which = os.environ.get("EXT_WHICH", "all")
    if which in ("train", "all"):
        bench_train()
    if which in ("cascade", "all"):
        bench_cascade()
