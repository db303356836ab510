"""Headline benchmark: guided denoise steps/sec on the flagship base-64px
U-Net (one step = pair-batched cond+uncond forward + posterior math, i.e. the
unit of reverse-diffusion work — the reference spends 2 sequential forwards
per step here, Imagen.py:404-415 + Unet.py:498-506).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: value / TORCH_CPU_BASELINE, where the baseline is the ACTUAL
PyTorch reference U-Net (same dim-128 Imagen-base topology, same batch 4,
same guided two-forward step via `forward_with_cond_scale`) measured on this
host's CPU: 0.15 steps/s (single core, torch 2.13, 2026-08-16; see
BASELINE.md — the reference publishes no numbers of its own, and its north
star asks for >5x PyTorch-CPU, i.e. vs_baseline >= 5).

Env knobs: BENCH_BATCH (default 4), BENCH_STEPS (default 30), BENCH_DTYPE
(bfloat16|float32, default bfloat16), MINIMAGEN_TPU_DISABLE_PALLAS=1 to
measure the plain-XLA attention path.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: repeat bench runs skip the (minutes-long under
# the remote-compile tunnel) XLA compilation
jax.config.update("jax_compilation_cache_dir", "/tmp/minimagen_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "4"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bfloat16") == "bfloat16" else jnp.float32

    from __graft_entry__ import _flagship_imagen
    from minimagen_tpu.parallel.mesh import cast_params

    imagen = _flagship_imagen(dtype=dtype)
    L = 64
    key = jax.random.PRNGKey(0)
    params = imagen.init_params(key, batch_size=2, text_len=L, stages=[0])["unet_0"]
    if os.environ.get("BENCH_PARAM_DTYPE", "bfloat16") == "bfloat16" and dtype == jnp.bfloat16:
        # serving-style bf16 weights: halves weight HBM reads per step
        params = cast_params(params, jnp.bfloat16)
    scheduler = imagen.noise_schedulers[0]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 64, 64, 3)), jnp.float32)
    text_embeds = jnp.asarray(rng.normal(size=(batch, L, 768)), jnp.float32)
    text_mask = jnp.ones((batch, L), jnp.bool_)

    @jax.jit
    def denoise_step(params, x, t, noise_key):
        mean, _, log_var = imagen._p_mean_variance(
            0, scheduler, params, x, t, text_embeds=text_embeds, text_mask=text_mask,
            lowres_cond_img=None, lowres_noise_times=None,
            cond_scale=jnp.float32(3.0), guided=True,
        )
        noise = jax.random.normal(noise_key, x.shape, x.dtype)
        return mean + jnp.exp(0.5 * log_var) * noise

    t = jnp.full((batch,), 500, jnp.int32)
    # warmup / compile; sync via host readback (block_until_ready does not
    # reliably wait for device compute through the remote tunnel)
    x1 = denoise_step(params, x, t, jax.random.PRNGKey(1))
    np.asarray(x1)

    start = time.perf_counter()
    xi = x
    for i in range(steps):
        xi = denoise_step(params, xi, t, jax.random.PRNGKey(i))
    np.asarray(xi)  # chained steps: readback forces all to complete
    elapsed = time.perf_counter() - start

    TORCH_CPU_BASELINE = 0.15  # measured reference rate on this host (see module docstring)

    steps_per_sec = steps / elapsed
    print(json.dumps({
        "metric": "base64px_guided_denoise_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / TORCH_CPU_BASELINE, 2),
    }))


if __name__ == "__main__":
    main()
