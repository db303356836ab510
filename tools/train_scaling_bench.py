"""Train-step scaling bench: measure the two levers BASELINE.md names for
the flagship train step's 40% MFU roofline — global batch size and
bf16 first-moment Adam (`make_optimizer(mu_dtype=bfloat16)`) — as actual
device rates, not claims.

Method matches bench.py's train metric exactly (slope between two
jit-chained `lax.fori_loop` lengths = pure device rate; the sandbox tunnel
adds ~0.1-0.3 s per dispatch that the slope cancels), so rows are directly
comparable with BENCH_r0N's `train_steps_per_sec_batch8`.

Env: SCALE_CONFIGS="8,16,32,8:bf16" — comma-separated `batch[:bf16]` rows
(`:bf16` = Adam first moment in bfloat16; default f32 = reference
numerics). SCALE_STEPS chain length (default 48, like bench.py's 50: the
slope delta must dwarf the ~0.1-0.3 s/dispatch tunnel jitter — 12/36-step
chains give a >=0.5 s delta at batch 8). One JSON line per row;
each new (batch, mu_dtype) is a fresh XLA graph — budget a cold compile
(~15-30 min through the remote tunnel) per new row.

Reference anchor: the reference's train loop is a per-batch python loop at
whatever batch fits host RAM (/root/reference/minimagen/training.py:361-377);
batch-size scaling is the TPU-native production lever (HBM permits 32+ at
64px where the reference README demos batch 2-8).
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
    run(n_small)  # compile both chain lengths + warm
    run(n_big)
    t0 = time.perf_counter()
    run(n_small)
    t1 = time.perf_counter()
    run(n_big)
    t2 = time.perf_counter()
    return max(((t2 - t1) - (t1 - t0)) / (n_big - n_small), 1e-9)


def bench_row(batch: int, mu_dtype, steps: int):
    from __graft_entry__ import _flagship_imagen
    from minimagen_tpu.parallel.mesh import make_optimizer

    imagen = _flagship_imagen(dtype=jnp.bfloat16)
    L = 64
    imagen.init_params(jax.random.PRNGKey(0), batch_size=2, text_len=L,
                       stages=[0])
    loss_fn = imagen.stage_loss_fn(0)
    opt = make_optimizer(1e-4, mu_dtype=mu_dtype)
    params = imagen.params["unet_0"]
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (batch, 64, 64, 3)), jnp.float32)
    embeds = jnp.asarray(rng.normal(size=(batch, L, 768)), jnp.float32)
    mask = jnp.ones((batch, L), jnp.bool_)

    @partial(jax.jit, static_argnums=2)
    def chain(carry, key, n):
        def body(i, carry):
            params, opt_state = carry
            _, grads = jax.value_and_grad(loss_fn)(params, images, embeds,
                                                   mask, jax.random.fold_in(key, i))
            updates, opt_state = opt.update(grads, opt_state, params)
            import optax
            return optax.apply_updates(params, updates), opt_state
        return jax.lax.fori_loop(0, n, body, carry)

    def run(n):
        out = chain((params, opt_state), jax.random.PRNGKey(0), n)
        np.asarray(jax.tree_util.tree_leaves(out)[0])

    t0 = time.perf_counter()
    sec_per_step = _slope_time(run, max(steps // 4, 4), max(steps // 4, 4) * 3)
    total_s = time.perf_counter() - t0

    import optax

    def one_step(params, opt_state, key):
        _, grads = jax.value_and_grad(loss_fn)(params, images, embeds, mask, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    flops = 0.0
    try:
        cost = jax.jit(one_step).lower(params, opt_state,
                                       jax.random.PRNGKey(0)).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        pass
    mfu = flops / sec_per_step / (V5E_BF16_TFLOPS * 1e12) if flops else None
    row = {
        "metric": "flagship_base64_train_scaling",
        "batch": batch,
        "mu_dtype": "bfloat16" if mu_dtype == jnp.bfloat16 else "float32",
        "steps_per_sec": round(1.0 / sec_per_step, 3),
        "images_per_sec": round(batch / sec_per_step, 1),
        "ms_per_step": round(sec_per_step * 1e3, 3),
        "mfu_vs_197tflops": round(mfu, 4) if mfu else None,
        "method": "slope-timed jit-chained fori_loop (device rate)",
        "wall_s_incl_compile": round(total_s, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    steps = int(os.environ.get("SCALE_STEPS", "48"))
    configs = os.environ.get("SCALE_CONFIGS", "8,16,32,8:bf16")
    for spec in configs.split(","):
        spec = spec.strip()
        if not spec:
            continue
        if ":" in spec:
            b, md = spec.split(":")
            mu = jnp.bfloat16 if md in ("bf16", "bfloat16") else None
        else:
            b, mu = spec, None
        try:
            bench_row(int(b), mu, steps)
        except Exception as e:
            print(json.dumps({"metric": "flagship_base64_train_scaling",
                              "batch": int(b), "error": repr(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
