"""Three-stage 64->256->1024 flagship cascade benchmark (BASELINE.json
config #5 stretch; VERDICT round-1 item 3).

Stage design is TPU-first, mirroring the real Imagen system's choices rather
than blindly scaling the reference's `Super` preset (Unet.py:667-692): the
256->1024 SR U-Net drops self-attention entirely (16384 spatial tokens at its
deepest level would cost ~1 PFLOP per CFG step; the Imagen paper's 1024 model
likewise removes self-attention) and keeps cross-attention only at the
deepest resolution, where the short text KV routes to XLA's fused path.
`memory_efficient=True` pre-downsamples before the heavy blocks so the
1024px activations stay thin.

Usage: python tools/cascade1024_bench.py [--steps 50] [--batch 1]
Prints one JSON line: s/image, per-stage seconds, HBM peak.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MINIMAGEN_TPU_T5_FALLBACK", "1")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/minimagen_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_imagen(dtype=jnp.bfloat16):
    from minimagen_tpu.models.imagen import Imagen
    from minimagen_tpu.models.unet import UnetConfig

    base = UnetConfig(
        dim=128, dim_mults=(1, 2, 3, 4), num_resnet_blocks=3,
        layer_attns=(False, True, True, True), layer_cross_attns=(False, True, True, True),
        memory_efficient=False, attend_at_middle=True,
    )
    sr1 = UnetConfig(
        dim=64, dim_mults=(1, 2, 4, 8), num_resnet_blocks=(2, 4, 8, 8),
        layer_attns=(False, False, False, True), layer_cross_attns=(False, False, False, True),
        memory_efficient=True,
    )
    sr2 = UnetConfig(
        dim=64, dim_mults=(1, 2, 4, 8), num_resnet_blocks=(2, 4, 8, 8),
        layer_attns=False,                      # no self-attn at 1024px (see module docstring)
        layer_cross_attns=(False, False, False, True),
        memory_efficient=True, attend_at_middle=False,
    )
    return Imagen(
        unets=[base, sr1, sr2], image_sizes=(64, 256, 1024), timesteps=1000,
        cond_drop_prob=0.1, text_encoder_name="t5_large", text_embed_dim=1024,
        dtype=dtype,
    )


def _stage_steps(steps, stage):
    return steps[stage] if isinstance(steps, tuple) else steps


def _cache_arg(v):
    return v if v == "auto" else (int(v) or None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", default=50,
                    type=lambda v: (tuple(int(x) for x in v.split(","))
                                    if "," in str(v) else int(v)),
                    help="DDIM steps: int or per-stage comma list '50,30,20'")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--cache-interval", type=_cache_arg, default="auto",
                    help="encoder-feature caching (Faster Diffusion): int, "
                         "0=off, or 'auto' (per-stage cost model; default)")
    ap.add_argument("--profile", action="store_true",
                    help="also capture an xplane trace of the 1024px stage "
                         "alone and print its top-op table (VERDICT r3 #3)")
    args = ap.parse_args()

    imagen = build_imagen()
    L = 64
    imagen.init_params(jax.random.PRNGKey(0), batch_size=1, text_len=L)
    from minimagen_tpu.parallel.mesh import cast_params

    imagen.params = cast_params(imagen.params, jnp.bfloat16)  # serving weights

    rng = np.random.default_rng(0)
    embeds = jnp.asarray(rng.normal(size=(args.batch, L, 1024)), jnp.float32)
    mask = jnp.ones((args.batch, L), jnp.bool_)

    def run():
        t_stage = []
        outs = imagen.sample(text_embeds=embeds, text_masks=mask, cond_scale=3.0,
                             sampler="ddim", sample_steps=args.steps,
                             key=jax.random.PRNGKey(0), return_all_stage_outputs=True,
                             cache_interval=args.cache_interval)
        np.asarray(outs[-1])
        return outs

    # per-stage timing: time each stage's jitted fn directly like sample() does
    t0 = time.perf_counter()
    outs = run()  # compile + warm (cold: many minutes through the tunnel)
    compile_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    outs = run()
    total = time.perf_counter() - t0

    shapes = [tuple(o.shape) for o in outs]
    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        mem = {k: stats[k] for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
               if k in stats}
    except Exception:
        pass
    if not mem:  # axon hides memory_stats; use XLA's compile-time analysis
        for s in range(3):
            ma = imagen.stage_memory_analysis(
                s, batch_size=args.batch, text_len=L, cond_scale=3.0,
                sampler="ddim", sample_steps=_stage_steps(args.steps, s))
            if ma:
                mem[f"stage{s}_temp_mb"] = round(ma.get("temp_size_in_bytes", 0) / 2**20, 1)
                mem[f"stage{s}_args_mb"] = round(ma.get("argument_size_in_bytes", 0) / 2**20, 1)

    stage2 = {}
    if args.profile:
        # device-time breakdown of the 1024px stage ALONE: run just its
        # jitted stage fn (synthetic 1024px conditioning) under a trace
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from profile_tpu import summarize_xplane, _find_xplane  # noqa: E402

        from minimagen_tpu.utils.profiling import trace

        b = args.batch
        lowres = jnp.asarray(rng.uniform(0, 1, (b, 1024, 1024, 3)), jnp.float32)
        lr_t = imagen.lowres_noise_schedule.get_times(b, 0.2)
        cache2 = imagen._resolve_cache_interval(args.cache_interval, 2, 2 * b, L)
        fn = imagen._jitted_sample_stage(2, True, "ddim", _stage_steps(args.steps, 2),
                                         cache_interval=cache2)
        out = fn(imagen.params["unet_2"], jax.random.PRNGKey(0), embeds, mask,
                 jnp.float32(3.0), lowres, lr_t)
        np.asarray(out)  # warm (cache-hit from the full-cascade run)
        logdir = "/tmp/cascade1024_stage2_trace"
        with trace(logdir):
            out = fn(imagen.params["unet_2"], jax.random.PRNGKey(1), embeds, mask,
                     jnp.float32(3.0), lowres, lr_t)
            np.asarray(out)
        sync_s, async_s, top_ops, cats = summarize_xplane(_find_xplane(logdir))
        stage2 = {
            "stage2_device_busy_s": round(sync_s, 3),
            "stage2_device_busy_s_per_image": round(sync_s / b, 3),
            "stage2_top_categories": {k: round(v, 4) for k, v in cats[:8]},
            "stage2_top_ops": [(n[:90], round(v * 1e3, 3)) for n, v in top_ops[:10]],
        }
        print("stage2 (1024px) top ops (ms):", file=sys.stderr)
        for n, v in top_ops[:10]:
            print(f"  {v * 1e3:9.3f}  {n[:110]}", file=sys.stderr)

    print(json.dumps({
        "metric": "cascade_64_256_1024_ddim%s_s_per_image" % (
            "-".join(map(str, args.steps)) if isinstance(args.steps, tuple)
            else args.steps),
        "value": round(total / args.batch, 3),
        "unit": "s/image",
        "batch": args.batch,
        "cache_interval": args.cache_interval,
        "stage_output_shapes": shapes,
        "first_run_wall_s_incl_compile": round(compile_wall, 1),
        "hbm": mem,
        **stage2,
    }))


if __name__ == "__main__":
    main()
