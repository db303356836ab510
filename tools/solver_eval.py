"""Evaluate samplers/step budgets on a TRAINED SR demo checkpoint without
retraining.

Loads the `unet_{0,1}.ckpt` weights written by `examples/train_sr_tpu.py`
(same 2-stage 32->64 config) and reports held-out SR PSNR for arbitrary
(sampler, steps, start_noise_level) combos — the measurement harness behind
BASELINE.md's solver-quality table (DPM-Solver++(2M) vs DDIM).

    python tools/solver_eval.py --ckpt examples/sr_demo_solver \
        --configs ddim:50 dpmpp:25 dpmpp:25:0.2

Each config is `sampler:steps[:start_noise_level]`. Runs wherever the
checkpoint's graphs compile (TPU by default; JAX_PLATFORMS=cpu works at
this demo scale).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MINIMAGEN_TPU_T5_FALLBACK", "1")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/minimagen_tpu_jax_cache")

from minimagen_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()

from minimagen_tpu.data.dataset import _draw_synthetic
from minimagen_tpu.models.imagen import Imagen
from minimagen_tpu.models.t5 import t5_encode_text
from minimagen_tpu.models.unet import UnetConfig
from minimagen_tpu.ops.resize import resize_image_to
from minimagen_tpu.training import load_unet_checkpoint


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def build_imagen() -> Imagen:
    """The exact 2-stage config of examples/train_sr_tpu.py."""
    base = UnetConfig(dim=48, dim_mults=(1, 2, 3), num_resnet_blocks=2,
                      layer_attns=(False, True, True),
                      layer_cross_attns=(False, True, True), attn_heads=4)
    sr = UnetConfig(dim=48, dim_mults=(1, 2, 4), num_resnet_blocks=(2, 3, 4),
                    layer_attns=(False, False, True),
                    layer_cross_attns=(False, False, True), attn_heads=4,
                    memory_efficient=True)
    imagen = Imagen(unets=[base, sr], image_sizes=(32, 64), timesteps=1000,
                    cond_drop_prob=0.1, text_encoder_name="t5_small",
                    dtype=jnp.bfloat16)
    imagen.init_params(jax.random.PRNGKey(0), batch_size=2, text_len=8)
    return imagen


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="directory with unet_{0,1}.ckpt from train_sr_tpu.py")
    p.add_argument("--configs", nargs="+", default=["ddim:50", "dpmpp:25"],
                   help="sampler:steps[:start_noise_level][:grid] combos; "
                        "use '-' for no start level, grid in {time, lambda}")
    p.add_argument("--num-eval", type=int, default=8)
    p.add_argument("--out", default=None, help="optional JSON output path")
    args = p.parse_args()

    imagen = build_imagen()
    for i in range(2):
        imagen.params[f"unet_{i}"] = load_unet_checkpoint(
            os.path.join(args.ckpt, f"unet_{i}.ckpt"), imagen.params[f"unet_{i}"])

    pairs = [_draw_synthetic(999 + i, 64) for i in range(args.num_eval)]
    gt64 = np.stack([img for img, _ in pairs])
    caps = [cap for _, cap in pairs]
    embeds, mask = t5_encode_text(caps, name="t5_small", max_length=8)
    gt32 = np.asarray(resize_image_to(jnp.asarray(gt64), 32))

    rows = []
    for cfg in args.configs:
        parts = cfg.split(":")
        sampler, steps = parts[0], int(parts[1])
        level = (float(parts[2]) if len(parts) > 2 and parts[2] != "-" else None)
        grid = parts[3] if len(parts) > 3 else "time"
        out = np.asarray(imagen.super_resolve(
            jnp.asarray(gt32), stage=1, text_embeds=embeds, text_masks=mask,
            cond_scale=1.0, sampler=sampler, sample_steps=steps, grid=grid,
            start_noise_level=level, key=jax.random.PRNGKey(11)))
        rows.append({"sampler": sampler, "steps": steps, "grid": grid,
                     "mode": "full_reverse" if level is None else f"truncated@{level}",
                     "psnr_db": psnr(out, gt64)})
        print(json.dumps(rows[-1]), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
