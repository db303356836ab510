"""Measure encoder-feature caching (sample(cache_interval=N)) on a TRAINED
model: wall time and output drift, full cascade, guided DDIM-50.

Caching reuses the U-Net stem+DOWN-path features across sampler steps
("Faster Diffusion", arXiv 2312.09608) — worthless to evaluate on random
weights, so this runs on the checkpoints written by examples/train_sr_tpu.py.

Usage: python tools/feature_cache_eval.py [ckpt_dir=examples/sr_demo]
Prints one JSON line: per-interval seconds/cascade and PSNR vs the uncached
output (drift) + vs ground-truth 64px (quality).
"""
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

from minimagen_tpu.data.dataset import _draw_synthetic
from minimagen_tpu.models.imagen import Imagen
from minimagen_tpu.models.t5 import t5_encode_text
from minimagen_tpu.models.unet import UnetConfig
from minimagen_tpu.ops.resize import resize_image_to
from minimagen_tpu.training import load_unet_checkpoint


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "examples/sr_demo"
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
    for i in range(2):
        imagen.params[f"unet_{i}"] = load_unet_checkpoint(
            os.path.join(ckpt, f"unet_{i}.ckpt"), imagen.params[f"unet_{i}"])

    pairs = [_draw_synthetic(999 + i, 64) for i in range(8)]
    gt64 = np.stack([p[0] for p in pairs])
    caps = [p[1] for p in pairs]
    embeds, mask = t5_encode_text(caps, name="t5_small", max_length=8)
    gt32 = resize_image_to(jnp.asarray(gt64, jnp.float32), 32)

    key = jax.random.PRNGKey(17)
    results = {}
    ref_out = None
    for interval in (None, 2, 3):
        def run():
            return imagen.super_resolve(
                gt32, stage=1, text_embeds=embeds, text_masks=mask,
                cond_scale=1.0, sampler="ddim", sample_steps=50, key=key,
                cache_interval=interval)

        out = np.asarray(run())  # compile + warm
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = np.asarray(run())
        dt = (time.perf_counter() - t0) / reps
        tag = f"cache{interval or 0}"
        results[f"{tag}_s"] = round(dt, 3)
        results[f"{tag}_psnr_vs_gt"] = round(psnr(out, gt64), 2)
        if ref_out is None:
            ref_out = out
        else:
            results[f"{tag}_psnr_vs_uncached"] = round(psnr(out, ref_out), 2)
    print(json.dumps({"metric": "sr_stage_encoder_cache_eval", **results}))


if __name__ == "__main__":
    main()
