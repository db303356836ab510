"""Probe: does the reference's lowres noise-order quirk break SR sampling?

The reference NORMALIZES-then-NOISES the lowres conditioning image at train
time (Imagen.py:549,556) but NOISES-then-NORMALIZES at sample time
(Imagen.py:483 + :393): sample-time conditioning becomes
  sqrt(a)*x_norm - (1-sqrt(a)) + 2*sqrt(1-a)*eps
— double the trained noise amplitude plus a mean shift, far outside the
training distribution. This script evaluates the SR stage trained by
examples/train_sr_tpu.py under BOTH orderings on held-out ground truth and
prints PSNRs. Run after train_sr_tpu.py (reads examples/sr_demo/unet_*.ckpt).
"""
import json
import os
import sys

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
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "examples/sr_demo"
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
            os.path.join(out_dir, f"unet_{i}.ckpt"), imagen.params[f"unet_{i}"])

    pairs = [_draw_synthetic(999 + i, 64) for i in range(8)]
    gt64 = np.stack([img for img, _ in pairs])
    caps = [cap for _, cap in pairs]
    embeds, mask = t5_encode_text(caps, name="t5_small", max_length=8)
    gt32 = np.asarray(resize_image_to(jnp.asarray(gt64), 32))
    bicubic = np.asarray(resize_image_to(jnp.asarray(gt32), 64))

    sched = imagen.lowres_noise_schedule
    b = 8
    t = sched.get_times(b, 0.2)
    c01 = resize_image_to(jnp.asarray(gt32, jnp.float32), 64)
    key = jax.random.PRNGKey(11)
    key, aug_key, stage_key = jax.random.split(key, 3)
    eps = jax.random.normal(aug_key, c01.shape, jnp.float32)

    sample_fn = imagen._jitted_sample_stage(1, True, "ddim", 50)

    # (a) reference quirk order: noise in [0,1], sample_fn normalizes after
    c_quirk = sched.q_sample(x_start=c01, t=t, noise=eps)
    out_quirk = sample_fn(imagen.params["unet_1"], stage_key, embeds, mask,
                          jnp.float32(3.0), c_quirk, t)

    # (b) train-consistent order: normalize FIRST, then noise; pass the
    # inverse-normalized image so sample_fn's normalize reproduces c_norm
    c_norm = sched.q_sample(x_start=imagen.normalize_img(c01), t=t, noise=eps)
    c_fixed = imagen.unnormalize_img(c_norm)
    out_fixed = sample_fn(imagen.params["unet_1"], stage_key, embeds, mask,
                          jnp.float32(3.0), c_fixed, t)

    res = {
        "psnr_bicubic": psnr(bicubic, gt64),
        "psnr_sr_quirk_order": psnr(out_quirk, gt64),
        "psnr_sr_trainconsistent_order": psnr(out_fixed, gt64),
    }
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
