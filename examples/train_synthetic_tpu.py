"""Reproducible convergence demo: train a small base U-Net on the offline
synthetic captioned-shapes dataset and sample conditioned images.

Runs on one TPU chip in a few minutes (or CPU, slowly):

    python examples/train_synthetic_tpu.py --steps 3000 --out demo_out

Writes loss trajectory, a checkpoint, and DDIM-sampled PNGs per caption.
"""
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

from minimagen_tpu.data.collate import DataLoader, MinimagenCollator
from minimagen_tpu.data.dataset import SyntheticCaptionedImages
from minimagen_tpu.models.imagen import Imagen
from minimagen_tpu.models.unet import UnetConfig
from minimagen_tpu.parallel.mesh import create_train_state, make_optimizer, make_train_step
from minimagen_tpu.training import save_unet_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--out", type=str, default="synthetic_demo")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    cfg = UnetConfig(dim=args.dim, dim_mults=(1, 2, 3), num_resnet_blocks=2,
                     layer_attns=(False, True, True), layer_cross_attns=(False, True, True),
                     attn_heads=4)
    imagen = Imagen(unets=[cfg], image_sizes=(args.size,), timesteps=1000,
                    cond_drop_prob=0.1, text_encoder_name="t5_small", dtype=jnp.bfloat16)
    imagen.init_params(jax.random.PRNGKey(0), batch_size=2, text_len=8)

    ds = SyntheticCaptionedImages(num_items=256, side_length=args.size,
                                  encoder_name="t5_small", max_length=8)
    dl = DataLoader(ds, batch_size=args.batch, shuffle=True, drop_last=True,
                    collate_fn=MinimagenCollator(max_length=8))
    opt = make_optimizer(args.lr)
    state = create_train_state(imagen.params, opt)
    step = make_train_step(imagen, opt)

    losses = []
    t0 = time.time()
    steps = 0
    while steps < args.steps:
        for batch in dl:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, l = step(state, batch, jax.random.PRNGKey(0))
            losses.append(float(l[0]))
            steps += 1
            if steps % 500 == 0:
                print(f"step {steps}: loss {losses[-1]:.4f} ({time.time() - t0:.0f}s)", flush=True)
            if steps >= args.steps:
                break

    imagen.params = jax.device_get(state.params)
    save_unet_checkpoint(os.path.join(args.out, "unet_0.ckpt"), imagen.params["unet_0"])
    with open(os.path.join(args.out, "losses.json"), "w") as f:
        json.dump({"losses": losses[::10], "steps": steps,
                   "wall_s": time.time() - t0}, f)

    captions = ["a red square", "a blue circle", "a green square", "a yellow circle"]
    from PIL import Image

    for tag, kw in [("cfg3", dict(cond_scale=3.0)), ("cfg1", dict(cond_scale=1.0))]:
        arrs = np.asarray(imagen.sample(texts=captions, sampler="ddim", sample_steps=50,
                                        key=jax.random.PRNGKey(7), **kw))
        for cap, a in zip(captions, arrs):
            Image.fromarray((np.clip(a, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(args.out, f"{tag}_{cap.replace(' ', '_')}.png"))
    print(f"done: checkpoint + samples in {args.out}/")


if __name__ == "__main__":
    main()
