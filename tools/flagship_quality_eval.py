"""Production-lever validation on TRAINED flagship weights (round-3 VERDICT
next #6): the serving recipes stop resting on dim-48 toys.

Loads the 287M-param cascade trained by examples/train_flagship_tpu.py and
measures, on the real weights:

  1. sampler ddim-vs-dpmpp at 10/20/50 steps on the 'lambda' grid
     (caption-color correspondence metric + wall time)
  2. encoder-feature caching: cache_interval None / 2 / 'auto' — PSNR drift
     vs exact at the same key + wall
  3. per-stage step budgets: sample_steps (50,50) vs (50,20) — wall + quality
  4. SR fidelity: 64->256 super_resolve PSNR vs procedural ground truth

Writes PNGs + metrics JSON under <ckpt_dir>/eval/; the summary table goes to
BASELINE.md.

Usage:  python tools/flagship_quality_eval.py --ckpt examples/flagship_r4 \
            [--which all|solver|cache|budget|sr] [--ema]
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

from minimagen_tpu.utils.platform import respect_jax_platforms_env

respect_jax_platforms_env()  # JAX_PLATFORMS=cpu for --tiny smoke runs
jax.config.update("jax_compilation_cache_dir", "/tmp/minimagen_tpu_jax_cache")

from minimagen_tpu.data.dataset import _SYNTH_COLORS, _draw_synthetic
from minimagen_tpu.models.t5 import t5_encode_text
from minimagen_tpu.training import load_unet_checkpoint

CAPTIONS = [f"a {c} {s}" for c in ("red", "green", "blue", "yellow")
            for s in ("square", "circle")]


def load_flagship(ckpt_dir: str, tag: str = "latest", ema: bool = True,
                  tiny: bool = False):
    if tiny:  # dim-16 stand-in written by train_flagship_tpu.py --tiny:
        # CPU smoke of the eval mechanics, not a quality measurement
        from minimagen_tpu.models.imagen import Imagen
        from minimagen_tpu.models.unet import BaseTest, SuperTest

        imagen = Imagen(unets=[BaseTest(), SuperTest()], image_sizes=(8, 16),
                        timesteps=50, cond_drop_prob=0.1,
                        text_encoder_name="t5_small")
    else:
        from __graft_entry__ import _flagship_imagen

        imagen = _flagship_imagen()
    imagen.init_params(jax.random.PRNGKey(0), batch_size=1, text_len=16)
    suffix = "_ema" if ema else ""
    for i in range(imagen.num_unets):
        path = os.path.join(ckpt_dir, f"unet_{i}_{tag}{suffix}.ckpt")
        imagen.params[f"unet_{i}"] = load_unet_checkpoint(
            path, imagen.params[f"unet_{i}"])
    return imagen


def encode(captions, name="t5_base", max_length=16):
    e, m = t5_encode_text(captions, name, max_length)
    return jnp.asarray(e), jnp.asarray(m)


def _timesteps(imagen):
    return imagen.noise_schedulers[0].num_timesteps


def color_metric(images: np.ndarray, captions) -> float:
    """Caption-color correspondence: mean L2 distance between the generated
    shape's color and the caption's color, in [0,1] RGB (lower is better;
    a random palette color averages ~0.55). Shape pixels = far from the
    0.92-gray background."""
    dists = []
    for img, cap in zip(images, captions):
        target = np.array(_SYNTH_COLORS[cap.split()[1]], np.float32)
        bg = np.abs(img - 0.92).max(axis=-1)
        mask = bg > 0.25
        if mask.sum() < 20:  # no shape found: max penalty
            dists.append(1.0)
            continue
        mean_color = img[mask].mean(axis=0)
        dists.append(float(np.linalg.norm(mean_color - target)))
    return float(np.mean(dists))


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 99.0 if mse == 0 else 10.0 * np.log10(1.0 / mse)


def save_png(path, img):
    from PIL import Image

    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def timed_sample(imagen, embeds, masks, key, **kw):
    # warm (compile) then measure via host readback (tunnel-safe sync)
    out = imagen.sample(text_embeds=embeds, text_masks=masks, cond_scale=3.0,
                        key=key, **kw)
    np.asarray(out)
    t0 = time.time()
    out = imagen.sample(text_embeds=embeds, text_masks=masks, cond_scale=3.0,
                        key=key, **kw)
    out = np.asarray(out)
    return out, time.time() - t0


def base_only(imagen):
    """A 1-stage view of the flagship (base U-Net at 64px): solver-quality
    comparisons live in the base stage, and 64px sample graphs compile ~5x
    faster through the tunnel than the 256px SR stage."""
    from minimagen_tpu.models.imagen import Imagen

    view = Imagen(unets=[imagen.unet_configs[0]],
                  image_sizes=(imagen.image_sizes[0],),
                  timesteps=_timesteps(imagen), cond_drop_prob=0.1,
                  text_encoder_name=imagen.text_encoder_name,
                  dtype=imagen.dtype)
    view.params = {"unet_0": imagen.params["unet_0"]}
    return view


def eval_solver(imagen, embeds, masks, outdir, results):
    """ddim vs dpmpp vs unipc at 10/20/50 on the lambda grid, base stage (64px)."""
    key = jax.random.PRNGKey(7)
    base = base_only(imagen)
    for sampler in ("ddim", "dpmpp", "unipc"):
        for steps in (10, 20, 50):
            out, wall = timed_sample(base, embeds, masks, key,
                                     sampler=sampler, sample_steps=steps,
                                     grid="lambda", cache_interval=None)
            m = color_metric(out, CAPTIONS)
            results[f"solver/{sampler}-{steps}@lambda(base64)"] = {
                "color_dist": round(m, 4),
                "wall_s_batch8": round(wall, 3)}
            save_png(os.path.join(outdir, f"{sampler}{steps}_lambda.png"),
                     np.concatenate(list(out[:4]), axis=1))
            print(f"{sampler}-{steps} lambda: color {m:.4f}, {wall:.2f}s", flush=True)


def eval_cache(imagen, embeds, masks, outdir, results):
    key = jax.random.PRNGKey(11)
    exact, wall_exact = timed_sample(imagen, embeds, masks, key, sampler="ddim",
                                     sample_steps=50, cache_interval=None)
    for mode in (2, "auto"):
        out, wall = timed_sample(imagen, embeds, masks, key, sampler="ddim",
                                 sample_steps=50, cache_interval=mode)
        results[f"cache/{mode}"] = {
            "psnr_vs_exact_db": round(psnr(out, exact), 2),
            "wall_s_batch8": round(wall, 3),
            "exact_wall_s": round(wall_exact, 3),
            "color_dist": round(color_metric(out, CAPTIONS), 4)}
        print(f"cache {mode}: {results[f'cache/{mode}']}", flush=True)
    results["cache/exact"] = {"wall_s_batch8": round(wall_exact, 3),
                              "color_dist": round(color_metric(exact, CAPTIONS), 4)}
    save_png(os.path.join(outdir, "cache_exact.png"),
             np.concatenate(list(exact[:4]), axis=1))


def eval_budget(imagen, embeds, masks, outdir, results):
    key = jax.random.PRNGKey(13)
    for budget in ((50, 50), (50, 20)):
        out, wall = timed_sample(imagen, embeds, masks, key, sampler="ddim",
                                 sample_steps=budget, cache_interval=None)
        results[f"budget/{budget[0]}-{budget[1]}"] = {
            "wall_s_batch8": round(wall, 3),
            "color_dist": round(color_metric(out, CAPTIONS), 4)}
        save_png(os.path.join(outdir, f"budget_{budget[0]}_{budget[1]}.png"),
                 np.concatenate(list(out[:4]), axis=1))
        print(f"budget {budget}: {results[f'budget/{budget[0]}-{budget[1]}']}", flush=True)


def eval_trunc(imagen, embeds, masks, outdir, results):
    """Truncated-SR cascade serving (round 4, sample(sr_start_noise_levels=...)):
    the SR stage refines the base output instead of full-reversing from
    noise — the serving recipe that makes 30k-step weights usable at 256px."""
    key = jax.random.PRNGKey(17)
    for level in (0.2, 0.4):
        out, wall = timed_sample(imagen, embeds, masks, key, sampler="ddim",
                                 sample_steps=50, cache_interval=None,
                                 sr_start_noise_levels=level)
        m = color_metric(out, CAPTIONS)
        results[f"trunc/sr{level}"] = {
            "color_dist": round(m, 4), "wall_s_batch8": round(wall, 3)}
        save_png(os.path.join(outdir, f"cascade_trunc_{level}.png"),
                 np.concatenate(list(out[:4]), axis=1))
        print(f"trunc {level}: color {m:.4f}, {wall:.2f}s", flush=True)


def eval_sr(imagen, outdir, results):
    """64->256 super_resolve PSNR vs procedural 256px ground truth."""
    from minimagen_tpu.ops.resize import resize_image_to

    idxs = [0, 1, 7, 13]
    hi, lo = imagen.image_sizes[-1], imagen.image_sizes[-2]
    gt, caps = zip(*[_draw_synthetic(i, hi) for i in idxs])
    gt = np.stack(gt)
    embeds, masks = encode(list(caps), imagen.text_encoder_name)
    low = resize_image_to(jnp.asarray(gt), lo)
    for snl in (0.2, 0.4):
        out = imagen.super_resolve(low, stage=imagen.num_unets - 1,
                                   text_embeds=embeds,
                                   text_masks=masks, cond_scale=3.0,
                                   sampler="ddim", sample_steps=50,
                                   start_noise_level=snl,
                                   key=jax.random.PRNGKey(3))
        out = np.asarray(out)
        p = psnr(out, gt)
        bicubic = psnr(np.asarray(resize_image_to(low, hi)), gt)
        results[f"sr/start{snl}"] = {"psnr_db": round(p, 2),
                                     "bicubic_baseline_db": round(bicubic, 2)}
        save_png(os.path.join(outdir, f"sr_{snl}.png"),
                 np.concatenate(list(out), axis=1))
        print(f"SR start={snl}: {p:.2f} dB (bicubic {bicubic:.2f})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="examples/flagship_r4")
    ap.add_argument("--tag", default="latest")
    ap.add_argument("--ema", action="store_true", default=True)
    ap.add_argument("--raw", dest="ema", action="store_false")
    ap.add_argument("--which", default="all",
                    choices=["all", "solver", "cache", "budget", "sr", "trunc"])
    ap.add_argument("--tiny", action="store_true",
                    help="dim-16 stand-in cascade (train --tiny ckpts): CPU "
                         "smoke of the eval mechanics, not a quality run")
    args = ap.parse_args()
    outdir = os.path.join(args.ckpt, "eval")
    os.makedirs(outdir, exist_ok=True)

    imagen = load_flagship(args.ckpt, args.tag, args.ema, tiny=args.tiny)
    embeds, masks = encode(CAPTIONS, imagen.text_encoder_name)
    results = {}
    path = os.path.join(outdir, "metrics.json")
    if os.path.exists(path):
        results.update(json.load(open(path)))

    # cache/budget first: they are the round-3 VERDICT asks and metrics.json
    # persists incrementally, so a timed-out run still banks the core results
    todo = [args.which] if args.which != "all" else ["cache", "budget", "solver", "sr", "trunc"]
    for which in todo:
        if which == "solver":
            eval_solver(imagen, embeds, masks, outdir, results)
        elif which == "cache":
            eval_cache(imagen, embeds, masks, outdir, results)
        elif which == "budget":
            eval_budget(imagen, embeds, masks, outdir, results)
        elif which == "sr":
            eval_sr(imagen, outdir, results)
        elif which == "trunc":
            eval_trunc(imagen, embeds, masks, outdir, results)
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
