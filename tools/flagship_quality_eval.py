"""Production-lever validation on TRAINED weights (round-3 VERDICT next #6;
round-5: committed-checkpoint re-eval, full-reverse cascade row, held-out
caption generalization, UniPC/Karras rows, trace-derived device timing).

Loads a cascade trained by examples/train_flagship_tpu.py — either a raw
training dir (history.json + unet_i_<tag>[_ema].ckpt) or a COMMITTED bf16
export (tools/export_ckpt.py: meta.json + unet_i_ema_bf16.ckpt) — and
measures, on the real weights:

  solver   ddim / dpmpp / unipc at 10/20/50 steps on the lambda AND karras
           grids (base stage, 64px) — caption-color metric + device time
  cache    encoder-feature caching None / 2 / 'auto' — PSNR drift vs exact
  budget   per-stage step budgets (50,50) vs (50,20)
  sr       64->256 super_resolve PSNR vs procedural ground truth
  trunc    truncated-SR cascade serving (sr_start_noise_levels)
  fullrev  the REFERENCE cascade semantics: full-reverse SR from pure noise
           (/root/reference/minimagen/Imagen.py:372-420) — color metric +
           high-frequency noise proxy; THE round-4 open question
  holdout  caption-color fidelity on TRAINED vs HELD-OUT caption combos
           (the generalization-vs-memorization split, holdout_split)
  recipe   the composed fastest-serving recipe (dpmpp-10 base + truncated SR
           + per-stage budgets + cache auto) vs the default path — s/image

Timing methodology (round-4 VERDICT weak #3 fix): wall clocks through the
remote-TPU tunnel carry 0.1-0.3 s/dispatch jitter, so metrics.json carries
trace-derived DEVICE time (utils/profiling.traced_device_seconds) as the
primary `device_s` column; `wall_s` is the median of 3 dispatch-inclusive
calls and is labeled indicative.

Writes PNGs + metrics JSON under <ckpt_dir>/eval/.

Usage:  python tools/flagship_quality_eval.py --ckpt examples/lite_r5 \
            [--model lite] [--which all|...] [--ema]
        python tools/flagship_quality_eval.py --ckpt assets/lite_ckpt \
            --committed          # re-eval from the committed artifact
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

from minimagen_tpu.data.dataset import (
    _SYNTH_COLORS,
    _draw_synthetic,
    synthetic_combo_caption,
)
from minimagen_tpu.models.t5 import t5_encode_text
from minimagen_tpu.training import load_unet_checkpoint
from minimagen_tpu.utils.profiling import traced_device_seconds

ENCODER_DEFAULTS = {"flagship": "t5_base", "lite": "t5_tiny", "tiny": "t5_small"}
ALL_COMBOS = list(range(18))


def captions_for(combo_ids, k=8):
    """k eval captions cycling through the given combo ids."""
    return [synthetic_combo_caption(combo_ids[i % len(combo_ids)]) for i in range(k)]


def build_model(model: str, encoder: str):
    if model == "tiny":  # dim-16 stand-in written by train --model tiny:
        # CPU smoke of the eval mechanics, not a quality measurement
        from minimagen_tpu.models.imagen import Imagen
        from minimagen_tpu.models.unet import BaseTest, SuperTest

        return Imagen(unets=[BaseTest(), SuperTest()], image_sizes=(8, 16),
                      timesteps=50, cond_drop_prob=0.1,
                      text_encoder_name=encoder)
    if model == "lite":
        from __graft_entry__ import _lite_imagen

        return _lite_imagen(text_encoder_name=encoder)
    from __graft_entry__ import _flagship_imagen

    return _flagship_imagen()


def load_run(ckpt_dir: str, model=None, encoder=None, tag="latest", ema=True,
             committed=False):
    """Build the model named by the run's own config and attach its weights.

    Returns (imagen, config). `committed` loads the bf16 export layout
    (meta.json + unet_i_ema_bf16.ckpt) and casts back to the param template
    dtype; otherwise the raw training layout."""
    config = {}
    meta_path = os.path.join(ckpt_dir, "meta.json" if committed else "history.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            config = json.load(f).get("config", {})
    model = model or config.get("model") or "flagship"
    encoder = encoder or config.get("encoder") or ENCODER_DEFAULTS[model]
    config.setdefault("model", model)
    config.setdefault("encoder", encoder)

    imagen = build_model(model, encoder)
    imagen.init_params(jax.random.PRNGKey(0), batch_size=1,
                       text_len=config.get("max_length", 16))
    for i in range(imagen.num_unets):
        template = imagen.params[f"unet_{i}"]
        if committed:
            path = os.path.join(ckpt_dir, f"unet_{i}_ema_bf16.ckpt")
            loaded = load_unet_checkpoint(path, template)
            # bf16 on disk -> template (f32) working dtype
            loaded = jax.tree_util.tree_map(
                lambda a, t: np.asarray(a).astype(t.dtype), loaded, template)
        else:
            suffix = "_ema" if ema else ""
            path = os.path.join(ckpt_dir, f"unet_{i}_{tag}{suffix}.ckpt")
            loaded = load_unet_checkpoint(path, template)
        imagen.params[f"unet_{i}"] = loaded
    return imagen, config


def encode(captions, name, max_length=16):
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


def grad_mean(images: np.ndarray) -> float:
    """High-frequency noise proxy: mean |neighbor difference|. The synthetic
    set is piecewise-flat, so a CLEAN sample sits ~0.005-0.02 while an
    un-denoised (pure noise) output sits ~0.2-0.4 — this is the quantitative
    'did full-reverse SR converge or is it still noise' column."""
    gx = float(np.abs(np.diff(images, axis=2)).mean())
    gy = float(np.abs(np.diff(images, axis=1)).mean())
    return (gx + gy) / 2.0


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 99.0 if mse == 0 else 10.0 * np.log10(1.0 / mse)


def save_png(path, img):
    from PIL import Image

    Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)


def timed_sample(imagen, embeds, masks, key, **kw):
    """(images, device_s, wall_s): compile+warm, then one traced call for
    DEVICE time (the committed figure) and 3 plain calls for the indicative
    median wall (dispatch-inclusive; tunnel jitter documented)."""
    def run():
        out = imagen.sample(text_embeds=embeds, text_masks=masks, cond_scale=3.0,
                            key=key, **kw)
        np.asarray(out)  # host readback = reliable sync through the tunnel
        return out

    out = run()  # compile + warm
    device_s = traced_device_seconds(lambda: run())
    walls = []
    for _ in range(3):
        t0 = time.time()
        out = run()
        walls.append(time.time() - t0)
    return np.asarray(out), device_s, float(np.median(walls))


def _row(color=None, device_s=None, wall_s=None, **extra):
    row = {}
    if color is not None:
        row["color_dist"] = round(color, 4)
    if device_s is not None:
        row["device_s_batch8"] = round(device_s, 4)
    if wall_s is not None:
        row["wall_s_median3_batch8"] = round(wall_s, 3)
    row.update(extra)
    return row


def base_only(imagen):
    """A 1-stage view of the cascade (base U-Net at 64px): solver-quality
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


def eval_solver(imagen, embeds, masks, captions, outdir, results):
    """ddim/dpmpp/unipc at 10/20/50 on the lambda AND karras grids, base
    stage (64px). Karras applies to the strided ODE samplers only (ddim on
    the lambda grid is the reference-equivalent row)."""
    key = jax.random.PRNGKey(7)
    base = base_only(imagen)
    for sampler, grid in (("ddim", "lambda"), ("dpmpp", "lambda"),
                          ("unipc", "lambda"), ("dpmpp", "karras"),
                          ("unipc", "karras")):
        for steps in (10, 20, 50):
            out, dev, wall = timed_sample(base, embeds, masks, key,
                                          sampler=sampler, sample_steps=steps,
                                          grid=grid, cache_interval=None)
            m = color_metric(out, captions)
            results[f"solver/{sampler}-{steps}@{grid}(base64)"] = _row(
                m, dev, wall)
            save_png(os.path.join(outdir, f"{sampler}{steps}_{grid}.png"),
                     np.concatenate(list(out[:4]), axis=1))
            print(f"{sampler}-{steps} {grid}: color {m:.4f}, dev "
                  f"{dev if dev is None else round(dev, 3)}s, wall {wall:.2f}s",
                  flush=True)


def eval_cache(imagen, embeds, masks, captions, outdir, results):
    key = jax.random.PRNGKey(11)
    exact, dev_exact, wall_exact = timed_sample(
        imagen, embeds, masks, key, sampler="ddim", sample_steps=50,
        cache_interval=None)
    for mode in (2, "auto"):
        out, dev, wall = timed_sample(imagen, embeds, masks, key, sampler="ddim",
                                      sample_steps=50, cache_interval=mode)
        results[f"cache/{mode}"] = _row(
            color_metric(out, captions), dev, wall,
            psnr_vs_exact_db=round(psnr(out, exact), 2))
        print(f"cache {mode}: {results[f'cache/{mode}']}", flush=True)
    results["cache/exact"] = _row(color_metric(exact, captions), dev_exact,
                                  wall_exact)
    save_png(os.path.join(outdir, "cache_exact.png"),
             np.concatenate(list(exact[:4]), axis=1))


def eval_budget(imagen, embeds, masks, captions, outdir, results):
    key = jax.random.PRNGKey(13)
    for budget in ((50, 50), (50, 20)):
        out, dev, wall = timed_sample(imagen, embeds, masks, key, sampler="ddim",
                                      sample_steps=budget, cache_interval=None)
        results[f"budget/{budget[0]}-{budget[1]}"] = _row(
            color_metric(out, captions), dev, wall)
        save_png(os.path.join(outdir, f"budget_{budget[0]}_{budget[1]}.png"),
                 np.concatenate(list(out[:4]), axis=1))
        print(f"budget {budget}: {results[f'budget/{budget[0]}-{budget[1]}']}", flush=True)


def eval_trunc(imagen, embeds, masks, captions, outdir, results):
    """Truncated-SR cascade serving (round 4, sample(sr_start_noise_levels=...)):
    the SR stage refines the base output instead of full-reversing from
    noise — the serving recipe that makes undertrained SR stages usable."""
    key = jax.random.PRNGKey(17)
    for level in (0.2, 0.4):
        out, dev, wall = timed_sample(imagen, embeds, masks, key, sampler="ddim",
                                      sample_steps=50, cache_interval=None,
                                      sr_start_noise_levels=level)
        m = color_metric(out, captions)
        results[f"trunc/sr{level}"] = _row(m, dev, wall,
                                           grad_mean=round(grad_mean(out), 4))
        save_png(os.path.join(outdir, f"cascade_trunc_{level}.png"),
                 np.concatenate(list(out[:4]), axis=1))
        print(f"trunc {level}: color {m:.4f}", flush=True)


def eval_fullrev(imagen, embeds, masks, captions, outdir, results):
    """THE reference cascade semantics (round-4 VERDICT next #1): the SR
    stage full-reverses from PURE NOISE conditioned on the base output
    (/root/reference/minimagen/Imagen.py:372-420). Round 4 found this
    produced noise at 30k steps on 287M; this row answers whether 100k+
    steps converge it. grad_mean ~0.01 = clean; ~0.3 = still noise."""
    key = jax.random.PRNGKey(19)
    out, dev, wall = timed_sample(imagen, embeds, masks, key, sampler="ddim",
                                  sample_steps=50, cache_interval=None)
    m = color_metric(out, captions)
    g = grad_mean(out)
    results["fullrev/cascade-ddim50"] = _row(m, dev, wall,
                                             grad_mean=round(g, 4))
    # the base stage alone, for attribution: if base is clean but the
    # cascade is noisy, the SR stage is the unconverged one
    base_out, _, _ = timed_sample(base_only(imagen), embeds, masks, key,
                                  sampler="ddim", sample_steps=50,
                                  cache_interval=None)
    results["fullrev/base64-ddim50"] = _row(
        color_metric(base_out, captions), grad_mean=round(grad_mean(base_out), 4))
    save_png(os.path.join(outdir, "fullrev_cascade.png"),
             np.concatenate(list(out[:4]), axis=1))
    save_png(os.path.join(outdir, "fullrev_base64.png"),
             np.concatenate(list(base_out[:4]), axis=1))
    print(f"fullrev cascade: color {m:.4f}, grad_mean {g:.4f} "
          f"(clean ~0.01, noise ~0.3)", flush=True)


def eval_holdout(imagen, config, outdir, results):
    """Caption generalization (round-4 VERDICT next #3): identical sampling
    graphs fed captions from TRAINED combos vs combos the model NEVER saw
    (holdout_split). A memorizer matches colors only on trained combos; a
    generalizing text-conditioned model matches both. Measured on the BASE
    stage (64px) and the truncated-SR cascade — the two converged serving
    paths; the full-reverse cascade is excluded because its unconverged SR
    noise floors the color metric for BOTH splits (see the fullrev section),
    which would mask any train/held gap."""
    held = config.get("held_combos") or []
    if not held:
        print("holdout: run was trained without --holdout; skipping", flush=True)
        return
    trained = [c for c in ALL_COMBOS if c not in held]
    name, L = imagen.text_encoder_name, config.get("max_length", 16)
    base = base_only(imagen)
    key = jax.random.PRNGKey(23)
    for tag, combos in (("trained", trained), ("held", held)):
        caps = captions_for(combos, 8)
        embeds, masks = encode(caps, name, L)
        bout, _, _ = timed_sample(base, embeds, masks, key, sampler="ddim",
                                  sample_steps=50, cache_interval=None)
        cout, _, _ = timed_sample(imagen, embeds, masks, key, sampler="ddim",
                                  sample_steps=50, cache_interval=None,
                                  sr_start_noise_levels=0.2)
        mb, mc = color_metric(bout, caps), color_metric(cout, caps)
        results[f"holdout/{tag}"] = _row(
            None, base64_color_dist=round(mb, 4),
            trunc_cascade_color_dist=round(mc, 4),
            trunc_cascade_grad_mean=round(grad_mean(cout), 4),
            captions=sorted(set(caps)))
        save_png(os.path.join(outdir, f"holdout_{tag}.png"),
                 np.concatenate(list(cout[:4]), axis=1))
        save_png(os.path.join(outdir, f"holdout_{tag}_base64.png"),
                 np.concatenate(list(bout[:4]), axis=1))
        print(f"holdout/{tag}: base64 {mb:.4f}, trunc-cascade {mc:.4f} "
              f"({sorted(set(caps))})", flush=True)


def eval_recipe(imagen, embeds, masks, captions, outdir, results):
    """The composed best-known serving recipe as ONE number (round-4 VERDICT
    next #8): dpmpp-10 base + truncated SR (start 0.2, 10 effective steps)
    + cache auto, vs the default ddim-(50,50) full-reverse path."""
    key = jax.random.PRNGKey(29)
    b = int(embeds.shape[0])
    recipes = {
        "default-ddim50": dict(sampler="ddim", sample_steps=50, cache_interval=None),
        "fast-dpmpp10+trunc0.2+cacheauto": dict(
            sampler="dpmpp", sample_steps=(10, 50), cache_interval="auto",
            sr_start_noise_levels=0.2),
    }
    for tag, kw in recipes.items():
        out, dev, wall = timed_sample(imagen, embeds, masks, key, **kw)
        m = color_metric(out, captions)
        results[f"recipe/{tag}"] = _row(
            m, dev, wall,
            s_per_image_wall=round(wall / b, 4),
            s_per_image_device=(round(dev / b, 4) if dev else None),
            grad_mean=round(grad_mean(out), 4))
        save_png(os.path.join(outdir, f"recipe_{tag.split('+')[0]}.png"),
                 np.concatenate(list(out[:4]), axis=1))
        print(f"recipe/{tag}: {results[f'recipe/{tag}']}", flush=True)


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


SECTIONS = ["fullrev", "holdout", "trunc", "sr", "cache", "budget", "recipe", "solver"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="examples/flagship_r4")
    ap.add_argument("--model", default=None, choices=[None, "flagship", "lite", "tiny"],
                    help="default: the run's own config (history/meta json)")
    ap.add_argument("--encoder", default=None)
    ap.add_argument("--tag", default="latest")
    ap.add_argument("--ema", action="store_true", default=True)
    ap.add_argument("--raw", dest="ema", action="store_false")
    ap.add_argument("--committed", action="store_true",
                    help="load the bf16 export layout written by "
                         "tools/export_ckpt.py (the in-git artifact)")
    ap.add_argument("--which", default="all", choices=["all"] + SECTIONS)
    ap.add_argument("--tiny", action="store_true",
                    help="alias for --model tiny (CPU smoke of the eval "
                         "mechanics, not a quality run)")
    args = ap.parse_args()
    if args.tiny:
        args.model = "tiny"
    outdir = os.path.join(args.ckpt, "eval")
    os.makedirs(outdir, exist_ok=True)

    imagen, config = load_run(args.ckpt, model=args.model, encoder=args.encoder,
                              tag=args.tag, ema=args.ema, committed=args.committed)
    held = set(config.get("held_combos") or [])
    trained_combos = [c for c in ALL_COMBOS if c not in held]
    captions = captions_for(trained_combos, 8)
    embeds, masks = encode(captions, imagen.text_encoder_name,
                           config.get("max_length", 16))
    results = {}
    path = os.path.join(outdir, "metrics.json")
    if os.path.exists(path):
        results.update(json.load(open(path)))
    results["_config"] = {**config, "eval_captions": captions,
                          "ema": args.ema, "committed": args.committed,
                          "timing": "device_s = trace-derived device busy time "
                                    "(primary); wall = median of 3, "
                                    "dispatch-inclusive, indicative only"}

    # fullrev/holdout first: they are THE round-4 asks, and metrics.json
    # persists incrementally, so a timed-out run still banks the core results
    todo = [args.which] if args.which != "all" else SECTIONS
    for which in todo:
        if which == "solver":
            eval_solver(imagen, embeds, masks, captions, outdir, results)
        elif which == "cache":
            eval_cache(imagen, embeds, masks, captions, outdir, results)
        elif which == "budget":
            eval_budget(imagen, embeds, masks, captions, outdir, results)
        elif which == "sr":
            eval_sr(imagen, outdir, results)
        elif which == "trunc":
            eval_trunc(imagen, embeds, masks, captions, outdir, results)
        elif which == "fullrev":
            eval_fullrev(imagen, embeds, masks, captions, outdir, results)
        elif which == "holdout":
            eval_holdout(imagen, config, outdir, results)
        elif which == "recipe":
            eval_recipe(imagen, embeds, masks, captions, outdir, results)
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
