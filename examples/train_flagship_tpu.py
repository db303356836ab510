"""Flagship-scale on-chip training (round-3 VERDICT next #6; extended for
round 5 with the committable 'lite' cascade, held-out caption combos, and the
committed REAL tiny T5 encoder).

Model presets (--model):
  flagship  287M 2-stage cascade (dim-128 base @64px + dim-64 SR @256px,
            __graft_entry__._flagship_imagen) — the perf-headline model.
  lite      ~40M 2-stage cascade (__graft_entry__._lite_imagen): small enough
            that its bf16 EMA checkpoint commits to git (tools/export_ckpt.py),
            defaults to the committed REAL tiny T5 (assets/t5_tiny).
  tiny      dim-16 stand-in for CPU smoke-testing the script mechanics.

Trains on the offline synthetic captioned-shapes set with EMA, using the
on-device chained trainer (one dispatch per chunk — the per-step host loop
would be tunnel-bound).

    python examples/train_flagship_tpu.py --steps 100000 --batch 16 \
        --out examples/flagship_r4
    python examples/train_flagship_tpu.py --model lite --holdout 3 \
        --steps 120000 --batch 32 --out examples/lite_r5

--holdout N excludes N of the 18 (color, shape) caption combos from training
entirely (deterministic split, data/dataset.py::holdout_split) so the eval
can measure caption generalization on never-seen combos (VERDICT r4 next #3).

Writes per-chunk loss trajectory + raw and EMA unet checkpoints every
--save_every steps (msgpack; reloadable by tools/flagship_quality_eval.py).
history.json carries the full run config (model/encoder/holdout/
min_snr_gamma/...); --resume restores it and errors on structural mismatch.
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

from minimagen_tpu.data.collate import MinimagenCollator
from minimagen_tpu.data.dataset import SyntheticCaptionedImages, holdout_split
from minimagen_tpu.parallel.mesh import (
    create_train_state,
    make_chained_train_step,
    make_optimizer,
)
from minimagen_tpu.training import save_unet_checkpoint

ENCODER_DEFAULTS = {"flagship": "t5_base", "lite": "t5_tiny", "tiny": "t5_small"}


def stage_batches(num_items, batch, size, max_length, encoder_name, combos=None):
    """Materialize the whole synthetic set as stacked (K, b, ...) arrays."""
    ds = SyntheticCaptionedImages(num_items=num_items, side_length=size,
                                  encoder_name=encoder_name, max_length=max_length,
                                  combos=combos)
    coll = MinimagenCollator(max_length=max_length)
    items = [ds[i] for i in range(num_items)]
    K = num_items // batch
    stacks = [coll(items[i * batch:(i + 1) * batch]) for i in range(K)]
    return {k: jnp.asarray(np.stack([s[k] for s in stacks])) for k in stacks[0]}


def build_model(model: str, encoder: str, min_snr_gamma):
    if model == "tiny":
        from minimagen_tpu.models.imagen import Imagen
        from minimagen_tpu.models.unet import BaseTest, SuperTest

        imagen = Imagen(unets=[BaseTest(), SuperTest()], image_sizes=(8, 16),
                        timesteps=50, cond_drop_prob=0.1,
                        text_encoder_name=encoder)
    elif model == "lite":
        from __graft_entry__ import _lite_imagen

        imagen = _lite_imagen(text_encoder_name=encoder)
    else:
        from __graft_entry__ import _flagship_imagen

        imagen = _flagship_imagen()  # bf16 compute, f32 params
        assert encoder == "t5_base", "--model flagship is built for t5_base"
    # through the setter so the ctor's gamma>0 validation runs (an attribute
    # assignment would silently accept gamma<=0 -> negative loss weights)
    imagen.set_training_levers(min_snr_gamma=min_snr_gamma)
    return imagen


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=("flagship", "lite", "tiny"), default="flagship")
    p.add_argument("--encoder", type=str, default=None,
                   help="text encoder registry name (default per --model: "
                        "flagship=t5_base, lite=t5_tiny (the committed REAL "
                        "tiny T5), tiny=t5_small)")
    p.add_argument("--steps", type=int, default=100_000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--items", type=int, default=512)
    p.add_argument("--chunk", type=int, default=2000)
    p.add_argument("--save_every", type=int, default=20_000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--ema", type=float, default=0.9995)
    p.add_argument("--mu_bf16", action="store_true", default=True)
    p.add_argument("--max_length", type=int, default=16)
    p.add_argument("--holdout", type=int, default=0,
                   help="exclude N of the 18 caption combos from training "
                        "(deterministic; the eval's generalization split)")
    p.add_argument("--out", type=str, default="examples/flagship_r4")
    p.add_argument("--resume", type=str, default=None,
                   help="previous --out dir to continue from: loads "
                        "unet_i_<tag>[_ema].ckpt into params/EMA and resumes "
                        "the global step counter from its history.json. Only "
                        "params+EMA persist — Adam moments restart fresh "
                        "(a few-hundred-step warmup transient).")
    p.add_argument("--resume_tag", type=str, default="final",
                   help="checkpoint tag inside --resume (final|latest)")
    p.add_argument("--min_snr_gamma", type=float, default=None,
                   help="Min-SNR loss weighting gamma (arXiv 2303.09556; "
                        "paper recommends 5). None = unweighted reference "
                        "loss. NOTE: changes the train-step graph, so the "
                        "first chunk pays a fresh tunnel compile.")
    p.add_argument("--tiny", action="store_true",
                   help="alias for --model tiny (CPU smoke of the mechanics)")
    args = p.parse_args()
    if args.tiny:
        args.model = "tiny"
    args.encoder = args.encoder or ENCODER_DEFAULTS[args.model]
    os.makedirs(args.out, exist_ok=True)

    done0, hist = 0, []
    prev_cfg = {}
    if args.resume:
        with open(os.path.join(args.resume, "history.json")) as f:
            prev = json.load(f)
        hist = prev["history"]
        done0 = hist[-1]["step"] if hist else 0
        # history.json is written every chunk but checkpoints only every
        # --save_every: after a crash the checkpoint can be OLDER than the
        # last history row. The step sidecar written next to each checkpoint
        # is authoritative; truncate history past it so the recorded
        # trajectory matches the weights actually being resumed.
        step_meta = os.path.join(args.resume, f"ckpt_{args.resume_tag}_step.json")
        if os.path.exists(step_meta):
            with open(step_meta) as f:
                ckpt_step = json.load(f)["step"]
            if ckpt_step != done0:
                print(f"resume: checkpoint '{args.resume_tag}' is at step "
                      f"{ckpt_step} but history reaches {done0} (crash between "
                      f"saves); truncating history to the checkpoint",
                      flush=True)
                hist = [h for h in hist if h["step"] <= ckpt_step]
                done0 = ckpt_step
        elif hist:
            print(f"resume: no step sidecar for tag '{args.resume_tag}'; "
                  f"trusting history step {done0} (pre-sidecar run — verify "
                  f"the checkpoint really is from that step)", flush=True)
        prev_cfg = prev.get("config", {})
        # structural knobs must match the checkpoint being resumed; the
        # min_snr lever is inherited unless explicitly re-passed (a resumed
        # run must not silently revert to the unweighted loss)
        for k in ("model", "encoder", "holdout", "batch", "items"):
            if k in prev_cfg and prev_cfg[k] != getattr(args, k):
                raise SystemExit(
                    f"--resume config mismatch: {k}={getattr(args, k)} but "
                    f"{args.resume} was trained with {k}={prev_cfg[k]} "
                    f"(pass matching flags)")
        if args.min_snr_gamma is None and prev_cfg.get("min_snr_gamma") is not None:
            args.min_snr_gamma = prev_cfg["min_snr_gamma"]
            print(f"resume: inheriting min_snr_gamma={args.min_snr_gamma} "
                  f"from {args.resume}", flush=True)

    train_combos, held_combos = (None, [])
    if args.holdout:
        train_combos, held_combos = holdout_split(args.holdout)
        print(f"holdout: training on {len(train_combos)} combos, held out "
              f"combo ids {held_combos}", flush=True)

    imagen = build_model(args.model, args.encoder, args.min_snr_gamma)
    imagen.init_params(jax.random.PRNGKey(0), batch_size=2,
                       text_len=args.max_length)
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(imagen.params))
    print(f"{args.model}: {n_params / 1e6:.1f}M params "
          f"(encoder {args.encoder})", flush=True)

    ema0 = None
    if args.resume:
        from minimagen_tpu.training import load_unet_checkpoint

        for i in range(imagen.num_unets):
            imagen.params[f"unet_{i}"] = load_unet_checkpoint(
                os.path.join(args.resume, f"unet_{i}_{args.resume_tag}.ckpt"),
                imagen.params[f"unet_{i}"])
        if args.ema > 0:
            ema0 = {f"unet_{i}": load_unet_checkpoint(
                os.path.join(args.resume,
                             f"unet_{i}_{args.resume_tag}_ema.ckpt"),
                imagen.params[f"unet_{i}"])
                for i in range(imagen.num_unets)}
        print(f"resuming from {args.resume} ({args.resume_tag}) at step "
              f"{done0}", flush=True)

    stacked = stage_batches(args.items, args.batch, imagen.image_sizes[-1],
                            args.max_length, args.encoder, combos=train_combos)
    print(f"staged {stacked['image'].shape[0]} batches of {args.batch} "
          f"({stacked['image'].nbytes / 1e6:.0f} MB images)", flush=True)

    opt = make_optimizer(args.lr, mu_dtype=jnp.bfloat16 if args.mu_bf16 else None)
    state = create_train_state(imagen.params, opt, ema=args.ema > 0)
    if done0:
        # the global step drives both the round-robin batch index and the
        # per-step PRNG fold (parallel/mesh.py make_chained_train_step), so a
        # resumed run continues the exact stream the original would have seen
        state = state.replace(step=jnp.asarray(done0, jnp.int32))
    if ema0 is not None:
        state = state.replace(ema_params=ema0)
    chain = make_chained_train_step(imagen, opt, ema_decay=args.ema)

    def save(state, tag, step):
        raw = jax.device_get(state.params)
        ema = jax.device_get(state.ema_params) if state.ema_params is not None else None
        for i in range(imagen.num_unets):
            save_unet_checkpoint(os.path.join(args.out, f"unet_{i}_{tag}.ckpt"),
                                 raw[f"unet_{i}"])
            if ema is not None:
                save_unet_checkpoint(os.path.join(args.out, f"unet_{i}_{tag}_ema.ckpt"),
                                     ema[f"unet_{i}"])
        # step sidecar: lets --resume detect a checkpoint older than the last
        # history row (history is written every chunk, checkpoints are not)
        with open(os.path.join(args.out, f"ckpt_{tag}_step.json"), "w") as f:
            json.dump({"step": int(step)}, f)

    config = {"model": args.model, "encoder": args.encoder,
              "holdout": args.holdout, "held_combos": held_combos,
              "batch": args.batch, "items": args.items, "lr": args.lr,
              "ema": args.ema, "min_snr_gamma": args.min_snr_gamma,
              "max_length": args.max_length}

    key = jax.random.PRNGKey(42)
    t0 = time.time()
    done = done0
    while done < args.steps:
        n = min(args.chunk, args.steps - done)
        state, losses = chain(state, stacked, jax.random.fold_in(key, done), n)
        losses = np.asarray(losses)  # host sync
        done += n
        dt = time.time() - t0
        hist.append({"step": done, "losses": losses.tolist(), "wall_s": dt})
        print(f"step {done}/{args.steps}: losses {losses.round(4).tolist()} "
              f"({dt:.0f}s, {(done - done0) / dt:.1f} steps/s)", flush=True)
        with open(os.path.join(args.out, "history.json"), "w") as f:
            json.dump({"history": hist, "params_m": n_params / 1e6,
                       "batch": args.batch, "lr": args.lr, "ema": args.ema,
                       "config": config}, f)
        if done % args.save_every == 0 or done >= args.steps:
            save(state, "latest", done)
            print(f"checkpointed at step {done}", flush=True)
    save(state, "final", done)
    print(f"DONE: {done} steps in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
