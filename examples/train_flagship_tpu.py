"""Flagship-scale on-chip training (round-3 VERDICT next #6).

Trains the 287M-param 2-stage flagship cascade (dim-128 base @64px +
dim-64 SR @256px, __graft_entry__._flagship_imagen) on the offline synthetic
captioned-shapes set with EMA, using the on-device chained trainer
(one dispatch per chunk — the per-step host loop would be tunnel-bound).

    python examples/train_flagship_tpu.py --steps 100000 --batch 16 \
        --out examples/flagship_r4

Writes per-chunk loss trajectory + raw and EMA unet checkpoints every
--save_every steps (msgpack; reloadable by tools/flagship_quality_eval.py).
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
from minimagen_tpu.data.dataset import SyntheticCaptionedImages
from minimagen_tpu.parallel.mesh import (
    create_train_state,
    make_chained_train_step,
    make_optimizer,
)
from minimagen_tpu.training import save_unet_checkpoint


def stage_batches(num_items, batch, size, max_length, encoder_name):
    """Materialize the whole synthetic set as stacked (K, b, ...) arrays."""
    ds = SyntheticCaptionedImages(num_items=num_items, side_length=size,
                                  encoder_name=encoder_name, max_length=max_length)
    coll = MinimagenCollator(max_length=max_length)
    items = [ds[i] for i in range(num_items)]
    K = num_items // batch
    stacks = [coll(items[i * batch:(i + 1) * batch]) for i in range(K)]
    return {k: jnp.asarray(np.stack([s[k] for s in stacks])) for k in stacks[0]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=100_000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--items", type=int, default=512)
    p.add_argument("--chunk", type=int, default=2000)
    p.add_argument("--save_every", type=int, default=20_000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--ema", type=float, default=0.9995)
    p.add_argument("--mu_bf16", action="store_true", default=True)
    p.add_argument("--max_length", type=int, default=16)
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
                   help="dim-16 stand-in cascade for CPU smoke-testing the "
                        "script mechanics (not a quality run)")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)

    if args.tiny:
        from minimagen_tpu.models.imagen import Imagen
        from minimagen_tpu.models.unet import BaseTest, SuperTest

        imagen = Imagen(unets=[BaseTest(), SuperTest()], image_sizes=(8, 16),
                        timesteps=50, cond_drop_prob=0.1,
                        text_encoder_name="t5_small",
                        min_snr_gamma=args.min_snr_gamma)
    else:
        from __graft_entry__ import _flagship_imagen

        imagen = _flagship_imagen()  # bf16 compute, f32 params
        if args.min_snr_gamma is not None:
            from minimagen_tpu.models.imagen import _per_sample_loss_fn

            imagen.min_snr_gamma = float(args.min_snr_gamma)
            imagen.per_sample_loss_fn = _per_sample_loss_fn(imagen.loss_type)
    imagen.init_params(jax.random.PRNGKey(0), batch_size=2,
                       text_len=args.max_length)
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(imagen.params))
    print(f"flagship: {n_params / 1e6:.1f}M params", flush=True)

    done0, hist, ema0 = 0, [], None
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
        with open(os.path.join(args.resume, "history.json")) as f:
            prev = json.load(f)
        hist = prev["history"]
        done0 = hist[-1]["step"] if hist else 0
        print(f"resuming from {args.resume} ({args.resume_tag}) at step "
              f"{done0}", flush=True)

    stacked = stage_batches(args.items, args.batch, imagen.image_sizes[-1],
                            args.max_length, imagen.text_encoder_name)
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

    def save(state, tag):
        raw = jax.device_get(state.params)
        ema = jax.device_get(state.ema_params) if state.ema_params is not None else None
        for i in range(imagen.num_unets):
            save_unet_checkpoint(os.path.join(args.out, f"unet_{i}_{tag}.ckpt"),
                                 raw[f"unet_{i}"])
            if ema is not None:
                save_unet_checkpoint(os.path.join(args.out, f"unet_{i}_{tag}_ema.ckpt"),
                                     ema[f"unet_{i}"])

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
                       "batch": args.batch, "lr": args.lr, "ema": args.ema}, f)
        if done % args.save_every == 0 or done >= args.steps:
            save(state, "latest")
            print(f"checkpointed at step {done}", flush=True)
    save(state, "final")
    print(f"DONE: {done} steps in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
