"""Export a trained run's EMA checkpoint as a COMMITTABLE bf16 artifact
(round-4 VERDICT next #2: every quality claim previously died with the disk;
a committed checkpoint + one-command re-eval makes them reproducible).

Reads <src>/unet_i_<tag>_ema.ckpt (f32 flax msgpack written by
examples/train_flagship_tpu.py), casts every leaf to bfloat16 (halves the
file; the models compute in bf16 anyway, so the quantization is at worst the
working precision), and writes <dst>/unet_i_ema_bf16.ckpt plus meta.json
(run config + final step + loss) so the re-eval is self-describing.

Usage:
    python tools/export_ckpt.py --src examples/lite_r5 --dst assets/lite_ckpt
Re-eval from the committed artifact (fresh clone, no retraining):
    python tools/flagship_quality_eval.py --model lite --ckpt assets/lite_ckpt \
        --committed
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from flax import serialization


def _cast_tree(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda a: a.astype(np.dtype("bfloat16") if np.issubdtype(a.dtype, np.floating) else a.dtype)
        if hasattr(a, "astype") else a,
        tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="training --out dir")
    ap.add_argument("--dst", required=True, help="committable artifact dir")
    ap.add_argument("--tag", default="final", help="checkpoint tag (final|latest)")
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    with open(os.path.join(args.src, "history.json")) as f:
        hist = json.load(f)
    config = hist.get("config", {})
    last = hist["history"][-1] if hist.get("history") else {}

    total = 0
    i = 0
    while True:
        src = os.path.join(args.src, f"unet_{i}_{args.tag}_ema.ckpt")
        if not os.path.exists(src):
            break
        with open(src, "rb") as f:
            tree = serialization.msgpack_restore(f.read())
        tree = _cast_tree(tree)
        out = os.path.join(args.dst, f"unet_{i}_ema_bf16.ckpt")
        with open(out, "wb") as f:
            f.write(serialization.msgpack_serialize(tree))
        size = os.path.getsize(out)
        total += size
        print(f"unet_{i}: {size / 1e6:.1f} MB -> {out}")
        i += 1
    assert i > 0, f"no unet_*_{args.tag}_ema.ckpt under {args.src}"

    meta = {"config": config, "params_m": hist.get("params_m"),
            "final_step": last.get("step"), "final_losses": last.get("losses"),
            "tag": args.tag, "dtype": "bfloat16", "num_unets": i}
    with open(os.path.join(args.dst, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"exported {i} unets, {total / 1e6:.1f} MB total + meta.json "
          f"(step {last.get('step')})")


if __name__ == "__main__":
    main()
