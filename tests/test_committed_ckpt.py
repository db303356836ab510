"""The COMMITTED trained checkpoint (assets/lite_ckpt, round-5 VERDICT next
#2) must keep loading into the code's lite model forever: a refactor that
renames/reshapes any parameter would silently orphan the in-git quality
artifact. `serialization.from_bytes` validates the full tree structure and
every leaf shape against the template, so a load is a strong structural pin.
"""
import json
import os

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "assets", "lite_ckpt")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(CKPT, "meta.json")),
    reason="committed artifact absent")


def test_meta_describes_the_lite_run():
    with open(os.path.join(CKPT, "meta.json")) as f:
        meta = json.load(f)
    assert meta["num_unets"] == 2
    assert meta["dtype"] == "bfloat16"
    assert meta["config"]["model"] == "lite"
    assert meta["config"]["encoder"] == "t5_tiny"  # the committed REAL T5
    assert meta["config"]["held_combos"], "holdout eval needs held combos"
    assert meta["final_step"] >= 120000


def test_committed_weights_load_into_current_lite_model():
    from __graft_entry__ import _lite_imagen
    from minimagen_tpu.training import load_unet_checkpoint

    imagen = _lite_imagen()
    imagen.init_params(jax.random.PRNGKey(0), batch_size=1, text_len=16)
    for i in range(2):
        template = imagen.params[f"unet_{i}"]
        loaded = load_unet_checkpoint(
            os.path.join(CKPT, f"unet_{i}_ema_bf16.ckpt"), template)
        # every leaf deserialized against the template: structure + shapes
        # match by construction; check dtype and that weights are real
        leaves = jax.tree_util.tree_leaves(loaded)
        assert leaves and all(l.dtype == np.dtype("bfloat16") for l in leaves)
        sample = np.asarray(leaves[0], np.float32)
        assert np.isfinite(sample).all() and np.abs(sample).sum() > 0
