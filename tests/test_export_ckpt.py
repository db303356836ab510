"""Committed-checkpoint export/reload cycle (round-4 VERDICT next #2).

tools/export_ckpt.py turns a training dir into a committable bf16 artifact;
tools/flagship_quality_eval.py --committed re-evals from it. These tests pin
the cycle on a tiny param tree: bf16 cast halves the bytes, reload through
the eval loader restores the f32 template dtype, and values survive to bf16
precision.
"""
import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fake_run_dir(tmp_path, n_unets=2):
    from minimagen_tpu.training import save_unet_checkpoint

    rng = np.random.default_rng(0)
    trees = []
    for i in range(n_unets):
        tree = {"conv": {"kernel": rng.normal(size=(3, 3, 4, 8)).astype(np.float32),
                         "bias": rng.normal(size=(8,)).astype(np.float32)},
                "dense": {"kernel": rng.normal(size=(16, 16)).astype(np.float32)}}
        trees.append(tree)
        save_unet_checkpoint(str(tmp_path / f"unet_{i}_final_ema.ckpt"), tree)
        save_unet_checkpoint(str(tmp_path / f"unet_{i}_final.ckpt"), tree)
    hist = {"history": [{"step": 128, "losses": [0.5, 0.6], "wall_s": 1.0}],
            "params_m": 0.001,
            "config": {"model": "tiny", "encoder": "t5_tiny", "holdout": 3,
                       "held_combos": [0, 10, 13], "batch": 4, "items": 16,
                       "lr": 1e-4, "ema": 0.9995, "min_snr_gamma": None,
                       "max_length": 8}}
    with open(tmp_path / "history.json", "w") as f:
        json.dump(hist, f)
    return trees


def test_export_roundtrip_bf16(tmp_path):
    src, dst = tmp_path / "run", tmp_path / "export"
    src.mkdir()
    trees = _fake_run_dir(src)

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_ckpt.py"),
         "--src", str(src), "--dst", str(dst), "--tag", "final"],
        capture_output=True, text=True, env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr
    assert (dst / "meta.json").exists()
    meta = json.load(open(dst / "meta.json"))
    assert meta["num_unets"] == 2 and meta["final_step"] == 128
    assert meta["config"]["held_combos"] == [0, 10, 13]
    assert meta["dtype"] == "bfloat16"

    # bf16 on disk: ~half the bytes of the f32 source
    for i in range(2):
        raw = os.path.getsize(src / f"unet_{i}_final_ema.ckpt")
        exp = os.path.getsize(dst / f"unet_{i}_ema_bf16.ckpt")
        assert exp < 0.65 * raw

    # reload through the eval loader's casting path: template dtype restored,
    # values equal to bf16 precision
    from minimagen_tpu.training import load_unet_checkpoint

    for i, tree in enumerate(trees):
        loaded = load_unet_checkpoint(str(dst / f"unet_{i}_ema_bf16.ckpt"), tree)
        loaded = jax.tree_util.tree_map(
            lambda a, t: np.asarray(a).astype(t.dtype), loaded, tree)
        for got, want in zip(jax.tree_util.tree_leaves(loaded),
                             jax.tree_util.tree_leaves(tree)):
            assert got.dtype == want.dtype == np.float32
            np.testing.assert_allclose(got, want, rtol=8e-3)  # bf16 mantissa


def test_export_requires_ema_ckpts(tmp_path):
    (tmp_path / "empty").mkdir()
    with open(tmp_path / "empty" / "history.json", "w") as f:
        json.dump({"history": [], "config": {}}, f)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_ckpt.py"),
         "--src", str(tmp_path / "empty"), "--dst", str(tmp_path / "out")],
        capture_output=True, text=True, env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode != 0


def test_eval_load_run_reads_committed_layout(tmp_path, monkeypatch):
    """load_run(committed=True) builds the model from meta.json's own config
    (tiny + t5_tiny here) and attaches the bf16 weights as f32."""
    pytest.importorskip("PIL")
    # the tool module calls respect_jax_platforms_env() at import time; pin
    # the env to the conftest's platform so importing it IN-PROCESS can never
    # clear backends and flip the whole suite onto the TPU tunnel (a stray
    # JAX_PLATFORMS=axon in the launching shell did exactly that once: every
    # later test ran remote and 9 of them "failed")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    src, dst = tmp_path / "run", tmp_path / "export"
    src.mkdir()

    # build a REAL tiny-model checkpoint so shapes match load_run's template
    from minimagen_tpu.models.imagen import Imagen
    from minimagen_tpu.models.unet import BaseTest, SuperTest
    from minimagen_tpu.training import save_unet_checkpoint

    imagen = Imagen(unets=[BaseTest(), SuperTest()], image_sizes=(8, 16),
                    timesteps=50, cond_drop_prob=0.1, text_encoder_name="t5_tiny")
    imagen.init_params(jax.random.PRNGKey(0), batch_size=1, text_len=8)
    for i in range(2):
        save_unet_checkpoint(str(src / f"unet_{i}_final_ema.ckpt"),
                             imagen.params[f"unet_{i}"])
    with open(src / "history.json", "w") as f:
        json.dump({"history": [{"step": 8, "losses": [1, 1], "wall_s": 1}],
                   "params_m": 0.4,
                   "config": {"model": "tiny", "encoder": "t5_tiny",
                              "held_combos": [0, 10, 13], "max_length": 8}}, f)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_ckpt.py"),
         "--src", str(src), "--dst", str(dst), "--tag", "final"],
        check=True, capture_output=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from flagship_quality_eval import load_run
    finally:
        sys.path.pop(0)
    loaded, config = load_run(str(dst), committed=True)
    assert config["model"] == "tiny" and config["encoder"] == "t5_tiny"
    assert config["held_combos"] == [0, 10, 13]
    for i in range(2):
        for got, want in zip(
                jax.tree_util.tree_leaves(loaded.params[f"unet_{i}"]),
                jax.tree_util.tree_leaves(imagen.params[f"unet_{i}"])):
            assert np.asarray(got).dtype == np.float32
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=8e-3, atol=1e-4)
