"""End-to-end smoke test: tiny train -> checkpoints on disk -> reload ->
sample -> PNGs (the reference's de-facto test, main.py:1-11, scaled to 8->16px
so it runs quickly on the CPU test mesh)."""
import os

import numpy as np
import jax
import pytest

from minimagen_tpu.data.collate import DataLoader, MinimagenCollator
from minimagen_tpu.data.dataset import SyntheticCaptionedImages
from minimagen_tpu.generate import load_minimagen, sample_and_save
from minimagen_tpu.models.imagen import Imagen
from minimagen_tpu.models.unet import BaseTest, SuperTest
from minimagen_tpu.parallel.mesh import make_optimizer
from minimagen_tpu.training import (
    MinimagenTrain,
    create_directory,
    get_default_args,
    imagen_config_dict,
    save_training_info,
    get_minimagen_parser,
    load_testing_parameters,
)


@pytest.mark.slow
def test_tiny_train_checkpoint_reload_sample(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = load_testing_parameters(get_minimagen_parser().parse_args([]))
    args.IMG_SIDE_LEN = 16
    args.EPOCHS = 1
    args.CHCKPT_NUM = 2
    args.MAX_NUM_WORDS = 8

    ds = SyntheticCaptionedImages(num_items=8, side_length=16, encoder_name="t5_small",
                                  max_length=8)
    collate = MinimagenCollator(max_length=8)
    train_dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, collate_fn=collate)
    valid_dl = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True, collate_fn=collate)

    imagen = Imagen(unets=[BaseTest(), SuperTest()], image_sizes=(8, 16), timesteps=25,
                    cond_drop_prob=0.15, text_encoder_name="t5_small")
    imagen.init_params(jax.random.PRNGKey(0))

    timestamp = "testrun"
    training_dir = create_directory(str(tmp_path / f"training_{timestamp}"))
    save_training_info(
        args, timestamp, [c.to_dict() for c in imagen.unet_configs],
        imagen_config_dict(dict(image_sizes=[8, 16], timesteps=25, cond_drop_prob=0.15,
                                text_encoder_name="t5_small")),
        1.0, training_dir,
    )

    summary = MinimagenTrain(timestamp, args, imagen.unet_configs, imagen, train_dl,
                             valid_dl, training_dir, make_optimizer(1e-4))
    assert summary["final_step"] > 0

    run_dir = str(tmp_path / f"training_{timestamp}")
    # periodic validation produced best-checkpoints, plus tmp dumps
    assert any(f.startswith("unet_0_state") for f in os.listdir(os.path.join(run_dir, "state_dicts")))
    assert any(f.startswith("unet_0_tmp") for f in os.listdir(os.path.join(run_dir, "tmp")))
    log = open(os.path.join(run_dir, "training_progess.txt")).read()
    assert "Checkpoint created at batch number 0" in log
    assert "Avg Valid Losses" in log

    # reload and verify structure (state_dicts holds the BEST-validation
    # checkpoint, not the final weights, so values may differ from
    # imagen.params — the final weights live in tmp/)
    reloaded = load_minimagen(run_dir)
    assert reloaded.num_unets == 2
    assert (jax.tree_util.tree_structure(reloaded.params["unet_0"])
            == jax.tree_util.tree_structure(imagen.params["unet_0"]))

    # the tmp/ dump is the final state: exact round-trip of final weights
    from minimagen_tpu.training import load_unet_checkpoint
    tmp_params = load_unet_checkpoint(
        os.path.join(run_dir, "tmp", "unet_0_tmp.ckpt"), imagen.params["unet_0"]
    )
    orig_leaf = jax.tree_util.tree_leaves(imagen.params["unet_0"])[0]
    new_leaf = jax.tree_util.tree_leaves(tmp_params)[0]
    np.testing.assert_allclose(np.asarray(orig_leaf), np.asarray(new_leaf), atol=1e-7)

    # sample_and_save writes provenance + images (reference generate.py:124-173)
    sample_and_save(["a red square"], training_directory=run_dir,
                    sample_args={"cond_scale": 3.0}, save_directory="gen_out")
    out_dir = tmp_path / "gen_out"
    assert (out_dir / "captions.txt").read_text().strip() == "a red square"
    assert (out_dir / "imagen_training_directory.txt").read_text() == run_dir
    assert (out_dir / "generated_images" / "image_0.png").exists()

    # output dir collision raises (reference generate.py:22-23)
    with pytest.raises(FileExistsError):
        sample_and_save(["x"], training_directory=run_dir, save_directory="gen_out")


@pytest.mark.slow
def test_training_survives_loader_failure(tmp_path, monkeypatch):
    """A hard loader failure mid-epoch gets a crash dump and training
    proceeds to the next epoch (failure-detection subsystem, SURVEY §5)."""
    monkeypatch.chdir(tmp_path)
    args = load_testing_parameters(get_minimagen_parser().parse_args([]))
    args.IMG_SIDE_LEN = 16
    args.EPOCHS = 2
    args.CHCKPT_NUM = 100  # only batch-0 checkpoints
    args.MAX_NUM_WORDS = 8

    class ExplodingDataset(SyntheticCaptionedImages):
        def __getitem__(self, idx):
            if idx == 5:
                raise RuntimeError("synthetic loader explosion")
            return super().__getitem__(idx)

    ds = ExplodingDataset(num_items=8, side_length=16, encoder_name="t5_small", max_length=8)
    collate = MinimagenCollator(max_length=8)
    train_dl = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True,
                          collate_fn=collate, prefetch=0)
    good = SyntheticCaptionedImages(num_items=4, side_length=16,
                                    encoder_name="t5_small", max_length=8)
    valid_dl = DataLoader(good, batch_size=2, shuffle=False, drop_last=True, collate_fn=collate)

    imagen = Imagen(unets=[BaseTest()], image_sizes=(16,), timesteps=25,
                    cond_drop_prob=0.15, text_encoder_name="t5_small")
    imagen.init_params(jax.random.PRNGKey(0))
    training_dir = create_directory(str(tmp_path / "training_x"))

    summary = MinimagenTrain("x", args, imagen.unet_configs, imagen, train_dl,
                             valid_dl, training_dir, make_optimizer(1e-4))
    log = (tmp_path / "training_x" / "training_progess.txt").read_text()
    assert "DATA LOADER FAILED" in log
    assert "EPOCH 2" in log  # second epoch still ran
    assert os.path.exists(tmp_path / "training_x" / "tmp" / "unet_0_tmp.ckpt")
    assert summary["final_step"] > 0


@pytest.mark.slow
def test_training_watchdog_skips_hung_batch(tmp_path, monkeypatch):
    """A batch hung past the watchdog timeout is skipped with a progress-log
    notice and training continues (reference _Timeout, training.py:325-341).
    Batch 0 is exempt (XLA compile)."""
    import time

    import minimagen_tpu.training as training_mod

    monkeypatch.chdir(tmp_path)
    args = load_testing_parameters(get_minimagen_parser().parse_args([]))
    args.IMG_SIDE_LEN = 16
    args.EPOCHS = 1
    args.CHCKPT_NUM = 100
    args.MAX_NUM_WORDS = 8

    ds = SyntheticCaptionedImages(num_items=8, side_length=16, encoder_name="t5_small",
                                  max_length=8)
    collate = MinimagenCollator(max_length=8)
    train_dl = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True,
                          collate_fn=collate, prefetch=0)
    valid_dl = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True, collate_fn=collate)

    imagen = Imagen(unets=[BaseTest()], image_sizes=(16,), timesteps=25,
                    cond_drop_prob=0.15, text_encoder_name="t5_small")
    imagen.init_params(jax.random.PRNGKey(0))
    training_dir = create_directory(str(tmp_path / "training_wd"))

    real_make = training_mod.make_train_step
    calls = {"n": 0}

    def hanging_make_train_step(imagen_arg, optimizer, mesh=None, **kw):
        real_step = real_make(imagen_arg, optimizer, mesh=mesh, **kw)

        def step(state, batch, key):
            calls["n"] += 1
            if calls["n"] == 2:  # second batch hangs (first is compile-exempt)
                time.sleep(3.0)
            return real_step(state, batch, key)

        return step

    monkeypatch.setattr(training_mod, "make_train_step", hanging_make_train_step)
    summary = MinimagenTrain("wd", args, imagen.unet_configs, imagen, train_dl,
                             valid_dl, training_dir, make_optimizer(1e-4), timeout=1)

    log = (tmp_path / "training_wd" / "training_progess.txt").read_text()
    assert "SKIPPED" in log and "watchdog" in log
    # the remaining batches still trained (4 batches total, 1 skipped)
    assert summary["final_step"] >= 2
