"""Training harness tests: flags, directory layout, config persistence,
restart arg restoration, get_default_args (reference training.py:178-211,
481-671)."""
import json
import os

import numpy as np
import pytest

from minimagen_tpu.models.imagen import Imagen
from minimagen_tpu.models.unet import Base, BaseTest, Super, SuperTest, UnetConfig
from minimagen_tpu.training import (
    create_directory,
    get_default_args,
    get_minimagen_parser,
    get_model_params,
    imagen_config_dict,
    load_restart_training_parameters,
    load_testing_parameters,
    save_training_info,
)


def test_parser_flags_and_defaults():
    """All 15 reference flags with the reference defaults (training.py:178-211)."""
    args = get_minimagen_parser().parse_args([])
    assert args.PARAMETERS is None
    assert args.NUM_WORKERS == 0
    assert args.BATCH_SIZE == 2
    assert args.MAX_NUM_WORDS == 64
    assert args.IMG_SIDE_LEN == 128
    assert args.EPOCHS == 5
    assert args.T5_NAME == "t5_base"
    assert args.TRAIN_VALID_FRAC == 0.9
    assert args.TIMESTEPS == 1000
    assert args.OPTIM_LR == 1e-4
    assert args.ACCUM_ITER == 1
    assert args.CHCKPT_NUM == 500
    assert args.VALID_NUM is None
    assert args.RESTART_DIRECTORY is None
    assert args.TESTING is False


def test_short_flags():
    args = get_minimagen_parser().parse_args(["-b", "8", "-s", "64", "-test"])
    assert args.BATCH_SIZE == 8 and args.IMG_SIDE_LEN == 64 and args.TESTING


def test_load_testing_parameters():
    args = get_minimagen_parser().parse_args([])
    args = load_testing_parameters(args)
    assert args.BATCH_SIZE == 2 and args.MAX_NUM_WORDS == 32
    assert args.IMG_SIDE_LEN == 128 and args.EPOCHS == 2
    assert args.T5_NAME == "t5_small" and args.TIMESTEPS == 25
    assert args.TRAIN_VALID_FRAC == 0.5


def test_create_directory_layout_and_cm(tmp_path):
    d = tmp_path / "training_x"
    cwd = os.getcwd()
    cm = create_directory(str(d))
    for sub in ["parameters", "state_dicts", "tmp"]:
        assert (d / sub).is_dir()
    with cm("parameters"):
        assert os.getcwd() == str(d / "parameters")
        open("probe.txt", "w").close()
    assert os.getcwd() == cwd
    assert (d / "parameters" / "probe.txt").exists()


def test_save_and_reload_training_info_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = load_testing_parameters(get_minimagen_parser().parse_args([]))
    cm = create_directory(str(tmp_path / "training_ts"))

    unets_params = [get_default_args(BaseTest), get_default_args(SuperTest)]
    imagen_params = imagen_config_dict(dict(
        image_sizes=[64, 128], timesteps=25, cond_drop_prob=0.15, text_encoder_name="t5_small"
    ))
    save_training_info(args, "ts", unets_params, imagen_params, 1.234, cm)

    pdir = tmp_path / "training_ts" / "parameters"
    assert (pdir / "training_parameters_ts.txt").exists()
    assert (pdir / "unet_0_params_ts.json").exists()
    assert (pdir / "imagen_params_ts.json").exists()
    # progress log carries model size (reference training.py:617)
    log = (tmp_path / "training_ts" / "training_progess.txt").read_text()
    assert "model size: 1.234MB" in log

    loaded_unets, loaded_imagen = get_model_params(str(pdir))
    assert loaded_unets[0]["dim"] == 8
    assert loaded_imagen["timesteps"] == 25
    # round-trip into real objects
    im = Imagen(unets=[UnetConfig.from_dict(p) for p in loaded_unets],
                **{k: v for k, v in loaded_imagen.items() if k != "unets"})
    assert im.image_sizes == (64, 128)


def test_restart_parameter_restoration(tmp_path, monkeypatch):
    """load_restart_training_parameters restores exactly the 4 immutable args
    (reference training.py:481-517)."""
    monkeypatch.chdir(tmp_path)
    cm = create_directory(str(tmp_path / "old_run"))
    args = get_minimagen_parser().parse_args([])
    args.MAX_NUM_WORDS = 48
    args.IMG_SIDE_LEN = 96
    args.T5_NAME = "t5_small"
    args.TIMESTEPS = 123
    args.BATCH_SIZE = 7  # should NOT be restored
    save_training_info(args, "ts", [], {}, 0.0, cm)

    new_args = get_minimagen_parser().parse_args([])
    new_args.RESTART_DIRECTORY = str(tmp_path / "old_run")
    new_args = load_restart_training_parameters(new_args)
    assert new_args.MAX_NUM_WORDS == 48
    assert new_args.IMG_SIDE_LEN == 96
    assert new_args.T5_NAME == "t5_small"
    assert new_args.TIMESTEPS == 123
    assert new_args.BATCH_SIZE == 2  # untouched default


def test_get_default_args_unet_presets():
    """Preset defaults merge over base defaults (reference training.py:660-671)
    — this is how tiny test models are selected (reference train.py:63-65)."""
    d = get_default_args(BaseTest)
    assert d["dim"] == 8 and d["dim_mults"] == (1, 2)
    assert d["attn_heads"] == 8  # inherited base default
    d2 = get_default_args(Super)
    assert d2["memory_efficient"] is True
    base = get_default_args(UnetConfig)
    assert base["dim"] == 128


def test_get_default_args_plain_callable():
    def f(a, b=3, c="x"):
        pass

    assert get_default_args(f) == {"b": 3, "c": "x"}


def test_reference_parameter_jsons_load():
    """The actual config JSONs shipped in the reference repo must load into
    our config classes (north-star requirement)."""
    ref_dir = "/root/reference/parameters"
    if not os.path.isdir(ref_dir):
        pytest.skip("reference not mounted")
    unets_params, imagen_params = get_model_params(ref_dir)
    unets = [UnetConfig.from_dict(p) for p in unets_params]
    assert unets[0].dim == 8 and unets[1].memory_efficient is True
    im = Imagen(unets=unets, **{k: v for k, v in imagen_params.items() if k != "unets"})
    assert im.image_sizes == (64, 128)
    assert im.noise_schedulers[0].num_timesteps == 25
    assert im.text_encoder_name == "t5_small"
    assert im.unet_configs[1].lowres_cond is True


def test_train_state_roundtrip(tmp_path):
    """Full train-state (params + optimizer moments + step) save/restore."""
    import jax
    from minimagen_tpu.parallel.mesh import create_train_state, make_optimizer
    from minimagen_tpu.training import load_train_state, save_train_state

    imagen = Imagen(unets=[BaseTest()], image_sizes=(8,), timesteps=25,
                    cond_drop_prob=0.1, text_encoder_name="t5_small")
    imagen.init_params(jax.random.PRNGKey(0), batch_size=1, text_len=4)
    opt = make_optimizer(1e-4)
    state = create_train_state(imagen.params, opt)

    path = str(tmp_path / "train_state.ckpt")
    save_train_state(path, state)
    fresh = create_train_state(imagen.params, opt)
    restored = load_train_state(path, fresh)
    assert int(restored.step) == int(state.step)
    import numpy as np
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_imagen_state_dict_shims():
    import jax
    imagen = Imagen(unets=[BaseTest()], image_sizes=(8,), timesteps=25,
                    cond_drop_prob=0.1, text_encoder_name="t5_small")
    params = imagen.init_params(jax.random.PRNGKey(0), batch_size=1, text_len=4)
    sd = imagen.state_dict()
    assert set(sd.keys()) == {"unet_0"}
    imagen.load_state_dict(sd)
    with pytest.raises(AssertionError):
        imagen.load_state_dict({"wrong": 1})
