"""U-Net config surface + forward shape tests (reference Unet.py:25-750)."""
import dataclasses
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from minimagen_tpu.models.unet import (
    Base,
    BaseTest,
    Super,
    SuperTest,
    Unet,
    UnetConfig,
    UnetModel,
)

KEY = jax.random.PRNGKey(0)


# --------------------------------------------------------------------------- #
# config surface                                                              #
# --------------------------------------------------------------------------- #
def test_unet_alias_is_config():
    assert Unet is UnetConfig


def test_config_defaults_match_reference_ctor():
    """Reference ctor defaults, Unet.py:31-47."""
    cfg = UnetConfig()
    assert cfg.dim == 128
    assert cfg.dim_mults == (1, 2, 4)
    assert cfg.channels == 3
    assert cfg.channels_out is None
    assert cfg.cond_dim is None
    assert cfg.text_embed_dim == 512  # get_encoded_dim('t5_small')
    assert cfg.num_resnet_blocks == 1
    assert cfg.layer_attns is True
    assert cfg.layer_cross_attns is True
    assert cfg.attn_heads == 8
    assert cfg.lowres_cond is False
    assert cfg.memory_efficient is False
    assert cfg.attend_at_middle is False


def test_presets_match_reference_defaults():
    assert Base.defaults["dim"] == 512
    assert Base.defaults["dim_mults"] == (1, 2, 3, 4)
    assert Super.defaults["num_resnet_blocks"] == (2, 4, 8, 8)
    assert Super.defaults["memory_efficient"] is True
    assert BaseTest.defaults["dim"] == 8
    assert SuperTest.defaults["num_resnet_blocks"] == (1, 2)
    # presets construct with their own defaults (deliberate fix of the
    # reference BaseTest/SuperTest bug, Unet.py:722,750)
    assert BaseTest().dim == 8
    assert SuperTest().memory_efficient is True


def test_reference_param_json_roundtrip():
    """The exact JSON from /root/reference/parameters/unet_0_params_*.json
    must load and round-trip."""
    ref_json = {
        "dim": 8, "dim_mults": [1, 2], "channels": 3, "channels_out": None,
        "cond_dim": None, "text_embed_dim": 512, "num_resnet_blocks": 1,
        "layer_attns": False, "layer_cross_attns": False, "attn_heads": 8,
        "lowres_cond": False, "memory_efficient": False, "attend_at_middle": False,
    }
    cfg = UnetConfig.from_dict(ref_json)
    assert cfg.dim == 8 and cfg.dim_mults == (1, 2)
    back = cfg.to_dict()
    assert set(back.keys()) == set(ref_json.keys())
    assert back["dim_mults"] == [1, 2]
    json.dumps(back)  # serializable


def test_cast_model_parameters_semantics():
    """Reference _cast_model_parameters (Unet.py:332-353): identity when
    nothing changes, replace otherwise."""
    cfg = BaseTest()
    same = cfg.cast_model_parameters(
        lowres_cond=False, text_embed_dim=cfg.text_embed_dim, channels=3, channels_out=None
    )
    assert same is cfg
    changed = cfg.cast_model_parameters(
        lowres_cond=True, text_embed_dim=cfg.text_embed_dim, channels=3, channels_out=3
    )
    assert changed.lowres_cond is True and changed.channels_out == 3
    assert changed.dim == cfg.dim


def test_time_cond_dim_doubles_for_lowres():
    assert UnetConfig(dim=8).time_cond_dim == 32
    assert UnetConfig(dim=8, lowres_cond=True).time_cond_dim == 64


# --------------------------------------------------------------------------- #
# forward                                                                     #
# --------------------------------------------------------------------------- #
def _make_inputs(b=2, size=16, channels=3, text_len=6, text_dim=512, lowres=False):
    x = jax.random.uniform(KEY, (b, size, size, channels))
    time = jnp.array([0, 3], jnp.int32)[:b]
    embeds = jax.random.normal(jax.random.PRNGKey(1), (b, text_len, text_dim))
    mask = jnp.ones((b, text_len), bool)
    kwargs = dict(text_embeds=embeds, text_mask=mask)
    if lowres:
        kwargs["lowres_cond_img"] = x
        kwargs["lowres_noise_times"] = time
    return x, time, kwargs


def test_base_test_unet_forward_shape():
    cfg = BaseTest()
    model = UnetModel(config=cfg)
    x, time, kwargs = _make_inputs()
    variables = model.init(KEY, x, time, **kwargs)
    out = model.apply(variables, x, time, **kwargs)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_super_test_unet_lowres_forward_shape():
    cfg = SuperTest().cast_model_parameters(
        lowres_cond=True, text_embed_dim=512, channels=3, channels_out=3
    )
    model = UnetModel(config=cfg)
    x, time, kwargs = _make_inputs(lowres=True)
    variables = model.init(KEY, x, time, **kwargs)
    out = model.apply(variables, x, time, **kwargs)
    assert out.shape == x.shape


def test_unet_with_attention_and_cross_attention():
    cfg = UnetConfig(
        dim=16, dim_mults=(1, 2), num_resnet_blocks=1,
        layer_attns=(False, True), layer_cross_attns=(False, True),
        attn_heads=2, attend_at_middle=True,
    )
    model = UnetModel(config=cfg)
    x, time, kwargs = _make_inputs()
    variables = model.init(KEY, x, time, **kwargs)
    out = model.apply(variables, x, time, **kwargs)
    assert out.shape == x.shape
    params = variables["params"]
    assert "down1_attn" in params and "up0_attn" in params
    assert "mid_attn" in params
    assert "cross_attn" in params["down1_init_block"]
    assert "cross_attn" not in params["down0_init_block"]


def test_memory_efficient_pre_downsample_topology():
    cfg = UnetConfig(dim=8, dim_mults=(1, 2), num_resnet_blocks=(1, 2),
                     layer_attns=False, layer_cross_attns=False, memory_efficient=True)
    model = UnetModel(config=cfg)
    x, time, kwargs = _make_inputs()
    variables = model.init(KEY, x, time, **kwargs)
    out = model.apply(variables, x, time, **kwargs)
    assert out.shape == x.shape
    params = variables["params"]
    assert "down0_pre" in params and "down1_pre" in params
    assert "down0_post" not in params
    # memory_efficient upsamples on the last up layer too (reference Unet.py:313-314)
    assert "up1_upsample" in params


def test_text_keep_mask_null_conditioning_differs():
    """Dropping conditioning (keep=False) must change the output — the null
    embeddings path (reference Unet.py:586-623)."""
    cfg = UnetConfig(dim=8, dim_mults=(1, 2), num_resnet_blocks=1,
                     layer_attns=False, layer_cross_attns=(False, True), attn_heads=2)
    model = UnetModel(config=cfg)
    x, time, kwargs = _make_inputs()
    variables = model.init(KEY, x, time, **kwargs)
    out_kept = model.apply(variables, x, time, **kwargs, text_keep_mask=jnp.array([True, True]))
    out_dropped = model.apply(variables, x, time, **kwargs, text_keep_mask=jnp.array([False, False]))
    assert not np.allclose(np.asarray(out_kept), np.asarray(out_dropped))


def test_unet_is_jittable():
    cfg = BaseTest()
    model = UnetModel(config=cfg)
    x, time, kwargs = _make_inputs()
    variables = model.init(KEY, x, time, **kwargs)

    @jax.jit
    def fwd(v, x, t, te, tm):
        return model.apply(v, x, t, text_embeds=te, text_mask=tm)

    out = fwd(variables, x, time, kwargs["text_embeds"], kwargs["text_mask"])
    assert out.shape == x.shape


def test_remat_preserves_outputs_and_grads():
    """nn.remat blocks must not change forward values or gradients."""
    cfg = UnetConfig(dim=8, dim_mults=(1, 2), num_resnet_blocks=1,
                     layer_attns=(False, True), layer_cross_attns=(False, True), attn_heads=2)
    plain = UnetModel(config=cfg, remat=False)
    remat = UnetModel(config=cfg, remat=True)
    x, time, kwargs = _make_inputs()
    variables = plain.init(KEY, x, time, **kwargs)

    out_a = plain.apply(variables, x, time, **kwargs)
    out_b = remat.apply(variables, x, time, **kwargs)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)

    def loss(m):
        def f(v):
            return jnp.sum(m.apply(v, x, time, **kwargs) ** 2)
        return f

    ga = jax.grad(loss(plain))(variables)["params"]
    gb = jax.grad(loss(remat))(variables)["params"]
    # recompute-order changes introduce cancellation noise in tiny individual
    # grads; assert the GLOBAL relative error is float-noise-level instead
    fa = jnp.concatenate([l.ravel() for l in jax.tree_util.tree_leaves(ga)])
    fb = jnp.concatenate([l.ravel() for l in jax.tree_util.tree_leaves(gb)])
    rel = float(jnp.linalg.norm(fa - fb) / jnp.linalg.norm(fa))
    assert rel < 1e-5, f"remat changed gradients: global rel err {rel}"


def test_conditioning_inputs_all_reach_the_output():
    """Structural connectivity: gradients flow from EVERY conditioning input
    (lowres image, lowres aug times, text embeds, denoise times) to the
    output. Guards against silent conditioning disconnection — a bug class
    whose only other symptom is a mysteriously-high training loss (round-2
    SR-demo diagnosis, tools/lowres_quirk_probe.py)."""
    cfg = SuperTest().cast_model_parameters(
        lowres_cond=True, text_embed_dim=512, channels=3, channels_out=3
    )
    model = UnetModel(config=cfg)
    x, time, kwargs = _make_inputs(lowres=True)
    variables = model.init(KEY, x, time, **kwargs)

    def out_sum(lowres_img, embeds, t):
        kw = dict(kwargs, lowres_cond_img=lowres_img, text_embeds=embeds)
        return model.apply(variables, x, t.astype(jnp.float32), **kw).sum()

    g_img, g_emb, g_t = jax.grad(out_sum, argnums=(0, 1, 2))(
        kwargs["lowres_cond_img"], kwargs["text_embeds"], time.astype(jnp.float32))
    assert float(jnp.abs(g_img).max()) > 0, "lowres_cond_img disconnected"
    assert float(jnp.abs(g_emb).max()) > 0, "text_embeds disconnected"
    assert float(jnp.abs(g_t).max()) > 0, "denoise time disconnected"
