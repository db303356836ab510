"""Pipelined cascade serving (round-3 VERDICT next #8): per-stage device
groups, outputs bitwise-matching sequential `sample()` at the same key."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minimagen_tpu.models.imagen import Imagen
from minimagen_tpu.models.unet import BaseTest, UnetConfig
from minimagen_tpu.parallel.cascade import make_stage_meshes
from minimagen_tpu.parallel.pipeline import CascadePipelineServer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def cascade2():
    imagen = Imagen(
        unets=[BaseTest(), UnetConfig(dim=16, dim_mults=(1, 2), num_resnet_blocks=1,
                                      layer_attns=False, layer_cross_attns=(False, True),
                                      lowres_cond=True, memory_efficient=True)],
        image_sizes=(8, 16), timesteps=25, cond_drop_prob=0.1,
        text_encoder_name="t5_small")
    imagen.init_params(jax.random.PRNGKey(0), batch_size=2, text_len=4)
    return imagen


def _req(seed, b=4, L=4):
    rng = np.random.default_rng(seed)
    return {"text_embeds": jnp.asarray(rng.normal(size=(b, L, 512)), jnp.float32),
            "text_masks": jnp.ones((b, L), jnp.bool_),
            "key": jax.random.PRNGKey(seed)}


def test_pipeline_matches_sequential_sample(cascade2):
    """submit() == sample(cache_interval=None) at the same key: the pipeline
    replays sample()'s exact per-stage PRNG splits; only the device placement
    differs (stage 0 on group 0, stage 1 on group 1)."""
    meshes = make_stage_meshes(2)
    server = CascadePipelineServer(cascade2, meshes, cond_scale=3.0,
                                   sampler="ddim", sample_steps=3)
    req = _req(17)
    out = np.asarray(server.submit(req["text_embeds"], req["text_masks"],
                                   key=req["key"]))
    plain = cascade2.sample(text_embeds=req["text_embeds"],
                            text_masks=req["text_masks"], cond_scale=3.0,
                            sampler="ddim", sample_steps=3,
                            cache_interval=None, key=req["key"])
    assert out.shape == (4, 16, 16, 3)
    np.testing.assert_allclose(out, np.asarray(plain), rtol=2e-5, atol=2e-6)


def test_pipeline_stage_placement(cascade2):
    """Each stage's params live on its own disjoint device group."""
    meshes = make_stage_meshes(2)
    server = CascadePipelineServer(cascade2, meshes, sample_steps=3)
    dev0 = {d.id for l in jax.tree_util.tree_leaves(server.params[0])
            for d in l.sharding.device_set}
    dev1 = {d.id for l in jax.tree_util.tree_leaves(server.params[1])
            for d in l.sharding.device_set}
    assert dev0.isdisjoint(dev1) and len(dev0) == len(dev1) == 4


def test_pipeline_serve_stream_in_order(cascade2):
    """serve() yields results in request order and matches per-request
    sequential sampling; up to `depth` requests are in flight."""
    meshes = make_stage_meshes(2)
    server = CascadePipelineServer(cascade2, meshes, cond_scale=3.0,
                                   sampler="ddim", sample_steps=3, depth=2)
    reqs = [_req(s) for s in (1, 2, 3)]
    outs = list(server.serve(iter(reqs)))
    assert len(outs) == 3
    for req, out in zip(reqs, outs):
        ref = cascade2.sample(text_embeds=req["text_embeds"],
                              text_masks=req["text_masks"], cond_scale=3.0,
                              sampler="ddim", sample_steps=3,
                              cache_interval=None, key=req["key"])
        np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_pipeline_per_stage_step_budgets(cascade2):
    """Per-stage sample_steps sequences work through the pipeline."""
    server = CascadePipelineServer(cascade2, make_stage_meshes(2),
                                   sampler="ddim", sample_steps=(4, 2))
    req = _req(9)
    out = np.asarray(server.submit(req["text_embeds"], req["text_masks"],
                                   key=req["key"]))
    assert out.shape == (4, 16, 16, 3) and np.all(np.isfinite(out))
