"""Pipelined vs sequential cascade serving on the 8-virtual-device CPU mesh.

Structural demonstration for docs/SERVING.md (round-3 VERDICT next #8): the
pipeline server keeps both stage groups busy, so steady-state wall per
request approaches max(stage time) instead of sum. On a single host the
virtual devices share cores, so the CPU numbers UNDERSTATE the win; the
derived figure for disjoint real chips is sum/max.

    JAX_PLATFORMS= python tools/pipeline_bench.py   # forces CPU internally
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MINIMAGEN_TPU_T5_FALLBACK", "1")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/minimagen_tpu_jax_cache")

import jax.numpy as jnp
import numpy as np

from minimagen_tpu.models.imagen import Imagen
from minimagen_tpu.models.unet import UnetConfig
from minimagen_tpu.parallel.cascade import make_stage_meshes
from minimagen_tpu.parallel.pipeline import CascadePipelineServer


def main():
    imagen = Imagen(
        unets=[UnetConfig(dim=32, dim_mults=(1, 2), num_resnet_blocks=2,
                          layer_attns=(False, True), layer_cross_attns=(False, True)),
               UnetConfig(dim=32, dim_mults=(1, 2), num_resnet_blocks=2,
                          layer_attns=False, layer_cross_attns=(False, True),
                          lowres_cond=True, memory_efficient=True)],
        image_sizes=(16, 32), timesteps=100, cond_drop_prob=0.1,
        text_encoder_name="t5_small")
    imagen.init_params(jax.random.PRNGKey(0), batch_size=2, text_len=8)

    rng = np.random.default_rng(0)
    n_req, b, L = 8, 4, 8
    reqs = [{"text_embeds": jnp.asarray(rng.normal(size=(b, L, 512)), jnp.float32),
             "text_masks": jnp.ones((b, L), jnp.bool_),
             "key": jax.random.PRNGKey(i)} for i in range(n_req)]
    steps = (16, 8)

    # sequential: full mesh per request, stages back-to-back
    seq = lambda req: np.asarray(imagen.sample(
        text_embeds=req["text_embeds"], text_masks=req["text_masks"],
        cond_scale=3.0, sampler="ddim", sample_steps=steps,
        cache_interval=None, key=req["key"]))
    seq(reqs[0])  # compile
    t0 = time.time()
    for r in reqs:
        seq(r)
    t_seq = time.time() - t0

    server = CascadePipelineServer(imagen, make_stage_meshes(2), cond_scale=3.0,
                                   sampler="ddim", sample_steps=steps, depth=3)
    list(server.serve(iter(reqs[:2])))  # compile both stages on their groups
    t0 = time.time()
    outs = list(server.serve(iter(reqs)))
    t_pipe = time.time() - t0
    assert len(outs) == n_req

    print(f"sequential: {t_seq / n_req * 1e3:.1f} ms/request "
          f"| pipelined (2 groups): {t_pipe / n_req * 1e3:.1f} ms/request "
          f"| ratio {t_seq / t_pipe:.2f}x on shared-core CPU devices")


if __name__ == "__main__":
    main()
