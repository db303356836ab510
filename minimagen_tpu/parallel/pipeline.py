"""Pipelined cascade serving: each stage samples on its own device group.

`Imagen.sample()` runs the cascade's stages strictly sequentially on one
device set, exactly like the reference (Imagen.py:468-499): stage 2 idles
while stage 1 denoises the next request and vice versa. On a multi-chip
slice the stages are independent programs with a one-way data dependency, so
the TPU-native serving shape is a PIPELINE over disjoint device groups
(reusing `make_stage_meshes` from cascade-stage *training* parallelism):

- stage s's params live on group s (replicated over its 'data' axis, wide
  kernels over 'model' if present);
- a request's stage-s output is device_put to group s+1 (async ICI/DCN
  transfer) where the lowres resize+noising glue and the next stage run;
- the host dispatches WITHOUT syncing, so group 0 starts request i+1 while
  group 1 still denoises request i — steady-state throughput becomes
  1/max(stage time) instead of 1/sum (2 groups ≈ 2× when stages are
  balanced; the measured flagship split is in docs/SERVING.md).

Numerics are IDENTICAL to `Imagen.sample()` at the same key: the per-stage
PRNG split sequence below mirrors sample()'s loop exactly (pinned by
tests/test_pipeline.py).
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.helpers import default, exists
from ..ops.resize import resize_image_to
from .cascade import make_stage_meshes
from .mesh import Mesh, batch_sharding, infer_param_shardings, place_params


class CascadePipelineServer:
    """Streamed cascade sampling over per-stage device groups.

    :param imagen: an `Imagen` with attached (or passed) params.
    :param meshes: one ('data','model') mesh per stage; defaults to an equal
        split of all visible devices (`make_stage_meshes`).
    :param sample_steps: int or per-stage sequence (the production lever —
        see docs/SERVING.md).
    :param cache_interval: per-stage encoder-feature caching; None = exact
        (an int or None; 'auto' is resolved per stage like sample()).
    :param depth: max requests in flight before the server blocks on the
        oldest result (bounds device memory: each in-flight request holds
        one stage's activations per group).
    """

    def __init__(self, imagen, meshes: Optional[Sequence[Mesh]] = None, *,
                 cond_scale: float = 3.0, sampler: str = "ddim",
                 sample_steps=None, grid: str = "time",
                 cache_interval=None, lowres_sample_noise_level=None,
                 params: Optional[Dict[str, Any]] = None, depth: int = 2,
                 guidance_rescale: float = 0.0):
        self.imagen = imagen
        self.meshes = list(meshes) if meshes is not None else make_stage_meshes(imagen.num_unets)
        assert len(self.meshes) == imagen.num_unets
        self.cond_scale = float(cond_scale)
        self.guided = cond_scale != 1.0
        self.sampler = sampler
        self.sample_steps = sample_steps
        self.grid = grid
        self.cache_interval = cache_interval
        self.guidance_rescale = float(guidance_rescale)
        self.noise_level = default(lowres_sample_noise_level,
                                   imagen.lowres_sample_noise_level)
        self.depth = int(depth)

        src = params if params is not None else imagen.params
        assert src is not None, "init_params / pass params first"
        self.params: List[Any] = []
        self.batch_shardings: List[Any] = []
        for s, mesh in enumerate(self.meshes):
            p = src[f"unet_{s}"]
            self.params.append(place_params(
                p, infer_param_shardings(p, mesh)))
            self.batch_shardings.append(batch_sharding(mesh))

    def _stage_steps(self, stage: int):
        if isinstance(self.sample_steps, (list, tuple)):
            return self.sample_steps[stage]
        return self.sample_steps

    def submit(self, text_embeds, text_masks=None, *, key=None) -> jax.Array:
        """Dispatch ONE request through all stages without any host sync;
        returns the final stage's (unsynced) device array on the last group.

        Mirrors `Imagen.sample()`'s per-stage PRNG splits and lowres glue
        (imagen.py stage loop) so outputs match sample() bitwise at the
        same key.
        """
        imagen = self.imagen
        key = default(key, lambda: jax.random.PRNGKey(
            int.from_bytes(__import__("os").urandom(4), "little")))
        text_embeds = jnp.asarray(text_embeds, jnp.float32)
        text_masks = jnp.asarray(text_masks, jnp.bool_) if exists(text_masks) else None
        batch_size = text_embeds.shape[0]

        img = None
        for stage, mesh in enumerate(self.meshes):
            n_data = mesh.shape["data"]
            assert batch_size % n_data == 0, (
                f"batch {batch_size} must divide stage-{stage} data axis {n_data}")
            bsh = self.batch_shardings[stage]
            embeds_s = jax.device_put(text_embeds, bsh)
            masks_s = jax.device_put(text_masks, bsh) if text_masks is not None else None

            key, stage_key, aug_key = jax.random.split(key, 3)
            lowres_cond_img = lowres_noise_times = None
            if imagen.unet_configs[stage].lowres_cond:
                # move the previous group's output here FIRST so the resize
                # + noising glue runs on THIS stage's group
                img = jax.device_put(img, bsh)
                lowres_noise_times = jax.device_put(
                    imagen.lowres_noise_schedule.get_times(batch_size, self.noise_level), bsh)
                lowres_cond_img = resize_image_to(img, imagen.image_sizes[stage])
                lowres_cond_img = imagen.lowres_noise_schedule.q_sample(
                    x_start=lowres_cond_img, t=lowres_noise_times,
                    noise=jax.random.normal(aug_key, lowres_cond_img.shape,
                                            lowres_cond_img.dtype))

            stage_cache = imagen._resolve_cache_interval(
                self.cache_interval, stage,
                batch_size * (2 if self.guided else 1), text_embeds.shape[1])
            sample_fn = imagen._jitted_sample_stage(
                stage, self.guided, self.sampler, self._stage_steps(stage),
                False, stage_cache, grid=self.grid,
                guidance_rescale=self.guidance_rescale)
            img = sample_fn(self.params[stage], stage_key, embeds_s, masks_s,
                            jnp.float32(self.cond_scale), lowres_cond_img,
                            lowres_noise_times)
        return img

    def serve(self, requests: Iterable[Dict[str, Any]]):
        """Generator: pipeline a stream of requests, yielding host numpy
        images in order. Keeps up to `depth` requests in flight — group 0
        denoises request i+1 while group 1 super-resolves request i.

        Each request is a dict with 'text_embeds', optional 'text_masks',
        optional 'key'.
        """
        inflight: List[jax.Array] = []
        for req in requests:
            inflight.append(self.submit(req["text_embeds"],
                                        req.get("text_masks"),
                                        key=req.get("key")))
            if len(inflight) > self.depth:
                yield np.asarray(inflight.pop(0))  # sync oldest only
        while inflight:
            yield np.asarray(inflight.pop(0))
