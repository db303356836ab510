"""Cascade-stage parallelism: each U-Net trains on its own device group.

The reference trains the cascade's U-Nets strictly sequentially on one device
(one backward per unet per batch, training.py:367-372) and swaps inactive
unets to CPU (Imagen.py:180-203).  On a TPU slice the per-stage losses are
*independent* (each stage gets its own noise/times; no cross-stage gradients),
so the natural mapping is one device group per stage: each stage's
data-parallel train step is jitted onto its own sub-mesh, and because JAX
dispatch is asynchronous, issuing all stage steps back-to-back runs them
CONCURRENTLY across groups — wall-clock per batch becomes max(stage times)
instead of sum.

This composes with the intra-group data parallelism of `mesh.py` (each group
is itself a ('data','model') mesh).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np
import optax

from .mesh import Mesh, TrainState, batch_sharding, create_train_state, shard_batch


def make_stage_meshes(num_stages: int, devices=None, *, model_parallel: int = 1) -> List[Mesh]:
    """Split the device pool into `num_stages` equal groups, each a
    ('data','model') mesh."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) % num_stages == 0, (
        f"{len(devices)} devices not divisible into {num_stages} stage groups"
    )
    per = len(devices) // num_stages
    meshes = []
    for s in range(num_stages):
        group = np.asarray(devices[s * per : (s + 1) * per])
        assert per % model_parallel == 0
        meshes.append(Mesh(group.reshape(per // model_parallel, model_parallel),
                           axis_names=("data", "model")))
    return meshes


def make_stage_train_step(imagen, stage: int, optimizer: optax.GradientTransformation,
                          mesh: Optional[Mesh] = None, donate: bool = True):
    """A single-stage jitted train step: (state, batch, key) -> (state, loss)."""
    loss_fn = imagen.stage_loss_fn(stage)

    def step_fn(state: TrainState, batch, key):
        key = jax.random.fold_in(jax.random.fold_in(key, state.step), stage)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, batch["image"], batch["encoding"], batch["mask"], key
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params, opt_state=opt_state), loss

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    bsh = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(None, {"image": bsh, "encoding": bsh, "mask": bsh}, None),
        donate_argnums=(0,) if donate else (),
    )


class CascadeParallelTrainer:
    """Drives one train step per stage per batch, each on its own device
    group, dispatched concurrently (async JAX dispatch)."""

    def __init__(self, imagen, optimizer: optax.GradientTransformation,
                 meshes: Optional[Sequence[Optional[Mesh]]] = None, donate: bool = True):
        self.imagen = imagen
        self.optimizer = optimizer
        self.meshes = list(meshes) if meshes is not None else [None] * imagen.num_unets
        assert len(self.meshes) == imagen.num_unets
        assert imagen.params is not None, "init_params first"

        self.states: List[TrainState] = []
        self.steps = []
        for s in range(imagen.num_unets):
            params = imagen.params[f"unet_{s}"]
            if self.meshes[s] is not None:
                from .mesh import replicated  # noqa: PLC0415

                params = jax.device_put(params, replicated(self.meshes[s]))
            self.states.append(create_train_state(params, optimizer))
            self.steps.append(make_stage_train_step(imagen, s, optimizer, self.meshes[s], donate))

    def step(self, batch: Dict[str, Any], key: jax.Array) -> np.ndarray:
        """One cascade-wide training step; returns per-stage losses."""
        losses = []
        for s in range(self.imagen.num_unets):
            b = shard_batch(batch, self.meshes[s]) if self.meshes[s] is not None else batch
            self.states[s], loss = self.steps[s](self.states[s], b, key)
            losses.append(loss)  # async: do NOT block here
        return np.asarray([float(l) for l in losses])  # sync once at the end

    @property
    def params(self) -> Dict[str, Any]:
        return {f"unet_{s}": jax.device_get(self.states[s].params)
                for s in range(self.imagen.num_unets)}
