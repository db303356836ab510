"""Training harness: argparse flags, training-directory persistence, config
round-trip, the training loop with periodic/best checkpoints and validation.

Capability parity with the reference harness (/root/reference/minimagen/
training.py — SURVEY.md §2b rows O/P/Q/R and §5):

- `get_minimagen_parser`: the same 15 command-line flags with the same
  defaults (training.py:178-211).
- Training directory layout `training_<ts>/{parameters,state_dicts,tmp}` with
  `create_directory` returning a chdir context manager (training.py:559-581),
  `training_progess.txt` append-only log (same filename, including the
  reference's historical spelling, for directory-format compatibility),
  `parameters/training_parameters_<ts>.txt` flag dump and
  `unet_<i>_params_<ts>.json` / `imagen_params_<ts>.json` configs
  (training.py:596-625) — byte-compatible schema with the reference JSONs.
- `load_restart_training_parameters` (restores MAX_NUM_WORDS, IMG_SIDE_LEN,
  T5_NAME, TIMESTEPS from the saved flags txt, training.py:481-517) and
  `load_testing_parameters` (tiny test values, training.py:520-556).
- `MinimagenTrain`: per-epoch/batch loop training EVERY unet per batch,
  periodic tmp checkpoints + full validation sweep every CHCKPT_NUM batches
  (incl. batch 0), best-validation-loss checkpoints per unet, crash dumps on
  exception (training.py:344-478).

TPU-first changes (documented deviations):
- One fused jitted train step computes all stage losses and applies a single
  clipped Adam update (see parallel/mesh.py) instead of N sequential
  backwards; gradient accumulation via optax.MultiSteps.
- Checkpoints are flax msgpack param trees named `unet_<i>_state_<ts>.ckpt`
  (torch .pth pickles are not meaningful here); the load path accepts both
  the state_dicts/ and tmp/ fallback like the reference (generate.py:91-119).
  Full-train-state checkpoints (params + Adam moments + step — beyond the
  reference's weights-only restart) go to `tmp/train_state.ckpt` msgpack on
  single-device runs and to the sharded Orbax directory
  `tmp/train_state_orbax/` on mesh runs; resume restores onto the NEW run's
  mesh shardings, so the mesh shape may change across restarts.
- Per-batch hang protection is two-layer: fetch timeouts in the data loader
  (dataset.py fetch_timeout) AND a loop-level SIGALRM watchdog equivalent to
  the reference's `_Timeout` (training.py:325-341) that skips a batch hung
  anywhere in the batch path. The first batch of a run is exempt (it includes
  XLA compilation, which legitimately takes minutes cold); platforms without
  SIGALRM fall back to no watchdog like the reference's AttributeError path.
- The progress log's running-average loss divides by max(batch_num, 1)
  (the reference divides by 0 on the first checkpoint, training.py:392 —
  a deliberate fix).
"""
from __future__ import annotations

import dataclasses
import inspect
import json
import os
import time
from argparse import ArgumentParser
from contextlib import contextmanager
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization

from .models.imagen import Imagen
from .models.unet import UnetConfig
from .utils.profiling import StepTimer
from .utils.progress import ProgressBar


def _maybe_len(loader) -> Optional[int]:
    try:
        return len(loader)
    except TypeError:
        return None
from .parallel.mesh import (
    create_train_state,
    device_prefetch,
    infer_param_shardings,
    make_eval_step,
    make_optimizer,
    make_train_step,
    place_params,
    shard_batch,
    fsdp_shardings,
    zero1_shardings,
)

# re-exports for reference API parity (reference training.py exposes these)
from .data.dataset import ConceptualCaptions, MinimagenDataset  # noqa: F401
from .data.collate import DataLoader, MinimagenCollator, get_minimagen_dl_opts  # noqa: F401


# --------------------------------------------------------------------------- #
# CLI flags (reference training.py:178-211)                                   #
# --------------------------------------------------------------------------- #
def get_minimagen_parser() -> ArgumentParser:
    """Returns parser for MinImagen training — same flags/defaults as the
    reference (training.py:178-211)."""
    parser = ArgumentParser()
    parser.add_argument("-p", "--PARAMETERS", dest="PARAMETERS",
                        help="Parameters directory to load Imagen from", default=None, type=str)
    parser.add_argument("-n", "--NUM_WORKERS", dest="NUM_WORKERS",
                        help="Number of workers for DataLoader", default=0, type=int)
    parser.add_argument("-b", "--BATCH_SIZE", dest="BATCH_SIZE", help="Batch size", default=2, type=int)
    parser.add_argument("-mw", "--MAX_NUM_WORDS", dest="MAX_NUM_WORDS",
                        help="Maximum number of words allowed in a caption", default=64, type=int)
    parser.add_argument("-s", "--IMG_SIDE_LEN", dest="IMG_SIDE_LEN",
                        help="Side length of square Imagen output images", default=128, type=int)
    parser.add_argument("-e", "--EPOCHS", dest="EPOCHS", help="Number of training epochs", default=5, type=int)
    parser.add_argument("-t5", "--T5_NAME", dest="T5_NAME",
                        help="Name of T5 encoder to use", default="t5_base", type=str)
    parser.add_argument("-f", "--TRAIN_VALID_FRAC", dest="TRAIN_VALID_FRAC",
                        help="Fraction of dataset to use for training (vs. validation)", default=0.9, type=float)
    parser.add_argument("-t", "--TIMESTEPS", dest="TIMESTEPS",
                        help="Number of timesteps in Diffusion process", default=1000, type=int)
    parser.add_argument("-lr", "--OPTIM_LR", dest="OPTIM_LR",
                        help="Learning rate for Adam optimizer", default=0.0001, type=float)
    parser.add_argument("-ai", "--ACCUM_ITER", dest="ACCUM_ITER",
                        help="Number of batches for gradient accumulation", default=1, type=int)
    parser.add_argument("-cn", "--CHCKPT_NUM", dest="CHCKPT_NUM",
                        help="Checkpointing batch number interval", default=500, type=int)
    parser.add_argument("-vn", "--VALID_NUM", dest="VALID_NUM",
                        help="Number of validation images to use. If None, uses full amount from train/valid split",
                        default=None, type=int)
    parser.add_argument("-rd", "--RESTART_DIRECTORY", dest="RESTART_DIRECTORY",
                        help="Training directory to resume training from if restarting.", default=None, type=str)
    parser.add_argument("-test", "--TESTING", dest="TESTING",
                        help="Whether to test with smaller dataset", action="store_true")
    parser.set_defaults(TESTING=False)
    # TPU-era extra (documented deviation; the reference has no EMA): decay of
    # an exponential moving average of the weights, tracked inside the fused
    # train step; checkpoints/validation then use the EMA weights. 0 = off.
    parser.add_argument("--EMA", dest="EMA", type=float, default=0.0,
                        help="EMA decay for model weights (e.g. 0.9999); 0 disables")
    return parser


def load_restart_training_parameters(args, justparams: bool = False):
    """Restore the immutable args (MAX_NUM_WORDS, IMG_SIDE_LEN, T5_NAME,
    TIMESTEPS) from a previous run's flags txt (reference training.py:481-517)."""
    if justparams:
        params = args.PARAMETERS
    else:
        params = os.path.join(args.RESTART_DIRECTORY, "parameters")

    file = [f for f in os.listdir(params) if f.startswith("training_")][0]
    with open(os.path.join(params, file), "r") as f:
        lines = f.readlines()

    to_keep = ["MAX_NUM_WORDS", "IMG_SIDE_LEN", "T5_NAME", "TIMESTEPS"]
    d: Dict[str, Any] = {}
    for line in lines:
        if not any(line.startswith(f"--{k}") for k in to_keep):
            continue
        key, _, value = line.partition("=")
        value = value.rstrip("\n")
        try:
            d[key[2:]] = int(value)
        except ValueError:
            d[key[2:]] = value

    args.__dict__ = {**args.__dict__, **d}
    return args


def load_testing_parameters(args):
    """Tiny-compute test values (reference training.py:520-556)."""
    d = dict(
        BATCH_SIZE=2,
        MAX_NUM_WORDS=32,
        IMG_SIDE_LEN=128,
        EPOCHS=2,
        T5_NAME="t5_small",
        TRAIN_VALID_FRAC=0.5,
        TIMESTEPS=25,  # do not make less than 20
        OPTIM_LR=0.0001,
    )
    args.__dict__ = {**args.__dict__, **d}
    return args


# --------------------------------------------------------------------------- #
# training directory persistence (reference training.py:559-671)              #
# --------------------------------------------------------------------------- #
def create_directory(dir_path: str):
    """Create `dir_path` with parameters/, state_dicts/, tmp/ subdirs and
    return a chdir context manager taking an optional subdir argument
    (reference training.py:559-581)."""
    original_dir = os.getcwd()
    dir_path = os.path.abspath(dir_path)
    if not os.path.exists(dir_path):
        os.makedirs(dir_path)
        for sub in ["parameters", "state_dicts", "tmp"]:
            os.makedirs(os.path.join(dir_path, sub))

    @contextmanager
    def cm(subpath: str = ""):
        os.chdir(os.path.join(dir_path, subpath))
        try:
            yield
        finally:
            os.chdir(original_dir)

    return cm


def get_model_size(imagen: Imagen, params: Optional[Dict] = None) -> float:
    """Model size in MB: params + schedule buffers (reference training.py:584-593)."""
    params = params if params is not None else imagen.params
    assert params is not None, "initialize params first"
    param_bytes = sum(leaf.size * leaf.dtype.itemsize for leaf in jax.tree_util.tree_leaves(params))
    buffer_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for sched in (*imagen.noise_schedulers, imagen.lowres_noise_schedule)
        for leaf in jax.tree_util.tree_leaves(sched)
    )
    return (param_bytes + buffer_bytes) / 1024**2


def save_training_info(args, timestamp: str, unets_params: List[dict], imagen_params: dict,
                       model_size: float, training_dir) -> None:
    """Write flags txt, model-size log line, and the unet/imagen JSON configs
    (reference training.py:596-625; JSON schema identical to the reference's
    parameters/*.json files)."""
    with training_dir("parameters"):
        with open(f"training_parameters_{timestamp}.txt", "w") as f:
            for k in args.__dict__.keys():
                f.write(f"--{k}={getattr(args, k)}\n")

    with training_dir():
        with open("training_progess.txt", "a") as f:
            if getattr(args, "RESTART_DIRECTORY", None) is not None:
                f.write(f"STARTED FROM CHECKPOINT {args.RESTART_DIRECTORY}\n")
            f.write(f"model size: {model_size:.3f}MB\n\n")

    with training_dir("parameters"):
        for idx, param in enumerate(unets_params):
            with open(f"unet_{idx}_params_{timestamp}.json", "w") as f:
                json.dump(param, f, indent=4)
        with open(f"imagen_params_{timestamp}.json", "w") as f:
            json.dump(imagen_params, f, indent=4)


def get_model_params(parameters_dir: str):
    """Read unet/imagen param JSONs from a parameters directory
    (reference training.py:628-657)."""
    im_params = None
    unets_params: List[Any] = []
    for file in os.listdir(parameters_dir):
        if file.startswith("imagen"):
            im_params = file
        elif file.startswith("unet_"):
            unets_params.append(file)
    unets_params = sorted(unets_params, key=lambda x: int(x.split("_")[1]))

    loaded = []
    for filepath in unets_params:
        with open(os.path.join(parameters_dir, filepath), "r") as f:
            loaded.append(json.loads(f.read()))
    with open(os.path.join(parameters_dir, im_params), "r") as f:
        im_params = json.loads(f.read())
    return loaded, im_params


def get_default_args(obj) -> Dict[str, Any]:
    """Default arguments of a callable or config class; preset config classes
    merge their `defaults` dict over the base defaults (reference
    training.py:660-671)."""
    if inspect.isclass(obj) and issubclass(obj, UnetConfig):
        base = {f.name: f.default for f in dataclasses.fields(UnetConfig)
                if f.default is not dataclasses.MISSING}
        base.pop("defaults", None)
        if obj is not UnetConfig:
            return {**base, **obj.defaults}
        return base

    signature = inspect.signature(obj.__init__ if inspect.isclass(obj) else obj)
    return {
        k: v.default
        for k, v in signature.parameters.items()
        if v.default is not inspect.Parameter.empty
    }


def imagen_config_dict(imagen_kwargs: Dict[str, Any]) -> Dict[str, Any]:
    """Complete an Imagen kwargs dict with defaults for the config JSON
    (same completion step as reference train.py:89-91)."""
    defaults = get_default_args(Imagen)
    for k in ("dtype", "remat"):
        defaults.pop(k, None)
    out = {**defaults, **imagen_kwargs}
    for k in ("unets", "dtype", "remat"):
        out.pop(k, None)
    if isinstance(out.get("image_sizes"), tuple):
        out["image_sizes"] = list(out["image_sizes"])
    return out


# --------------------------------------------------------------------------- #
# checkpoint IO                                                               #
# --------------------------------------------------------------------------- #
def save_unet_checkpoint(path: str, unet_params) -> None:
    """Serialize one unet's param tree to flax msgpack bytes."""
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(unet_params)))


TRAIN_STATE_FILE = "train_state.ckpt"
ORBAX_STATE_DIR = "train_state_orbax"


def save_train_state(path: str, state) -> None:
    """Serialize the FULL train state (params + optimizer state + step).

    The reference can only resume model weights (optimizer state restarts
    fresh, train.py:82-87); this restores Adam moments and the step counter
    too."""
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))


def load_train_state(path: str, template):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


# ---- Orbax path: sharded/async checkpointing for states that exceed host    #
# RAM or live sharded on a mesh (msgpack gathers to host; orbax writes        #
# per-shard files and restores with the target sharding) -------------------- #
def save_train_state_orbax(directory: str, state) -> None:
    """Save a TrainState (possibly mesh-sharded) with orbax.StandardCheckpointer."""
    import orbax.checkpoint as ocp  # noqa: PLC0415

    path = os.path.abspath(directory)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_train_state_orbax(directory: str, template):
    """Restore a TrainState saved by :func:`save_train_state_orbax`.

    `template` provides structure/dtypes AND target shardings (pass a state
    whose arrays carry the desired NamedShardings to restore sharded)."""
    import orbax.checkpoint as ocp  # noqa: PLC0415

    path = os.path.abspath(directory)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def load_unet_checkpoint(path: str, template) -> Any:
    """Deserialize one unet's param tree using `template` for structure."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


CKPT_EXT = "ckpt"


class BatchTimeoutError(Exception):
    """A training batch exceeded the watchdog timeout (skipped, not fatal)."""


class _Timeout:
    """Per-batch SIGALRM watchdog (reference `_Timeout`, training.py:325-341):
    raises :class:`BatchTimeoutError` if the wrapped block runs longer than
    `seconds`. Inactive (no-op) when `seconds` is falsy, off the main thread,
    or on platforms without SIGALRM (the reference's Windows fallback)."""

    def __init__(self, seconds: Optional[int]):
        import signal
        import threading

        self._signal = signal
        self.seconds = seconds
        self.active = bool(seconds) and hasattr(signal, "SIGALRM") and (
            threading.current_thread() is threading.main_thread()
        )

    def _handler(self, signum, frame):
        raise BatchTimeoutError(f"batch exceeded {self.seconds}s watchdog")

    def __enter__(self):
        if self.active:
            self._prev = self._signal.signal(self._signal.SIGALRM, self._handler)
            self._signal.alarm(self.seconds)
        return self

    def __exit__(self, *exc):
        if self.active:
            self._signal.alarm(0)
            self._signal.signal(self._signal.SIGALRM, self._prev)
        return False


# --------------------------------------------------------------------------- #
# the training loop (reference MinimagenTrain, training.py:344-478)           #
# --------------------------------------------------------------------------- #
def MinimagenTrain(timestamp, args, unets, imagen: Imagen, train_dataloader,
                   valid_dataloader, training_dir, optimizer=None, timeout: int = 60,
                   mesh=None, seed: int = 0) -> Dict[str, Any]:
    """Training loop for a MinImagen instance.

    :param unets: list of UnetConfig (accepted for reference signature parity;
        the authoritative configs are `imagen.unet_configs`).
    :param optimizer: optax transformation; defaults to clipped Adam at
        args.OPTIM_LR with args.ACCUM_ITER accumulation.
    :param timeout: per-batch watchdog seconds (reference training.py:325-341);
        a batch hung longer than this anywhere in the batch path is skipped
        with a progress-log notice. The first batch is exempt (XLA compile).
        None/0 disables; complements the dataset-level fetch timeouts.
    :param mesh: optional jax.sharding.Mesh for data/tensor parallelism.
    :return: summary dict (final train state is saved to disk).
    """
    num_unets = imagen.num_unets
    assert imagen.params is not None, "imagen.init_params(...) must run before training"

    optimizer = optimizer if optimizer is not None else make_optimizer(
        args.OPTIM_LR, getattr(args, "ACCUM_ITER", 1)
    )
    ema_decay = float(getattr(args, "EMA", 0.0) or 0.0)
    shard_mode = getattr(args, "ZERO1", "on")  # "on"=ZeRO-1, "fsdp"=ZeRO-3, "off"
    sharded = shard_mode != "off" and mesh is not None \
        and mesh.shape["data"] > 1
    state_shardings = grad_shardings = None
    if mesh is not None:
        if sharded and shard_mode == "fsdp" and mesh.shape.get("model", 1) == 1:
            # FSDP / ZeRO-3: params AND optimizer state sharded over 'data'
            # (gather-at-use); per-chip params+m/v+EMA memory ~1/N — numerics
            # identical to replicated (tests/test_parallel.py)
            params = imagen.params
            state_shardings, grad_shardings = fsdp_shardings(
                params, optimizer, mesh, ema=ema_decay > 0.0)
        else:
            # commit params onto the mesh (replicated over 'data', wide
            # kernels sharded over 'model' when it exists)
            param_shardings = infer_param_shardings(imagen.params, mesh)
            params = place_params(imagen.params, param_shardings)
            if sharded:
                # ZeRO-1 (default for mesh runs): Adam moments / accumulators
                # / EMA sharded over 'data' — numerics identical to replicated
                # (tests/test_parallel.py), 1/N optimizer HBM+traffic per chip
                state_shardings, grad_shardings = zero1_shardings(
                    params, optimizer, mesh, ema=ema_decay > 0.0,
                    params_shardings=param_shardings)
    else:
        params = imagen.params
    state = create_train_state(params, optimizer, mesh=mesh, ema=ema_decay > 0.0,
                               state_shardings=state_shardings)

    # full-state resume (optimizer moments + step), beyond the reference's
    # weights-only restart. Mesh runs resume from the Orbax directory —
    # restoring straight onto THIS run's shardings, even if the mesh shape
    # changed since the checkpoint was written; the msgpack file is the
    # single-device fallback.
    restart_dir = getattr(args, "RESTART_DIRECTORY", None)
    if restart_dir is not None:
        orbax_path = os.path.join(restart_dir, "tmp", ORBAX_STATE_DIR)
        ts_path = os.path.join(restart_dir, "tmp", TRAIN_STATE_FILE)
        if os.path.isdir(orbax_path):
            state = load_train_state_orbax(orbax_path, state)
            print(f"Restored full train state (step {int(state.step)}) from {orbax_path} [orbax]")
        elif os.path.exists(ts_path):
            state = load_train_state(ts_path, state)
            print(f"Restored full train state (step {int(state.step)}) from {ts_path}")
    train_step = make_train_step(imagen, optimizer, mesh=mesh, ema_decay=ema_decay,
                                 state_shardings=state_shardings,
                                 grad_shardings=grad_shardings)
    eval_step = make_eval_step(imagen, mesh=mesh)
    base_key = jax.random.PRNGKey(seed)

    def _eval_params(state):
        """Weights used for validation + unet checkpoints: the EMA when it is
        tracked (standard diffusion practice; documented deviation from the
        reference), the raw params otherwise. The full state keeps both."""
        return state.ema_params if state.ema_params is not None else state.params

    def _dump_tmp(params, full_state=None):
        with training_dir("tmp"):
            for idx in range(num_unets):
                save_unet_checkpoint(f"unet_{idx}_tmp.{CKPT_EXT}", params[f"unet_{idx}"])
            if full_state is not None:
                if mesh is not None:
                    # Orbax is the DEFAULT for mesh runs: per-shard files,
                    # no full gather to host RAM (msgpack would), restorable
                    # onto a different mesh shape
                    save_train_state_orbax(ORBAX_STATE_DIR, full_state)
                else:
                    save_train_state(TRAIN_STATE_FILE, full_state)

    def _validate(params, epoch_key):
        running = np.zeros(num_unets)
        n_batches = 0
        vbar = ProgressBar(total=_maybe_len(valid_dataloader), desc="validation")
        for vbatch in valid_dataloader:
            vbar.update()
            if not vbatch:
                continue
            if mesh is not None:
                vbatch = shard_batch(vbatch, mesh)
            losses = eval_step(params, vbatch, jax.random.fold_in(epoch_key, n_batches))
            running += np.asarray(losses)
            n_batches += 1
        vbar.close()
        return running / max(n_batches, 1)

    best_loss = np.full(num_unets, 9999999.0)  # init like reference training.py:437
    history: List[Dict[str, Any]] = []
    timer = StepTimer()

    for epoch in range(args.EPOCHS):
        print(f'\n{"-" * 20} EPOCH {epoch + 1} {"-" * 20}')
        with training_dir():
            with open("training_progess.txt", "a") as f:
                f.write(f'{"-" * 20} EPOCH {epoch + 1} {"-" * 20}\n')

        epoch_key = jax.random.fold_in(base_key, epoch)
        running_train_loss = np.zeros(num_unets)
        print(f'\n{"-" * 10}Training...{"-" * 10}')

        # device-prefetch: the next batches transfer to device while the
        # current step computes (async device_put)
        batch_iter = device_prefetch(train_dataloader, mesh=mesh, size=2)
        batch_num = -1
        bar = ProgressBar(total=_maybe_len(train_dataloader), desc=f"epoch {epoch + 1} train")
        while True:
            # loader failures get the same crash-dump treatment as batch
            # failures (the reference's dataset failures surface as Nones;
            # a hard raise here would otherwise escape the handler)
            try:
                batch = next(batch_iter)
            except StopIteration:
                break
            except Exception as e:
                with training_dir():
                    with open("training_progess.txt", "a") as f:
                        f.write(f"\n\nDATA LOADER FAILED AT EPOCH {epoch} with exception {e}. "
                                f"MOST RECENT STATE DICTS SAVED TO ./tmp IN TRAINING FOLDER\n")
                _dump_tmp(_eval_params(state), full_state=state)
                break
            batch_num += 1
            bar.update()
            try:
                if not batch:
                    continue  # fully-failed batch: skip (reference training.py:452-453)

                # SIGALRM watchdog skips hung batches (reference _Timeout,
                # training.py:325-341); batch 0 is exempt — it includes the
                # one-time XLA compile
                with _Timeout(timeout if batch_num > 0 else None):
                    with timer.step():
                        state, losses = train_step(state, batch, epoch_key)
                        losses_np = np.asarray(losses)  # blocks on device result
                running_train_loss += losses_np

                # periodic checkpoint + validation sweep (reference training.py:379-435)
                if batch_num % args.CHCKPT_NUM == 0:
                    with training_dir():
                        with open("training_progess.txt", "a") as f:
                            f.write(f'{"-" * 10}Checkpoint created at batch number {batch_num}{"-" * 10}\n')

                    _dump_tmp(_eval_params(state), full_state=state)

                    avg_loss = running_train_loss / max(batch_num, 1)
                    with training_dir():
                        with open("training_progess.txt", "a") as f:
                            f.write(f"U-Nets Avg Train Losses Epoch {epoch + 1} Batch {batch_num}: "
                                    f"{[round(float(i), 3) for i in avg_loss]}\n")
                            f.write(f"U-Nets Batch Train Losses Epoch {epoch + 1} Batch {batch_num}: "
                                    f"{[round(float(i), 3) for i in losses_np]}\n")

                    print(f'\n{"-" * 10}Validation...{"-" * 10}')
                    avg_valid = _validate(_eval_params(state), jax.random.fold_in(epoch_key, 10_000 + batch_num))
                    for i, l in enumerate(avg_valid):
                        print(f"Unet {i} avg validation loss: ", l)
                        if l < best_loss[i]:
                            best_loss[i] = l
                            with training_dir("state_dicts"):
                                save_unet_checkpoint(
                                    f"unet_{i}_state_{timestamp}.{CKPT_EXT}", _eval_params(state)[f"unet_{i}"]
                                )
                    with training_dir():
                        with open("training_progess.txt", "a") as f:
                            f.write(f"U-Nets Avg Valid Losses: {[round(float(i), 3) for i in avg_valid]}\n")
                            f.write(f"U-Nets Best Valid Losses: {[round(float(i), 3) for i in best_loss]}\n\n")
                    perf = timer.summary()
                    with training_dir():
                        with open("training_progess.txt", "a") as f:
                            f.write(f"Train steps/sec: {perf['steps_per_sec']:.3f}\n")
                    history.append({"epoch": epoch, "batch": batch_num,
                                    "train": avg_loss.tolist(), "valid": avg_valid.tolist(),
                                    "steps_per_sec": perf["steps_per_sec"]})
            except KeyboardInterrupt:
                raise
            except BatchTimeoutError as e:  # hung batch: note it and move on
                # (reference skips the batch under its SIGALRM, training.py:448-453)
                with training_dir():
                    with open("training_progess.txt", "a") as f:
                        f.write(f"BATCH {batch_num} EPOCH {epoch} SKIPPED: {e}\n")
                continue
            except Exception as e:  # crash dump then CONTINUE with the next
                # batch, matching the reference handler (training.py:465-478)
                with training_dir():
                    with open("training_progess.txt", "a") as f:
                        f.write(f"\n\nTRAINING ABORTED AT EPOCH {epoch}, BATCH NUMBER {batch_num} "
                                f"with exception {e}. MOST RECENT STATE DICTS SAVED TO ./tmp IN "
                                f"TRAINING FOLDER")
                _dump_tmp(_eval_params(state), full_state=state)
        bar.close()

    # final state also goes to tmp so inference always has weights
    _dump_tmp(_eval_params(state), full_state=state)
    imagen.params = jax.device_get(_eval_params(state))
    return {"best_valid_loss": best_loss.tolist(), "history": history,
            "final_step": int(state.step), "perf": timer.summary()}
