"""Worker process for the REAL multi-process multi-host test
(tests/test_multihost.py). Each of the 2 processes owns 4 virtual CPU
devices; `jax.distributed` + a localhost coordinator stitch them into one
8-device pool, and the DP train step runs on the DCN-outer global mesh with
batches assembled via `global_batch_from_local`.

Not a pytest file — launched by test_multihost.py with env:
COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID, JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=4.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1]

    import jax

    # the sandbox sitecustomize force-selects the axon TPU platform; override
    # back to CPU before any backend initialization (see CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

    from minimagen_tpu.parallel.multihost import (
        global_batch_from_local,
        initialize_distributed,
        make_global_mesh,
    )

    assert initialize_distributed() is True, "multi-process mode did not activate"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 8, jax.device_count()

    import numpy as np
    import jax.numpy as jnp

    from minimagen_tpu.models.imagen import Imagen
    from minimagen_tpu.models.unet import BaseTest
    from minimagen_tpu.parallel.mesh import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    mesh = make_global_mesh()
    assert mesh.shape == {"data": 8, "model": 1}, mesh.shape

    # the SAME deterministic global batch on every process; each process
    # contributes only its local rows
    pid = jax.process_index()
    img = np.random.default_rng(0).uniform(0, 1, (8, 8, 8, 3)).astype(np.float32)
    enc = np.random.default_rng(1).normal(size=(8, 4, 512)).astype(np.float32)
    mask = np.ones((8, 4), bool)
    local = slice(pid * 4, (pid + 1) * 4)
    batch = global_batch_from_local(
        {"image": img[local], "encoding": enc[local], "mask": mask[local]}, mesh
    )
    assert batch["image"].shape == (8, 8, 8, 3)  # global shape

    imagen = Imagen(unets=[BaseTest()], image_sizes=(8,), timesteps=25,
                    cond_drop_prob=0.15, text_encoder_name="t5_small")
    imagen.init_params(jax.random.PRNGKey(0), batch_size=2, text_len=4)
    opt = make_optimizer(1e-4)
    state = create_train_state(imagen.params, opt)
    step = make_train_step(imagen, opt, mesh=mesh, donate=False)

    losses = None
    for _ in range(2):
        state, losses = step(state, batch, jax.random.PRNGKey(5))

    leaf = jax.tree_util.tree_leaves(state.params)[0]
    result = {
        "process": int(pid),
        "loss": float(np.asarray(losses)[0]),
        "param_checksum": float(jnp.sum(jnp.abs(leaf))),
        "step": int(state.step),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
