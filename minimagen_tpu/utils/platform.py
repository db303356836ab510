"""Platform selection helpers.

Some environments (e.g. this sandbox's sitecustomize) register a PJRT plugin
and force `jax_platforms` via `jax.config`, silently overriding the standard
`JAX_PLATFORMS` env var.  `respect_jax_platforms_env()` restores the env
var's authority — CLIs call it so `JAX_PLATFORMS=cpu python train.py ...`
behaves as documented.
"""
from __future__ import annotations

import os

import jax


def respect_jax_platforms_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    if jax.config.jax_platforms == want:
        return
    try:
        from jax._src import xla_bridge as _xb

        if _xb.backends_are_initialized():
            from jax.extend.backend import clear_backends

            clear_backends()
        jax.config.update("jax_platforms", want)
    except Exception:
        pass
