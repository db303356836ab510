"""Test config: run on a virtual 8-device CPU mesh, force the offline T5 path.

Environment must be set before jax is first imported anywhere.
"""
import os

# hard-set (not setdefault): a stray JAX_PLATFORMS=axon inherited from the
# launching shell must never leak into the suite — tool modules imported by
# tests call respect_jax_platforms_env(), which would clear backends and flip
# the whole process onto the remote-TPU tunnel mid-suite
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("MINIMAGEN_TPU_T5_FALLBACK", "1")

import jax  # noqa: E402

# The sandbox's sitecustomize registers the axon TPU plugin and force-sets
# jax_platforms="axon,cpu", overriding the env var — override it back and drop
# any already-initialized backends so the virtual CPU device count applies.
jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as _xb  # noqa: E402

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends  # noqa: E402

        clear_backends()
except Exception:
    pass

jax.config.update("jax_enable_x64", False)
# persistent compile cache: the suite is compile-bound on CPU; caching makes
# repeat runs fast
jax.config.update("jax_compilation_cache_dir", "/tmp/minimagen_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
