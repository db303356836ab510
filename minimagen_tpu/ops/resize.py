"""Image resizing for cascade conditioning.

Capability parity with `resize_image_to` (/root/reference/minimagen/
helpers.py:138-164), which wraps the `resize_right` package (cubic kernel,
antialiased downscaling, 'reflect' padding).  Here we use `jax.image.resize`
with the Keys cubic kernel and antialiasing — the same interpolation family —
which XLA fuses and runs on-device, instead of a host-side library.

Exact boundary handling differs from resize_right's reflect padding by a few
edge pixels; this is a documented deliberate deviation (the conditioning
signal is a *blurred* low-res image either way; training targets adapt to
whichever resize the framework itself uses consistently).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .helpers import exists


def resize_image_to(
    image: jnp.ndarray,
    target_image_size: int,
    clamp_range: Optional[Tuple[float, float]] = None,
    method: str = "cubic",
) -> jnp.ndarray:
    """Resize NHWC images to a square `target_image_size`.

    :param image: (b, h, w, c) images.
    :param target_image_size: target side length.
    :param clamp_range: optional (lo, hi) clamp applied after resizing
        (reference helpers.py:161-162).
    :param method: interpolation method for `jax.image.resize`.
    """
    b, h, w, c = image.shape
    if h == target_image_size and w == target_image_size:
        return image

    out = jax.image.resize(
        image,
        (b, target_image_size, target_image_size, c),
        method=method,
        antialias=True,
    )

    if exists(clamp_range):
        out = jnp.clip(out, clamp_range[0], clamp_range[1])

    return out
