"""minimagen_tpu — a TPU-native (JAX / XLA / Pallas / pjit) text-to-image framework.

A from-scratch rebuild of the capabilities of AssemblyAI-Community/MinImagen
(mounted read-only at /root/reference): a cascading DDPM in which a frozen T5
text encoder conditions a base 64px denoising U-Net and a chain of
super-resolution U-Nets, with classifier-free guidance, dynamic thresholding,
and noise-conditioning augmentation.

Unlike the single-device PyTorch reference, here:

- the full reverse-diffusion loop compiles into a single ``lax.scan`` per
  cascade stage (reference: Python loop over timesteps, Imagen.py:372-420),
- classifier-free guidance runs as ONE pair-batched cond/uncond forward
  (reference: two sequential forwards, Unet.py:474-506),
- images are NHWC (TPU conv layout) internally; the public API accepts the
  reference's NCHW via ``data_format``,
- training data-parallelizes over a ``jax.sharding.Mesh`` with XLA
  collectives over ICI (reference: single device, CPU<->GPU swap hacks,
  Imagen.py:180-259),
- randomness is explicit ``jax.random`` key threading (reference: implicit
  global torch RNG).

Public surface mirrors the reference package (`minimagen/__init__.py:1-4`).
"""

from . import ops
from . import models

# reference-path import shims (reference `minimagen/__init__.py:1-4` exports
# the Imagen / t5 / Unet / diffusion_model modules; here
# `from minimagen_tpu.Unet import Unet, Base` etc. work exactly like the
# reference's `from minimagen.Unet import ...`)
from . import Imagen
from . import Unet
from . import t5
from . import diffusion_model

__version__ = "0.1.0"
