"""Import-path parity shim for `minimagen.diffusion_model` (reference
diffusion_model.py exports GaussianDiffusion)."""
from .ops.diffusion import GaussianDiffusion, create_gaussian_diffusion  # noqa: F401
