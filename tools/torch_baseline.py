"""Measure the ACTUAL PyTorch reference U-Net's guided-denoise rate on this
host's CPU (the vs_baseline denominator for bench.py, re-measured per run
instead of a hardcoded constant — VERDICT round-1 weak #5).

Imports /root/reference/minimagen/Unet.py with the same tiny dependency stubs
as tests/test_torch_import.py (resize_right/tqdm/einops_exts are not in this
image), builds the flagship-equivalent dim-128 Imagen-base topology, and
times `forward_with_cond_scale` (the reference's 2-sequential-forward guided
step, Unet.py:474-506).

Usage: python tools/torch_baseline.py [steps] -> prints steps/s as a float.
Importable: measure_torch_guided_steps_per_sec(steps).
"""
from __future__ import annotations

import os
import sys
import types

REF_PATH = "/root/reference"


def _install_stubs() -> None:
    from einops import rearrange, repeat

    if "resize_right" not in sys.modules:
        m = types.ModuleType("resize_right")
        m.resize = lambda x, scale_factors=None, out_shape=None, **kw: x
        sys.modules["resize_right"] = m
    if "tqdm" not in sys.modules:
        m = types.ModuleType("tqdm")
        m.tqdm = lambda it, **kw: it
        sys.modules["tqdm"] = m
    if "einops_exts" not in sys.modules:
        import torch.nn as nn

        ee = types.ModuleType("einops_exts")

        def rearrange_many(tensors, pattern, **kw):
            return [rearrange(t, pattern, **kw) for t in tensors]

        def repeat_many(tensors, pattern, **kw):
            return [repeat(t, pattern, **kw) for t in tensors]

        def check_shape(t, pattern, **kw):
            return t

        ee.rearrange_many = rearrange_many
        ee.repeat_many = repeat_many
        ee.check_shape = check_shape
        eet = types.ModuleType("einops_exts.torch")

        class EinopsToAndFrom(nn.Module):
            def __init__(self, from_einops, to_einops, fn):
                super().__init__()
                self.from_einops = from_einops
                self.to_einops = to_einops
                self.fn = fn

            def forward(self, x, **kwargs):
                shape = x.shape
                pairs = dict(zip(self.from_einops.split(), shape))
                x = rearrange(x, f"{self.from_einops} -> {self.to_einops}")
                x = self.fn(x, **kwargs)
                x = rearrange(x, f"{self.to_einops} -> {self.from_einops}", **pairs)
                return x

        eet.EinopsToAndFrom = EinopsToAndFrom
        ee.torch = eet
        sys.modules["einops_exts"] = ee
        sys.modules["einops_exts.torch"] = eet


def measure_torch_guided_steps_per_sec(steps: int = 2) -> float:
    """Time the reference's guided forward (2 U-Net forwards per denoise step)
    at the flagship config: dim 128, Imagen-base topology, batch 4, 64px."""
    import time

    import torch

    if not os.path.isdir(REF_PATH):
        raise FileNotFoundError(REF_PATH)
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    _install_stubs()
    from minimagen.Unet import Unet as RefUnet  # noqa: PLC0415

    torch.manual_seed(0)
    unet = RefUnet(
        dim=128, dim_mults=(1, 2, 3, 4), num_resnet_blocks=3,
        layer_attns=(False, True, True, True),
        layer_cross_attns=(False, True, True, True),
        memory_efficient=False, attend_at_middle=True,
        text_embed_dim=768, cond_dim=None, channels=3, lowres_cond=False,
    ).eval()

    b, L = 4, 64
    x = torch.randn(b, 3, 64, 64)
    t = torch.full((b,), 500, dtype=torch.long)
    embeds = torch.randn(b, L, 768)
    mask = torch.ones(b, L, dtype=torch.bool)

    with torch.no_grad():
        unet.forward_with_cond_scale(x, t, text_embeds=embeds, text_mask=mask,
                                     cond_scale=3.0)  # warm
        t0 = time.perf_counter()
        for _ in range(steps):
            unet.forward_with_cond_scale(x, t, text_embeds=embeds, text_mask=mask,
                                         cond_scale=3.0)
        elapsed = time.perf_counter() - t0
    return steps / elapsed


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    print(measure_torch_guided_steps_per_sec(n))
