"""UniPC-2 sampler tests (Zhao et al., arXiv 2302.04867, 'bh2' variant,
data-prediction form).

A TPU-era capability beyond the reference: UniPC's order-2 predictor is
algebraically identical to the in-tree DPM-Solver++(2M) update (pinned
below), and the NEW piece — the corrector — reuses the model call at each
grid point to re-integrate the transition that landed there with one more
Taylor term (order-3 local accuracy at the same number of model calls).

Coverage:
- corrector coefficient structure (identity row 0, order-1 row 1, order-2
  rows 2+),
- golden cross-check: with a CONSTANT x0 prediction every correction
  difference term vanishes and cr*x_s0 + cm0*x0 is algebraically the exact
  transition, so the full UniPC trajectory must equal DDIM bit-for-bit
  (same invariance the DPM++ coefficients are pinned by),
- accuracy: on the linear-x0 ODE at a 10-step lambda grid the corrector
  must materially beat predictor-only DPM++(2M) (measured 0.034 vs 0.064
  at k=0.8 in the probe that set this bound),
- end-to-end integration through Imagen.sample / super_resolve (scan,
  encoder caching, truncation), including that it genuinely differs from
  'dpmpp' on the same grid/key.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from minimagen_tpu.ops.diffusion import create_gaussian_diffusion
from minimagen_tpu.models.imagen import Imagen
from minimagen_tpu.models.unet import BaseTest, SuperTest

KEY = jax.random.PRNGKey(0)


def _unipc_update(x, x_s0, m0, m1, m_t, pc, cc):
    """The sampler's per-step update, as implemented in the scan body:
    corrector for the transition that produced x, then the DPM++(2M)
    predictor from the corrected sample."""
    x_c = cc[0] * x + cc[1] * x_s0 + cc[2] * m0 + cc[3] * (m1 - m0) + cc[4] * (m_t - m0)
    d = pc[2] * m_t + pc[3] * m0
    return pc[0] * x_c + pc[1] * d, x_c


def test_unipc_corrector_coefficient_structure():
    gd = create_gaussian_diffusion(100)
    pairs = gd.strided_sampling_timesteps(10)
    c = gd.unipc_c_coefficients(pairs)
    assert c.shape == (len(pairs), 5) and np.all(np.isfinite(c))
    # row 0: identity (nothing to correct yet)
    np.testing.assert_array_equal(c[0], [1, 0, 0, 0, 0])
    # rows 1+: pure re-integration from x_s0 (no weight on the uncorrected x)
    assert np.all(c[1:, 0] == 0.0)
    # row 1: order-1 corrector — no s1 history term
    assert c[1, 3] == 0.0 and c[1, 4] != 0.0
    # rows 2+: genuine order 2 (both difference terms active)
    assert np.all(c[2:, 3] != 0.0) and np.all(c[2:, 4] != 0.0)
    # re-integration ratio/mean coefficients positive, ratio < 1
    assert np.all(c[1:, 1] > 0.0) and np.all(c[1:, 1] < 1.0)
    assert np.all(c[1:, 2] > 0.0)


def test_unipc_constant_x0_is_exactly_ddim():
    """With x0(x, t) = C every (m - m0) difference term vanishes and the
    corrector maps the exact transition point to itself, so the full
    corrector+predictor trajectory must reproduce DDIM exactly — pinning the
    corrector's (cr, cm0) re-integration against the tested ddim_step."""
    gd = create_gaussian_diffusion(80)
    pairs = gd.strided_sampling_timesteps(12)
    pc = gd.dpmpp_2m_coefficients(pairs)
    cc = gd.unipc_c_coefficients(pairs)
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 4, 3), minval=-1, maxval=1)
    x_ddim = x_u = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    x_s0 = m0 = m1 = jnp.zeros_like(x0)
    for i, (t, tp) in enumerate(np.asarray(pairs)):
        x_ddim = gd.ddim_step(x_ddim, x0, jnp.full((2,), t, jnp.int32),
                              jnp.full((2,), tp, jnp.int32))
        x_u, x_c = _unipc_update(x_u, x_s0, m0, m1, x0, pc[i], cc[i])
        x_s0, m0, m1 = x_c, x0, m0
    np.testing.assert_allclose(np.asarray(x_u), np.asarray(x_ddim),
                               atol=2e-5, rtol=1e-5)


def test_unipc_corrector_beats_predictor_only():
    """On the linear-x0 ODE (x0 = k*x, fine-grid DDIM as the reference
    solution) the corrector must materially reduce the 10-step lambda-grid
    error vs predictor-only DPM++(2M). Bound set from the measured sweep:
    unipc 0.034 vs dpmpp 0.064 at k=0.8 (and the const-x0 test above pins
    that the corrector never perturbs an exact solution)."""
    T = 1000
    gd = create_gaussian_diffusion(T)
    k = 0.8

    def run(n, method, grid="lambda"):
        prs = gd.strided_sampling_timesteps(n, grid)
        pc = gd.dpmpp_2m_coefficients(prs)
        cc = gd.unipc_c_coefficients(prs)
        x = jnp.full((1,), 1.3, jnp.float32)
        x_s0 = m0 = m1 = jnp.zeros_like(x)
        for i in range(len(prs)):
            if method == "ddim":
                t, tp = prs[i]
                x = gd.ddim_step(x, k * x, jnp.array([t]), jnp.array([tp]))
                continue
            m_t = k * x
            if method == "unipc":
                x, x_c = _unipc_update(x, x_s0, m0, m1, m_t, pc[i], cc[i])
            else:  # dpmpp: predictor only
                x_c = x
                x = pc[i, 0] * x + pc[i, 1] * (pc[i, 2] * m_t + pc[i, 3] * m0)
            x_s0, m0, m1 = x_c, m_t, m0
        return float(x[0])

    ref = run(T, "ddim", grid="time")  # full grid = fine ODE limit
    err_dpmpp = abs(run(10, "dpmpp") - ref)
    err_unipc = abs(run(10, "unipc") - ref)
    assert err_unipc < 0.8 * err_dpmpp, (err_unipc, err_dpmpp, ref)


@pytest.fixture(scope="module")
def cascade():
    imagen = Imagen(
        unets=[BaseTest(), SuperTest()],
        image_sizes=(8, 16),
        timesteps=25,
        cond_drop_prob=0.15,
        text_encoder_name="t5_small",
    )
    imagen.init_params(KEY, batch_size=2, text_len=6)
    return imagen


def _embeds(b=2, text_len=6, dim=512):
    embeds = jax.random.normal(jax.random.PRNGKey(4), (b, text_len, dim))
    return embeds, jnp.ones((b, text_len), bool)


def test_sample_unipc_end_to_end(cascade):
    embeds, mask = _embeds()
    imgs = cascade.sample(text_embeds=embeds, text_masks=mask, cond_scale=3.0,
                          sampler="unipc", sample_steps=6, key=jax.random.PRNGKey(2))
    assert imgs.shape == (2, 16, 16, 3)
    arr = np.asarray(imgs)
    assert np.all(np.isfinite(arr)) and arr.min() >= 0.0 and arr.max() <= 1.0
    # deterministic given the key
    imgs2 = cascade.sample(text_embeds=embeds, text_masks=mask, cond_scale=3.0,
                           sampler="unipc", sample_steps=6, key=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(imgs), np.asarray(imgs2))
    # the corrector makes it a genuinely different solver than dpmpp
    dpm = cascade.sample(text_embeds=embeds, text_masks=mask, cond_scale=3.0,
                         sampler="dpmpp", sample_steps=6, key=jax.random.PRNGKey(2))
    assert np.abs(np.asarray(dpm) - arr).max() > 1e-4


def test_sample_unipc_lambda_grid_and_cache(cascade):
    embeds, mask = _embeds()
    imgs = cascade.sample(text_embeds=embeds, text_masks=mask, cond_scale=3.0,
                          sampler="unipc", sample_steps=6, grid="lambda",
                          cache_interval=2, key=jax.random.PRNGKey(5))
    arr = np.asarray(imgs)
    assert arr.shape == (2, 16, 16, 3) and np.all(np.isfinite(arr))
    assert arr.min() >= 0.0 and arr.max() <= 1.0


def test_super_resolve_unipc_truncated(cascade):
    lowres = jax.random.uniform(jax.random.PRNGKey(7), (2, 8, 8, 3))
    embeds, mask = _embeds()
    out = cascade.super_resolve(lowres, text_embeds=embeds, text_masks=mask,
                                sampler="unipc", sample_steps=6,
                                start_noise_level=0.5, key=jax.random.PRNGKey(8))
    arr = np.asarray(out)
    assert arr.shape == (2, 16, 16, 3) and np.all(np.isfinite(arr))
    assert arr.min() >= 0.0 and arr.max() <= 1.0
