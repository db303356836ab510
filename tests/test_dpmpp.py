"""DPM-Solver++(2M) sampler tests (arXiv 2211.01095, data-prediction form).

A TPU-era capability beyond the reference (which only has full-T ancestral
sampling, Imagen.py:372-420): a second-order multistep ODE solver on the
DDIM strided grid, targeting equal quality at roughly half the step budget.

Coverage:
- coefficient structure (first/last-step degradation to first order),
- golden cross-check: with a CONSTANT x0 prediction the DPM++ update is
  algebraically identical to DDIM (coef = a_prev - a_t * s_prev/s_t),
- second-order accuracy: on a linear x0 model the 2M solver at N steps is
  closer to the fine-grid ODE limit than DDIM at the same N,
- end-to-end integration through Imagen.sample / super_resolve (scan,
  encoder caching, start_at truncation).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from minimagen_tpu.ops.diffusion import create_gaussian_diffusion
from minimagen_tpu.models.imagen import Imagen
from minimagen_tpu.models.unet import BaseTest, SuperTest

KEY = jax.random.PRNGKey(0)


def _coef_update(x, x0, x0_prev, c):
    """The sampler's per-step update, as implemented in the scan body."""
    d = c[2] * x0 + c[3] * x0_prev
    return c[0] * x + c[1] * d


def test_dpmpp_coefficients_structure():
    gd = create_gaussian_diffusion(100)
    pairs = gd.strided_sampling_timesteps(10)
    c = gd.dpmpp_2m_coefficients(pairs)
    assert c.shape == (len(pairs), 4) and np.all(np.isfinite(c))
    # first step has no history: first-order (c1=1, c2=0)
    assert c[0, 2] == 1.0 and c[0, 3] == 0.0
    # final step to t_prev=-1 (sigma=0): returns x0 exactly, first-order
    assert c[-1, 0] == 0.0 and c[-1, 3] == 0.0
    np.testing.assert_allclose(c[-1, 1], 1.0, atol=1e-6)
    # interior steps are genuinely second order: c2 < 0 < 1 < c1, c1+c2 == 1
    assert np.all(c[1:-1, 3] < 0.0) and np.all(c[1:-1, 2] > 1.0)
    np.testing.assert_allclose(c[:, 2] + c[:, 3], 1.0, atol=1e-6)
    # ratio/coef positive, ratio < 1 (noise strictly decreases)
    assert np.all(c[:-1, 0] > 0.0) and np.all(c[:-1, 0] < 1.0)
    assert np.all(c[:, 1] > 0.0)


def test_dpmpp_constant_x0_is_exactly_ddim():
    """With x0(x, t) = C the multistep blend D_i = C, and the DPM++ update's
    coefficient a_prev*(1 - e^-h) reduces algebraically to DDIM's
    a_prev - a_t * s_prev/s_t — so both samplers must produce identical
    trajectories. Pins the coefficient math against the tested ddim_step."""
    gd = create_gaussian_diffusion(80)
    pairs = gd.strided_sampling_timesteps(12)
    coefs = gd.dpmpp_2m_coefficients(pairs)
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 4, 3), minval=-1, maxval=1)
    x_ddim = x_dpm = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    x0_prev = jnp.zeros_like(x0)
    for i, (t, tp) in enumerate(np.asarray(pairs)):
        tb = jnp.full((2,), t, jnp.int32)
        tpb = jnp.full((2,), tp, jnp.int32)
        x_ddim = gd.ddim_step(x_ddim, x0, tb, tpb)
        x_dpm = _coef_update(x_dpm, x0, x0_prev, coefs[i])
        x0_prev = x0
    np.testing.assert_allclose(np.asarray(x_dpm), np.asarray(x_ddim),
                               atol=2e-5, rtol=1e-5)


def test_dpmpp_is_second_order_on_linear_model():
    """x0(x, t) = k*x makes the probability-flow ODE linear; the fine-grid
    DDIM trajectory is the reference solution. At the same coarse step
    budget the 2M solver must land materially closer to it than DDIM."""
    T = 1000
    gd = create_gaussian_diffusion(T)
    k = 0.5
    x_init = jnp.full((1,), 1.3, jnp.float32)

    def run_ddim(num_steps):
        pairs = gd.strided_sampling_timesteps(num_steps)
        x = x_init
        for t, tp in np.asarray(pairs):
            x = gd.ddim_step(x, k * x, jnp.array([t]), jnp.array([tp]))
        return float(x[0])

    def run_dpmpp(num_steps):
        pairs = gd.strided_sampling_timesteps(num_steps)
        coefs = gd.dpmpp_2m_coefficients(pairs)
        x, x0_prev = x_init, jnp.zeros_like(x_init)
        for i in range(len(pairs)):
            x0 = k * x
            x, x0_prev = _coef_update(x, x0, x0_prev, coefs[i]), x0
        return float(x[0])

    ref = run_ddim(T)  # full grid = fine ODE limit
    # measured sweep (probe in the commit adding this test): ratio
    # dpmpp/ddim error = 0.16 at (k=0.5, n=10) and 0.30 at (k=0.8, n=20);
    # at (k=0.8, n=10) the lambda steps are too coarse for ANY multistep
    # gain (ratio 0.93) — the 2M extrapolation needs h_i below ~the
    # curvature scale, which uniform-t grids only reach from ~15 steps.
    n = 10
    err_ddim = abs(run_ddim(n) - ref)
    err_dpmpp = abs(run_dpmpp(n) - ref)
    assert err_dpmpp < 0.5 * err_ddim, (err_dpmpp, err_ddim, ref)


def test_lambda_grid_structure():
    """Uniform-log-SNR spacing: same invariants as the time grid (descending,
    unique, T-1 -> 0 with terminal -1), but with near-equal lambda steps."""
    gd = create_gaussian_diffusion(1000)
    pairs = gd.strided_sampling_timesteps(20, "lambda")
    ts = pairs[:, 0]
    assert ts[0] == 999 and ts[-1] == 0 and pairs[-1, 1] == -1
    assert np.all(np.diff(ts) < 0)
    np.testing.assert_array_equal(pairs[:-1, 1], pairs[1:, 0])
    # lambda steps far more even than the time grid's (whose tail h explodes)
    ac = np.asarray(gd.alphas_cumprod, np.float64)
    lam = 0.5 * (np.log(ac) - np.log1p(-ac))
    h_lam = np.abs(np.diff(lam[ts]))
    t_pairs = gd.strided_sampling_timesteps(20, "time")
    h_time = np.abs(np.diff(lam[t_pairs[:, 0]]))
    assert h_lam.max() / h_lam.min() < 3.0  # near-uniform (discrete rounding)
    assert h_time.max() / h_time.min() > 10.0  # time grid is wildly uneven
    with pytest.raises(AssertionError):
        gd.strided_sampling_timesteps(10, "nope")


def test_karras_grid_structure():
    """EDM sigma^(1/7) spacing (arXiv 2206.00364): same invariants as the
    other grids, with a low-noise tail concentration strictly between
    'time' (none) and 'lambda' (strongest)."""
    gd = create_gaussian_diffusion(1000)
    pairs = gd.strided_sampling_timesteps(10, "karras")
    ts = pairs[:, 0]
    assert ts[0] == 999 and ts[-1] == 0 and pairs[-1, 1] == -1
    assert np.all(np.diff(ts) < 0)
    np.testing.assert_array_equal(pairs[:-1, 1], pairs[1:, 0])
    # tail concentration: the last interior timestep sits below the time
    # grid's and above the lambda grid's
    t_time = gd.strided_sampling_timesteps(10, "time")[-2, 0]
    t_lam = gd.strided_sampling_timesteps(10, "lambda")[-2, 0]
    assert t_lam < ts[-2] < t_time, (t_lam, ts[-2], t_time)


def test_sample_karras_grid_end_to_end():
    imagen = Imagen(unets=[BaseTest()], image_sizes=(8,), timesteps=25,
                    cond_drop_prob=0.15, text_encoder_name="t5_small")
    imagen.init_params(KEY, batch_size=2, text_len=6)
    embeds = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 512))
    mask = jnp.ones((2, 6), bool)
    kwargs = dict(text_embeds=embeds, text_masks=mask, cond_scale=3.0,
                  sampler="dpmpp", sample_steps=6, key=jax.random.PRNGKey(2))
    imgs = imagen.sample(grid="karras", **kwargs)
    arr = np.asarray(imgs)
    assert arr.shape == (2, 8, 8, 3) and np.all(np.isfinite(arr))
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    # a genuinely different grid than 'time' at the same key
    t_imgs = imagen.sample(grid="time", **kwargs)
    assert np.abs(np.asarray(t_imgs) - arr).max() > 1e-4


def test_lambda_grid_improves_few_step_dpmpp():
    """On the linear-model ODE the lambda grid should not be worse than the
    time grid for DPM++ at a small budget (equal-h steps suit the 2M
    extrapolation)."""
    T = 1000
    gd = create_gaussian_diffusion(T)
    k = 0.5

    def run(n, spacing):
        pairs = gd.strided_sampling_timesteps(n, spacing)
        coefs = gd.dpmpp_2m_coefficients(pairs)
        x = jnp.full((1,), 1.3, jnp.float32)
        x0_prev = jnp.zeros_like(x)
        for i in range(len(pairs)):
            x0 = k * x
            x, x0_prev = _coef_update(x, x0, x0_prev, coefs[i]), x0
        return float(x[0])

    # fine-grid reference (ddim over the full grid)
    pairs = gd.strided_sampling_timesteps(T)
    ref = jnp.full((1,), 1.3, jnp.float32)
    for t, tp in np.asarray(pairs):
        ref = gd.ddim_step(ref, k * ref, jnp.array([t]), jnp.array([tp]))
    ref = float(ref[0])
    err_time = abs(run(10, "time") - ref)
    err_lam = abs(run(10, "lambda") - ref)
    assert err_lam < 2.0 * err_time, (err_lam, err_time, ref)


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


def test_sample_dpmpp_end_to_end(cascade):
    embeds, mask = _embeds()
    imgs = cascade.sample(text_embeds=embeds, text_masks=mask, cond_scale=3.0,
                          sampler="dpmpp", sample_steps=6, key=jax.random.PRNGKey(2))
    assert imgs.shape == (2, 16, 16, 3)
    arr = np.asarray(imgs)
    assert np.all(np.isfinite(arr)) and arr.min() >= 0.0 and arr.max() <= 1.0
    # deterministic given the key
    imgs2 = cascade.sample(text_embeds=embeds, text_masks=mask, cond_scale=3.0,
                           sampler="dpmpp", sample_steps=6, key=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(imgs), np.asarray(imgs2))
    # genuinely a different solver than DDIM on the same grid/key
    ddim = cascade.sample(text_embeds=embeds, text_masks=mask, cond_scale=3.0,
                          sampler="ddim", sample_steps=6, key=jax.random.PRNGKey(2))
    assert np.abs(np.asarray(ddim) - arr).max() > 1e-4


def test_sample_dpmpp_lambda_grid_end_to_end(cascade):
    embeds, mask = _embeds()
    imgs = cascade.sample(text_embeds=embeds, text_masks=mask, cond_scale=3.0,
                          sampler="dpmpp", sample_steps=6, grid="lambda",
                          key=jax.random.PRNGKey(2))
    arr = np.asarray(imgs)
    assert arr.shape == (2, 16, 16, 3) and np.all(np.isfinite(arr))
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    # a genuinely different grid than 'time' at the same key
    time_imgs = cascade.sample(text_embeds=embeds, text_masks=mask, cond_scale=3.0,
                               sampler="dpmpp", sample_steps=6, grid="time",
                               key=jax.random.PRNGKey(2))
    assert np.abs(np.asarray(time_imgs) - arr).max() > 1e-4


def test_sample_dpmpp_with_encoder_cache(cascade):
    embeds, mask = _embeds()
    imgs = cascade.sample(text_embeds=embeds, text_masks=mask, cond_scale=3.0,
                          sampler="dpmpp", sample_steps=6, cache_interval=2,
                          key=jax.random.PRNGKey(5))
    arr = np.asarray(imgs)
    assert arr.shape == (2, 16, 16, 3) and np.all(np.isfinite(arr))


def test_super_resolve_dpmpp_truncated(cascade):
    lowres = jax.random.uniform(jax.random.PRNGKey(7), (2, 8, 8, 3))
    embeds, mask = _embeds()
    out = cascade.super_resolve(lowres, text_embeds=embeds, text_masks=mask,
                                sampler="dpmpp", sample_steps=6,
                                start_noise_level=0.5, key=jax.random.PRNGKey(8))
    arr = np.asarray(out)
    assert arr.shape == (2, 16, 16, 3) and np.all(np.isfinite(arr))
    assert arr.min() >= 0.0 and arr.max() <= 1.0
