"""Imagen orchestrator tests: losses, CFG, dynamic thresholding, cascade
sampling (reference Imagen.py:22-650)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from minimagen_tpu.models.imagen import Imagen, _loss_fn
from minimagen_tpu.models.unet import BaseTest, SuperTest, UnetConfig

KEY = jax.random.PRNGKey(0)
TINY = dict(size=16)


@pytest.fixture(scope="module")
def cascade():
    """2-stage tiny cascade (8x8 -> 16x16), T=25, like the reference's example
    config (parameters/imagen_params_20220816_165729.json) scaled down."""
    imagen = Imagen(
        unets=[BaseTest(), SuperTest()],
        image_sizes=(8, 16),
        timesteps=25,
        cond_drop_prob=0.15,
        text_encoder_name="t5_small",
    )
    imagen.init_params(KEY, batch_size=2, text_len=6)
    return imagen


def _batch(b=2, size=16, text_len=6, dim=512):
    images = jax.random.uniform(jax.random.PRNGKey(3), (b, size, size, 3))
    embeds = jax.random.normal(jax.random.PRNGKey(4), (b, text_len, dim))
    mask = jnp.ones((b, text_len), bool)
    return images, embeds, mask


def test_loss_fns():
    pred = jnp.array([0.0, 2.0])
    tgt = jnp.array([0.0, 0.0])
    assert float(_loss_fn("l1")(pred, tgt)) == 1.0
    assert float(_loss_fn("l2")(pred, tgt)) == 2.0
    assert float(_loss_fn("huber")(pred, tgt)) == 0.75  # (0 + (2-0.5))/2
    with pytest.raises(NotImplementedError):
        _loss_fn("nope")


def test_cascade_construction_forces_lowres_cond(cascade):
    """First unet is base, the rest super-res (reference Imagen.py:89-103)."""
    assert cascade.unet_configs[0].lowres_cond is False
    assert cascade.unet_configs[1].lowres_cond is True
    assert cascade.unet_configs[1].channels_out == 3
    assert len(cascade.noise_schedulers) == 2
    assert cascade.noise_schedulers[0].num_timesteps == 25


def test_forward_loss_per_stage(cascade):
    images, embeds, mask = _batch()
    for unet_number in (1, 2):
        loss = cascade.forward(images, text_embeds=embeds, text_masks=mask,
                               unet_number=unet_number, key=jax.random.PRNGKey(7))
        loss = float(loss)
        assert np.isfinite(loss) and loss > 0


def test_forward_requires_unet_number_for_cascade(cascade):
    images, embeds, mask = _batch()
    with pytest.raises(AssertionError):
        cascade.forward(images, text_embeds=embeds, text_masks=mask)


def test_forward_accepts_nchw(cascade):
    images, embeds, mask = _batch()
    nchw = jnp.transpose(images, (0, 3, 1, 2))
    l1 = cascade.forward(nchw, text_embeds=embeds, text_masks=mask, unet_number=1,
                         key=jax.random.PRNGKey(5), data_format="NCHW")
    l2 = cascade.forward(images, text_embeds=embeds, text_masks=mask, unet_number=1,
                         key=jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_loss_decreases_with_training_steps(cascade):
    """A few SGD steps on a fixed batch should reduce stage-1 loss."""
    import optax

    images, embeds, mask = _batch()
    loss_fn = cascade.stage_loss_fn(0)
    params = cascade.params["unet_0"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, embeds, mask, key)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    fixed_key = jax.random.PRNGKey(11)
    first = None
    for i in range(20):
        params, opt_state, loss = step(params, opt_state, fixed_key)
        if first is None:
            first = float(loss)
    assert float(loss) < first, f"loss did not decrease: {first} -> {float(loss)}"


def test_sample_cascade_shapes_and_range(cascade):
    _, embeds, mask = _batch()
    imgs = cascade.sample(text_embeds=embeds, text_masks=mask, cond_scale=1.0,
                          key=jax.random.PRNGKey(2))
    assert imgs.shape == (2, 16, 16, 3)
    arr = np.asarray(imgs)
    assert arr.min() >= 0.0 and arr.max() <= 1.0


def test_sample_guided_pair_batched(cascade):
    _, embeds, mask = _batch()
    imgs = cascade.sample(text_embeds=embeds, text_masks=mask, cond_scale=3.0,
                          key=jax.random.PRNGKey(2))
    assert imgs.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(imgs)))


def test_sample_guidance_requires_cond_dropout():
    imagen = Imagen(unets=[BaseTest()], image_sizes=(8,), timesteps=25,
                    cond_drop_prob=0.0, text_encoder_name="t5_small")
    imagen.init_params(KEY)
    _, embeds, mask = _batch()
    with pytest.raises(AssertionError):
        imagen.sample(text_embeds=embeds, text_masks=mask, cond_scale=3.0)


def test_sample_default_key_is_fresh_entropy(cascade):
    """Without an explicit key, two sample() calls must differ (reference
    draws fresh randn every run, Imagen.py:381; round-1 VERDICT missing #3)."""
    _, embeds, mask = _batch()
    a = cascade.sample(text_embeds=embeds, text_masks=mask, sampler="ddim", sample_steps=4)
    b = cascade.sample(text_embeds=embeds, text_masks=mask, sampler="ddim", sample_steps=4)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_sample_per_stage_step_budgets(cascade):
    """sample_steps accepts a per-stage sequence (production latency lever:
    SR stages need fewer steps than the base). A uniform tuple must match
    the int form bit-exactly; distinct budgets run and stay in range."""
    _, embeds, mask = _batch()
    key = jax.random.PRNGKey(5)
    a = cascade.sample(text_embeds=embeds, text_masks=mask, sampler="ddim",
                       sample_steps=4, key=key)
    b = cascade.sample(text_embeds=embeds, text_masks=mask, sampler="ddim",
                       sample_steps=(4, 4), key=key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    c = cascade.sample(text_embeds=embeds, text_masks=mask, sampler="ddim",
                       sample_steps=(5, 2), key=key)
    arr = np.asarray(c)
    assert arr.shape == (2, 16, 16, 3)
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    assert not np.allclose(arr, np.asarray(a))


def test_sample_fixed_key_is_deterministic(cascade):
    _, embeds, mask = _batch()
    a = cascade.sample(text_embeds=embeds, text_masks=mask, key=jax.random.PRNGKey(42))
    b = cascade.sample(text_embeds=embeds, text_masks=mask, key=jax.random.PRNGKey(42))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = cascade.sample(text_embeds=embeds, text_masks=mask, key=jax.random.PRNGKey(43))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_sample_from_texts_with_fallback_encoder(cascade):
    imgs = cascade.sample(texts=["a happy dog", "a big red house"],
                          key=jax.random.PRNGKey(1))
    assert imgs.shape == (2, 16, 16, 3)


def test_sample_pil_images(cascade):
    pil = cascade.sample(texts=["a happy dog"], return_pil_images=True,
                         key=jax.random.PRNGKey(1))
    assert len(pil) == 1
    assert pil[0].size == (16, 16)


def test_sample_nchw_output(cascade):
    _, embeds, mask = _batch()
    imgs = cascade.sample(text_embeds=embeds, text_masks=mask, data_format="NCHW")
    assert imgs.shape == (2, 3, 16, 16)


def test_dynamic_thresholding_bounds_x_start():
    """With an extreme predicted x0, dynamic thresholding must keep the
    posterior input within [-1, 1] scaled bounds (reference Imagen.py:309-323)."""
    imagen = Imagen(unets=[BaseTest()], image_sizes=(8,), timesteps=25,
                    cond_drop_prob=0.1, text_encoder_name="t5_small")
    imagen.init_params(KEY)
    # directly exercise _p_mean_variance with an extreme state
    x = 50.0 * jnp.ones((1, 8, 8, 3))
    t = jnp.array([24])
    embeds = jnp.zeros((1, 4, 512))
    mask = jnp.ones((1, 4), bool)
    mean, var, logvar = imagen._p_mean_variance(
        0, imagen.noise_schedulers[0], imagen.params["unet_0"], x, t,
        text_embeds=embeds, text_mask=mask, lowres_cond_img=None,
        lowres_noise_times=None, cond_scale=1.0, guided=False,
    )
    assert np.all(np.isfinite(np.asarray(mean)))


def test_ddim_strided_timesteps():
    from minimagen_tpu.ops.diffusion import create_gaussian_diffusion

    gd = create_gaussian_diffusion(100)
    pairs = gd.strided_sampling_timesteps(10)
    assert pairs[0][0] == 99 and pairs[-1][0] == 0 and pairs[-1][1] == -1
    # strictly descending t, and t_prev == next row's t
    ts = pairs[:, 0]
    assert np.all(np.diff(ts) < 0)
    np.testing.assert_array_equal(pairs[:-1, 1], pairs[1:, 0])


def test_ddim_step_terminal_returns_x0():
    """At t_prev=-1 the DDIM update must return exactly the predicted x0."""
    from minimagen_tpu.ops.diffusion import create_gaussian_diffusion

    gd = create_gaussian_diffusion(50)
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (2, 4, 4, 3), minval=-1, maxval=1)
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([10, 30])
    xt = gd.q_sample(x0, t, noise)
    out = gd.ddim_step(xt, x0, t, jnp.array([-1, -1]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_ddim_step_consistent_with_forward_process():
    """With the TRUE x0, stepping t -> t_prev must land on q_sample(x0, t_prev)
    with the same implied noise."""
    from minimagen_tpu.ops.diffusion import create_gaussian_diffusion

    gd = create_gaussian_diffusion(50)
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (2, 4, 4, 3), minval=-1, maxval=1)
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([40, 40])
    t_prev = jnp.array([20, 20])
    xt = gd.q_sample(x0, t, noise)
    stepped = gd.ddim_step(xt, x0, t, t_prev)
    expected = gd.q_sample(x0, t_prev, noise)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(expected), atol=1e-4)


def test_sample_ddim_fast_path(cascade):
    _, embeds, mask = _batch()
    imgs = cascade.sample(text_embeds=embeds, text_masks=mask, cond_scale=3.0,
                          sampler="ddim", sample_steps=8, key=jax.random.PRNGKey(2))
    assert imgs.shape == (2, 16, 16, 3)
    arr = np.asarray(imgs)
    assert np.all(np.isfinite(arr)) and arr.min() >= 0.0 and arr.max() <= 1.0
    # deterministic given the key (eta=0) and distinct from ddpm output
    imgs2 = cascade.sample(text_embeds=embeds, text_masks=mask, cond_scale=3.0,
                           sampler="ddim", sample_steps=8, key=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(imgs), np.asarray(imgs2))


def test_three_stage_cascade_and_per_stage_timesteps():
    """3-stage 8->16->32 cascade with per-stage T (tuple timesteps,
    reference Imagen.py:157-178) trains and samples end-to-end."""
    imagen = Imagen(
        unets=[BaseTest(), SuperTest(), SuperTest()],
        image_sizes=(8, 16, 32),
        timesteps=(25, 20, 20),
        cond_drop_prob=0.15,
        text_encoder_name="t5_small",
    )
    assert [s.num_timesteps for s in imagen.noise_schedulers] == [25, 20, 20]
    assert [c.lowres_cond for c in imagen.unet_configs] == [False, True, True]
    imagen.init_params(jax.random.PRNGKey(0), batch_size=1, text_len=4)

    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    embeds = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 512))
    mask = jnp.ones((1, 4), bool)
    for n in (1, 2, 3):
        loss = float(imagen.forward(images, text_embeds=embeds, text_masks=mask,
                                    unet_number=n, key=jax.random.PRNGKey(n)))
        assert np.isfinite(loss)

    out = imagen.sample(text_embeds=embeds, text_masks=mask, sampler="ddim",
                        sample_steps=5, key=jax.random.PRNGKey(3),
                        return_all_stage_outputs=True)
    assert [o.shape for o in out] == [(1, 8, 8, 3), (1, 16, 16, 3), (1, 32, 32, 3)]


def test_forward_with_raw_texts_uses_encoder(cascade):
    """Imagen.forward accepts raw caption strings (reference Imagen.py:618-623)."""
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3))
    loss = cascade.forward(images, texts=["a happy dog", "a big red house"],
                           unet_number=1, key=jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    # caption count must match image count (reference assert)
    with pytest.raises(AssertionError):
        cascade.forward(images, texts=["just one"], unet_number=1)


def test_forward_rejects_wrong_embed_dim(cascade):
    images, _, mask = _batch()
    bad = jnp.zeros((2, 6, 128))  # wrong dim (should be 512)
    with pytest.raises(AssertionError):
        cascade.forward(images, text_embeds=bad, text_masks=mask, unet_number=1)


def test_sample_rejects_wrong_embed_dim(cascade):
    bad = jnp.zeros((2, 6, 128))
    with pytest.raises(AssertionError):
        cascade.sample(text_embeds=bad, text_masks=jnp.ones((2, 6), bool))


def test_only_train_unet_number_enforced():
    imagen = Imagen(unets=[BaseTest(), SuperTest()], image_sizes=(8, 16), timesteps=25,
                    cond_drop_prob=0.1, text_encoder_name="t5_small",
                    only_train_unet_number=2)
    imagen.init_params(jax.random.PRNGKey(0), batch_size=1, text_len=4)
    images, embeds, mask = _batch(b=1)
    with pytest.raises(AssertionError):
        imagen.forward(images, text_embeds=embeds, text_masks=mask, unet_number=1)
    loss = imagen.forward(images, text_embeds=embeds, text_masks=mask, unet_number=2,
                          key=jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_forward_with_cond_scale_shim(cascade):
    """API parity with reference Unet.forward_with_cond_scale (Unet.py:474-506):
    scale 1 == plain forward; guided = null + (cond-null)*scale."""
    _, embeds, mask = _batch()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    t = jnp.array([3, 7], jnp.int32)

    plain = cascade.forward_with_cond_scale(x, t, unet_number=1, cond_scale=1.0,
                                            text_embeds=embeds, text_mask=mask)
    assert plain.shape == x.shape

    guided = cascade.forward_with_cond_scale(x, t, unet_number=1, cond_scale=3.0,
                                             text_embeds=embeds, text_mask=mask)
    assert guided.shape == x.shape
    assert not np.allclose(np.asarray(plain), np.asarray(guided))

    # cond_scale relation: out = null + (cond - null) * s
    cond = cascade._unet_forward(0, cascade.params["unet_0"], x, t,
                                 text_embeds=embeds, text_mask=mask,
                                 lowres_cond_img=None, lowres_noise_times=None,
                                 text_keep_mask=jnp.array([True, True]))
    null = cascade._unet_forward(0, cascade.params["unet_0"], x, t,
                                 text_embeds=embeds, text_mask=mask,
                                 lowres_cond_img=None, lowres_noise_times=None,
                                 text_keep_mask=jnp.array([False, False]))
    expected = np.asarray(null) + (np.asarray(cond) - np.asarray(null)) * 3.0
    np.testing.assert_allclose(np.asarray(guided), expected, atol=1e-4)


def test_super_resolve_existing_images(cascade):
    """super_resolve upscales EXISTING images through an SR stage (beyond the
    reference, which always runs the full cascade from noise)."""
    images = jax.random.uniform(jax.random.PRNGKey(5), (2, 8, 8, 3))
    _, embeds, mask = _batch()
    out = cascade.super_resolve(images, stage=1, text_embeds=embeds, text_masks=mask,
                                cond_scale=3.0, sampler="ddim", sample_steps=4,
                                key=jax.random.PRNGKey(6))
    assert out.shape == (2, 16, 16, 3)
    arr = np.asarray(out)
    assert np.all(np.isfinite(arr)) and arr.min() >= 0.0 and arr.max() <= 1.0
    # stage 0 is not an SR stage
    with pytest.raises(AssertionError):
        cascade.super_resolve(images, stage=0, text_embeds=embeds, text_masks=mask)


def test_stage_memory_analysis_reports_bytes(cascade):
    """Compile-time HBM accounting (stage_memory_analysis) returns sane sizes
    for both a base and a lowres-conditioned stage on the CPU backend."""
    imagen = cascade
    ma0 = imagen.stage_memory_analysis(0, batch_size=1, text_len=8,
                                       sampler="ddim", sample_steps=4)
    ma1 = imagen.stage_memory_analysis(1, batch_size=1, text_len=8,
                                       sampler="ddim", sample_steps=4)
    for ma in (ma0, ma1):
        if ma:  # empty dict allowed where the backend lacks the query
            assert ma["argument_size_in_bytes"] > 0
            assert ma["temp_size_in_bytes"] >= 0


def test_encoder_cache_interval_one_is_bit_exact(cascade):
    """cache_interval=1 recomputes every step through the caching scan
    machinery (lax.cond + cache carry) — its output must be BIT-IDENTICAL
    to the plain path, proving the cache plumbing is exact."""
    b, L = 2, 6
    import numpy as _np
    rng = _np.random.default_rng(0)
    embeds = jnp.asarray(rng.normal(size=(b, L, 512)), jnp.float32)
    mask = jnp.ones((b, L), jnp.bool_)
    key = jax.random.PRNGKey(5)
    plain = cascade.sample(text_embeds=embeds, text_masks=mask, cond_scale=3.0,
                           sampler="ddim", sample_steps=6, key=key)
    cached = cascade.sample(text_embeds=embeds, text_masks=mask, cond_scale=3.0,
                            sampler="ddim", sample_steps=6, key=key,
                            cache_interval=1)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(cached))


def test_encoder_cache_interval_two_samples_sanely(cascade):
    """cache_interval=2 (real caching: every other step reuses the DOWN
    path) must produce finite in-range images for both samplers, guided and
    not, through the full cascade."""
    b, L = 2, 6
    import numpy as _np
    rng = _np.random.default_rng(1)
    embeds = jnp.asarray(rng.normal(size=(b, L, 512)), jnp.float32)
    mask = jnp.ones((b, L), jnp.bool_)
    key = jax.random.PRNGKey(6)
    for sampler, scale in (("ddim", 3.0), ("ddpm", 1.0)):
        out = cascade.sample(text_embeds=embeds, text_masks=mask, cond_scale=scale,
                             sampler=sampler, sample_steps=6, key=key,
                             cache_interval=2)
        a = np.asarray(out)
        assert a.shape == (b, 16, 16, 3)
        assert np.all(np.isfinite(a)) and a.min() >= 0.0 and a.max() <= 1.0


def test_super_resolve_truncated_start(cascade):
    """SDEdit-style truncated SR: start_noise_level initializes from the
    noised upsampled input and runs only the schedule tail below t_start."""
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)), jnp.float32)
    embeds = jnp.asarray(rng.normal(size=(2, 6, 512)), jnp.float32)
    mask = jnp.ones((2, 6), jnp.bool_)
    out = cascade.super_resolve(imgs, stage=1, text_embeds=embeds, text_masks=mask,
                                sampler="ddim", sample_steps=8,
                                start_noise_level=0.5, key=jax.random.PRNGKey(3))
    a = np.asarray(out)
    assert a.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(a)) and a.min() >= 0.0 and a.max() <= 1.0
    # the truncated stage fn was built with a static start_at
    assert any(getattr(k, "start_at", None) is not None and k[0] == "sample"
               for k in cascade._jit_cache)
    # truncation must also compose with encoder caching
    out2 = cascade.super_resolve(imgs, stage=1, text_embeds=embeds, text_masks=mask,
                                 sampler="ddim", sample_steps=8,
                                 start_noise_level=0.5, cache_interval=2,
                                 key=jax.random.PRNGKey(3))
    assert np.all(np.isfinite(np.asarray(out2)))


def test_super_resolve_start_at_clamped_to_ddim_grid(cascade):
    """DDIM start_at must land ON the strided grid so the init image's noise
    level matches the first processed timestep (round-2 ADVICE item 4)."""
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)), jnp.float32)
    embeds = jnp.asarray(rng.normal(size=(2, 6, 512)), jnp.float32)
    mask = jnp.ones((2, 6), jnp.bool_)
    cascade._jit_cache.clear()
    cascade.super_resolve(imgs, stage=1, text_embeds=embeds, text_masks=mask,
                          sampler="ddim", sample_steps=7,
                          start_noise_level=0.43, key=jax.random.PRNGKey(3))
    grid = np.asarray(
        cascade.noise_schedulers[1].strided_sampling_timesteps(7))[:, 0]
    start_ats = [k.start_at for k in cascade._jit_cache
                 if getattr(k, "kind", None) == "sample"
                 and k.start_at is not None]
    assert start_ats, "no truncated stage fn was built"
    assert all(s in grid for s in start_ats), (start_ats, grid.tolist())


def test_sample_sr_truncation(cascade):
    """sample(sr_start_noise_levels=...) runs SR stages as truncated
    refinement of the previous stage's output (round-4: the cascade-serving
    form of super_resolve's SDEdit path)."""
    rng = np.random.default_rng(9)
    embeds = jnp.asarray(rng.normal(size=(2, 6, 512)), jnp.float32)
    mask = jnp.ones((2, 6), jnp.bool_)
    kw = dict(text_embeds=embeds, text_masks=mask, cond_scale=2.0,
              sampler="ddim", sample_steps=8, cache_interval=None,
              key=jax.random.PRNGKey(11))
    cascade._jit_cache.clear()
    full = np.asarray(cascade.sample(**kw))
    trunc = np.asarray(cascade.sample(sr_start_noise_levels=0.5, **kw))
    assert trunc.shape == full.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(trunc)) and trunc.min() >= 0.0 and trunc.max() <= 1.0
    assert not np.array_equal(trunc, full)  # truly truncated, not a no-op
    # deterministic at a fixed key
    trunc2 = np.asarray(cascade.sample(sr_start_noise_levels=0.5, **kw))
    np.testing.assert_array_equal(trunc, trunc2)
    # the SR stage fn was built with a static start_at ON the DDIM grid
    grid = np.asarray(
        cascade.noise_schedulers[1].strided_sampling_timesteps(8))[:, 0]
    start_ats = [k.start_at for k in cascade._jit_cache
                 if getattr(k, "kind", None) == "sample" and k.start_at is not None]
    assert start_ats and all(s in grid for s in start_ats)
    # per-stage sequence form (None for the base stage) == scalar form
    trunc3 = np.asarray(cascade.sample(sr_start_noise_levels=(None, 0.5), **kw))
    np.testing.assert_array_equal(trunc, trunc3)
    # default (None) path is bitwise-unchanged by the feature's existence
    full2 = np.asarray(cascade.sample(**kw))
    np.testing.assert_array_equal(full, full2)


def test_forward_default_key_is_fresh_entropy(cascade):
    """Without an explicit key, two forward() calls must draw different
    times/noise (reference draws fresh randoms per call, Imagen.py:615)."""
    images, embeds, mask = _batch()
    a = cascade.forward(images, text_embeds=embeds, text_masks=mask, unet_number=1)
    b = cascade.forward(images, text_embeds=embeds, text_masks=mask, unet_number=1)
    assert float(a) != float(b)


def test_encoder_cache_auto_dispatch(cascade):
    """'auto' cache_interval resolves per stage via the FLOPs-vs-carry-bytes
    cost model (round-2 VERDICT next #5): tiny models -> OFF (exact numerics),
    flagship-sized stages -> N=2."""
    # tiny cascade: both stages must resolve to OFF
    for stage in (0, 1):
        assert cascade._resolve_cache_interval("auto", stage, 4, 6) is None
    # explicit values pass through untouched
    assert cascade._resolve_cache_interval(None, 0, 4, 6) is None
    assert cascade._resolve_cache_interval(3, 0, 4, 6) == 3

    # a flagship-sized base stage must enable caching
    big = Imagen(unets=[UnetConfig(dim=128, dim_mults=(1, 2, 3, 4),
                                   num_resnet_blocks=3,
                                   layer_attns=(False, True, True, True),
                                   layer_cross_attns=(False, True, True, True),
                                   text_embed_dim=768)],
                 image_sizes=(64,), timesteps=1000, cond_drop_prob=0.1,
                 text_encoder_name="t5_base")
    stats = big.encoder_cache_cost_model(0, batch_size=8, text_len=64)
    assert stats["enable"], stats
    assert big._resolve_cache_interval("auto", 0, 8, 64) == 2
    # the cost model is abstract: no params were ever initialized
    assert big.params is None


def test_sample_auto_cache_default_matches_exact_on_tiny(cascade):
    """With the tiny cascade, the 'auto' default must produce bit-identical
    samples to an explicit exact run (auto resolves to OFF)."""
    _, embeds, mask = _batch()
    a = cascade.sample(text_embeds=embeds, text_masks=mask, sampler="ddim",
                       sample_steps=4, key=jax.random.PRNGKey(9))
    b = cascade.sample(text_embeds=embeds, text_masks=mask, sampler="ddim",
                       sample_steps=4, key=jax.random.PRNGKey(9),
                       cache_interval=None)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_abs_quantile_bisect_matches_exact():
    """CDF-bisection quantile (megapixel dynamic-threshold path) vs
    jnp.quantile: agreement to ~1e-5 relative on random rows, including a
    heavy-tailed row and a constant row."""
    from minimagen_tpu.ops.helpers import abs_quantile_bisect

    rng = np.random.default_rng(0)
    rows = np.stack([
        rng.normal(0, 1, 40000),
        rng.standard_cauchy(40000),          # heavy tail
        np.full(40000, 2.5),                 # constant
    ]).astype(np.float32)
    got = np.asarray(abs_quantile_bisect(jnp.asarray(rows), 0.9))
    ref = np.quantile(np.abs(rows), 0.9, axis=-1)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_dynamic_threshold_dispatch_by_size(monkeypatch):
    """_predict_x_start uses the sort quantile below the element threshold
    and the bisection above it (checked via the jaxpr: 'sort' disappears)."""
    imagen = Imagen(unets=[BaseTest()], image_sizes=(8,), timesteps=25,
                    cond_drop_prob=0.1, text_encoder_name="t5_small")
    imagen.init_params(KEY)
    embeds = jnp.zeros((1, 4, 512))
    mask = jnp.ones((1, 4), bool)

    def threshold_jaxpr():
        def f(x):
            return imagen._predict_x_start(
                0, imagen.noise_schedulers[0], imagen.params["unet_0"], x,
                jnp.array([24]), text_embeds=embeds, text_mask=mask,
                lowres_cond_img=None, lowres_noise_times=None,
                cond_scale=1.0, guided=False)
        return str(jax.make_jaxpr(f)(jnp.ones((1, 8, 8, 3))))

    # 8*8*3 = 192 elements: below any sane threshold -> exact sort path
    # (the primitive prints as 'sort[...' in the jaxpr; plain 'sort' also
    # matches gather's indices_are_sorted attribute, so match the bracket)
    assert "sort[" in threshold_jaxpr()
    monkeypatch.setenv("MINIMAGEN_TPU_APPROX_THRESHOLD_MIN", "64")
    assert "sort[" not in threshold_jaxpr()


def test_guidance_rescale_zero_is_exact_and_std_property(cascade):
    """CFG rescale (arXiv 2305.08891 §3.4): phi=0 is bit-exact the reference
    combine; phi=1 pulls the guided prediction's per-sample std back to the
    conditional prediction's; intermediate phi blends linearly."""
    _, embeds, mask = _batch()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    t = jnp.array([3, 7], jnp.int32)
    kw = dict(unet_number=1, cond_scale=7.0, text_embeds=embeds, text_mask=mask)

    guided = cascade.forward_with_cond_scale(x, t, **kw)
    phi0 = cascade.forward_with_cond_scale(x, t, guidance_rescale=0.0, **kw)
    np.testing.assert_array_equal(np.asarray(guided), np.asarray(phi0))

    cond = cascade._unet_forward(0, cascade.params["unet_0"], x, t,
                                 text_embeds=embeds, text_mask=mask,
                                 lowres_cond_img=None, lowres_noise_times=None,
                                 text_keep_mask=jnp.array([True, True]))
    phi1 = cascade.forward_with_cond_scale(x, t, guidance_rescale=1.0, **kw)
    std_cond = np.std(np.asarray(cond), axis=(1, 2, 3))
    std_phi1 = np.std(np.asarray(phi1), axis=(1, 2, 3))
    np.testing.assert_allclose(std_phi1, std_cond, rtol=1e-4)

    # blend: phi * rescaled + (1-phi) * guided, with rescaled = guided * ratio
    phi = 0.6
    mid = cascade.forward_with_cond_scale(x, t, guidance_rescale=phi, **kw)
    g = np.asarray(guided)
    ratio = (std_cond / np.maximum(np.std(g, axis=(1, 2, 3)), 1e-8))[:, None, None, None]
    expected = phi * (g * ratio) + (1.0 - phi) * g
    np.testing.assert_allclose(np.asarray(mid), expected, atol=1e-5)


def test_sample_guidance_rescale_end_to_end(cascade):
    """guidance_rescale threads through sample(): distinct jit-cache entry,
    finite output, differs from phi=0 at the same key."""
    _, embeds, mask = _batch()
    kw = dict(text_embeds=embeds, text_masks=mask, cond_scale=5.0,
              sampler="ddim", sample_steps=4, key=jax.random.PRNGKey(11))
    base = cascade.sample(**kw)
    rescaled = cascade.sample(guidance_rescale=0.7, **kw)
    assert rescaled.shape == base.shape
    assert np.all(np.isfinite(np.asarray(rescaled)))
    assert not np.allclose(np.asarray(base), np.asarray(rescaled))
    keys = [k for k in cascade._jit_cache if getattr(k, "guidance_rescale", 0.0) == 0.7]
    assert keys, "rescaled sampler must get its own jit-cache entry"


def _single_stage(min_snr_gamma=None):
    im = Imagen(unets=[BaseTest()], image_sizes=8, timesteps=25,
                cond_drop_prob=0.15, text_encoder_name="t5_small",
                min_snr_gamma=min_snr_gamma)
    im.init_params(KEY, batch_size=2, text_len=6)
    return im


def test_min_snr_default_off_and_validation():
    """min_snr_gamma=None (default) keeps the reference's unweighted loss
    path; gamma must be positive."""
    im = _single_stage()
    assert im.min_snr_gamma is None
    with pytest.raises(AssertionError):
        _single_stage(min_snr_gamma=-1.0)


def test_min_snr_weighting_math():
    """arXiv 2303.09556 weighting: with all batch rows at the same timestep t,
    weighted loss == min(SNR(t), gamma)/SNR(t) * unweighted loss (the weight
    is constant across the batch, so it factors out of the mean). Huge gamma
    => weight 1 everywhere => identical to the unweighted model."""
    plain = _single_stage()
    gamma = 5.0
    weighted = _single_stage(min_snr_gamma=gamma)
    x, embeds, mask = _batch(size=8)

    sched = plain.noise_schedulers[0]
    for t0 in (0, 5, 12, 24):
        times = jnp.full((2,), t0, jnp.int32)
        kw = dict(key=jax.random.PRNGKey(9), text_embeds=embeds, text_mask=mask)
        base = float(plain._p_losses(0, plain.params["unet_0"], x, times, **kw))
        got = float(weighted._p_losses(0, weighted.params["unet_0"], x, times, **kw))
        abar = float(sched.alphas_cumprod[t0])
        snr = abar / (1.0 - abar)
        w = min(snr, gamma) / snr
        np.testing.assert_allclose(got, w * base, rtol=1e-5)

    big = _single_stage(min_snr_gamma=1e9)  # weight == 1 at every t
    times = jnp.array([3, 20], jnp.int32)
    kw = dict(key=jax.random.PRNGKey(9), text_embeds=embeds, text_mask=mask)
    np.testing.assert_allclose(
        float(big._p_losses(0, big.params["unet_0"], x, times, **kw)),
        float(plain._p_losses(0, plain.params["unet_0"], x, times, **kw)),
        rtol=1e-6)


def test_min_snr_config_roundtrip():
    """The ctor kwarg persists through the training-config completion step, so
    restarted runs inherit it from the saved JSON."""
    from minimagen_tpu.training import imagen_config_dict
    cfg = imagen_config_dict(dict(image_sizes=[8], timesteps=25,
                                  text_encoder_name="t5_small",
                                  min_snr_gamma=5.0))
    assert cfg["min_snr_gamma"] == 5.0
    assert imagen_config_dict(dict(image_sizes=[8], timesteps=25,
                                   text_encoder_name="t5_small"))["min_snr_gamma"] is None


def test_offset_noise_exactness_and_equivalence():
    """offset_noise_scale=0 (default) is the exact reference forward process;
    scale>0 with internally drawn noise equals the plain model fed
    noise + scale*offset explicitly (offset reproduced from the folded key),
    proving both the formula and that the base PRNG stream is untouched."""
    plain = _single_stage()
    assert plain.offset_noise_scale == 0.0
    s = 0.1
    offset_model = Imagen(unets=[BaseTest()], image_sizes=8, timesteps=25,
                          cond_drop_prob=0.15, text_encoder_name="t5_small",
                          offset_noise_scale=s)
    offset_model.init_params(KEY, batch_size=2, text_len=6)

    x, embeds, mask = _batch(size=8)
    key = jax.random.PRNGKey(21)
    kw = dict(key=key, text_embeds=embeds, text_mask=mask)

    # reproduce the internal draw: noise_key is split(key, 3)[0]
    noise_key = jax.random.split(key, 3)[0]
    noise = jax.random.normal(noise_key, x.shape, jnp.float32)
    off = jax.random.normal(jax.random.fold_in(noise_key, 1),
                            (x.shape[0], 1, 1, x.shape[-1]), jnp.float32)

    got = float(offset_model._p_losses(0, offset_model.params["unet_0"], x,
                                       jnp.array([3, 20], jnp.int32), **kw))
    want = float(plain._p_losses(0, plain.params["unet_0"], x,
                                 jnp.array([3, 20], jnp.int32),
                                 noise=noise + s * off, **kw))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    with pytest.raises(AssertionError):
        Imagen(unets=[BaseTest()], image_sizes=8, timesteps=25,
               text_encoder_name="t5_small", offset_noise_scale=-0.1)


def test_offset_noise_not_applied_to_explicit_noise_kwarg():
    """An explicit noise= kwarg (the cross-framework parity hook) is used
    VERBATIM even on an offset-enabled model, so parity tests can feed exact
    reference noise (round-4 ADVICE #4): offset model + explicit noise ==
    plain model + the same explicit noise."""
    plain = _single_stage()
    offset_model = Imagen(unets=[BaseTest()], image_sizes=8, timesteps=25,
                          cond_drop_prob=0.15, text_encoder_name="t5_small",
                          offset_noise_scale=0.3)
    offset_model.params = plain.params

    x, embeds, mask = _batch(size=8)
    key = jax.random.PRNGKey(33)
    noise = jax.random.normal(jax.random.PRNGKey(7), x.shape, jnp.float32)
    kw = dict(key=key, text_embeds=embeds, text_mask=mask, noise=noise)
    t = jnp.array([5, 17], jnp.int32)
    got = float(offset_model._p_losses(0, plain.params["unet_0"], x, t, **kw))
    want = float(plain._p_losses(0, plain.params["unet_0"], x, t, **kw))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_set_training_levers_validates_like_ctor():
    """set_training_levers (the post-construction lever path used by the
    restart CLI and the flagship trainer) runs the SAME validation as the
    ctor — round-4 ADVICE #1/#3: attribute assignment silently accepted
    gamma<=0 (negative loss weights = gradient ascent)."""
    im = _single_stage()
    with pytest.raises(AssertionError):
        im.set_training_levers(min_snr_gamma=0.0)
    with pytest.raises(AssertionError):
        im.set_training_levers(min_snr_gamma=-1.0)
    with pytest.raises(AssertionError):
        im.set_training_levers(offset_noise_scale=-0.1)

    # valid values apply exactly like the ctor (same loss on the same batch)
    im.set_training_levers(min_snr_gamma=5.0, offset_noise_scale=0.1)
    assert im.min_snr_gamma == 5.0 and im.offset_noise_scale == 0.1
    ctor = Imagen(unets=[BaseTest()], image_sizes=8, timesteps=25,
                  cond_drop_prob=0.15, text_encoder_name="t5_small",
                  min_snr_gamma=5.0, offset_noise_scale=0.1)
    ctor.params = im.params
    x, embeds, mask = _batch(size=8)
    kw = dict(key=jax.random.PRNGKey(3), text_embeds=embeds, text_mask=mask)
    t = jnp.array([5, 17], jnp.int32)
    np.testing.assert_allclose(
        float(im._p_losses(0, im.params["unet_0"], x, t, **kw)),
        float(ctor._p_losses(0, im.params["unet_0"], x, t, **kw)), rtol=1e-6)

    # None leaves levers untouched
    im.set_training_levers()
    assert im.min_snr_gamma == 5.0 and im.offset_noise_scale == 0.1
