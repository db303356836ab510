"""Gaussian diffusion math as a frozen pytree of schedule buffers + pure functions.

Capability parity with the reference scheduler (/root/reference/minimagen/
diffusion_model.py:8-162) with identical numerics:

- linear beta schedule scaled by 1000/T, beta in [scale*1e-4, scale*0.02],
  computed in float64 and stored as float32 buffers (reference :28-66),
- `q_sample`, `q_posterior`, `predict_start_from_noise` with the DDPM
  closed forms (https://arxiv.org/abs/2006.11239),
- T >= 20 assertion (below that beta_end > 1 and the schedule NaNs,
  reference :23-24).

Design differences (TPU-first):
- The scheduler is a `flax.struct` dataclass: an immutable pytree that can be
  closed over by / passed through `jit`, `scan`, and `pjit` with zero host
  sync.  The reference instead subclasses nn.Module and registers buffers.
- Random sampling takes explicit `jax.random` keys.
- `sampling_timesteps()` returns one (T,) descending array that drives a
  single `lax.scan` (the reference materializes a Python list of T tensors,
  diffusion_model.py:81-87, driving a Python loop).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .helpers import extract


@struct.dataclass
class GaussianDiffusion:
    """Immutable diffusion schedule. Build with :func:`create_gaussian_diffusion`."""

    num_timesteps: int = struct.field(pytree_node=False)

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    # ------------------------------------------------------------------ #
    # forward process                                                    #
    # ------------------------------------------------------------------ #
    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """x_t = sqrt(abar_t) x_0 + sqrt(1 - abar_t) eps  (reference :127-147)."""
        nd = x_start.ndim
        return (
            extract(self.sqrt_alphas_cumprod, t, nd) * x_start
            + extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def predict_start_from_noise(self, x_t: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """Invert epsilon-prediction to recover x_0 (reference :149-162)."""
        nd = x_t.ndim
        return (
            extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * noise
        )

    def q_posterior(self, x_start: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray):
        """Posterior q(x_{t-1} | x_t, x_0) mean / variance / clipped log-variance.

        Reference :89-125.  Returns tensors shaped (b,c-dims...) for the mean
        and (b,1,..,1) for the variances.
        """
        nd = x_t.ndim
        posterior_mean = (
            extract(self.posterior_mean_coef1, t, nd) * x_start
            + extract(self.posterior_mean_coef2, t, nd) * x_t
        )
        posterior_variance = extract(self.posterior_variance, t, nd)
        posterior_log_variance_clipped = extract(self.posterior_log_variance_clipped, t, nd)
        return posterior_mean, posterior_variance, posterior_log_variance_clipped

    # ------------------------------------------------------------------ #
    # time sampling                                                      #
    # ------------------------------------------------------------------ #
    def sample_random_times(self, key: jax.Array, batch_size: int) -> jnp.ndarray:
        """Uniform integer timesteps in [0, T) (reference :71-79)."""
        return jax.random.randint(key, (batch_size,), 0, self.num_timesteps, dtype=jnp.int32)

    def get_times(self, batch_size: int, noise_level: float) -> jnp.ndarray:
        """Full batch of the timestep at a fixed noise level (reference :68-69)."""
        return jnp.full((batch_size,), int(self.num_timesteps * noise_level), dtype=jnp.int32)

    def sampling_timesteps(self) -> jnp.ndarray:
        """Descending (T,) int32 timestep array: T-1, ..., 1, 0.

        Drives the compiled `lax.scan` sampler; equivalent content to the
        reference's list of per-step tensors (diffusion_model.py:81-87).
        """
        return jnp.arange(self.num_timesteps - 1, -1, -1, dtype=jnp.int32)

    def strided_sampling_timesteps(self, num_steps: int,
                                   spacing: str = "time") -> np.ndarray:
        """(num_steps, 2) array of (t, t_prev) pairs, descending, evenly
        strided over [0, T) and ending at t=0 with t_prev=-1.

        Used by the DDIM/DPM++ samplers (TPU-era capabilities beyond the
        reference, which always walks all T steps, Imagen.py:395-415):
        sampling cost drops from T model calls to `num_steps`.

        :param spacing: 'time' (evenly strided timesteps — the DDIM-paper
            default), 'lambda' (evenly strided in log-SNR
            lambda = log(alpha/sigma), the DPM-Solver grid: equal-size
            solver steps h_i, concentrating model calls in the
            high-curvature low-noise tail — typically better at small
            `num_steps`, especially for 'dpmpp'), or 'karras' (evenly
            strided in sigma^(1/7) with sigma = sqrt((1-abar)/abar), the
            EDM noise grid of Karras et al., arXiv 2206.00364 eq. 5: a
            milder low-noise concentration than 'lambda').
        """
        assert 1 <= num_steps <= self.num_timesteps
        assert spacing in ("time", "lambda", "karras"), f"unknown spacing {spacing!r}"
        if spacing == "time":
            ts = np.linspace(0, self.num_timesteps - 1, num_steps).round().astype(np.int64)
        elif spacing == "karras":
            ac = np.asarray(self.alphas_cumprod, np.float64)[: self.num_timesteps]
            sig = np.sqrt((1.0 - ac) / ac)  # VP sigma, decreasing as t -> 0
            warped = sig ** (1.0 / 7.0)  # Karras rho = 7
            # from sigma_max (t = T-1) down to sigma_min (t = 0); nearest
            # lookup in the warped space (monotone in t)
            targets = np.linspace(warped[-1], warped[0], num_steps)
            ts = np.abs(warped[None, :] - targets[:, None]).argmin(axis=1)
        else:
            ac = np.asarray(self.alphas_cumprod, np.float64)
            lam = 0.5 * (np.log(ac) - np.log1p(-ac))  # log(alpha/sigma), increasing as t -> 0
            targets = np.linspace(lam[self.num_timesteps - 1], lam[0], num_steps)
            # invert the (monotone decreasing in t) discrete lambda array by
            # nearest lookup; duplicates collapse below like the time grid
            ts = np.abs(lam[None, : self.num_timesteps] - targets[:, None]).argmin(axis=1)
        ts = np.unique(ts)[::-1]  # descending, unique
        t_prev = np.concatenate([ts[1:], [-1]])
        return np.stack([ts, t_prev], axis=1)

    def ddim_step(self, x_t: jnp.ndarray, x0: jnp.ndarray, t: jnp.ndarray,
                  t_prev: jnp.ndarray) -> jnp.ndarray:
        """Deterministic DDIM (eta=0) update from timestep `t` to `t_prev`.

        x_{t_prev} = sqrt(abar_prev) x0 + sqrt(1 - abar_prev) eps_hat, with
        eps_hat re-derived from (x_t, x0).  `t_prev < 0` means "to x0".
        (Song et al., Denoising Diffusion Implicit Models, 2020.)
        """
        nd = x_t.ndim
        abar_t = extract(self.alphas_cumprod, t, nd)
        tp = t_prev.reshape(t_prev.shape[0], *((1,) * (nd - 1)))
        # t_prev < 0 -> abar_prev = 1 (fully denoised)
        abar_prev = jnp.where(
            tp < 0, 1.0, extract(self.alphas_cumprod, jnp.maximum(t_prev, 0), nd)
        )
        eps = (x_t - jnp.sqrt(abar_t) * x0) * jax.lax.rsqrt(1.0 - abar_t)
        return jnp.sqrt(abar_prev) * x0 + jnp.sqrt(1.0 - abar_prev) * eps

    def dpmpp_2m_coefficients(self, pairs: np.ndarray) -> np.ndarray:
        """Per-step coefficients for the DPM-Solver++(2M) data-prediction
        update (Lu et al., https://arxiv.org/abs/2211.01095, Algorithm 2),
        precomputed on the host in float64.

        `pairs` is the (already start_at-filtered) (num_steps, 2) grid from
        :meth:`strided_sampling_timesteps`. Returns a (num_steps, 4) float32
        array of (ratio, coef, c1, c2) such that the sampler's per-step
        update, with x0_i the (thresholded) data prediction at step i, is

            D_i = c1 * x0_i + c2 * x0_{i-1}
            x  <- ratio * x + coef * D_i

        In schedule terms, with alpha = sqrt(abar), sigma = sqrt(1 - abar),
        lambda = log(alpha/sigma) and h_i = lambda_prev - lambda_t:
        ratio = sigma_prev/sigma_t, coef = alpha_prev * (1 - e^{-h_i}),
        c2 = -1/(2 r_i) with r_i = h_{i-1}/h_i, c1 = 1 - c2. The first step
        (no history) and the final step to t_prev = -1 (sigma_prev = 0,
        h = inf: ratio -> 0, coef -> 1, i.e. return x0 exactly like
        :meth:`ddim_step`) use the first-order update (c1=1, c2=0) — the
        standard `lower_order_final` stabilization.

        A constant x0 prediction makes this update identical to DDIM
        (coef = alpha_prev - alpha_t * sigma_prev/sigma_t), which is pinned
        by tests as a golden cross-check of the coefficients.
        """
        pairs = np.asarray(pairs, np.int64)
        ac = np.asarray(self.alphas_cumprod, np.float64)
        t, tp = pairs[:, 0], pairs[:, 1]
        last = tp < 0
        a_t = np.sqrt(ac[t])
        s_t = np.sqrt(1.0 - ac[t])
        lam_t = np.log(a_t / s_t)
        tp_safe = np.maximum(tp, 0)
        a_p = np.where(last, 1.0, np.sqrt(ac[tp_safe]))
        s_p = np.where(last, 0.0, np.sqrt(1.0 - ac[tp_safe]))
        with np.errstate(divide="ignore"):
            lam_p = np.where(last, np.inf, np.log(a_p / np.where(last, 1.0, s_p)))
        h = lam_p - lam_t  # > 0: lambda increases as noise decreases
        ratio = np.where(last, 0.0, s_p / s_t)
        coef = a_p * (-np.expm1(-h))  # h = inf on the last step -> coef = 1
        h_prev = np.concatenate([[np.nan], h[:-1]])
        first = np.arange(len(t)) == 0
        with np.errstate(invalid="ignore", divide="ignore"):
            r = h_prev / h
            c2 = np.where(first | last, 0.0, -1.0 / (2.0 * r))
        c1 = 1.0 - c2
        out = np.stack([ratio, coef, c1, c2], axis=1).astype(np.float32)
        assert np.all(np.isfinite(out)), "non-finite DPM++ coefficients"
        return out


    def unipc_c_coefficients(self, pairs: np.ndarray) -> np.ndarray:
        """Per-step UniC-2 corrector coefficients for the UniPC sampler
        (Zhao et al., UniPC: A Unified Predictor-Corrector Framework,
        arXiv 2302.04867; data-prediction form, B(h) = e^{hh} - 1 a.k.a.
        'bh2'), precomputed on the host in float64.

        UniPC-2's *predictor* is algebraically identical to the
        DPM-Solver++(2M) update (:meth:`dpmpp_2m_coefficients`); the new
        piece is the *corrector*, which reuses the model call at each grid
        point to re-integrate the transition that LANDED there with one more
        Taylor term — order-3 local accuracy at the same number of model
        evaluations.

        Row i is applied at grid point i, where the model was just evaluated
        (giving the thresholded data prediction x0_t), and corrects the
        transition of row i-1 — from s0 = t_{i-1} to t = t_i — by
        recomputing it FROM the (corrected) previous sample x_s0:

            x_corr = c_self*x + cr*x_s0 + cm0*x0_s0
                     + cd1*(x0_s1 - x0_s0) + cdt*(x0_t - x0_s0)

        where x is the uncorrected predictor output at t_i (only used to
        evaluate the model), x0_s0/x0_s1 are the model outputs at the
        previous one/two grid points. Row 0 is the identity (c_self=1:
        nothing to correct); row 1 is the order-1 corrector (no s1 history,
        cd1=0); rows 2+ are order 2. The rho weights are solved exactly from
        the B(h) linear system at each step's finite h (the public
        implementations hardcode the h->0 limit rho=[0.5] for the low-order
        cases; the exact solve is what the system prescribes).

        With a constant x0 prediction every difference term vanishes and
        cr*x_s0 + cm0*x0 is algebraically the exact transition
        (:meth:`ddim_step` from s0 to t) — the corrector preserves the exact
        solution, pinned by tests as the same golden cross-check as the
        DPM++ coefficients. The transition into the terminal t_prev = -1 is
        never corrected (no model call happens after the final grid point) —
        standard lower-order-final behavior.
        """
        pairs = np.asarray(pairs, np.int64)
        K = len(pairs)
        out = np.zeros((K, 5), np.float64)
        out[0, 0] = 1.0
        if K > 1:
            ac = np.asarray(self.alphas_cumprod, np.float64)
            a = np.sqrt(ac)
            s = np.sqrt(1.0 - ac)
            lam = np.log(a / s)
            for i in range(1, K):
                s0, t = pairs[i - 1]
                assert t == pairs[i, 0] and t >= 0
                h = lam[t] - lam[s0]  # > 0: lambda increases as noise decreases
                hh = -h               # data-prediction sign convention
                h_phi_1 = np.expm1(hh)  # e^{-h} - 1 < 0
                B_h = h_phi_1           # 'bh2'
                b0 = (h_phi_1 / hh - 1.0) / B_h
                rho_hist, rho_t, r1 = 0.0, b0, 1.0
                if i >= 2:
                    s1 = pairs[i - 2, 0]
                    r1 = (lam[s1] - lam[s0]) / h  # < 0: s1 is the NOISIER past point
                    h_phi_2 = (h_phi_1 / hh - 1.0) / hh - 0.5
                    b1 = 2.0 * h_phi_2 / B_h
                    # solve [[1, 1], [r1, 1]] @ [rho_hist, rho_t] = [b0, b1]
                    rho_hist = (b0 - b1) / (1.0 - r1)
                    rho_t = b0 - rho_hist
                cr = s[t] / s[s0]
                cm0 = -a[t] * h_phi_1  # = a_t * (1 - e^{-h}) > 0
                # D1_s1 = (x0_s1 - x0_s0)/r1 folded into the coefficient
                cd1 = -a[t] * B_h * rho_hist / r1
                cdt = -a[t] * B_h * rho_t
                out[i] = (0.0, cr, cm0, cd1, cdt)
        res = out.astype(np.float32)
        assert np.all(np.isfinite(res)), "non-finite UniPC corrector coefficients"
        return res


def create_gaussian_diffusion(timesteps: int) -> GaussianDiffusion:
    """Build the schedule in float64 numpy; store float32 device buffers.

    Mirrors the reference constructor's numerics exactly
    (diffusion_model.py:13-66), including the 1e-20 clip on the posterior
    variance before the log.

    Documented deviation (T=20 edge): at exactly T=20 the schedule's
    beta_end = (1000/20)*0.02 = 1.0, so alpha_T = 0 and abar_T = 0 — the
    reference (whose assert is `timesteps >= 20`, diffusion_model.py:23-24)
    silently builds inf `sqrt_recip*` buffers and a -inf log buffer, which
    turn the t=T-1 x0-prediction into NaN at sample time.  Here abar is
    floored at 1e-20 for the reciprocal/log-derived buffers only, so T=20
    stays finite and usable; every T > 20 is bit-identical to the reference.
    """
    assert not timesteps < 20, "timesteps must be at least 20"

    scale = 1000.0 / timesteps
    beta_start = scale * 0.0001
    beta_end = scale * 0.02
    betas = np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)

    # floor abar away from 0 for reciprocal/log buffers: identical for T > 20,
    # finite (instead of the reference's inf/NaN) at the T=20 edge
    ac_safe = np.clip(alphas_cumprod, 1e-20, None)

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)

    return GaussianDiffusion(
        num_timesteps=timesteps,
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(np.clip(1.0 - alphas_cumprod, 1e-20, None))),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / ac_safe)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / ac_safe - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(np.log(np.clip(posterior_variance, 1e-20, None))),
        posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=f32((1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
    )
