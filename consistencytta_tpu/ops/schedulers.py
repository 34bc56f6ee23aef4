"""Diffusion noise schedules and solvers as pure functions of sigma tables.

The reference carries three stateful scheduler objects (vendored, modified
HF Diffusers): DDPMScheduler (stage-1 noise schedule), DDIMScheduler
(stage-2 non-EDM teacher solver + inference), and HeunDiscreteScheduler
(the shipped EDM recipe), all adapted for batched per-sample timesteps
(reference diffusers/schedulers/scheduling_{ddpm,ddim,heun_discrete}.py).

On TPU, hidden solver state (`self.dt`, `self.prev_derivative`,
`self.sample` in scheduling_heun_discrete.py:269-356) is jit-hostile. This
module re-derives the same math as:

  * precomputed numpy tables wrapped in frozen dataclasses, and
  * pure step functions (explicitly two-phase for Heun), vmappable over
    per-sample sigmas — which is what the reference's batched-timestep
    modifications were approximating.

Numerical parity with the reference is covered by tests/test_schedulers.py,
which runs the reference torch schedulers side by side.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from consistencytta_tpu.configs import SchedulerConfig


# ---------------------------------------------------------------------------
# Beta / alpha-bar tables
# ---------------------------------------------------------------------------


def make_betas(config: SchedulerConfig) -> np.ndarray:
    """Beta table. `scaled_linear` matches scheduling_heun_discrete.py:113-120
    (the SD-2.1 schedule the reference loads from the hub)."""
    n = config.num_train_timesteps
    if config.beta_schedule == "linear":
        return np.linspace(config.beta_start, config.beta_end, n, dtype=np.float64)
    if config.beta_schedule == "scaled_linear":
        return (
            np.linspace(config.beta_start**0.5, config.beta_end**0.5, n, dtype=np.float64)
            ** 2
        )
    if config.beta_schedule == "squaredcos_cap_v2":
        # Glide cosine schedule (scheduling_heun_discrete.py:28-54)
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        i = np.arange(n, dtype=np.float64)
        return np.minimum(1 - alpha_bar((i + 1) / n) / alpha_bar(i / n), 0.999)
    raise ValueError(f"unknown beta schedule {config.beta_schedule!r}")


def make_alphas_cumprod(config: SchedulerConfig) -> np.ndarray:
    # float32 cumprod to match torch.cumprod over float32 betas exactly
    betas32 = make_betas(config).astype(np.float32)
    return np.cumprod(1.0 - betas32, dtype=np.float32)


# ---------------------------------------------------------------------------
# Prediction-type conversions (v-prediction is the shipped setting)
# ---------------------------------------------------------------------------


def pred_x0_from_v_abar(z_t, v, abar):
    """x0 from v-prediction in alpha-bar space (DDPM/DDIM convention):
    x0 = sqrt(abar) z_t - sqrt(1-abar) v  (scheduling_ddim.py:316-320)."""
    abar = jnp.asarray(abar, z_t.dtype)
    return jnp.sqrt(abar) * z_t - jnp.sqrt(1.0 - abar) * v


def pred_eps_from_v_abar(z_t, v, abar):
    """eps = sqrt(abar) v + sqrt(1-abar) z_t (scheduling_ddim.py:321)."""
    abar = jnp.asarray(abar, z_t.dtype)
    return jnp.sqrt(abar) * v + jnp.sqrt(1.0 - abar) * z_t


def velocity_from_x0_eps(x0, eps, abar):
    """v = sqrt(abar) eps - sqrt(1-abar) x0 (scheduling_ddim.py:get_velocity)."""
    return jnp.sqrt(abar) * eps - jnp.sqrt(1.0 - abar) * x0


# ---------------------------------------------------------------------------
# DDPM (stage-1 noise schedule; no solver needed for training)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DDPMSchedule:
    """Stage-1 noise schedule (reference scheduling_ddpm.py, SD-2.1 config).

    `timesteps` descends 999..0; `init_noise_sigma` is 1 (variance-preserving
    parameterization)."""

    alphas_cumprod: jax.Array  # [N] float32
    num_train_timesteps: int
    prediction_type: str

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def timesteps(self) -> jax.Array:
        return jnp.arange(self.num_train_timesteps - 1, -1, -1, dtype=jnp.int32)

    def add_noise(self, x0, noise, t):
        """z_t = sqrt(abar_t) x0 + sqrt(1-abar_t) eps, batched t [B]."""
        abar = self.alphas_cumprod[t].reshape((-1,) + (1,) * (x0.ndim - 1))
        return jnp.sqrt(abar) * x0 + jnp.sqrt(1.0 - abar) * noise

    def snr(self, t):
        """(alpha/sigma)^2 per Min-SNR (models/audio_distilled_model.py:165-192)."""
        abar = self.alphas_cumprod[t]
        return abar / (1.0 - abar)


def make_ddpm_schedule(config: SchedulerConfig) -> DDPMSchedule:
    return DDPMSchedule(
        alphas_cumprod=jnp.asarray(make_alphas_cumprod(config)),
        num_train_timesteps=config.num_train_timesteps,
        prediction_type=config.prediction_type,
    )


# ---------------------------------------------------------------------------
# DDIM (non-EDM teacher solver and inference scheduler)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class DDIMSchedule:
    """DDIM inference schedule (reference scheduling_ddim.py, batched-t mods).

    timesteps = (arange(n) * (N // n)).round()[::-1], integer, descending
    (scheduling_ddim.py:218-241)."""

    alphas_cumprod: jax.Array  # [N] float32
    timesteps: jax.Array  # [n] int32 descending
    num_train_timesteps: int
    num_inference_steps: int
    prediction_type: str
    final_alpha_cumprod: float  # alphas_cumprod[0] (set_alpha_to_one=False)

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def scale_model_input(self, sample, t=None):
        return sample

    def add_noise(self, x0, noise, t):
        abar = self.alphas_cumprod[t].reshape((-1,) + (1,) * (x0.ndim - 1))
        return jnp.sqrt(abar) * x0 + jnp.sqrt(1.0 - abar) * noise

    def snr(self, t):
        abar = self.alphas_cumprod[t]
        return abar / (1.0 - abar)

    def step(self, model_output, t, sample):
        """Deterministic (eta=0) DDIM step with batched integer t [B].

        Matches scheduling_ddim.py:297-368 for the v_prediction/epsilon paths
        used by the reference.
        """
        shape = (-1,) + (1,) * (sample.ndim - 1)
        t = jnp.asarray(t).reshape(-1)
        prev_t = t - self.num_train_timesteps // self.num_inference_steps
        abar_t = self.alphas_cumprod[t].reshape(shape)
        abar_prev = jnp.where(
            prev_t >= 0, self.alphas_cumprod[jnp.maximum(prev_t, 0)],
            jnp.asarray(self.final_alpha_cumprod, jnp.float32),
        ).reshape(shape)

        if self.prediction_type == "v_prediction":
            x0 = pred_x0_from_v_abar(sample, model_output, abar_t)
            eps = pred_eps_from_v_abar(sample, model_output, abar_t)
        elif self.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(1.0 - abar_t) * model_output) / jnp.sqrt(abar_t)
            eps = model_output
        else:
            raise ValueError(f"unsupported prediction type {self.prediction_type}")

        direction = jnp.sqrt(1.0 - abar_prev) * eps
        return jnp.sqrt(abar_prev) * x0 + direction


def make_ddim_schedule(
    config: SchedulerConfig, num_inference_steps: int
) -> DDIMSchedule:
    abar = make_alphas_cumprod(config)
    step_ratio = config.num_train_timesteps // num_inference_steps
    timesteps = (np.arange(num_inference_steps) * step_ratio).round()[::-1].copy()
    return DDIMSchedule(
        alphas_cumprod=jnp.asarray(abar),
        timesteps=jnp.asarray(timesteps.astype(np.int32)),
        num_train_timesteps=config.num_train_timesteps,
        num_inference_steps=num_inference_steps,
        prediction_type=config.prediction_type,
        final_alpha_cumprod=float(abar[0]),
    )


# ---------------------------------------------------------------------------
# Heun / EDM (the shipped recipe: --use_edm)
# ---------------------------------------------------------------------------


def _sigma_to_t(sigma: np.ndarray, log_sigmas: np.ndarray) -> np.ndarray:
    """Invert the sigma table by log-sigma interpolation
    (scheduling_heun_discrete.py:229-252); used for Karras schedules."""
    log_sigma = np.log(sigma)
    dists = log_sigma - log_sigmas[:, None]
    low_idx = np.cumsum((dists >= 0), axis=0).argmax(axis=0).clip(
        max=log_sigmas.shape[0] - 2
    )
    high_idx = low_idx + 1
    low, high = log_sigmas[low_idx], log_sigmas[high_idx]
    w = np.clip((low - log_sigma) / (low - high), 0, 1)
    return ((1 - w) * low_idx + w * high_idx).reshape(sigma.shape)


@dataclass(frozen=True)
class HeunSchedule:
    """EDM sigma schedule with 2nd-order Heun solver, pure-functional.

    Unlike the reference's duplicated-timestep arrays with a hidden
    first/second-order state machine (scheduling_heun_discrete.py:212-220,
    269-356), this stores the *unique* schedule:

      timesteps: [n]   float32, descending (999, 940.2, ..., 0)
      sigmas:    [n+1] float32, sigma_i per timestep + trailing 0.0

    The solver state machine collapses into `heun_pair` (one Heun interval,
    two model evals) and `euler_step` (the final sigma->0 step), which is
    exactly the sequence the reference's loops trace out.
    """

    timesteps: jax.Array  # [n] float32
    sigmas: jax.Array  # [n+1] float32 (sigmas[n] == 0)
    num_train_timesteps: int
    num_steps: int
    prediction_type: str
    use_karras: bool

    @property
    def init_noise_sigma(self) -> jax.Array:
        """max sigma (scheduling_heun_discrete.py:217)."""
        return self.sigmas[0]

    # -- elementary ops -----------------------------------------------------

    @staticmethod
    def scale_model_input(sample, sigma):
        """z / sqrt(sigma^2 + 1): VP-space input scaling
        (scheduling_heun_discrete.py:151-172). `sigma` broadcasts [B]."""
        sigma = jnp.asarray(sigma, sample.dtype).reshape(
            (-1,) + (1,) * (sample.ndim - 1)
        )
        return sample / jnp.sqrt(sigma**2 + 1.0)

    @staticmethod
    def add_noise(x0, noise, sigma):
        """z = x0 + sigma * eps (scheduling_heun_discrete.py:364-385)."""
        sigma = jnp.asarray(sigma, x0.dtype).reshape((-1,) + (1,) * (x0.ndim - 1))
        return x0 + noise * sigma

    def pred_x0(self, sample, model_output, sigma):
        """Predicted x0 from the *unscaled* sample in sigma space
        (scheduling_heun_discrete.py:316-330)."""
        sigma = jnp.asarray(sigma, sample.dtype).reshape(
            (-1,) + (1,) * (sample.ndim - 1)
        )
        if self.prediction_type == "v_prediction":
            alpha_prod = 1.0 / (sigma**2 + 1.0)
            return sample * alpha_prod - model_output * (
                sigma * jnp.sqrt(alpha_prod)
            )
        if self.prediction_type == "epsilon":
            return sample - sigma * model_output
        raise ValueError(f"unsupported prediction type {self.prediction_type}")

    def snr(self, unique_index):
        """SNR = sigma^-2 for min-SNR weighting under EDM
        (models/audio_consistency_model.py:215-219)."""
        return self.sigmas[unique_index] ** (-2.0)

    # -- solver -------------------------------------------------------------

    def euler_step(self, sample, model_output, sigma, sigma_next):
        """First-order (Euler) step sigma -> sigma_next
        (scheduling_heun_discrete.py:332-341,357)."""
        shape = (-1,) + (1,) * (sample.ndim - 1)
        sigma = jnp.asarray(sigma, sample.dtype).reshape(shape)
        sigma_next = jnp.asarray(sigma_next, sample.dtype).reshape(shape)
        x0 = self.pred_x0(sample, model_output, sigma.reshape(-1))
        derivative = (sample - x0) / sigma
        return sample + derivative * (sigma_next - sigma)

    def heun_pair(
        self,
        sample,
        sigma,
        sigma_next,
        model_fn: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
        timestep,
        timestep_next,
    ):
        """One full Heun interval sigma -> sigma_next with two model evals.

        `model_fn(z_scaled, t, sigma)` returns the raw model output (velocity
        for the shipped checkpoints). Equivalent to the reference sequence:
        scale -> query -> step(1st) -> scale -> query -> step(2nd)
        (models/audio_consistency_model.py:331-351).

        Returns (z_next, z_mid): the Heun-corrected sample and the Euler
        predictor (the reference's first-order zhat before correction).
        """
        shape = (-1,) + (1,) * (sample.ndim - 1)
        sigma_b = jnp.asarray(sigma, sample.dtype).reshape(shape)
        sigma_next_b = jnp.asarray(sigma_next, sample.dtype).reshape(shape)

        out_1 = model_fn(self.scale_model_input(sample, sigma), timestep, sigma)
        x0_1 = self.pred_x0(sample, out_1, sigma)
        d1 = (sample - x0_1) / sigma_b
        dt = sigma_next_b - sigma_b
        z_mid = sample + d1 * dt  # Euler predictor at sigma_next

        out_2 = model_fn(
            self.scale_model_input(z_mid, sigma_next), timestep_next, sigma_next
        )
        x0_2 = self.pred_x0(z_mid, out_2, sigma_next)
        # guard sigma_next == 0 (never hit in the reference's Heun intervals,
        # whose final step is Euler-only; kept for jit-safety)
        safe_next = jnp.where(sigma_next_b == 0.0, 1.0, sigma_next_b)
        d2 = jnp.where(sigma_next_b == 0.0, d1, (z_mid - x0_2) / safe_next)
        z_next = sample + 0.5 * (d1 + d2) * dt
        return z_next, z_mid

    def sample_loop(
        self,
        z_init,
        model_fn: Callable[[jax.Array, jax.Array, jax.Array], jax.Array],
    ):
        """Full multi-step EDM sampling: Heun on every interval, then a final
        Euler step sigma_{n-1} -> 0.

        This is the trajectory traced by the reference's
        `for t in scheduler.timesteps` loops over the duplicated timesteps
        (models/audio_consistency_model.py:518-524 and the validation
        rollout :366-379): 2*(n-1)+1 model evaluations.
        """
        n = self.num_steps

        def body(carry, i):
            z = carry
            b = z.shape[0]
            t_i = jnp.full((b,), self.timesteps[i])
            t_next = jnp.full((b,), self.timesteps[i + 1])
            s_i = jnp.full((b,), self.sigmas[i])
            s_next = jnp.full((b,), self.sigmas[i + 1])
            z_next, _ = self.heun_pair(z, s_i, s_next, model_fn, t_i, t_next)
            return z_next, None

        z, _ = jax.lax.scan(body, z_init, jnp.arange(n - 1))

        # trailing Euler step from the last timestep to sigma = 0
        b = z.shape[0]
        t_last = jnp.full((b,), self.timesteps[n - 1])
        s_last = jnp.full((b,), self.sigmas[n - 1])
        out = model_fn(self.scale_model_input(z, s_last), t_last, s_last)
        return self.euler_step(z, out, s_last, jnp.zeros((b,)))


def make_heun_schedule(
    config: SchedulerConfig, num_steps: int, use_karras: bool = False
) -> HeunSchedule:
    """Build the Heun/EDM schedule (scheduling_heun_discrete.py:174-227).

    sigma_i interpolates sqrt((1-abar)/abar) at n linspace points over the
    training range; Karras (rho=7) optionally re-spaces the sigmas and maps
    them back to fractional timesteps.
    """
    abar = make_alphas_cumprod(config).astype(np.float64)
    n_train = config.num_train_timesteps

    timesteps = np.linspace(0, n_train - 1, num_steps, dtype=np.float64)[::-1].copy()
    sigmas_full = np.sqrt((1 - abar) / abar)
    log_sigmas = np.log(sigmas_full)
    sigmas = np.interp(timesteps, np.arange(n_train), sigmas_full)

    if use_karras:
        rho = 7.0
        sigma_min, sigma_max = sigmas[-1], sigmas[0]
        ramp = np.linspace(0, 1, num_steps)
        sigmas = (
            sigma_max ** (1 / rho)
            + ramp * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))
        ) ** rho
        timesteps = np.array([_sigma_to_t(s, log_sigmas) for s in sigmas])

    sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
    return HeunSchedule(
        timesteps=jnp.asarray(timesteps.astype(np.float32)),
        sigmas=jnp.asarray(sigmas),
        num_train_timesteps=n_train,
        num_steps=num_steps,
        prediction_type=config.prediction_type,
        use_karras=use_karras,
    )


# ---------------------------------------------------------------------------
# Min-SNR loss weighting (stage-agnostic helpers)
# ---------------------------------------------------------------------------


def min_snr_weights_stage1(snr, snr_gamma: float, prediction_type: str):
    """Stage-1 weights (models/audio_guided_model.py:102-112):
    v-prediction: min(SNR, gamma) / (SNR + 1); epsilon: min(SNR, gamma)/SNR."""
    truncated = jnp.minimum(snr, snr_gamma)
    if prediction_type == "v_prediction":
        return truncated / (snr + 1.0)
    if prediction_type == "epsilon":
        return truncated / snr
    raise ValueError(f"unknown prediction type {prediction_type}")


def min_snr_weights_stage2(snr, snr_gamma: float):
    """Stage-2 weights: plain min(SNR, gamma)
    (models/audio_consistency_model.py:260-266)."""
    return jnp.minimum(snr, snr_gamma)
