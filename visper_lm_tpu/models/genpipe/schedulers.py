"""Diffusion schedulers for the unCLIP pipeline.

Two schedulers, matching the reference's pipeline wiring (demo.py:145-147):
  * DDPM (squaredcos_cap_v2) — the image NOISE AUGMENTATION scheduler: the pipeline
    scales the CLIP image embedding, adds noise at `noise_level` (default 0), and
    embeds the level sinusoidally into the class conditioning.
  * DPM-Solver++(2M) — the SAMPLER (DPMSolverMultistepScheduler.from_config swap).
    Implemented as precomputed per-step coefficient tables + a jittable step, so the
    whole 25-step loop lax.scan-s into one XLA program.

All schedules are derived from the SD-2.x training config: 1000 train steps,
scaled_linear betas in [0.00085, 0.012], prediction_type 'v_prediction' for the
768-res 2.1-unclip UNet.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------- beta schedules


def scaled_linear_betas(
    n: int = 1000, beta_start: float = 0.00085, beta_end: float = 0.012
) -> np.ndarray:
    return np.linspace(beta_start ** 0.5, beta_end ** 0.5, n, dtype=np.float64) ** 2


def squaredcos_cap_v2_betas(n: int = 1000, max_beta: float = 0.999) -> np.ndarray:
    """diffusers betas_for_alpha_bar with cosine alpha_bar."""

    def alpha_bar(t):
        return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

    t1 = np.arange(n) / n
    t2 = (np.arange(n) + 1) / n
    return np.minimum(1 - alpha_bar(t2) / alpha_bar(t1), max_beta)


def alphas_cumprod(betas: np.ndarray) -> np.ndarray:
    return np.cumprod(1.0 - betas)


# --------------------------------------------------- DDPM noise augmentation


@dataclasses.dataclass(frozen=True)
class NoiseAugConfig:
    num_train_timesteps: int = 1000


def add_noise(
    cfg: NoiseAugConfig, sample: jax.Array, noise: jax.Array, timestep: int
) -> jax.Array:
    """DDPM q(x_t | x_0) for the image-embedding augmentation scheduler."""
    acp = alphas_cumprod(squaredcos_cap_v2_betas(cfg.num_train_timesteps))
    s = float(np.sqrt(acp[timestep]))
    n = float(np.sqrt(1.0 - acp[timestep]))
    return s * sample + n * noise


# ------------------------------------------------------------ DPM-Solver++2M


@dataclasses.dataclass(frozen=True)
class DPMConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    prediction_type: str = "v_prediction"  # SD-2.1-unclip (768-res line)
    solver_order: int = 2


@dataclasses.dataclass(frozen=True)
class DPMTables:
    """Per-step coefficient tables for a fixed num_inference_steps (host numpy)."""

    timesteps: np.ndarray     # (S,) int32 descending
    alpha_t: np.ndarray       # (S+1,) alpha at each step + final (sigma->0 limit)
    sigma_t: np.ndarray       # (S+1,)
    lambda_t: np.ndarray      # (S+1,)
    init_noise_sigma: float


def make_dpm_tables(cfg: DPMConfig, num_inference_steps: int) -> DPMTables:
    """Mirror of DPMSolverMultistepScheduler.set_timesteps for the default
    (non-Karras, dpmsolver++, lower_order_final) configuration."""
    acp = alphas_cumprod(
        scaled_linear_betas(cfg.num_train_timesteps, cfg.beta_start, cfg.beta_end)
    )
    # diffusers 'linspace' between last step and 0 (timestep_spacing default for
    # DPMSolverMultistep is 'linspace')
    timesteps = (
        np.linspace(0, cfg.num_train_timesteps - 1, num_inference_steps + 1)
        .round()[::-1][:-1]
        .astype(np.int64)
    )
    alpha = np.sqrt(acp[timesteps])                      # (S,)
    sigma = np.sqrt(1.0 - acp[timesteps])
    # final boundary: diffusers appends sigma at TRAIN timestep 0 (not 0.0 —
    # set_timesteps' `sigma_last = ((1-acp[0])/acp[0])**0.5`), so the last
    # update lands on the t=0 marginal, alpha=sqrt(acp[0]), sigma=sqrt(1-acp[0])
    alpha = np.concatenate([alpha, [np.sqrt(acp[0])]])
    sigma = np.concatenate([sigma, [np.sqrt(1.0 - acp[0])]])
    lam = np.log(alpha) - np.log(sigma)
    return DPMTables(
        timesteps=timesteps.astype(np.int32),
        alpha_t=alpha.astype(np.float64),
        sigma_t=sigma.astype(np.float64),
        lambda_t=lam.astype(np.float64),
        init_noise_sigma=1.0,
    )


def data_prediction(
    cfg: DPMConfig,
    model_output: jax.Array,
    sample: jax.Array,
    alpha: jax.Array,
    sigma: jax.Array,
) -> jax.Array:
    """Convert the UNet output to an x0 prediction (DPM-Solver++ operates on x0)."""
    if cfg.prediction_type == "v_prediction":
        return alpha * sample - sigma * model_output
    if cfg.prediction_type == "epsilon":
        return (sample - sigma * model_output) / alpha
    raise ValueError(cfg.prediction_type)


def make_dpm_step_coeffs(tables: DPMTables) -> dict:
    """Stack per-step scalars into arrays consumable by lax.scan.

    For step i (0-based over S steps), DPM-Solver++(2M):
      first step (or last step, lower_order_final): 1st-order update
        x <- (sigma_{i+1}/sigma_i) x - alpha_{i+1} (e^{-h} - 1) x0_i
      otherwise 2nd-order multistep:
        r = h_prev / h,  D = (1 + 1/(2r)) x0_i - (1/(2r)) x0_{i-1}
        x <- (sigma_{i+1}/sigma_i) x - alpha_{i+1} (e^{-h} - 1) D
      with h = lambda_{i+1} - lambda_i.
    """
    S = len(tables.timesteps)
    lam, alpha, sigma = tables.lambda_t, tables.alpha_t, tables.sigma_t
    sigma_ratio = np.empty(S)
    alpha_coef = np.empty(S)
    r_weight = np.empty(S)  # 1/(2r); 0 for first-order steps
    for i in range(S):
        h = lam[i + 1] - lam[i]
        sigma_ratio[i] = sigma[i + 1] / sigma[i]
        alpha_coef[i] = -alpha[i + 1] * np.expm1(-h)
        # diffusers lower_order_final drops to 1st order at the LAST step only
        # for short schedules (< 15 steps); the shipped 25-step pipe stays 2nd
        # order throughout (DPMSolverMultistepScheduler.step's
        # `lower_order_final = ... and len(timesteps) < 15`).
        if i == 0 or (i == S - 1 and S < 15):
            r_weight[i] = 0.0
        else:
            h_prev = lam[i] - lam[i - 1]
            r_weight[i] = h / (2.0 * h_prev)
    return {
        "timesteps": jnp.asarray(tables.timesteps),
        "alpha": jnp.asarray(alpha[:-1], jnp.float32),
        "sigma": jnp.asarray(sigma[:-1], jnp.float32),
        "sigma_ratio": jnp.asarray(sigma_ratio, jnp.float32),
        "alpha_coef": jnp.asarray(alpha_coef, jnp.float32),
        "r_weight": jnp.asarray(r_weight, jnp.float32),
    }


def dpm_step(
    coeffs_i: dict,
    sample: jax.Array,
    x0: jax.Array,
    x0_prev: jax.Array,
) -> jax.Array:
    """One DPM-Solver++(2M) update given this step's scalar coefficients."""
    w = coeffs_i["r_weight"]
    d = (1.0 + w) * x0 - w * x0_prev
    return coeffs_i["sigma_ratio"] * sample + coeffs_i["alpha_coef"] * d
