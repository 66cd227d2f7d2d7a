"""Legacy schedule helpers (reference song_sde/utils.py:23-187).

Dead code in the reference main path (SURVEY.md item 24) -- provided for
inventory parity and for NCSNv1/v2-style experiments. The reference's
secondary model registry and DataParallel `create_model` are superseded by
:mod:`psld_tpu.registry` and the device mesh.
"""

from __future__ import annotations

import numpy as np


def get_sigmas(sigma_min: float, sigma_max: float, num_scales: int):
    """Geometric noise ladder sigma_max -> sigma_min (utils.py ~ get_sigmas)."""
    return np.exp(
        np.linspace(np.log(sigma_max), np.log(sigma_min), num_scales)
    ).astype(np.float32)


def get_ddpm_params(beta_min: float = 0.1, beta_max: float = 20.0,
                    num_diffusion_timesteps: int = 1000) -> dict:
    """Discrete DDPM schedule derived from the continuous VP betas."""
    n = num_diffusion_timesteps
    betas = np.linspace(beta_min / n, beta_max / n, n, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    return {
        "betas": betas.astype(np.float32),
        "alphas": alphas.astype(np.float32),
        "alphas_cumprod": alphas_cumprod.astype(np.float32),
        "sqrt_alphas_cumprod": np.sqrt(alphas_cumprod).astype(np.float32),
        "sqrt_1m_alphas_cumprod": np.sqrt(1.0 - alphas_cumprod).astype(
            np.float32),
        "beta_min": beta_min,
        "beta_max": beta_max,
        "num_diffusion_timesteps": n,
    }
