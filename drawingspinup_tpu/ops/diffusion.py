"""DDIM sampling machinery (pure functions, lax-loop friendly).

The reference samples through the diffusers DDIMScheduler bundled with the
Wonder3D checkpoint (75 steps, guidance 1.0, eta — ``mv.py:85`` +
``pipeline_mvdiffusion_image.py:460-486``). SD-1.x defaults: scaled_linear
betas 0.00085→0.012 over 1000 train steps; epsilon or v prediction.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DDIMConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"     # epsilon | v_prediction
    set_alpha_to_one: bool = False
    steps_offset: int = 1


def alphas_cumprod(cfg: DDIMConfig) -> np.ndarray:
    if cfg.beta_schedule == "scaled_linear":
        betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                            cfg.num_train_timesteps) ** 2
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end,
                            cfg.num_train_timesteps)
    else:
        raise ValueError(cfg.beta_schedule)
    return np.cumprod(1.0 - betas).astype(np.float32)


def timesteps_for(cfg: DDIMConfig, num_inference_steps: int) -> np.ndarray:
    """diffusers leading-spacing timesteps, descending."""
    ratio = cfg.num_train_timesteps // num_inference_steps
    t = (np.arange(num_inference_steps) * ratio).round()[::-1].astype(np.int32)
    return t + cfg.steps_offset


def ddim_step(cfg: DDIMConfig, acp: jnp.ndarray, model_out: jnp.ndarray,
              t: jnp.ndarray, t_prev: jnp.ndarray, sample: jnp.ndarray,
              eta: float = 0.0,
              noise: jnp.ndarray = None) -> jnp.ndarray:
    """One DDIM update x_t → x_{t_prev}. acp: (T,) alphas_cumprod table."""
    a_t = acp[t]
    final = jnp.asarray(1.0) if cfg.set_alpha_to_one else acp[0]
    a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], final)

    if cfg.prediction_type == "epsilon":
        x0 = (sample - jnp.sqrt(1 - a_t) * model_out) / jnp.sqrt(a_t)
        eps = model_out
    else:  # v_prediction
        x0 = jnp.sqrt(a_t) * sample - jnp.sqrt(1 - a_t) * model_out
        eps = jnp.sqrt(a_t) * model_out + jnp.sqrt(1 - a_t) * sample

    sigma = eta * jnp.sqrt(jnp.clip(
        (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev), 0.0, None))
    dir_xt = jnp.sqrt(jnp.clip(1 - a_prev - sigma ** 2, 0.0, None)) * eps
    prev = jnp.sqrt(a_prev) * x0 + dir_xt
    if noise is not None:
        prev = prev + sigma * noise
    return prev


def add_noise(acp: jnp.ndarray, x0: jnp.ndarray, noise: jnp.ndarray,
              t: jnp.ndarray) -> jnp.ndarray:
    a = acp[t]
    while a.ndim < x0.ndim:
        a = a[..., None]
    return jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * noise
