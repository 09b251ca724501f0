"""Periodic Vibration Gaussians (PVG) — self-supervised dynamic background.

Re-derivation of OmniRe/models/gaussians/pvg.py:24-449: each gaussian
carries a life peak tau, a log life-span beta, and a vibration velocity v;
at time t (normalized to the cycle T):

  a        = 2 pi / T
  means(t) = means + v * sin((t - tau) * a) / a          (pvg.py:66-69)
  opac(t)  = opac * exp(-0.5 (t - tau)^2 / beta^2)       (pvg.py:76-78)
  velocity = v * exp(-0.5 * beta / T)   ("staticness" damped, :83-88)

PVG also densifies on temporal gradients/sizes; here the temporal params
ride in the same capacity-padded SoA so the shared controller covers them
(the t-grad trigger lands with a PVG-specific DensifyState extension in a
later round).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.gaussians import GaussianParams


class PvgParams(NamedTuple):
    gauss: GaussianParams
    taus: jax.Array        # (C,) life peak (normalized time units)
    log_betas: jax.Array   # (C,) log life span
    velocity: jax.Array    # (C, 3)


class PvgConfig(NamedTuple):
    cycle_length: float = 0.2
    betas_init: float = 0.1


def create_pvg(gauss: GaussianParams, init_times: jax.Array,
               cfg: PvgConfig) -> PvgParams:
    """init_times: (C,) capture time of each seed point (pvg.py:53)."""
    c = gauss.capacity
    return PvgParams(
        gauss=gauss,
        taus=jnp.asarray(init_times, jnp.float32),
        log_betas=jnp.full((c,), jnp.log(jnp.sqrt(cfg.betas_init))),
        velocity=jnp.zeros((c, 3)),
    )


def pvg_at_time(params: PvgParams, t: jax.Array, cfg: PvgConfig,
                smooth_velocity_dt: jax.Array | None = None):
    """Returns (means(t) (C,3), opacity_factor(t) (C,)) — the factor
    multiplies the activated opacity."""
    a = 2.0 * jnp.pi / cfg.cycle_length
    dt = t - params.taus
    means = params.gauss.means + params.velocity * (jnp.sin(dt * a) / a)[:, None]
    if smooth_velocity_dt is not None:
        rho = jnp.exp(params.log_betas) / cfg.cycle_length
        v_eff = params.velocity * jnp.exp(-0.5 * rho)[:, None]
        means = means + v_eff * smooth_velocity_dt
    betas = jnp.exp(params.log_betas)
    opac_factor = jnp.exp(-0.5 * dt ** 2 / jnp.maximum(betas ** 2, 1e-8))
    return means, opac_factor


def pvg_staticness(params: PvgParams, cfg: PvgConfig) -> jax.Array:
    """rho = beta / T: high = effectively static (pvg.py:83-85)."""
    return jnp.exp(params.log_betas) / cfg.cycle_length


def velocity_reg(params: PvgParams, alive: jax.Array) -> jax.Array:
    w = alive.astype(jnp.float32)
    return jnp.sum(jnp.sum(params.velocity ** 2, -1) * w) \
        / jnp.maximum(jnp.sum(w), 1.0)
