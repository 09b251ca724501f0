"""Single-class trainer: the VanillaGaussians/SingleTrainer-equivalent slice
(reference: OmniRe models/trainers/single.py + base.py hot loop,
tools/train.py:188-292). One fused jitted train step: activate -> SH ->
rasterize -> losses -> backward -> Adam, with densification stats
accumulated in-step and the refine/reset passes invoked on their intervals
(host-orchestrated, but each pass itself is jitted).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..core.sh import eval_sh
from ..raster.rasterize import rasterize
from ..core.gaussians import (
    Activated,
    GaussianParams,
    activate,
    sh_degree_mask,
)
from . import losses
from .densify import (
    DensifyConfig,
    DensifyState,
    accumulate_stats,
    refine,
    reset_opacity,
)
from .optim import AdamState, adam_init, adam_update, expon_lr


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # loss weights (reference: omnire.yaml losses block / S3 defaults)
    w_rgb: float = 0.8
    w_ssim: float = 0.2
    w_depth: float = 0.0
    w_sky: float = 0.0
    w_entropy: float = 0.0
    depth_kind: str = "l1"
    depth_inverse: bool = False
    # optimization (3DGS defaults shared by both references)
    max_steps: int = 30_000
    lr_means: float = 1.6e-4         # * scene_scale, expon to /100
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    lr_sh_dc: float = 2.5e-3
    lr_sh_rest: float = 2.5e-3 / 20
    lr_opacities: float = 5e-2
    # sh ramp: +1 degree every interval (S3 oneupSHdegree / vanilla ramp)
    sh_degree_interval: int = 1000
    # densification (vanilla.py ctrl defaults)
    refine_start: int = 500
    refine_interval: int = 100
    refine_stop: int = 15_000
    reset_opacity_interval: int = 3000
    densify: DensifyConfig = DensifyConfig()
    # rasterizer
    budget: int = 1 << 20
    antialiased: bool = False
    interpret: bool | None = None


class TrainState(NamedTuple):
    params: GaussianParams
    alive: jax.Array
    opt: AdamState
    dstate: DensifyState
    step: jax.Array


class Batch(NamedTuple):
    """One training view: full-image ray bundle (the reference's
    image_infos/cam_infos dicts, pixel_source.py:631-656, collapsed)."""
    camera: Camera
    rgb: jax.Array                    # (H, W, 3)
    depth: jax.Array | None = None    # (H, W) lidar depth (0 = no hit)
    sky_mask: jax.Array | None = None  # (H, W) 1 = sky


def create_train_state(params: GaussianParams, alive: jax.Array) -> TrainState:
    return TrainState(
        params=params,
        alive=alive,
        opt=adam_init(params),
        dstate=DensifyState.create(params.capacity),
        step=jnp.zeros((), jnp.int32),
    )


def lr_tree(cfg: TrainConfig, step: jax.Array,
            scene_scale: float) -> GaussianParams:
    """Per-group learning rates at `step` as a GaussianParams-shaped tree."""
    return GaussianParams(
        means=expon_lr(step, cfg.lr_means * scene_scale,
                       cfg.lr_means * scene_scale * 0.01, cfg.max_steps),
        log_scales=jnp.asarray(cfg.lr_scales),
        quats=jnp.asarray(cfg.lr_quats),
        sh_dc=jnp.asarray(cfg.lr_sh_dc),
        sh_rest=jnp.asarray(cfg.lr_sh_rest),
        logit_opacities=jnp.asarray(cfg.lr_opacities),
    )


def render_params(params: GaussianParams, alive: jax.Array, cam: Camera,
                  sh_mask: jax.Array, cfg: TrainConfig,
                  means2d_offset: jax.Array | None = None):
    act = activate(params, alive, sh_mask)
    dirs = act.means - cam.position
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                              1e-8)
    max_degree = int(round(act.shs.shape[1] ** 0.5)) - 1
    colors = eval_sh(act.shs, dirs, degree=max_degree)
    return rasterize(act.means, act.quats, act.scales, act.opacities,
                     colors, cam, budget=cfg.budget,
                     antialiased=cfg.antialiased,
                     means2d_offset=means2d_offset,
                     interpret=cfg.interpret)


@functools.partial(jax.jit, static_argnames=("cfg", "scene_scale"))
def train_step(state: TrainState, batch: Batch, cfg: TrainConfig,
               scene_scale: float) -> tuple[TrainState, dict[str, Any]]:
    cam = batch.camera
    sh_deg = jnp.minimum(state.step // cfg.sh_degree_interval, 3)
    sh_mask = sh_degree_mask(sh_deg, state.params.sh_bases)

    def loss_fn(params, m2d_off):
        out = render_params(params, state.alive, cam, sh_mask, cfg,
                            means2d_offset=m2d_off)
        ld = {}
        ld["rgb"] = cfg.w_rgb * losses.l1(out.rgb, batch.rgb)
        ld["ssim"] = cfg.w_ssim * losses.ssim_loss(out.rgb, batch.rgb)
        if cfg.w_depth > 0.0 and batch.depth is not None:
            ld["depth"] = cfg.w_depth * losses.depth_loss(
                out.depth, batch.depth, batch.depth > 0,
                kind=cfg.depth_kind, inverse=cfg.depth_inverse)
        if cfg.w_sky > 0.0 and batch.sky_mask is not None:
            ld["sky"] = cfg.w_sky * losses.sky_opacity_loss(
                out.alpha, batch.sky_mask)
        if cfg.w_entropy > 0.0:
            ld["entropy"] = cfg.w_entropy * losses.opacity_entropy(out.alpha)
        total = sum(ld.values())
        aux = dict(loss_dict=ld, psnr=losses.psnr(out.rgb, batch.rgb),
                   radii=out.proj.radii,
                   num_instances=out.binning.num_instances,
                   overflow=out.binning.overflow)
        return total, aux

    m2d_zero = jnp.zeros((state.params.capacity, 2), jnp.float32)
    (total, aux), (gparams, gm2d) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(state.params, m2d_zero)

    lrs = lr_tree(cfg, state.step, scene_scale)
    new_params, new_opt = adam_update(gparams, state.opt, state.params, lrs)
    dstate = accumulate_stats(state.dstate, gm2d, aux["radii"],
                              cam.width, cam.height)
    new_state = TrainState(params=new_params, alive=state.alive, opt=new_opt,
                           dstate=dstate, step=state.step + 1)
    metrics = dict(loss=total, psnr=aux["psnr"],
                   num_instances=aux["num_instances"],
                   overflow=aux["overflow"], **aux["loss_dict"])
    return new_state, metrics


@functools.partial(jax.jit, static_argnames=("cfg", "scene_scale",
                                             "use_screen_cull"))
def refine_step(key: jax.Array, state: TrainState, cfg: TrainConfig,
                scene_scale: float, use_screen_cull: bool = False
                ) -> tuple[TrainState, dict[str, Any]]:
    out = refine(key, state.params, state.alive, state.opt, state.dstate,
                 cfg.densify, scene_scale, use_screen_cull)
    new_state = TrainState(params=out.params, alive=out.alive, opt=out.opt,
                           dstate=out.dstate, step=state.step)
    stats = dict(n_split=out.n_split, n_dup=out.n_dup, n_culled=out.n_culled,
                 n_dropped=out.n_dropped,
                 n_alive=jnp.sum(out.alive.astype(jnp.int32)))
    return new_state, stats


@functools.partial(jax.jit, static_argnames=("value",))
def reset_opacity_step(state: TrainState, value: float = 0.01) -> TrainState:
    params, opt = reset_opacity(state.params, state.opt, value)
    return state._replace(params=params, opt=opt)


def should_refine(step: int, cfg: TrainConfig) -> bool:
    return (cfg.refine_start <= step < cfg.refine_stop
            and step % cfg.refine_interval == 0)


def should_reset_opacity(step: int, cfg: TrainConfig) -> bool:
    return (0 < step < cfg.refine_stop
            and step % cfg.reset_opacity_interval == 0)
