"""Single-class trainer: the VanillaGaussians/SingleTrainer-equivalent slice
(reference: OmniRe models/trainers/single.py + base.py hot loop,
tools/train.py:188-292). One fused jitted train step: activate -> SH ->
rasterize -> losses -> backward -> Adam, with densification stats
accumulated in-step and the refine/reset passes invoked on their intervals
(host-orchestrated, but each pass itself is jitted).

The background model is config-selectable like the reference's
SingleTrainer (single.py:23-211): "vanilla" (static 3DGS), "pvg"
(Periodic Vibration Gaussians with temporal means/opacities and the
tau-gradient densify trigger, pvg.py:24-310), or "deformgs" (global
deformation field, deformgs.py:62-166). The per-gaussian motion extras
(taus/betas/velocity) ride through densification as refine() extras;
the DeformGS net is global and untouched by the controller.
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
    # background model variant (reference single.py:23-211)
    background: str = "vanilla"       # vanilla | pvg | deformgs
    # PVG (pvg.py ctrl defaults): cycle length, t-grad densify trigger
    pvg_cycle: float = 0.2
    pvg_betas_init: float = 0.1
    densify_t_grad_thresh: float = 0.002
    densify_t_size_thresh: float = 0.01
    lr_taus: float = 8e-4
    lr_betas: float = 2e-2
    lr_velocity: float = 1e-3
    lr_deform_net: float = 1.6e-3
    # loss weights (reference: omnire.yaml losses block / S3 defaults)
    w_rgb: float = 0.8
    w_ssim: float = 0.2
    w_depth: float = 0.0
    w_sky: float = 0.0
    w_entropy: float = 0.0
    w_velocity_reg: float = 0.0       # PVG velocity smoothness
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
    # optional background-motion parameters (PvgMotion / DeformGsMotion)
    # with their own Adam moments; None for the vanilla background
    motion: Any = None
    mopt: AdamState | None = None


class PvgMotion(NamedTuple):
    """PVG per-gaussian temporal params (pvg.py:24-88); capacity-padded so
    they ride through refine() as extras."""
    taus: jax.Array        # (C,)
    log_betas: jax.Array   # (C,)
    velocity: jax.Array    # (C, 3)


class DeformGsMotion(NamedTuple):
    """Global DeformNetwork + contraction AABB (deformgs.py:62-166)."""
    net: Any
    aabb_min: jax.Array
    aabb_max: jax.Array


class Batch(NamedTuple):
    """One training view: full-image ray bundle (the reference's
    image_infos/cam_infos dicts, pixel_source.py:631-656, collapsed)."""
    camera: Camera
    rgb: jax.Array                    # (H, W, 3)
    depth: jax.Array | None = None    # (H, W) lidar depth (0 = no hit)
    sky_mask: jax.Array | None = None  # (H, W) 1 = sky
    t: jax.Array | None = None        # () normalized time (PVG/DeformGS)


def create_train_state(params: GaussianParams, alive: jax.Array,
                       motion: Any = None) -> TrainState:
    from .optim import strong_types
    params = strong_types(params)
    motion = strong_types(motion)
    return TrainState(
        params=params,
        alive=alive,
        opt=adam_init(params),
        dstate=DensifyState.create(params.capacity),
        step=jnp.zeros((), jnp.int32),
        motion=motion,
        mopt=None if motion is None else adam_init(motion),
    )


def create_motion(key: jax.Array, cfg: TrainConfig, params: GaussianParams,
                  init_times: jax.Array | None = None,
                  aabb: tuple | None = None) -> Any:
    """Background-motion params for cfg.background (None for vanilla)."""
    if cfg.background == "vanilla":
        return None
    if cfg.background == "pvg":
        c = params.capacity
        taus = (jnp.zeros((c,), jnp.float32) if init_times is None
                else jnp.asarray(init_times, jnp.float32))
        return PvgMotion(
            taus=taus,
            log_betas=jnp.full((c,), float(jnp.log(jnp.sqrt(
                cfg.pvg_betas_init)))),
            velocity=jnp.zeros((c, 3), jnp.float32),
        )
    if cfg.background == "deformgs":
        from ..motion.mlp import deform_network_init
        lo, hi = aabb if aabb is not None else ((-1.0,) * 3, (1.0,) * 3)
        return DeformGsMotion(
            net=deform_network_init(key, depth=8, width=256),
            aabb_min=jnp.asarray(lo, jnp.float32),
            aabb_max=jnp.asarray(hi, jnp.float32),
        )
    raise ValueError(f"unknown background type: {cfg.background}")


def motion_lr_tree(cfg: TrainConfig, motion: Any):
    """Per-leaf LRs for the motion params."""
    if isinstance(motion, PvgMotion):
        return PvgMotion(taus=jnp.asarray(cfg.lr_taus),
                         log_betas=jnp.asarray(cfg.lr_betas),
                         velocity=jnp.asarray(cfg.lr_velocity))
    if isinstance(motion, DeformGsMotion):
        return DeformGsMotion(
            net=jax.tree.map(lambda _: jnp.asarray(cfg.lr_deform_net),
                             motion.net),
            aabb_min=jnp.zeros(()), aabb_max=jnp.zeros(()))
    return None


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
                  means2d_offset: jax.Array | None = None,
                  motion: Any = None, t: jax.Array | None = None):
    act = activate(params, alive, sh_mask)
    means, quats, scales, opac = (act.means, act.quats, act.scales,
                                  act.opacities)
    if motion is not None and t is not None:
        if isinstance(motion, PvgMotion):
            from ..motion.pvg import PvgConfig, PvgParams, pvg_at_time
            pp = PvgParams(gauss=params._replace(means=means),
                           taus=motion.taus, log_betas=motion.log_betas,
                           velocity=motion.velocity)
            means, ofac = pvg_at_time(
                pp, t, PvgConfig(cycle_length=cfg.pvg_cycle,
                                 betas_init=cfg.pvg_betas_init))
            opac = opac * ofac
        elif isinstance(motion, DeformGsMotion):
            from ..motion.deformgs import DeformGsParams, deformgs_at_time
            dp = DeformGsParams(gauss=params, net=motion.net,
                                aabb_min=motion.aabb_min,
                                aabb_max=motion.aabb_max)
            means, quats, dls = deformgs_at_time(dp, t)
            scales = scales * jnp.exp(dls)
    dirs = means - cam.position
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True),
                              1e-8)
    max_degree = int(round(act.shs.shape[1] ** 0.5)) - 1
    colors = eval_sh(act.shs, dirs, degree=max_degree)
    return rasterize(means, quats, scales, opac,
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

    def loss_fn(params, motion, m2d_off):
        out = render_params(params, state.alive, cam, sh_mask, cfg,
                            means2d_offset=m2d_off, motion=motion,
                            t=batch.t)
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
        if cfg.w_velocity_reg > 0.0 and isinstance(motion, PvgMotion):
            from ..motion.pvg import PvgParams, velocity_reg
            ld["velocity"] = cfg.w_velocity_reg * velocity_reg(
                PvgParams(gauss=params, taus=motion.taus,
                          log_betas=motion.log_betas,
                          velocity=motion.velocity), state.alive)
        total = sum(ld.values())
        aux = dict(loss_dict=ld, psnr=losses.psnr(out.rgb, batch.rgb),
                   radii=out.proj.radii,
                   num_instances=out.binning.num_instances,
                   overflow=out.binning.overflow)
        return total, aux

    m2d_zero = jnp.zeros((state.params.capacity, 2), jnp.float32)
    (total, aux), (gparams, gmotion, gm2d) = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2), has_aux=True)(
        state.params, state.motion, m2d_zero)

    lrs = lr_tree(cfg, state.step, scene_scale)
    new_params, new_opt = adam_update(gparams, state.opt, state.params, lrs)
    new_motion, new_mopt = state.motion, state.mopt
    if state.motion is not None:
        new_motion, new_mopt = adam_update(
            gmotion, state.mopt, state.motion,
            motion_lr_tree(cfg, state.motion))
    t_grad = (gmotion.taus if isinstance(state.motion, PvgMotion) else None)
    dstate = accumulate_stats(state.dstate, gm2d, aux["radii"],
                              cam.width, cam.height, t_grad=t_grad)
    new_state = TrainState(params=new_params, alive=state.alive, opt=new_opt,
                           dstate=dstate, step=state.step + 1,
                           motion=new_motion, mopt=new_mopt)
    metrics = dict(loss=total, psnr=aux["psnr"],
                   num_instances=aux["num_instances"],
                   overflow=aux["overflow"], **aux["loss_dict"])
    return new_state, metrics


@functools.partial(jax.jit, static_argnames=("cfg", "scene_scale",
                                             "use_screen_cull"))
def refine_step(key: jax.Array, state: TrainState, cfg: TrainConfig,
                scene_scale: float, use_screen_cull: bool = False
                ) -> tuple[TrainState, dict[str, Any]]:
    extra_candidate = extra_split = None
    carrier = state.params
    carrier_opt = state.opt
    if isinstance(state.motion, PvgMotion):
        # PVG tau-grad trigger + temporal-size split (pvg.py:166-199);
        # the temporal params ride as refine extras so children inherit,
        # and their Adam moments ride along too so the optimizer surgery
        # is ROW surgery on touched slots only — the reference never
        # resets untouched rows (gaussian_model.py:479-556 cat/prune
        # semantics)
        carrier = (state.params, state.motion.taus, state.motion.log_betas,
                   state.motion.velocity)
        carrier_opt = AdamState(
            mu=(state.opt.mu, state.mopt.mu.taus,
                state.mopt.mu.log_betas, state.mopt.mu.velocity),
            nu=(state.opt.nu, state.mopt.nu.taus,
                state.mopt.nu.log_betas, state.mopt.nu.velocity),
            step=state.opt.step)
        t_avg = state.dstate.t_grad / jnp.maximum(
            state.dstate.count.astype(jnp.float32), 1.0)
        high_t = t_avg > cfg.densify_t_grad_thresh
        extra_candidate = high_t
        extra_split = high_t & (jnp.exp(state.motion.log_betas)
                                > cfg.densify_t_size_thresh)
    out = refine(key, carrier, state.alive, carrier_opt, state.dstate,
                 cfg.densify, scene_scale, use_screen_cull,
                 extra_candidate=extra_candidate, extra_split=extra_split)
    new_motion, new_mopt = state.motion, state.mopt
    new_opt = out.opt
    if isinstance(state.motion, PvgMotion):
        gauss, taus, log_betas, velocity = out.params
        new_motion = PvgMotion(taus=taus, log_betas=log_betas,
                               velocity=velocity)
        new_opt = AdamState(mu=out.opt.mu[0], nu=out.opt.nu[0],
                            step=out.opt.step)
        new_mopt = AdamState(
            mu=PvgMotion(taus=out.opt.mu[1], log_betas=out.opt.mu[2],
                         velocity=out.opt.mu[3]),
            nu=PvgMotion(taus=out.opt.nu[1], log_betas=out.opt.nu[2],
                         velocity=out.opt.nu[3]),
            step=state.mopt.step)
        new_params = gauss
    else:
        new_params = out.params
    new_state = TrainState(params=new_params, alive=out.alive, opt=new_opt,
                           dstate=out.dstate, step=state.step,
                           motion=new_motion, mopt=new_mopt)
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
