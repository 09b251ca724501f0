"""Scene graph: Background + RigidNodes + DeformableNodes (+SMPLNodes) +
Sky + per-image corrections, composed into one rasterizer call.

The TPU re-design of OmniRe's MultiTrainer (models/trainers/scene_graph.py:
12-296 + BasicTrainer.collect_gaussians base.py:342-383): instead of a
python dict of model objects concatenated per step, the scene is a single
pytree of per-class parameter blocks with *static* capacity segments —
the world-space soup is one fused concat, and per-class decomposition
renders (scene_graph.py:260-275) fall out of a per-class opacity weight
vector.

Class segment layout (static): [0, Cb) background | [Cb, Cb+Cr) rigid |
[Cb+Cr, Cb+Cr+Cd) deformable | [..+Cs) smpl.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..core.quat import quat_normalize
from ..core.sh import eval_sh
from ..motion.deformable import (
    DeformableConfig,
    DeformableParams,
    deformable_world_gaussians,
)
from ..motion.pvg import PvgConfig
from ..motion.smpl import SmplConfig
from ..motion.rigid import RigidAux, RigidConfig, RigidParams, \
    rigid_world_gaussians
from ..raster.rasterize import RasterOut, rasterize
from .correction import (
    AffineCorrection,
    CameraPoseCorrection,
    affine_matrix,
    apply_affine,
    correct_camtoworld,
)
from ..core.gaussians import GaussianParams, activate, sh_degree_mask
from .sky import SkyCubemap, SkyMLP, composite_sky, sky_pixels

CLASS_NAMES = ("Background", "RigidNodes", "DeformableNodes", "SMPLNodes")


class PvgTemporal(NamedTuple):
    """Per-gaussian PVG temporal params for a scene-graph PVG background
    (OmniRe supports Background type=PVG via config,
    models/trainers/scene_graph.py:25-71 + gaussians/pvg.py). Rides next
    to params.background so the densify controller carries it as refine
    extras, like the SingleTrainer's PvgMotion."""
    taus: jax.Array        # (Cb,)
    log_betas: jax.Array   # (Cb,)
    velocity: jax.Array    # (Cb, 3)


class SceneParams(NamedTuple):
    """All learnable state of a composed street scene."""
    background: GaussianParams
    rigid: RigidParams | None
    deformable: DeformableParams | None
    smpl: Any | None                      # SMPLParams (motion.smpl)
    sky: SkyCubemap | SkyMLP | None
    affine: AffineCorrection | None
    cam_pose: CameraPoseCorrection | None
    # non-None selects the PVG background variant (config `type:` in the
    # reference); temporal means/opacities at render time
    bg_pvg: PvgTemporal | None = None


class SceneAux(NamedTuple):
    """Non-learnable scene state (masks, instance metadata)."""
    bg_alive: jax.Array
    rigid_aux: RigidAux | None
    rigid_alive: jax.Array | None
    deform_aux: RigidAux | None
    deform_alive: jax.Array | None
    smpl_aux: Any | None
    smpl_alive: jax.Array | None


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    rigid: RigidConfig = RigidConfig()
    deformable: DeformableConfig = DeformableConfig()
    smpl: SmplConfig = SmplConfig()
    budget: int = 1 << 20
    antialiased: bool = False
    interpret: bool | None = None
    sh_degree_interval: int = 1000
    # PVG background variant (used when params.bg_pvg is set):
    # frame -> normalized time needs the clip length at trace time
    pvg: PvgConfig | None = None
    pvg_num_frames: int = 1
    # coarse-grid sky sampling factor (scene.sky.sky_pixels): None =
    # auto from image/cubemap resolution, 1 = exact per-pixel
    sky_factor: int | None = None


class SceneRender(NamedTuple):
    rgb: jax.Array          # final composited + affine-corrected
    gs_rgb: jax.Array       # splat-only rgb
    depth: jax.Array
    alpha: jax.Array
    sky_rgb: jax.Array | None
    raster: RasterOut
    class_slices: dict[str, tuple[int, int]]


def class_slices(params: SceneParams) -> dict[str, tuple[int, int]]:
    out = {}
    off = 0
    caps = [
        ("Background", params.background.capacity),
        ("RigidNodes",
         params.rigid.gauss.capacity if params.rigid is not None else 0),
        ("DeformableNodes",
         params.deformable.rigid.gauss.capacity
         if params.deformable is not None else 0),
        ("SMPLNodes",
         params.smpl.rigid.gauss.capacity if params.smpl is not None else 0),
    ]
    for name, c in caps:
        out[name] = (off, off + c)
        off += c
    return out


def collect_gaussians(
    params: SceneParams,
    aux: SceneAux,
    cfg: SceneConfig,
    frame: jax.Array,
    step: jax.Array,
    cam_position: jax.Array,
    in_test_set: bool = False,
    class_weights: dict[str, float] | None = None,
):
    """World-space activated soup across classes (base.py:342-383).

    `class_weights` scales each class's opacity (1.0 default) — the
    decomposition-render mechanism."""
    means_l, quats_l, scales_l, opac_l, colors_l = [], [], [], [], []

    def push(means, quats, log_scales, sh_dc, sh_rest, logit_op, visible,
             name, d_scales=None, opac_factor=None):
        shs = jnp.concatenate([sh_dc[:, None, :], sh_rest], axis=1)
        sh_deg_mask = sh_degree_mask(
            jnp.minimum(step // cfg.sh_degree_interval, 3), shs.shape[1])
        shs = shs * sh_deg_mask[None, :, None]
        dirs = means - cam_position
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        deg = int(round(shs.shape[1] ** 0.5)) - 1
        colors = eval_sh(shs, dirs, deg)
        opac = jax.nn.sigmoid(logit_op)
        w = 1.0 if class_weights is None else class_weights.get(name, 1.0)
        if opac_factor is not None:
            opac = opac * opac_factor
        opac = jnp.where(visible, opac * w, 0.0)
        ls = log_scales if d_scales is None else log_scales + d_scales
        means_l.append(means)
        quats_l.append(quat_normalize(quats))
        scales_l.append(jnp.exp(ls))
        opac_l.append(opac)
        colors_l.append(colors)

    bg = params.background
    if params.bg_pvg is not None:
        # PVG background: periodic-vibration means + life-span opacity
        # at the frame's normalized time (gaussians/pvg.py:66-78)
        from ..motion.pvg import PvgConfig, PvgParams, pvg_at_time
        pcfg = cfg.pvg if cfg.pvg is not None else PvgConfig()
        t_norm = frame.astype(jnp.float32) / max(cfg.pvg_num_frames - 1, 1)
        pv = PvgParams(gauss=bg, taus=params.bg_pvg.taus,
                       log_betas=params.bg_pvg.log_betas,
                       velocity=params.bg_pvg.velocity)
        bg_means_t, ofac = pvg_at_time(pv, t_norm, pcfg)
        push(bg_means_t, bg.quats, bg.log_scales, bg.sh_dc, bg.sh_rest,
             bg.logit_opacities, aux.bg_alive, "Background",
             opac_factor=ofac)
    else:
        push(bg.means, bg.quats, bg.log_scales, bg.sh_dc, bg.sh_rest,
             bg.logit_opacities, aux.bg_alive, "Background")

    if params.rigid is not None:
        rp = params.rigid
        wm, wq, vis = rigid_world_gaussians(
            rp, aux.rigid_aux, aux.rigid_alive, frame, step, cfg.rigid,
            in_test_set)
        push(wm, wq, rp.gauss.log_scales, rp.gauss.sh_dc, rp.gauss.sh_rest,
             rp.gauss.logit_opacities, vis, "RigidNodes")

    if params.deformable is not None:
        dp = params.deformable
        wm, wq, dsc, vis = deformable_world_gaussians(
            dp, aux.deform_aux, aux.deform_alive, frame, step,
            cfg.deformable, in_test_set)
        g = dp.rigid.gauss
        push(wm, wq, g.log_scales, g.sh_dc, g.sh_rest, g.logit_opacities,
             vis, "DeformableNodes", d_scales=dsc)

    if params.smpl is not None:
        from ..motion.smpl import smpl_world_gaussians
        sp = params.smpl
        wm, wq, vis = smpl_world_gaussians(sp, aux.smpl_aux, aux.smpl_alive,
                                           frame, step, cfg.smpl,
                                           in_test_set)
        g = sp.rigid.gauss
        push(wm, wq, g.log_scales, g.sh_dc, g.sh_rest, g.logit_opacities,
             vis, "SMPLNodes")

    return (jnp.concatenate(means_l), jnp.concatenate(quats_l),
            jnp.concatenate(scales_l), jnp.concatenate(opac_l),
            jnp.concatenate(colors_l))


def render_scene(
    params: SceneParams,
    aux: SceneAux,
    cfg: SceneConfig,
    cam: Camera,
    frame: jax.Array,
    img_idx: jax.Array,
    step: jax.Array,
    in_test_set: bool = False,
    class_weights: dict[str, float] | None = None,
    means2d_offset: jax.Array | None = None,
    bg_gather=None,
) -> SceneRender:
    """Full forward: camera correction -> collect -> rasterize -> sky
    composite -> color affine (the BasicTrainer forward, base.py:317-497).

    `bg_gather`: SPMD hook (see rasterize) — inside a shard_map whose
    background block is a local "gauss"-axis shard (params.background and
    aux.bg_alive both local), pass the all_gather so the projected
    background rejoins the global soup. Every op downstream of projection
    is then the identical single-device code path."""
    if params.cam_pose is not None:
        c2w = correct_camtoworld(params.cam_pose, cam.camtoworld, img_idx)
        cam = Camera(K=cam.K, viewmat=jnp.linalg.inv(c2w),
                     width=cam.width, height=cam.height)

    means, quats, scales, opac, colors = collect_gaussians(
        params, aux, cfg, frame, step, cam.position, in_test_set,
        class_weights)

    out = rasterize(means, quats, scales, opac, colors, cam,
                    budget=cfg.budget, antialiased=cfg.antialiased,
                    means2d_offset=means2d_offset, interpret=cfg.interpret,
                    bg_gather=bg_gather,
                    bg_count=params.background.capacity)

    sky_rgb = None
    rgb = out.rgb
    if params.sky is not None:
        # MLP sky uses per-image appearance (SkyModel, modules.py:
        # 114-168; mean embedding on test frames); both sky types are
        # evaluated on a coarse grid + bilinear upsample (sky_pixels)
        sky_rgb = sky_pixels(params.sky, cam, img_idx,
                             use_mean_embedding=in_test_set,
                             factor=cfg.sky_factor)
        rgb = composite_sky(rgb, out.alpha, sky_rgb)

    if params.affine is not None:
        mat = affine_matrix(params.affine, img_idx,
                            use_mean_embedding=in_test_set)
        rgb = apply_affine(rgb, mat)

    return SceneRender(rgb=rgb, gs_rgb=out.rgb, depth=out.depth,
                       alpha=out.alpha, sky_rgb=sky_rgb, raster=out,
                       class_slices=class_slices(params))
