"""S3Gaussian-flavor trainer: one global GaussianModel + hexplane
deformation field + sky cubemap, trained in two stages.

Re-creation of S3Gaussian/train.py scene_reconstruction:170-441 and
gaussian_renderer/__init__.py:27-303 on the TPU stack:
- stage "coarse" (first 5k iters): static render of the raw gaussians;
- stage "fine": the S3 field (emd_tpu.motion.s3field) deforms the RAW
  (pre-activation) parameters — dx on xyz, ds in log-scale space, dr
  multiplied on quats, do in logit space, dshs on SH coefficients —
  exactly the reference's "activations after deformation"
  (__init__.py:99-101);
- losses: L1 + SSIM + depth-L2 + sky BCE on alpha + delta-magnitude regs
  on the deformation outputs + hexplane TV/time regs + opacity entropy +
  embedding-KNN (train.py:226-363);
- per-gaussian `_embedding` lives next to the gaussian SoA
  (gaussian_model.py:64,169,178).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..core.gaussians import GaussianParams
from ..core.quat import quat_normalize
from ..core.sh import eval_sh
from ..motion.embedding_reg import embedding_knn_loss
from ..motion.hexplane import plane_tv_loss, time_l1_loss, \
    time_smoothness_loss
from ..motion.s3field import S3FieldConfig, S3FieldParams, apply_s3_field
from ..raster.rasterize import rasterize
from ..scene.sky import SkyCubemap, composite_sky, sky_pixels
from . import losses
from .densify import DensifyState, accumulate_stats
from .optim import AdamState, adam_init, adam_update, expon_lr


class S3Params(NamedTuple):
    gauss: GaussianParams
    embeddings: jax.Array        # (C, E_g)
    field: S3FieldParams
    sky: SkyCubemap | None


@dataclasses.dataclass(frozen=True)
class S3TrainConfig:
    field: S3FieldConfig = S3FieldConfig()
    coarse_iters: int = 5000
    max_steps: int = 55_000
    budget: int = 1 << 20
    antialiased: bool = False
    interpret: bool | None = None
    sh_degree_interval: int = 1000
    # coarse-grid sky sampling (scene.sky.sky_pixels): None = auto
    sky_factor: int | None = None
    # rematerialize the deformation field in the backward
    # (jax.checkpoint): the fine-stage backward otherwise holds the
    # field-MLP activations for EVERY gaussian — at 500k gaussians that
    # alone exceeds one v5e's 15.75G HBM; recomputing the field forward
    # costs ~one extra MLP pass and restores the reference's 1.5-2M
    # gaussian scale (gaussian_options.py:45-46) on a single chip
    remat_field: bool = True
    # loss weights (S3 train.py defaults)
    w_rgb: float = 0.8
    w_ssim: float = 0.2
    w_depth: float = 0.1
    w_sky: float = 0.05
    w_entropy: float = 0.05
    w_dx: float = 0.001
    w_ds: float = 0.001
    w_dr: float = 0.001
    w_do: float = 0.001
    w_dshs: float = 0.001
    w_feat: float = 0.1
    w_plane_tv: float = 1e-4
    w_time_smooth: float = 1e-3
    w_time_l1: float = 1e-4
    w_emb_knn: float = 1.0
    # opacity-ratio blending of the static and deformed copies in the
    # fine stage (gaussian_renderer/__init__.py:114-138
    # args.combine_dynamic_static)
    combine_dynamic_static: bool = False
    # LRs (gaussian_model.training_setup:181-219)
    lr_means: float = 1.6e-4          # * spatial scale, expon
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    lr_sh_dc: float = 2.5e-3
    lr_sh_rest: float = 1.25e-4
    lr_opacities: float = 5e-2
    lr_embeddings: float = 2.5e-3
    lr_field_mlp: float = 1.6e-3      # deformation MLP, expon -> 10%
    lr_field_grid: float = 1.6e-2     # hexplane grids, expon -> 10%
    lr_sky: float = 5e-3


def combine_static_dynamic(logit_op_dyn, logit_op_static, shs_dyn,
                           shs_static):
    """Opacity-ratio blend of the deformed and raw copies
    (S3Gaussian/gaussian_renderer/__init__.py:114-138): activated
    opacities ADD, SH coefficients mix by each copy's share of the sum.
    Returns (opacity (N,), shs (N, K, 3)) — opacity is post-activation
    (the sum of two sigmoids is not a sigmoid)."""
    o_dyn = jax.nn.sigmoid(logit_op_dyn)
    o_static = jax.nn.sigmoid(logit_op_static)
    total = o_dyn + o_static
    dyn_ratio = (o_dyn / jnp.maximum(total, 1e-12))[:, None, None]
    shs = shs_dyn * dyn_ratio + shs_static * (1.0 - dyn_ratio)
    return total, shs


class S3Batch(NamedTuple):
    camera: Camera
    rgb: jax.Array
    t: jax.Array                      # normalized time in [0, 1]
    cam_no: jax.Array                 # camera index (time-offset table)
    depth: jax.Array | None = None
    sky_mask: jax.Array | None = None
    feat: jax.Array | None = None     # (H, W, 3) DINO-PCA target
                                      # (S3 train.py:313-324 feat loss)


class S3TrainState(NamedTuple):
    params: S3Params
    alive: jax.Array
    opt: AdamState
    dstate: DensifyState
    knn: Any
    step: jax.Array


def create_s3_train_state(params: S3Params, alive) -> S3TrainState:
    from .optim import strong_types
    params = strong_types(params)
    return S3TrainState(params=params, alive=alive, opt=adam_init(params),
                        dstate=DensifyState.create(params.gauss.capacity),
                        knn=None, step=jnp.zeros((), jnp.int32))


def s3_lr_tree(params: S3Params, cfg: S3TrainConfig, step,
               spatial_scale: float):
    gauss = GaussianParams(
        means=expon_lr(step, cfg.lr_means * spatial_scale,
                       cfg.lr_means * spatial_scale * 0.01, cfg.max_steps),
        log_scales=jnp.asarray(cfg.lr_scales),
        quats=jnp.asarray(cfg.lr_quats),
        sh_dc=jnp.asarray(cfg.lr_sh_dc),
        sh_rest=jnp.asarray(cfg.lr_sh_rest),
        logit_opacities=jnp.asarray(cfg.lr_opacities),
    )
    mlp_lr = expon_lr(step, cfg.lr_field_mlp * spatial_scale,
                      cfg.lr_field_mlp * spatial_scale * 0.1, cfg.max_steps)
    grid_lr = expon_lr(step, cfg.lr_field_grid * spatial_scale,
                       cfg.lr_field_grid * spatial_scale * 0.1,
                       cfg.max_steps)
    field = jax.tree.map(lambda _: mlp_lr, params.field)
    field = field._replace(
        hexplane=jax.tree.map(lambda _: grid_lr, params.field.hexplane),
        hash=jax.tree.map(lambda _: grid_lr, params.field.hash))
    return S3Params(
        gauss=gauss,
        embeddings=jnp.asarray(cfg.lr_embeddings),
        field=field,
        sky=(jax.tree.map(lambda _: jnp.asarray(cfg.lr_sky), params.sky)
             if params.sky is not None else None),
    )


def render_s3(params: S3Params, alive, cfg: S3TrainConfig, cam: Camera,
              t: jax.Array, cam_no: jax.Array, step: jax.Array,
              fine_stage: bool, means2d_offset=None,
              render_normals: bool = False, agg_key=None,
              gauss_gather=None):
    """One S3 render; returns (rgb, depth, alpha, raster_out, deform_out).

    `render_normals` routes per-gaussian surface normals through the
    feature channels, so `out.feat` is the composited normal map — the
    diff_gauss normal output channel
    (S3Gaussian/gaussian_renderer/__init__.py:145-155)."""
    g = params.gauss
    shs_raw = jnp.concatenate([g.sh_dc[:, None, :], g.sh_rest], axis=1)

    deform = None
    opac_override = None
    if fine_stage:
        def field_fn(fp, means, log_scales, quats, logit_op, shs, emb,
                     t_, cam_no_, step_):
            return apply_s3_field(fp, cfg.field, means, log_scales,
                                  quats, logit_op, shs, emb, t_,
                                  cam_no_, step_, agg_key=agg_key)

        if cfg.remat_field:
            field_fn = jax.checkpoint(field_fn)
        deform = field_fn(
            params.field, g.means, g.log_scales,
            quat_normalize(g.quats), g.logit_opacities, shs_raw,
            params.embeddings, t, cam_no, step)
        means = deform.means
        log_scales = g.log_scales + deform.scales_delta
        quats = deform.quats
        logit_op = g.logit_opacities + deform.opacity_delta[:, 0]
        shs = shs_raw + deform.shs_delta
        if cfg.combine_dynamic_static:
            # opacity-ratio blend with the raw static copy
            # (__init__.py:114-138); geometry stays the deformed one
            opac_override, shs = combine_static_dynamic(
                logit_op, g.logit_opacities, shs, shs_raw)
    else:
        means = g.means
        log_scales = g.log_scales
        quats = quat_normalize(g.quats)
        logit_op = g.logit_opacities
        shs = shs_raw

    from ..core.gaussians import sh_degree_mask
    mask = sh_degree_mask(jnp.minimum(step // cfg.sh_degree_interval, 3),
                          shs.shape[1])
    shs = shs * mask[None, :, None]
    dirs = means - cam.position
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, -1, keepdims=True), 1e-8)
    deg = int(round(shs.shape[1] ** 0.5)) - 1
    colors = eval_sh(shs, dirs, deg)
    opac = jnp.where(
        alive,
        jax.nn.sigmoid(logit_op) if opac_override is None
        else opac_override, 0.0)

    features = deform.feat if (deform is not None
                               and deform.feat is not None) else None
    if render_normals:
        from ..core.gaussians import gaussian_normals
        features = gaussian_normals(means, quats, jnp.exp(log_scales),
                                    cam.position)
    # gauss_gather: SPMD hook (rasterize's bg_gather with every gaussian
    # on the "gauss" axis) — field/SH/deform run on the LOCAL shard and
    # the projected soup is gathered before binning
    out = rasterize(means, quats, jnp.exp(log_scales), opac, colors, cam,
                    budget=cfg.budget, antialiased=cfg.antialiased,
                    means2d_offset=means2d_offset, features=features,
                    interpret=cfg.interpret, bg_gather=gauss_gather,
                    bg_count=means.shape[0])
    rgb = out.rgb
    sky_rgb = None
    if params.sky is not None:
        sky_rgb = sky_pixels(params.sky, cam, factor=cfg.sky_factor)
        rgb = composite_sky(rgb, out.alpha, sky_rgb)
    return rgb, out, deform


def s3_loss_terms(rgb, out, deform, batch: S3Batch, params: S3Params,
                  knn, cfg: S3TrainConfig, fine_stage: bool,
                  embeddings_global=None) -> dict:
    """The full S3 loss suite (S3Gaussian/train.py:226-363) as a dict of
    weighted terms. Shared verbatim by the single-device `s3_train_step`
    and the sharded step in `dist.train_sharded` — parity by construction.

    `embeddings_global`: the full (C, E) embedding table for the KNN reg;
    defaults to `params.embeddings` (single device). The sharded caller
    passes the all-gathered table because KNN neighbors cross shards."""
    ld = {}
    ld["rgb"] = cfg.w_rgb * losses.l1(rgb, batch.rgb)
    ld["ssim"] = cfg.w_ssim * losses.ssim_loss(rgb, batch.rgb)
    if cfg.w_depth > 0 and batch.depth is not None:
        # expected depth (accumulated/alpha), matching diff_gauss's
        # normalized depth output the reference supervises against
        ld["depth"] = cfg.w_depth * losses.depth_loss(
            out.depth / jnp.maximum(out.alpha, 1e-3),
            batch.depth, batch.depth > 0, kind="l2")
    if cfg.w_sky > 0 and batch.sky_mask is not None:
        ld["sky"] = cfg.w_sky * losses.sky_opacity_loss(
            out.alpha, batch.sky_mask)
    if cfg.w_entropy > 0:
        ld["entropy"] = cfg.w_entropy * losses.opacity_entropy(out.alpha)
    if (cfg.w_feat > 0 and batch.feat is not None and fine_stage
            and deform is not None and deform.feat is not None):
        ld["feat"] = cfg.w_feat * losses.l1(out.feat, batch.feat)
    if fine_stage and deform is not None:
        ld["dx"] = cfg.w_dx * jnp.mean(jnp.abs(deform.dx_total))
        ld["ds"] = cfg.w_ds * jnp.mean(jnp.abs(deform.scales_delta))
        ld["do"] = cfg.w_do * jnp.mean(jnp.abs(deform.opacity_delta))
        ld["dshs"] = cfg.w_dshs * jnp.mean(jnp.abs(deform.shs_delta))
        hp = params.field.hexplane
        if hp is not None:      # grid regs are hexplane-specific
            ld["plane_tv"] = cfg.w_plane_tv * plane_tv_loss(hp)
            ld["time_smooth"] = cfg.w_time_smooth * \
                time_smoothness_loss(hp)
            ld["time_l1"] = cfg.w_time_l1 * time_l1_loss(hp)
    if knn is not None:
        idx, w = knn
        emb = (embeddings_global if embeddings_global is not None
               else params.embeddings)
        ld["emb_knn"] = cfg.w_emb_knn * embedding_knn_loss(emb, idx, w)
    return ld


@functools.partial(jax.jit, static_argnames=("cfg", "spatial_scale",
                                             "fine_stage"))
def s3_train_step(state: S3TrainState, batch: S3Batch, cfg: S3TrainConfig,
                  spatial_scale: float, fine_stage: bool):
    def loss_fn(params: S3Params, m2d_off):
        # per-step PRNG key for the aggregation warp's training noise
        agg_key = (jax.random.fold_in(jax.random.PRNGKey(0), state.step)
                   if cfg.field.aggregate_feature else None)
        rgb, out, deform = render_s3(params, state.alive, cfg, batch.camera,
                                     batch.t, batch.cam_no, state.step,
                                     fine_stage, m2d_off, agg_key=agg_key)
        ld = s3_loss_terms(rgb, out, deform, batch, params, state.knn,
                           cfg, fine_stage)
        total = sum(ld.values())
        return total, dict(loss_dict=ld, psnr=losses.psnr(rgb, batch.rgb),
                           radii=out.proj.radii,
                           overflow=out.binning.overflow)

    m2d_zero = jnp.zeros((state.params.gauss.capacity, 2), jnp.float32)
    (total, aux), (gparams, gm2d) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(state.params, m2d_zero)
    lrs = s3_lr_tree(state.params, cfg, state.step, spatial_scale)
    new_params, new_opt = adam_update(gparams, state.opt, state.params, lrs)
    cam = batch.camera
    dstate = accumulate_stats(state.dstate, gm2d, aux["radii"],
                              cam.width, cam.height)
    new_state = state._replace(params=new_params, opt=new_opt,
                               dstate=dstate, step=state.step + 1)
    return new_state, dict(loss=total, psnr=aux["psnr"],
                           overflow=aux["overflow"], **aux["loss_dict"])


def render_s3_decomposed(params: S3Params, alive, cfg: S3TrainConfig,
                         cam: Camera, t, cam_no, step,
                         dx_threshold: float = 0.01, part: str = "dynamic"):
    """Static/dynamic decomposition for the S3 single-soup model
    (gaussian_renderer/__init__.py:114-138, :203-294): gaussians are
    routed by the magnitude of their current deformation dx."""
    deform = apply_s3_field(
        params.field, cfg.field, params.gauss.means,
        params.gauss.log_scales, quat_normalize(params.gauss.quats),
        params.gauss.logit_opacities,
        jnp.concatenate([params.gauss.sh_dc[:, None, :],
                         params.gauss.sh_rest], axis=1),
        params.embeddings, t, cam_no, step)
    moving = jnp.linalg.norm(deform.dx_total, axis=-1) > dx_threshold
    keep = moving if part == "dynamic" else ~moving
    return render_s3(params, alive & keep, cfg, cam, t, cam_no, step,
                     fine_stage=True)


def scene_flow_colors(dx: "jax.Array", clip: float = 0.5) -> "jax.Array":
    """Map per-gaussian deformation dx to RGB flow colors
    (S3 utils/video_utils.py scene-flow visualization): direction -> hue
    via the xy components, magnitude -> saturation."""
    mag = jnp.linalg.norm(dx, axis=-1, keepdims=True)
    d = dx / jnp.maximum(mag, 1e-8)
    rgb = 0.5 + 0.5 * d
    sat = jnp.clip(mag / clip, 0.0, 1.0)
    return 0.5 * (1 - sat) + rgb * sat
