"""Multi-class scene trainer — the MultiTrainer-equivalent train step.

Composes the scene graph (Background + RigidNodes + DeformableNodes + Sky +
Affine + CamPose) into one jitted step with the reference's loss suite
(omnire.yaml losses: rgb 0.8 / ssim 0.2 / sky-mask 0.05 / depth 0.1 inverse
l1 / opacity-entropy 0.05 / inverse-depth-smoothness 0.001 / dynamic-region
factor) and per-group learning rates (omnire.yaml gaussian_optim_general_cfg
+ per-class optim blocks, reproduced leaf-by-leaf in `scene_lr_tree`).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..core.camera import Camera
from ..motion.deformable import DeformableParams, out_of_bound_loss
from ..motion.embedding_reg import embedding_knn_loss, \
    scale_percentile_reg
from ..motion.rigid import RigidParams, temporal_smoothness_reg
from ..core.gaussians import GaussianParams
from ..scene.scene_graph import (
    SceneAux,
    SceneConfig,
    SceneParams,
    render_scene,
)
from . import losses
from .densify import DensifyState, accumulate_stats
from .optim import AdamState, adam_init, adam_update, expon_lr


@dataclasses.dataclass(frozen=True)
class SceneTrainConfig:
    scene: SceneConfig = SceneConfig()
    max_steps: int = 30_000
    # loss weights (omnire.yaml:19-38)
    w_rgb: float = 0.8
    w_ssim: float = 0.2
    w_sky: float = 0.05
    w_depth: float = 0.1
    depth_inverse: bool = True
    # optional exponential decay of the lidar depth weight
    # (base.py:559-563 lidar_w_decay; <= 0 disables, the defaults)
    depth_lidar_w_decay: float = -1.0
    w_entropy: float = 0.05
    w_smooth: float = 0.001
    dynamic_region_factor: float = 5.0
    dynamic_region_start: int = 20_000
    # reg weights (per-class compute_reg_loss defaults)
    w_rigid_temporal: float = 0.1
    w_embedding_knn: float = 1.0
    w_deform_oob: float = 1.0
    # SMPL regs (omnire.yaml smpl ctrl block :234-257)
    w_smpl_joint_smooth: float = 0.01   # joint_smooth w (commented default)
    w_smpl_knn: float = 0.001           # knn_reg lambda_std_{q,s,o,shs}
    w_smpl_x_offset: float = 0.2        # x_offset w
    w_smpl_voxel: float = 0.6           # voxel_deformer_reg lambda_std_w
    w_smpl_scale: float = 0.05          # max_s_square_reg w
    # sharp_shape_reg — every class in the paper config (omnire.yaml
    # :86-89,:114,:190,:225: w=1 every 10 steps, max ratio 10)
    w_sharp_shape: float = 1.0
    sharp_shape_interval: int = 10
    max_gauss_ratio: float = 10.0
    # scaling_reg (percentile, rigid.py:637-649) with start/stop step
    # gating; the paper config enables it for SMPL only (omnire.yaml
    # :229-233: w=1, percentile .99, 6000 < step < 30000) but any class
    # can opt in per config
    w_scaling_background: float = 0.0
    w_scaling_rigid: float = 0.0
    w_scaling_smpl: float = 1.0
    scaling_percentile: float = 0.99
    scaling_start_after: int = 6_000
    scaling_stop_after: int = 30_000
    # group LRs (omnire.yaml:42-56 + :124-152, :201-218)
    lr_means: float = 1.6e-4           # * scene_scale, expon -> 1%
    lr_scales: float = 5e-3
    lr_quats: float = 1e-3
    lr_sh_dc: float = 2.5e-3
    lr_sh_rest: float = 1.25e-4
    lr_opacities: float = 5e-2
    lr_ins_rotation: float = 1e-5      # expon -> 5e-6
    lr_ins_translation: float = 5e-4   # expon -> 1e-4
    lr_smpl_rotation: float = 5e-5     # body pose, expon -> 1e-5
    #                                    (omnire.yaml:275-277)
    lr_embeddings: float = 2.5e-3
    lr_temporal_grid: float = 1.6e-4   # * scene_scale, expon -> 1%
    lr_emd_heads: float = 1.6e-4       # * scene_scale, expon -> 1%
    lr_instance_latent: float = 1e-3   # expon -> 1e-4
    lr_deform_net: float = 1.6e-3      # expon -> 1.6e-4
    lr_sky: float = 5e-3
    lr_affine: float = 1e-4
    lr_cam_pose: float = 1e-5
    # PVG background variant (params.bg_pvg; gaussians/pvg.py optim)
    lr_pvg_taus: float = 8e-4
    lr_pvg_betas: float = 2e-2
    lr_pvg_velocity: float = 1e-3
    w_pvg_velocity: float = 0.01


class SceneBatch(NamedTuple):
    camera: Camera
    rgb: jax.Array
    frame_idx: jax.Array                   # scalar int
    img_idx: jax.Array                     # scalar int (appearance index)
    depth: jax.Array | None = None
    sky_mask: jax.Array | None = None
    dynamic_mask: jax.Array | None = None  # for dynamic-region upweight
    ego_mask: jax.Array | None = None      # static per-camera ego-body
                                           # mask; pixels EXCLUDED from
                                           # supervision (base.py:527-537)


class SceneTrainState(NamedTuple):
    params: SceneParams
    aux: SceneAux
    opt: AdamState
    dstate: Any                   # dict[class -> DensifyState]
    knn: Any                      # dict of cached (idx, w) per class or None
    step: jax.Array


def _gauss_lr(cfg: SceneTrainConfig, step, scene_scale) -> GaussianParams:
    return GaussianParams(
        means=expon_lr(step, cfg.lr_means * scene_scale,
                       cfg.lr_means * scene_scale * 0.01, cfg.max_steps),
        log_scales=jnp.asarray(cfg.lr_scales),
        quats=jnp.asarray(cfg.lr_quats),
        sh_dc=jnp.asarray(cfg.lr_sh_dc),
        sh_rest=jnp.asarray(cfg.lr_sh_rest),
        logit_opacities=jnp.asarray(cfg.lr_opacities),
    )


def scene_lr_tree(params: SceneParams, cfg: SceneTrainConfig, step,
                  scene_scale: float):
    """LR pytree matching SceneParams leaf-for-leaf."""
    def rigid_lr(rp: RigidParams) -> RigidParams:
        grid_lr = expon_lr(step, cfg.lr_temporal_grid * scene_scale,
                           cfg.lr_temporal_grid * scene_scale * 0.01,
                           cfg.max_steps)
        head_lr = expon_lr(step, cfg.lr_emd_heads * scene_scale,
                           cfg.lr_emd_heads * scene_scale * 0.01,
                           cfg.max_steps)
        return RigidParams(
            gauss=_gauss_lr(cfg, step, scene_scale),
            embeddings=jnp.asarray(cfg.lr_embeddings),
            instances_quats=expon_lr(step, cfg.lr_ins_rotation,
                                     5e-6, cfg.max_steps),
            instances_trans=expon_lr(step, cfg.lr_ins_translation,
                                     1e-4, cfg.max_steps),
            temporal_grid=grid_lr,
            heads=jax.tree.map(lambda _: head_lr, rp.heads),
        )

    rigid = rigid_lr(params.rigid) if params.rigid is not None else None
    deform = None
    if params.deformable is not None:
        deform = DeformableParams(
            rigid=rigid_lr(params.deformable.rigid),
            instances_embedding=expon_lr(step, cfg.lr_instance_latent,
                                         1e-4, cfg.max_steps),
            deform_net=jax.tree.map(
                lambda _: expon_lr(step, cfg.lr_deform_net, 1.6e-4,
                                   cfg.max_steps),
                params.deformable.deform_net),
        )
    smpl = None
    if params.smpl is not None:
        # body pose at the reference's smpl_rotation schedule
        # (omnire.yaml:275-277, 5e-5 -> 1e-5) — a flat lr_means here let
        # per-frame body poses drift from the annotation and the
        # canonical appearance co-adapt to the drift, which is exactly
        # the held-out human-PSNR bound the round-4 oracle-pose analysis
        # isolated (interp 24.81 ~= true-pose 24.70 << train 38.06);
        # EMD joint heads at the rigid heads' schedule (track_smpl_c/f,
        # omnire.yaml:286-289); voxel at w_dc_vox (1e-4 -> 1e-5).
        head_lr = expon_lr(step, cfg.lr_emd_heads * scene_scale,
                           cfg.lr_emd_heads * scene_scale * 0.01,
                           cfg.max_steps)
        smpl = params.smpl._replace(
            rigid=rigid_lr(params.smpl.rigid),
            smpl_quats=expon_lr(step, cfg.lr_smpl_rotation, 1e-5,
                                cfg.max_steps),
            smpl_heads=jax.tree.map(lambda _: head_lr,
                                    params.smpl.smpl_heads),
            voxel=(jax.tree.map(
                lambda _: expon_lr(step, 1e-4, 1e-5, cfg.max_steps),
                params.smpl.voxel)
                if params.smpl.voxel is not None else None))
    bg_pvg_lr = None
    if params.bg_pvg is not None:
        from ..scene.scene_graph import PvgTemporal
        bg_pvg_lr = PvgTemporal(
            taus=jnp.asarray(cfg.lr_pvg_taus),
            log_betas=jnp.asarray(cfg.lr_pvg_betas),
            velocity=jnp.asarray(cfg.lr_pvg_velocity))
    return SceneParams(
        background=_gauss_lr(cfg, step, scene_scale),
        rigid=rigid,
        deformable=deform,
        smpl=smpl,
        bg_pvg=bg_pvg_lr,
        sky=(jax.tree.map(lambda _: jnp.asarray(cfg.lr_sky), params.sky)
             if params.sky is not None else None),
        affine=(jax.tree.map(lambda _: jnp.asarray(cfg.lr_affine),
                             params.affine)
                if params.affine is not None else None),
        cam_pose=(jax.tree.map(lambda _: jnp.asarray(cfg.lr_cam_pose),
                               params.cam_pose)
                  if params.cam_pose is not None else None),
    )


def create_scene_train_state(params: SceneParams, aux: SceneAux
                             ) -> SceneTrainState:
    from .optim import strong_types
    params = strong_types(params)
    aux = strong_types(aux)
    dstate = {"background": DensifyState.create(params.background.capacity)}
    if params.rigid is not None:
        dstate["rigid"] = DensifyState.create(
            params.rigid.gauss.capacity)
    if params.deformable is not None:
        dstate["deformable"] = DensifyState.create(
            params.deformable.rigid.gauss.capacity)
    if params.smpl is not None:
        dstate["smpl"] = DensifyState.create(
            params.smpl.rigid.gauss.capacity)
    return SceneTrainState(
        params=params, aux=aux, opt=adam_init(params),
        dstate=dstate, knn=None, step=jnp.zeros((), jnp.int32),
    )


def scene_loss_terms(out, batch: SceneBatch, params: SceneParams,
                     aux: SceneAux, knn, step, cfg: SceneTrainConfig
                     ) -> dict:
    """The full scene loss suite as a dict of weighted terms — shared
    verbatim by the single-device step and the sharded step (parity by
    construction). `out` is a SceneRender; `knn` the cached KNN dict."""
    ld = {}
    # ego-body exclusion: supervised quantities are multiplied by
    # valid = 1 - ego_mask before every loss, exactly like the
    # reference (base.py:527-537 valid_loss_mask)
    pred_rgb, gt_rgb, alpha = out.rgb, batch.rgb, out.alpha
    if batch.ego_mask is not None:
        valid = 1.0 - batch.ego_mask.astype(jnp.float32)
        pred_rgb = pred_rgb * valid[..., None]
        gt_rgb = gt_rgb * valid[..., None]
        alpha = alpha * valid
    # dynamic-region upweight (omnire.yaml dynamic_region)
    if (batch.dynamic_mask is not None
            and cfg.dynamic_region_factor > 1.0):
        w_px = jnp.where(
            (step >= cfg.dynamic_region_start)
            & (batch.dynamic_mask > 0),
            cfg.dynamic_region_factor, 1.0)
        err = jnp.abs(pred_rgb - gt_rgb) * w_px[..., None]
        ld["rgb"] = cfg.w_rgb * err.mean()
    else:
        ld["rgb"] = cfg.w_rgb * losses.l1(pred_rgb, gt_rgb)
    ld["ssim"] = cfg.w_ssim * losses.ssim_loss(pred_rgb, gt_rgb)
    if cfg.w_sky > 0 and batch.sky_mask is not None:
        sky_gt = batch.sky_mask
        if batch.ego_mask is not None:
            # gt occupied = (1-sky)*valid, pred = alpha*valid
            # (base.py:536-537); our sky loss takes the SKY mask, so
            # fold valid into both sides: sky' s.t. 1-sky' = (1-sky)*v
            sky_gt = 1.0 - (1.0 - batch.sky_mask) * valid
        ld["sky"] = cfg.w_sky * losses.sky_opacity_loss(alpha, sky_gt)
    if cfg.w_depth > 0 and batch.depth is not None:
        # expected depth = accumulated/alpha, matching the reference's
        # gsplat render_mode='RGB+ED' supervision (base.py:393-408)
        hit = batch.depth > 0
        if batch.ego_mask is not None:
            hit = hit & (batch.ego_mask == 0)       # base.py:556
        w_d = cfg.w_depth
        if cfg.depth_lidar_w_decay > 0:             # base.py:559-563
            w_d = w_d * jnp.exp(-step / 8000.0
                                * cfg.depth_lidar_w_decay)
        ld["depth"] = w_d * losses.depth_loss(
            out.depth / jnp.maximum(out.alpha, 1e-3),
            batch.depth, hit,
            inverse=cfg.depth_inverse)
    if cfg.w_entropy > 0:
        ld["entropy"] = cfg.w_entropy * losses.opacity_entropy(out.alpha)
    if cfg.w_smooth > 0:
        ld["smooth"] = cfg.w_smooth * losses.inverse_depth_smoothness(
            out.depth / jnp.maximum(out.alpha, 1e-3), out.rgb)
    # per-class regs (compute_reg_loss protocol, base.py:616-619)
    # sharp_shape_reg on every class, active every step_interval steps
    # (vanilla.py:418-429; traced-step gating stays jit-friendly as a
    # 0/1 multiplier)
    scaling_gate = ((step > cfg.scaling_start_after)
                    & (step < cfg.scaling_stop_after)).astype(jnp.float32)
    if cfg.w_sharp_shape > 0:
        sharp_gate = (step % cfg.sharp_shape_interval == 0
                      ).astype(jnp.float32)
        sharp = losses.scale_reg(
            jnp.exp(params.background.log_scales), aux.bg_alive,
            cfg.max_gauss_ratio)
        for block, al in ((params.rigid, aux.rigid_alive if params.rigid
                           is not None else None),
                          (params.deformable, aux.deform_alive
                           if params.deformable is not None else None),
                          (params.smpl, aux.smpl_alive
                           if params.smpl is not None else None)):
            if block is None:
                continue
            g = block.gauss if hasattr(block, "gauss") else block.rigid.gauss
            sharp = sharp + losses.scale_reg(jnp.exp(g.log_scales), al,
                                             cfg.max_gauss_ratio)
        ld["sharp_shape"] = cfg.w_sharp_shape * sharp_gate * sharp
    if params.bg_pvg is not None and cfg.w_pvg_velocity > 0:
        from ..motion.pvg import velocity_reg
        ld["pvg_velocity"] = cfg.w_pvg_velocity * velocity_reg(
            params.bg_pvg, aux.bg_alive)
    if cfg.w_scaling_background > 0:
        ld["bg_scaling"] = cfg.w_scaling_background * scaling_gate * \
            scale_percentile_reg(params.background.log_scales,
                                 aux.bg_alive, cfg.scaling_percentile)
    if params.rigid is not None:
        ld["rigid_temporal"] = cfg.w_rigid_temporal * \
            temporal_smoothness_reg(params.rigid, aux.rigid_aux)
        if cfg.w_scaling_rigid > 0:
            ld["rigid_scaling"] = cfg.w_scaling_rigid * scaling_gate * \
                scale_percentile_reg(params.rigid.gauss.log_scales,
                                     aux.rigid_alive,
                                     cfg.scaling_percentile)
        if knn is not None and "rigid" in knn:
            idx, w = knn["rigid"]
            ld["rigid_emb_knn"] = cfg.w_embedding_knn * \
                embedding_knn_loss(params.rigid.embeddings, idx, w)
    if params.deformable is not None:
        ld["deform_oob"] = cfg.w_deform_oob * out_of_bound_loss(
            params.deformable, aux.deform_aux, aux.deform_alive,
            batch.frame_idx, step, cfg.scene.deformable)
    if params.smpl is not None:
        # full SMPL reg suite, applied every step like the reference
        # (OmniRe smpl.py:598-744 via compute_reg_loss)
        from ..motion.smpl import (joint_smoothness_reg,
                                   knn_consistency_reg, x_offset_reg)
        ld["smpl_joint_smooth"] = cfg.w_smpl_joint_smooth * \
            joint_smoothness_reg(params.smpl)
        ld["smpl_x_offset"] = cfg.w_smpl_x_offset * x_offset_reg(
            params.smpl, aux.smpl_aux, aux.smpl_alive)
        # max_s_square_reg (w=0.05) AND the gated percentile scaling_reg
        # (w=1, 6000<step<30000) are SEPARATE terms in the reference's
        # SMPL reg block (omnire.yaml:229-233,:250-251)
        ld["smpl_scale"] = cfg.w_smpl_scale * losses.max_s_square_reg(
            params.smpl.rigid.gauss.log_scales, aux.smpl_alive)
        if cfg.w_scaling_smpl > 0:
            ld["smpl_scaling"] = cfg.w_scaling_smpl * scaling_gate * \
                scale_percentile_reg(params.smpl.rigid.gauss.log_scales,
                                     aux.smpl_alive,
                                     cfg.scaling_percentile)
        if knn is not None and "smpl" in knn:
            idx, w = knn["smpl"]
            ld["smpl_knn"] = cfg.w_smpl_knn * knn_consistency_reg(
                params.smpl, idx, w)
            ld["smpl_emb_knn"] = cfg.w_embedding_knn * \
                embedding_knn_loss(params.smpl.rigid.embeddings, idx, w)
        if params.smpl.voxel is not None:
            from ..motion.voxel_deformer import (voxel_magnitude_loss,
                                                 voxel_tv_loss)
            ld["smpl_voxel"] = cfg.w_smpl_voxel * (
                voxel_tv_loss(params.smpl.voxel)
                + voxel_magnitude_loss(params.smpl.voxel))
    return ld


@functools.partial(jax.jit, static_argnames=("cfg", "scene_scale",
                                             "in_test_set"))
def scene_train_step(state: SceneTrainState, batch: SceneBatch,
                     cfg: SceneTrainConfig, scene_scale: float,
                     in_test_set: bool = False):
    aux = state.aux

    def loss_fn(params: SceneParams, m2d_off):
        out = render_scene(params, aux, cfg.scene, batch.camera,
                           batch.frame_idx, batch.img_idx, state.step,
                           in_test_set, means2d_offset=m2d_off)
        ld = scene_loss_terms(out, batch, params, aux, state.knn,
                              state.step, cfg)
        total = sum(ld.values())
        aux_out = dict(loss_dict=ld, psnr=losses.psnr(out.rgb, batch.rgb),
                       radii=out.raster.proj.radii,
                       overflow=out.raster.binning.overflow)
        return total, aux_out

    n_total = sum(
        [state.params.background.capacity]
        + ([state.params.rigid.gauss.capacity]
           if state.params.rigid is not None else [])
        + ([state.params.deformable.rigid.gauss.capacity]
           if state.params.deformable is not None else [])
        + ([state.params.smpl.rigid.gauss.capacity]
           if state.params.smpl is not None else []))
    m2d_zero = jnp.zeros((n_total, 2), jnp.float32)
    (total, aux_out), (gparams, gm2d) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(state.params, m2d_zero)

    lrs = scene_lr_tree(state.params, cfg, state.step, scene_scale)
    new_params, new_opt = adam_update(gparams, state.opt, state.params, lrs)

    # densify stats per controlled class (background + rigid segments)
    cb = state.params.background.capacity
    cam = batch.camera
    dstate = dict(state.dstate)
    dstate["background"] = accumulate_stats(
        state.dstate["background"], gm2d[:cb], aux_out["radii"][:cb],
        cam.width, cam.height)
    off = cb
    for name, block in (("rigid", state.params.rigid),
                        ("deformable", state.params.deformable),
                        ("smpl", state.params.smpl)):
        if block is None:
            continue
        cap = block.gauss.capacity if name == "rigid" \
            else block.rigid.gauss.capacity
        if name in state.dstate:
            dstate[name] = accumulate_stats(
                state.dstate[name], gm2d[off:off + cap],
                aux_out["radii"][off:off + cap], cam.width, cam.height)
        off += cap

    new_state = state._replace(params=new_params, opt=new_opt,
                               dstate=dstate, step=state.step + 1)
    metrics = dict(loss=total, psnr=aux_out["psnr"],
                   overflow=aux_out["overflow"], **aux_out["loss_dict"])
    return new_state, metrics
