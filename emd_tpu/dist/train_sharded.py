"""Multi-device training step: shard_map over a ("data", "gauss") mesh.

Manual-SPMD (shard_map) rather than GSPMD auto-partitioning: inside the
mapped function everything is single-device code, so the Pallas compositor
runs locally per device and the collectives are explicit and auditable:

  per device: activate + SH + project LOCAL gaussian shard for its camera
  -> all_gather(projected soup, axis="gauss")      [ICI, O(N_local * world)]
  -> bin + composite the full soup for the LOCAL camera
  -> loss; grads flow back: the all_gather transposes to a
     reduce-scatter of duplicated-gaussian gradients (automatic in
     shard_map AD), and the "data"-replication of the parameter shard
     transposes to a psum over cameras.

This realizes BASELINE.md's "reduce-scatter duplicated-Gaussian gradients"
design point with zero hand-written collective code in the backward.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.camera import Camera
from ..core.sh import eval_sh
from ..raster.binning import bin_gaussians, num_tiles
from ..raster.composite_pallas import (
    TILE,
    composite_tiles,
    pack_instances,
    tiles_to_image,
)
from ..raster.projection import project_gaussians
from ..raster.rasterize import expand_instances
from ..core.gaussians import GaussianParams, activate
from ..train import losses
from ..train.optim import AdamState, adam_update
from ..train.trainer import TrainConfig, lr_tree


def default_interpret() -> bool:
    """Pallas interpret mode on non-TPU backends (tests / dryrun)."""
    return jax.default_backend() != "tpu"


class ShardedBatch(NamedTuple):
    """B stacked cameras + target images, B = data-axis size."""
    K: jax.Array        # (B, 3, 3)
    viewmat: jax.Array  # (B, 4, 4)
    rgb: jax.Array      # (B, H, W, 3)


class ShardedSceneBatch(NamedTuple):
    """Scene-graph variant: the full SceneBatch fields, camera-batched.
    Optional supervision (depth/sky/dynamic masks) is None when the scene
    has none — consistently across cameras, so the pytree is static."""
    K: jax.Array          # (B, 3, 3)
    viewmat: jax.Array    # (B, 4, 4)
    rgb: jax.Array        # (B, H, W, 3)
    frame_idx: jax.Array  # (B,) int32
    img_idx: jax.Array = None           # (B,) int32 appearance index
    depth: jax.Array | None = None      # (B, H, W)
    sky_mask: jax.Array | None = None   # (B, H, W)
    dynamic_mask: jax.Array | None = None
    ego_mask: jax.Array | None = None   # (B, H, W) per-camera ego body


def make_sharded_loss(mesh: Mesh, cfg: TrainConfig, width: int, height: int,
                      interpret: bool | None = None):
    """Returns loss_fn(params, alive, batch) -> scalar, differentiable,
    with params sharded P("gauss") and batch sharded P("data")."""
    if interpret is None:
        interpret = default_interpret()
    ntx, nty = num_tiles(width, height, TILE)

    def local_loss(params, alive, batch):
        # local shapes: params (N/g, ...), batch leaves (1, ...)
        act = activate(params, alive)
        cam = Camera(K=batch.K[0], viewmat=batch.viewmat[0],
                     width=width, height=height)
        dirs = act.means - cam.position
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
        max_degree = int(round(act.shs.shape[1] ** 0.5)) - 1
        colors = eval_sh(act.shs, dirs, degree=max_degree)

        proj = project_gaussians(act.means, act.quats, act.scales,
                                 cam.viewmat, cam.K, width, height,
                                 antialiased=cfg.antialiased)
        opac = act.opacities * proj.compensation

        # gather the full projected soup along the gaussian axis; the
        # reverse of these gathers is the duplicated-gaussian grad
        # reduce-scatter.
        def ag(x):
            return jax.lax.all_gather(x, "gauss", axis=0, tiled=True)

        means2d = ag(proj.means2d)
        conics = ag(proj.conics)
        colors_g = ag(colors)
        opac_g = ag(opac)
        depths = ag(proj.depths)
        radii = ag(proj.radii)

        binning = bin_gaussians(means2d, radii, depths, width, height,
                                TILE, cfg.budget)
        packed = pack_instances(means2d, conics, colors_g, opac_g, depths)
        packed = jnp.concatenate(
            [packed, jnp.zeros((packed.shape[0], 1), packed.dtype)], axis=1)
        inst = expand_instances(packed, binning)
        tiles = composite_tiles(inst, binning.tile_offsets, ntx, nty,
                                interpret, with_feat=False)
        rgb, depth, alpha, _ = tiles_to_image(tiles, ntx, nty, width,
                                              height, interpret)

        loss = (cfg.w_rgb * losses.l1(rgb, batch.rgb[0])
                + cfg.w_ssim * losses.ssim_loss(rgb, batch.rgb[0]))
        # mean over the camera batch; replicated across "gauss" already
        return jax.lax.pmean(loss, "data")

    # check_vma=False: pallas_call does not yet declare varying-axis info,
    # so automatic replication checking cannot see through it. Gradient
    # correctness (psum over "data" for the replicated param shard,
    # reduce-scatter transpose of the all_gathers) is covered by
    # tests/test_dist.py::test_sharded_grads_match_single_device.
    return jax.shard_map(
        local_loss, mesh=mesh,
        in_specs=(P("gauss"), P("gauss"), P("data")),
        out_specs=P(),
        check_vma=False,
    )


def make_sharded_train_step(mesh: Mesh, cfg: TrainConfig, width: int,
                            height: int, scene_scale: float = 1.0,
                            interpret: bool | None = None):
    """Jitted multi-device train step: returns (params, opt, loss)."""
    loss_fn = make_sharded_loss(mesh, cfg, width, height, interpret)

    gauss_sharding = NamedSharding(mesh, P("gauss"))
    data_sharding = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    # AdamState.step is a scalar — replicated; moments follow the params.
    opt_sharding = AdamState(mu=gauss_sharding, nu=gauss_sharding, step=rep)

    @functools.partial(
        jax.jit,
        in_shardings=(gauss_sharding, (opt_sharding, gauss_sharding),
                      jax.tree.map(lambda _: data_sharding,
                                   ShardedBatch(0, 0, 0)),
                      None),
        out_shardings=(gauss_sharding, (opt_sharding, gauss_sharding), None),
    )
    def step(params: GaussianParams, opt_and_alive, batch: ShardedBatch,
             stepno: jax.Array):
        opt, alive = opt_and_alive
        loss, grads = jax.value_and_grad(loss_fn)(params, alive, batch)
        lrs = lr_tree(cfg, stepno, scene_scale)
        new_params, new_opt = adam_update(grads, opt, params, lrs)
        return new_params, (new_opt, alive), loss

    return step


# ----------------------------------------------------------------------------
# full scene-graph sharded step
# ----------------------------------------------------------------------------

def _opt_none(x, b):
    """Slice leaf [0] of an optional batched field."""
    return None if x is None else x[0]


def make_sharded_scene_loss(mesh: Mesh, cfg, width: int, height: int,
                            interpret: bool | None = None):
    """Sharded loss over the FULL scene graph — at parity with the
    single-device `scene_train_step` by construction: the local function
    calls the SAME `render_scene` (with the all_gather hook rejoining the
    background shard after its distributed projection) and the SAME
    `scene_loss_terms` suite.

    Sharding layout: the background class (the capacity-dominant soup,
    600k-1M in the reference configs) shards along "gauss"; the motion
    classes (rigid/deformable/SMPL, sky, corrections — small,
    parameter-dense) replicate and evaluate redundantly per shard. The AD
    transpose reduce-scatters background gradients and psums the
    replicated classes' gradients (verified against the single-device
    step in tests/test_dist.py).

    Returns loss_fn(params, saux, m2d_off, knn, batch, stepno)
      -> (total, aux_out) where
      params: SceneParams, background leaves P("gauss"), rest P();
      saux:   SceneAux, bg_alive P("gauss"), rest P();
      m2d_off: (n_data, n_total, 2) P("data") — PER-CAMERA screen-space
               offsets; grad[b] is camera b's means2d gradient so densify
               stats keep the reference's per-camera-norm semantics;
      knn:    cached KNN dict (replicated) or None;
      batch:  ShardedSceneBatch, leaves P("data");
      aux_out: radii (n_data, n_total) per camera, psnr/overflow/loss_dict
               (replicated).
    """
    from ..scene.scene_graph import render_scene
    from ..train import losses as L
    from ..train.scene_trainer import SceneBatch, scene_loss_terms

    if interpret is None:
        interpret = default_interpret()
    scfg = dataclasses_replace_interpret(cfg.scene, interpret)

    def local_loss(params, saux, m2d_off, knn, batch, stepno):
        cam = Camera(K=batch.K[0], viewmat=batch.viewmat[0],
                     width=width, height=height)
        sbatch = SceneBatch(
            camera=cam, rgb=batch.rgb[0], frame_idx=batch.frame_idx[0],
            img_idx=batch.img_idx[0],
            depth=_opt_none(batch.depth, 0),
            sky_mask=_opt_none(batch.sky_mask, 0),
            dynamic_mask=_opt_none(batch.dynamic_mask, 0),
            ego_mask=_opt_none(batch.ego_mask, 0))

        def bg_gather(x):
            return jax.lax.all_gather(x, "gauss", axis=0, tiled=True)

        out = render_scene(params, saux, scfg, cam, sbatch.frame_idx,
                           sbatch.img_idx, stepno,
                           means2d_offset=m2d_off[0], bg_gather=bg_gather)
        ld = scene_loss_terms(out, sbatch, params, saux, knn, stepno, cfg)
        total = jax.lax.pmean(sum(ld.values()), "data")
        aux_out = dict(
            radii=out.raster.proj.radii[None],          # P("data")
            psnr=jax.lax.pmean(L.psnr(out.rgb, sbatch.rgb), "data"),
            overflow=jax.lax.pmax(
                out.raster.binning.overflow.astype(jnp.int32), "data"),
            loss_dict=jax.tree.map(lambda v: jax.lax.pmean(v, "data"), ld),
        )
        return total, aux_out

    def specs(params, saux, knn, batch):
        p_spec = jax.tree.map(lambda _: P(), params)._replace(
            background=jax.tree.map(lambda _: P("gauss"),
                                    params.background))
        a_spec = jax.tree.map(lambda _: P(), saux)._replace(
            bg_alive=P("gauss"))
        k_spec = jax.tree.map(lambda _: P(), knn)
        b_spec = jax.tree.map(lambda _: P("data"), batch)
        return (p_spec, a_spec, P("data"), k_spec, b_spec, P())

    out_specs = (P(), dict(radii=P("data"), psnr=P(), overflow=P(),
                           loss_dict=P()))

    def wrap(params, saux, m2d_off, knn, batch, stepno):
        return jax.shard_map(
            local_loss, mesh=mesh,
            in_specs=specs(params, saux, knn, batch),
            out_specs=out_specs,
            check_vma=False,
        )(params, saux, m2d_off, knn, batch, stepno)

    return wrap


def dataclasses_replace_interpret(scene_cfg, interpret):
    import dataclasses
    return dataclasses.replace(scene_cfg, interpret=interpret)


def scene_total_capacity(params) -> int:
    return sum(
        [params.background.capacity]
        + ([params.rigid.gauss.capacity] if params.rigid is not None else [])
        + ([params.deformable.rigid.gauss.capacity]
           if params.deformable is not None else [])
        + ([params.smpl.rigid.gauss.capacity]
           if params.smpl is not None else []))


def make_sharded_scene_step(mesh: Mesh, cfg, aux, width: int, height: int,
                            scene_scale: float,
                            interpret: bool | None = None):
    """Full multi-device scene-graph TRAIN step at parity with
    `scene_train_step`: real step counter, full loss suite + per-class
    regs, all classes + sky/affine/cam-pose composed, per-group Adam, and
    densification stats with the single-device semantics (per-camera
    screen-grad norms + radii visibility) for background AND rigid.

    Returns (jit_step, param_shardings) where
      jit_step(params)(params, saux, opt, dstates, knn, batch, stepno)
        -> (params, opt, dstates, metrics)
      with dstates a dict {"background": DensifyState, "rigid": ...?}.
    `aux` is only used to decide the pytree structure at jit time; the
    live SceneAux rides through the `saux` argument (bg_alive sharded).
    """
    from ..train.densify import accumulate_stats
    from ..train.optim import AdamState, adam_update
    from ..train.scene_trainer import scene_lr_tree

    loss_fn = make_sharded_scene_loss(mesh, cfg, width, height, interpret)
    n_data = mesh.shape["data"]

    bg_sh = NamedSharding(mesh, P("gauss"))
    rep = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))

    def param_shardings(params):
        sh = jax.tree.map(lambda _: rep, params)
        return sh._replace(
            background=jax.tree.map(lambda _: bg_sh, params.background))

    def step(params, saux, opt, dstates, knn, batch, stepno):
        n_total = scene_total_capacity(params)
        off0 = jnp.zeros((n_data, n_total, 2), jnp.float32)
        (loss, aux_out), (gparams, goff) = jax.value_and_grad(
            loss_fn, argnums=(0, 2), has_aux=True)(
                params, saux, off0, knn, batch, stepno)
        lrs = scene_lr_tree(params, cfg, stepno, scene_scale)
        new_params, new_opt = adam_update(gparams, opt, params, lrs)

        # densify stats: per-camera grads (undo the data-pmean's 1/B) and
        # radii, accumulated exactly as B sequential single-device steps
        radii = aux_out["radii"]                        # (B, n_total)
        cb = params.background.capacity
        cr = (params.rigid.gauss.capacity
              if params.rigid is not None else 0)
        new_dstates = dict(dstates)
        for b in range(n_data):
            g_b = goff[b] * float(n_data)
            new_dstates["background"] = accumulate_stats(
                new_dstates["background"], g_b[:cb], radii[b, :cb],
                width, height)
            if "rigid" in dstates:
                new_dstates["rigid"] = accumulate_stats(
                    new_dstates["rigid"], g_b[cb:cb + cr],
                    radii[b, cb:cb + cr], width, height)
        metrics = dict(loss=loss, psnr=aux_out["psnr"],
                       overflow=aux_out["overflow"],
                       **aux_out["loss_dict"])
        return new_params, new_opt, new_dstates, metrics

    def jit_step(params, saux=None, dstates=None, knn=None,
                 has_depth=False, has_sky=False, has_dyn=False,
                 has_ego=False):
        psh = param_shardings(params)
        opt_sh = AdamState(mu=psh, nu=psh, step=rep)
        a_sh = (jax.tree.map(lambda _: rep, saux)._replace(bg_alive=bg_sh)
                if saux is not None else None)
        d_sh = (jax.tree.map(lambda _: rep, dstates)
                if dstates is not None else None)
        k_sh = jax.tree.map(lambda _: rep, knn)
        batch_proto = ShardedSceneBatch(
            K=0, viewmat=0, rgb=0, frame_idx=0, img_idx=0,
            depth=0 if has_depth else None,
            sky_mask=0 if has_sky else None,
            dynamic_mask=0 if has_dyn else None,
            ego_mask=0 if has_ego else None)
        batch_sh = jax.tree.map(lambda _: data_sh, batch_proto)
        return jax.jit(
            step,
            in_shardings=(psh, a_sh, opt_sh, d_sh, k_sh, batch_sh, None),
            out_shardings=(psh, opt_sh, d_sh, None),
        )

    return jit_step, param_shardings


# ----------------------------------------------------------------------------
# S3-flavor sharded step
# ----------------------------------------------------------------------------

class ShardedS3Batch(NamedTuple):
    """S3-flavor camera batch, B = data-axis size."""
    K: jax.Array          # (B, 3, 3)
    viewmat: jax.Array    # (B, 4, 4)
    rgb: jax.Array        # (B, H, W, 3)
    t: jax.Array          # (B,) normalized time
    cam_no: jax.Array     # (B,) int32 camera index
    depth: jax.Array | None = None      # (B, H, W)
    sky_mask: jax.Array | None = None   # (B, H, W)
    feat: jax.Array | None = None       # (B, H, W, 3)


def make_sharded_s3_loss(mesh: Mesh, cfg, width: int, height: int,
                         fine_stage: bool, interpret: bool | None = None):
    """Sharded S3 loss at parity with `s3_train_step` by construction: the
    local function calls the SAME `render_s3` (with the gauss-axis
    all_gather hook rejoining the projected soup before binning) and the
    SAME `s3_loss_terms` suite.

    Sharding layout: the gaussian SoA AND the per-gaussian `_embedding`
    table shard along "gauss" — the S3 field (hexplane/hash MLPs, small
    and parameter-dense) and the sky cubemap replicate. The field is
    *evaluated* on the local shard only, distributing the deformation
    FLOPs (the dominant per-gaussian cost in the fine stage) over the
    gauss axis; its AD transpose psums the replicated field gradients.

    The deformation-magnitude regs (dx/ds/do/dshs) are local-shard means,
    so the total pmeans over BOTH axes — equal shard sizes make the mean
    of local means the global mean; terms already replicated across
    "gauss" (image losses, grid regs) are unchanged by it. The KNN
    embedding reg needs cross-shard neighbors, so the local loss gathers
    the embedding table (C×E, small next to the projected soup) and
    feeds it to `s3_loss_terms` via `embeddings_global`.

    Returns loss_fn(params, alive, m2d_off, knn, batch, stepno)
      -> (total, aux) with params/alive leaves P("gauss") for per-gaussian
      arrays, P() for field/sky; m2d_off (B, C, 2) P("data") per-camera
      screen offsets (global capacity C: the offset applies post-gather);
      batch leaves P("data").
    """
    from ..train import losses as L
    from ..train.s3_trainer import S3Batch, render_s3, s3_loss_terms

    if interpret is None:
        interpret = default_interpret()
    cfg = dataclasses_replace_interpret(cfg, interpret)

    def local_loss(params, alive, m2d_off, knn, batch, stepno):
        cam = Camera(K=batch.K[0], viewmat=batch.viewmat[0],
                     width=width, height=height)
        sbatch = S3Batch(
            camera=cam, rgb=batch.rgb[0], t=batch.t[0],
            cam_no=batch.cam_no[0],
            depth=_opt_none(batch.depth, 0),
            sky_mask=_opt_none(batch.sky_mask, 0),
            feat=_opt_none(batch.feat, 0))

        def gg(x):
            return jax.lax.all_gather(x, "gauss", axis=0, tiled=True)

        agg_key = (jax.random.fold_in(jax.random.PRNGKey(0), stepno)
                   if cfg.field.aggregate_feature else None)
        rgb, out, deform = render_s3(
            params, alive, cfg, cam, sbatch.t, sbatch.cam_no, stepno,
            fine_stage, means2d_offset=m2d_off[0], agg_key=agg_key,
            gauss_gather=gg)
        emb_global = gg(params.embeddings) if knn is not None else None
        ld = s3_loss_terms(rgb, out, deform, sbatch, params, knn, cfg,
                           fine_stage, embeddings_global=emb_global)
        axes = ("data", "gauss")
        total = jax.lax.pmean(sum(ld.values()), axes)
        aux = dict(
            radii=out.proj.radii[None],                 # (1, C) P("data")
            psnr=jax.lax.pmean(L.psnr(rgb, sbatch.rgb), "data"),
            overflow=jax.lax.pmax(
                out.binning.overflow.astype(jnp.int32), "data"),
            loss_dict=jax.tree.map(lambda v: jax.lax.pmean(v, axes), ld),
        )
        return total, aux

    def specs(params, alive, knn, batch):
        # per-gaussian leaves on "gauss"; field + sky replicated
        p_spec = jax.tree.map(lambda _: P(), params)._replace(
            gauss=jax.tree.map(lambda _: P("gauss"), params.gauss),
            embeddings=P("gauss"))
        k_spec = jax.tree.map(lambda _: P(), knn)
        b_spec = jax.tree.map(lambda _: P("data"), batch)
        return (p_spec, P("gauss"), P("data"), k_spec, b_spec, P())

    out_specs = (P(), dict(radii=P("data"), psnr=P(), overflow=P(),
                           loss_dict=P()))

    def wrap(params, alive, m2d_off, knn, batch, stepno):
        return jax.shard_map(
            local_loss, mesh=mesh,
            in_specs=specs(params, alive, knn, batch),
            out_specs=out_specs,
            check_vma=False,
        )(params, alive, m2d_off, knn, batch, stepno)

    return wrap


def make_sharded_s3_step(mesh: Mesh, cfg, width: int, height: int,
                         spatial_scale: float, fine_stage: bool,
                         interpret: bool | None = None):
    """Jitted multi-device S3 train step at parity with `s3_train_step`:
    same render, same loss suite, same per-group Adam LR tree, and
    densify stats with per-camera screen-grad-norm semantics.

    Returns (jit_step, param_shardings) where
      jit_step(params, knn, has_depth, has_sky, has_feat)(
          params, alive, opt, dstate, knn, batch, stepno)
        -> (params, opt, dstate, metrics).
    """
    from ..train.densify import accumulate_stats
    from ..train.s3_trainer import s3_lr_tree

    loss_fn = make_sharded_s3_loss(mesh, cfg, width, height, fine_stage,
                                   interpret)
    n_data = mesh.shape["data"]
    g_sh = NamedSharding(mesh, P("gauss"))
    rep = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))

    def param_shardings(params):
        return jax.tree.map(lambda _: rep, params)._replace(
            gauss=jax.tree.map(lambda _: g_sh, params.gauss),
            embeddings=g_sh)

    def step(params, alive, opt, dstate, knn, batch, stepno):
        cap = params.gauss.capacity
        off0 = jnp.zeros((n_data, cap, 2), jnp.float32)
        (loss, aux), (gparams, goff) = jax.value_and_grad(
            loss_fn, argnums=(0, 2), has_aux=True)(
                params, alive, off0, knn, batch, stepno)
        lrs = s3_lr_tree(params, cfg, stepno, spatial_scale)
        new_params, new_opt = adam_update(gparams, opt, params, lrs)
        # per-camera densify stats: undo the data-pmean's 1/B like the
        # scene flavor, accumulate as B sequential single-device steps
        radii = aux["radii"]
        for b in range(n_data):
            dstate = accumulate_stats(dstate, goff[b] * float(n_data),
                                      radii[b], width, height)
        metrics = dict(loss=loss, psnr=aux["psnr"],
                       overflow=aux["overflow"], **aux["loss_dict"])
        return new_params, new_opt, dstate, metrics

    def jit_step(params, knn=None, has_depth=False, has_sky=False,
                 has_feat=False):
        psh = param_shardings(params)
        opt_sh = AdamState(mu=psh, nu=psh, step=rep)
        k_sh = jax.tree.map(lambda _: rep, knn)
        batch_proto = ShardedS3Batch(
            K=0, viewmat=0, rgb=0, t=0, cam_no=0,
            depth=0 if has_depth else None,
            sky_mask=0 if has_sky else None,
            feat=0 if has_feat else None)
        batch_sh = jax.tree.map(lambda _: data_sh, batch_proto)
        return jax.jit(
            step,
            in_shardings=(psh, g_sh, opt_sh, rep, k_sh, batch_sh, None),
            out_shardings=(psh, opt_sh, rep, None),
        )

    return jit_step, param_shardings


def sharded_s3_batch_from_source(source, n_data: int):
    """Assemble an n_data-camera ShardedS3Batch from a BatchSource."""
    cols = {k: [] for k in ("K", "viewmat", "rgb", "t", "cam_no",
                            "depth", "sky_mask", "feat")}
    views = []
    for _ in range(n_data):
        vi, f, c, b = source.next_train("s3")
        cols["K"].append(b.camera.K)
        cols["viewmat"].append(b.camera.viewmat)
        cols["rgb"].append(b.rgb)
        cols["t"].append(b.t)
        cols["cam_no"].append(b.cam_no)
        cols["depth"].append(b.depth)
        cols["sky_mask"].append(b.sky_mask)
        cols["feat"].append(b.feat)
        views.append(vi)

    def stack(xs):
        return None if xs[0] is None else jnp.stack(xs)

    return ShardedS3Batch(
        **{k: stack(v) for k, v in cols.items()}), views


def sharded_scene_batch_from_source(source, n_data: int):
    """Assemble an n_data-camera ShardedSceneBatch from a BatchSource."""
    cols = {k: [] for k in ("K", "viewmat", "rgb", "frame_idx", "img_idx",
                            "depth", "sky_mask", "dynamic_mask",
                            "ego_mask")}
    views = []
    for _ in range(n_data):
        vi, f, c, b = source.next_train("scene")
        cols["K"].append(b.camera.K)
        cols["viewmat"].append(b.camera.viewmat)
        cols["rgb"].append(b.rgb)
        cols["frame_idx"].append(jnp.asarray(f, jnp.int32))
        cols["img_idx"].append(b.img_idx)
        cols["depth"].append(b.depth)
        cols["sky_mask"].append(b.sky_mask)
        cols["dynamic_mask"].append(b.dynamic_mask)
        cols["ego_mask"].append(b.ego_mask)
        views.append(vi)

    def stack(xs):
        return None if xs[0] is None else jnp.stack(xs)

    return ShardedSceneBatch(
        **{k: stack(v) for k, v in cols.items()}), views
