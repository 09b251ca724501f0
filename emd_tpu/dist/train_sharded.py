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
from ..core.gaussians import GaussianParams, activate
from ..train import losses
from ..train.optim import AdamState, adam_update
from ..train.trainer import TrainConfig, lr_tree


def default_interpret() -> bool:
    """Pallas interpret mode on CPU backends (tests / dryrun)."""
    return jax.default_backend() == "cpu"


class ShardedBatch(NamedTuple):
    """B stacked cameras + target images, B = data-axis size."""
    K: jax.Array        # (B, 3, 3)
    viewmat: jax.Array  # (B, 4, 4)
    rgb: jax.Array      # (B, H, W, 3)


class ShardedSceneBatch(NamedTuple):
    """Scene-graph variant: adds the per-camera frame index."""
    K: jax.Array          # (B, 3, 3)
    viewmat: jax.Array    # (B, 4, 4)
    rgb: jax.Array        # (B, H, W, 3)
    frame_idx: jax.Array  # (B,) int32


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
        inst = jnp.take(packed, binning.gid, axis=1)
        tiles = composite_tiles(inst, binning.tile_offsets, ntx, nty,
                                interpret)
        rgb, depth, alpha, _ = tiles_to_image(tiles, ntx, nty, width,
                                              height)

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

def make_sharded_scene_loss(mesh: Mesh, cfg, width: int, height: int,
                            aux, interpret: bool | None = None):
    """Sharded loss over the FULL scene graph (SceneParams).

    Sharding layout: the background class (the capacity-dominant soup,
    600k-1M in the reference configs) shards along "gauss"; the motion
    classes (rigid/deformable/SMPL instances, sky, corrections — small,
    parameter-dense) replicate and evaluate redundantly per shard, with
    their world-space soups concatenated after the background all_gather.
    The AD transpose reduce-scatters background gradients and psums the
    replicated classes' gradients over both axes (verified against the
    single-device step in tests/test_dist.py).

    `cfg` is a SceneTrainConfig; `aux` a SceneAux (replicated, non-learned).
    Batch: ShardedSceneBatch with leaves sharded P("data").
    """
    from ..core.sh import eval_sh
    from ..core.gaussians import sh_degree_mask
    from ..core.quat import quat_normalize
    from ..motion.rigid import rigid_world_gaussians
    from ..scene.scene_graph import SceneConfig  # noqa: F401
    from ..train import losses as L

    if interpret is None:
        interpret = default_interpret()
    ntx, nty = num_tiles(width, height, TILE)
    scfg = cfg.scene

    def local_loss(carrier, batch):
        if len(carrier) == 3:
            params, bg_alive_shard, bg_m2d_off = carrier
        else:
            params, bg_alive_shard = carrier
            bg_m2d_off = None
        cam = Camera(K=batch.K[0], viewmat=batch.viewmat[0],
                     width=width, height=height)
        frame = batch.frame_idx[0]
        step = jnp.zeros((), jnp.int32)
        campos = cam.position

        def colors_of(means, shs):
            # SH-degree ramp mask, consistent with render_scene
            mask = sh_degree_mask(
                jnp.minimum(step // scfg.sh_degree_interval, 3),
                shs.shape[1])
            shs = shs * mask[None, :, None]
            dirs = means - campos
            dirs = dirs / jnp.maximum(
                jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
            deg = int(round(shs.shape[1] ** 0.5)) - 1
            return eval_sh(shs, dirs, deg)

        # --- background: LOCAL shard -> project -> all_gather
        bg = params.background
        bg_alive = bg_alive_shard
        shs_bg = jnp.concatenate(
            [bg.sh_dc[:, None, :], bg.sh_rest], axis=1)
        opac_bg = jnp.where(bg_alive,
                            jax.nn.sigmoid(bg.logit_opacities), 0.0)
        col_bg = colors_of(bg.means, shs_bg)
        proj = project_gaussians(bg.means, quat_normalize(bg.quats),
                                 jnp.exp(bg.log_scales), cam.viewmat,
                                 cam.K, width, height)
        m2d_bg = proj.means2d
        if bg_m2d_off is not None:
            m2d_bg = m2d_bg + bg_m2d_off

        def ag(x):
            return jax.lax.all_gather(x, "gauss", axis=0, tiled=True)

        means2d = [ag(m2d_bg)]
        conics = [ag(proj.conics)]
        colors = [ag(col_bg)]
        opacs = [ag(opac_bg * proj.compensation)]
        depths = [ag(proj.depths)]
        radii = [ag(proj.radii)]

        # --- rigid class: replicated, full evaluation per shard
        if params.rigid is not None:
            rp = params.rigid
            wm, wq, vis = rigid_world_gaussians(
                rp, aux.rigid_aux, aux.rigid_alive, frame, step, scfg.rigid)
            shs_r = jnp.concatenate(
                [rp.gauss.sh_dc[:, None, :], rp.gauss.sh_rest], axis=1)
            proj_r = project_gaussians(
                wm, wq, jnp.exp(rp.gauss.log_scales), cam.viewmat, cam.K,
                width, height)
            means2d.append(proj_r.means2d)
            conics.append(proj_r.conics)
            colors.append(colors_of(wm, shs_r))
            opacs.append(jnp.where(
                vis, jax.nn.sigmoid(rp.gauss.logit_opacities), 0.0)
                * proj_r.compensation)
            depths.append(proj_r.depths)
            radii.append(proj_r.radii)

        means2d = jnp.concatenate(means2d)
        conics = jnp.concatenate(conics)
        colors = jnp.concatenate(colors)
        opacs = jnp.concatenate(opacs)
        depths = jnp.concatenate(depths)
        radii = jnp.concatenate(radii)

        binning = bin_gaussians(means2d, radii, depths, width, height,
                                TILE, scfg.budget)
        packed = pack_instances(means2d, conics, colors, opacs, depths)
        packed = jnp.concatenate(
            [packed, jnp.zeros((packed.shape[0], 1), packed.dtype)], axis=1)
        inst = jnp.take(packed, binning.gid, axis=1)
        tiles = composite_tiles(inst, binning.tile_offsets, ntx, nty,
                                interpret)
        rgb, depth, alpha, _ = tiles_to_image(tiles, ntx, nty, width,
                                              height)
        if params.sky is not None:
            from ..core.camera import camera_rays
            from ..scene.sky import composite_sky, sample_cubemap
            _, viewdirs = camera_rays(cam)
            rgb = composite_sky(rgb, alpha, sample_cubemap(params.sky,
                                                           viewdirs))

        loss = (cfg.w_rgb * L.l1(rgb, batch.rgb[0])
                + cfg.w_ssim * L.ssim_loss(rgb, batch.rgb[0]))
        return jax.lax.pmean(loss, "data")

    # background params + alive shard over gauss; everything else replicated
    def spec_of(params):
        bg_spec = jax.tree.map(lambda _: P("gauss"), params.background)
        rest = jax.tree.map(lambda _: P(), params)
        return rest._replace(background=bg_spec)

    def wrap(params_and_alive, batch):
        return jax.shard_map(
            local_loss, mesh=mesh,
            in_specs=(SceneShardSpec(params_and_alive), P("data")),
            out_specs=P(),
            check_vma=False,
        )(params_and_alive, batch)

    return wrap


class _BgAliveCarrier(tuple):
    """(SceneParams, bg_alive) rides as one pytree so the background alive
    mask shards with the background parameters."""


def params_alive_bg(carrier):
    return carrier[1]


def SceneShardSpec(carrier):
    params = carrier[0]
    bg_spec = jax.tree.map(lambda _: P("gauss"), params.background)
    params_spec = jax.tree.map(lambda _: P(), params)
    params_spec = params_spec._replace(background=bg_spec)
    if len(carrier) == 3:
        return (params_spec, P("gauss"), P("gauss"))
    return (params_spec, P("gauss"))


def make_sharded_scene_step(mesh: Mesh, cfg, aux, width: int, height: int,
                            scene_scale: float,
                            interpret: bool | None = None):
    """Full multi-device scene-graph TRAIN step: sharded loss + background
    means2d densification stats + per-group Adam, jitted once with
    NamedShardings (background + its optimizer moments over "gauss",
    motion classes replicated, camera batch over "data").

    Returns (step_fn, shardings) where
      step_fn(params, bg_alive, opt, dstate, batch, stepno)
        -> (params, opt, dstate, metrics)
    """
    from ..train import losses as L
    from ..train.densify import accumulate_stats
    from ..train.optim import adam_update
    from ..train.scene_trainer import scene_lr_tree

    loss_fn = make_sharded_scene_loss(mesh, cfg, width, height, aux,
                                      interpret)
    n_data = mesh.shape["data"]

    bg_sh = NamedSharding(mesh, P("gauss"))
    rep = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))

    def param_shardings(params):
        sh = jax.tree.map(lambda _: rep, params)
        return sh._replace(
            background=jax.tree.map(lambda _: bg_sh, params.background))

    def step(params, bg_alive, opt, dstate, batch, stepno):
        def wrapped(p, off):
            return loss_fn((p, bg_alive, off), batch)

        nb = params.background.capacity
        off0 = jnp.zeros((nb, 2), jnp.float32)
        (loss), (gparams, goff) = jax.value_and_grad(
            wrapped, argnums=(0, 1))(params, off0)
        lrs = scene_lr_tree(params, cfg, stepno, scene_scale)
        new_params, new_opt = adam_update(gparams, opt, params, lrs)
        # densification stats for the background shard (radii proxy: use
        # the screen-grad magnitude only — radii live inside the shard map;
        # visibility approximated by nonzero grad)
        visible = (jnp.abs(goff).sum(-1) > 0).astype(jnp.int32)
        dstate = dstate._replace(
            grad_accum=dstate.grad_accum + jnp.linalg.norm(
                goff * jnp.array([[width * 0.5, height * 0.5]]), axis=-1),
            count=dstate.count + visible)
        return new_params, new_opt, dstate, dict(loss=loss)

    def _opt_shardings(psh):
        from ..train.optim import AdamState
        return AdamState(mu=psh, nu=psh, step=rep)

    def _dstate_shardings(bg):
        from ..train.densify import DensifyState
        return DensifyState(grad_accum=bg, count=bg, max_radii=bg)

    def jit_step(params):
        psh = param_shardings(params)
        batch_sh = jax.tree.map(lambda _: data_sh,
                                ShardedSceneBatch(0, 0, 0, 0))
        return jax.jit(
            step,
            in_shardings=(psh, bg_sh, _opt_shardings(psh),
                          _dstate_shardings(bg_sh), batch_sh, None),
            out_shardings=(psh, _opt_shardings(psh),
                           _dstate_shardings(bg_sh), None),
        )

    return jit_step, param_shardings


def sharded_scene_batch_from_source(source, n_data: int):
    """Assemble an n_data-camera ShardedSceneBatch from a BatchSource."""
    Ks, vms, rgbs, fids, views = [], [], [], [], []
    for _ in range(n_data):
        vi, f, c, b = source.next_train("scene")
        Ks.append(b.camera.K)
        vms.append(b.camera.viewmat)
        rgbs.append(b.rgb)
        fids.append(f)
        views.append(vi)
    return ShardedSceneBatch(
        K=jnp.stack(Ks), viewmat=jnp.stack(vms), rgb=jnp.stack(rgbs),
        frame_idx=jnp.asarray(fids, jnp.int32)), views
