"""S3-flavor training orchestration: two-stage loop (coarse static ->
fine with the global deformation field), densify/prune on the single
gaussian soup, KNN refresh for the embedding reg.

The L5 layer of the S3 path (S3Gaussian/train.py scene_reconstruction:
170-441: stage switch at coarse_iterations, densify/prune/reset at
:404-426, checkpoint + eval at :431-441).
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..motion.embedding_reg import knn_graph
from ..utils.checkpoint import save_checkpoint
from ..utils.logging import MetricLogger, setup_logging
from .densify import DensifyConfig, refine, reset_opacity
from .loop import every_interval
from .optim import AdamState
from .s3_trainer import (
    S3Params,
    S3TrainConfig,
    S3TrainState,
    create_s3_train_state,
    s3_train_step,
)


@dataclasses.dataclass(frozen=True)
class S3LoopConfig:
    coarse_iters: int = 5000
    max_steps: int = 55_000
    refine_start: int = 500
    refine_interval: int = 100
    refine_stop: int = 15_000
    reset_opacity_interval: int = 3000
    knn_refresh_interval: int = 1000
    log_interval: int = 50
    ckpt_interval: int = 20_000
    test_stride: int = 10
    seed: int = 0
    # S3 data/init pipeline (dataset_readers.py:613-740)
    num_init_pts: int = 1_500_000      # init cap after grid downsample
    aggregate_depth: bool = True       # 3-frame sparse-depth maps
    depth_cache: str | None = None     # sparse_depth/ + occ_grid.npy dir
    # point growing (gaussian_model.grow:662-694 — dormant in the
    # reference, off by default; enable with an interval > 0)
    grow_interval: int = 0
    grow_start: int = 5000
    grow_density_thresh: float = 2.0   # x median knn distance = sparse
    grow_displacement: float = 0.2     # jitter scale * knn distance


def _refine_s3(state: S3TrainState, key, spatial_scale, logger, step):
    """One densify/prune pass — shared by the single-device and sharded
    loops. Densifies (gauss ++ embeddings) together so children inherit
    their parent's motion embedding (the reference carries _embedding
    through densification, gaussian_model.py:479-556)."""
    key, sub = jax.random.split(key)
    combined = (state.params.gauss, state.params.embeddings)
    opt_c = AdamState(
        mu=(state.opt.mu.gauss, state.opt.mu.embeddings),
        nu=(state.opt.nu.gauss, state.opt.nu.embeddings),
        step=state.opt.step)
    out = refine(sub, combined, state.alive, opt_c, state.dstate,
                 DensifyConfig(), spatial_scale)
    gauss, emb = out.params
    state = state._replace(
        params=state.params._replace(gauss=gauss, embeddings=emb),
        opt=state.opt._replace(
            mu=state.opt.mu._replace(gauss=out.opt.mu[0],
                                     embeddings=out.opt.mu[1]),
            nu=state.opt.nu._replace(gauss=out.opt.nu[0],
                                     embeddings=out.opt.nu[1])),
        alive=out.alive, dstate=out.dstate)
    stats = jax.device_get((out.n_split, out.n_dup, out.n_culled,
                            jnp.sum(out.alive)))
    logger.info("refine@%d: split %d dup %d culled %d alive %d",
                step, *map(int, stats))
    return state, key


def _gauss_opt(state: S3TrainState) -> AdamState:
    return AdamState(mu=state.opt.mu.gauss, nu=state.opt.nu.gauss,
                     step=state.opt.step)


def _set_gauss(state: S3TrainState, gauss, opt_g, alive, dstate):
    return state._replace(
        params=state.params._replace(gauss=gauss),
        opt=state.opt._replace(
            mu=state.opt.mu._replace(gauss=opt_g.mu),
            nu=state.opt.nu._replace(gauss=opt_g.nu)),
        alive=alive, dstate=dstate)


def fit_s3(scene, out_dir: str, cfg: S3TrainConfig | None = None,
           loop: S3LoopConfig = S3LoopConfig(), params_alive=None,
           spatial_scale: float | None = None, mesh=None) -> S3TrainState:
    from ..data.batches import BatchSource
    from ..data.seeding import seed_background
    from ..motion.hexplane import set_aabb
    from ..motion.s3field import create_s3_field
    from ..scene.sky import SkyCubemap

    logger = setup_logging(out_dir)
    cfg = cfg or S3TrainConfig()
    cfg = dataclasses.replace(cfg, coarse_iters=loop.coarse_iters,
                              max_steps=loop.max_steps)

    occ = None
    if params_alive is None:
        logger.info("seeding S3 gaussians from lidar ...")
        from ..data.seeding import seed_s3_background
        gauss, alive, occ = seed_s3_background(
            scene, num_pts=loop.num_init_pts, seed=loop.seed,
            sh_bases=cfg.field.sh_bases, cache_dir=loop.depth_cache)
        lo, hi = scene.aabb()
        if cfg.field.backbone == "hash":
            # the hash path's MERF contraction gets the aabb statically
            cfg = dataclasses.replace(cfg, field=cfg.field._replace(
                hash_aabb_lo=tuple(float(v) for v in lo),
                hash_aabb_hi=tuple(float(v) for v in hi)))
        field = create_s3_field(jax.random.PRNGKey(loop.seed), cfg.field)
        if field.hexplane is not None:
            field = field._replace(
                hexplane=set_aabb(field.hexplane, lo, hi))
        params = S3Params(
            gauss=gauss,
            embeddings=jnp.zeros(
                (gauss.capacity, cfg.field.gaussian_embedding_dim)),
            field=field, sky=SkyCubemap.create(128))
    else:
        params, alive = params_alive
    state = create_s3_train_state(params, alive)
    spatial_scale = spatial_scale or scene.camera_extent()

    source = BatchSource(
        scene, test_stride=loop.test_stride, seed=loop.seed,
        depth_mode="aggregate" if loop.aggregate_depth else "single",
        depth_cache=loop.depth_cache)
    metrics_log = MetricLogger(out_dir)
    key = jax.random.PRNGKey(loop.seed)

    if mesh is not None:
        return _fit_s3_sharded(out_dir, cfg, loop, state, spatial_scale,
                               source, metrics_log, key, mesh, logger)

    for step in range(loop.max_steps):
        if every_interval(step, loop.knn_refresh_interval):
            idx, w = knn_graph(np.asarray(state.params.gauss.means),
                               np.asarray(state.alive), k=8)
            state = state._replace(knn=(jnp.asarray(idx), jnp.asarray(w)))

        fine = step >= loop.coarse_iters
        vi, f, c, batch = source.next_train("s3")
        state, m = s3_train_step(state, batch, cfg, spatial_scale, fine)
        m = jax.device_get(m)   # one host fetch for all metrics
        if not np.isfinite(m["loss"]):
            raise FloatingPointError(f"non-finite loss at step {step}")
        source.report_error(vi, float(m["rgb"]))
        metrics_log.update(loss=m["loss"], psnr=m["psnr"], rgb=m["rgb"])
        if bool(m["overflow"]):
            logger.warning("step %d: instance budget overflow", step)

        if (loop.refine_start <= step < loop.refine_stop
                and every_interval(step, loop.refine_interval)):
            state, key = _refine_s3(state, key, spatial_scale, logger,
                                    step)

        if (0 < step < loop.refine_stop
                and every_interval(step, loop.reset_opacity_interval)):
            g, opt_g = reset_opacity(state.params.gauss, _gauss_opt(state))
            state = _set_gauss(state, g, opt_g, state.alive, state.dstate)

        if (loop.grow_interval > 0 and step >= loop.grow_start
                and every_interval(step, loop.grow_interval)):
            state = grow_points(state, loop, occ, logger, step)

        if every_interval(step, loop.log_interval):
            logger.info(metrics_log.line(step, loop.max_steps))
            metrics_log.dump(step)
        if step > 0 and every_interval(step, loop.ckpt_interval):
            save_checkpoint(os.path.join(out_dir, f"ckpt_{step:06d}.npz"),
                            (state.params, state.alive, state.step))

    save_checkpoint(os.path.join(out_dir, "ckpt_final.npz"),
                    (state.params, state.alive, state.step))
    return state


def _fit_s3_sharded(out_dir, cfg: S3TrainConfig, loop: S3LoopConfig,
                    state: S3TrainState, spatial_scale, source,
                    metrics_log, key, mesh, logger) -> S3TrainState:
    """Multi-device S3 loop at parity with the single-device one: the
    sharded step (dist.train_sharded.make_sharded_s3_step — same
    render_s3 + s3_loss_terms), KNN refresh on the gathered-view means,
    the SAME _refine_s3 body (jitted ops on the globally-sharded
    arrays; GSPMD handles the layout), opacity reset, checkpointing.
    Trains mesh.shape["data"] cameras per iteration; the coarse->fine
    stage switch retraces the step like any static-signature change."""
    from ..dist.train_sharded import (make_sharded_s3_step,
                                      sharded_s3_batch_from_source)

    n_data = mesh.shape["data"]
    h, w = source.scene.image_hw
    d = source.downscale
    width, height = w // d, h // d
    logger.info("sharded S3 loop: mesh %s, %d cameras/step",
                dict(mesh.shape), n_data)
    probe = source.next_train("s3")[3]
    has = dict(has_depth=probe.depth is not None,
               has_sky=probe.sky_mask is not None,
               has_feat=probe.feat is not None)

    step_fn = None
    step_sig = None
    for step in range(loop.max_steps):
        if every_interval(step, loop.knn_refresh_interval):
            idx, wk = knn_graph(np.asarray(state.params.gauss.means),
                                np.asarray(state.alive), k=8)
            state = state._replace(knn=(jnp.asarray(idx),
                                        jnp.asarray(wk)))

        fine = step >= loop.coarse_iters
        sig = (fine, jax.tree.structure(state.knn))
        if step_fn is None or sig != step_sig:
            jit_step, _ = make_sharded_s3_step(
                mesh, cfg, width, height, spatial_scale,
                fine_stage=fine)
            step_fn = jit_step(state.params, state.knn, **has)
            step_sig = sig

        batch, views = sharded_s3_batch_from_source(source, n_data)
        params, opt, dstate, m = step_fn(
            state.params, state.alive, state.opt, state.dstate,
            state.knn, batch, jnp.asarray(step, jnp.int32))
        state = state._replace(params=params, opt=opt, dstate=dstate,
                               step=jnp.asarray(step + 1))
        m = jax.device_get(m)
        if not np.isfinite(m["loss"]):
            raise FloatingPointError(f"non-finite loss at step {step}")
        for vi in views:
            source.report_error(vi, float(m.get("rgb", m["loss"])))
        metrics_log.update(loss=m["loss"], psnr=m["psnr"])
        if bool(m["overflow"]):
            logger.warning("step %d: instance budget overflow", step)

        if (loop.refine_start <= step < loop.refine_stop
                and every_interval(step, loop.refine_interval)):
            state, key = _refine_s3(state, key, spatial_scale, logger,
                                    step)

        if (0 < step < loop.refine_stop
                and every_interval(step, loop.reset_opacity_interval)):
            g, opt_g = reset_opacity(state.params.gauss,
                                     _gauss_opt(state))
            state = _set_gauss(state, g, opt_g, state.alive,
                               state.dstate)

        if every_interval(step, loop.log_interval):
            logger.info(metrics_log.line(step, loop.max_steps))
            metrics_log.dump(step)
        if step > 0 and every_interval(step, loop.ckpt_interval):
            save_checkpoint(os.path.join(out_dir, f"ckpt_{step:06d}.npz"),
                            (state.params, state.alive, state.step))

    save_checkpoint(os.path.join(out_dir, "ckpt_final.npz"),
                    (state.params, state.alive, state.step))
    return state


def grow_points(state: S3TrainState, loop: S3LoopConfig, occ, logger,
                step: int) -> S3TrainState:
    """Point growing: jittered copies of low-density gaussians written
    into dead capacity slots (a working re-creation of the reference's
    dormant gaussian_model.grow:662-694 / add_point_by_mask: find sparse
    regions by KNN distance, displace, keep points inside the volume —
    here additionally gated by the lidar occupancy grid when available)."""
    from ..motion.embedding_reg import knn_graph

    means = np.asarray(state.params.gauss.means)
    alive = np.asarray(state.alive)
    idx, w = knn_graph(means, alive, k=4)
    alive_idx = np.flatnonzero(alive)
    neigh = means[idx[alive_idx]] - means[alive_idx][:, None]
    dist = np.linalg.norm(neigh, axis=-1).mean(axis=1)
    med = np.median(dist)
    sparse = dist > loop.grow_density_thresh * med
    src = alive_idx[sparse]
    dead = np.flatnonzero(~alive)
    n_new = min(src.shape[0], dead.shape[0])
    if n_new == 0:
        logger.info("grow@%d: nothing to add", step)
        return state
    rng = np.random.RandomState(step)
    src = src[:n_new]
    dst = dead[:n_new]
    jitter = rng.randn(n_new, 3).astype(np.float32) \
        * (loop.grow_displacement * dist[sparse][:n_new, None])
    new_means = means[src] + jitter
    keep = np.ones(n_new, bool)
    if occ is not None:
        from ..data.depth import occ_grid_lookup
        grid, lo, hi, voxel = occ
        keep = occ_grid_lookup(grid, lo, hi, voxel, new_means)
    src, dst, new_means = src[keep], dst[keep], new_means[keep]
    if src.shape[0] == 0:
        logger.info("grow@%d: all candidates unoccupied", step)
        return state

    def copy_rows(leaf):
        arr = np.asarray(leaf)
        if arr.ndim == 0 or arr.shape[0] != alive.shape[0]:
            return leaf
        arr = arr.copy()
        arr[dst] = arr[src]
        return jnp.asarray(arr)

    gauss = jax.tree.map(copy_rows, state.params.gauss)
    gauss = gauss._replace(
        means=gauss.means.at[dst].set(jnp.asarray(new_means)))
    emb = copy_rows(state.params.embeddings)
    new_alive = state.alive.at[jnp.asarray(dst)].set(True)

    def zero_rows(leaf):
        arr = np.asarray(leaf)
        if arr.ndim == 0 or arr.shape[0] != alive.shape[0]:
            return leaf
        arr = arr.copy()
        arr[dst] = 0
        return jnp.asarray(arr)

    opt = state.opt._replace(
        mu=state.opt.mu._replace(gauss=jax.tree.map(
            zero_rows, state.opt.mu.gauss),
            embeddings=zero_rows(state.opt.mu.embeddings)),
        nu=state.opt.nu._replace(gauss=jax.tree.map(
            zero_rows, state.opt.nu.gauss),
            embeddings=zero_rows(state.opt.nu.embeddings)))
    logger.info("grow@%d: added %d points (sparse %d, dead %d)",
                step, src.shape[0], int(sparse.sum()), dead.shape[0])
    return state._replace(
        params=state.params._replace(gauss=gauss, embeddings=emb),
        opt=opt, alive=new_alive)
