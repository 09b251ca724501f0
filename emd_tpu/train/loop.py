"""Training orchestration: the outer loop gluing data, train steps,
densification, KNN refresh, eval, checkpointing, logging.

The L5 layer (OmniRe tools/train.py:107-352 / S3 scene_reconstruction,
train.py:170-441) re-built around jitted steps: everything inside a step is
one XLA program; the loop only moves python scalars, samples views, and
fires the periodic controllers.
"""
from __future__ import annotations

import dataclasses
import os
import time
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from ..motion.embedding_reg import knn_graph
from ..scene.scene_graph import SceneConfig
from ..utils.checkpoint import save_checkpoint
from ..utils.logging import MetricLogger, setup_logging
from .densify import refine, reset_opacity
from .scene_trainer import (
    SceneBatch,
    SceneTrainConfig,
    SceneTrainState,
    create_scene_train_state,
    scene_train_step,
)
from .trainer import TrainConfig


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    max_steps: int = 30_000
    # resolution warm-up (omnire.yaml res_schedule: start at 1/2^d, double
    # every double_steps)
    downscale_times: int = 0
    double_steps: int = 250
    refine_start: int = 500
    refine_interval: int = 100
    refine_stop: int = 15_000
    reset_opacity_interval: int = 3000
    knn_refresh_interval: int = 1000
    log_interval: int = 50
    eval_interval: int = 10_000
    ckpt_interval: int = 15_000
    test_stride: int = 10
    seed: int = 0
    # size the instance budget from a measured probe at startup: render a
    # few views, read binning.num_instances (exact even when the probe
    # budget overflows), set budget = 1.3x the max need. The mid-training
    # overflow regrow still backstops densification growth.
    auto_budget: bool = True
    # deferred metric fetch: process step metrics `metric_lag` steps late
    # so the per-step host round-trip (30 ms through a TPU relay) overlaps
    # device compute instead of serializing with it. The error-buffer
    # update and the NaN abort lag by the same amount (the sampler is an
    # EMA anyway); 0 = synchronous. Pending metrics are drained before
    # checkpoints so resume stays bit-identical.
    metric_lag: int = 0


def every_interval(step: int, interval: int) -> bool:
    """True when `step` hits a positive `interval`; 0/negative disables
    the periodic action instead of crashing the loop."""
    return interval > 0 and step % interval == 0


def _refresh_knn(state):
    """Rebuild cached KNN graphs for every class that uses one (rigid
    embedding reg, SMPL knn-consistency + embedding regs)."""
    knn = {}
    if state.params.rigid is not None:
        idx, w = knn_graph(np.asarray(state.params.rigid.gauss.means),
                           np.asarray(state.aux.rigid_alive), k=8)
        knn["rigid"] = (jnp.asarray(idx), jnp.asarray(w))
    if state.params.smpl is not None:
        idx, w = knn_graph(np.asarray(state.params.smpl.rigid.gauss.means),
                           np.asarray(state.aux.smpl_alive), k=8)
        knn["smpl"] = (jnp.asarray(idx), jnp.asarray(w))
    return state._replace(knn=knn or None)


def fit_scene(
    scene,
    out_dir: str,
    cfg: SceneTrainConfig | None = None,
    loop: LoopConfig = LoopConfig(),
    params_aux=None,
    eval_fn=None,
    mesh=None,
    resume: str | None = None,
    smpl_template: str | None = None,
    step_hook=None,
    background: str = "vanilla",
) -> SceneTrainState:
    """Train the scene-graph model on a scene; returns the final state.

    `resume`: path to a full-state checkpoint written by this loop —
    training continues from its step, bit-identical to an uninterrupted
    run (reference: OmniRe resume_from_checkpoint base.py:688-698 +
    tools/train.py:128-135; S3 capture/restore incl. optimizer state)."""
    # local imports: the data package imports batch types from this
    # package, so pulling data symbols lazily avoids an import cycle
    from ..data.batches import BatchSource
    from ..data.seeding import build_scene_params

    logger = setup_logging(out_dir)
    cfg = cfg or SceneTrainConfig()
    cfg = dataclasses.replace(cfg, max_steps=loop.max_steps)

    if params_aux is None:
        logger.info("seeding scene graph from data ...")
        params, aux = build_scene_params(scene, seed=loop.seed,
                                         smpl_template=smpl_template,
                                         background=background)
    else:
        params, aux = params_aux
    if params.bg_pvg is not None and cfg.scene.pvg_num_frames <= 1:
        cfg = dataclasses.replace(cfg, scene=dataclasses.replace(
            cfg.scene, pvg_num_frames=scene.num_frames))
    state = create_scene_train_state(params, aux)
    # LR scale = camera-extent radius (the reference's scene_radius /
    # spatial_lr_scale), NOT the lidar AABB radius (several x larger —
    # inflated LRs destabilize the hexplane/means)
    scene_scale = scene.camera_extent()
    logger.info(
        "scene: %d frames x %d cams, scale %.1f; background capacity %d",
        scene.num_frames, scene.num_cams, scene_scale,
        params.background.capacity)

    source = BatchSource(scene, test_stride=loop.test_stride,
                         seed=loop.seed)
    metrics_log = MetricLogger(out_dir)
    key = jax.random.PRNGKey(loop.seed)
    start_step = 0
    resume_extras = {}
    if resume is not None:
        state, key, start_step, resume_extras = restore_train_checkpoint(
            resume, state, source, key)
        if resume_extras.get("budget"):
            cfg = dataclasses.replace(cfg, scene=dataclasses.replace(
                cfg.scene, budget=resume_extras["budget"]))
        logger.info("resumed from %s at step %d", resume, start_step)

    if loop.auto_budget and start_step == 0:
        cfg = _autosize_budget(cfg, state, source, scene, logger)

    if mesh is not None:
        return _fit_scene_sharded(scene, out_dir, cfg, loop, state,
                                  scene_scale, source, metrics_log, key,
                                  mesh, logger, eval_fn=eval_fn,
                                  start_step=start_step,
                                  step_hook=step_hook)

    overflow_streak = resume_extras.get("overflow_streak", 0)
    pending = []         # (step, view_idx, metrics-on-device) FIFO

    def process(pstep, vi, m):
        nonlocal overflow_streak
        m = jax.device_get(m)
        if not np.isfinite(m["loss"]):
            # hard NaN/Inf abort, like the reference (tools/train.py:266-271)
            raise FloatingPointError(
                f"non-finite loss at step {pstep}: "
                f"{ {k: float(v) for k, v in m.items()} }")
        source.report_error(vi, float(m["rgb"]))
        metrics_log.update(loss=m["loss"], psnr=m["psnr"], rgb=m["rgb"])
        if bool(m["overflow"]):
            overflow_streak += 1
            logger.warning("step %d: instance budget overflow (%d/3)",
                           pstep, overflow_streak)
        else:
            overflow_streak = 0
        return bool(m["overflow"]) and overflow_streak >= 3

    def drain():
        regrow = False
        while pending:
            regrow |= bool(process(*pending.pop(0)))
        return regrow

    for step in range(start_step, loop.max_steps):
        if loop.downscale_times > 0:
            level = max(0, loop.downscale_times - step // loop.double_steps)
            source.set_downscale(1 << level)

        # KNN refresh BEFORE the step: the first refresh changes the state
        # pytree (None -> arrays), so doing it up-front avoids a retrace.
        if ((state.params.rigid is not None
             or state.params.smpl is not None)
                and every_interval(step, loop.knn_refresh_interval)):
            state = _refresh_knn(state)

        vi, f, c, batch = source.next_train("scene")
        state, m = scene_train_step(state, batch, cfg, scene_scale)
        # ONE host fetch for all step metrics (each float() round-trips
        # the remote device; fetching per-metric dominated step time),
        # deferred by metric_lag steps so the fetch overlaps compute
        pending.append((step, vi, m))
        want_regrow = False
        while len(pending) > loop.metric_lag:
            want_regrow |= bool(process(*pending.pop(0)))
        if want_regrow:
            # persistent overflow silently drops instances — regrow the
            # budget host-side (a static cfg change = one retrace)
            new_budget = -(-int(cfg.scene.budget * 3 / 2) // 65536) * 65536
            cfg = dataclasses.replace(cfg, scene=dataclasses.replace(
                cfg.scene, budget=new_budget))
            overflow_streak = 0
            logger.warning("step %d: budget regrown to %d (retrace)",
                           step, new_budget)

        if (loop.refine_start <= step < loop.refine_stop
                and every_interval(step, loop.refine_interval)):
            state, key = _refine_all_classes(state, key, scene_scale, loop,
                                             logger, step)

        if (0 < step < loop.refine_stop
                and every_interval(step, loop.reset_opacity_interval)):
            p, opt_bg = reset_opacity(state.params.background,
                                      _opt_background(state))
            state = _set_background(state, p, opt_bg, state.aux.bg_alive,
                                    state.dstate)

        if every_interval(step, loop.log_interval):
            logger.info(metrics_log.line(step, loop.max_steps))
            metrics_log.dump(step)
            if step_hook is not None:
                # e.g. the live viewer's publish() — a lock-free state
                # swap, so browser frames track training
                step_hook(state, step)

        if eval_fn is not None and step > 0 and \
                every_interval(step, loop.eval_interval):
            eval_fn(state, step)

        if step > 0 and every_interval(step, loop.ckpt_interval):
            drain()      # resume bit-identity: no un-applied errors
            save_train_checkpoint(
                os.path.join(out_dir, f"ckpt_{step:06d}.npz"),
                state._replace(step=jnp.asarray(step + 1)), source, key,
                budget=cfg.scene.budget, overflow_streak=overflow_streak)

    drain()
    save_checkpoint(os.path.join(out_dir, "ckpt_final.npz"),
                    (state.params, state.aux, state.step))
    save_train_checkpoint(os.path.join(out_dir, "ckpt_full_final.npz"),
                          state, source, key, budget=cfg.scene.budget,
                          overflow_streak=overflow_streak)
    logger.info("done: %s", metrics_log.line(loop.max_steps,
                                             loop.max_steps))
    return state


def _full_ckpt_tree(state, source, key, budget=0, overflow_streak=0):
    """Complete resumable train state: params + optimizer moments +
    densify stats + sampler scores/RNG + loop RNG key (the reference's
    S3 capture() tuple incl. optimizer state, gaussian_model.py:74-118,
    plus OmniRe's cached error buffer, train.py:306-334) + the loop's
    current instance budget / overflow streak (the budget auto-regrows
    host-side, so it is loop state too)."""
    tree = dict(params=state.params, aux=state.aux, opt=state.opt,
                dstate=state.dstate, step=state.step, key=key,
                sampler=source.sampler.snapshot(),
                budget=np.int64(budget),
                overflow_streak=np.int64(overflow_streak))
    if state.knn is not None:
        tree["knn"] = state.knn
    return tree


def save_train_checkpoint(path, state, source, key, budget=0,
                          overflow_streak=0):
    save_checkpoint(path, _full_ckpt_tree(state, source, key, budget,
                                          overflow_streak))


def restore_train_checkpoint(path, state, source, key):
    """Restore a full-state checkpoint into a freshly-seeded state of the
    same structure. Returns (state, key, start_step, extras) such that
    continuing the loop from start_step is bit-identical to never having
    stopped (tests/test_resume.py); extras carries the saved instance
    budget / overflow streak (0 budget = keep the configured one)."""
    from ..utils.checkpoint import load_checkpoint

    data = np.load(path)
    has_knn = any("knn" in k for k in data.files)
    if has_knn and state.knn is None:
        state = _refresh_knn(state)
    template = _full_ckpt_tree(state, source, key)
    restored = load_checkpoint(path, template)
    source.sampler.restore(restored["sampler"])
    state = state._replace(
        params=restored["params"], aux=restored["aux"],
        opt=restored["opt"], dstate=restored["dstate"],
        step=jnp.asarray(restored["step"]),
        knn=restored.get("knn", state.knn))
    extras = dict(budget=int(restored.get("budget", 0)),
                  overflow_streak=int(restored.get("overflow_streak", 0)))
    return state, jnp.asarray(restored["key"]), int(restored["step"]), \
        extras


def fit_single(scene, out_dir: str, cfg: TrainConfig | None = None,
               loop: LoopConfig = LoopConfig(), eval_fn=None,
               step_hook=None):
    """Single-class training loop: the reference SingleTrainer path
    (OmniRe models/trainers/single.py:23-211 driven by tools/train.py) —
    a background-only model whose variant (vanilla / PVG / DeformGS) is
    selected by cfg.background, with the shared densify controller plus
    PVG's tau-gradient trigger."""
    from ..data.batches import BatchSource
    from ..data.seeding import seed_background
    from .trainer import (Batch, create_motion, create_train_state,
                          refine_step, reset_opacity_step, train_step)

    logger = setup_logging(out_dir)
    cfg = cfg or TrainConfig()
    key = jax.random.PRNGKey(loop.seed)
    params, alive, times = seed_background(scene, with_times=True,
                                           seed=loop.seed)
    motion = create_motion(key, cfg, params, init_times=times,
                           aabb=scene.aabb())
    state = create_train_state(params, alive, motion)
    scene_scale = scene.camera_extent()
    logger.info("single[%s]: capacity %d, scale %.1f", cfg.background,
                params.capacity, scene_scale)

    source = BatchSource(scene, test_stride=loop.test_stride,
                         seed=loop.seed)
    metrics_log = MetricLogger(out_dir)
    tden = max(scene.num_frames - 1, 1)

    for step in range(loop.max_steps):
        vi, f, c, sbatch = source.next_train("scene")
        batch = Batch(camera=sbatch.camera, rgb=sbatch.rgb,
                      depth=sbatch.depth, sky_mask=sbatch.sky_mask,
                      t=jnp.asarray(f / tden, jnp.float32))
        state, m = train_step(state, batch, cfg, scene_scale)
        m = jax.device_get(m)
        if not np.isfinite(m["loss"]):
            raise FloatingPointError(f"non-finite loss at step {step}")
        source.report_error(vi, float(m["rgb"]))
        metrics_log.update(loss=m["loss"], psnr=m["psnr"])

        if (loop.refine_start <= step < loop.refine_stop
                and every_interval(step, loop.refine_interval)):
            key, sub = jax.random.split(key)
            use_screen = step > loop.reset_opacity_interval
            state, st = refine_step(sub, state, cfg, scene_scale,
                                    use_screen_cull=use_screen)
            logger.info("refine@%d: split %d dup %d culled %d alive %d",
                        step, int(st["n_split"]), int(st["n_dup"]),
                        int(st["n_culled"]), int(st["n_alive"]))
        if (0 < step < loop.refine_stop
                and every_interval(step, loop.reset_opacity_interval)):
            state = reset_opacity_step(state)
        if every_interval(step, loop.log_interval):
            logger.info(metrics_log.line(step, loop.max_steps))
            metrics_log.dump(step)
            if step_hook is not None:
                # e.g. the live viewer's publish() — a lock-free state
                # swap, so browser frames track training
                step_hook(state, step)
        if eval_fn is not None and step > 0 and \
                every_interval(step, loop.eval_interval):
            eval_fn(state, step)
        if step > 0 and every_interval(step, loop.ckpt_interval):
            save_checkpoint(os.path.join(out_dir, f"ckpt_{step:06d}.npz"),
                            (state.params, state.alive, state.motion,
                             state.step))

    save_checkpoint(os.path.join(out_dir, "ckpt_final.npz"),
                    (state.params, state.alive, state.motion, state.step))
    return state


def _densify_cfg():
    from .densify import DensifyConfig
    return DensifyConfig()


def _refine_all_classes(state, key, scene_scale, loop, logger, step):
    """One densify pass over every scene-graph class — THE refine body,
    shared verbatim by the single-device and sharded loops (parity by
    construction). Screen-size culling arms after the first opacity
    reset (vanilla.py:304-331 refine_scale2d_stop_at semantics)."""
    use_screen = step > loop.reset_opacity_interval
    key, sub = jax.random.split(key)
    carrier = state.params.background
    carrier_opt = _opt_background(state)
    if state.params.bg_pvg is not None:
        # PVG background: temporal params (and their Adam rows) ride
        # through refine so children inherit them — row surgery only
        from .optim import AdamState
        bp = state.params.bg_pvg
        carrier = (carrier, bp.taus, bp.log_betas, bp.velocity)
        mu_p, nu_p = state.opt.mu.bg_pvg, state.opt.nu.bg_pvg
        carrier_opt = AdamState(
            mu=(carrier_opt.mu, mu_p.taus, mu_p.log_betas, mu_p.velocity),
            nu=(carrier_opt.nu, nu_p.taus, nu_p.log_betas, nu_p.velocity),
            step=carrier_opt.step)
    out = refine(sub, carrier, state.aux.bg_alive,
                 carrier_opt, state.dstate["background"],
                 _densify_cfg(), scene_scale, use_screen_cull=use_screen)
    if state.params.bg_pvg is not None:
        from ..scene.scene_graph import PvgTemporal
        from .optim import AdamState
        gauss, taus, log_betas, velocity = out.params
        new_pvg = PvgTemporal(taus=taus, log_betas=log_betas,
                              velocity=velocity)
        state = state._replace(params=state.params._replace(
            bg_pvg=new_pvg),
            opt=state.opt._replace(
                mu=state.opt.mu._replace(bg_pvg=PvgTemporal(
                    taus=out.opt.mu[1], log_betas=out.opt.mu[2],
                    velocity=out.opt.mu[3])),
                nu=state.opt.nu._replace(bg_pvg=PvgTemporal(
                    taus=out.opt.nu[1], log_betas=out.opt.nu[2],
                    velocity=out.opt.nu[3]))))
        out = out._replace(params=gauss,
                           opt=AdamState(mu=out.opt.mu[0],
                                         nu=out.opt.nu[0],
                                         step=out.opt.step))
    state = _apply_background_refine(state, out)
    stats = jax.device_get((out.n_split, out.n_dup, out.n_culled,
                            jnp.sum(out.alive), out.n_dropped))
    logger.info(
        "refine@%d[bg]: split %d dup %d culled %d alive %d drop %d",
        step, *map(int, stats))
    if state.params.rigid is not None:
        key, sub = jax.random.split(key)
        state = _refine_rigid(state, sub, scene_scale, logger, step,
                              use_screen=use_screen)
    if state.params.deformable is not None:
        key, sub = jax.random.split(key)
        state = _refine_node(state, sub, "deformable", logger, step,
                             use_screen=use_screen)
    if state.params.smpl is not None:
        key, sub = jax.random.split(key)
        state = _refine_node(state, sub, "smpl", logger, step,
                             use_screen=use_screen)
    return state, key


def _refine_rigid(state, key, scene_scale, logger, step,
                  use_screen=False):
    """Densify the rigid class: gaussians + embeddings + point ids move
    together (children inherit the parent's instance and embedding —
    rigid.py refinement_after:278-383), then out-of-box culling
    (rigid.py:467-476)."""
    from ..motion.rigid import out_of_bound_mask
    from .densify import refine
    from .optim import AdamState

    rp = state.params.rigid
    pid = state.aux.rigid_aux.point_ids
    combined = (rp.gauss, rp.embeddings, pid)
    zeros_pid = jnp.zeros_like(pid)
    opt_c = AdamState(
        mu=(state.opt.mu.rigid.gauss, state.opt.mu.rigid.embeddings,
            zeros_pid),
        nu=(state.opt.nu.rigid.gauss, state.opt.nu.rigid.embeddings,
            zeros_pid),
        step=state.opt.step)
    out = refine(key, combined, state.aux.rigid_alive, opt_c,
                 state.dstate["rigid"], _densify_cfg(), 1.0,
                 use_screen_cull=use_screen)
    gauss, emb, new_pid = out.params
    new_aux = state.aux._replace(
        rigid_aux=state.aux.rigid_aux._replace(point_ids=new_pid))
    new_params = state.params._replace(
        rigid=rp._replace(gauss=gauss, embeddings=emb))
    oob = out_of_bound_mask(new_params.rigid, new_aux.rigid_aux)
    new_alive = out.alive & ~oob
    new_opt = state.opt._replace(
        mu=state.opt.mu._replace(rigid=state.opt.mu.rigid._replace(
            gauss=out.opt.mu[0], embeddings=out.opt.mu[1])),
        nu=state.opt.nu._replace(rigid=state.opt.nu.rigid._replace(
            gauss=out.opt.nu[0], embeddings=out.opt.nu[1])))
    dstate = dict(state.dstate)
    dstate["rigid"] = out.dstate
    stats = jax.device_get((out.n_split, out.n_dup, out.n_culled,
                            jnp.sum(oob & out.alive), jnp.sum(new_alive)))
    logger.info(
        "refine@%d[rigid]: split %d dup %d culled %d oob %d alive %d",
        step, *map(int, stats))
    return state._replace(
        params=new_params,
        aux=new_aux._replace(rigid_alive=new_alive),
        opt=new_opt, dstate=dstate)


def _refine_node(state, key, name, logger, step, use_screen=False):
    """Densify the deformable or SMPL class (reference: both inherit
    RigidNodes.refinement_after, rigid.py:278-383 — gaussians, embeddings
    and point ids move together; children inherit their parent's
    instance), then out-of-box culling of canonical gaussians."""
    from ..motion.rigid import out_of_bound_mask
    from .densify import refine
    from .optim import AdamState

    if name == "deformable":
        node, mu_n, nu_n = (state.params.deformable,
                            state.opt.mu.deformable, state.opt.nu.deformable)
        raux, alive = state.aux.deform_aux, state.aux.deform_alive
    else:
        node, mu_n, nu_n = (state.params.smpl, state.opt.mu.smpl,
                            state.opt.nu.smpl)
        raux, alive = state.aux.smpl_aux.rigid, state.aux.smpl_alive
    rp = node.rigid
    pid = raux.point_ids
    combined = [rp.gauss, rp.embeddings, pid]
    zeros_pid = jnp.zeros_like(pid)
    mu_c = [mu_n.rigid.gauss, mu_n.rigid.embeddings, zeros_pid]
    nu_c = [nu_n.rigid.gauss, nu_n.rigid.embeddings, zeros_pid]
    if name == "smpl":
        # per-gaussian LBS weights ride along: children inherit their
        # parent's skinning row (human_body.py keeps W per-gaussian)
        lbs_w = state.aux.smpl_aux.template.lbs_weights
        combined.append(lbs_w)
        mu_c.append(jnp.zeros_like(lbs_w))
        nu_c.append(jnp.zeros_like(lbs_w))
    opt_c = AdamState(mu=tuple(mu_c), nu=tuple(nu_c), step=state.opt.step)
    out = refine(key, tuple(combined), alive, opt_c, state.dstate[name],
                 _densify_cfg(), 1.0, use_screen_cull=use_screen)
    gauss, emb, new_pid = out.params[:3]
    new_rp = rp._replace(gauss=gauss, embeddings=emb)
    new_raux = raux._replace(point_ids=new_pid)
    oob = out_of_bound_mask(new_rp, new_raux)
    new_alive = out.alive & ~oob

    mu_new = mu_n._replace(rigid=mu_n.rigid._replace(
        gauss=out.opt.mu[0], embeddings=out.opt.mu[1]))
    nu_new = nu_n._replace(rigid=nu_n.rigid._replace(
        gauss=out.opt.nu[0], embeddings=out.opt.nu[1]))
    dstate = dict(state.dstate)
    dstate[name] = out.dstate
    stats = jax.device_get((out.n_split, out.n_dup, out.n_culled,
                            jnp.sum(oob & out.alive), jnp.sum(new_alive)))
    logger.info(
        "refine@%d[%s]: split %d dup %d culled %d oob %d alive %d",
        step, name, *map(int, stats))
    if name == "deformable":
        new_params = state.params._replace(
            deformable=state.params.deformable._replace(rigid=new_rp))
        new_aux = state.aux._replace(deform_aux=new_raux,
                                     deform_alive=new_alive)
        new_opt = state.opt._replace(
            mu=state.opt.mu._replace(deformable=mu_new),
            nu=state.opt.nu._replace(deformable=nu_new))
    else:
        new_params = state.params._replace(
            smpl=state.params.smpl._replace(rigid=new_rp))
        new_tmpl = state.aux.smpl_aux.template._replace(
            lbs_weights=out.params[3])
        new_aux = state.aux._replace(
            smpl_aux=state.aux.smpl_aux._replace(rigid=new_raux,
                                                 template=new_tmpl),
            smpl_alive=new_alive)
        new_opt = state.opt._replace(
            mu=state.opt.mu._replace(smpl=mu_new),
            nu=state.opt.nu._replace(smpl=nu_new))
    return state._replace(params=new_params, aux=new_aux, opt=new_opt,
                          dstate=dstate)


def _opt_background(state: SceneTrainState):
    from .optim import AdamState
    return AdamState(mu=state.opt.mu.background, nu=state.opt.nu.background,
                     step=state.opt.step)


def _apply_background_refine(state: SceneTrainState, out):
    dstate = dict(state.dstate)
    dstate["background"] = out.dstate
    return _set_background(state, out.params, out.opt, out.alive, dstate)


def _set_background(state: SceneTrainState, bg_params, bg_opt, bg_alive,
                    dstate):
    new_params = state.params._replace(background=bg_params)
    new_opt = state.opt._replace(
        mu=state.opt.mu._replace(background=bg_opt.mu),
        nu=state.opt.nu._replace(background=bg_opt.nu))
    new_aux = state.aux._replace(bg_alive=bg_alive)
    return state._replace(params=new_params, opt=new_opt, aux=new_aux,
                          dstate=dstate)


def _fit_scene_sharded(scene, out_dir, cfg, loop, state, scene_scale,
                       source, metrics_log, key, mesh, logger,
                       eval_fn=None, start_step=0, step_hook=None):
    """Multi-device variant of the training loop, at parity with the
    single-device loop: full loss suite + per-class regs (the step is
    built on the same render_scene/scene_loss_terms), real step counter,
    KNN refresh, background AND rigid densification with per-camera stat
    semantics, opacity reset, eval + checkpointing. Trains
    mesh.shape["data"] cameras per iteration; densify/reset run as jitted
    ops on the globally-sharded arrays (GSPMD handles the layout)."""
    import numpy as np

    from ..dist.train_sharded import (make_sharded_scene_step,
                                      sharded_scene_batch_from_source)
    from .densify import reset_opacity

    n_data = mesh.shape["data"]
    width, height = scene.image_hw[::-1]
    jit_step, _ = make_sharded_scene_step(
        mesh, cfg, state.aux, width, height, scene_scale)
    logger.info("sharded loop: mesh %s, %d cameras/step",
                dict(mesh.shape), n_data)

    probe = source.next_train("scene")[3]
    has_depth = probe.depth is not None
    has_sky = probe.sky_mask is not None
    has_dyn = probe.dynamic_mask is not None

    step_fn = None
    step_sig = None
    overflow_streak = 0
    pending = []        # (step, views, metrics-on-device) FIFO
    want_regrow = False

    def process(pstep, pviews, m):
        nonlocal overflow_streak
        m = jax.device_get(m)
        if not np.isfinite(m["loss"]):
            raise FloatingPointError(f"non-finite loss at step {pstep}")
        for vi in pviews:
            source.report_error(vi, float(m["rgb"]) if "rgb" in m
                                else float(m["loss"]))
        metrics_log.update(loss=m["loss"], psnr=m.get("psnr", 0.0))
        if bool(m["overflow"]):
            overflow_streak += 1
            logger.warning("step %d: instance budget overflow (%d/3)",
                           pstep, overflow_streak)
        else:
            overflow_streak = 0
        return bool(m["overflow"]) and overflow_streak >= 3

    def drain():
        regrow = False
        while pending:
            regrow |= bool(process(*pending.pop(0)))
        return regrow

    for step in range(start_step, loop.max_steps):
        if ((state.params.rigid is not None
             or state.params.smpl is not None)
                and every_interval(step, loop.knn_refresh_interval)):
            state = _refresh_knn(state)

        # retrace when the pytree structure changes (first KNN refresh)
        # or the budget was regrown
        sig = (jax.tree.structure((state.params, state.knn)),
               cfg.scene.budget)
        if step_fn is None or sig != step_sig:
            jit_step, _ = make_sharded_scene_step(
                mesh, cfg, state.aux, width, height, scene_scale)
            step_fn = jit_step(state.params, state.aux, state.dstate,
                               state.knn, has_depth, has_sky, has_dyn)
            step_sig = sig

        batch, views = sharded_scene_batch_from_source(source, n_data)
        params, opt, dstates, m = step_fn(
            state.params, state.aux, state.opt, state.dstate, state.knn,
            batch, jnp.asarray(step))
        state = state._replace(params=params, opt=opt, dstate=dstates,
                               step=jnp.asarray(step + 1))
        # deferred metric drain, same as the single-device loop: the
        # host fetch overlaps device compute by metric_lag steps
        pending.append((step, views, m))
        want_regrow = False
        while len(pending) > loop.metric_lag:
            want_regrow |= bool(process(*pending.pop(0)))
        if want_regrow:
            new_budget = -(-int(cfg.scene.budget * 3 / 2)
                           // 65536) * 65536
            cfg = dataclasses.replace(cfg, scene=dataclasses.replace(
                cfg.scene, budget=new_budget))
            overflow_streak = 0
            logger.warning("step %d: budget regrown to %d (retrace)",
                           step, new_budget)

        if (loop.refine_start <= step < loop.refine_stop
                and every_interval(step, loop.refine_interval)):
            state, key = _refine_all_classes(state, key, scene_scale, loop,
                                             logger, step)

        if (0 < step < loop.refine_stop
                and every_interval(step, loop.reset_opacity_interval)):
            p, opt_bg = reset_opacity(state.params.background,
                                      _opt_background(state))
            state = _set_background(state, p, opt_bg, state.aux.bg_alive,
                                    state.dstate)

        if every_interval(step, loop.log_interval):
            logger.info(metrics_log.line(step, loop.max_steps))
            metrics_log.dump(step)
            if step_hook is not None:
                # e.g. the live viewer's publish() — a lock-free state
                # swap, so browser frames track training
                step_hook(state, step)

        if eval_fn is not None and step > 0 and \
                every_interval(step, loop.eval_interval):
            eval_fn(state, step)

        if step > 0 and every_interval(step, loop.ckpt_interval):
            drain()      # resume bit-identity: no un-applied errors
            save_train_checkpoint(
                os.path.join(out_dir, f"ckpt_{step:06d}.npz"),
                state, source, key)

    drain()
    save_checkpoint(os.path.join(out_dir, "ckpt_final.npz"),
                    (state.params, state.aux, state.step))
    save_train_checkpoint(os.path.join(out_dir, "ckpt_full_final.npz"),
                          state, source, key)
    return state


def _autosize_budget(cfg, state, source, scene, logger):
    """Probe a few views and right-size the static instance budget —
    every budget-sized index op (binning sort/fill/layout, the expand
    VJP) scales with it, so an oversize default directly costs step
    time. num_instances is the true total even if the probe overflows."""
    from ..scene.scene_graph import render_scene

    probe = jax.jit(lambda p, a, cam, f, i: render_scene(
        p, a, cfg.scene, cam, f, i,
        jnp.asarray(10 ** 9)).raster.binning.num_instances)
    frames = sorted({0, scene.num_frames // 2, scene.num_frames - 1})
    need = 0
    for f in frames:
        for c in range(min(scene.num_cams, 2)):
            b = source.scene_batch(f, c)
            need = max(need, int(probe(state.params, state.aux, b.camera,
                                       b.frame_idx, b.img_idx)))
    new_budget = max(-(-int(need * 1.3) // 65536) * 65536, 1 << 17)
    if new_budget != cfg.scene.budget:
        logger.info("auto budget: measured %d instances -> budget %d "
                    "(was %d)", need, new_budget, cfg.scene.budget)
        cfg = dataclasses.replace(cfg, scene=dataclasses.replace(
            cfg.scene, budget=new_budget))
    return cfg
