"""Stage map of the FULL scene-graph train step at the bench_train_step
point (1080p, 500k bg + 30k rigid + 10k SMPL): isolates the ~127 ms the
round-3 VERDICT flagged between the flat-soup forward and the scene-graph
forward (motion transforms / SH-16 / sky / corrections / loss suite /
Adam / densify stats). Chained-on-device timing, one host fetch per stage.

Run (chip): PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/profile_scene_step.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from emd_tpu.utils.compile_cache import enable as _enable_cache


def chain_time(f, x, iters=8, name=""):
    def step(x):
        out = f(x)
        leaves = [l for l in jax.tree_util.tree_leaves(out)
                  if hasattr(l, "dtype")]
        s = sum(jnp.sum(jnp.ravel(l)[:1].astype(jnp.float32))
                for l in leaves)
        return x + (s * 0.0).astype(x.dtype)

    g = jax.jit(step)
    y = g(x)
    _ = float(jnp.sum(jnp.ravel(y)[:1]))
    t0 = time.time()
    for _ in range(iters):
        y = g(y)
    _ = float(jnp.sum(jnp.ravel(y)[:1]))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    _enable_cache()
    from bench_train_step import build
    from emd_tpu.core import make_camera
    from emd_tpu.core.sh import eval_sh
    from emd_tpu.core.camera import camera_rays
    from emd_tpu.motion.rigid import rigid_world_gaussians
    from emd_tpu.motion.smpl import smpl_world_gaussians
    from emd_tpu.raster.rasterize import rasterize
    from emd_tpu.scene import SceneConfig
    from emd_tpu.scene.scene_graph import collect_gaussians, render_scene
    from emd_tpu.scene.sky import composite_sky, sample_cubemap
    from emd_tpu.scene.correction import affine_matrix, apply_affine
    from emd_tpu.train import losses
    from emd_tpu.train.scene_trainer import (SceneBatch, SceneTrainConfig,
                                             create_scene_train_state,
                                             scene_lr_tree,
                                             scene_loss_terms,
                                             scene_train_step)
    from emd_tpu.train.optim import adam_update
    from emd_tpu.train.densify import accumulate_stats

    width, height = 1920, 1080
    params, aux = build()
    cfg = SceneTrainConfig(scene=SceneConfig(budget=21 << 16))
    state = create_scene_train_state(params, aux)
    params = state.params
    cam = make_camera(1500.0, 1500.0, width / 2, height / 2, jnp.eye(4),
                      width, height)
    key = jax.random.PRNGKey(7)
    batch = SceneBatch(
        camera=cam,
        rgb=jax.random.uniform(key, (height, width, 3)),
        frame_idx=jnp.asarray(3), img_idx=jnp.asarray(6),
        depth=1.0 + 60.0 * jax.random.uniform(key, (height, width)),
        sky_mask=jax.random.uniform(key, (height, width)) > 0.7,
        dynamic_mask=jax.random.uniform(key, (height, width)) > 0.9)
    frame = batch.frame_idx
    step_no = jnp.asarray(1000)

    # ---- collect (motion + SH + concat) --------------------------------
    def collect(p):
        return collect_gaussians(p, aux, cfg.scene, frame, step_no,
                                 cam.position)
    chain_time(lambda m: collect(params._replace(
        background=params.background._replace(means=m))),
        params.background.means, name="collect fwd (motion+SH+concat)")
    chain_time(lambda m: jax.grad(lambda mm: sum(
        jnp.sum(o[:8] ** 2) for o in collect(params._replace(
            background=params.background._replace(means=mm)))))(m),
        params.background.means, name="collect fwd+bwd")

    # pieces
    bg = params.background
    shs = jnp.concatenate([bg.sh_dc[:, None, :], bg.sh_rest], axis=1)
    dirs = bg.means / jnp.maximum(
        jnp.linalg.norm(bg.means, axis=-1, keepdims=True), 1e-8)
    chain_time(lambda d: eval_sh(shs, d, 3), dirs,
               name="  bg SH-16 eval fwd (500k)")
    chain_time(lambda d: jax.grad(
        lambda dd: jnp.sum(eval_sh(shs, dd, 3)[:8] ** 2))(d), dirs,
        name="  bg SH-16 eval fwd+bwd")
    rp = params.rigid
    chain_time(lambda m: rigid_world_gaussians(
        rp._replace(gauss=rp.gauss._replace(means=m)), aux.rigid_aux,
        aux.rigid_alive, frame, step_no, cfg.scene.rigid, False),
        rp.gauss.means, name="  rigid motion fwd (30k)")
    sp = params.smpl
    chain_time(lambda m: smpl_world_gaussians(
        sp._replace(rigid=sp.rigid._replace(
            gauss=sp.rigid.gauss._replace(means=m))), aux.smpl_aux,
        aux.smpl_alive, frame, step_no),
        sp.rigid.gauss.means, name="  smpl motion fwd (10k)")

    # ---- rasterize on a fixed soup -------------------------------------
    soup = jax.jit(collect)(params)
    means, quats, scales, opac, colors = soup

    def rast(m):
        out = rasterize(m, quats, scales, opac, colors, cam,
                        budget=cfg.scene.budget)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha)
    chain_time(rast, means, name="rasterize fwd (soup fixed)")
    chain_time(lambda m: jax.value_and_grad(rast)(m)[1], means,
               name="rasterize fwd+bwd")

    # ---- sky + affine ---------------------------------------------------
    img = jax.random.uniform(key, (height, width, 3))
    alpha = jax.random.uniform(key, (height, width))

    from emd_tpu.scene.sky import sky_pixels

    def sky_fwd(i):
        # the path the trainer takes: coarse-grid sample + bilinear
        # upsample (sky_pixels auto factor)
        srgb = sky_pixels(params.sky, cam)
        return composite_sky(i, alpha, srgb)
    chain_time(sky_fwd, img, name="sky fwd (coarse sky_pixels, as trained)")
    chain_time(lambda i: jax.grad(
        lambda ii: jnp.sum(sky_fwd(ii)[:2] ** 2))(i), img,
        name="sky fwd+bwd (coarse)")

    def sky_exact(i):
        # reference point: the exact per-pixel gather (factor=1)
        _, vd = camera_rays(cam)
        srgb = sample_cubemap(params.sky, vd)
        return composite_sky(i, alpha, srgb)
    chain_time(sky_exact, img, name="sky fwd (exact per-pixel, unused)")

    def aff(i):
        mat = affine_matrix(params.affine, batch.img_idx, False)
        return apply_affine(i, mat)
    chain_time(aff, img, name="affine fwd")

    # ---- loss terms on fixed images -------------------------------------
    depth_img = 1.0 + 60.0 * jax.random.uniform(key, (height, width))

    def t(fn, name):
        chain_time(lambda i: jax.grad(fn)(i), img, name=name)
    t(lambda i: losses.l1(i, batch.rgb), "loss rgb l1 fwd+bwd")
    t(lambda i: losses.ssim_loss(i, batch.rgb), "loss ssim fwd+bwd")
    t(lambda i: losses.sky_opacity_loss(i[..., 0], batch.sky_mask),
      "loss sky bce fwd+bwd")
    t(lambda i: losses.depth_loss(
        depth_img * i[..., 0], batch.depth, batch.depth > 0, inverse=True),
      "loss depth fwd+bwd")
    t(lambda i: losses.opacity_entropy(i[..., 0]),
      "loss entropy fwd+bwd")
    t(lambda i: losses.inverse_depth_smoothness(depth_img * i[..., 0], i),
      "loss smooth fwd+bwd")

    # regs (params-side)
    def regs(p):
        class FakeOut:
            pass
        ld = {}
        # call scene_loss_terms minus image losses by passing zero images?
        # cheaper: reg-only subset mirrors scene_loss_terms param terms
        from emd_tpu.motion.rigid import temporal_smoothness_reg
        ld["rigid_temporal"] = temporal_smoothness_reg(p.rigid,
                                                       aux.rigid_aux)
        from emd_tpu.motion.smpl import (joint_smoothness_reg,
                                         x_offset_reg)
        ld["smpl_joint"] = joint_smoothness_reg(p.smpl)
        ld["smpl_x"] = x_offset_reg(p.smpl, aux.smpl_aux, aux.smpl_alive)
        ld["sharp"] = losses.scale_reg(
            jnp.exp(p.background.log_scales), aux.bg_alive, 10.0)
        return sum(ld.values())
    chain_time(lambda m: jax.grad(lambda mm: regs(params._replace(
        background=params.background._replace(log_scales=mm))))(m),
        params.background.log_scales, name="param regs fwd+bwd (subset)")

    # ---- optimizer + stats ----------------------------------------------
    lrs = scene_lr_tree(params, cfg, step_no, 60.0)
    zero_g = jax.tree.map(jnp.zeros_like, params)
    chain_time(lambda m: adam_update(
        jax.tree.map(jnp.zeros_like, params), state.opt,
        params._replace(background=params.background._replace(means=m)),
        lrs), params.background.means, name="adam update")
    gm2d = jnp.zeros((means.shape[0], 2), jnp.float32)
    radii = jnp.ones((means.shape[0],), jnp.float32) * 3.0
    cb = params.background.capacity
    chain_time(lambda g: accumulate_stats(
        state.dstate["background"], g[:cb], radii[:cb], width, height),
        gm2d, name="densify stats (bg)")

    # ---- full composites -------------------------------------------------
    def rfull(p):
        out = render_scene(p, aux, cfg.scene, cam, frame, batch.img_idx,
                           step_no)
        return jnp.sum(out.rgb[:4] ** 2)
    chain_time(lambda m: rfull(params._replace(
        background=params.background._replace(means=m))),
        params.background.means, name="render_scene fwd")

    def loss_full(p):
        out = render_scene(p, aux, cfg.scene, cam, frame, batch.img_idx,
                           step_no)
        ld = scene_loss_terms(out, batch, p, aux, None, step_no, cfg)
        return sum(ld.values())
    chain_time(lambda m: jax.grad(lambda mm: loss_full(params._replace(
        background=params.background._replace(means=mm))))(m),
        params.background.means, name="render+losses fwd+bwd (d/bg.means)")

    # full step for reference
    def stepf(s):
        ns, m = scene_train_step(s, batch, cfg, 60.0)
        return ns
    s2 = jax.jit(stepf)(state)
    _ = float(s2.step)
    t0 = time.time()
    s = s2
    for _ in range(6):
        s = jax.jit(stepf)(s)
    _ = float(s.step)
    print(f"{'FULL scene_train_step':52s} {(time.time()-t0)/6*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
