"""Stage map of the S3 fine-stage train step at the bench point
(1080p/500k default; --n to override) — isolates deformation-field forward/backward, hexplane
features, SH eval, rasterize, and the full step, chained-on-device.

Run (chip): PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/profile_s3_step.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from emd_tpu.utils.compile_cache import enable as _enable_cache


def chain_time(f, x, iters=6, name=""):
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
    from bench import _street_gaussians
    from emd_tpu.core import make_camera
    from emd_tpu.core.quat import quat_normalize
    from emd_tpu.motion import S3FieldConfig, create_s3_field, set_aabb
    from emd_tpu.motion.hexplane import hexplane_features
    from emd_tpu.motion.s3field import apply_s3_field
    from emd_tpu.scene import SkyCubemap
    from emd_tpu.train import S3Batch, S3Params, S3TrainConfig
    from emd_tpu.train.s3_trainer import (create_s3_train_state, render_s3,
                                          s3_train_step)

    width, height = 1920, 1080
    n = 500_000
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    gauss, alive = _street_gaussians(n)
    fcfg = S3FieldConfig(sh_bases=16, n_cams=3, feat_head=False)
    field = create_s3_field(jax.random.PRNGKey(0), fcfg)
    field = field._replace(hexplane=set_aabb(
        field.hexplane, [-40, -15, 0], [40, 15, 90]))
    params = S3Params(
        gauss=gauss,
        embeddings=jnp.zeros((n, fcfg.gaussian_embedding_dim)),
        field=field, sky=SkyCubemap.create(128))
    cfg = S3TrainConfig(field=fcfg, budget=14 << 16)
    cam = make_camera(1500.0, 1500.0, width / 2, height / 2, jnp.eye(4),
                      width, height)
    t = jnp.asarray(0.4)
    cam_no = jnp.asarray(0)
    stepno = jnp.asarray(10_000)
    shs_raw = jnp.concatenate([gauss.sh_dc[:, None, :], gauss.sh_rest], 1)

    chain_time(lambda m: hexplane_features(
        params.field.hexplane, m, jnp.full((n,), 0.4)), gauss.means,
        name="hexplane features fwd")
    chain_time(jax.grad(lambda m: jnp.sum(hexplane_features(
        params.field.hexplane, m, jnp.full((n,), 0.4)))), gauss.means,
        name="hexplane features fwd+bwd (d/d pts)")

    def field_full(m):
        d = apply_s3_field(params.field, fcfg, m, gauss.log_scales,
                           quat_normalize(gauss.quats),
                           gauss.logit_opacities, shs_raw,
                           params.embeddings, t, cam_no, stepno)
        return d.means, d.scales_delta, d.quats, d.opacity_delta, d.shs_delta

    chain_time(field_full, gauss.means, name="apply_s3_field fwd")
    chain_time(jax.grad(lambda m: sum(jnp.sum(o) for o in field_full(m))),
               gauss.means, name="apply_s3_field fwd+bwd (d/d pts)")

    def render_full(m):
        p = params._replace(gauss=gauss._replace(means=m))
        rgb, out, deform = render_s3(p, alive, cfg, cam, t, cam_no,
                                     stepno, True)
        return rgb

    chain_time(render_full, gauss.means, name="render_s3 fine fwd")
    chain_time(jax.grad(lambda m: jnp.sum(render_full(m) ** 2)),
               gauss.means, name="render_s3 fine fwd+bwd (d/d pts)")

    state = create_s3_train_state(params, alive)
    key = jax.random.PRNGKey(7)
    batch = S3Batch(
        camera=cam, rgb=jax.random.uniform(key, (height, width, 3)),
        t=t, cam_no=cam_no,
        depth=1.0 + 60.0 * jax.random.uniform(key, (height, width)),
        sky_mask=(jax.random.uniform(key, (height, width)) > 0.7
                  ).astype(jnp.float32))
    s = state
    for w in range(4):
        t0 = time.time()
        s, m = s3_train_step(s, batch, cfg, 60.0, True)
        _ = float(m["loss"])
        if time.time() - t0 < 5.0:
            break
    t0 = time.time()
    for _ in range(6):
        s, m = s3_train_step(s, batch, cfg, 60.0, True)
    _ = float(m["loss"])
    print(f"{'full s3_train_step':52s} "
          f"{(time.time() - t0) / 6 * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
