"""Benchmark runner (driver contract): prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.md): pixels/s/chip, forward+backward, 1080p,
500k-gaussian street-scale scene. vs_baseline is the ratio against
25 Mpix/s — a representative published CUDA 3DGS fwd+bwd training
throughput at ~1080p on a single datacenter GPU (the reference itself
publishes no throughput numbers; BASELINE.json.published = {}).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

BASELINE_PIX_S = 25e6


def main():
    import jax
    import jax.numpy as jnp
    from emd_tpu.core import make_camera
    from emd_tpu.train import TrainConfig
    from emd_tpu.train.trainer import render_params, train_step, Batch, \
        create_train_state
    from __graft_entry__ import _toy_gaussians

    n = 500_000
    width, height = 1920, 1080
    params, alive = _toy_gaussians(n)
    cam = make_camera(1500.0, 1500.0, width / 2, height / 2, jnp.eye(4),
                      width, height)
    cfg = TrainConfig(budget=2 << 20)

    def loss_fn(params):
        out = render_params(params, alive, cam, jnp.ones((16,)), cfg)
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.alpha)

    f = jax.jit(jax.value_and_grad(loss_fn))
    v, g = f(params)   # compile
    v.block_until_ready()

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        v, g = f(params)
    jax.block_until_ready(v)
    dt = (time.time() - t0) / iters

    pix_s = width * height / dt
    print(json.dumps({
        "metric": "pixels_per_second_fwd_bwd_1080p_500k",
        "value": round(pix_s, 1),
        "unit": "pixels/s/chip",
        "vs_baseline": round(pix_s / BASELINE_PIX_S, 4),
    }))


if __name__ == "__main__":
    main()
