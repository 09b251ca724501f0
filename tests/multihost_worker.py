"""Worker process for tests/test_multihost.py: one simulated 'host' of a
2-process jax.distributed cluster (Gloo over localhost — the same
per-host identical-program SPMD contract as a TPU pod, SURVEY.md §5.8).

Each process owns 2 virtual CPU devices; the pod mesh is
("data" across processes, "gauss" within a host). Feeds only its own
cameras (local_camera_indices), forms global arrays, and runs the real
sharded train step for a few iterations.

Usage: python multihost_worker.py <port> <pid> <out_json>
"""
import importlib.util
import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
# must be set BEFORE importing jax: jax.distributed.initialize probes the
# platform, and the sitecustomize-registered remote-TPU plugin would be
# contacted (and can hang) if only jax.config is flipped afterwards
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")


def main():
    port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from emd_tpu.core import look_at
    from emd_tpu.dist import (ShardedBatch, init_multihost,
                              local_camera_indices, make_pod_mesh,
                              make_sharded_train_step)
    from emd_tpu.train import TrainConfig
    from emd_tpu.train.optim import AdamState, adam_init

    init_multihost(f"localhost:{port}", 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4

    mesh = make_pod_mesh(n_gauss_per_host=2)
    n_data = mesh.shape["data"]

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    params, alive = mod._toy_gaussians(256, sh_bases=4)

    width = height = 64
    Ks = np.tile(np.array([[60.0, 0, 32.0], [0, 60.0, 32.0],
                           [0, 0, 1.0]], np.float32), (n_data, 1, 1))
    vms = np.stack([
        np.asarray(look_at((0.3 * i, 0.0, 0.0), (0.0, 0.0, 6.0),
                           up=(0.0, -1.0, 0.0)))
        for i in range(n_data)])
    targets = np.full((n_data, height, width, 3), 0.5, np.float32)

    # this host feeds ONLY its own cameras; the global batch is assembled
    # across processes (DCN boundary on a real pod)
    local = local_camera_indices(n_data)
    local_batch = ShardedBatch(K=Ks[local], viewmat=vms[local],
                               rgb=targets[local])
    batch = jax.tree.map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, P("data")), local_batch)

    gsh = NamedSharding(mesh, P("gauss"))

    def to_global(x):
        return jax.make_array_from_process_local_data(gsh, np.asarray(x))

    params_g = jax.tree.map(to_global, params)
    alive_g = to_global(np.asarray(alive))
    opt0 = adam_init(params)
    opt = AdamState(
        mu=jax.tree.map(to_global, opt0.mu),
        nu=jax.tree.map(to_global, opt0.nu),
        # the step counter is a replicated scalar
        step=jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), np.asarray(opt0.step)))

    cfg = TrainConfig(budget=1 << 14, interpret=True)
    step = make_sharded_train_step(mesh, cfg, width, height,
                                   interpret=True)

    losses = []
    state = (opt, alive_g)
    for i in range(3):
        params_g, state, loss = step(params_g, state, batch,
                                     jnp.asarray(i))
        losses.append(float(loss))

    with open(out_path, "w") as f:
        json.dump({"pid": pid, "process_count": jax.process_count(),
                   "device_count": jax.device_count(),
                   "local_cams": [int(i) for i in local],
                   "losses": losses}, f)


if __name__ == "__main__":
    main()
