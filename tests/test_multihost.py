"""Multi-PROCESS (simulated multi-host) bring-up: two jax.distributed
processes over localhost Gloo, each owning 2 virtual CPU devices, run the
real sharded train step on a ("data" across hosts, "gauss" within host)
pod mesh with each host feeding only its own cameras — the per-host
identical-program SPMD contract of a TPU pod (SURVEY.md §5.8).
"""
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_pod_training(tmp_path):
    outs = [str(tmp_path / f"proc{i}.json") for i in range(2)]
    port = "12417"
    procs = [
        subprocess.Popen(
            [sys.executable,
             os.path.join(REPO, "tests", "multihost_worker.py"),
             port, str(i), outs[i]],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    logs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    res = [json.load(open(o)) for o in outs]
    for r in res:
        assert r["process_count"] == 2
        assert r["device_count"] == 4
    # each host fed a disjoint camera slice
    assert res[0]["local_cams"] != res[1]["local_cams"]
    assert sorted(res[0]["local_cams"] + res[1]["local_cams"]) == [0, 1]
    # the replicated loss agrees bit-for-bit across processes
    np.testing.assert_array_equal(res[0]["losses"], res[1]["losses"])
    losses = res[0]["losses"]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]          # training moves downhill
