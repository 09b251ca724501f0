"""Checkpoint/resume completeness: a resumed run must be BIT-IDENTICAL to
an uninterrupted one (reference: OmniRe resume_from_checkpoint
base.py:688-698 + tools/train.py:128-135; S3 capture()/restore() including
optimizer state, gaussian_model.py:74-118 — this loop additionally
restores densify stats, the error-buffer sampler, and the loop RNG)."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from emd_tpu.data import make_synthetic_scene
from emd_tpu.scene import SceneConfig
from emd_tpu.train import LoopConfig, SceneTrainConfig, fit_scene


def _loop(max_steps, ckpt_interval=100):
    return LoopConfig(max_steps=max_steps, refine_start=2,
                      refine_interval=3, refine_stop=100,
                      reset_opacity_interval=5, knn_refresh_interval=2,
                      log_interval=100, eval_interval=10_000,
                      ckpt_interval=ckpt_interval, test_stride=5, seed=3)


def test_resume_bit_identical():
    scene, _ = make_synthetic_scene(n_frames=4, n_cams=1, width=48,
                                    height=32, n_lidar=600, seed=0)
    cfg = SceneTrainConfig(scene=SceneConfig(budget=1 << 13,
                                             interpret=True))

    with tempfile.TemporaryDirectory() as d1, \
            tempfile.TemporaryDirectory() as d2, \
            tempfile.TemporaryDirectory() as d3:
        # uninterrupted 8-step run, mid-run full ckpt at step 4
        # (same max_steps in both runs: the LR decay horizon depends on it)
        full = fit_scene(scene, d1, cfg, _loop(8, ckpt_interval=4))

        ckpt = os.path.join(d1, "ckpt_000004.npz")
        assert os.path.exists(ckpt)
        resumed = fit_scene(scene, d3, cfg, _loop(8, ckpt_interval=4),
                            resume=ckpt)

        assert int(resumed.step) == int(full.step)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(full.params)[0],
                jax.tree_util.tree_flatten_with_path(resumed.params)[0]):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"resumed diverged at {jax.tree_util.keystr(pa)}")
        # optimizer moments too
        for a, b in zip(jax.tree_util.tree_leaves(full.opt),
                        jax.tree_util.tree_leaves(resumed.opt)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # alive masks
        np.testing.assert_array_equal(np.asarray(full.aux.bg_alive),
                                      np.asarray(resumed.aux.bg_alive))


def test_full_ckpt_loads_for_eval():
    """tools/eval.py loads (params, aux, step) out of a full-state
    checkpoint by dict template with extra keys ignored."""
    from emd_tpu.utils import load_checkpoint

    scene, _ = make_synthetic_scene(n_frames=3, n_cams=1, width=48,
                                    height=32, n_lidar=400, seed=0)
    cfg = SceneTrainConfig(scene=SceneConfig(budget=1 << 13,
                                             interpret=True))
    with tempfile.TemporaryDirectory() as d:
        state = fit_scene(scene, d, cfg, _loop(2))
        path = os.path.join(d, "ckpt_full_final.npz")
        data = np.load(path)
        assert any(k.startswith("['params']") for k in data.files)
        d2 = load_checkpoint(path, dict(params=state.params, aux=state.aux,
                                        step=jnp.zeros((), jnp.int32)))
        np.testing.assert_array_equal(
            np.asarray(d2["params"].background.means),
            np.asarray(state.params.background.means))


def test_resume_bit_identical_with_metric_lag():
    """Deferred metric fetch (metric_lag > 0) drains pending metrics at
    checkpoints, so resume stays bit-identical with the lag enabled."""
    import dataclasses

    scene, _ = make_synthetic_scene(n_frames=4, n_cams=1, width=48,
                                    height=32, n_lidar=600, seed=0)
    cfg = SceneTrainConfig(scene=SceneConfig(budget=1 << 13,
                                             interpret=True))
    loop = dataclasses.replace(_loop(8, ckpt_interval=4), metric_lag=2)

    with tempfile.TemporaryDirectory() as d1, \
            tempfile.TemporaryDirectory() as d3:
        full = fit_scene(scene, d1, cfg, loop)
        ckpt = os.path.join(d1, "ckpt_000004.npz")
        resumed = fit_scene(scene, d3, cfg, loop, resume=ckpt)
        for a, b in zip(jax.tree_util.tree_leaves(full.params),
                        jax.tree_util.tree_leaves(resumed.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
