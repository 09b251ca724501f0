"""Utils: checkpoint roundtrip, PLY roundtrip, logging."""
import numpy as np
import jax
import jax.numpy as jnp

from emd_tpu.core import random_quats
from emd_tpu.scene import empty_params
from emd_tpu.utils import (
    MetricLogger,
    load_checkpoint,
    load_gaussians_ply,
    save_checkpoint,
    save_gaussians_ply,
)


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(5.0), "b": (jnp.ones((2, 3)),
                                        jnp.zeros((4,), jnp.int32))}
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, tree)
    restored = load_checkpoint(p, tree)
    np.testing.assert_allclose(restored["a"], tree["a"])
    np.testing.assert_allclose(restored["b"][0], tree["b"][0])
    assert restored["b"][1].dtype == np.int32


def test_ply_roundtrip(tmp_path):
    n = 20
    key = jax.random.PRNGKey(0)
    p = empty_params(n, sh_bases=16)._replace(
        means=jax.random.normal(key, (n, 3)),
        quats=random_quats(key, n),
        sh_dc=jax.random.normal(jax.random.PRNGKey(1), (n, 3)),
        sh_rest=0.1 * jax.random.normal(jax.random.PRNGKey(2), (n, 15, 3)),
        logit_opacities=jax.random.normal(jax.random.PRNGKey(3), (n,)))
    emb = np.random.RandomState(0).randn(n, 4).astype(np.float32)
    alive = np.ones(n, bool)
    alive[5] = False
    path = str(tmp_path / "g.ply")
    save_gaussians_ply(path, p, alive, emb)
    out = load_gaussians_ply(path)
    assert out["means"].shape == (19, 3)
    np.testing.assert_allclose(out["means"], np.asarray(p.means)[alive],
                               atol=1e-6)
    np.testing.assert_allclose(out["sh_rest"],
                               np.asarray(p.sh_rest)[alive], atol=1e-6)
    np.testing.assert_allclose(out["embeddings"], emb[alive], atol=1e-6)


def test_metric_logger(tmp_path):
    ml = MetricLogger(str(tmp_path))
    for i in range(5):
        ml.update(loss=1.0 / (i + 1), psnr=20 + i)
    ml.dump(5)
    line = ml.line(5, 100)
    assert "psnr" in line and "eta" in line
    assert (tmp_path / "metrics.jsonl").exists()


def test_backup_and_import_object(tmp_path):
    from emd_tpu.utils.backup import backup_run, import_object
    import json, os, zipfile

    backup_run(str(tmp_path), config={"steps": 5, "flavor": "scene"})
    b = tmp_path / "backup"
    assert (b / "config.json").exists()
    assert json.loads((b / "config.json").read_text())["steps"] == 5
    git = json.loads((b / "git_state.json").read_text())
    assert len(git["commit"]) == 40
    with zipfile.ZipFile(b / "code.zip") as z:
        names = z.namelist()
    assert any(n.endswith("raster/binning.py") for n in names)
    assert any(n.endswith("native/knn.cpp") for n in names)

    # import_str-style registry (misc.py import_str)
    fn = import_object("emd_tpu.train.losses:l1")
    import emd_tpu.train.losses as L
    assert fn is L.l1
    cls = import_object("emd_tpu.scene.sky.SkyCubemap")
    from emd_tpu.scene.sky import SkyCubemap
    assert cls is SkyCubemap
