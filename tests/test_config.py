"""YAML config system: includes, dotlist overrides, dataclass build."""
import pytest

from emd_tpu.train import S3TrainConfig, SceneTrainConfig
from emd_tpu.utils import config_from_files


def test_omnire_config_builds():
    cfg = config_from_files(SceneTrainConfig, ["configs/omnire.yaml"])
    assert cfg.w_rgb == 0.8
    assert cfg.scene.budget == 1 << 20
    assert cfg.scene.rigid.max_embeddings == 150
    assert not cfg.scene.rigid.no_apply_embed_track


def test_base_include_and_ablation():
    cfg = config_from_files(SceneTrainConfig,
                            ["configs/omnire_ablation_no_emd.yaml"])
    assert cfg.scene.rigid.no_apply_embed_track      # overridden
    assert cfg.scene.rigid.max_embeddings == 150     # inherited


def test_dotlist_override():
    cfg = config_from_files(
        SceneTrainConfig, ["configs/omnire.yaml"],
        ["lr_means=3.2e-4", "scene.budget=65536",
         "scene.rigid.min_embeddings=10"])
    assert cfg.lr_means == pytest.approx(3.2e-4)
    assert cfg.scene.budget == 65536
    assert cfg.scene.rigid.min_embeddings == 10


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        config_from_files(SceneTrainConfig, ["configs/omnire.yaml"],
                          ["scene.no_such_field=1"])


def test_s3_config_builds():
    cfg = config_from_files(S3TrainConfig, ["configs/s3.yaml"])
    assert cfg.coarse_iters == 5000
    assert cfg.field.width == 64
