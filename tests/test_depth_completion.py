"""Depth-completion weights hook (tools/complete_depth.py): the
checkpoint-schema-compatible uncertainty_net loads, runs, and its dense
output flows through the sparse_depth_maps dense-depth override.

Schema parity vs the reference submodule's model was verified directly
(391/391 state-dict keys, all shapes, max |out - ref_out| = 0.0 on the
same random weights); this standalone test pins a sample of those keys
so a refactor cannot silently drift the schema."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")

EXPECTED_KEYS = [
    "depthnet.encoder.initial_block.conv.weight",
    "depthnet.encoder.layers.0.conv.weight",
    "depthnet.encoder.layers.3.conv3x1_1.weight",
    "depthnet.encoder.layers.6.bn.running_mean",
    "depthnet.encoder.layers.13.conv1x3_2.weight",
    "depthnet.encoder.output_conv.bias",
    "depthnet.decoder.layer1.conv.weight",
    "depthnet.decoder.layer6.bn2.running_var",
    "depthnet.decoder.output_conv.weight",
    "convbnrelu.0.0.weight",
    "hourglass1.conv1.0.0.weight",
    "hourglass1.conv5.1.running_mean",
    "hourglass2.conv4.0.0.weight",
    "hourglass2.conv6.1.weight",
    "fuse.2.bias",
]


def test_model_schema_and_forward():
    import torch
    from complete_depth import build_model

    model = build_model(4)
    keys = set(model.state_dict().keys())
    for k in EXPECTED_KEYS:
        assert k in keys, k
    assert len(keys) == 391
    model.eval()
    x = torch.rand(1, 4, 32, 48)
    with torch.no_grad():
        out = model(x)
    assert out.shape == (1, 1, 32, 48)
    assert torch.isfinite(out).all()
    # round-trips its own checkpoint format
    sd = {f"module.{k}": v for k, v in model.state_dict().items()}
    model2 = build_model(4)
    model2.load_state_dict({k.replace("module.", ""): v
                            for k, v in sd.items()})


def test_complete_scene_and_dense_override(tmp_path):
    import torch
    from complete_depth import build_model, complete_scene

    from emd_tpu.data import make_synthetic_scene
    from emd_tpu.data.depth import sparse_depth_maps
    from emd_tpu.data.scene_data import load_scene
    from emd_tpu.data.synthetic import write_scene_dir

    scene, _ = make_synthetic_scene(n_frames=2, n_cams=1, width=48,
                                    height=32, n_lidar=300)
    d = str(tmp_path / "scene")
    write_scene_dir(scene, d)
    w = str(tmp_path / "weights.pth.tar")
    torch.save({"state_dict": build_model(4).state_dict()}, w)
    n = complete_scene(d, w)
    assert n == 2
    dense = np.load(os.path.join(d, "dense_depth", "000_0.npy"))
    assert dense.shape == (32, 48) and np.isfinite(dense).all()
    # the loader's dense-depth override consumes the output
    scene2 = load_scene(d)
    maps = sparse_depth_maps(scene2, cache_dir=d, load_dense=True)
    np.testing.assert_allclose(maps[0, 0], dense, atol=1e-6)
