"""DINO feature extraction with a weights-file hook: a tiny synthetic
ViT checkpoint drives the architecture-from-state-dict rebuild, the
robust PCA, the features/ directory contract, and the S3Batch.feat
plumbing."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")


def tiny_vit_sd(dim=64, patch=8, depth=2, layerscale=True):
    import torch
    g = torch.Generator().manual_seed(0)

    def r(*shape, s=0.05):
        return s * torch.randn(*shape, generator=g)

    sd = {
        "cls_token": r(1, 1, dim),
        "pos_embed": r(1, 1 + 16, dim),       # 4x4 grid at train time
        "patch_embed.proj.weight": r(dim, 3, patch, patch),
        "patch_embed.proj.bias": r(dim),
        "norm.weight": torch.ones(dim), "norm.bias": torch.zeros(dim),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        sd |= {
            f"{p}.norm1.weight": torch.ones(dim),
            f"{p}.norm1.bias": torch.zeros(dim),
            f"{p}.attn.qkv.weight": r(3 * dim, dim),
            f"{p}.attn.qkv.bias": r(3 * dim),
            f"{p}.attn.proj.weight": r(dim, dim),
            f"{p}.attn.proj.bias": r(dim),
            f"{p}.norm2.weight": torch.ones(dim),
            f"{p}.norm2.bias": torch.zeros(dim),
            f"{p}.mlp.fc1.weight": r(4 * dim, dim),
            f"{p}.mlp.fc1.bias": r(4 * dim),
            f"{p}.mlp.fc2.weight": r(dim, 4 * dim),
            f"{p}.mlp.fc2.bias": r(dim),
        }
        if layerscale:
            sd |= {f"{p}.ls1.gamma": torch.ones(dim),
                   f"{p}.ls2.gamma": torch.ones(dim)}
    return sd


def test_minimal_vit_and_pca(tmp_path):
    import torch
    from extract_features import MinimalViT, load_state_dict, robust_pca3

    path = str(tmp_path / "vit.pth")
    torch.save(tiny_vit_sd(), path)
    vit = MinimalViT(load_state_dict(path))
    assert (vit.dim, vit.patch, vit.depth, vit.ls) == (64, 8, 2, True)
    img = np.random.RandomState(0).rand(40, 56, 3).astype(np.float32)
    toks = vit.forward(img)
    assert toks.shape == (5, 7, 64)
    assert np.isfinite(toks).all()
    # deterministic
    np.testing.assert_array_equal(toks, vit.forward(img))
    # translation sensitivity: different image -> different tokens
    toks2 = vit.forward(img[:, ::-1].copy())
    assert np.abs(toks - toks2).max() > 1e-4
    outs = robust_pca3([toks, toks2])
    assert outs[0].shape == (5, 7, 3)
    assert 0.0 <= float(outs[0].min()) and float(outs[0].max()) <= 1.0
    # nested checkpoint format (DINO v1 "teacher" with backbone prefix)
    torch.save({"teacher": {f"backbone.{k}": v
                            for k, v in tiny_vit_sd().items()}}, path)
    assert MinimalViT(load_state_dict(path)).dim == 64


def test_features_dir_flows_into_s3_batch(tmp_path):
    from emd_tpu.data import make_synthetic_scene
    from emd_tpu.data.batches import BatchSource
    from emd_tpu.data.scene_data import load_scene
    from emd_tpu.data.synthetic import write_scene_dir

    scene, _ = make_synthetic_scene(n_frames=3, n_cams=1, width=32,
                                    height=24, n_lidar=200)
    d = str(tmp_path / "scene")
    write_scene_dir(scene, d)
    os.makedirs(os.path.join(d, "features"))
    for f in range(3):
        np.save(os.path.join(d, "features", f"{f:03d}_0.npy"),
                np.random.RandomState(f).rand(6, 8, 3).astype(np.float16))
    scene2 = load_scene(d)
    assert scene2.features is not None
    assert scene2.features[1][0].shape == (6, 8, 3)
    src = BatchSource(scene2, test_stride=0)
    b = src.s3_batch(1, 0)
    assert b.feat is not None and b.feat.shape == (24, 32, 3)
    assert bool(np.isfinite(np.asarray(b.feat)).all())
