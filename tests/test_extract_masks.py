"""SegFormer mask-extraction hook (tools/extract_masks.py): the
checkpoint-schema-compatible MiT + MLP-head model loads an
mmseg/NVlabs-named state dict, dims are inferred from the checkpoint,
and the end-to-end tool writes sky/human/vehicle/dynamic masks a scene
dir's loader consumes. Key names pinned against the released
`segformer.b5.1024x1024.city.160k.pth` layout (NVlabs SegFormer
mix_transformer.py + segformer_head.py naming)."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tools")

# a sample of the released checkpoint's keys (backbone.* / decode_head.*)
EXPECTED_KEYS = [
    "backbone.patch_embed1.proj.weight",
    "backbone.patch_embed1.norm.bias",
    "backbone.patch_embed4.proj.weight",
    "backbone.block1.0.norm1.weight",
    "backbone.block1.0.attn.q.weight",
    "backbone.block1.0.attn.kv.weight",
    "backbone.block1.0.attn.proj.bias",
    "backbone.block1.0.attn.sr.weight",
    "backbone.block1.0.attn.norm.weight",
    "backbone.block1.0.mlp.fc1.weight",
    "backbone.block1.0.mlp.dwconv.dwconv.weight",
    "backbone.block1.0.mlp.fc2.bias",
    "backbone.block4.0.norm2.weight",
    "backbone.norm1.weight",
    "backbone.norm4.bias",
    "decode_head.linear_c1.proj.weight",
    "decode_head.linear_c4.proj.bias",
    "decode_head.linear_fuse.conv.weight",
    "decode_head.linear_fuse.bn.running_mean",
    "decode_head.linear_pred.weight",
    "decode_head.linear_pred.bias",
]

TINY = dict(dims=(8, 16, 20, 32), depths=(1, 1, 2, 1),
            mlp_ratios=(4, 4, 4, 4), dec_dim=16, num_classes=19)


def _tiny_model():
    from extract_masks import build_segformer
    return build_segformer(**TINY)


def test_schema_keys_and_forward():
    import torch

    model = _tiny_model()
    keys = set(model.state_dict().keys())
    for k in EXPECTED_KEYS:
        assert k in keys, k
    # stage 4 has sr_ratio 1: no spatial-reduction conv there
    assert "backbone.block4.0.attn.sr.weight" not in keys
    model.eval()
    x = torch.rand(1, 3, 64, 96)
    with torch.no_grad():
        out = model(x)
    assert out.shape == (1, 19, 64, 96)
    assert torch.isfinite(out).all()


def test_load_infers_dims_from_checkpoint(tmp_path):
    import torch
    from extract_masks import load_segformer

    model = _tiny_model()
    sd = model.state_dict()
    # released checkpoints wrap in {'state_dict': ...} and may carry the
    # unused BaseDecodeHead conv_seg — both must be tolerated
    sd["decode_head.conv_seg.weight"] = torch.zeros(19, 16, 1, 1)
    sd["decode_head.conv_seg.bias"] = torch.zeros(19)
    path = tmp_path / "ckpt.pth"
    torch.save({"state_dict": sd, "meta": {}}, path)
    m2 = load_segformer(str(path))
    for (k, a), (k2, b) in zip(model.state_dict().items(),
                               m2.state_dict().items()):
        assert k == k2
        assert torch.equal(a, b)


def test_extract_scene_end_to_end(tmp_path):
    import cv2
    import torch
    from extract_masks import extract_scene

    model = _tiny_model()
    path = tmp_path / "ckpt.pth"
    torch.save(model.state_dict(), path)

    scene = tmp_path / "scene"
    (scene / "images").mkdir(parents=True)
    (scene / "human_masks").mkdir()
    rng = np.random.RandomState(0)
    for f in range(2):
        for c in range(2):
            cv2.imwrite(str(scene / "images" / f"{f:03d}_{c}.jpg"),
                        rng.randint(0, 255, (48, 64, 3), np.uint8))
            # a rough box mask to be intersected
            rough = np.zeros((48, 64), np.uint8)
            rough[10:30, 20:50] = 255
            cv2.imwrite(str(scene / "human_masks" / f"{f:03d}_{c}.png"),
                        rough)
    n = extract_scene(str(scene), str(path), process_dynamic_mask=True)
    assert n == 4
    sky = cv2.imread(str(scene / "sky_masks" / "000_0.png"), 0)
    assert sky is not None and sky.shape == (48, 64)
    hum = cv2.imread(str(scene / "human_masks" / "001_1.png"), 0)
    assert hum is not None
    # refined human mask stays inside the rough box
    assert not (hum[:10].any() or hum[:, :20].any())
    dyn = cv2.imread(str(scene / "dynamic_masks" / "000_0.png"), 0)
    assert dyn is not None
    # downscale path produces the full-res map too
    n = extract_scene(str(scene), str(path), downscale=2)
    assert n == 4
