#!/usr/bin/env python
"""Semantic sky/human/vehicle mask extraction with a weights-file hook —
the framework-side replacement for the reference's SegFormer pipeline
(OmniRe/datasets/tools/extract_masks.py, which drives mmseg +
`segformer.b5.1024x1024.city.160k.pth` in a dedicated conda env).

The module tree below reproduces the SegFormer checkpoint SCHEMA
key-for-key (NVlabs SegFormer mix_transformer.py + segformer_head.py,
what the released Cityscapes checkpoints store under `backbone.*` /
`decode_head.*`) — the state-dict layout IS the interface; the forward
code is written fresh. Every dimension (stage widths, depths, decoder
width, classes) is inferred from the checkpoint, so any MiT-B0..B5
variant loads. Runs on torch CPU:

    python tools/extract_masks.py --scene_dir /data/waymo/seg0 \
        --weights segformer.b5.1024x1024.city.160k.pth \
        [--process_dynamic_mask] [--downscale 2]

Writes sky_masks/{f:03d}_{c}.png (cityscapes class 10 == sky, the
reference's `np.isin(mask, [10])`), and with --process_dynamic_mask
refines the projected-box dynamic masks into per-pixel human_masks/ +
vehicle_masks/ + dynamic_masks/ by intersecting the semantic classes
with the existing rough box masks (extract_masks.py:164-186) — the
`fine_dynamic_masks` the OmniRe loaders prefer.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np

# cityscapes trainIds (reference extract_masks.py:35-46)
SKY_CLASS = 10
HUMAN_CLASSES = (11, 12, 17, 18)     # person, rider, motorcycle, bicycle
VEHICLE_CLASSES = (13, 14, 15)       # car, truck, bus
IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)

NUM_HEADS = (1, 2, 5, 8)             # fixed across every MiT variant
SR_RATIOS = (8, 4, 2, 1)
STRIDES = (4, 2, 2, 2)
PATCH_KS = (7, 3, 3, 3)


def build_segformer(dims, depths, mlp_ratios, dec_dim, num_classes):
    """MiT encoder + SegFormer all-MLP decode head, named to match the
    released checkpoints (backbone.patch_embed{i}/block{i}/norm{i},
    decode_head.linear_c{i}/linear_fuse/linear_pred)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class DWConv(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.dwconv = nn.Conv2d(dim, dim, 3, 1, 1, groups=dim)

        def forward(self, x, h, w):
            b, n, c = x.shape
            x = x.transpose(1, 2).view(b, c, h, w)
            x = self.dwconv(x)
            return x.flatten(2).transpose(1, 2)

    class Mlp(nn.Module):
        def __init__(self, dim, hidden):
            super().__init__()
            self.fc1 = nn.Linear(dim, hidden)
            self.dwconv = DWConv(hidden)
            self.fc2 = nn.Linear(hidden, dim)

        def forward(self, x, h, w):
            return self.fc2(F.gelu(self.dwconv(self.fc1(x), h, w)))

    class Attention(nn.Module):
        """Efficient self-attention: keys/values from a sr_ratio-strided
        conv reduction of the token map (mix_transformer.py Attention)."""

        def __init__(self, dim, heads, sr_ratio):
            super().__init__()
            self.heads = heads
            self.scale = (dim // heads) ** -0.5
            self.sr_ratio = sr_ratio
            self.q = nn.Linear(dim, dim)
            self.kv = nn.Linear(dim, dim * 2)
            self.proj = nn.Linear(dim, dim)
            if sr_ratio > 1:
                self.sr = nn.Conv2d(dim, dim, sr_ratio, sr_ratio)
                self.norm = nn.LayerNorm(dim)

        def forward(self, x, h, w):
            b, n, c = x.shape
            hd = c // self.heads
            q = self.q(x).reshape(b, n, self.heads, hd).transpose(1, 2)
            if self.sr_ratio > 1:
                xr = x.transpose(1, 2).reshape(b, c, h, w)
                xr = self.sr(xr).reshape(b, c, -1).transpose(1, 2)
                xr = self.norm(xr)
            else:
                xr = x
            kv = self.kv(xr).reshape(b, -1, 2, self.heads, hd)
            k, v = kv.permute(2, 0, 3, 1, 4)
            attn = (q @ k.transpose(-2, -1)) * self.scale
            out = (attn.softmax(-1) @ v).transpose(1, 2).reshape(b, n, c)
            return self.proj(out)

    class Block(nn.Module):
        def __init__(self, dim, heads, mlp_ratio, sr_ratio):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim)
            self.attn = Attention(dim, heads, sr_ratio)
            self.norm2 = nn.LayerNorm(dim)
            self.mlp = Mlp(dim, int(dim * mlp_ratio))

        def forward(self, x, h, w):
            x = x + self.attn(self.norm1(x), h, w)
            return x + self.mlp(self.norm2(x), h, w)

    class OverlapPatchEmbed(nn.Module):
        def __init__(self, cin, dim, k, stride):
            super().__init__()
            self.proj = nn.Conv2d(cin, dim, k, stride, k // 2)
            self.norm = nn.LayerNorm(dim)

        def forward(self, x):
            x = self.proj(x)
            _, _, h, w = x.shape
            return self.norm(x.flatten(2).transpose(1, 2)), h, w

    class MixVisionTransformer(nn.Module):
        def __init__(self):
            super().__init__()
            cin = 3
            for i in range(4):
                setattr(self, f"patch_embed{i+1}", OverlapPatchEmbed(
                    cin, dims[i], PATCH_KS[i], STRIDES[i]))
                setattr(self, f"block{i+1}", nn.ModuleList([
                    Block(dims[i], NUM_HEADS[i], mlp_ratios[i],
                          SR_RATIOS[i]) for _ in range(depths[i])]))
                setattr(self, f"norm{i+1}", nn.LayerNorm(dims[i]))
                cin = dims[i]

        def forward(self, x):
            b = x.shape[0]
            outs = []
            for i in range(4):
                x, h, w = getattr(self, f"patch_embed{i+1}")(x)
                for blk in getattr(self, f"block{i+1}"):
                    x = blk(x, h, w)
                x = getattr(self, f"norm{i+1}")(x)
                x = x.reshape(b, h, w, -1).permute(0, 3, 1, 2)
                outs.append(x)
            return outs

    class MLPProj(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.proj = nn.Linear(dim, dec_dim)

        def forward(self, x):
            b, c, h, w = x.shape
            x = self.proj(x.flatten(2).transpose(1, 2))
            return x.transpose(1, 2).reshape(b, dec_dim, h, w)

    class ConvModule(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, 1, bias=False)
            self.bn = nn.BatchNorm2d(cout)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    class SegFormerHead(nn.Module):
        def __init__(self):
            super().__init__()
            self.linear_c1 = MLPProj(dims[0])
            self.linear_c2 = MLPProj(dims[1])
            self.linear_c3 = MLPProj(dims[2])
            self.linear_c4 = MLPProj(dims[3])
            self.linear_fuse = ConvModule(4 * dec_dim, dec_dim)
            self.linear_pred = nn.Conv2d(dec_dim, num_classes, 1)

        def forward(self, feats):
            c1, c2, c3, c4 = feats
            size = c1.shape[2:]
            ups = []
            for proj, c in ((self.linear_c4, c4), (self.linear_c3, c3),
                            (self.linear_c2, c2), (self.linear_c1, c1)):
                x = proj(c)
                if x.shape[2:] != size:
                    x = F.interpolate(x, size=size, mode="bilinear",
                                      align_corners=False)
                ups.append(x)
            x = self.linear_fuse(torch.cat(ups, 1))
            return self.linear_pred(x)

    class SegFormer(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = MixVisionTransformer()
            self.decode_head = SegFormerHead()

        def forward(self, x):
            logits = self.decode_head(self.backbone(x))
            return F.interpolate(logits, size=x.shape[2:],
                                 mode="bilinear", align_corners=False)

    return SegFormer()


def load_segformer(weights: str):
    """Build the model whose dims the checkpoint implies, then load it
    strictly (minus mmseg's unused BaseDecodeHead.conv_seg)."""
    import torch

    sd = torch.load(weights, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    for k in list(sd):
        if k.startswith("decode_head.conv_seg") or k.startswith(
                "auxiliary_head"):
            sd.pop(k)
    dims = tuple(sd[f"backbone.patch_embed{i+1}.proj.weight"].shape[0]
                 for i in range(4))
    depths = []
    for i in range(4):
        j = 0
        while f"backbone.block{i+1}.{j}.norm1.weight" in sd:
            j += 1
        depths.append(j)
    mlp_ratios = tuple(
        sd[f"backbone.block{i+1}.0.mlp.fc1.weight"].shape[0] // dims[i]
        for i in range(4))
    dec_dim = sd["decode_head.linear_c1.proj.weight"].shape[0]
    num_classes = sd["decode_head.linear_pred.weight"].shape[0]
    model = build_segformer(dims, tuple(depths), mlp_ratios, dec_dim,
                            num_classes)
    model.load_state_dict(sd)
    model.eval()
    return model


def segment_image(model, img: np.ndarray, downscale: int = 1
                  ) -> np.ndarray:
    """(H, W, 3) float [0,1] -> (H, W) uint8 class map. Pads to /32 for
    the stride chain; optional downscale trades accuracy for speed on
    CPU (predictions are upsampled back)."""
    import torch
    import torch.nn.functional as F

    h, w = img.shape[:2]
    x = (img * 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    x = torch.from_numpy(x.transpose(2, 0, 1)[None]).float()
    if downscale > 1:
        x = F.interpolate(x, scale_factor=1.0 / downscale,
                          mode="bilinear", align_corners=False)
    ph, pw = (-x.shape[2]) % 32, (-x.shape[3]) % 32
    xin = F.pad(x, (0, pw, 0, ph))
    with torch.no_grad():
        logits = model(xin)[:, :, :x.shape[2], :x.shape[3]]
        if downscale > 1:
            logits = F.interpolate(logits, size=(h, w), mode="bilinear",
                                   align_corners=False)
    return logits[0].argmax(0).numpy().astype(np.uint8)


def extract_scene(scene_dir: str, weights: str,
                  process_dynamic_mask: bool = False,
                  downscale: int = 1) -> int:
    import cv2

    model = load_segformer(weights)
    img_dir = os.path.join(scene_dir, "images")
    files = sorted(os.listdir(img_dir))
    os.makedirs(os.path.join(scene_dir, "sky_masks"), exist_ok=True)
    if process_dynamic_mask:
        for sub in ("human_masks", "vehicle_masks", "dynamic_masks"):
            os.makedirs(os.path.join(scene_dir, sub), exist_ok=True)
    n = 0
    for fname in files:
        base = os.path.splitext(fname)[0]
        img = cv2.cvtColor(cv2.imread(os.path.join(img_dir, fname)),
                           cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        seg = segment_image(model, img, downscale)
        cv2.imwrite(os.path.join(scene_dir, "sky_masks", f"{base}.png"),
                    (seg == SKY_CLASS).astype(np.uint8) * 255)
        if process_dynamic_mask:
            human = np.isin(seg, HUMAN_CLASSES)
            vehicle = np.isin(seg, VEHICLE_CLASSES)
            # refine by the rough projected-box masks when present
            # (reference extract_masks.py:164-186)
            for name, sem in (("human_masks", human),
                              ("vehicle_masks", vehicle)):
                rough_p = os.path.join(scene_dir, name, f"{base}.png")
                if os.path.exists(rough_p):
                    rough = cv2.imread(rough_p, 0) > 0
                    sem = np.logical_and(sem, rough)
                cv2.imwrite(os.path.join(scene_dir, name,
                                         f"{base}.png"),
                            sem.astype(np.uint8) * 255)
                if name == "human_masks":
                    human = sem
                else:
                    vehicle = sem
            cv2.imwrite(
                os.path.join(scene_dir, "dynamic_masks", f"{base}.png"),
                np.logical_or(human, vehicle).astype(np.uint8) * 255)
        n += 1
    return n


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene_dir", required=True)
    ap.add_argument("--weights", required=True,
                    help="SegFormer cityscapes checkpoint "
                         "(segformer.b5.1024x1024.city.160k.pth)")
    ap.add_argument("--process_dynamic_mask", action="store_true")
    ap.add_argument("--downscale", type=int, default=1)
    args = ap.parse_args()
    n = extract_scene(args.scene_dir, args.weights,
                      args.process_dynamic_mask, args.downscale)
    print(f"wrote masks for {n} images")


if __name__ == "__main__":
    main()
