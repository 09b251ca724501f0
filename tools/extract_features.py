#!/usr/bin/env python
"""DINO/DINOv2 ViT feature extraction with a weights-file hook — the
TPU-framework replacement for S3Gaussian/utils/feature_extractor.py
(ViTExtractor:110), which pulls pretrained nets off torch hub. This
environment (and many TPU pods) has no egress, so the architecture is
reconstructed FROM the checkpoint itself (torch CPU): patch size, width,
depth, heads, layerscale are all inferred from the state-dict shapes.

    python tools/extract_features.py --scene_dir /data/waymo/seg0 \
        --weights dinov2_vitb14_pretrain.pth [--cams 0 1 2] [--longest 644]

Writes features/{frame:03d}_{cam}.npy — per-patch tokens PCA-reduced to
3 channels and normalized to [0, 1] with a robust percentile clip (the
reference's get_robust_pca), ready for the S3 feat loss
(`S3Batch.feat`; load_scene picks the directory up automatically).

Checkpoint formats accepted: a raw ViT state dict (DINOv2 releases),
or one nested under "model" / "teacher" (DINO v1 releases; backbone
keys prefixed with "backbone." are stripped).
"""
from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def load_state_dict(path):
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("model", "teacher", "student", "state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(
                obj[key], dict):
            obj = obj[key]
    sd = {k.replace("backbone.", "").replace("module.", ""): v
          for k, v in obj.items()}
    if "patch_embed.proj.weight" not in sd:
        raise ValueError("not a ViT state dict (no patch_embed.proj)")
    return sd


class MinimalViT:
    """Inference-only ViT rebuilt from a state dict (torch CPU)."""

    def __init__(self, sd):
        import torch
        self.t = torch
        self.sd = {k: v.float() for k, v in sd.items()}
        w = sd["patch_embed.proj.weight"]
        self.dim = w.shape[0]
        self.patch = w.shape[2]
        self.depth = 1 + max(int(k.split(".")[1]) for k in sd
                             if k.startswith("blocks."))
        # heads: infer from qkv width (standard head_dim 64)
        self.heads = self.dim // 64
        self.ls = "blocks.0.ls1.gamma" in sd          # DINOv2 layerscale
        # DINOv2 stores register tokens separately; ignored if present
        self.n_reg = sd["register_tokens"].shape[1] \
            if "register_tokens" in sd else 0

    def _ln(self, x, prefix):
        t = self.t
        return t.nn.functional.layer_norm(
            x, (self.dim,), self.sd[f"{prefix}.weight"],
            self.sd[f"{prefix}.bias"])

    def _interp_pos(self, hp, wp):
        t = self.t
        pos = self.sd["pos_embed"]                    # (1, 1+N, D)
        cls_pos, grid = pos[:, :1], pos[:, 1:]
        n = grid.shape[1]
        side = int(math.sqrt(n))
        grid = grid.reshape(1, side, side, self.dim).permute(0, 3, 1, 2)
        grid = t.nn.functional.interpolate(
            grid, size=(hp, wp), mode="bicubic", align_corners=False)
        grid = grid.permute(0, 2, 3, 1).reshape(1, hp * wp, self.dim)
        return t.cat([cls_pos, grid], dim=1)

    def forward(self, img):
        """img: (H, W, 3) float [0,1] -> patch tokens (H/p, W/p, D)."""
        t = self.t
        sd = self.sd
        mean = t.tensor([0.485, 0.456, 0.406])
        std = t.tensor([0.229, 0.224, 0.225])
        x = (t.from_numpy(img).float() - mean) / std
        x = x.permute(2, 0, 1)[None]                  # (1, 3, H, W)
        x = t.nn.functional.conv2d(
            x, sd["patch_embed.proj.weight"], sd["patch_embed.proj.bias"],
            stride=self.patch)
        _, _, hp, wp = x.shape
        x = x.flatten(2).transpose(1, 2)              # (1, N, D)
        cls = sd["cls_token"].expand(1, -1, -1)
        x = t.cat([cls, x], dim=1) + self._interp_pos(hp, wp)
        if self.n_reg:
            x = t.cat([x[:, :1], sd["register_tokens"].float(),
                       x[:, 1:]], dim=1)
        nh = self.heads
        hd = self.dim // nh
        for i in range(self.depth):
            p = f"blocks.{i}"
            h = self._ln(x, f"{p}.norm1")
            qkv = h @ sd[f"{p}.attn.qkv.weight"].T \
                + sd[f"{p}.attn.qkv.bias"]
            q, k, v = qkv.reshape(1, -1, 3, nh, hd).permute(
                2, 0, 3, 1, 4)
            att = t.nn.functional.scaled_dot_product_attention(q, k, v)
            att = att.transpose(1, 2).reshape(1, -1, self.dim)
            att = att @ sd[f"{p}.attn.proj.weight"].T \
                + sd[f"{p}.attn.proj.bias"]
            if self.ls:
                att = att * sd[f"{p}.ls1.gamma"]
            x = x + att
            h = self._ln(x, f"{p}.norm2")
            h = t.nn.functional.gelu(h @ sd[f"{p}.mlp.fc1.weight"].T
                                     + sd[f"{p}.mlp.fc1.bias"])
            h = h @ sd[f"{p}.mlp.fc2.weight"].T + sd[f"{p}.mlp.fc2.bias"]
            if self.ls:
                h = h * sd[f"{p}.ls2.gamma"]
            x = x + h
        x = self._ln(x, "norm")
        toks = x[0, 1 + self.n_reg:]                  # patch tokens
        return toks.reshape(hp, wp, self.dim).numpy()


def robust_pca3(maps, q=2.5):
    """Fit a 3-component PCA on all patch tokens, project, normalize to
    [0,1] with a percentile clip (the reference's get_robust_pca,
    utils/image_utils.py)."""
    flat = np.concatenate([m.reshape(-1, m.shape[-1]) for m in maps])
    sub = flat[np.random.RandomState(0).choice(
        flat.shape[0], min(50_000, flat.shape[0]), replace=False)]
    mu = sub.mean(0)
    _, _, vt = np.linalg.svd(sub - mu, full_matrices=False)
    basis = vt[:3]
    lo = hi = None
    outs = []
    for m in maps:
        p = (m.reshape(-1, m.shape[-1]) - mu) @ basis.T
        outs.append(p.reshape(m.shape[:-1] + (3,)))
    allp = np.concatenate([o.reshape(-1, 3) for o in outs])
    lo = np.percentile(allp, q, axis=0)
    hi = np.percentile(allp, 100 - q, axis=0)
    return [np.clip((o - lo) / np.maximum(hi - lo, 1e-6), 0, 1)
            .astype(np.float16) for o in outs]


def main():
    import imageio.v2 as imageio

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene_dir", required=True)
    ap.add_argument("--weights", required=True,
                    help="DINO/DINOv2 ViT checkpoint (.pth)")
    ap.add_argument("--cams", type=int, nargs="*", default=None)
    ap.add_argument("--longest", type=int, default=644,
                    help="resize so the longest side is this (a multiple "
                         "of the patch size)")
    args = ap.parse_args()

    vit = MinimalViT(load_state_dict(args.weights))
    print(f"ViT: dim {vit.dim}, patch {vit.patch}, depth {vit.depth}, "
          f"heads {vit.heads}, layerscale {vit.ls}")
    img_dir = os.path.join(args.scene_dir, "images")
    names = sorted(os.listdir(img_dir))
    out_dir = os.path.join(args.scene_dir, "features")
    os.makedirs(out_dir, exist_ok=True)
    maps, keys = [], []
    for n in names:
        stem = os.path.splitext(n)[0]
        cam = int(stem.split("_")[1])
        if args.cams is not None and cam not in args.cams:
            continue
        img = imageio.imread(os.path.join(img_dir, n)).astype(
            np.float32) / 255.0
        h, w = img.shape[:2]
        scale = args.longest / max(h, w)
        nh = int(round(h * scale / vit.patch)) * vit.patch
        nw = int(round(w * scale / vit.patch)) * vit.patch
        import PIL.Image
        img = np.asarray(PIL.Image.fromarray(
            (img * 255).astype(np.uint8)).resize((nw, nh)),
            np.float32) / 255.0
        maps.append(vit.forward(img))
        keys.append(stem)
        print(f"  {stem}: tokens {maps[-1].shape}", flush=True)
    outs = robust_pca3(maps)
    for stem, o in zip(keys, outs):
        np.save(os.path.join(out_dir, f"{stem}.npy"), o)
    print(f"wrote {len(outs)} feature maps to {out_dir}")


if __name__ == "__main__":
    main()
