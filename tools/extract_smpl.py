"""4D-Humans SMPL parameter extraction with a weights-file hook.

Replaces /root/reference/OmniRe/datasets/tools/extract_smpl.py (the
PHALP tracker + HMR2 + detectron stack, plus tools/humanpose_process.py
and tools/postprocess.py match_and_postprocess) with a tracking-free
equivalent: the reference runs a detector+tracker only to ASSOCIATE
predicted humans with the annotated GT boxes it projects into the
cameras (*_human_utils.project_human_boxes) — here association is by
construction, since the HMR2 regressor runs directly on each annotated
pedestrian's projected-box crop from the best-visibility camera
(`selected_cam_idx`, the same field the reference emits).

The HMR2 net is re-typed from the PUBLIC 4D-Humans architecture
(ViT-H/16 ViTPose backbone + SMPL transformer-decoder head) and runs on
torch CPU from a user-provided checkpoint — the zero-egress pattern of
tools/complete_depth.py / tools/extract_features.py. `--schema_only`
(or no --weights) writes rest body poses with the annotated box yaw as
global orientation: a fully valid `humanpose/smpl.pkl` that
data/scene_data._attach_smpl_poses consumes, so the downstream human
pipeline is drivable end-to-end; real weights only improve fidelity.

Output schema (what waymo_sourceloader.py:279-320 and our reader parse):
  {iid: {"valid_mask": (F,) bool,
         "selected_cam_idx": (F,) int64,
         "smpl": {"betas": (F, 10) f32,
                  "body_pose": (F, 23, 3, 3) f32,
                  "global_orient": (F, 1, 3, 3) f32 (CAMERA frame —
                   the reader applies c2w[:3,:3])}}}
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

HUMAN_CLASSES = ("pedestrian", "human", "cyclist")
CROP_H, CROP_W = 256, 192            # HMR2 / ViTPose input
ASPECT = (192, 256)                  # reference expand_bbox_shape (w, h)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# box projection + camera selection (the *_human_utils projection step)
# ---------------------------------------------------------------------------

def box_corners(pose: np.ndarray, size: np.ndarray) -> np.ndarray:
    """(8, 3) world-space corners of an annotated box."""
    sx, sy, sz = np.asarray(size, np.float64) / 2.0
    local = np.array([[x, y, z] for x in (-sx, sx) for y in (-sy, sy)
                      for z in (-sz, sz)])
    return local @ pose[:3, :3].T + pose[:3, 3]


def project_box(K: np.ndarray, c2w: np.ndarray, pose: np.ndarray,
                size: np.ndarray, width: int, height: int):
    """Project a 3D box into one camera -> (bbox xyxy, clipped area) or
    None if behind the camera / fully outside."""
    w2c = np.linalg.inv(c2w)
    pts = box_corners(pose, size) @ w2c[:3, :3].T + w2c[:3, 3]
    if (pts[:, 2] <= 0.05).any():
        return None
    uv = pts @ K.T
    uv = uv[:, :2] / uv[:, 2:3]
    x0, y0 = uv.min(axis=0)
    x1, y1 = uv.max(axis=0)
    cx0, cy0 = max(x0, 0.0), max(y0, 0.0)
    cx1, cy1 = min(x1, float(width)), min(y1, float(height))
    if cx1 <= cx0 or cy1 <= cy0:
        return None
    return (x0, y0, x1, y1), (cx1 - cx0) * (cy1 - cy0)


def expand_to_aspect(bbox, wh=ASPECT):
    """Grow the bbox symmetrically to the target w:h aspect
    (reference expand_bbox_to_aspect_ratio)."""
    x0, y0, x1, y1 = bbox
    w, h = x1 - x0, y1 - y0
    tw, th = wh
    if w * th > h * tw:          # too wide -> grow height
        nh = w * th / tw
        y0 -= (nh - h) / 2
        y1 += (nh - h) / 2
    else:
        nw = h * tw / th
        x0 -= (nw - w) / 2
        x1 += (nw - w) / 2
    return x0, y0, x1, y1


def crop_resize(img: np.ndarray, bbox, out_hw=(CROP_H, CROP_W)):
    """Bilinear crop+resize of (H, W, 3) float [0,1]; out-of-image areas
    are zero-padded (the reference's crops pad the same way)."""
    H, W = img.shape[:2]
    oh, ow = out_hw
    x0, y0, x1, y1 = bbox
    ys = np.linspace(y0, y1, oh, dtype=np.float32)
    xs = np.linspace(x0, x1, ow, dtype=np.float32)
    yi = np.clip(ys, 0, H - 1.001)
    xi = np.clip(xs, 0, W - 1.001)
    y0i = yi.astype(np.int32)
    x0i = xi.astype(np.int32)
    fy = (yi - y0i)[:, None, None]
    fx = (xi - x0i)[None, :, None]
    a = img[y0i][:, x0i]
    b = img[y0i][:, x0i + 1]
    c = img[y0i + 1][:, x0i]
    d = img[y0i + 1][:, x0i + 1]
    out = (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
           + c * fy * (1 - fx) + d * fy * fx)
    inside = ((ys >= 0) & (ys < H))[:, None] & ((xs >= 0) & (xs < W))[None]
    return np.where(inside[..., None], out, 0.0).astype(np.float32)


# ---------------------------------------------------------------------------
# HMR2 (public 4D-Humans architecture), torch CPU, user checkpoint
# ---------------------------------------------------------------------------

def rot6d_to_rotmat(x):
    """(…, 6) -> (…, 3, 3) continuous 6D rotation (Zhou et al.; the
    HMR2 head's output parameterization)."""
    import torch
    a1, a2 = x[..., :3], x[..., 3:]
    b1 = torch.nn.functional.normalize(a1, dim=-1)
    b2 = torch.nn.functional.normalize(
        a2 - (b1 * a2).sum(-1, keepdim=True) * b1, dim=-1)
    b3 = torch.cross(b1, b2, dim=-1)
    return torch.stack([b1, b2, b3], dim=-1)


def build_hmr2():
    """Re-typed HMR2: ViT-H/16 ViTPose backbone (embed 1280, depth 32,
    heads 16) + SMPL transformer-decoder head, with the public
    checkpoint's module names (backbone.* / smpl_head.*)."""
    import torch
    import torch.nn as nn

    dim, depth, heads = 1280, 32, 16

    class Mlp(nn.Module):
        def __init__(self, d, hidden):
            super().__init__()
            self.fc1 = nn.Linear(d, hidden)
            self.fc2 = nn.Linear(hidden, d)

        def forward(self, x):
            return self.fc2(torch.nn.functional.gelu(self.fc1(x)))

    class Attention(nn.Module):
        def __init__(self, d, h):
            super().__init__()
            self.num_heads = h
            self.qkv = nn.Linear(d, d * 3)
            self.proj = nn.Linear(d, d)

        def forward(self, x):
            B, N, C = x.shape
            qkv = self.qkv(x).reshape(B, N, 3, self.num_heads,
                                      C // self.num_heads)
            q, k, v = qkv.permute(2, 0, 3, 1, 4)
            x = torch.nn.functional.scaled_dot_product_attention(q, k, v)
            return self.proj(x.transpose(1, 2).reshape(B, N, C))

    class Block(nn.Module):
        def __init__(self, d, h):
            super().__init__()
            self.norm1 = nn.LayerNorm(d)
            self.attn = Attention(d, h)
            self.norm2 = nn.LayerNorm(d)
            self.mlp = Mlp(d, d * 4)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class PatchEmbed(nn.Module):
        def __init__(self):
            super().__init__()
            # ViTPose pads 2 so 256x192/16 -> (16, 12) feature grid
            self.proj = nn.Conv2d(3, dim, 16, stride=16, padding=2)

        def forward(self, x):
            x = self.proj(x)
            return x.flatten(2).transpose(1, 2), x.shape[2:]

    class ViT(nn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = PatchEmbed()
            n = (CROP_H // 16) * (CROP_W // 16 + 1)   # padded grid 16x13
            self.pos_embed = nn.Parameter(torch.zeros(1, n + 1, dim))
            self.blocks = nn.ModuleList(Block(dim, heads)
                                        for _ in range(depth))
            self.last_norm = nn.LayerNorm(dim)

        def forward(self, x):
            x, hw = self.patch_embed(x)
            # ViTPose keeps a cls slot in pos_embed but no cls token
            x = x + self.pos_embed[:, 1:x.shape[1] + 1]
            for blk in self.blocks:
                x = blk(x)
            return self.last_norm(x)               # (B, N, dim)

    class CrossAttention(nn.Module):
        def __init__(self, d, h, ctx):
            super().__init__()
            self.num_heads = h
            self.to_q = nn.Linear(d, d, bias=False)
            self.to_kv = nn.Linear(ctx, d * 2, bias=False)
            self.to_out = nn.Linear(d, d)

        def forward(self, x, ctx):
            B, N, C = x.shape
            h = self.num_heads
            q = self.to_q(x).reshape(B, N, h, C // h).transpose(1, 2)
            kv = self.to_kv(ctx).reshape(B, ctx.shape[1], 2, h, C // h)
            k, v = kv.permute(2, 0, 3, 1, 4)
            o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
            return self.to_out(o.transpose(1, 2).reshape(B, N, C))

    class DecLayer(nn.Module):
        def __init__(self, d, h, ctx):
            super().__init__()
            self.norm1 = nn.LayerNorm(d)
            self.self_attn = Attention(d, h)
            self.norm_ctx = nn.LayerNorm(d)
            self.cross_attn = CrossAttention(d, h, ctx)
            self.norm2 = nn.LayerNorm(d)
            self.mlp = Mlp(d, d)

        def forward(self, x, ctx):
            x = x + self.self_attn(self.norm1(x))
            x = x + self.cross_attn(self.norm_ctx(x), ctx)
            return x + self.mlp(self.norm2(x))

    class SmplHead(nn.Module):
        npose = 24 * 6

        def __init__(self, d=1024, layers=6, h=8):
            super().__init__()
            self.to_token = nn.Linear(1, d)
            self.layers = nn.ModuleList(DecLayer(d, h, dim)
                                        for _ in range(layers))
            self.decpose = nn.Linear(d, self.npose)
            self.decshape = nn.Linear(d, 10)
            self.deccam = nn.Linear(d, 3)
            self.register_buffer("init_body_pose",
                                 torch.zeros(1, self.npose))
            self.register_buffer("init_betas", torch.zeros(1, 10))
            self.register_buffer("init_cam", torch.zeros(1, 3))

        def forward(self, feats):
            B = feats.shape[0]
            tok = self.to_token(torch.zeros(B, 1, 1))
            for lyr in self.layers:
                tok = lyr(tok, feats)
            tok = tok[:, 0]
            pose6 = self.decpose(tok) + self.init_body_pose
            betas = self.decshape(tok) + self.init_betas
            cam = self.deccam(tok) + self.init_cam
            rots = rot6d_to_rotmat(pose6.reshape(B, 24, 6))
            return rots[:, :1], rots[:, 1:], betas, cam

    class HMR2(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = ViT()
            self.smpl_head = SmplHead()

        def forward(self, img):
            feats = self.backbone(img)
            return self.smpl_head(feats)

    return HMR2()


def load_hmr2(weights_path: str):
    import torch
    net = build_hmr2()
    raw = torch.load(weights_path, map_location="cpu",
                     weights_only=False)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    missing, unexpected = net.load_state_dict(sd, strict=False)
    n_ok = len(sd) - len(unexpected)
    print(f"loaded {n_ok}/{len(net.state_dict())} tensors "
          f"({len(missing)} missing, {len(unexpected)} unexpected)")
    if missing:
        print("  e.g. missing:", sorted(missing)[:6])
    if unexpected:
        print("  e.g. unexpected:", sorted(unexpected)[:6])
    if len(missing) > len(net.state_dict()) // 2:
        raise SystemExit(
            "checkpoint schema mismatch — expected a 4D-Humans HMR2b "
            "checkpoint (backbone.* ViT-H + smpl_head.* decoder)")
    net.eval()
    return net


# ---------------------------------------------------------------------------
# main pipeline
# ---------------------------------------------------------------------------

def yaw_rotmat(pose: np.ndarray) -> np.ndarray:
    """Rotation of the annotated box, used as the schema-only global
    orientation (SMPL rest bodies face +z up / y forward after the
    loader's c2w composition — the box rotation is the best
    net-free estimate)."""
    return pose[:3, :3].astype(np.float32)


def extract_scene(scene, net=None, human_classes=HUMAN_CLASSES):
    """SceneData -> smpl.pkl dict (see module docstring for schema)."""
    import jax.numpy as jnp  # noqa: F401  (rotmat tools are numpy here)

    F, C = scene.images.shape[:2]
    H, W = scene.images.shape[2:4]
    out = {}
    for ann in scene.instances:
        if ann.class_name not in human_classes:
            continue
        valid = np.zeros((F,), bool)
        sel = np.zeros((F,), np.int64)
        betas = np.zeros((F, 10), np.float32)
        body = np.tile(np.eye(3, dtype=np.float32), (F, 23, 1, 1))
        orient = np.tile(np.eye(3, dtype=np.float32), (F, 1, 1, 1))
        for f in range(F):
            if not ann.frame_valid[f]:
                continue
            best = None
            for c in range(C):
                pb = project_box(scene.intrinsics[c],
                                 scene.cam_to_worlds[f, c],
                                 ann.poses[f], ann.size, W, H)
                if pb is not None and (best is None or pb[1] > best[2]):
                    best = (c, pb[0], pb[1])
            if best is None:
                continue
            c, bbox, _ = best
            valid[f] = True
            sel[f] = c
            w2c = np.linalg.inv(scene.cam_to_worlds[f, c])
            if net is None:
                # schema-only: camera-frame box rotation; the loader's
                # c2w[:3,:3] @ orient reconstructs the world box yaw
                orient[f, 0] = (w2c[:3, :3] @ yaw_rotmat(ann.poses[f])
                                ).astype(np.float32)
                continue
            import torch
            crop = crop_resize(scene.images[f, c],
                               expand_to_aspect(bbox))
            x = (crop - IMAGENET_MEAN) / IMAGENET_STD
            x = torch.from_numpy(x.transpose(2, 0, 1)[None])
            with torch.no_grad():
                go, bp, bt, _cam = net(x)
            orient[f] = go[0].numpy()
            body[f] = bp[0].numpy()
            betas[f] = bt[0].numpy()
        out[str(ann.iid)] = {
            "valid_mask": valid,
            "selected_cam_idx": sel,
            "smpl": {"betas": betas, "body_pose": body,
                     "global_orient": orient},
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene_dir", required=True,
                    help="processed scene directory (any load_scene "
                         "dialect)")
    ap.add_argument("--weights", default=None,
                    help="4D-Humans HMR2b checkpoint (.ckpt/.pt); "
                         "omit for --schema_only behavior")
    ap.add_argument("--schema_only", action="store_true",
                    help="write box-yaw rest poses without running the "
                         "net (no weights needed)")
    ap.add_argument("--out", default=None,
                    help="output pkl (default: "
                         "<scene_dir>/humanpose/smpl.pkl)")
    args = ap.parse_args()

    from emd_tpu.data.scene_data import load_scene

    scene = load_scene(args.scene_dir, load_lidar=False)
    net = None
    if args.weights and not args.schema_only:
        net = load_hmr2(args.weights)
    smpl = extract_scene(scene, net)
    out = args.out or os.path.join(args.scene_dir, "humanpose",
                                   "smpl.pkl")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "wb") as f:
        pickle.dump(smpl, f)
    n_valid = sum(int(v["valid_mask"].sum()) for v in smpl.values())
    print(f"wrote {out}: {len(smpl)} humans, {n_valid} valid "
          f"(frame, instance) pairs, net={'yes' if net else 'schema-only'}")


if __name__ == "__main__":
    main()
