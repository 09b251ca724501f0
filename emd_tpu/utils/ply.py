"""PLY export/import of gaussian point clouds.

Re-creation of OmniRe utils/misc.py:26-97 (export_points_to_ply / 3DGS
attribute export) and S3Gaussian gaussian_model.py save_ply/load_ply
(:241-255, 281-425 — including the EMD per-gaussian embedding attributes),
using the standard 3DGS attribute naming so external viewers open the
files: x y z nx ny nz f_dc_0..2 f_rest_0..44 opacity scale_0..2 rot_0..3
[+ embedding_0..E].
"""
from __future__ import annotations

import numpy as np

from ..core.gaussians import GaussianParams


def _ply_header(n: int, props: list[str]) -> bytes:
    lines = ["ply", "format binary_little_endian 1.0",
             f"element vertex {n}"]
    lines += [f"property float {p}" for p in props]
    lines.append("end_header")
    return ("\n".join(lines) + "\n").encode("ascii")


def save_gaussians_ply(path: str, params: GaussianParams,
                       alive: np.ndarray,
                       embeddings: np.ndarray | None = None) -> None:
    alive = np.asarray(alive)
    means = np.asarray(params.means)[alive]
    n = means.shape[0]
    sh_rest = np.asarray(params.sh_rest)[alive]          # (n, K-1, 3)
    cols = [means,
            np.zeros((n, 3), np.float32),                # normals (unused)
            np.asarray(params.sh_dc)[alive]]
    props = ["x", "y", "z", "nx", "ny", "nz",
             "f_dc_0", "f_dc_1", "f_dc_2"]
    # 3DGS stores rest coeffs channel-major: (3, K-1) flattened
    rest_cm = sh_rest.transpose(0, 2, 1).reshape(n, -1)
    cols.append(rest_cm)
    props += [f"f_rest_{i}" for i in range(rest_cm.shape[1])]
    cols.append(np.asarray(params.logit_opacities)[alive][:, None])
    props.append("opacity")
    cols.append(np.asarray(params.log_scales)[alive])
    props += ["scale_0", "scale_1", "scale_2"]
    cols.append(np.asarray(params.quats)[alive])
    props += ["rot_0", "rot_1", "rot_2", "rot_3"]
    if embeddings is not None:
        emb = np.asarray(embeddings)[alive]
        cols.append(emb)
        props += [f"embedding_{i}" for i in range(emb.shape[1])]
    data = np.concatenate([c.astype("<f4") for c in cols], axis=1)
    with open(path, "wb") as f:
        f.write(_ply_header(n, props))
        f.write(data.tobytes())


def load_gaussians_ply(path: str):
    """Returns dict of attribute arrays (means, sh_dc, sh_rest, opacity
    logits, log_scales, quats, embeddings?)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        n = int(next(h for h in header if h.startswith("element vertex")
                     ).split()[-1])
        props = [h.split()[-1] for h in header
                 if h.startswith("property float")]
        data = np.frombuffer(f.read(), dtype="<f4").reshape(n, len(props))
    col = {p: data[:, i] for i, p in enumerate(props)}
    n_rest = sum(1 for p in props if p.startswith("f_rest_"))
    k_rest = n_rest // 3
    rest = np.stack([col[f"f_rest_{i}"] for i in range(n_rest)], axis=1)
    rest = rest.reshape(n, 3, k_rest).transpose(0, 2, 1)
    n_emb = sum(1 for p in props if p.startswith("embedding_"))
    out = dict(
        means=np.stack([col["x"], col["y"], col["z"]], 1),
        sh_dc=np.stack([col["f_dc_0"], col["f_dc_1"], col["f_dc_2"]], 1),
        sh_rest=rest,
        logit_opacities=col["opacity"],
        log_scales=np.stack([col[f"scale_{i}"] for i in range(3)], 1),
        quats=np.stack([col[f"rot_{i}"] for i in range(4)], 1),
    )
    if n_emb:
        out["embeddings"] = np.stack(
            [col[f"embedding_{i}"] for i in range(n_emb)], 1)
    return out
