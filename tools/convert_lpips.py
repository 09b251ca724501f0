#!/usr/bin/env python
"""Convert standard LPIPS checkpoints to the emd_tpu `Lpips.from_file` npz.

The calibrated LPIPS metric (S3Gaussian/lpipsPyTorch/modules/lpips.py:8)
needs two pretrained checkpoints that cannot be fetched in a zero-egress
environment. A user who has them (one scp away) runs:

    python tools/convert_lpips.py \
        --alexnet /path/to/alexnet-owt-*.pth \
        --lpips   /path/to/v0.1/alex.pth \
        --out     lpips_alex.npz

and passes `--lpips lpips_alex.npz` to tools/eval.py (or constructs
`Lpips.from_file("lpips_alex.npz")`) to get calibrated `lpips` instead of
the seeded `lpips_rand` proxy.

Input formats (key-by-key):

1. `--alexnet`: the torchvision AlexNet state dict
   (S3Gaussian/lpipsPyTorch/modules/networks.py:84 `models.alexnet(True)`,
   checkpoint `alexnet-owt-7be5be79.pth`). Conv layers live at features
   indices 0, 3, 6, 8, 10:
       features.{j}.weight : (cout, cin, kh, kw) torch OIHW
       features.{j}.bias   : (cout,)
   A features-only dump (keys `{j}.weight`) is accepted too.

2. `--lpips`: the richzhang/PerceptualSimilarity v0.1 linear-head
   checkpoint (`lpips/weights/v0.1/alex.pth`, fetched by
   lpipsPyTorch/modules/utils.py:get_state_dict). 1x1 conv per stage:
       lin{i}.model.1.weight : (1, c_i, 1, 1)
   The reference's renamed form (`{i}.1.weight`) is accepted too.

Output npz schema (consumed by emd_tpu/eval/metrics.py Lpips.from_file):
       conv{i}_w : (kh, kw, cin, cout) f32   — OIHW -> HWIO transpose
       conv{i}_b : (cout,) f32
       lin{i}    : (c_i,) f32                — squeezed 1x1 conv weight
for i in 0..4 with channel widths (64, 192, 384, 256, 256).
"""
from __future__ import annotations

import argparse

import numpy as np

ALEX_FEATURE_IDX = (0, 3, 6, 8, 10)        # conv positions in .features
ALEX_CHANNELS = (64, 192, 384, 256, 256)


def _to_numpy(t):
    if hasattr(t, "detach"):                # torch tensor
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _load_torch(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: _to_numpy(v) for k, v in obj.items()}


def convert(alexnet_sd: dict, lpips_sd: dict) -> dict:
    """Pure-dict converter (unit-testable without files)."""
    out = {}
    for i, j in enumerate(ALEX_FEATURE_IDX):
        for suffix, dst in (("weight", f"conv{i}_w"), ("bias", f"conv{i}_b")):
            for key in (f"features.{j}.{suffix}", f"{j}.{suffix}"):
                if key in alexnet_sd:
                    w = alexnet_sd[key].astype(np.float32)
                    break
            else:
                raise KeyError(
                    f"alexnet checkpoint missing features.{j}.{suffix}")
            if suffix == "weight":
                cout, cin, kh, kw = w.shape
                if cout != ALEX_CHANNELS[i]:
                    raise ValueError(
                        f"conv{i}: expected {ALEX_CHANNELS[i]} out channels,"
                        f" got {cout}")
                w = np.transpose(w, (2, 3, 1, 0))      # OIHW -> HWIO
            out[dst] = w
        for key in (f"lin{i}.model.1.weight", f"{i}.1.weight",
                    f"lin{i}.1.weight"):
            if key in lpips_sd:
                lin = lpips_sd[key].astype(np.float32)
                break
        else:
            raise KeyError(f"lpips checkpoint missing lin{i}.model.1.weight")
        lin = lin.reshape(-1)                           # (1, c, 1, 1) -> (c,)
        if lin.shape[0] != ALEX_CHANNELS[i]:
            raise ValueError(
                f"lin{i}: expected {ALEX_CHANNELS[i]} channels, got"
                f" {lin.shape[0]}")
        out[f"lin{i}"] = lin
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--alexnet", required=True,
                    help="torchvision alexnet state dict (.pth)")
    ap.add_argument("--lpips", required=True,
                    help="richzhang v0.1 linear-head checkpoint (.pth)")
    ap.add_argument("--out", required=True, help="output .npz path")
    args = ap.parse_args()
    out = convert(_load_torch(args.alexnet), _load_torch(args.lpips))
    np.savez(args.out, **out)
    print(f"wrote {args.out}: " + ", ".join(
        f"{k}{v.shape}" for k, v in sorted(out.items())))
    # sanity: loads back through the metric path
    from emd_tpu.eval.metrics import Lpips
    net = Lpips.from_file(args.out)
    print(f"Lpips.from_file OK ({len(net.convs)} stages)")


if __name__ == "__main__":
    main()
