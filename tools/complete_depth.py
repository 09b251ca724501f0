#!/usr/bin/env python
"""Lidar depth completion with a weights-file hook — the framework-side
replacement for the reference's vendored Sparse-Depth-Completion
submodule (S3Gaussian/submodules/Sparse-Depth-Completion, the ERFNet
"uncertainty_net" used offline to densify Waymo sparse depth; wired via
inference_dynamic.sh and consumed through the dense-depth override of
the S3 reader, dataset_readers.py:613-698 / emd_tpu/data/depth.py).

The module tree below reproduces the uncertainty_net checkpoint SCHEMA
key-for-key (Models/model.py:13 + Models/ERFNet.py — the state-dict
layout IS the interface; any loader of their released checkpoint must
match it), re-typed from the architecture description with our own
forward code. Run on torch CPU:

    python tools/complete_depth.py --scene_dir /data/waymo/seg0 \
        --weights mod_prec.pth.tar [--rgb]

Reads lidar/{f}.bin + images/, writes dense_depth/{f:03d}_{c}.npy
(H, W) float32 meters, which sparse_depth_maps(load_dense=True) in
emd_tpu.data.depth picks up (the reference's dense-depth override).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def build_model(in_channels: int):
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class DownsamplerBlock(nn.Module):
        def __init__(self, nin, nout):
            super().__init__()
            self.conv = nn.Conv2d(nin, nout - nin, 3, stride=2, padding=1)
            self.pool = nn.MaxPool2d(2, stride=2)
            self.bn = nn.BatchNorm2d(nout, eps=1e-3)

        def forward(self, x):
            return F.relu(self.bn(torch.cat(
                [self.conv(x), self.pool(x)], 1)))

    class NonBottleneck1d(nn.Module):
        def __init__(self, ch, drop, dil):
            super().__init__()
            self.conv3x1_1 = nn.Conv2d(ch, ch, (3, 1), padding=(1, 0))
            self.conv1x3_1 = nn.Conv2d(ch, ch, (1, 3), padding=(0, 1))
            self.bn1 = nn.BatchNorm2d(ch, eps=1e-3)
            self.conv3x1_2 = nn.Conv2d(ch, ch, (3, 1), padding=(dil, 0),
                                       dilation=(dil, 1))
            self.conv1x3_2 = nn.Conv2d(ch, ch, (1, 3), padding=(0, dil),
                                       dilation=(1, dil))
            self.bn2 = nn.BatchNorm2d(ch, eps=1e-3)
            self.dropout = nn.Dropout2d(drop)

        def forward(self, x):
            y = F.relu(self.conv3x1_1(x))
            y = F.relu(self.bn1(self.conv1x3_1(y)))
            y = F.relu(self.conv3x1_2(y))
            y = self.bn2(self.conv1x3_2(y))
            return F.relu(y + x)

    class Encoder(nn.Module):
        def __init__(self, cin, num_classes):
            super().__init__()
            chans = 32 if cin > 16 else 16
            self.initial_block = DownsamplerBlock(cin, chans)
            self.layers = nn.ModuleList([DownsamplerBlock(chans, 64)])
            self.layers += [NonBottleneck1d(64, 0.03, 1) for _ in range(5)]
            self.layers.append(DownsamplerBlock(64, 128))
            for _ in range(2):
                self.layers += [NonBottleneck1d(128, 0.3, d)
                                for d in (2, 4, 8, 16)]
            self.output_conv = nn.Conv2d(128, num_classes, 1)

        def forward(self, x):
            x = self.initial_block(x)
            for layer in self.layers:
                x = layer(x)
            return x

    class UpsamplerBlock(nn.Module):
        def __init__(self, nin, nout):
            super().__init__()
            self.conv = nn.ConvTranspose2d(nin, nout, 3, stride=2,
                                           padding=1, output_padding=1)
            self.bn = nn.BatchNorm2d(nout, eps=1e-3)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    class Decoder(nn.Module):
        def __init__(self, num_classes):
            super().__init__()
            self.layer1 = UpsamplerBlock(128, 64)
            self.layer2 = NonBottleneck1d(64, 0, 1)
            self.layer3 = NonBottleneck1d(64, 0, 1)
            self.layer4 = UpsamplerBlock(64, 32)
            self.layer5 = NonBottleneck1d(32, 0, 1)
            self.layer6 = NonBottleneck1d(32, 0, 1)
            self.output_conv = nn.ConvTranspose2d(32, num_classes, 2,
                                                  stride=2)

        def forward(self, x):
            x = self.layer3(self.layer2(self.layer1(x)))
            em2 = x
            x = self.layer6(self.layer5(self.layer4(x)))
            em1 = x
            return self.output_conv(x), em1, em2

    class Net(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.encoder = Encoder(cin, cout)
            self.decoder = Decoder(cout)

        def forward(self, x):
            return self.decoder(self.encoder(x))

    def convbn(cin, cout, stride, dil=1):
        return nn.Sequential(nn.Conv2d(
            cin, cout, 3, stride=stride, padding=dil, dilation=dil,
            bias=False))

    class Hourglass1(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv1 = nn.Sequential(convbn(c, c, 2), nn.ReLU(True))
            self.conv2 = convbn(c, c, 1)
            self.conv3 = nn.Sequential(convbn(2 * c, 2 * c, 2),
                                       nn.ReLU(True))
            self.conv4 = nn.Sequential(convbn(2 * c, 2 * c, 1))
            self.conv5 = nn.Sequential(
                nn.ConvTranspose2d(4 * c, 2 * c, 3, stride=2, padding=1,
                                   output_padding=1, bias=False),
                nn.BatchNorm2d(2 * c), nn.ReLU(True))
            self.conv6 = nn.Sequential(
                nn.ConvTranspose2d(2 * c, c, 3, stride=2, padding=1,
                                   output_padding=1, bias=False),
                nn.BatchNorm2d(c))

        def forward(self, x, em1, em2):
            x = F.relu(self.conv2(self.conv1(x)))
            x = torch.cat((x, em1), 1)
            xp = F.relu(self.conv4(self.conv3(x)))
            xp = torch.cat((xp, em2), 1)
            return self.conv6(self.conv5(xp)), x, xp

    class Hourglass2(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv1 = nn.Sequential(convbn(c, 2 * c, 2),
                                       nn.BatchNorm2d(2 * c),
                                       nn.ReLU(True))
            self.conv2 = convbn(2 * c, 2 * c, 1)
            self.conv3 = nn.Sequential(convbn(2 * c, 2 * c, 2),
                                       nn.BatchNorm2d(2 * c),
                                       nn.ReLU(True))
            self.conv4 = nn.Sequential(convbn(2 * c, 4 * c, 1))
            self.conv5 = nn.Sequential(
                nn.ConvTranspose2d(4 * c, 2 * c, 3, stride=2, padding=1,
                                   output_padding=1, bias=False),
                nn.BatchNorm2d(2 * c), nn.ReLU(True))
            self.conv6 = nn.Sequential(
                nn.ConvTranspose2d(2 * c, c, 3, stride=2, padding=1,
                                   output_padding=1, bias=False),
                nn.BatchNorm2d(c))

        def forward(self, x, em1, em2):
            x = F.relu(self.conv2(self.conv1(x)) + em1)
            xp = F.relu(self.conv4(self.conv3(x)) + em2)
            return self.conv6(self.conv5(xp))

    class UncertaintyNet(nn.Module):
        """Checkpoint-schema-compatible uncertainty_net
        (Models/model.py:13): global ERFNet branch predicting
        (guidance, depth, confidence), a local hourglass branch over
        (lidar, guidance), and confidence-weighted late fusion."""

        def __init__(self, cin):
            super().__init__()
            self.in_channels = cin
            self.depthnet = Net(cin, 3)
            self.convbnrelu = nn.Sequential(convbn(2, 32, 1),
                                            nn.ReLU(True))
            self.hourglass1 = Hourglass1(32)
            self.hourglass2 = Hourglass2(32)
            self.fuse = nn.Sequential(
                convbn(32, 32, 1), nn.ReLU(True),
                nn.Conv2d(32, 2, 3, padding=1))

        def forward(self, x):
            lidar_in = x[:, 0:1]
            em0, em1, em2 = self.depthnet(x)
            guide, precise, conf = (em0[:, 0:1], em0[:, 1:2], em0[:, 2:])
            y = self.convbnrelu(torch.cat((lidar_in, guide), 1))
            y1, e3, e4 = self.hourglass1(y, em1, em2)
            y1 = y1 + y
            y2 = self.hourglass2(y1, e3, e4) + y
            out = self.fuse(y2)
            local_depth, local_conf = torch.chunk(out, 2, dim=1)
            w = torch.softmax(torch.cat((local_conf, conf), 1), dim=1)
            return w[:, 1:2] * precise + w[:, 0:1] * local_depth

    return UncertaintyNet(in_channels)


def complete_scene(scene_dir: str, weights: str, use_rgb: bool = True,
                   depth_max: float = 85.0) -> int:
    import imageio.v2 as imageio
    import torch

    from emd_tpu.data.depth import project_depth
    from emd_tpu.data.scene_data import load_scene

    sd = torch.load(weights, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    cin = sd["depthnet.encoder.initial_block.conv.weight"].shape[1]
    model = build_model(cin)
    model.load_state_dict(sd)
    model.eval()

    scene = load_scene(scene_dir)
    out_dir = os.path.join(scene_dir, "dense_depth")
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for f in range(scene.num_frames):
        for c in range(scene.num_cams):
            sparse = np.asarray(project_depth(
                scene.lidar_points[f], scene.intrinsics[c],
                scene.cam_to_worlds[f, c], scene.images.shape[3],
                scene.images.shape[2]))
            chans = [sparse[None] / depth_max]
            if cin > 1:
                rgb = scene.images[f, c].transpose(2, 0, 1)
                chans.append(rgb[:cin - 1])
            x = torch.from_numpy(np.concatenate(chans)[None]).float()
            # pad to /16 for the three downsampling stages
            h, w = x.shape[2:]
            ph, pw = (-h) % 16, (-w) % 16
            x = torch.nn.functional.pad(x, (0, pw, 0, ph))
            with torch.no_grad():
                dense = model(x)[0, 0, :h, :w].numpy() * depth_max
            np.save(os.path.join(out_dir, f"{f:03d}_{c}.npy"),
                    dense.astype(np.float32))
            n += 1
    return n


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene_dir", required=True)
    ap.add_argument("--weights", required=True,
                    help="Sparse-Depth-Completion uncertainty_net "
                         "checkpoint (mod_prec.pth.tar)")
    ap.add_argument("--depth_max", type=float, default=85.0)
    args = ap.parse_args()
    n = complete_scene(args.scene_dir, args.weights,
                       depth_max=args.depth_max)
    print(f"wrote {n} completed depth maps")


if __name__ == "__main__":
    main()
