"""Evaluation metrics: PSNR / SSIM (+ masked variants) and LPIPS.

The reference protocol (OmniRe/models/video_utils.py:72-82; S3
utils/video_utils.py:101-107): full-image PSNR/SSIM/LPIPS plus
occupied (non-sky), dynamic-, human-, and vehicle-masked PSNR/SSIM.

LPIPS: the standard AlexNet-backbone LPIPS (S3 vendors it at
lpipsPyTorch/) needs pretrained torchvision weights, which cannot be
fetched in a zero-egress environment. `Lpips.from_file` loads real weights
(npz) when the user provides them; `Lpips.random_features(seed)` builds the
same architecture with fixed seeded filters — a deterministic perceptual
proxy (reported as `lpips_rand` to avoid confusion with the calibrated
metric).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..train.losses import psnr as _psnr
from ..train.losses import ssim as _ssim


def psnr(pred, gt, mask=None) -> jax.Array:
    if mask is None:
        return _psnr(pred, gt)
    # reference skips the metric entirely on an empty mask
    # (OmniRe/models/video_utils.py:250,268); callers must guard, but an
    # all-false mask here yields NaN rather than a silent 120 dB
    m = jnp.broadcast_to(mask[..., None], pred.shape)
    n = jnp.sum(m)
    mse = jnp.sum(((pred - gt) ** 2) * m) / jnp.maximum(n, 1.0)
    val = -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
    return jnp.where(n > 0, val, jnp.nan)


def ssim(pred, gt, mask=None) -> jax.Array:
    # masked SSIM: the reference computes the full per-pixel SSIM map
    # (skimage structural_similarity full=True) and takes the mask-indexed
    # mean (OmniRe/models/video_utils.py:256-263)
    if mask is None:
        return _ssim_map(pred, gt).mean()
    full = _ssim_map(pred, gt)
    m = jnp.broadcast_to(mask[..., None], full.shape)
    n = jnp.sum(m)
    val = jnp.sum(full * m) / jnp.maximum(n, 1.0)
    return jnp.where(n > 0, val, jnp.nan)


def _ssim_map(pred, gt, window=11, sigma=1.5, c1=0.01 ** 2, c2=0.03 ** 2):
    """Per-pixel SSIM map with skimage-consistent moments.

    Moments use REFLECT padding so every window is one normalized
    non-negative weighting of real samples (scipy.ndimage filter
    semantics, which skimage's structural_similarity builds on). That
    makes blur(x^2) - mu^2 a true weighted variance (>= 0 up to fp
    rounding, clamped), and Cauchy-Schwarz then bounds every map value
    in [-1, 1] — zero padding broke both properties at the borders and
    produced out-of-range masked means.
    """
    from ..train.losses import _gaussian_window

    w = _gaussian_window(window, sigma)

    def blur(img):
        def conv1d(x, axis):
            pad = [(0, 0)] * x.ndim
            pad[axis] = (window // 2, window // 2)
            xp = jnp.pad(x, pad, mode="reflect")
            return jnp.apply_along_axis(
                lambda v: jnp.convolve(v, w, mode="valid"), axis, xp)
        return conv1d(conv1d(img, 0), 1)

    mu_p, mu_g = blur(pred), blur(gt)
    sp = jnp.maximum(blur(pred * pred) - mu_p ** 2, 0.0)
    sg = jnp.maximum(blur(gt * gt) - mu_g ** 2, 0.0)
    spg = blur(pred * gt) - mu_p * mu_g
    # fp rounding can leave |spg| marginally above sqrt(sp*sg); clamp so
    # the Cauchy-Schwarz bound (and with it |SSIM| <= 1) is exact
    lim = jnp.sqrt(sp * sg)
    spg = jnp.clip(spg, -lim, lim)
    return ((2 * mu_p * mu_g + c1) * (2 * spg + c2)
            / ((mu_p ** 2 + mu_g ** 2 + c1) * (sp + sg + c2)))


# ---------------------------------------------------------------------------
# LPIPS (AlexNet-style backbone)
# ---------------------------------------------------------------------------

_ALEX_CFG = [  # (out_ch, kernel, stride, pad) per conv stage
    (64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
    (256, 3, 1, 1), (256, 3, 1, 1)]
# numpy, not jnp: no XLA-backend init at import time (pod bring-up)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class Lpips(NamedTuple):
    convs: tuple          # per stage (w (kh,kw,cin,cout), b (cout,))
    lins: tuple           # per stage 1x1 weights (cout,)
    pools: tuple          # maxpool flags per stage
    calibrated: bool = False   # True when loaded from real pretrained
    #                            weights (reported as `lpips`, not
    #                            `lpips_rand`)

    @staticmethod
    def random_features(seed: int = 0) -> "Lpips":
        """Fixed seeded random filters — deterministic perceptual proxy."""
        key = jax.random.PRNGKey(seed)
        convs, lins, pools = [], [], []
        cin = 3
        for i, (cout, k, s, p) in enumerate(_ALEX_CFG):
            key, k1, k2 = jax.random.split(key, 3)
            std = (2.0 / (k * k * cin)) ** 0.5
            convs.append((std * jax.random.normal(k1, (k, k, cin, cout)),
                          jnp.zeros((cout,))))
            lins.append(jnp.abs(jax.random.normal(k2, (cout,))) / cout)
            pools.append(i in (0, 1))
            cin = cout
        return Lpips(convs=tuple(convs), lins=tuple(lins),
                     pools=tuple(pools))

    @staticmethod
    def from_file(path: str) -> "Lpips":
        """Load real AlexNet+LPIPS weights from an npz with keys
        conv{i}_w (kh,kw,cin,cout), conv{i}_b, lin{i} (cout,) — produced
        from the standard torchvision/richzhang checkpoints by
        tools/convert_lpips.py."""
        import numpy as np
        data = np.load(path)
        convs, lins, pools = [], [], []
        for i in range(5):
            convs.append((jnp.asarray(data[f"conv{i}_w"]),
                          jnp.asarray(data[f"conv{i}_b"])))
            lins.append(jnp.asarray(data[f"lin{i}"]))
            pools.append(i in (0, 1))
        return Lpips(convs=tuple(convs), lins=tuple(lins),
                     pools=tuple(pools), calibrated=True)


def _norm_input(img):
    # [0,1] -> lpips normalization ((2x-1) - shift)/scale
    x = 2.0 * img - 1.0
    return (x - _SHIFT) / _SCALE


def lpips_distance(net: Lpips, a: jax.Array, b: jax.Array) -> jax.Array:
    """a, b: (H, W, 3) in [0,1]."""
    xa = _norm_input(a)[None]
    xb = _norm_input(b)[None]
    total = 0.0
    for i, ((w, bias), lin, pool) in enumerate(
            zip(net.convs, net.lins, net.pools)):
        stride = _ALEX_CFG[i][2]
        pad = _ALEX_CFG[i][3]
        dn = jax.lax.conv_dimension_numbers(xa.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        def conv(x):
            return jax.lax.conv_general_dilated(
                x, w, (stride, stride), [(pad, pad), (pad, pad)],
                dimension_numbers=dn) + bias
        xa = jax.nn.relu(conv(xa))
        xb = jax.nn.relu(conv(xb))
        fa = xa / jnp.maximum(
            jnp.linalg.norm(xa, axis=-1, keepdims=True), 1e-8)
        fb = xb / jnp.maximum(
            jnp.linalg.norm(xb, axis=-1, keepdims=True), 1e-8)
        diff = (fa - fb) ** 2
        total = total + jnp.mean(jnp.sum(diff * lin, axis=-1))
        if pool:
            xa = jax.lax.reduce_window(
                xa, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                "VALID")
            xb = jax.lax.reduce_window(
                xb, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
                "VALID")
    return total


def metric_suite(pred, gt, sky_mask=None, dynamic_mask=None,
                 human_mask=None, vehicle_mask=None,
                 lpips_net: Lpips | None = None) -> dict[str, float]:
    """The reference's full metric table for one image."""
    out = {
        "psnr": float(psnr(pred, gt)),
        "ssim": float(ssim(pred, gt)),
    }
    if sky_mask is not None:
        occ = ~sky_mask
        if bool(jnp.any(occ)):
            out["occupied_psnr"] = float(psnr(pred, gt, occ))
            out["occupied_ssim"] = float(ssim(pred, gt, occ))
    for name, m in (("dynamic", dynamic_mask), ("human", human_mask),
                    ("vehicle", vehicle_mask)):
        if m is not None and bool(jnp.any(m)):
            out[f"{name}_psnr"] = float(psnr(pred, gt, m))
            out[f"{name}_ssim"] = float(ssim(pred, gt, m))
    if lpips_net is not None:
        key = "lpips" if lpips_net.calibrated else "lpips_rand"
        out[key] = float(lpips_distance(lpips_net, pred, gt))
    return out
