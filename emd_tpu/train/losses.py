"""Loss library — TPU-native re-creation of the reference loss suite:
OmniRe models/losses.py (SafeBCE:33-75, DepthLoss:91-176) +
models/trainers/base.py:518-620 (rgb/ssim/sky/depth/entropy/smoothness) and
S3Gaussian utils/loss_utils.py (ssim window conv, depth) + train.py:226-363.

All pure jnp, differentiable, fully fused by XLA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def l1(pred: jax.Array, gt: jax.Array,
       mask: jax.Array | None = None) -> jax.Array:
    err = jnp.abs(pred - gt)
    if mask is None:
        return err.mean()
    m = jnp.broadcast_to(mask[..., None] if mask.ndim == err.ndim - 1
                         else mask, err.shape)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def _gaussian_window(size: int, sigma: float) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return g / g.sum()


# SSIM blur formulation: "vmap" (default) = the vmapped 1-D convolve,
# MEASURED at 8.3 ms fwd+bwd at 1080p on chip. "band" = the separable
# blur as two dense banded matmuls (W_y @ img @ W_x^T, pure MXU; equal
# to 3.7e-9 on CPU) — plausibly faster but NOT yet chip-measured at
# 1080p, so it stays opt-in: the depthwise-conv form looked idiomatic
# too and measured 42.4 ms (3/128 MXU channel utilization).
SSIM_IMPL = __import__("os").environ.get("EMD_TPU_SSIM", "vmap")


def _band_matrix(n: int, w: jax.Array) -> jax.Array:
    """(n, n) banded blur matrix: row i holds w centered at i (zero SAME
    padding semantics — taps falling outside [0, n) are dropped)."""
    size = w.shape[0]
    idx = jnp.arange(n)
    offs = jnp.arange(size) - size // 2
    cols = idx[:, None] + offs[None, :]            # (n, size)
    valid = (cols >= 0) & (cols < n)
    band = jnp.zeros((n, n), w.dtype)
    band = band.at[idx[:, None], jnp.clip(cols, 0, n - 1)].add(
        jnp.where(valid, w[None, :], 0.0))
    return band


def ssim(pred: jax.Array, gt: jax.Array, window: int = 11,
         sigma: float = 1.5, c1: float = 0.01 ** 2,
         c2: float = 0.03 ** 2) -> jax.Array:
    """Mean SSIM over an (H, W, C) pair — same 11x1.5 separable Gaussian
    window as the references (S3 loss_utils.py:56-96, pytorch_msssim)."""
    w = _gaussian_window(window, sigma)

    if SSIM_IMPL == "band":
        h_dim = pred.shape[0]
        w_dim = pred.shape[1]
        by = _band_matrix(h_dim, w)
        bx = _band_matrix(w_dim, w)
        hp = jax.lax.Precision.HIGHEST

        def blur(img):
            squeeze = img.ndim == 2
            x = img[..., None] if squeeze else img
            y = jnp.einsum("ij,jwc->iwc", by, x, precision=hp)
            y = jnp.einsum("kw,iwc->ikc", bx, y, precision=hp)
            return y[..., 0] if squeeze else y

        mu_p = blur(pred)
        mu_g = blur(gt)
        mu_pg = mu_p * mu_g
        sigma_p = blur(pred * pred) - mu_p * mu_p
        sigma_g = blur(gt * gt) - mu_g * mu_g
        sigma_pg = blur(pred * gt) - mu_pg
        num = (2 * mu_pg + c1) * (2 * sigma_pg + c2)
        den = (mu_p ** 2 + mu_g ** 2 + c1) \
            * jnp.maximum(sigma_p + sigma_g + c2, 0.5 * c2)
        return jnp.mean(num / den)

    def blur(img):
        # separable conv, channels vmapped; SAME padding like torch conv2d
        # with padding=window//2. Deliberately NOT lax.conv_general_dilated:
        # the depthwise (feature_group_count=C) conv form measured 42.4 ms
        # fwd+bwd at 1080p on a v5e chip vs 8.3 ms for this formulation —
        # depthwise convs tile onto the MXU at 3/128 channel utilization,
        # while XLA lowers the vmapped 1-D convolve to batched dense dots.
        def conv1d(x, axis):
            pad = [(0, 0)] * x.ndim
            pad[axis] = (window // 2, window // 2)
            xp = jnp.pad(x, pad)
            return jnp.apply_along_axis(
                lambda v: jnp.convolve(v, w, mode="valid"), axis, xp)
        return conv1d(conv1d(img, 0), 1)

    mu_p = blur(pred)
    mu_g = blur(gt)
    mu_pg = mu_p * mu_g
    sigma_p = blur(pred * pred) - mu_p * mu_p
    sigma_g = blur(gt * gt) - mu_g * mu_g
    sigma_pg = blur(pred * gt) - mu_pg
    num = (2 * mu_pg + c1) * (2 * sigma_pg + c2)
    # exact arithmetic keeps den >= c1*c2 > 0 (true variances are >= 0);
    # only catastrophic cancellation in blur(x^2) - mu^2 on HDR pixels
    # can push it to <= 0, which turned one pixel into -inf and the mean
    # SSIM with it — guard with the same positive floor
    den = (mu_p ** 2 + mu_g ** 2 + c1) \
        * jnp.maximum(sigma_p + sigma_g + c2, 0.5 * c2)
    return (num / den).mean()


def ssim_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    return 1.0 - ssim(pred, gt)


def psnr(pred: jax.Array, gt: jax.Array) -> jax.Array:
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


@jax.custom_vjp
def _safe_bce_elem(pred: jax.Array, gt: jax.Array, limit: jax.Array
                   ) -> jax.Array:
    """Elementwise clipped BCE whose backward preserves a bounded *nonzero*
    gradient on clipped values — the reference's SafeBCE custom autograd
    (OmniRe models/losses.py:33-75): forward clamps each log at ln(limit);
    backward clamps pred away from the saturating end only, so supervision
    keeps acting on saturated pixels instead of going dead."""
    x = jnp.clip(pred, 0.0, 1.0)
    ln_lim = jnp.log(limit)
    return -jnp.where(gt < 0.5,
                      jnp.maximum(jnp.log1p(-x), ln_lim),
                      jnp.maximum(jnp.log(jnp.maximum(x, 0.0)), ln_lim))


def _safe_bce_fwd(pred, gt, limit):
    x = jnp.clip(pred, 0.0, 1.0)
    return _safe_bce_elem(pred, gt, limit), (x, gt, limit)


def _safe_bce_bwd(res, g):
    x, gt, limit = res
    xc = jnp.where(gt < 0.5, jnp.clip(x, 0.0, 1.0 - limit),
                   jnp.clip(x, limit, 1.0))
    grad = jnp.where(gt < 0.5, 1.0 / (1.0 - xc), -1.0 / xc)
    grad = jnp.where(x == gt, 0.0, grad)   # exact match: no gradient
    return grad * g, jnp.zeros_like(gt), jnp.zeros_like(limit)


_safe_bce_elem.defvjp(_safe_bce_fwd, _safe_bce_bwd)


def safe_bce(pred: jax.Array, gt: jax.Array, limit: float = 0.1,
             mask: jax.Array | None = None) -> jax.Array:
    e = _safe_bce_elem(pred, gt, jnp.asarray(limit, pred.dtype))
    if mask is None:
        return e.mean()
    return jnp.sum(e * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def sky_opacity_loss(alpha: jax.Array, sky_mask: jax.Array,
                     limit: float = 1e-5) -> jax.Array:
    """Push accumulated alpha to 0 on sky pixels, 1 elsewhere
    (base.py opacity/sky loss; S3 train.py:359-363)."""
    return safe_bce(alpha, 1.0 - sky_mask.astype(alpha.dtype), limit)


def depth_loss(pred: jax.Array, gt: jax.Array, hit_mask: jax.Array,
               kind: str = "l1", inverse: bool = False,
               max_depth: float = 1e3) -> jax.Array:
    """Depth supervision with hit mask (reference DepthLoss,
    losses.py:91-176): only pixels with lidar returns contribute."""
    m = hit_mask & (gt > 0) & (gt < max_depth) & jnp.isfinite(gt)
    if inverse:
        pred = 1.0 / jnp.maximum(pred, 1e-3)
        gt = 1.0 / jnp.maximum(gt, 1e-3)
    err = pred - gt
    if kind == "l1":
        e = jnp.abs(err)
    elif kind == "l2":
        e = err ** 2
    elif kind == "smooth_l1":
        a = jnp.abs(err)
        e = jnp.where(a < 1.0, 0.5 * err ** 2, a - 0.5)
    else:
        raise ValueError(kind)
    return jnp.sum(e * m) / jnp.maximum(jnp.sum(m), 1.0)


def opacity_entropy(alpha: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Binary-entropy regularizer pushing per-pixel opacity to 0/1
    (base.py opacity_entropy; S3 train.py:339-346)."""
    a = jnp.clip(alpha, eps, 1.0 - eps)
    return (-a * jnp.log(a) - (1 - a) * jnp.log(1 - a)).mean()


def inverse_depth_smoothness(depth: jax.Array, image: jax.Array) -> jax.Array:
    """Edge-aware inverse-depth smoothness — the kornia loss the reference
    imports (base.py:11,579), re-derived: |d idepth| * exp(-|d image|)."""
    idepth = 1.0 / jnp.maximum(depth, 1e-3)
    idepth = idepth / jnp.maximum(idepth.mean(), 1e-6)
    dx_d = jnp.abs(idepth[:, 1:] - idepth[:, :-1])
    dy_d = jnp.abs(idepth[1:, :] - idepth[:-1, :])
    gx_i = jnp.mean(jnp.abs(image[:, 1:] - image[:, :-1]), axis=-1)
    gy_i = jnp.mean(jnp.abs(image[1:, :] - image[:-1, :]), axis=-1)
    return (dx_d * jnp.exp(-gx_i)).mean() + (dy_d * jnp.exp(-gy_i)).mean()


def scale_reg(scales: jax.Array, alive: jax.Array,
              max_ratio: float = 10.0) -> jax.Array:
    """Anisotropy penalty: max/min scale ratio above threshold — the
    reference's sharp_shape_reg (vanilla.py compute_reg_loss:418-429,
    relu(amax/amin - max_gauss_ratio) mean)."""
    ratio = jnp.max(scales, axis=-1) / jnp.maximum(
        jnp.min(scales, axis=-1), 1e-8)
    pen = jnp.maximum(ratio - max_ratio, 0.0) * alive
    return jnp.sum(pen) / jnp.maximum(jnp.sum(alive), 1.0)


def max_s_square_reg(log_scales: jax.Array, alive: jax.Array) -> jax.Array:
    """Mean squared max-scale (vanilla.py compute_reg_loss:449-451
    max_s_square_reg: mean(get_scaling.max(dim=1)^2) * w)."""
    s = jnp.exp(jnp.max(log_scales, axis=-1))
    pen = (s * s) * alive
    return jnp.sum(pen) / jnp.maximum(jnp.sum(alive), 1.0)
