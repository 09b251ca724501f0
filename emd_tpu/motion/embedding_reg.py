"""EMD embedding-KNN smoothness regularizer.

Reference: OmniRe/models/nodes/rigid.py:671-704 (o3d KDTree KNN with
weights exp(-2000 * d^2), weighted L2 between neighbour embeddings;
wrapped in try/except — tolerant of degenerate instances); same reg in
S3Gaussian/train.py:326-337 via utils/extra_utils.py o3d_knn.

TPU design: the KNN graph is *structural* (depends only on means, which
drift slowly) — it is recomputed host-side at refine boundaries (the
reference recomputes only when the point count changes, `prev_num_pts`),
while the weighted loss itself runs inside the jitted step from the cached
(indices, weights).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def knn_graph(points: np.ndarray, alive: np.ndarray, k: int = 20,
              weight_scale: float = 2000.0) -> tuple[np.ndarray, np.ndarray]:
    """Host-side KNN over alive points. Returns (indices (C, k) int32 into
    the full capacity array, weights (C, k) f32, zero for dead rows)."""
    from ..native import knn

    c = points.shape[0]
    idx_alive = np.flatnonzero(alive)
    out_idx = np.zeros((c, k), np.int32)
    out_w = np.zeros((c, k), np.float32)
    if idx_alive.size < k + 1:
        return out_idx, out_w
    pts = np.asarray(points[idx_alive], np.float32)
    d, nn = knn(pts, k)
    out_idx[idx_alive] = idx_alive[nn].astype(np.int32)
    out_w[idx_alive] = np.exp(-weight_scale * d ** 2)
    return out_idx, out_w


def embedding_knn_loss(embeddings: jax.Array, nn_idx: jax.Array,
                       nn_w: jax.Array) -> jax.Array:
    """Weighted L2 between each embedding and its cached neighbours
    (the in-jit half; rigid.py:692-704 weighted_l2_loss_v2)."""
    neigh = embeddings[nn_idx]                       # (C, k, E)
    diff = embeddings[:, None, :] - neigh
    per = jnp.sum(diff * diff, axis=-1)              # (C, k)
    return jnp.sum(per * nn_w) / jnp.maximum(jnp.sum(nn_w), 1.0)


def scale_percentile_reg(log_scales: jax.Array, alive: jax.Array,
                         percentile: float = 0.99) -> jax.Array:
    """Penalize scale PRODUCTS beyond the alive-set percentile — the
    reference's scaling_reg (rigid.py compute_reg_loss:637-649:
    scale_prod = scales.prod(-1), p = kthvalue(prod, N*precentile),
    relu(prod - p).mean())."""
    prod = jnp.exp(jnp.sum(log_scales, axis=-1))   # product of 3 scales
    # dead slots enter as 0.0 — they bias the percentile low, which only
    # makes the penalty slightly stricter and keeps the op jit-friendly
    # (nan-aware quantile would need a dynamic alive count)
    p_alive = jnp.where(alive, prod, 0.0)
    thresh = jnp.percentile(p_alive, percentile * 100.0)
    pen = jnp.maximum(p_alive - thresh, 0.0)
    return jnp.sum(pen) / jnp.maximum(jnp.sum(alive), 1.0)
