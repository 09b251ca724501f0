"""Adaptive density control under XLA static shapes.

Re-designs the reference's in-place split/dup/cull controller
(OmniRe vanilla.py: refinement stats after_train:163-191, cull:304-331,
split:333-361, dup:363-376, opacity reset:287-299; S3
gaussian_model.py:479-556,696-706) for fixed-capacity arrays:

- stats accumulate per step inside the jitted train step;
- every refine interval, split/dup children are written into *dead slots*
  (argsort-based slot assignment — no dynamic shapes, runs fully jitted);
- culling just clears the alive mask;
- Adam moments of every touched slot are zeroed (the reference's
  optimizer-state surgery, basics.py:198-242).

Capacity exhaustion is graceful: children beyond the free-slot count are
dropped and reported in the returned stats (the controller never reallocates
inside jit — growth is a host-side decision between steps).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.quat import quat_normalize, quat_rotate
from ..core.gaussians import GaussianParams
from .optim import AdamState, reset_moments


class DensifyConfig(NamedTuple):
    grad_thresh: float = 0.0002      # avg screen-grad norm trigger (3DGS)
    percent_dense: float = 0.01      # split-vs-dup size split point
    split_scale_fac: float = 1.6     # child scale shrink on split
    cull_opacity: float = 0.005      # kill below this alpha
    cull_scale3d: float = 0.5        # * scene_scale world-size cull
    cull_screen_size: float = 0.15   # fraction of image; after reset warmup
    reset_opacity_value: float = 0.01


class DensifyState(NamedTuple):
    grad_accum: jax.Array   # (C,) summed screen-grad norms
    count: jax.Array        # (C,) int32 visibility count
    max_radii: jax.Array    # (C,) max relative screen radius seen
    t_grad: jax.Array       # (C,) summed |dL/dtau| (PVG trigger,
    #                         pvg.py:113-125; zeros for other models)

    @staticmethod
    def create(capacity: int) -> "DensifyState":
        return DensifyState(
            grad_accum=jnp.zeros((capacity,), jnp.float32),
            count=jnp.zeros((capacity,), jnp.int32),
            max_radii=jnp.zeros((capacity,), jnp.float32),
            t_grad=jnp.zeros((capacity,), jnp.float32),
        )


def accumulate_stats(st: DensifyState, means2d_grad: jax.Array,
                     radii: jax.Array, width: int, height: int,
                     t_grad: jax.Array | None = None) -> DensifyState:
    """Per-step update (reference after_train, vanilla.py:163-191; PVG's
    tau-grad accumulation pvg.py:113-125). The screen-grad is normalized
    to the [-1,1] NDC convention the thresholds assume
    (grad * resolution/2)."""
    visible = radii > 0
    g = means2d_grad * jnp.array([[width * 0.5, height * 0.5]], jnp.float32)
    gnorm = jnp.linalg.norm(g, axis=-1)
    return DensifyState(
        grad_accum=st.grad_accum + jnp.where(visible, gnorm, 0.0),
        count=st.count + visible.astype(jnp.int32),
        max_radii=jnp.maximum(
            st.max_radii,
            jnp.where(visible, radii.astype(jnp.float32)
                      / float(max(width, height)), 0.0)),
        t_grad=(st.t_grad if t_grad is None
                else st.t_grad + jnp.where(visible, jnp.abs(t_grad), 0.0)),
    )


class RefineOut(NamedTuple):
    params: GaussianParams
    alive: jax.Array
    opt: AdamState
    dstate: DensifyState
    n_split: jax.Array
    n_dup: jax.Array
    n_culled: jax.Array
    n_dropped: jax.Array   # children lost to capacity


def _write_children(params: GaussianParams, alive, src_order, dst_order,
                    src_mask, child_params: GaussianParams, n_before):
    """Write child k (k-th True in src_mask, via src_order) into dead slot
    (n_before + k) (via dst_order). Returns params, alive, written-slot mask,
    dropped count."""
    cap = alive.shape[0]
    ks = jnp.arange(cap)
    src = src_order                      # (C,) candidate source slots
    src_valid = src_mask[src]            # k-th entry: is a real child
    dst = dst_order[jnp.minimum(n_before + ks, cap - 1)]
    dst_valid = src_valid & (~alive[dst]) & (n_before + ks < cap)
    # scatter child k's params into dst slot
    written = jnp.zeros((cap,), bool).at[dst].max(dst_valid)

    def put(dest_leaf, child_leaf):
        upd = child_leaf[src]            # k-th child's values
        mask = dst_valid.reshape((-1,) + (1,) * (dest_leaf.ndim - 1))
        cur = dest_leaf[dst]
        return dest_leaf.at[dst].set(jnp.where(mask, upd, cur))

    new_params = jax.tree.map(put, params, child_params)
    new_alive = alive | written
    n_children = jnp.sum(src_valid)
    n_written = jnp.sum(dst_valid)
    return new_params, new_alive, written, n_children - n_written


@functools.partial(jax.jit,
                   static_argnames=("cfg", "scene_scale",
                                    "use_screen_cull"))
def refine(
    key: jax.Array,
    params: GaussianParams,
    alive: jax.Array,
    opt: AdamState,
    dstate: DensifyState,
    cfg: DensifyConfig,
    scene_scale: float,
    use_screen_cull: bool = False,
    extra_candidate: jax.Array | None = None,
    extra_split: jax.Array | None = None,
) -> RefineOut:
    """One densify+prune pass. Fully jittable.

    `params` is either a GaussianParams or a tuple whose FIRST element is a
    GaussianParams — extra per-gaussian arrays (motion embeddings, PVG
    params, point ids...) ride along and children inherit their parent's
    rows (the reference carries embeddings through densification,
    rigid.py refinement_after:278-383, S3 gaussian_model.py:479-556).

    `extra_candidate`/`extra_split` (C,) bool widen the trigger/split
    criteria — PVG's tau-gradient trigger and temporal-size split
    (pvg.py:166-199: high_grads = high_xyz | high_t, splits |= splits_t;
    where the reference can both split AND dup one gaussian, split wins
    here — the controller keeps the masks disjoint)."""
    is_plain = isinstance(params, GaussianParams)
    gauss = params if is_plain else params[0]
    cap = alive.shape[0]
    scales = jnp.exp(gauss.log_scales)
    opac = jax.nn.sigmoid(gauss.logit_opacities)
    avg_grad = dstate.grad_accum / jnp.maximum(
        dstate.count.astype(jnp.float32), 1.0)

    trigger = avg_grad > cfg.grad_thresh
    if extra_candidate is not None:
        trigger = trigger | extra_candidate
    candidate = alive & trigger & (dstate.count > 0)
    big = jnp.max(scales, axis=-1) > cfg.percent_dense * scene_scale
    if extra_split is not None:
        big = big | extra_split
    split_mask = candidate & big
    dup_mask = candidate & ~big

    dst_order = jnp.argsort(alive)       # dead slots first (stable)

    # --- duplication: child = exact copy (vanilla.py:363-376)
    src_order_dup = jnp.argsort(~dup_mask)
    params, alive2, written_dup, drop_dup = _write_children(
        params, alive, src_order_dup, dst_order, dup_mask, params,
        jnp.zeros((), jnp.int32))
    n_dup = jnp.sum(dup_mask)

    # --- split: 2 children sampled from the parent gaussian, scales/1.6,
    # parent culled (vanilla.py:333-361)
    src_order_split = jnp.argsort(~split_mask)
    unit_q = quat_normalize(gauss.quats)

    def split_children(k):
        eps = jax.random.normal(k, (cap, 3)) * scales
        child_gauss = gauss._replace(
            means=gauss.means + quat_rotate(unit_q, eps),
            log_scales=gauss.log_scales - jnp.log(cfg.split_scale_fac),
        )
        if is_plain:
            return child_gauss
        return (child_gauss,) + tuple(params[1:])

    k1, k2 = jax.random.split(key)
    offset = n_dup
    params, alive3, written_s1, drop_s1 = _write_children(
        params, alive2, src_order_split, dst_order, split_mask,
        split_children(k1), offset)
    params, alive4, written_s2, drop_s2 = _write_children(
        params, alive3, src_order_split, dst_order, split_mask,
        split_children(k2), offset + jnp.sum(split_mask))
    n_split = jnp.sum(split_mask)
    # parents of splits die
    alive5 = alive4 & ~split_mask

    # --- cull (vanilla.py:304-331)
    too_transparent = opac < cfg.cull_opacity
    too_big_world = jnp.max(scales, axis=-1) > cfg.cull_scale3d * scene_scale
    too_big_screen = jnp.where(
        jnp.asarray(use_screen_cull),
        dstate.max_radii > cfg.cull_screen_size, False)
    cull = alive5 & (too_transparent | too_big_world | too_big_screen) \
        & ~(written_dup | written_s1 | written_s2)
    new_alive = alive5 & ~cull

    # --- optimizer surgery: zero moments of every touched slot
    touched = written_dup | written_s1 | written_s2 | split_mask | cull
    opt = reset_moments(opt, touched)

    return RefineOut(
        params=params,
        alive=new_alive,
        opt=opt,
        dstate=DensifyState.create(cap),
        n_split=n_split,
        n_dup=n_dup,
        n_culled=jnp.sum(cull) + n_split,
        n_dropped=drop_dup + drop_s1 + drop_s2,
    )


@functools.partial(jax.jit, static_argnames=("value",))
def reset_opacity(params: GaussianParams, opt: AdamState,
                  value: float = 0.01) -> tuple[GaussianParams, AdamState]:
    """Clamp opacity down to `value` and zero its Adam moments
    (vanilla.py:287-299; S3 reset_opacity gaussian_model.py:373)."""
    import math
    logit = math.log(value / (1.0 - value))
    new = params._replace(
        logit_opacities=jnp.minimum(params.logit_opacities, logit))
    opt = reset_moments(opt, jnp.ones_like(params.logit_opacities, bool),
                        field="logit_opacities")
    return new, opt
