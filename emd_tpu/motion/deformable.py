"""DeformableNodes: non-rigidly deforming tracked instances (cyclists etc.).

Re-design of OmniRe/models/nodes/deformable.py: a RigidNodes base (tracked
SE(3) box poses + EMD offsets) plus a per-instance latent code conditioning
a ConditionalDeformNetwork that predicts Delta-xyz (and optionally
Delta-quat / Delta-scale) in box-normalized coordinates
(deformable.py:26-27 instances_embedding, get_deformation:35-47, applied in
get_gaussians:49-114), with an out-of-bound regularizer (:116-126).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.quat import quat_multiply, quat_normalize, quat_rotate
from .mlp import ConditionalDeformNetwork, conditional_deform_init
from .rigid import (
    RigidAux,
    RigidConfig,
    RigidParams,
    emd_offsets,
    instance_pose_at,
)


class DeformableParams(NamedTuple):
    rigid: RigidParams
    instances_embedding: jax.Array      # (I, E_lat) latent per instance
    deform_net: ConditionalDeformNetwork


class DeformableConfig(NamedTuple):
    rigid: RigidConfig = RigidConfig()
    embed_dim: int = 16
    net_depth: int = 8
    net_width: int = 128
    deform_quat: bool = True
    deform_scale: bool = True


def create_deformable(key, rigid_params: RigidParams, n_instances: int,
                      cfg: DeformableConfig) -> DeformableParams:
    k1, k2 = jax.random.split(key)
    return DeformableParams(
        rigid=rigid_params,
        instances_embedding=0.01 * jax.random.normal(
            k1, (n_instances, cfg.embed_dim)),
        deform_net=conditional_deform_init(
            k2, cfg.embed_dim, cfg.net_depth, cfg.net_width,
            deform_quat=cfg.deform_quat, deform_scale=cfg.deform_scale),
    )


def deformable_world_gaussians(params: DeformableParams, aux: RigidAux,
                               alive, frame: jax.Array, step: jax.Array,
                               cfg: DeformableConfig,
                               in_test_set: bool = False):
    """Deform in box-normalized coords, then rigid-transform to world.

    Returns (world_means, world_quats, d_scales (C,3 log-space additive),
    visible)."""
    rp = params.rigid
    num_frames = rp.instances_quats.shape[0]
    t_norm = frame.astype(jnp.float32) / jnp.maximum(num_frames - 1, 1)

    pid = aux.point_ids
    half = jnp.maximum(aux.instances_size[pid] / 2.0, 1e-6)   # (C, 3)
    x_norm = rp.gauss.means / half
    t_col = jnp.full((x_norm.shape[0], 1), t_norm)
    cond = params.instances_embedding[pid]

    dxyz, drot, dscale = params.deform_net(x_norm, t_col, cond)
    means_local = rp.gauss.means + dxyz * half     # denormalized offset
    quats_local = quat_normalize(rp.gauss.quats)
    if drot is not None:
        quats_local = quat_multiply(
            quat_normalize(drot + jnp.array([1.0, 0, 0, 0])), quats_local)
    d_scales = dscale if dscale is not None else jnp.zeros_like(half)

    q_t, tr_t = instance_pose_at(rp, aux, frame, in_test_set)
    rot_off, tr_off = emd_offsets(rp, aux, alive, t_norm, step, cfg.rigid)
    tr_t = tr_t + tr_off

    q_pts = q_t[pid]
    world_means = quat_rotate(q_pts, means_local) + tr_t[pid]
    q_off = quat_normalize(quat_multiply(q_t, rot_off))[pid]
    world_quats = quat_multiply(q_off, quats_local)
    visible = alive & aux.instances_fv[frame][pid]
    return world_means, world_quats, d_scales, visible


def out_of_bound_loss(params: DeformableParams, aux: RigidAux, alive,
                      frame: jax.Array, step: jax.Array,
                      cfg: DeformableConfig) -> jax.Array:
    """Penalize deformed points leaving their boxes (deformable.py:116-126)."""
    rp = params.rigid
    num_frames = rp.instances_quats.shape[0]
    t_norm = frame.astype(jnp.float32) / jnp.maximum(num_frames - 1, 1)
    pid = aux.point_ids
    half = jnp.maximum(aux.instances_size[pid] / 2.0, 1e-6)
    x_norm = rp.gauss.means / half
    t_col = jnp.full((x_norm.shape[0], 1), t_norm)
    dxyz, _, _ = params.deform_net(x_norm, t_col,
                                   params.instances_embedding[pid])
    x_new = jnp.abs(rp.gauss.means + dxyz * half)
    excess = jnp.maximum(x_new - half, 0.0)
    w = alive.astype(jnp.float32)
    return jnp.sum(jnp.sum(excess ** 2, -1) * w) / jnp.maximum(jnp.sum(w), 1.)
