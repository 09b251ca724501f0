"""RigidNodes: tracked rigid instances (vehicles) with EMD motion offsets.

TPU-first re-design of OmniRe/models/nodes/rigid.py: gaussians live in
box-local coordinates per instance; a per-frame optimizable SE(3) track
(instances_quats/trans, rigid.py:133-134) places them in the world, and the
EMD module adds learned per-instance offsets from temporal embeddings:

- temporal grid per instance (150 x 32, rigid.py:91) with coarse (n=30) and
  fine (coarse-to-fine 30->150 over 20k steps) lookups;
- zero-init linear heads on [temporal_emb ++ mean gaussian embedding]
  producing a yaw-only rotation offset (applied to gaussian orientations,
  rigid.py:203-238 + transform_quats:540-568) and a translation offset
  (applied to positions, transform_trans:240-246 + transform_means:478-538);
- test-frame pose interpolation from temporal neighbours (slerp / midpoint,
  rigid.py:486-517);
- instances invisible at a frame render with opacity 0 (instances_fv).

Unlike the reference's python loop over instances, everything here is
vmapped/segment-reduced over the instance axis — one fused XLA program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.quat import quat_multiply, quat_normalize, quat_rotate, quat_slerp
from ..core.gaussians import GaussianParams
from .temporal import c2f_num_embeddings, init_temporal_grid, temporal_embed


class EmdHeads(NamedTuple):
    """Zero-initialized linear heads (rigid.py:109-122)."""
    rot_c_w: jax.Array     # (D_in, 1)
    rot_c_b: jax.Array     # (1,)
    rot_f_w: jax.Array
    rot_f_b: jax.Array
    trans_c_w: jax.Array   # (D_in, 3)
    trans_c_b: jax.Array   # (3,)
    trans_f_w: jax.Array
    trans_f_b: jax.Array

    @staticmethod
    def create(d_in: int) -> "EmdHeads":
        z = jnp.zeros
        return EmdHeads(
            rot_c_w=z((d_in, 1)), rot_c_b=z((1,)),
            rot_f_w=z((d_in, 1)), rot_f_b=z((1,)),
            trans_c_w=z((d_in, 3)), trans_c_b=z((3,)),
            trans_f_w=z((d_in, 3)), trans_f_b=z((3,)),
        )


class RigidParams(NamedTuple):
    """Learnable state of the rigid-node class (capacity C gaussians,
    I instances, F frames)."""
    gauss: GaussianParams          # box-local means
    embeddings: jax.Array          # (C, E_g) per-gaussian motion embedding
    instances_quats: jax.Array     # (F, I, 4) tracked/optimized box poses
    instances_trans: jax.Array     # (F, I, 3)
    temporal_grid: jax.Array       # (I, E_max, D)
    heads: EmdHeads


class RigidAux(NamedTuple):
    """Non-learnable per-class state."""
    point_ids: jax.Array           # (C,) int32 instance id per gaussian
    instances_fv: jax.Array        # (F, I) bool frame-valid
    instances_size: jax.Array      # (I, 3) box sizes (out-of-bound culling)


class RigidConfig(NamedTuple):
    gaussian_embedding_dim: int = 4
    temporal_embedding_dim: int = 32
    min_embeddings: int = 30
    max_embeddings: int = 150
    c2f_temporal_iter: int = 20_000
    no_apply_embed_track: bool = False   # ablation switch (omnire.yaml ctrl)
    no_coarse_deform: bool = False
    no_fine_deform: bool = False
    no_c2f_temporal_embedding: bool = False


def create_rigid(key, gauss: GaussianParams, point_ids, instances_pose_quats,
                 instances_pose_trans, instances_fv, instances_size,
                 cfg: RigidConfig) -> tuple[RigidParams, RigidAux]:
    n_inst = instances_size.shape[0]
    d_in = cfg.gaussian_embedding_dim + cfg.temporal_embedding_dim
    params = RigidParams(
        gauss=gauss,
        embeddings=jnp.zeros((gauss.capacity, cfg.gaussian_embedding_dim)),
        instances_quats=jnp.asarray(instances_pose_quats, jnp.float32),
        instances_trans=jnp.asarray(instances_pose_trans, jnp.float32),
        temporal_grid=init_temporal_grid(key, n_inst, cfg.max_embeddings,
                                         cfg.temporal_embedding_dim),
        heads=EmdHeads.create(d_in),
    )
    aux = RigidAux(
        point_ids=jnp.asarray(point_ids, jnp.int32),
        instances_fv=jnp.asarray(instances_fv, bool),
        instances_size=jnp.asarray(instances_size, jnp.float32),
    )
    return params, aux


def _mean_embedding_per_instance(embeddings, point_ids, alive, n_inst):
    """Masked segment-mean of per-gaussian embeddings -> (I, E_g)
    (the reference's `embeddings[...].mean(0)` per instance with mean=True,
    rigid.py:184-188)."""
    w = alive.astype(jnp.float32)[:, None]
    sums = jnp.zeros((n_inst, embeddings.shape[1])).at[point_ids].add(
        embeddings * w)
    cnts = jnp.zeros((n_inst, 1)).at[point_ids].add(w)
    return sums / jnp.maximum(cnts, 1.0)


def emd_offsets(params: RigidParams, aux: RigidAux, alive, t_norm,
                step, cfg: RigidConfig):
    """Per-instance (rot_offset_quat (I,4), trans_offset (I,3)) at
    normalized time t. Vectorized replacement of the per-instance loop at
    rigid.py:520-562, with the same NaN tolerance (non-finite offsets fall
    back to identity, rigid.py:528-529,559-560)."""
    n_inst = aux.instances_size.shape[0]
    mean_emb = _mean_embedding_per_instance(
        params.embeddings, aux.point_ids, alive, n_inst)      # (I, E_g)

    n_fine = (jnp.asarray(cfg.max_embeddings, jnp.int32)
              if cfg.no_c2f_temporal_embedding else
              c2f_num_embeddings(step, cfg.min_embeddings,
                                 cfg.max_embeddings, cfg.c2f_temporal_iter))

    emb_c = jax.vmap(lambda g: temporal_embed(g, t_norm, cfg.min_embeddings)
                     )(params.temporal_grid)                  # (I, D)
    emb_f = jax.vmap(lambda g: temporal_embed(g, t_norm, n_fine)
                     )(params.temporal_grid)

    h_c = jnp.concatenate([emb_c, mean_emb], axis=-1)
    h_f = jnp.concatenate([emb_f, mean_emb], axis=-1)

    hd = params.heads
    yaw_c = (h_c @ hd.rot_c_w + hd.rot_c_b)[:, 0]
    yaw_f = (h_f @ hd.rot_f_w + hd.rot_f_b)[:, 0]
    tr_c = h_c @ hd.trans_c_w + hd.trans_c_b
    tr_f = h_f @ hd.trans_f_w + hd.trans_f_b

    if cfg.no_coarse_deform:
        yaw_c = jnp.zeros_like(yaw_c)
        tr_c = jnp.zeros_like(tr_c)
    if cfg.no_fine_deform:
        yaw_f = jnp.zeros_like(yaw_f)
        tr_f = jnp.zeros_like(tr_f)

    # quat(yaw_c) * quat(yaw_f): both z-rotations -> z-rotation of the sum
    yaw = yaw_c + yaw_f
    half = 0.5 * yaw
    zero = jnp.zeros_like(yaw)
    rot_offset = jnp.stack([jnp.cos(half), zero, zero, jnp.sin(half)],
                           axis=-1)                            # (I, 4)
    trans_offset = tr_c + tr_f                                 # (I, 3)

    if cfg.no_apply_embed_track:
        rot_offset = jnp.tile(jnp.array([1.0, 0, 0, 0]), (n_inst, 1))
        trans_offset = jnp.zeros((n_inst, 3))

    # NaN tolerance
    rot_ok = jnp.all(jnp.isfinite(rot_offset), axis=-1, keepdims=True)
    tr_ok = jnp.all(jnp.isfinite(trans_offset), axis=-1, keepdims=True)
    rot_offset = jnp.where(rot_ok, rot_offset,
                           jnp.array([1.0, 0, 0, 0]))
    trans_offset = jnp.where(tr_ok, trans_offset, 0.0)
    return rot_offset, trans_offset


def instance_pose_at(params: RigidParams, aux: RigidAux, frame: jax.Array,
                     in_test_set: bool):
    """(quats (I,4), trans (I,3)) at `frame`, with the reference's
    test-frame interpolation from temporal neighbours (rigid.py:486-517)."""
    f = frame
    quats = params.instances_quats[f]
    trans = params.instances_trans[f]
    if in_test_set:
        num_frames = params.instances_quats.shape[0]
        fp = jnp.clip(f - 1, 0, num_frames - 1)
        fn = jnp.clip(f + 1, 0, num_frames - 1)
        can = (f - 1 > 0) & (f + 1 < num_frames)
        q_int = quat_slerp(params.instances_quats[fp],
                           params.instances_quats[fn], 0.5)
        t_int = 0.5 * (params.instances_trans[fp] + params.instances_trans[fn])
        valid = aux.instances_fv[fp] & aux.instances_fv[fn] & can
        quats = jnp.where(valid[:, None], q_int, quats)
        trans = jnp.where(valid[:, None], t_int, trans)
    return quat_normalize(quats), trans


def rigid_world_gaussians(params: RigidParams, aux: RigidAux, alive,
                          frame: jax.Array, step: jax.Array,
                          cfg: RigidConfig, in_test_set: bool = False):
    """Box-local gaussians -> world space at `frame`.

    Returns (world_means (C,3), world_quats (C,4), visible (C,) bool).
    Matches the reference composition exactly: positions use the *tracked*
    rotation (no EMD rot offset — transform_means:478-538) plus the EMD
    trans offset; orientations compose the EMD yaw offset
    (transform_quats:540-568)."""
    num_frames = params.instances_quats.shape[0]
    t_norm = frame.astype(jnp.float32) / jnp.maximum(num_frames - 1, 1)

    q_t, tr_t = instance_pose_at(params, aux, frame, in_test_set)
    rot_off, tr_off = emd_offsets(params, aux, alive, t_norm, step, cfg)
    tr_t = tr_t + tr_off

    pid = aux.point_ids
    q_pts = q_t[pid]                                # (C, 4) tracked rotation
    world_means = quat_rotate(q_pts, params.gauss.means) + tr_t[pid]

    q_off = quat_normalize(quat_multiply(q_t, rot_off))[pid]
    world_quats = quat_multiply(q_off, quat_normalize(params.gauss.quats))

    visible = alive & aux.instances_fv[frame][pid]
    return world_means, world_quats, visible


def out_of_bound_mask(params: RigidParams, aux: RigidAux) -> jax.Array:
    """Gaussians outside their instance box (rigid.py:467-476)."""
    size = aux.instances_size[aux.point_ids]
    return jnp.any(jnp.abs(params.gauss.means) > size / 2.0, axis=-1)


def temporal_smoothness_reg(params: RigidParams, aux: RigidAux) -> jax.Array:
    """Penalize per-frame translation jitter for frames where the instance
    is tracked (the reference's temporal trans smoothness reg)."""
    d = params.instances_trans[1:] - params.instances_trans[:-1]   # (F-1,I,3)
    w = (aux.instances_fv[1:] & aux.instances_fv[:-1]).astype(jnp.float32)
    return jnp.sum(jnp.sum(d * d, -1) * w) / jnp.maximum(jnp.sum(w), 1.0)


def remove_instances(params: RigidParams, aux: RigidAux, alive: jax.Array,
                     instance_ids) -> jax.Array:
    """Scene-editing API: hide instances by killing their gaussians
    (rigid.py remove_instances:748-805 — the reference zeroes/removes the
    instance's points; with capacity+mask semantics that is an alive-mask
    edit). Returns the new alive mask."""
    kill = jnp.zeros_like(alive)
    for iid in instance_ids:
        kill = kill | (aux.point_ids == iid)
    return alive & ~kill


def replace_instance(params: RigidParams, aux: RigidAux,
                     target_id: int, source_id: int) -> RigidParams:
    """Scene-editing API: make `target_id` follow `source_id`'s appearance
    by swapping its tracked trajectory onto the source's gaussians is the
    reference's replace; here we instead re-point the target's track to
    the source's (rigid.py replace_instances): the target instance's
    per-frame poses are overwritten with the source's."""
    q = params.instances_quats.at[:, target_id].set(
        params.instances_quats[:, source_id])
    t = params.instances_trans.at[:, target_id].set(
        params.instances_trans[:, source_id])
    return params._replace(instances_quats=q, instances_trans=t)
