"""SMPLNodes: pedestrians as skinned gaussians with EMD joint offsets.

TPU re-design of OmniRe/models/nodes/smpl.py + models/human_body.py:
each human instance owns canonical gaussians skinned to a 24-joint SMPL
skeleton by linear blend skinning:

  A_j(theta)  = world transform of joint j from per-joint local rotations
                via the kinematic chain (smplx batch_rigid_transform,
                imported at human_body.py:19-21)
  T_i         = sum_j w_ij * (A_j * A0_j^{-1})   (human_body.py A0-inverse
                precompute; smpl.py transform_means_and_quats:438-532)
  x_world     = R_root T_i x + t_root

Learnable: per-frame per-joint body pose `smpl_quats` (F, I, 24, 4) + root
SE(3) (smpl.py:186-188), canonical gaussians, and the EMD heads
`track_smpl_c/f` -> 24 per-joint yaw offsets composed with the body pose
(smpl.py:117-123, embedding_track_smpl_offset:401-436).

The SMPL *template* (rest joints, kinematic parents, skinning weights) is
pluggable: `load_smpl_template` reads a real SMPL_NEUTRAL npz/pkl when the
user provides one; `procedural_template` builds a humanoid skeleton with
bone-distance skinning so the full machinery runs and trains without the
(license-gated) SMPL asset. Real assets go through `load_smpl_model` +
`shaped_vertices` (betas blendshapes) + `on_mesh_init` (normal-aligned
quats, area-derived scales — human_body.py:216-295). The reference's
optional VoxelDeformer LBS correction (modules.py:459-669) lives in
voxel_deformer.py and plugs in via `SmplParams.voxel`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gaussians import GaussianParams
from ..core.quat import quat_multiply, quat_normalize, quat_rotate, \
    quat_to_rotmat
from .rigid import EmdHeads, RigidAux, RigidConfig, RigidParams, \
    _mean_embedding_per_instance, instance_pose_at
from .temporal import c2f_num_embeddings, temporal_embed

N_JOINTS = 24
# SMPL kinematic tree (parent of each joint; joint 0 = pelvis root)
SMPL_PARENTS = np.array([
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
    18, 19, 20, 21], np.int32)


class SmplTemplate(NamedTuple):
    """Rest-pose skeleton + per-gaussian skinning weights.

    `rest_joints` is per-instance — betas-shaped bodies have different
    skeletons (reference J_canonical is per-human, human_body.py:108-110).
    `lbs_weights` is per-*gaussian* (capacity-length): densified children
    inherit their parent's row (rides through refine as an extra)."""
    rest_joints: jax.Array    # (I, 24, 3)
    parents: jax.Array        # (24,) int32
    lbs_weights: jax.Array    # (C, 24) rows sum to 1


class SmplParams(NamedTuple):
    rigid: RigidParams        # root track + canonical gaussians + EMD state
    smpl_quats: jax.Array     # (F, I, 24, 4) per-frame body pose
    smpl_heads: EmdHeads      # rot heads emit 24 yaw angles (trans unused)
    voxel: object | None = None  # optional VoxelDeformer LBS correction
                                 # (modules.py:459-669)


class SmplAux(NamedTuple):
    rigid: RigidAux
    template: SmplTemplate


def procedural_template(key, n_gauss: int, scale: float = 1.0
                        ) -> tuple[SmplTemplate, jax.Array]:
    """Humanoid rest skeleton (T-pose-ish) + gaussians sampled along bones
    with inverse-distance skinning weights. Returns (template, means)."""
    j = np.zeros((N_JOINTS, 3), np.float32)
    # pelvis at origin; z up. rough SMPL-like joint layout
    j[0] = [0, 0, 0]
    j[1] = [0.1, 0, -0.05]     # hips
    j[2] = [-0.1, 0, -0.05]
    j[3] = [0, 0, 0.1]         # spine1
    j[4] = [0.1, 0, -0.45]     # knees
    j[5] = [-0.1, 0, -0.45]
    j[6] = [0, 0, 0.22]        # spine2
    j[7] = [0.1, 0, -0.85]     # ankles
    j[8] = [-0.1, 0, -0.85]
    j[9] = [0, 0, 0.32]        # spine3
    j[10] = [0.12, 0.1, -0.9]  # feet
    j[11] = [-0.12, 0.1, -0.9]
    j[12] = [0, 0, 0.5]        # neck
    j[13] = [0.08, 0, 0.42]    # collars
    j[14] = [-0.08, 0, 0.42]
    j[15] = [0, 0, 0.62]       # head
    j[16] = [0.18, 0, 0.42]    # shoulders
    j[17] = [-0.18, 0, 0.42]
    j[18] = [0.42, 0, 0.42]    # elbows
    j[19] = [-0.42, 0, 0.42]
    j[20] = [0.65, 0, 0.42]    # wrists
    j[21] = [-0.65, 0, 0.42]
    j[22] = [0.72, 0, 0.42]    # hands
    j[23] = [-0.72, 0, 0.42]
    j *= scale

    # sample gaussians along bones
    rng = np.random.RandomState(0)
    bones = [(p, c) for c, p in enumerate(SMPL_PARENTS) if p >= 0]
    pts = []
    for _ in range(n_gauss):
        p, c = bones[rng.randint(len(bones))]
        t = rng.rand()
        pts.append(j[p] * (1 - t) + j[c] * t + rng.randn(3) * 0.02 * scale)
    pts = np.asarray(pts, np.float32)

    # inverse-square-distance weights to nearest joints
    d = np.linalg.norm(pts[:, None, :] - j[None], axis=-1) + 1e-3
    w = 1.0 / d ** 4
    # keep top-4 joints per point (SMPL uses sparse weights)
    thresh = np.sort(w, axis=1)[:, -4][:, None]
    w = np.where(w >= thresh, w, 0.0)
    w = w / w.sum(axis=1, keepdims=True)

    tmpl = SmplTemplate(
        rest_joints=jnp.asarray(j),
        parents=jnp.asarray(SMPL_PARENTS),
        lbs_weights=jnp.asarray(w.astype(np.float32)),
    )
    return tmpl, jnp.asarray(pts)


def load_smpl_model(path: str) -> dict:
    """Load a real SMPL model file (npz or pkl) into plain numpy arrays:
    v_template (V, 3), weights (V, 24), J_regressor (24, V),
    shapedirs (V, 3, B) shape blendshapes, faces (F, 3) int32."""
    import pickle

    if path.endswith(".npz"):
        data = dict(np.load(path, allow_pickle=True))
    else:
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
    jreg = data["J_regressor"]
    if hasattr(jreg, "toarray"):
        jreg = jreg.toarray()
    out = dict(
        v_template=np.asarray(data["v_template"], np.float32),
        weights=np.asarray(data["weights"], np.float32)[:, :N_JOINTS],
        J_regressor=np.asarray(jreg, np.float32)[:N_JOINTS],
        faces=np.asarray(data["f"], np.int64).astype(np.int32)
        if "f" in data else None,
    )
    if "shapedirs" in data:
        sd = data["shapedirs"]
        sd = np.asarray(sd.x if hasattr(sd, "x") else sd, np.float32)
        out["shapedirs"] = sd
    return out


def shaped_vertices(model: dict, betas: np.ndarray | None
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Apply shape blendshapes: v = v_template + shapedirs . betas; rest
    joints regressed from the shaped vertices (the SMPL shape path the
    reference gets from smplx, consumed at human_body.py:100-110).
    Returns (vertices (V, 3), joints (24, 3))."""
    v = model["v_template"]
    if betas is not None and model.get("shapedirs") is not None:
        sd = model["shapedirs"]
        nb = min(sd.shape[-1], betas.shape[-1])
        v = v + np.einsum("vdk,k->vd", sd[..., :nb],
                          np.asarray(betas, np.float32)[:nb])
    joints = model["J_regressor"] @ v
    return v.astype(np.float32), joints.astype(np.float32)


def on_mesh_init(vertices: np.ndarray, faces: np.ndarray,
                 opacity_logit: float = 0.9,
                 thickness_factor: float = 0.5,
                 min_scale: float = 1e-4, max_scale: float = 0.1):
    """Mesh-derived per-vertex gaussian init (re-derivation of
    human_body.py init_qso_on_mesh:216-295): orientation = local frame
    with z along the vertex normal, scale = (r, r, 0.5 r) with
    r = sqrt(vertex_area_share / pi), base opacity logit.
    Returns (quats (V, 4) wxyz, log_scales (V, 3), opacity_logits (V,))."""
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 2]] - v[f[:, 0]]
    fn = np.cross(e1, e2)                       # face normal * 2*area
    area = 0.5 * np.linalg.norm(fn, axis=-1)

    vn = np.zeros_like(v)
    va = np.zeros(v.shape[0])
    for k in range(3):
        np.add.at(vn, f[:, k], fn)
        np.add.at(va, f[:, k], area / 3.0)
    vn /= np.maximum(np.linalg.norm(vn, axis=-1, keepdims=True), 1e-12)

    # orthonormal frame with z = normal (columns are basis vectors)
    rng = np.random.RandomState(0)
    rnd = rng.randn(*vn.shape)
    ux = np.cross(vn, rnd)
    ux /= np.maximum(np.linalg.norm(ux, axis=-1, keepdims=True), 1e-12)
    uy = np.cross(vn, ux)
    frame = np.stack([ux, uy, vn], axis=-1)     # (V, 3, 3)
    from ..core.quat import rotmat_to_quat
    quats = np.asarray(rotmat_to_quat(jnp.asarray(frame, jnp.float32)))

    radius = np.sqrt(np.maximum(va, 0.0) / np.pi)
    radius = np.clip(radius, min_scale, max_scale)
    thick = np.clip(radius * thickness_factor, min_scale, max_scale)
    log_scales = np.log(np.stack([radius, radius, thick],
                                 axis=-1)).astype(np.float32)
    opac = np.full((v.shape[0],), opacity_logit, np.float32)
    return quats.astype(np.float32), log_scales, opac


def load_smpl_template(path: str, betas: np.ndarray | None = None
                       ) -> tuple[SmplTemplate, jax.Array]:
    """Single-instance template from a real SMPL file (betas-shaped).
    Gaussians = one per vertex (human_body.py on-mesh init)."""
    model = load_smpl_model(path)
    v, joints = shaped_vertices(model, betas)
    weights = model["weights"]
    tmpl = SmplTemplate(
        rest_joints=jnp.asarray(joints),
        parents=jnp.asarray(SMPL_PARENTS),
        lbs_weights=jnp.asarray(weights / weights.sum(1, keepdims=True)),
    )
    return tmpl, jnp.asarray(v)


def batch_rigid_transform(joint_quats: jax.Array, rest_joints: jax.Array,
                          parents=SMPL_PARENTS):
    """Kinematic chain: per-joint local rotations (24, 4) -> world joint
    transforms as (R (24,3,3), t (24,3)) pairs relative to rest pose.

    Same recurrence as smplx batch_rigid_transform (consumed at
    smpl.py:438-532): A_child = A_parent * [R_local | rel_joint], then the
    rest-pose-inverse is folded in (A * A0^{-1})."""
    rots = quat_to_rotmat(quat_normalize(joint_quats))     # (24, 3, 3)
    # the kinematic tree is static (python loop unrolls at trace time);
    # traced parent arrays cannot drive control flow, so fall back to the
    # canonical SMPL tree in that case
    if isinstance(parents, jax.core.Tracer):
        parents_np = SMPL_PARENTS
    else:
        parents_np = np.asarray(parents)

    abs_r = [rots[0]]
    abs_t = [rest_joints[0]]
    for c in range(1, N_JOINTS):
        p = int(parents_np[c])
        rel = rest_joints[c] - rest_joints[p]
        abs_r.append(abs_r[p] @ rots[c])
        abs_t.append(abs_r[p] @ rel + abs_t[p])
    R = jnp.stack(abs_r)                                   # (24, 3, 3)
    t = jnp.stack(abs_t)                                   # (24, 3)
    # fold in A0^{-1}: x_world = R (x - j_rest) + t  per joint
    t = t - jnp.einsum("jab,jb->ja", R, rest_joints)
    return R, t


class SmplConfig(NamedTuple):
    rigid: RigidConfig = RigidConfig()


def create_smpl(key, gauss: GaussianParams, template: SmplTemplate,
                point_ids, root_quats, root_trans, instances_fv,
                instances_size, body_quats, cfg: SmplConfig
                ) -> tuple[SmplParams, SmplAux]:
    from .rigid import create_rigid

    rigid, rigid_aux = create_rigid(key, gauss, point_ids, root_quats,
                                    root_trans, instances_fv, instances_size,
                                    cfg.rigid)
    # normalize the template to per-instance joints + capacity-sized
    # weights (a single-template (24,3)/(V,24) input is broadcast/padded;
    # padding rows skin rigidly to the pelvis)
    n_inst = np.asarray(instances_size).shape[0]
    rj = template.rest_joints
    if rj.ndim == 2:
        rj = jnp.tile(rj[None], (n_inst, 1, 1))
    w = template.lbs_weights
    cap = gauss.capacity
    if w.shape[0] < cap:
        pad = jnp.zeros((cap - w.shape[0], N_JOINTS),
                        w.dtype).at[:, 0].set(1.0)
        w = jnp.concatenate([w, pad], axis=0)
    template = template._replace(rest_joints=rj, lbs_weights=w[:cap])
    d_in = (cfg.rigid.gaussian_embedding_dim
            + cfg.rigid.temporal_embedding_dim)
    heads = EmdHeads.create(d_in)
    # rot heads emit 24 per-joint yaw angles (smpl.py:117-123)
    heads = heads._replace(
        rot_c_w=jnp.zeros((d_in, N_JOINTS)), rot_c_b=jnp.zeros((N_JOINTS,)),
        rot_f_w=jnp.zeros((d_in, N_JOINTS)), rot_f_b=jnp.zeros((N_JOINTS,)))
    params = SmplParams(
        rigid=rigid,
        smpl_quats=jnp.asarray(body_quats, jnp.float32),
        smpl_heads=heads,
    )
    return params, SmplAux(rigid=rigid_aux, template=template)


def _smpl_joint_offsets(params: SmplParams, aux: SmplAux, alive, t_norm,
                        step, cfg: SmplConfig):
    """EMD per-joint yaw offsets (I, 24, 4)
    (embedding_track_smpl_offset, smpl.py:401-436)."""
    rcfg = cfg.rigid
    n_inst = aux.rigid.instances_size.shape[0]
    if rcfg.no_apply_embed_track:   # EMD ablation switch (omnire.yaml ctrl)
        return jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0, 0.0]),
                                (n_inst, N_JOINTS, 4))
    mean_emb = _mean_embedding_per_instance(
        params.rigid.embeddings, aux.rigid.point_ids, alive, n_inst)
    n_fine = c2f_num_embeddings(step, rcfg.min_embeddings,
                                rcfg.max_embeddings, rcfg.c2f_temporal_iter)
    emb_c = jax.vmap(lambda g: temporal_embed(g, t_norm, rcfg.min_embeddings)
                     )(params.rigid.temporal_grid)
    emb_f = jax.vmap(lambda g: temporal_embed(g, t_norm, n_fine)
                     )(params.rigid.temporal_grid)
    h_c = jnp.concatenate([emb_c, mean_emb], axis=-1)
    h_f = jnp.concatenate([emb_f, mean_emb], axis=-1)
    hd = params.smpl_heads
    yaw_c = h_c @ hd.rot_c_w + hd.rot_c_b
    yaw_f = h_f @ hd.rot_f_w + hd.rot_f_b
    if rcfg.no_coarse_deform:       # ablation switches, like rigid's
        yaw_c = jnp.zeros_like(yaw_c)
    if rcfg.no_fine_deform:
        yaw_f = jnp.zeros_like(yaw_f)
    yaw = yaw_c + yaw_f
    yaw = jnp.where(jnp.isfinite(yaw), yaw, 0.0)           # NaN tolerance
    half = 0.5 * yaw                                        # (I, 24)
    zero = jnp.zeros_like(half)
    return jnp.stack([jnp.cos(half), zero, zero, jnp.sin(half)], axis=-1)


def smpl_world_gaussians(params: SmplParams, aux: SmplAux, alive,
                         frame: jax.Array, step: jax.Array,
                         cfg: SmplConfig = SmplConfig(),
                         in_test_set: bool = False):
    """Canonical gaussians -> world at `frame`: body LBS + root SE(3)."""
    rp = params.rigid
    num_frames = rp.instances_quats.shape[0]
    t_norm = frame.astype(jnp.float32) / jnp.maximum(num_frames - 1, 1)
    pid = aux.rigid.point_ids

    body = quat_normalize(params.smpl_quats[frame])          # (I, 24, 4)
    if in_test_set:
        # test frames interpolate the BODY pose from temporal neighbours
        # exactly like the root (the reference slerps the concatenated
        # [root | smpl] theta, smpl.py transform_means:345-356)
        from ..core.quat import quat_slerp
        fp = jnp.clip(frame - 1, 0, num_frames - 1)
        fn = jnp.clip(frame + 1, 0, num_frames - 1)
        can = (frame - 1 > 0) & (frame + 1 < num_frames)
        b_int = quat_slerp(quat_normalize(params.smpl_quats[fp]),
                           quat_normalize(params.smpl_quats[fn]), 0.5)
        valid = (aux.rigid.instances_fv[fp] & aux.rigid.instances_fv[fn]
                 & can)
        body = jnp.where(valid[:, None, None], b_int, body)
    joint_off = _smpl_joint_offsets(params, aux, alive, t_norm, step, cfg)
    body = quat_multiply(body, joint_off)

    def per_instance(joint_quats, rest_joints):
        return batch_rigid_transform(joint_quats, rest_joints,
                                     aux.template.parents)

    jR, jt = jax.vmap(per_instance)(body, aux.template.rest_joints)

    w = aux.template.lbs_weights                              # (C, 24)
    if params.voxel is not None:
        from .voxel_deformer import corrected_weights
        w = corrected_weights(params.voxel, rp.gauss.means, w)
    R_blend = jnp.einsum("cj,cjab->cab", w, jR[pid])
    t_blend = jnp.einsum("cj,cja->ca", w, jt[pid])
    posed = jnp.einsum("cab,cb->ca", R_blend, rp.gauss.means) + t_blend
    from ..core.quat import rotmat_to_quat
    q_blend = rotmat_to_quat(R_blend)
    posed_q = quat_multiply(q_blend, quat_normalize(rp.gauss.quats))

    q_root, t_root = instance_pose_at(rp, aux.rigid, frame, in_test_set)
    world_means = quat_rotate(q_root[pid], posed) + t_root[pid]
    world_quats = quat_multiply(q_root[pid], posed_q)
    visible = alive & aux.rigid.instances_fv[frame][pid]
    return world_means, world_quats, visible


def joint_smoothness_reg(params: SmplParams) -> jax.Array:
    """Per-joint angular velocity smoothness (smpl.py:598-636)."""
    q = quat_normalize(params.smpl_quats)
    d = 1.0 - jnp.abs(jnp.sum(q[1:] * q[:-1], axis=-1))     # (F-1, I, 24)
    return jnp.mean(d)


def knn_consistency_reg(params: SmplParams, nn_idx: jax.Array,
                        nn_w: jax.Array) -> jax.Array:
    """Neighbourhood std of appearance/shape attributes — pulls nearby
    canonical gaussians toward consistent shs/opacity/scale/quats
    (smpl.py:653-694). Uses the cached KNN graph (emd_tpu.motion
    .embedding_reg.knn_graph)."""
    g = params.rigid.gauss

    def nstd(x):
        flat = x.reshape(x.shape[0], -1)
        neigh = flat[nn_idx]                     # (C, k, D)
        var = jnp.var(neigh, axis=1)
        w = (jnp.sum(nn_w, axis=1) > 0).astype(jnp.float32)
        return jnp.sum(jnp.mean(var, -1) * w) / jnp.maximum(jnp.sum(w), 1.)

    return (nstd(g.sh_dc) + nstd(g.logit_opacities[:, None])
            + nstd(g.log_scales) + nstd(quat_normalize(g.quats)))


def x_offset_reg(params: SmplParams, aux: SmplAux, alive) -> jax.Array:
    """Penalize canonical gaussians drifting off the template skeleton
    (smpl.py:702-709): squared distance beyond a small free radius to the
    nearest rest joint."""
    joints = aux.template.rest_joints[aux.rigid.point_ids]  # (C, 24, 3)
    diff = params.rigid.gauss.means[:, None, :] - joints
    # safe sqrt: dead capacity slots sit exactly on a joint (zero means),
    # where norm's gradient is 0/0
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    dmin = jnp.min(d, axis=1)
    pen = jnp.maximum(dmin - 0.3, 0.0) ** 2
    w = alive.astype(jnp.float32)
    return jnp.sum(pen * w) / jnp.maximum(jnp.sum(w), 1.0)
