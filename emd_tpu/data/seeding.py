"""Scene seeding: SceneData -> initialized SceneParams/SceneAux.

Re-creations of the reference init paths:
- background: lidar samples filtered against instance boxes + uniform
  random samples in the scene AABB (OmniRe scene_graph.py:86-193 +
  driving_dataset.get_lidar_samples / filter_pts_in_boxes:475-553;
  omnire.yaml:79-84 600k lidar + 400k random);
- rigid/deformable instances: per-frame box-cropped lidar transformed to
  object-local coords, moving-object filter by trajectory length
  (get_init_objects:263-396);
- class routing by annotation class name (vehicle -> RigidNodes,
  cyclist -> DeformableNodes, pedestrian -> SMPLNodes).
"""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..core.gaussians import GaussianParams, params_from_points
from ..motion.deformable import DeformableConfig, create_deformable
from ..motion.rigid import RigidConfig, create_rigid
from ..scene.correction import AffineCorrection, CameraPoseCorrection
from ..scene.scene_graph import SceneAux, SceneParams
from ..scene.sky import SkyCubemap
from .depth import lidar_colors
from .scene_data import InstanceAnn, SceneData

RIGID_CLASSES = ("vehicle", "car", "truck", "bus", "trailer",
                 "van", "tram", "train", "subway", "emergency",
                 "construction", "pedicab", "uncommon", "semi-truck")
DEFORM_CLASSES = ("cyclist", "bicycle", "motorcycle", "bicyclist",
                  "scooter", "mobility", "animal", "animals")
SMPL_CLASSES = ("pedestrian", "person", "human",
                "person_sitting", "stroller", "wheelchair")


def class_matches(name: str, classes: tuple[str, ...]) -> bool:
    """Route an annotation class name to a node type by token: handles
    the per-dataset taxonomies (waymo/kitti single words, nuscenes
    dotted 'vehicle.car' / 'human.pedestrian.adult', pandaset phrases
    like 'Pickup Truck'). Non-rigid tokens take precedence over rigid
    ones at the call sites (deform/smpl are checked first), matching
    the reference's per-dataset type maps
    (nuscenes_sourceloader.py:24-52, pandaset_sourceloader.py:22-42)."""
    toks = set(name.lower().replace(".", " ").replace("-", " ").split())
    toks.add(name.lower())
    if toks & set(DEFORM_CLASSES) and classes is RIGID_CLASSES:
        return False           # vehicle.bicycle et al are deformable
    if toks & set(SMPL_CLASSES) and classes in (RIGID_CLASSES,
                                                DEFORM_CLASSES):
        return False
    return bool(toks & set(classes))


def _in_box(pts_world, pose, size, margin=1.0):
    """Mask of world points inside an oriented box (filter_pts_in_boxes)."""
    inv = np.linalg.inv(pose)
    local = pts_world @ inv[:3, :3].T + inv[:3, 3]
    return np.all(np.abs(local) <= (size * margin) / 2.0, axis=-1), local


def is_moving(ann: InstanceAnn, thresh: float = 2.0) -> bool:
    """Trajectory-length moving filter (get_init_objects:263-396)."""
    t = ann.poses[ann.frame_valid][:, :3, 3]
    if len(t) < 2:
        return False
    return float(np.linalg.norm(t[-1] - t[0])) > thresh


def seed_background(scene: SceneData, n_lidar: int = 60_000,
                    n_random: int = 40_000, capacity_factor: float = 2.0,
                    seed: int = 0, sh_bases: int = 16,
                    with_times: bool = False):
    """Lidar-seeded + random background points, box-filtered. With
    `with_times`, also returns each seed's capture time in [0, 1]
    (capacity-padded) — PVG initializes its life peaks tau from these
    (reference pvg.py:53)."""
    rng = np.random.RandomState(seed)
    pts_l, col_l, t_l = [], [], []
    tden = max(scene.num_frames - 1, 1)
    if scene.lidar_points:
        for fi in range(scene.num_frames):
            pts = scene.lidar_points[fi]
            if pts.shape[0] == 0:
                continue
            # drop points inside any instance box at this frame
            keep = np.ones(pts.shape[0], bool)
            for ann in scene.instances:
                if ann.frame_valid[fi]:
                    inside, _ = _in_box(pts, ann.poses[fi], ann.size)
                    keep &= ~inside
            pts = pts[keep]
            cols, _ = lidar_colors(pts, scene.images[fi, 0],
                                   scene.intrinsics[0],
                                   scene.cam_to_worlds[fi, 0])
            pts_l.append(pts)
            col_l.append(cols)
            t_l.append(np.full(pts.shape[0], fi / tden, np.float32))
        pts_all = np.concatenate(pts_l)
        col_all = np.concatenate(col_l)
        t_all = np.concatenate(t_l)
        if pts_all.shape[0] > n_lidar:
            sel = rng.choice(pts_all.shape[0], n_lidar, replace=False)
            pts_all, col_all, t_all = pts_all[sel], col_all[sel], t_all[sel]
    else:
        pts_all = np.zeros((0, 3), np.float32)
        col_all = np.zeros((0, 3), np.float32)
        t_all = np.zeros((0,), np.float32)

    lo, hi = scene.aabb()
    rand_pts = rng.uniform(lo, hi, (n_random, 3)).astype(np.float32)
    rand_col = np.full((n_random, 3), 0.5, np.float32)
    pts = np.concatenate([pts_all, rand_pts])
    cols = np.concatenate([col_all, rand_col])
    # round capacity to a multiple of 256 so gaussian-axis sharding always
    # divides (mesh "gauss" sizes are small powers of two)
    capacity = -(-int(pts.shape[0] * capacity_factor) // 256) * 256
    params, alive = params_from_points(pts, np.clip(cols, 0, 1), capacity,
                                       sh_bases=sh_bases, seed=seed)
    if not with_times:
        return params, alive
    times = np.zeros((capacity,), np.float32)
    times[:t_all.shape[0]] = t_all
    times[t_all.shape[0]:pts.shape[0]] = rng.uniform(
        0, 1, pts.shape[0] - t_all.shape[0])
    return params, alive, times


def seed_s3_background(scene: SceneData, num_pts: int = 1_500_000,
                       grid_voxel: float = 0.013,
                       capacity_factor: float = 2.0, seed: int = 0,
                       sh_bases: int = 16, cache_dir: str | None = None,
                       occ_voxel: float = 0.4):
    """S3-flavor init: the multi-sweep lidar union filtered to the camera
    AABB, grid-downsampled (one point per voxel), capped at `num_pts`
    (S3 dataset_readers.py:702-740), with the occupancy grid computed and
    cached alongside (occ_grid.npy). Returns (params, alive, occ) where
    occ = (grid, lo, hi, voxel)."""
    from .depth import get_occ_grid, grid_sample_points, lidar_colors

    rng = np.random.RandomState(seed)
    pts_l, col_l = [], []
    for fi in range(scene.num_frames):
        pts = scene.lidar_points[fi]
        if pts.shape[0] == 0:
            continue
        cols, _ = lidar_colors(pts, scene.images[fi, 0],
                               scene.intrinsics[0],
                               scene.cam_to_worlds[fi, 0])
        pts_l.append(pts)
        col_l.append(cols)
    pts = np.concatenate(pts_l)
    cols = np.concatenate(col_l)
    lo, hi = scene.aabb()
    inside = np.all((pts >= lo) & (pts <= hi), axis=-1)
    pts, cols = pts[inside], cols[inside]

    occ_path = (os.path.join(cache_dir, "occ_grid.npy")
                if cache_dir is not None else None)
    grid = get_occ_grid(pts, lo, hi, occ_voxel, cache_path=occ_path)

    pts, cols = grid_sample_points(pts, cols, grid_voxel)
    if pts.shape[0] > num_pts:
        sel = rng.choice(pts.shape[0], num_pts, replace=False)
        pts, cols = pts[sel], cols[sel]
    capacity = -(-int(pts.shape[0] * capacity_factor) // 256) * 256
    params, alive = params_from_points(pts, np.clip(cols, 0, 1), capacity,
                                       sh_bases=sh_bases, seed=seed)
    return params, alive, (grid, lo, hi, occ_voxel)


def seed_instances(scene: SceneData, classes: tuple[str, ...],
                   max_pts_per_instance: int = 5000,
                   min_pts: int = 10, capacity_factor: float = 2.0,
                   only_moving: bool = True, seed: int = 0,
                   sh_bases: int = 4):
    """Box-cropped object-local lidar per instance of the given classes.

    Returns (points (N,3) local, colors, point_ids, pose_quats (F,I,4),
    pose_trans (F,I,3), frame_valid (F,I), sizes (I,3), capacity) or None
    if no instances qualify."""
    from ..core.quat import rotmat_to_quat

    rng = np.random.RandomState(seed)
    chosen = [a for a in scene.instances
              if class_matches(a.class_name, classes)
              and (not only_moving or is_moving(a))]
    if not chosen:
        return None

    pts_l, col_l, pid_l = [], [], []
    for idx, ann in enumerate(chosen):
        local_pts = []
        if scene.lidar_points:
            for fi in range(scene.num_frames):
                if not ann.frame_valid[fi]:
                    continue
                pts = scene.lidar_points[fi]
                inside, local = _in_box(pts, ann.poses[fi], ann.size)
                local_pts.append(local[inside])
        local_pts = (np.concatenate(local_pts)
                     if local_pts else np.zeros((0, 3), np.float32))
        if local_pts.shape[0] < min_pts:
            # fall back to random points in the box (reference uses random
            # init for sparse instances)
            local_pts = rng.uniform(-0.5, 0.5, (200, 3)).astype(np.float32) \
                * ann.size[None]
        if local_pts.shape[0] > max_pts_per_instance:
            sel = rng.choice(local_pts.shape[0], max_pts_per_instance,
                             replace=False)
            local_pts = local_pts[sel]
        pts_l.append(local_pts.astype(np.float32))
        col_l.append(np.full((local_pts.shape[0], 3), 0.5, np.float32))
        pid_l.append(np.full((local_pts.shape[0],), idx, np.int32))

    pts = np.concatenate(pts_l)
    cols = np.concatenate(col_l)
    pids = np.concatenate(pid_l)
    n_inst = len(chosen)
    f = scene.num_frames
    quats = np.zeros((f, n_inst, 4), np.float32)
    trans = np.zeros((f, n_inst, 3), np.float32)
    fv = np.zeros((f, n_inst), bool)
    sizes = np.stack([a.size for a in chosen])
    for i, ann in enumerate(chosen):
        quats[:, i] = np.asarray(rotmat_to_quat(
            jnp.asarray(ann.poses[:, :3, :3])))
        trans[:, i] = ann.poses[:, :3, 3]
        fv[:, i] = ann.frame_valid
    capacity = -(-int(pts.shape[0] * capacity_factor) // 256) * 256
    return dict(points=pts, colors=cols, point_ids=pids, pose_quats=quats,
                pose_trans=trans, frame_valid=fv, sizes=sizes,
                capacity=capacity, sh_bases=sh_bases, anns=chosen)


def _seed_smpl(key, scene: SceneData, sp: dict, rigid_cfg, smpl_template,
               seed):
    """Pedestrian class init: canonical gaussians + skeleton per instance.

    With a real SMPL asset (`smpl_template` path): per-instance betas from
    humanpose/smpl.pkl shape the mesh, gaussians start one-per-vertex with
    normal-aligned quats / area-derived scales (the reference's on-mesh
    init, human_body.py:216-295). Without one: procedural skeleton.
    Per-frame body poses come from the annotations when the dataset
    provides them (waymo_sourceloader.py:267-320), else identity. The
    VoxelDeformer LBS-correction volume is instantiated over the canonical
    body bounds (human_body.py:115-126)."""
    from ..motion.smpl import (N_JOINTS, SmplConfig, SmplTemplate,
                               create_smpl, load_smpl_model, on_mesh_init,
                               procedural_template, shaped_vertices)
    from ..motion.voxel_deformer import VoxelDeformer

    anns = sp["anns"]
    n_inst = sp["sizes"].shape[0]

    if smpl_template is not None:
        model = load_smpl_model(smpl_template)
        pts_l, q_l, s_l, o_l, w_l, j_l = [], [], [], [], [], []
        for ann in anns:
            betas = getattr(ann, "smpl_betas", None)
            v, joints = shaped_vertices(model, betas)
            q, ls, op = on_mesh_init(v, model["faces"])
            pts_l.append(v)
            q_l.append(q)
            s_l.append(ls)
            o_l.append(op)
            w_l.append(model["weights"])
            j_l.append(joints)
        pts = np.concatenate(pts_l)
        n_per = model["v_template"].shape[0]
        weights = np.concatenate(w_l)
        rest_joints = np.stack(j_l)
    else:
        base, tpts = procedural_template(key, 512)
        n_per = tpts.shape[0]
        pts = np.tile(np.asarray(tpts), (n_inst, 1))
        weights = np.tile(np.asarray(base.lbs_weights), (n_inst, 1))
        rest_joints = np.tile(np.asarray(base.rest_joints)[None],
                              (n_inst, 1, 1))

    total = n_per * n_inst
    pid_full = np.repeat(np.arange(n_inst, dtype=np.int32), n_per)
    # slack so the class can densify (round to 256 for mesh sharding)
    capacity = -(-int(total * 2) // 256) * 256
    g, smpl_alive = params_from_points(
        pts, np.full((total, 3), 0.5, np.float32), capacity,
        sh_bases=4, seed=seed)
    if smpl_template is not None:
        # on-mesh orientation/scale/opacity override the generic KNN init
        quats = np.array(g.quats)
        quats[:total] = np.concatenate(q_l)
        scales = np.array(g.log_scales)
        scales[:total] = np.concatenate(s_l)
        opac = np.array(g.logit_opacities)
        opac[:total] = np.concatenate(o_l)
        g = g._replace(quats=jnp.asarray(quats),
                       log_scales=jnp.asarray(scales),
                       logit_opacities=jnp.asarray(opac))
    pid = np.zeros((capacity,), np.int32)
    pid[:total] = pid_full

    # data-driven per-frame poses: the reference's root rotation is the
    # SMPL *world orient* (smpl_quats[:, 0] -> instances_quats,
    # nodes/smpl.py:90-94), root translation stays the box center, and the
    # body pose keeps joints 1..23 (joint 0 identity — otherwise the
    # orientation would apply twice)
    root_q = np.array(sp["pose_quats"])
    body = np.zeros((scene.num_frames, n_inst, N_JOINTS, 4), np.float32)
    body[..., 0] = 1.0
    for i, ann in enumerate(anns):
        aq = getattr(ann, "smpl_quats", None)
        sv = getattr(ann, "smpl_valid", None)
        if aq is not None:
            body[:, i] = aq
            body[:, i, 0] = np.array([1.0, 0, 0, 0], np.float32)
            if sv is not None:
                root_q[sv, i] = aq[sv, 0]

    from ..motion.smpl import SMPL_PARENTS
    tmpl = SmplTemplate(rest_joints=jnp.asarray(rest_joints),
                        parents=jnp.asarray(SMPL_PARENTS),
                        lbs_weights=jnp.asarray(weights))

    smpl, smpl_aux = create_smpl(
        key, g, tmpl, jnp.asarray(pid), root_q, sp["pose_trans"],
        sp["frame_valid"], sp["sizes"], body, SmplConfig(rigid_cfg))
    lo = pts.min(0) - 0.1
    hi = pts.max(0) + 0.1
    smpl = smpl._replace(voxel=VoxelDeformer.create(lo, hi))
    return smpl, smpl_aux, smpl_alive


def _instance_gauss(seeded, seed=0):
    params, alive = params_from_points(
        seeded["points"], seeded["colors"], seeded["capacity"],
        sh_bases=seeded["sh_bases"], seed=seed)
    pid = np.zeros((seeded["capacity"],), np.int32)
    pid[:seeded["point_ids"].shape[0]] = seeded["point_ids"]
    return params, alive, jnp.asarray(pid)


def build_scene_params(
    scene: SceneData,
    key=None,
    n_lidar: int = 60_000,
    n_random: int = 40_000,
    sky_resolution: int = 128,
    rigid_cfg: RigidConfig = RigidConfig(),
    deform_cfg: DeformableConfig = DeformableConfig(),
    with_smpl: bool = True,
    smpl_template: str | None = None,
    seed: int = 0,
    background: str = "vanilla",
) -> tuple[SceneParams, SceneAux]:
    """Full scene-graph initialization from data (MultiTrainer
    init_gaussians_from_dataset, scene_graph.py:86-193).

    `background="pvg"` selects the PVG background variant (the
    reference's config-selectable Background `type:`,
    OmniRe/models/trainers/scene_graph.py:25-71): per-gaussian taus are
    seeded from each lidar point's capture frame (pvg.py:53)."""
    key = key if key is not None else jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)

    bg, bg_alive = seed_background(scene, n_lidar, n_random, seed=seed)

    if background not in ("vanilla", "pvg"):
        raise ValueError(
            f"scene-graph background variant {background!r} not supported "
            "(vanilla | pvg; deformgs exists as a SingleTrainer variant)")
    bg_pvg = None
    if background == "pvg":
        from ..motion.pvg import PvgConfig
        from ..scene.scene_graph import PvgTemporal
        # capture time per seed point: lidar points keep their source
        # frame; random fill points get uniform times
        rng = np.random.RandomState(seed)
        f = scene.num_frames
        per = [p.shape[0] for p in scene.lidar_points]
        times = np.concatenate(
            [np.full(min(n_p, max(1, n_lidar // max(f, 1))),
                     fi / max(f - 1, 1), np.float32)
             for fi, n_p in enumerate(per)] or
            [np.zeros(1, np.float32)])
        taus = rng.choice(times, bg.capacity).astype(np.float32)
        bg_pvg = PvgTemporal(
            taus=jnp.asarray(taus),
            log_betas=jnp.full((bg.capacity,),
                               float(np.log(np.sqrt(
                                   PvgConfig().betas_init)))),
            velocity=jnp.zeros((bg.capacity, 3)))

    rigid = rigid_aux = rigid_alive = None
    sr = seed_instances(scene, RIGID_CLASSES, seed=seed)
    if sr is not None:
        g, rigid_alive, pid = _instance_gauss(sr, seed)
        rigid, rigid_aux = create_rigid(
            ks[0], g, pid, sr["pose_quats"], sr["pose_trans"],
            sr["frame_valid"], sr["sizes"], rigid_cfg)

    deform = deform_aux = deform_alive = None
    sd = seed_instances(scene, DEFORM_CLASSES, only_moving=False, seed=seed)
    if sd is not None:
        g, deform_alive, pid = _instance_gauss(sd, seed)
        r, deform_aux = create_rigid(
            ks[1], g, pid, sd["pose_quats"], sd["pose_trans"],
            sd["frame_valid"], sd["sizes"], deform_cfg.rigid)
        deform = create_deformable(ks[2], r, sd["sizes"].shape[0],
                                   deform_cfg)

    smpl = smpl_aux = smpl_alive = None
    if with_smpl:
        sp = seed_instances(scene, SMPL_CLASSES, only_moving=False,
                            seed=seed)
        if sp is not None:
            smpl, smpl_aux, smpl_alive = _seed_smpl(
                ks[3], scene, sp, rigid_cfg, smpl_template, seed)

    n_images = scene.num_frames * scene.num_cams
    params = SceneParams(
        background=bg, rigid=rigid, deformable=deform, smpl=smpl,
        sky=SkyCubemap.create(sky_resolution),
        affine=AffineCorrection.create(n_images),
        cam_pose=CameraPoseCorrection.create(n_images),
        bg_pvg=bg_pvg,
    )
    aux = SceneAux(
        bg_alive=bg_alive, rigid_aux=rigid_aux, rigid_alive=rigid_alive,
        deform_aux=deform_aux, deform_alive=deform_alive,
        smpl_aux=smpl_aux, smpl_alive=smpl_alive,
    )
    return params, aux
