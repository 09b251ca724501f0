"""Oracle-GT self-consistency quality gate.

Builds a KNOWN gaussian street scene (opaque background + moving rigid
vehicle + sky cubemap), renders ground-truth images with the verified
rasterizer (the compiled kernels are gated against the dense oracle at
5e-5 by tools/tpu_smoke.py), then trains a fresh scene-graph model from
lidar-style seeding against those images and reports held-out PSNR.

Unlike the point-splat synthetic GT (whose speckle caps PSNR ~24), the
target here is exactly representable by the model class, so test PSNR
measures the training stack — seeding, densification, EMD motion, eval —
not the fixture (the reference's metric protocol, video_utils.py:72-82).

Run (chip): PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/self_consistency.py --steps 3000
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def build_gt_scene(n_bg=200_000, n_veh=20_000, n_frames=16, n_cams=2,
                   width=480, height=320, seed=0, wobble=False,
                   n_ped=0, n_cyc=0, wobble_ped=False,
                   ped_wobble_amp=1.0, ped_wobble_phase=0.0,
                   ped_wobble_period=3.7):
    """Known SceneParams + cameras + instance track for the GT render.

    `wobble=True` adds a non-box-constant residual motion to the TRUE
    vehicle track — a yaw sinusoid + vertical bounce + lateral sway —
    while the annotation track handed to the student (`veh_poses_ann`)
    stays the smooth nominal one (a box detector would not capture the
    wobble either). The EMD temporal heads can absorb the residual; the
    raw track cannot — the basis of the EMD-on/off ablation mirroring
    the reference's headline claim (/root/reference/index.html:708).

    `wobble_ped=True` is the SMPL analogue: the TRUE pedestrian body
    poses gain per-joint z-yaw residual sinusoids (pelvis/hips/
    shoulders) the smooth annotation walk cycle (`ped_body_ann`) lacks —
    exactly the subspace the per-joint EMD yaw heads
    (motion/smpl.py _smpl_joint_offsets, reference smpl.py:401-436)
    can absorb."""
    from emd_tpu.core import random_quats, rgb_to_sh0
    from emd_tpu.motion.rigid import RigidConfig, create_rigid
    from emd_tpu.scene import (SceneAux, SceneParams, empty_params)
    from emd_tpu.scene.correction import (AffineCorrection,
                                          CameraPoseCorrection)
    from emd_tpu.scene.sky import SkyCubemap

    rng = np.random.RandomState(seed)

    # --- background surfaces (world z-up, road along +x)
    kinds = rng.randint(0, 4, n_bg)
    x = rng.uniform(-5.0, 60.0, n_bg).astype(np.float32)
    pts = np.zeros((n_bg, 3), np.float32)
    g = kinds <= 1
    pts[g] = np.stack([x[g], rng.uniform(-9, 9, g.sum()),
                       np.zeros(g.sum())], 1)
    lw = kinds == 2
    pts[lw] = np.stack([x[lw], np.full(lw.sum(), -9.0),
                        rng.uniform(0, 6, lw.sum())], 1)
    rw = kinds == 3
    pts[rw] = np.stack([x[rw], np.full(rw.sum(), 9.0),
                        rng.uniform(0, 6, rw.sum())], 1)
    # carve a corridor around the camera path: splats whose footprint
    # crosses the near plane render as screen-filling smears (real
    # captures never have returns at the lens either)
    cam_y, cam_z = 0.0, 1.6
    d2 = (pts[:, 1] - cam_y) ** 2 + (pts[:, 2] - cam_z) ** 2
    on_path = (d2 < 2.2 ** 2) & (pts[:, 0] > -5.0)
    pts[on_path, 1] += np.where(pts[on_path, 1] >= 0, 2.5, -2.5)
    colors = np.clip(0.35 + 0.3 * np.sin(pts * [[0.6, 1.2, 0.9]])
                     + 0.05 * rng.randn(n_bg, 3), 0, 1).astype(np.float32)
    bg = empty_params(n_bg, sh_bases=16)
    key = jax.random.PRNGKey(seed)
    area_per_pt = (2 * 18 * 65 + 2 * 6 * 65) / n_bg
    s_base = 1.6 * np.sqrt(area_per_pt / np.pi)
    bg = bg._replace(
        means=jnp.asarray(pts),
        log_scales=jnp.log(jnp.asarray(
            s_base * rng.uniform(0.6, 1.6, (n_bg, 3)), jnp.float32)),
        quats=random_quats(key, n_bg),
        sh_dc=rgb_to_sh0(jnp.asarray(colors)),
        logit_opacities=jnp.full((n_bg,), 2.5),
    )
    bg_alive = jnp.ones((n_bg,), bool)

    # --- moving vehicle: box-surface gaussians, drives -x on the left
    face = rng.randint(0, 6, n_veh)
    p = (rng.rand(n_veh, 3) - 0.5).astype(np.float32)
    size = np.array([4.2, 1.9, 1.6], np.float32)
    for i, f in enumerate(face):
        p[i, f // 2] = 0.5 * (1 if f % 2 else -1)
    veh_local = p * size[None]
    veh_col = np.clip(np.tile([[0.75, 0.15, 0.1]], (n_veh, 1))
                      + 0.05 * rng.randn(n_veh, 3), 0, 1).astype(np.float32)
    vg = empty_params(n_veh, sh_bases=4)
    vg = vg._replace(
        means=jnp.asarray(veh_local),
        log_scales=jnp.log(jnp.full((n_veh, 3), 0.055, jnp.float32)),
        quats=random_quats(jax.random.PRNGKey(seed + 1), n_veh),
        sh_dc=rgb_to_sh0(jnp.asarray(veh_col)),
        logit_opacities=jnp.full((n_veh,), 2.5),
    )
    poses_ann = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    for f in range(n_frames):
        poses_ann[f, :3, :3] = _rot_z(np.pi)
        poses_ann[f, :3, 3] = [44.0 - 1.8 * f, 3.2, 0.8]
    poses = poses_ann.copy()
    if wobble:
        # residual the box track cannot express: ~2.9 deg yaw sinusoid,
        # 12 cm bounce, 15 cm lateral sway (period ~5.3 frames)
        for f in range(n_frames):
            ph = 2 * np.pi * f / 5.3
            poses[f, :3, :3] = _rot_z(np.pi + 0.05 * np.sin(ph))
            poses[f, :3, 3] = poses_ann[f, :3, 3] + [
                0.0, 0.15 * np.sin(ph + 1.1), 0.12 * np.sin(ph)]
    from emd_tpu.core.quat import rotmat_to_quat
    rq = np.asarray(rotmat_to_quat(jnp.asarray(poses[:, :3, :3])))[:, None]
    rt = poses[:, None, :3, 3]
    fv = np.ones((n_frames, 1), bool)
    rigid, rigid_aux = create_rigid(
        jax.random.PRNGKey(seed + 2), vg, jnp.zeros((n_veh,), jnp.int32),
        rq, rt, fv, size[None], RigidConfig())
    rigid_alive = jnp.ones((n_veh,), bool)

    # --- walking pedestrian: procedural SMPL skeleton, LBS-posed limbs
    # swinging with the stride (the reference's SMPLNodes GT protocol —
    # masked human PSNR, OmniRe/models/video_utils.py:72-82)
    smpl = smpl_aux = smpl_alive = None
    ped_track = ped_body = ped_body_ann = None
    if n_ped > 0:
        from emd_tpu.core.quat import rotmat_to_quat
        from emd_tpu.motion.smpl import (N_JOINTS, SmplConfig, create_smpl,
                                         procedural_template)

        tmpl, ppts = procedural_template(jax.random.PRNGKey(seed + 5),
                                         n_ped, scale=1.05)
        ped_col = np.clip(
            np.where(np.asarray(ppts)[:, 2:3] > 0.2,
                     [[0.2, 0.3, 0.8]], [[0.25, 0.2, 0.2]])
            + 0.04 * rng.randn(n_ped, 3), 0, 1).astype(np.float32)
        pg = empty_params(n_ped, sh_bases=4)._replace(
            means=ppts,
            log_scales=jnp.log(jnp.full((n_ped, 3), 0.035, jnp.float32)),
            quats=random_quats(jax.random.PRNGKey(seed + 6), n_ped),
            sh_dc=rgb_to_sh0(jnp.asarray(ped_col)),
            logit_opacities=jnp.full((n_ped,), 2.5))
        ped_track = np.tile(np.eye(4, dtype=np.float32),
                            (n_frames, 1, 1))
        stride = 2 * np.pi / 4.0                     # 4-frame stride
        body = np.tile(np.array([1.0, 0, 0, 0], np.float32),
                       (n_frames, 1, N_JOINTS, 1))
        for f in range(n_frames):
            ped_track[f, :3, 3] = [8.0 + 0.55 * f, -2.6, 1.0]
            ph = stride * f
            # legs (hips 1/2) and arms (shoulders 16/17) swing about the
            # world-y axis, opposite phase; knees flex on the back swing
            for jidx, amp, phase in ((1, 0.5, 0.0), (2, 0.5, np.pi),
                                     (16, 0.35, np.pi), (17, 0.35, 0.0),
                                     (4, 0.25, np.pi / 2),
                                     (5, 0.25, 3 * np.pi / 2)):
                a = amp * np.sin(ph + phase)
                body[f, 0, jidx] = [np.cos(a / 2), 0, np.sin(a / 2), 0]
        body_ann = body.copy()
        if wobble_ped:
            # z-yaw residuals the annotation cycle lacks: right-multiplied
            # (the EMD joint-off composition order in smpl_world_gaussians),
            # incommensurate period vs the 4-frame stride
            # default period 3.7 frames is just above Nyquist for the
            # stride-8 test split: neither student can RECOVER the test
            # frame's wobble phase from neighbours, so margins measure
            # extrapolation noise. A slower period (e.g. 7.3) makes the
            # residual interpolatable — expressible by the EMD heads,
            # inexpressible by the smooth annotation cycle — which is
            # the mechanism the ablation is supposed to isolate.
            for f in range(n_frames):
                ph = 2 * np.pi * f / ped_wobble_period + ped_wobble_phase
                for jidx, amp, phase in ((0, 0.12, 0.0), (1, 0.2, 0.9),
                                         (2, 0.2, 2.3), (16, 0.22, 1.6),
                                         (17, 0.22, 4.1)):
                    a = ped_wobble_amp * amp * np.sin(ph + phase)
                    w1, x1, y1, z1 = body_ann[f, 0, jidx]
                    cw, sz = np.cos(a / 2), np.sin(a / 2)
                    # (w1,x1,y1,z1) * (cw,0,0,sz)
                    body[f, 0, jidx] = [w1 * cw - z1 * sz,
                                        x1 * cw + y1 * sz,
                                        y1 * cw - x1 * sz,
                                        z1 * cw + w1 * sz]
        ped_q = np.asarray(rotmat_to_quat(
            jnp.asarray(ped_track[:, :3, :3])))[:, None]
        ped_t = ped_track[:, None, :3, 3]
        smpl, smpl_aux = create_smpl(
            jax.random.PRNGKey(seed + 7), pg, tmpl,
            jnp.zeros((n_ped,), jnp.int32), jnp.asarray(ped_q),
            jnp.asarray(ped_t), jnp.ones((n_frames, 1), bool),
            jnp.array([[0.9, 0.6, 1.9]], jnp.float32),
            jnp.asarray(body), SmplConfig())
        smpl_alive = jnp.ones((n_ped,), bool)
        ped_body = body
        ped_body_ann = body_ann

    # --- cyclist: rigid track + a KNOWN smooth conditional deformation
    # (the DeformableNodes GT protocol)
    deform = deform_aux = deform_alive = None
    cyc_track = None
    if n_cyc > 0:
        from emd_tpu.core.quat import rotmat_to_quat
        from emd_tpu.motion.deformable import (DeformableConfig,
                                               create_deformable)

        cpts = (rng.rand(n_cyc, 3).astype(np.float32) - 0.5) \
            * np.array([1.7, 0.45, 1.3], np.float32)
        cyc_col = np.clip(np.tile([[0.15, 0.65, 0.2]], (n_cyc, 1))
                          + 0.05 * rng.randn(n_cyc, 3), 0,
                          1).astype(np.float32)
        cg = empty_params(n_cyc, sh_bases=4)._replace(
            means=jnp.asarray(cpts),
            log_scales=jnp.log(jnp.full((n_cyc, 3), 0.05, jnp.float32)),
            quats=random_quats(jax.random.PRNGKey(seed + 8), n_cyc),
            sh_dc=rgb_to_sh0(jnp.asarray(cyc_col)),
            logit_opacities=jnp.full((n_cyc,), 2.5))
        cyc_track = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
        for f in range(n_frames):
            cyc_track[f, :3, :3] = _rot_z(np.pi)
            cyc_track[f, :3, 3] = [38.0 - 1.2 * f, 6.0, 0.75]
        cq = np.asarray(rotmat_to_quat(
            jnp.asarray(cyc_track[:, :3, :3])))[:, None]
        ct = cyc_track[:, None, :3, 3]
        cyc_rigid, cyc_aux = create_rigid(
            jax.random.PRNGKey(seed + 9), cg,
            jnp.zeros((n_cyc,), jnp.int32), jnp.asarray(cq),
            jnp.asarray(ct), jnp.ones((n_frames, 1), bool),
            jnp.array([[1.9, 0.7, 1.6]], jnp.float32), RigidConfig())
        dcfg = DeformableConfig(net_depth=2, net_width=32)
        deform = create_deformable(jax.random.PRNGKey(seed + 10),
                                   cyc_rigid, 1, dcfg)
        # give the GT net a real, smooth, bounded deformation: normalize
        # the random warp head so the mean |dxyz| is ~5% of the half-box
        # (in-box, learnable by the student's cond-deform MLP)
        x_norm = cg.means / jnp.maximum(
            jnp.array([1.9, 0.7, 1.6]) / 2.0, 1e-6)
        t_mid = jnp.full((n_cyc, 1), 0.5)
        dxyz0, _, _ = deform.deform_net(
            x_norm, t_mid, deform.instances_embedding[
                jnp.zeros((n_cyc,), jnp.int32)])
        warp_scale = 0.05 / max(float(jnp.abs(dxyz0).mean()), 1e-8)
        deform = deform._replace(deform_net=deform.deform_net._replace(
            warp=jax.tree.map(lambda x: warp_scale * x,
                              deform.deform_net.warp)))
        deform_aux = cyc_aux
        deform_alive = jnp.ones((n_cyc,), bool)

    # --- sky: smooth colorful cubemap
    sky = SkyCubemap.create(64)
    faces = np.array(sky.faces)
    gy, gx = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 64),
                         indexing="ij")
    for i in range(6):
        faces[i, ..., 0] = 0.35 + 0.3 * gx
        faces[i, ..., 1] = 0.45 + 0.3 * gy
        faces[i, ..., 2] = 0.75 - 0.2 * gx
    sky = sky._replace(faces=jnp.asarray(faces, jnp.float32))

    n_images = n_frames * n_cams
    params = SceneParams(
        background=bg, rigid=rigid, deformable=deform, smpl=smpl,
        sky=sky, affine=AffineCorrection.create(n_images),
        cam_pose=CameraPoseCorrection.create(n_images))
    aux = SceneAux(bg_alive=bg_alive, rigid_aux=rigid_aux,
                   rigid_alive=rigid_alive, deform_aux=deform_aux,
                   deform_alive=deform_alive, smpl_aux=smpl_aux,
                   smpl_alive=smpl_alive)

    # --- cameras: ego drives +x at 1.2 m/frame
    fx = fy = 0.62 * width
    K = np.array([[fx, 0, width / 2], [0, fy, height / 2], [0, 0, 1]],
                 np.float32)
    ego = np.tile(np.eye(4, dtype=np.float32), (n_frames, 1, 1))
    for f in range(n_frames):
        ego[f, 0, 3] = f * 1.2
        ego[f, 2, 3] = 1.6
    c2e_base = np.array([
        [0, 0, 1, 0.5], [-1, 0, 0, 0.0], [0, -1, 0, 0.0],
        [0, 0, 0, 1]], np.float32)
    cam2ego = []
    for c in range(n_cams):
        m = c2e_base.copy()
        m[:3, :3] = _rot_z(-0.3 if c == 1 else 0.0) @ m[:3, :3]
        cam2ego.append(m)
    cam2ego = np.stack(cam2ego)
    cam_to_worlds = np.einsum("fij,cjk->fcik", ego, cam2ego)
    meta = dict(K=K, ego=ego, cam2ego=cam2ego,
                cam_to_worlds=cam_to_worlds.astype(np.float32),
                veh_poses=poses, veh_poses_ann=poses_ann, veh_size=size,
                ped_poses=ped_track, ped_body=ped_body,
                ped_body_ann=ped_body_ann,
                cyc_poses=cyc_track,
                width=width, height=height,
                n_frames=n_frames, n_cams=n_cams)
    return params, aux, meta


def render_gt(params, aux, meta, budget):
    """GT images + sky/vehicle/human/cyclist masks via the scene
    renderer (per-class masks from decomposition renders)."""
    from emd_tpu.core import make_camera
    from emd_tpu.scene.scene_graph import SceneConfig, render_scene

    cfg = SceneConfig(budget=budget, sh_degree_interval=1)
    w, h = meta["width"], meta["height"]
    K = meta["K"]

    def one(w2c, frame, img_idx, weights):
        cam = make_camera(K[0, 0], K[1, 1], K[0, 2], K[1, 2],
                          jnp.asarray(w2c), w, h)
        out = render_scene(params, aux, cfg, cam, frame, img_idx,
                           jnp.asarray(10_000), class_weights=weights)
        return out.rgb, out.raster.alpha

    only = {"Background": 0.0, "RigidNodes": 0.0, "DeformableNodes": 0.0,
            "SMPLNodes": 0.0}
    jit_full = jax.jit(lambda c, f, i: one(c, f, i, None))
    jit_veh = jax.jit(lambda c, f, i: one(
        c, f, i, {**only, "RigidNodes": 1.0}))
    jit_hum = jax.jit(lambda c, f, i: one(
        c, f, i, {**only, "SMPLNodes": 1.0}))
    jit_cyc = jax.jit(lambda c, f, i: one(
        c, f, i, {**only, "DeformableNodes": 1.0}))
    F, C = meta["n_frames"], meta["n_cams"]
    images = np.zeros((F, C, h, w, 3), np.float32)
    sky_masks = np.zeros((F, C, h, w), bool)
    veh_masks = np.zeros((F, C, h, w), bool)
    hum_masks = np.zeros((F, C, h, w), bool)
    cyc_masks = np.zeros((F, C, h, w), bool)
    has_hum = params.smpl is not None
    has_cyc = params.deformable is not None
    for f in range(F):
        for c in range(C):
            w2c = np.linalg.inv(meta["cam_to_worlds"][f, c])
            fj, ij = jnp.asarray(f), jnp.asarray(f * C + c)
            rgb, alpha = jit_full(w2c, fj, ij)
            _, valpha = jit_veh(w2c, fj, ij)
            images[f, c] = np.clip(np.asarray(rgb), 0, 1)
            sky_masks[f, c] = np.asarray(alpha) < 0.5
            veh_masks[f, c] = np.asarray(valpha) > 0.5
            if has_hum:
                _, halpha = jit_hum(w2c, fj, ij)
                hum_masks[f, c] = np.asarray(halpha) > 0.5
            if has_cyc:
                _, calpha = jit_cyc(w2c, fj, ij)
                cyc_masks[f, c] = np.asarray(calpha) > 0.5
    return images, sky_masks, veh_masks, hum_masks, cyc_masks


def to_scene_data(params, aux, meta, images, sky_masks, veh_masks,
                  hum_masks=None, cyc_masks=None, n_lidar=12_000, seed=0):
    """Lidar-style SceneData: per-frame subsamples of the TRUE surface
    points (background means + posed actor means) with noise — what a
    sensor would return, not the GT params."""
    from emd_tpu.data.scene_data import InstanceAnn, SceneData

    rng = np.random.RandomState(seed)
    bg_pts = np.asarray(params.background.means)
    veh_local = np.asarray(params.rigid.gauss.means)
    F, C = meta["n_frames"], meta["n_cams"]

    ped_world = None
    if params.smpl is not None:
        from emd_tpu.motion.smpl import smpl_world_gaussians
        ped_world = [np.asarray(smpl_world_gaussians(
            params.smpl, aux.smpl_aux, aux.smpl_alive, jnp.asarray(f),
            jnp.asarray(10_000))[0]) for f in range(F)]
    cyc_world = None
    if params.deformable is not None:
        from emd_tpu.motion.deformable import (DeformableConfig,
                                               deformable_world_gaussians)
        dcfg = DeformableConfig()
        cyc_world = [np.asarray(deformable_world_gaussians(
            params.deformable, aux.deform_aux, aux.deform_alive,
            jnp.asarray(f), jnp.asarray(10_000), dcfg)[0])
            for f in range(F)]

    lidar_pts, lidar_org = [], []
    n_lidar = min(n_lidar, bg_pts.shape[0])
    for f in range(F):
        sel = rng.choice(bg_pts.shape[0], n_lidar, replace=False)
        pts = [bg_pts[sel]
               + rng.randn(n_lidar, 3).astype(np.float32) * 0.02]
        vsel = rng.choice(veh_local.shape[0],
                          min(n_lidar // 8, veh_local.shape[0]),
                          replace=False)
        T = meta["veh_poses"][f]
        pts.append(veh_local[vsel] @ T[:3, :3].T + T[:3, 3]
                   + rng.randn(len(vsel), 3).astype(np.float32) * 0.02)
        if ped_world is not None:
            psel = rng.choice(ped_world[f].shape[0],
                              min(n_lidar // 5, ped_world[f].shape[0]),
                              replace=False)
            pts.append(ped_world[f][psel]
                       + rng.randn(len(psel), 3).astype(np.float32) * 0.02)
        if cyc_world is not None:
            csel = rng.choice(cyc_world[f].shape[0],
                              min(n_lidar // 12, cyc_world[f].shape[0]),
                              replace=False)
            pts.append(cyc_world[f][csel]
                       + rng.randn(len(csel), 3).astype(np.float32) * 0.02)
        pts = np.concatenate(pts).astype(np.float32)
        org = meta["ego"][f, :3, 3][None].repeat(pts.shape[0], 0)
        lidar_pts.append(pts)
        lidar_org.append(org.astype(np.float32))

    hum = (hum_masks if hum_masks is not None
           else np.zeros_like(veh_masks))
    cyc = (cyc_masks if cyc_masks is not None
           else np.zeros_like(veh_masks))
    dyn = veh_masks | hum | cyc
    # the student sees the ANNOTATION track (smooth nominal), not the
    # true wobbled one — like a box detector would provide
    instances = [InstanceAnn(
        iid="0", class_name="vehicle", size=meta["veh_size"],
        poses=meta["veh_poses_ann"], frame_valid=np.ones(F, bool))]
    if meta.get("ped_poses") is not None:
        # the student sees the ANNOTATION body cycle, not the true
        # (possibly wobbled) one — like 4D-Humans output would provide
        ann = meta.get("ped_body_ann")
        body = (ann if ann is not None else meta["ped_body"])[:, 0]
        instances.append(InstanceAnn(
            iid="1", class_name="pedestrian",
            size=np.array([0.9, 0.6, 1.9], np.float32),
            poses=meta["ped_poses"], frame_valid=np.ones(F, bool),
            smpl_quats=body.astype(np.float32),
            smpl_betas=np.zeros(10, np.float32),
            smpl_valid=np.ones(F, bool)))
    if meta.get("cyc_poses") is not None:
        instances.append(InstanceAnn(
            iid="2", class_name="cyclist",
            size=np.array([1.9, 0.7, 1.6], np.float32),
            poses=meta["cyc_poses"], frame_valid=np.ones(F, bool)))
    return SceneData(
        images=images,
        intrinsics=np.tile(meta["K"][None], (C, 1, 1)),
        cam_to_worlds=meta["cam_to_worlds"],
        sky_masks=sky_masks, dynamic_masks=dyn,
        human_masks=hum, vehicle_masks=veh_masks,
        lidar_points=lidar_pts, lidar_origins=lidar_org,
        instances=instances)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--n_bg", type=int, default=200_000)
    ap.add_argument("--n_veh", type=int, default=20_000)
    ap.add_argument("--n_ped", type=int, default=4000,
                    help="SMPL pedestrian gaussians (0 disables the class)")
    ap.add_argument("--n_cyc", type=int, default=6000,
                    help="cond-deform cyclist gaussians (0 disables)")
    ap.add_argument("--budget", type=int, default=1 << 20)
    ap.add_argument("--out", default="out/self_consistency")
    ap.add_argument("--json_out",
                    default="docs/self_consistency_r04_metrics.json")
    ap.add_argument("--test_stride", type=int, default=8)
    ap.add_argument("--reg_scale", type=float, default=1.0,
                    help="multiply the temporal/KNN anti-overfit regs "
                         "(rigid temporal smoothness, embedding-KNN, "
                         "SMPL joint smoothness + KNN consistency) — "
                         "the lever the oracle-pose analysis points at")
    args = ap.parse_args()

    from emd_tpu.utils.compile_cache import enable as _cc
    _cc()  # persistent XLA cache: repeat/multi-seed runs skip recompiles

    from emd_tpu.data.seeding import build_scene_params
    from emd_tpu.eval.harness import do_evaluation
    from emd_tpu.train.loop import LoopConfig, fit_scene
    from emd_tpu.train.scene_trainer import SceneTrainConfig
    from emd_tpu.scene.scene_graph import SceneConfig

    t0 = time.time()
    params, aux, meta = build_gt_scene(
        n_bg=args.n_bg, n_veh=args.n_veh, n_frames=args.frames,
        width=args.width, height=args.height, n_ped=args.n_ped,
        n_cyc=args.n_cyc)
    print("rendering GT ...", flush=True)
    images, sky_masks, veh_masks, hum_masks, cyc_masks = render_gt(
        params, aux, meta, args.budget)
    print(f"GT rendered in {time.time() - t0:.0f}s "
          f"(mean rgb {images.mean():.3f}, sky {sky_masks.mean():.2f}, "
          f"veh {veh_masks.mean():.3f}, hum {hum_masks.mean():.4f}, "
          f"cyc {cyc_masks.mean():.4f})", flush=True)
    scene = to_scene_data(params, aux, meta, images, sky_masks, veh_masks,
                          hum_masks, cyc_masks)

    r = args.reg_scale
    cfg = SceneTrainConfig(scene=SceneConfig(budget=args.budget))
    if r != 1.0:
        import dataclasses as _dc
        cfg = _dc.replace(
            cfg, w_rigid_temporal=cfg.w_rigid_temporal * r,
            w_embedding_knn=cfg.w_embedding_knn * r,
            w_smpl_joint_smooth=cfg.w_smpl_joint_smooth * r,
            w_smpl_knn=cfg.w_smpl_knn * r)
    loop = LoopConfig(max_steps=args.steps, refine_start=500,
                      refine_interval=400, refine_stop=args.steps * 3 // 4,
                      reset_opacity_interval=args.steps // 3,
                      eval_interval=10 ** 9, ckpt_interval=10 ** 9,
                      log_interval=100, downscale_times=1,
                      double_steps=max(1, args.steps // 8),
                      test_stride=args.test_stride)
    os.makedirs(args.out, exist_ok=True)
    state = fit_scene(scene, args.out, cfg=cfg, loop=loop)

    from emd_tpu.data.batches import BatchSource
    src = BatchSource(scene, test_stride=args.test_stride)
    # oracle_poses adds a "test_oracle" row: the same held-out frames
    # rendered at the test frame's OWN (annotation-init, never-trained)
    # pose instead of the neighbour interpolation the protocol mandates —
    # the test/test_oracle gap isolates the pose-interpolation protocol
    # ceiling from actual appearance/motion overfit (VERDICT r3 weak #3)
    res = do_evaluation(state.params, state.aux, cfg.scene, src, args.out,
                        step=args.steps, oracle_poses=True)
    report = {"gate": "self_consistency",
              "test_psnr": res.get("test", {}).get("psnr"),
              "train_psnr": res.get("train", {}).get("psnr"),
              "test_human_psnr":
                  res.get("test", {}).get("human_psnr"),
              "test_dynamic_psnr":
                  res.get("test", {}).get("dynamic_psnr"),
              "test_vehicle_psnr":
                  res.get("test", {}).get("vehicle_psnr"),
              "oracle_pose_human_psnr":
                  res.get("test_oracle", {}).get("human_psnr"),
              "oracle_pose_dynamic_psnr":
                  res.get("test_oracle", {}).get("dynamic_psnr"),
              "oracle_pose_vehicle_psnr":
                  res.get("test_oracle", {}).get("vehicle_psnr"),
              "oracle_pose_psnr":
                  res.get("test_oracle", {}).get("psnr"),
              "full_table": res,
              "steps": args.steps,
              "wall_s": round(time.time() - t0, 1)}
    if args.json_out:
        os.makedirs(os.path.dirname(args.json_out), exist_ok=True)
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=2, default=float)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "full_table"}))


if __name__ == "__main__":
    main()
