"""Novel-view camera trajectories.

Re-creation of OmniRe/utils/camera.py get_interp_novel_trajectories:58-217:
densified interpolation of the recorded front-camera path plus synthetic
variants (s-curve weave, lane-change shifts of +-2 / 2.5 m).
"""
from __future__ import annotations

import numpy as np

from ..core.quat import quat_slerp, quat_to_rotmat, rotmat_to_quat

import jax.numpy as jnp


def _interp_poses(c2ws: np.ndarray, n_out: int) -> np.ndarray:
    """Slerp/lerp densification of a (F, 4, 4) pose path."""
    f = c2ws.shape[0]
    ts = np.linspace(0, f - 1, n_out)
    out = []
    quats = np.asarray(rotmat_to_quat(jnp.asarray(c2ws[:, :3, :3])))
    for t in ts:
        i0 = int(np.floor(min(t, f - 2)))
        w = t - i0
        q = np.asarray(quat_slerp(jnp.asarray(quats[i0]),
                                  jnp.asarray(quats[i0 + 1]), float(w)))
        pos = (1 - w) * c2ws[i0, :3, 3] + w * c2ws[i0 + 1, :3, 3]
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = np.asarray(quat_to_rotmat(jnp.asarray(q)))
        m[:3, 3] = pos
        out.append(m)
    return np.stack(out)


def front_center_interp(c2ws: np.ndarray, n_out: int = 120) -> np.ndarray:
    """Densified original path."""
    return _interp_poses(c2ws, n_out)


def lane_shift(c2ws: np.ndarray, shift_m: float = 2.0,
               n_out: int = 120) -> np.ndarray:
    """Constant lateral offset along the camera right axis
    (the reference's +-2 m lane change)."""
    base = _interp_poses(c2ws, n_out)
    out = base.copy()
    out[:, :3, 3] += base[:, :3, 0] * shift_m
    return out


def s_curve(c2ws: np.ndarray, amplitude: float = 2.0, cycles: float = 2.0,
            n_out: int = 120) -> np.ndarray:
    """Sinusoidal weave across the path."""
    base = _interp_poses(c2ws, n_out)
    out = base.copy()
    phase = np.sin(np.linspace(0, cycles * 2 * np.pi, n_out))
    out[:, :3, 3] += base[:, :3, 0] * (amplitude * phase)[:, None]
    return out


TRAJECTORIES = {
    "front_center_interp": front_center_interp,
    "change_lane_left": lambda c, n_out=120: lane_shift(c, -2.0, n_out),
    "change_lane_right": lambda c, n_out=120: lane_shift(c, 2.0, n_out),
    "s_curve": s_curve,
}


def get_novel_trajectory(c2ws: np.ndarray, kind: str,
                         n_out: int = 120) -> np.ndarray:
    return TRAJECTORIES[kind](c2ws, n_out=n_out)
