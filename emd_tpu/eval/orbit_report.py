"""Offline interactive scene report: a standalone HTML viewer.

Substitute for the reference's live viser/nerfview viewer
(OmniRe/models/trainers/base.py:716-723): instead of a socket server
(not possible in batch/TPU-pod settings), render a (viewpoint x time)
grid of frames plus per-class decompositions and emit ONE self-contained
HTML file with camera / time / layer scrubbers — open it in any browser,
no server, no dependencies.
"""
from __future__ import annotations

import base64
import io
import os

import numpy as np

_HTML = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>emd_tpu scene report</title>
<style>
 body {{ background:#111; color:#ddd; font-family:sans-serif;
        display:flex; flex-direction:column; align-items:center; }}
 img {{ image-rendering:auto; max-width:95vw; }}
 .bar {{ margin:8px; display:flex; gap:16px; align-items:center; }}
 label {{ min-width:70px; }}
</style></head><body>
<h3>emd_tpu scene report</h3>
<img id="view" />
<div class="bar"><label>camera</label>
 <input id="cam" type="range" min="0" max="{max_cam}" value="0" step="1">
 <span id="camv"></span></div>
<div class="bar"><label>time</label>
 <input id="t" type="range" min="0" max="{max_t}" value="0" step="1">
 <span id="tv"></span></div>
<div class="bar"><label>layer</label>
 <select id="layer">{layer_options}</select></div>
<div class="bar"><button id="play">play</button></div>
<script>
const frames = {frames_json};
const layers = {layers_json};
const cam = document.getElementById('cam');
const t = document.getElementById('t');
const layer = document.getElementById('layer');
function show() {{
  const key = layer.value + '/' + cam.value + '/' + t.value;
  document.getElementById('view').src = 'data:image/jpeg;base64,' +
      frames[key];
  document.getElementById('camv').textContent = cam.value;
  document.getElementById('tv').textContent = t.value;
}}
cam.oninput = show; t.oninput = show; layer.onchange = show;
let timer = null;
document.getElementById('play').onclick = () => {{
  if (timer) {{ clearInterval(timer); timer = null; return; }}
  timer = setInterval(() => {{
    t.value = (parseInt(t.value) + 1) % ({max_t} + 1); show();
  }}, 120);
}};
show();
</script></body></html>
"""


def _jpeg_b64(img: np.ndarray, quality: int = 85) -> str:
    import cv2

    u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    ok, buf = cv2.imencode(".jpg", cv2.cvtColor(u8, cv2.COLOR_RGB2BGR),
                           [cv2.IMWRITE_JPEG_QUALITY, quality])
    return base64.b64encode(buf.tobytes()).decode()


def write_orbit_report(params, aux, cfg, scene, out_path: str,
                       n_views: int = 5, n_times: int = 8,
                       width: int | None = None, height: int | None = None,
                       step: int = 10 ** 9,
                       layers: dict[str, dict] | None = None) -> str:
    """Render the (camera-path x time x layer) grid and write the HTML.

    `layers` maps display name -> class_weights dict (None = full
    render); defaults to full + background-only + actors-only."""
    import json

    import jax
    import jax.numpy as jnp

    from ..core.camera import Camera
    from ..scene.scene_graph import render_scene
    from .trajectories import get_novel_trajectory

    if layers is None:
        layers = {"full": None,
                  "background": {"RigidNodes": 0.0, "DeformableNodes": 0.0,
                                 "SMPLNodes": 0.0},
                  "actors": {"Background": 0.0}}
    h0, w0 = scene.image_hw
    width = width or w0
    height = height or h0
    sx, sy = width / w0, height / h0
    K = scene.intrinsics[0].copy()
    K[0] *= sx
    K[1] *= sy
    c2ws = get_novel_trajectory(scene.cam_to_worlds[:, 0], "s_curve",
                                n_out=n_views)

    frames = {}
    for li, (lname, weights) in enumerate(layers.items()):
        render_fn = jax.jit(
            lambda p, a, cam, f, i, w=weights: render_scene(
                p, a, cfg, cam, f, i, jnp.asarray(step), True, w))
        for vi, c2w in enumerate(c2ws):
            cam = Camera(K=jnp.asarray(K, jnp.float32),
                         viewmat=jnp.asarray(np.linalg.inv(c2w)),
                         width=width, height=height)
            for ti in range(n_times):
                f = int(round(ti / max(n_times - 1, 1)
                              * (scene.num_frames - 1)))
                r = render_fn(params, aux, cam, jnp.asarray(f),
                              jnp.asarray(0))
                frames[f"{lname}/{vi}/{ti}"] = _jpeg_b64(np.asarray(r.rgb))

    layer_options = "".join(
        f'<option value="{k}">{k}</option>' for k in layers)
    html = _HTML.format(
        max_cam=len(c2ws) - 1, max_t=n_times - 1,
        layer_options=layer_options,
        frames_json=json.dumps(frames),
        layers_json=json.dumps(list(layers)))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(html)
    return out_path
