"""Live interactive scene viewer: a dependency-free HTTP render server.

TPU-native equivalent of the reference's viser/nerfview viewer
(OmniRe/models/trainers/base.py:716-723): a browser page with
mouse-orbit / zoom / time-scrub / layer-select controls requests frames
from a tiny stdlib HTTP server, which renders them on demand through the
compiled rasterizer (on the training chip, or CPU-interpret offline).
Works both offline on a checkpoint (tools/view.py) and DURING training —
the trainer publishes its latest state with `viewer.publish(...)` and the
next requested frame reflects it, exactly like the reference's live
viewer semantics.

No sockets library beyond http.server, no npm: the orbit math runs in a
few lines of inline JS and the server answers JPEGs.
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>emd_tpu live viewer</title>
<style>
 body { background:#111; color:#ddd; font-family:sans-serif; margin:0;
        display:flex; flex-direction:column; align-items:center; }
 #view { cursor:grab; max-width:98vw; }
 .bar { margin:6px; display:flex; gap:14px; align-items:center; }
 label { min-width:50px; }
</style></head><body>
<h3 style="margin:8px">emd_tpu live viewer</h3>
<img id="view" draggable="false"/>
<div class="bar">
 <label>time</label>
 <input id="t" type="range" min="0" max="__MAXT__" value="0" step="1">
 <span id="tv">0</span>
 <label>layer</label><select id="layer">__LAYERS__</select>
 <button id="play">play</button>
 <span id="stat"></span>
</div>
<script>
let az = __AZ0__, el = __EL0__, radius = __R0__;
let target = __TARGET__;
let busy = false, dirty = true, timer = null;
const img = document.getElementById('view');
const t = document.getElementById('t');
const layer = document.getElementById('layer');
function fetchFrame() {
  if (busy) { dirty = true; return; }
  busy = true; dirty = false;
  const q = new URLSearchParams({az: az, el: el, r: radius,
    tx: target[0], ty: target[1], tz: target[2],
    f: t.value, layer: layer.value, t0: performance.now()});
  const im = new Image();
  im.onload = () => {
    img.src = im.src; busy = false;
    document.getElementById('tv').textContent = t.value;
    if (dirty) fetchFrame();
  };
  im.onerror = () => { busy = false; };
  im.src = '/render?' + q.toString();
}
let drag = null;
img.onmousedown = e => { drag = [e.clientX, e.clientY]; };
window.onmouseup = () => { drag = null; };
window.onmousemove = e => {
  if (!drag) return;
  az += (e.clientX - drag[0]) * 0.008;
  el = Math.max(-1.4, Math.min(1.4, el + (e.clientY - drag[1]) * 0.008));
  drag = [e.clientX, e.clientY];
  fetchFrame();
};
img.onwheel = e => { e.preventDefault();
  radius *= Math.exp(e.deltaY * 0.001); fetchFrame(); };
t.oninput = fetchFrame; layer.onchange = fetchFrame;
document.getElementById('play').onclick = () => {
  if (timer) { clearInterval(timer); timer = null; return; }
  timer = setInterval(() => {
    t.value = (parseInt(t.value) + 1) % (__MAXT__ + 1); fetchFrame();
  }, 150);
};
fetchFrame();
</script></body></html>
"""


def make_scene_render_fn(cfg, width: int, height: int, K: np.ndarray,
                         step: int = 10 ** 9):
    """Returns render(state_tuple, viewmat, frame, layer) -> (H, W, 3)
    for scene-graph params. `state_tuple` is (params, aux). Layers follow
    the decomposition weights of the orbit report."""
    import jax
    import jax.numpy as jnp

    from ..core.camera import Camera
    from ..scene.scene_graph import render_scene

    layers = {"full": None,
              "background": {"RigidNodes": 0.0, "DeformableNodes": 0.0,
                             "SMPLNodes": 0.0},
              "actors": {"Background": 0.0}}
    fns = {}
    for name, weights in layers.items():
        fns[name] = jax.jit(
            lambda p, a, vm, f, w=weights: render_scene(
                p, a, cfg, Camera(K=jnp.asarray(K, jnp.float32),
                                  viewmat=vm, width=width, height=height),
                f, jnp.asarray(0), jnp.asarray(step), True, w).rgb)

    def render(state, viewmat, frame, layer):
        if state is None:        # nothing published yet (training warmup)
            return np.zeros((height, width, 3), np.float32)
        params, aux = state
        fn = fns.get(layer, fns["full"])
        rgb = fn(params, aux, jnp.asarray(viewmat, jnp.float32),
                 jnp.asarray(int(frame)))
        return np.asarray(rgb)

    return render, list(layers)


class LiveViewer:
    """HTTP orbit viewer around a render callback.

    render_fn(state, viewmat (4,4) np, frame int, layer str) -> rgb
    [0,1]; `publish(state)` swaps the state the next frame renders from
    (call it from the training loop — lock-free reference swap)."""

    def __init__(self, render_fn, state, num_frames: int,
                 layers: list[str] | None = None,
                 center: np.ndarray | None = None,
                 radius: float = 12.0, port: int = 0):
        self._render = render_fn
        self._state = state
        self._frames = max(int(num_frames), 1)
        self._layers = layers or ["full"]
        self._center = (np.zeros(3, np.float32) if center is None
                        else np.asarray(center, np.float32))
        self._radius = float(radius)
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/render":
                    viewer._serve_render(self, parse_qs(u.query))
                elif u.path == "/meta":
                    body = json.dumps({
                        "num_frames": viewer._frames,
                        "layers": viewer._layers}).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    viewer._serve_page(self)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        # one render at a time: the device is a shared resource
        self._lock = threading.Lock()

    # -- lifecycle -----------------------------------------------------
    def start(self) -> "LiveViewer":
        self._thread.start()
        return self

    def stop(self):
        self._httpd.shutdown()
        self._httpd.server_close()

    def publish(self, state):
        """Swap in fresh (e.g. mid-training) state; lock-free."""
        self._state = state

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}/"

    # -- handlers ------------------------------------------------------
    def _serve_page(self, h):
        opts = "".join(f'<option value="{x}">{x}</option>'
                       for x in self._layers)
        c = self._center
        page = (_PAGE
                .replace("__MAXT__", str(self._frames - 1))
                .replace("__LAYERS__", opts)
                .replace("__AZ0__", "0.0")
                .replace("__EL0__", "-0.25")
                .replace("__R0__", repr(self._radius))
                .replace("__TARGET__",
                         f"[{c[0]!r}, {c[1]!r}, {c[2]!r}]"))
        body = page.encode()
        h.send_response(200)
        h.send_header("Content-Type", "text/html")
        h.send_header("Content-Length", str(len(body)))
        h.end_headers()
        h.wfile.write(body)

    def _serve_render(self, h, q):
        import cv2

        def f(name, default=0.0):
            return float(q.get(name, [default])[0])

        az, el, r = f("az"), f("el"), f("r", self._radius)
        tgt = np.array([f("tx"), f("ty"), f("tz")], np.float32)
        frame = int(f("f", 0)) % self._frames
        layer = q.get("layer", ["full"])[0]
        # z-up world orbit camera
        eye = tgt + r * np.array([np.cos(el) * np.sin(az),
                                  -np.cos(el) * np.cos(az),
                                  np.sin(el)], np.float32)
        from ..core.camera import look_at
        vm = np.asarray(look_at(eye, tgt))
        with self._lock:
            rgb = self._render(self._state, vm, frame, layer)
        u8 = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
        ok, buf = cv2.imencode(".jpg", cv2.cvtColor(u8, cv2.COLOR_RGB2BGR),
                               [cv2.IMWRITE_JPEG_QUALITY, 85])
        body = buf.tobytes()
        h.send_response(200)
        h.send_header("Content-Type", "image/jpeg")
        h.send_header("Content-Length", str(len(body)))
        h.send_header("Cache-Control", "no-store")
        h.end_headers()
        h.wfile.write(body)
