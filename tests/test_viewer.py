"""Live viewer: real HTTP round-trips against the render server
(the viser-equivalent surface, OmniRe base.py:716-723)."""
import urllib.request

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")


def test_fit_scene_step_hook_publishes(tmp_path):
    """The training loop's step_hook (the viewer's publish point) fires
    with live state."""
    from emd_tpu.data import make_synthetic_scene
    from emd_tpu.scene import SceneConfig
    from emd_tpu.train import LoopConfig, SceneTrainConfig, fit_scene

    scene, _ = make_synthetic_scene(n_frames=3, n_cams=1, width=48,
                                    height=32, n_lidar=400)
    cfg = SceneTrainConfig(scene=SceneConfig(budget=1 << 16,
                                             interpret=True))
    seen = []
    fit_scene(scene, str(tmp_path), cfg,
              LoopConfig(max_steps=2, auto_budget=False),
              step_hook=lambda st, i: seen.append(i))
    assert seen and seen[0] == 0


def test_live_viewer_serves_renders():
    import cv2

    from emd_tpu.data import make_synthetic_scene
    from emd_tpu.data.seeding import build_scene_params
    from emd_tpu.scene import SceneConfig
    from emd_tpu.viewer import LiveViewer, make_scene_render_fn

    scene, _ = make_synthetic_scene(n_frames=3, n_cams=1, width=48,
                                    height=32, n_lidar=400)
    params, aux = build_scene_params(scene, n_lidar=300, n_random=200,
                                     sky_resolution=16)
    cfg = SceneConfig(budget=1 << 16, interpret=True)
    render, layers = make_scene_render_fn(cfg, 48, 32,
                                          scene.intrinsics[0])
    viewer = LiveViewer(render, (params, aux), scene.num_frames,
                        layers=layers, center=np.array([10.0, 0, 0]),
                        radius=14.0, port=0).start()
    try:
        page = urllib.request.urlopen(viewer.url, timeout=60).read()
        assert b"emd_tpu live viewer" in page
        meta = urllib.request.urlopen(viewer.url + "meta",
                                      timeout=60).read()
        assert b'"num_frames": 3' in meta

        def grab(q):
            raw = urllib.request.urlopen(
                viewer.url + "render?" + q, timeout=300).read()
            img = cv2.imdecode(np.frombuffer(raw, np.uint8),
                               cv2.IMREAD_COLOR)
            assert img is not None and img.shape == (32, 48, 3)
            return img

        full = grab("az=0.3&el=-0.2&r=14&tx=10&ty=0&tz=0&f=1&layer=full")
        assert full.std() > 1.0                      # not a blank frame
        bg = grab("az=0.3&el=-0.2&r=14&tx=10&ty=0&tz=0&f=1"
                  "&layer=background")
        assert not np.array_equal(full, bg)          # layers differ

        # publish() swaps state live (mid-training viewer semantics)
        brighter = params._replace(
            background=params.background._replace(
                sh_dc=params.background.sh_dc + 2.0))
        viewer.publish((brighter, aux))
        full2 = grab("az=0.3&el=-0.2&r=14&tx=10&ty=0&tz=0&f=1&layer=full")
        assert float(full2.mean()) > float(full.mean())
    finally:
        viewer.stop()
