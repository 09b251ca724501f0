from .server import LiveViewer, make_scene_render_fn
