"""Remote experiment tracking (utils/tracker.py) against a live local
HTTP collector — the reference's opt-in wandb mirror capability
(OmniRe/tools/train.py:63-74,211-235) without the SDK."""
import http.server
import json
import threading
import time

from emd_tpu.utils.tracker import RemoteTracker


class _Collector(http.server.BaseHTTPRequestHandler):
    rows: list = []

    def do_POST(self):
        n = int(self.headers["Content-Length"])
        for line in self.rfile.read(n).splitlines():
            _Collector.rows.append(json.loads(line))
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):  # quiet
        pass


def test_tracker_posts_rows():
    _Collector.rows = []
    srv = http.server.HTTPServer(("127.0.0.1", 0), _Collector)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        tr = RemoteTracker(f"http://127.0.0.1:{port}/log",
                           run_name="t", flush_every=5)
        for i in range(12):
            tr.log(i, {"loss": 1.0 / (i + 1), "psnr": 20.0 + i})
        tr.close()
        assert len(_Collector.rows) == 12
        assert _Collector.rows[0]["run"] == "t"
        assert _Collector.rows[3]["step"] == 3
        assert abs(_Collector.rows[4]["psnr"] - 24.0) < 1e-9
    finally:
        srv.shutdown()


def test_tracker_dead_endpoint_degrades_without_stalling():
    tr = RemoteTracker("http://127.0.0.1:1/nope", max_failures=2,
                       flush_every=1, timeout=0.2)
    t0 = time.time()
    for i in range(50):
        tr.log(i, {"loss": 0.5})
    tr.close()
    # never blocks the caller and gives up after max_failures posts
    assert time.time() - t0 < 5.0
    assert tr._dead


def test_metric_logger_mirrors_to_tracker(tmp_path):
    _Collector.rows = []
    srv = http.server.HTTPServer(("127.0.0.1", 0), _Collector)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        from emd_tpu.utils.logging import MetricLogger
        ml = MetricLogger(str(tmp_path), tb=False,
                          track_url=f"http://127.0.0.1:{port}/log")
        ml.update(loss=0.25, psnr=30.0)
        ml.dump(step=7)
        ml.tracker.close()
        assert len(_Collector.rows) == 1
        assert _Collector.rows[0]["step"] == 7
        assert abs(_Collector.rows[0]["loss"] - 0.25) < 1e-9
    finally:
        srv.shutdown()
