"""Opt-in remote experiment tracking over plain HTTP — the capability
class of the reference's wandb mirror (OmniRe/tools/train.py:63-74
init-with-retry-forever, :211-235 scalar logging) without the external
SDK or service: scalars are POSTed as JSON lines to a user-supplied
endpoint (a wandb proxy, a Grafana/InfluxDB ingester, or the 10-line
collector in this docstring).

Design points mirrored from the reference:
- init retries with backoff instead of failing the run (train.py:64-74
  loops `wandb.init` forever); here the first POST probes the endpoint
  and a dead tracker degrades to a buffered no-op rather than stalling
  training (`max_failures`).
- logging is fire-and-forget from the train loop's perspective: a
  single background thread drains a bounded queue, so a slow endpoint
  never blocks a train step; on overflow the OLDEST rows drop first
  (the newest metrics are the ones a dashboard needs).
- everything stdlib (urllib + threading): zero-egress builds simply
  never construct one (opt-in via --track_url / EMD_TPU_TRACK_URL).

Collector sketch (run anywhere with python):
    import http.server, json
    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            for line in self.rfile.read(n).splitlines():
                print(json.loads(line))
            self.send_response(200); self.end_headers()
    http.server.HTTPServer(("", 8787), H).serve_forever()
"""
from __future__ import annotations

import json
import queue
import threading
import urllib.request


class RemoteTracker:
    """POSTs metric rows (JSON lines, batched) to `url`."""

    def __init__(self, url: str, run_name: str = "emd_tpu",
                 flush_every: int = 20, queue_size: int = 2048,
                 max_failures: int = 5, timeout: float = 3.0):
        self.url = url
        self.run_name = run_name
        self.flush_every = flush_every
        self.timeout = timeout
        self.max_failures = max_failures
        self._failures = 0
        self._dead = False
        self._q: queue.Queue = queue.Queue(maxsize=queue_size)
        self._buf: list[str] = []
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._drain, daemon=True)
        self._thread.start()

    # -- train-loop side (never blocks) ----------------------------------
    def log(self, step: int, scalars: dict) -> None:
        if self._dead:
            return
        row = {"run": self.run_name, "step": int(step)}
        row.update({k: float(v) for k, v in scalars.items()})
        try:
            self._q.put_nowait(json.dumps(row))
        except queue.Full:
            try:                      # drop OLDEST, keep the fresh row
                self._q.get_nowait()
                self._q.put_nowait(json.dumps(row))
            except (queue.Empty, queue.Full):
                pass

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2 * self.timeout + 1)

    # -- sender thread ---------------------------------------------------
    def _drain(self) -> None:
        while not (self._stop.is_set() and self._q.empty()
                   and not self._buf):
            try:
                self._buf.append(self._q.get(timeout=0.2))
            except queue.Empty:
                pass
            full_batch = len(self._buf) >= self.flush_every
            final = self._stop.is_set() and self._q.empty()
            if self._buf and (full_batch or final):
                self._post("\n".join(self._buf))
                self._buf = []
            if self._dead:
                return

    def _post(self, body: str) -> None:
        req = urllib.request.Request(
            self.url, data=body.encode(),
            headers={"Content-Type": "application/x-ndjson"})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout):
                self._failures = 0
        except Exception:
            self._failures += 1
            if self._failures >= self.max_failures:
                self._dead = True   # degrade to no-op, never stall a run
