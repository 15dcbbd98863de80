"""Live interactive model viewer over HTTP (headless 3-D window).

The reference opens a ``cv::viz`` interactive 3-D window plus image
windows on the local display (``EMFusion.cpp:162-233``,
``apps/EM-Fusion.cpp:169-186``). TPU hosts are headless; the
interactive analogue here is a tiny stdlib HTTP server running beside
the pipeline:

  * ``/``            control page: live stream + orbit controls
                     (arrow keys / buttons re-render the model from a
                     user-chosen virtual camera — the interactive part)
  * ``/stream``      MJPEG stream of the per-frame model rendering
  * ``/frame.png``   latest per-frame rendering (one shot)
  * ``/view.png?yaw=0.5&pitch=-0.25&dist=1.0``
                     on-demand novel-view raycast of the CURRENT fused
                     model (``viz.render_orbit_view`` — the pipeline's
                     own raycast+Phong programs from a virtual pose,
                     with object bounding boxes + camera frustum)
  * ``/status``      JSON: frame index, active object ids, camera pose

Thread-safety: the handler thread only reads ``pipe.state`` (an
immutable pytree reference the frame loop swaps atomically) and
dispatches jitted programs — JAX dispatch is thread-safe; a lock still
serializes novel-view renders so at most one competes with the frame
loop for the device.

Zero third-party dependencies beyond PIL (already used by viz.py).
Enable with ``run_emfusion --serve PORT``.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>emfusion-tpu live</title><style>
body { background:#111; color:#ddd; font-family: monospace; }
img { border: 1px solid #444; }
#controls { margin: 8px 0; }
button { background:#222; color:#ddd; border:1px solid #555;
         padding:4px 10px; margin-right:4px; }
</style></head><body>
<h3>emfusion-tpu live</h3>
<div id="controls">
  <button onclick="mode='stream';refresh()">camera view (live)</button>
  <button onclick="orbit(-0.3,0)">&#8592;</button>
  <button onclick="orbit(0.3,0)">&#8594;</button>
  <button onclick="orbit(0,-0.15)">&#8593;</button>
  <button onclick="orbit(0,0.15)">&#8595;</button>
  <button onclick="zoom(0.8)">+</button>
  <button onclick="zoom(1.25)">-</button>
  <span id="st"></span>
</div>
<img id="view" src="/stream" width="640">
<script>
let yaw=0, pitch=-0.25, dist=1.0, mode='stream';
function orbit(dy, dp) { yaw+=dy; pitch+=dp; mode='orbit'; refresh(); }
function zoom(f) { dist*=f; mode='orbit'; refresh(); }
function refresh() {
  const img = document.getElementById('view');
  img.src = (mode=='stream') ? '/stream'
    : `/view.png?yaw=${yaw}&pitch=${pitch}&dist=${dist}&t=${Date.now()}`;
}
document.addEventListener('keydown', e => {
  if (e.key=='ArrowLeft') orbit(-0.3,0);
  if (e.key=='ArrowRight') orbit(0.3,0);
  if (e.key=='ArrowUp') orbit(0,-0.15);
  if (e.key=='ArrowDown') orbit(0,0.15);
});
setInterval(async () => {
  const s = await (await fetch('/status')).json();
  document.getElementById('st').textContent =
    ` frame ${s.frame}  objects ${JSON.stringify(s.objects)}`;
}, 1000);
</script></body></html>"""


def _encode_png(img: np.ndarray) -> bytes:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.ascontiguousarray(img)).save(buf, format="PNG")
    return buf.getvalue()


def _encode_jpeg(img: np.ndarray) -> bytes:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.ascontiguousarray(img)).save(buf, format="JPEG",
                                                    quality=85)
    return buf.getvalue()


class LiveViewer:
    """Background HTTP viewer; ``publish()`` per processed frame."""

    def __init__(self, pipe, port: int = 0, host: str = "127.0.0.1"):
        # loopback by default: the stream exposes scene renderings and
        # camera poses with no auth (ADVICE r4) -- opt into remote
        # access explicitly via --serve-host 0.0.0.0.
        self.pipe = pipe
        self._latest: bytes | None = None
        self._latest_seq = 0
        self._cond = threading.Condition()
        self._render_lock = threading.Lock()
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, ctype, body):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                try:
                    if u.path == "/":
                        self._send(200, "text/html",
                                   _PAGE.encode())
                    elif u.path == "/frame.png":
                        img = viewer._latest_img()
                        self._send(200, "image/png", _encode_png(img))
                    elif u.path == "/view.png":
                        q = parse_qs(u.query)

                        def f(k, d):
                            return float(q.get(k, [d])[0])

                        img = viewer.render_view(
                            f("yaw", 0.0), f("pitch", -0.25),
                            f("dist", 1.0))
                        self._send(200, "image/png", _encode_png(img))
                    elif u.path == "/status":
                        self._send(200, "application/json",
                                   json.dumps(viewer.status()).encode())
                    elif u.path == "/stream":
                        self._stream()
                    else:
                        self._send(404, "text/plain", b"not found")
                except BrokenPipeError:
                    pass
                except Exception as e:  # keep the viewer alive
                    try:
                        self._send(500, "text/plain",
                                   f"{type(e).__name__}: {e}".encode())
                    except Exception:
                        pass

            def _stream(self):
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace; boundary=emf")
                self.end_headers()
                seq = -1
                while True:
                    with viewer._cond:
                        viewer._cond.wait_for(
                            lambda: viewer._latest_seq != seq,
                            timeout=5.0)
                        seq = viewer._latest_seq
                        data = viewer._latest
                    if data is None:
                        data = _encode_jpeg(viewer._latest_img())
                    self.wfile.write(b"--emf\r\n")
                    self.wfile.write(b"Content-Type: image/jpeg\r\n")
                    self.wfile.write(
                        f"Content-Length: {len(data)}\r\n\r\n".encode())
                    self.wfile.write(data)
                    self.wfile.write(b"\r\n")

        self.server = ThreadingHTTPServer((host, port), Handler)
        self.port = self.server.server_port
        self._thread = threading.Thread(target=self.server.serve_forever,
                                        daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------
    def publish(self, img: np.ndarray | None = None):
        """Publish the per-frame rendering (default: pipe.render())."""
        if img is None:
            img = self.pipe.render()
        data = _encode_jpeg(np.asarray(img, np.uint8))
        with self._cond:
            self._latest = data
            self._latest_seq += 1
            self._cond.notify_all()

    def _latest_img(self) -> np.ndarray:
        if self._latest is not None:
            from PIL import Image
            return np.asarray(Image.open(io.BytesIO(self._latest)))
        return np.zeros((self.pipe.H, self.pipe.W, 3), np.uint8)

    def render_view(self, yaw: float, pitch: float,
                    dist: float) -> np.ndarray:
        from emfusion_tpu.viz import render_orbit_view
        p = self.pipe.params
        base_r = 1.1 * max(p.globalVolumeDims) * p.globalVoxelSize
        with self._render_lock:
            return render_orbit_view(self.pipe, yaw, pitch=pitch,
                                     radius=dist * base_r)

    def status(self) -> dict:
        pipe = self.pipe
        return {
            "frame": pipe.frame,
            "objects": [int(i) for i in pipe._h_ids[pipe._h_active]],
            "cam_pose": [[float(v) for v in row]
                         for row in pipe._h_cam_pose],
        }

    def close(self):
        self.server.shutdown()
        self.server.server_close()
