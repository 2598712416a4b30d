"""HTTP live view — the headless re-design of the reference's GLFW
preview window (gl/glcode.h:108-151: a texture blit refreshed every
pass; main.cpp:321-325).

A real continuously-updating view of the RUNNING render: the render loop
publishes a tone-mapped PNG of the accumulator after passes (throttled
to ~2 fps of encodes so encoding never competes with dispatches), and a
daemon-thread HTTP server serves

  /            an auto-refreshing page (pass counter, rays note)
  /frame.png   the latest frame
  /status      {"spp": n, "total": n, "nan": n} JSON

Open http://<host>:<port>/ in any browser while the render runs —
`render.py --serve PORT` or RenderConfig(serve_port=...). Only the main
thread touches JAX; the server thread serves pre-encoded bytes.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_PAGE = b"""<!doctype html><html><head><title>craytracer_tpu live</title>
<style>body{background:#111;color:#ddd;font-family:monospace;text-align:center}
img{image-rendering:pixelated;max-width:90vw;max-height:80vh;margin-top:1em}
</style></head><body>
<div id=s>connecting...</div><img id=f src="/frame.png">
<script>
setInterval(async()=>{
  try{
    const r=await fetch('/status');const j=await r.json();
    document.getElementById('s').textContent=
      `pass ${j.spp} / ${j.total}`+(j.nan?` (nan=${j.nan})`:'');
    document.getElementById('f').src='/frame.png?t='+Date.now();
  }catch(e){}
},700);
</script></body></html>"""


class LiveView:
    """Shared state between the render loop (writer) and the HTTP
    server thread (reader)."""

    def __init__(self, port: int):
        self.port = port
        self._frame = b""
        self._status = {"spp": 0, "total": 0, "nan": 0}
        self._lock = threading.Lock()
        self._last_encode = 0.0
        self._server = None

    # -- render-loop side ---------------------------------------------------
    def want_frame(self, spp: int, total: int,
                   min_interval: float = 0.5) -> bool:
        """True when publish() would actually encode a frame — callers
        check this BEFORE paying the device->host image readback (a
        forced sync per pass otherwise, review finding)."""
        return spp >= total or time.time() - self._last_encode >= min_interval

    def update_status(self, spp: int, total: int, nan: int):
        with self._lock:
            self._status = {"spp": spp, "total": total, "nan": nan}

    def publish(self, image_u8, spp: int, total: int, nan: int,
                min_interval: float = 0.5):
        """Encode + publish the current frame (throttled). `image_u8` is
        the [H, W, 3] tone-mapped uint8 array the Renderer produces."""
        now = time.time()
        if now - self._last_encode < min_interval and spp < total:
            self.update_status(spp, total, nan)
            return
        self._last_encode = now
        import numpy as np
        from PIL import Image

        if image_u8.dtype != np.uint8:  # Renderer.image() is float [0,1]
            image_u8 = (np.clip(image_u8, 0.0, 1.0) * 255.0).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(image_u8).save(buf, format="PNG")
        with self._lock:
            self._frame = buf.getvalue()
            self._status = {"spp": spp, "total": total, "nan": nan}

    # -- server side --------------------------------------------------------
    def start(self):
        view = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                path = self.path.split("?")[0]
                if path == "/":
                    body, ctype = _PAGE, "text/html"
                elif path == "/frame.png":
                    with view._lock:
                        body = view._frame
                    ctype = "image/png"
                    if not body:
                        self.send_response(404)
                        self.end_headers()
                        return
                elif path == "/status":
                    with view._lock:
                        body = json.dumps(view._status).encode()
                    ctype = "application/json"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer(("0.0.0.0", self.port), Handler)
        self.port = self._server.server_address[1]  # resolve port 0
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        return self

    def stop(self):
        if self._server is not None:
            self._server.shutdown()
            self._server = None
