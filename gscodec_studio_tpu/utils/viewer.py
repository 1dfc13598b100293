"""Minimal interactive splat viewer — self-contained HTTP server.

The reference uses viser/nerfview (examples/simple_viewer.py:162-200);
neither ships in this image, so this is a dependency-free equivalent: a
tiny HTTP server that renders JPEG frames on demand from orbit camera
parameters controlled by mouse drag/wheel in an inline HTML page. Works
against any render callback (static splats, a dyn model at a timestamp,
a Runner's render_view).

Usage:
    from gscodec_studio_tpu.utils.viewer import SplatViewer
    v = SplatViewer(lambda c2w, K, w, h: runner.render_view(c2w, K, w, h))
    v.serve(port=8080)  # blocking; or v.start() / v.stop() for background
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>gscodec viewer</title><style>
body{margin:0;background:#111;color:#ccc;font-family:monospace}
#hud{position:fixed;top:8px;left:8px}
img{display:block;margin:0 auto;image-rendering:auto}
</style></head><body>
<div id="hud">drag: orbit &middot; wheel: zoom &middot; shift-drag: pan</div>
<img id="view" width="WIDTH" height="HEIGHT"/>
<script>
let theta=0.6, phi=0.4, radius=RADIUS, cx=0, cy=0, cz=0, busy=false, dirty=true;
const img=document.getElementById('view');
function refresh(){
  if(busy){dirty=true;return;}
  busy=true; dirty=false;
  img.src='/render?theta='+theta+'&phi='+phi+'&radius='+radius+
          '&cx='+cx+'&cy='+cy+'&cz='+cz+'&t='+Date.now();
}
img.onload=()=>{busy=false; if(dirty) refresh();};
img.onerror=()=>{busy=false;};
let drag=null;
window.addEventListener('mousedown',e=>{drag=[e.clientX,e.clientY,e.shiftKey];});
window.addEventListener('mouseup',()=>{drag=null;});
window.addEventListener('mousemove',e=>{
  if(!drag) return;
  const dx=e.clientX-drag[0], dy=e.clientY-drag[1];
  if(drag[2]){cx+=dx*radius*-0.002; cy+=dy*radius*0.002;}
  else {theta+=dx*0.01; phi=Math.max(-1.5,Math.min(1.5,phi+dy*0.01));}
  drag=[e.clientX,e.clientY,drag[2]]; refresh();
});
window.addEventListener('wheel',e=>{radius*=Math.exp(e.deltaY*0.001);refresh();});
refresh();
</script></body></html>"""


def _orbit_c2w(theta, phi, radius, center):
    eye = center + radius * np.array(
        [np.cos(phi) * np.cos(theta), np.sin(phi),
         np.cos(phi) * np.sin(theta)], np.float32
    )
    fwd = center - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.array([0, -1, 0], np.float32))
    n = np.linalg.norm(right)
    right = right / (n if n > 1e-6 else 1.0)
    up = np.cross(fwd, right)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, fwd, eye
    return c2w


class SplatViewer:
    """render_fn(c2w [4,4], K [3,3], width, height) -> [H, W, 3] in [0,1]."""

    def __init__(
        self,
        render_fn: Callable,
        width: int = 640,
        height: int = 480,
        focal: Optional[float] = None,
        center=(0.0, 0.0, 0.0),
        radius: float = 4.0,
    ):
        self.render_fn = render_fn
        self.width, self.height = width, height
        self.focal = focal or 0.9 * width
        self.center = np.asarray(center, np.float32)
        self.radius = radius
        self._server: Optional[ThreadingHTTPServer] = None

    def _render_jpeg(self, q) -> bytes:
        import imageio.v2 as imageio

        g = lambda k, d: float(q.get(k, [d])[0])
        c2w = _orbit_c2w(
            g("theta", 0.6), g("phi", 0.4), g("radius", self.radius),
            self.center + np.array(
                [g("cx", 0), g("cy", 0), g("cz", 0)], np.float32
            ),
        )
        K = np.array(
            [[self.focal, 0, self.width / 2],
             [0, self.focal, self.height / 2], [0, 0, 1]], np.float32
        )
        img = np.asarray(self.render_fn(c2w, K, self.width, self.height))
        img8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        buf = io.BytesIO()
        imageio.imwrite(buf, img8, format="jpeg")
        return buf.getvalue()

    def _handler(self):
        viewer = self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/render":
                    try:
                        data = viewer._render_jpeg(parse_qs(u.query))
                    except Exception as e:  # surface render errors to HTTP
                        self.send_response(500)
                        self.end_headers()
                        self.wfile.write(str(e).encode())
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.end_headers()
                    self.wfile.write(data)
                else:
                    page = (
                        _PAGE.replace("WIDTH", str(viewer.width))
                        .replace("HEIGHT", str(viewer.height))
                        .replace("RADIUS", str(viewer.radius))
                    )
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(page.encode())

        return H

    def start(self, port: int = 8080) -> int:
        self._server = ThreadingHTTPServer(("0.0.0.0", port), self._handler())
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        return self._server.server_address[1]

    def stop(self):
        if self._server is not None:
            self._server.shutdown()
            self._server = None

    def serve(self, port: int = 8080):
        print(f"viewer at http://localhost:{port}/", flush=True)
        self.start(port)
        try:
            threading.Event().wait()
        except KeyboardInterrupt:
            self.stop()
