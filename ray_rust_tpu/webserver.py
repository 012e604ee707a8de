"""Interactive web viewer — thin host client of the jitted TPU renderer.

Replaces the reference's hyper/tokio server (src/webserver.rs): same routes
(``/`` embedded HTML+JS client, ``/image`` static file, ``/render`` with
``x,y,z,yaw,pitch`` query params in degrees, webserver.rs:64-299), same
controls (WASD/QZ move, arrows turn). Camera pose is a traced pytree leaf, so
every request reuses the compiled executable — per-request cost is one device
launch + PNG encode, no recompile (unlike the reference, which re-renders on a
CPU thread pool per request, webserver.rs:30-50).
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from .config import RenderConfig
from .models.quat import Quat
from .models.scene import Scene, SceneMeta
from .models.vec import v3
from .renderer import render_u8
from .utils.image import encode_png

__all__ = ["run_webserver", "make_server"]

_PAGE = """<html>
<head>
    <title>ray-rust-tpu</title>
    <script>
    window.onload = function(){
        var im = document.getElementById('render');
        var label = document.getElementById('label');
        var x = %(x)f, y = %(y)f, z = %(z)f, yaw = %(yaw)f, pitch = %(pitch)f;
        var buttonStates = {w:false,s:false,a:false,d:false,q:false,z:false,
            ArrowRight:false,ArrowLeft:false,ArrowUp:false,ArrowDown:false};
        function updatePos(){
            fetch(`/render?x=${x}&y=${y}&z=${z}&yaw=${yaw}&pitch=${pitch}`)
                .then(r => { if(r.ok) return r.blob(); })
                .then(b => { im.src = URL.createObjectURL(b); tryUpdate(); })
                .catch(e => console.log('fetch problem: ', e.message));
            label.innerHTML = `x=${x}<br>y=${y}<br>z=${z}<br>yaw=${yaw}<br>pitch=${pitch}`;
        }
        function tryUpdate(){
            var ok = false;
            var s = Math.sin(yaw * Math.PI / 180), c = Math.cos(yaw * Math.PI / 180);
            if(buttonStates.a){ x += 10*s; z += 10*c; ok = true; }
            if(buttonStates.d){ x -= 10*s; z -= 10*c; ok = true; }
            if(buttonStates.w){ x += 10*c; z -= 10*s; ok = true; }
            if(buttonStates.s){ x -= 10*c; z += 10*s; ok = true; }
            if(buttonStates.q){ y += 10; ok = true; }
            if(buttonStates.z){ y -= 10; ok = true; }
            if(buttonStates.ArrowRight){ yaw += 5; ok = true; }
            if(buttonStates.ArrowLeft){ yaw -= 5; ok = true; }
            if(buttonStates.ArrowUp){ pitch -= 5; ok = true; }
            if(buttonStates.ArrowDown){ pitch += 5; ok = true; }
            if(ok){ updatePos(); return true; }
            return false;
        }
        updatePos();
        window.onkeydown = function(e){
            if(e.key in buttonStates){
                if(!buttonStates[e.key]){ buttonStates[e.key] = true; tryUpdate(); }
                e.preventDefault();
            }
        }
        window.onkeyup = function(e){
            if(e.key in buttonStates){ buttonStates[e.key] = false; e.preventDefault(); }
        }
    }
    </script>
    <style> table { border-collapse: collapse; border: solid; } </style>
</head>
<body>
    <h1>ray-rust-tpu web interface</h1>
    <img id='render'>
    <hr>
    <h2>Controls</h2>
    <table border='1'>
    <tr><td>W</td><td>forward</td></tr>
    <tr><td>S</td><td>backward</td></tr>
    <tr><td>A</td><td>left</td></tr>
    <tr><td>D</td><td>right</td></tr>
    <tr><td>Q</td><td>up</td></tr>
    <tr><td>Z</td><td>down</td></tr>
    <tr><td>Left arrow</td><td>Turn left</td></tr>
    <tr><td>Right arrow</td><td>Turn right</td></tr>
    <tr><td>Up arrow</td><td>Turn up</td></tr>
    <tr><td>Down arrow</td><td>Turn down</td></tr>
    </table>
    <hr>
    <h2>Debug</h2>
    <div id='label'></div>
</body></html>"""


def make_server(scene: Scene, meta: SceneMeta, cfg: RenderConfig, port: int):
    """Build (but don't start) the HTTP server; exposed for tests."""
    render_lock = threading.Lock()
    pos0 = [float(np.asarray(c)) for c in scene.camera.position]
    pyr0 = [float(np.asarray(c)) for c in scene.camera.pyr]

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route prints like the reference
            print("Got request:", fmt % args)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                body = (_PAGE % {
                    "x": pos0[0], "y": pos0[1], "z": pos0[2],
                    "yaw": pyr0[1] * 180.0 / np.pi,
                    "pitch": pyr0[0] * 180.0 / np.pi,
                }).encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/image":
                # static file passthrough (webserver.rs:209-221)
                try:
                    with open("barb.png", "rb") as f:
                        buf = f.read()
                    self.send_response(200)
                    self.end_headers()
                    self.wfile.write(buf)
                except OSError:
                    self.send_response(200)
                    self.end_headers()
                    self.wfile.write(b"image")
            elif url.path == "/render":
                q = parse_qs(url.query)

                def fget(name):
                    try:
                        return float(q.get(name, ["0"])[0])
                    except ValueError:
                        return 0.0

                x, y, z = fget("x"), fget("y"), fget("z")
                yaw = fget("yaw") * np.pi / 180.0
                pitch = fget("pitch") * np.pi / 180.0
                pyr = v3(pitch, yaw, pyr0[2])
                cam = scene.camera._replace(
                    position=v3(x, y, z), pyr=pyr, rotation=Quat.from_pyr(pyr)
                )
                with render_lock:
                    img = render_u8(scene._replace(camera=cam), cfg)
                png = encode_png(img)
                self.send_response(200)
                self.send_header("Cache-Control", "no-cache")
                self.send_header("Content-Type", "image/png")
                self.end_headers()
                self.wfile.write(png)
            else:
                self.send_response(404)
                self.end_headers()
                self.wfile.write(b"empty")

    return ThreadingHTTPServer(("0.0.0.0", port), Handler)


def run_webserver(scene: Scene, meta: SceneMeta, cfg: RenderConfig, port: int = 3000):
    server = make_server(scene, meta, cfg, port)
    print(f"Listening on http://0.0.0.0:{port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
