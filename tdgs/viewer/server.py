"""Interactive splat viewer — self-contained HTTP server (stdlib only).

Capability parity with the reference's viser/nerfview viewers
(examples/gsplat_viewer.py GsplatViewer + GsplatRenderTabState :8-32,
simple_viewer.py): a browser page with orbit/zoom controls streams rendered
JPEG frames from any render function; the render-tab knobs (sh degree,
near/far planes, radius_clip, eps2d, render mode rgb/depth/alpha) are
exposed as URL parameters and UI controls. viser/nerfview are not available
in this image, so the transport is a plain http.server — no dependencies.

Usage:
    viewer = ViewerServer(render_fn, port=8080)
    viewer.serve_forever()          # or .start() for a background thread

where render_fn(viewmat [4,4] np, K [3,3] np, width, height,
RenderTabState) -> uint8 image [H, W, 3].
"""

from __future__ import annotations

import io
import json
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np


@dataclass
class RenderTabState:
    """Render knobs (parity with GsplatRenderTabState, gsplat_viewer.py:8)."""

    max_sh_degree: int = 3
    near_plane: float = 0.01
    far_plane: float = 1e10
    radius_clip: float = 0.0
    eps2d: float = 0.3
    backgrounds: tuple = (0.0, 0.0, 0.0)
    render_mode: str = "rgb"  # rgb | depth | alpha
    inverse_depth: bool = False
    colormap: str = "turbo"


_PAGE = """<!doctype html><html><head><title>tdgs viewer</title><style>
body{margin:0;background:#111;color:#ddd;font-family:monospace}
#c{display:block;margin:auto;cursor:grab}
#hud{position:fixed;top:8px;left:8px;background:#0008;padding:8px}
select,input{background:#222;color:#ddd;border:1px solid #444}
</style></head><body>
<div id="hud">
 mode <select id="mode"><option>rgb</option><option>depth</option><option>alpha</option></select>
 sh <input id="sh" type="number" min="0" max="4" value="3" style="width:3em">
 <span id="fps"></span>
</div>
<img id="c" width="{W}" height="{H}">
<script>
let az=0.0, el=0.3, dist=6.0, tx=0, ty=0, tz=0, drag=null, pending=false, t0=0;
const img=document.getElementById('c');
function url(){
  return `/render?az=${az}&el=${el}&dist=${dist}&tx=${tx}&ty=${ty}&tz=${tz}`+
         `&mode=${document.getElementById('mode').value}`+
         `&sh=${document.getElementById('sh').value}&_=${Math.random()}`;
}
function refresh(){
  if(pending) return; pending=true; t0=performance.now();
  const u=url();
  const tmp=new Image();
  tmp.onload=()=>{img.src=u; pending=false;
    document.getElementById('fps').textContent=((performance.now()-t0)|0)+' ms';};
  tmp.src=u;
}
img.onmousedown=e=>{drag=[e.clientX,e.clientY];e.preventDefault()};
window.onmouseup=()=>drag=null;
window.onmousemove=e=>{if(!drag)return;
  az+=(e.clientX-drag[0])*0.01; el+=(e.clientY-drag[1])*0.01;
  el=Math.max(-1.5,Math.min(1.5,el)); drag=[e.clientX,e.clientY]; refresh();};
img.onwheel=e=>{dist*=Math.exp(e.deltaY*0.001); refresh(); e.preventDefault();};
document.getElementById('mode').onchange=refresh;
document.getElementById('sh').onchange=refresh;
refresh();
</script></body></html>"""


def orbit_camera(az: float, el: float, dist: float, target: np.ndarray):
    """world-to-camera matrix for an orbit camera (z-up world, OpenCV cam)."""
    cx = np.cos(az) * np.cos(el)
    cy = np.sin(az) * np.cos(el)
    cz = np.sin(el)
    eye = target + dist * np.array([cx, cy, cz], np.float32)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0, 0, 1], np.float32)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right) + 1e-12
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd])  # rows: cam x(right), y(down), z(fwd)
    t = -R @ eye
    vm = np.eye(4, dtype=np.float32)
    vm[:3, :3] = R
    vm[:3, 3] = t
    return vm


class ViewerServer:
    def __init__(
        self,
        render_fn: Callable,
        width: int = 960,
        height: int = 540,
        port: int = 8080,
        focal: Optional[float] = None,
        target=(0.0, 0.0, 0.0),
        state: Optional[RenderTabState] = None,
    ):
        self.render_fn = render_fn
        self.width = width
        self.height = height
        self.port = port
        self.focal = focal or 1.1 * max(width, height)
        self.target = np.asarray(target, np.float32)
        self.state = state or RenderTabState()
        self.lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    body = _PAGE.replace("{W}", str(outer.width)).replace(
                        "{H}", str(outer.height)
                    ).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(body)
                elif u.path == "/render":
                    try:
                        q = {k: v[0] for k, v in parse_qs(u.query).items()}
                        img = outer._render(q)
                        from PIL import Image

                        buf = io.BytesIO()
                        Image.fromarray(img).save(buf, "JPEG", quality=90)
                    except Exception:
                        import traceback

                        body = traceback.format_exc().encode()
                        self.send_response(500)
                        self.send_header("Content-Type", "text/plain")
                        self.end_headers()
                        self.wfile.write(body)
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.end_headers()
                    self.wfile.write(buf.getvalue())
                else:
                    self.send_response(404)
                    self.end_headers()

        self.httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)

    def _render(self, q) -> np.ndarray:
        st = self.state
        st.render_mode = q.get("mode", st.render_mode)
        st.max_sh_degree = int(q.get("sh", st.max_sh_degree))
        # resolution override (nerfview's max-img-res knob); keeps a stable
        # shape across requests so the render jit-caches
        width = max(16, min(int(q.get("w", self.width)), 4096))
        height = max(16, min(int(q.get("h", self.height)), 4096))
        vm = orbit_camera(
            float(q.get("az", 0)), float(q.get("el", 0.3)),
            float(q.get("dist", 6)), self.target
            + np.array([float(q.get("tx", 0)), float(q.get("ty", 0)),
                        float(q.get("tz", 0))], np.float32),
        )
        f = self.focal * width / self.width
        K = np.array(
            [
                [f, 0, width / 2],
                [0, f, height / 2],
                [0, 0, 1],
            ],
            np.float32,
        )
        with self.lock:  # render serially (shared device)
            img = self.render_fn(vm, K, width, height, st)
        return np.ascontiguousarray(img)

    def serve_forever(self):
        print(f"tdgs viewer at http://localhost:{self.port}")
        self.httpd.serve_forever()

    def start(self) -> threading.Thread:
        th = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        th.start()
        return th

    def shutdown(self):
        self.httpd.shutdown()


def make_splat_render_fn(splats, rasterizer: str = "auto",
                         model_type: str = "3dgs"):
    """Standard render_fn over a raw splat dict (viewer counterpart of
    Runner._viewer_render_fn, simple_trainer.py:1480-1518).

    ``model_type`` selects the render family, mirroring the reference's
    viewer variants: "3dgs" (simple_viewer.py), "2dgs" (surfel model,
    simple_viewer_2dgs.py), "3dgut" (world-space eval3d rasterization,
    simple_viewer_3dgut.py)."""
    import jax
    import jax.numpy as jnp

    from tdgs.rendering import rasterization, rasterization_2dgs

    sh = jnp.concatenate([splats["sh0"], splats["shN"]], axis=-2)
    on_tpu = jax.default_backend() == "tpu"

    def render_fn(viewmat, K, width, height, st: RenderTabState):
        mode = {"rgb": "RGB", "depth": "RGB+ED", "alpha": "RGB"}[st.render_mode]
        common = dict(
            sh_degree=min(st.max_sh_degree, 3),
            near_plane=st.near_plane, far_plane=st.far_plane,
            render_mode=mode,
            backgrounds=jnp.asarray(
                np.array(st.backgrounds, np.float32)
            )[None],
        )
        activations = (
            splats["means"], splats["quats"], jnp.exp(splats["scales"]),
            jax.nn.sigmoid(splats["opacities"]), sh,
            jnp.asarray(viewmat)[None], jnp.asarray(K)[None], width, height,
        )
        if model_type == "2dgs":
            out2 = rasterization_2dgs(
                *activations,
                radius_clip=st.radius_clip,
                rasterizer=(
                    "packed_inference" if on_tpu else "jax"
                ) if rasterizer == "auto" else rasterizer,
                **common,
            )
            img, alpha = out2[0], out2[1]
        elif model_type == "3dgut":
            img, alpha, _ = rasterization(
                *activations,
                radius_clip=st.radius_clip, eps2d=st.eps2d,
                rasterizer=(
                    "eval3d_packed" if on_tpu else "eval3d"
                ) if rasterizer == "auto" else rasterizer,
                **common,
            )
        else:
            img, alpha, _ = rasterization(
                *activations,
                radius_clip=st.radius_clip, eps2d=st.eps2d,
                rasterizer=(
                    "packed_inference" if on_tpu else "jax"
                ) if rasterizer == "auto" else rasterizer,
                **common,
            )
        out = np.asarray(img[0])
        if st.render_mode == "depth":
            d = out[..., -1]
            lo, hi = np.percentile(d[d > 0], [2, 98]) if (d > 0).any() else (0, 1)
            d = np.clip((d - lo) / max(hi - lo, 1e-6), 0, 1)
            out = np.stack([d, d, d], -1)
        elif st.render_mode == "alpha":
            a = np.asarray(alpha[0, ..., 0])
            out = np.stack([a, a, a], -1)
        else:
            out = out[..., :3]
        return (np.clip(out, 0, 1) * 255).astype(np.uint8)

    return render_fn
