"""Interactive real-time viewer — the serve() surface of the framework.

Re-design of ``inference/nerfs/radnerf_gui.py``: an :class:`OrbitCamera`
(orbit/pan/zoom in the ngp convention, ``radnerf_gui.py:21-79``), a
:class:`RealtimeRenderer` with dynamic-resolution scaling that holds a target
frame time (``radnerf_gui.py:216-221``), and two frontends:

- :class:`NeRFGUI` — dearpygui desktop app (only if ``dearpygui`` is
  importable; it is not shipped in the TPU image);
- :class:`NeRFWebGUI` — zero-dependency ``http.server`` viewer (JPEG frames +
  keyboard/mouse orbit controls), the TPU-native remote-serving equivalent:
  the chip renders, any browser displays.

The render path reuses the jitted frame renderer from
:class:`~geneface_tpu.inference.radnerf_infer.RADNeRFInfer` — one compiled
function per (H, W) resolution bucket, so dynamic resolution quantizes the
downscale to a fixed ladder (0.25/0.5/0.75/1.0) instead of continuous scales
(a TPU divergence: continuous scales would recompile every change).
"""

from __future__ import annotations

import io
import json
import math
import threading
import time

import jax.numpy as jnp
import numpy as np

from geneface_tpu.data.radnerf_dataset import get_cond_window
from geneface_tpu.utils.camera import euler_to_matrix, get_rays

__all__ = ["OrbitCamera", "RealtimeRenderer", "NeRFGUI", "NeRFWebGUI"]


def _rotvec_to_matrix(rotvec: np.ndarray) -> np.ndarray:
    """Rodrigues' formula (replaces scipy's ``R.from_rotvec``)."""
    theta = float(np.linalg.norm(rotvec))
    if theta < 1e-12:
        return np.eye(3, dtype=np.float32)
    k = rotvec / theta
    K = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]], np.float32
    )
    return np.eye(3, dtype=np.float32) + math.sin(theta) * K + (
        1 - math.cos(theta)
    ) * (K @ K)


class OrbitCamera:
    """Orbit camera in the ngp axis convention (``radnerf_gui.py:21-79``)."""

    def __init__(self, W: int, H: int, r: float = 2.0, fovy: float = 60.0):
        self.W = W
        self.H = H
        self.radius = r
        self.fovy = fovy
        self.center = np.zeros(3, np.float32)
        self.rot = np.array(
            [[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32
        )
        self.up = np.array([1, 0, 0], np.float32)

    @property
    def pose(self) -> np.ndarray:
        res = np.eye(4, dtype=np.float32)
        res[2, 3] -= self.radius
        rot = np.eye(4, dtype=np.float32)
        rot[:3, :3] = self.rot
        res = rot @ res
        res[:3, 3] -= self.center
        return res

    def update_pose(self, pose: np.ndarray) -> None:
        self.radius = float(np.linalg.norm(pose[:3, 3]))
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = -self.radius
        rot = pose @ np.linalg.inv(T)
        self.rot = rot[:3, :3].astype(np.float32)

    def update_intrinsics(self, intrinsics) -> None:
        fl_x, fl_y, cx, cy = [float(v) for v in intrinsics]
        self.W = int(cx * 2)
        self.H = int(cy * 2)
        self.fovy = math.degrees(2 * math.atan2(self.H, 2 * fl_y))

    @property
    def intrinsics(self) -> np.ndarray:
        focal = self.H / (2 * math.tan(math.radians(self.fovy) / 2))
        return np.array([focal, focal, self.W // 2, self.H // 2], np.float32)

    def orbit(self, dx: float, dy: float) -> None:
        side = self.rot[:3, 0]
        rx = _rotvec_to_matrix(self.up * math.radians(-0.01 * dx))
        ry = _rotvec_to_matrix(side * math.radians(-0.01 * dy))
        self.rot = rx @ ry @ self.rot

    def scale(self, delta: float) -> None:
        self.radius *= 1.1 ** (-delta)

    def pan(self, dx: float, dy: float, dz: float = 0.0) -> None:
        self.center += 1e-4 * (self.rot @ np.array([dx, dy, dz], np.float32))


_DOWNSCALE_LADDER = (1.0, 0.75, 0.5, 0.25)


class RealtimeRenderer:
    """Per-frame render loop with FPS-holding dynamic resolution
    (``radnerf_gui.py:181-240``). Wraps a built
    :class:`~geneface_tpu.inference.radnerf_infer.RADNeRFInfer`."""

    def __init__(self, infer, target_frame_ms: float = 40.0,
                 dynamic_resolution: bool = True):
        self.infer = infer
        self.ds = infer.dataset
        self.target_frame_ms = target_frame_ms
        self.dynamic_resolution = dynamic_resolution
        self.downscale = 1.0
        #: fixes the downscale rung and disables the dynamic ladder (the
        #: reference GUI's manual downscale override)
        self.downscale_override: float | None = None
        self.cond_index = 0
        self.ind_index = 0
        # render knobs (reference radnerf_gui.py:427-471 sliders); None →
        # the config value. Each distinct setting traces one new executable
        # (cached), the TPU analog of the reference's need_update re-render.
        self.dt_gamma: float | None = None
        self.max_steps: int | None = None
        self.t_thresh: float | None = None
        #: solid background override [r, g, b] in [0,1]; None → dataset bg
        self.bg_color: list | None = None
        self.last_frame_ms = 0.0
        self._jit_cache: dict = {}

    def _resolution(self):
        scale = self.downscale_override or self.downscale
        H = max(int(self.ds.H * scale) // 8 * 8, 8)
        W = max(int(self.ds.W * scale) // 8 * 8, 8)
        return H, W

    def _render_fn(self):
        """Jitted frame fn honoring the current knob values (one cached
        trace per distinct (dt_gamma, max_steps, t_thresh) tuple)."""
        import jax

        key = (self.dt_gamma, self.max_steps, self.t_thresh)
        fn = self._jit_cache.get(key)
        if fn is None:
            ov = {}
            if self.dt_gamma is not None:
                ov["dt_gamma"] = float(self.dt_gamma)
            if self.max_steps is not None:
                ov["max_steps"] = int(self.max_steps)
            if self.t_thresh is not None:
                ov["T_thresh"] = float(self.t_thresh)
            self.infer._render_overrides = ov
            fn = jax.jit(
                self.infer._render_frame, static_argnames=("ray_capacity",)
            )
            self._jit_cache[key] = fn
        # _render_frame consults _render_overrides at trace time; keep it
        # in sync in case a new resolution triggers a retrace of `fn`
        self.infer._render_overrides = {
            k: v
            for k, v in zip(
                ("dt_gamma", "max_steps", "T_thresh"), key
            )
            if v is not None
        }
        return fn

    def render(self, cam: OrbitCamera, cond_wins_all=None) -> np.ndarray:
        """→ uint8 frame [h, w, 3] at the current dynamic resolution."""
        infer = self.infer
        ds = self.ds
        H, W = self._resolution()
        fx, fy, cx, cy = [float(v) for v in cam.intrinsics]
        scale_h = H / cam.H
        scale_w = W / cam.W
        intr = (fx * scale_w, fy * scale_h, cx * scale_w, cy * scale_h)
        rays = get_rays(cam.pose, intr, H, W)

        conds = cond_wins_all if cond_wins_all is not None else ds.conds
        i = self.cond_index % len(conds)
        cond = jnp.asarray(
            get_cond_window(conds, i, infer.cfg.get("smo_win_size", 5))
        )
        di = i % len(ds)
        item = ds[di]
        if self.bg_color is not None:
            bg = np.broadcast_to(
                np.asarray(self.bg_color, np.float32).reshape(1, 3),
                (H * W, 3),
            ).copy()
        else:
            bg_key = "bg_img" if infer.torso else "bg_torso_img"
            bg = np.asarray(item[bg_key]).reshape(ds.H, ds.W, 3)
            # nearest-resample the background to the render resolution
            yi = (np.arange(H) * ds.H // H)[:, None]
            xi = (np.arange(W) * ds.W // W)[None, :]
            bg = bg[yi, xi].reshape(-1, 3)
        bg_coords = np.stack(
            [
                (np.arange(H * W) % W) / max(W - 1, 1) * 2 - 1,
                (np.arange(H * W) // W) / max(H - 1, 1) * 2 - 1,
            ],
            axis=-1,
        ).astype(np.float32)

        occ_pack = (
            (infer.occ, infer.torso_occ) if infer.torso else (infer.occ,)
        )
        # k-DOP ray cull at the current rung: full-res capacity scaled by
        # the pixel ratio (the production cull, conservative for orbit
        # poses near the dataset's; extreme zoom-ins can exceed the
        # capacity and render the overflow as background — the same trade
        # the dynamic-resolution ladder already makes with quality)
        cap = None
        if infer.cfg.get("infer_ray_cull", True):
            if infer._ray_capacity is None:
                infer._ray_capacity = infer._pick_ray_capacity()
            if infer._ray_capacity:
                frac = (H * W) / float(ds.H * ds.W)
                cap = min(
                    -(-int(infer._ray_capacity * frac) // 4096) * 4096,
                    H * W,
                )
                cap = cap if cap < H * W else None
        t0 = time.time()
        rgb = self._render_fn()(
            infer.params, occ_pack,
            jnp.asarray(rays["rays_o"]), jnp.asarray(rays["rays_d"]),
            jnp.asarray(bg), jnp.asarray(bg_coords), cond,
            jnp.asarray(item["pose"]), int(self.ind_index),
            ray_capacity=cap, cull_kdop=infer._cull_kdop,
        )
        frame = np.asarray(rgb).reshape(H, W, 3)
        dt_ms = (time.time() - t0) * 1e3
        self.last_frame_ms = dt_ms

        if self.dynamic_resolution and self.downscale_override is None:
            # pick the ladder rung whose full-res-equivalent time meets the
            # target (radnerf_gui.py:216-221, quantized for jit reuse)
            full_t = dt_ms / (self.downscale**2)
            want = min(1.0, max(0.25, math.sqrt(self.target_frame_ms / full_t)))
            for rung in _DOWNSCALE_LADDER:
                if rung <= want * 1.2:
                    break
            if rung != self.downscale:
                self.downscale = rung
        return (np.clip(frame, 0, 1) * 255).astype(np.uint8)


class NeRFGUI:
    """dearpygui desktop frontend (``radnerf_gui.py:81-607``). Available only
    where dearpygui is installed; the TPU image ships without it — use
    :class:`NeRFWebGUI` there."""

    def __init__(self, infer, W: int = 512, H: int = 512):
        try:
            import dearpygui.dearpygui as dpg  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "dearpygui is not installed in this image; use NeRFWebGUI "
                "for the browser-based viewer"
            ) from e
        self.dpg = dpg
        self.renderer = RealtimeRenderer(infer)
        self.cam = OrbitCamera(W, H)
        self.cam.update_intrinsics(infer.dataset.intrinsics)

    def render(self):  # pragma: no cover - needs a display
        dpg = self.dpg
        dpg.create_context()
        W, H = self.cam.W, self.cam.H
        frame = self.renderer.render(self.cam).astype(np.float32) / 255.0
        with dpg.texture_registry():
            dpg.add_raw_texture(
                W, H, frame.ravel(), format=dpg.mvFormat_Float_rgb,
                tag="_texture",
            )
        rend = self.renderer
        with dpg.window(tag="_primary"):
            dpg.add_image("_texture")
            # the reference's control panel (radnerf_gui.py:427-471)
            dpg.add_slider_int(
                label="Audio", min_value=0,
                max_value=max(len(rend.ds.conds) - 1, 0),
                callback=lambda s, a: setattr(rend, "cond_index", a),
            )
            dpg.add_slider_int(
                label="Individual", min_value=0, max_value=1 << 12,
                callback=lambda s, a: setattr(rend, "ind_index", a),
            )
            dpg.add_slider_int(
                label="FoV (vertical)", min_value=1, max_value=120,
                default_value=int(self.cam.fovy),
                callback=lambda s, a: setattr(self.cam, "fovy", a),
            )
            dpg.add_slider_float(
                label="dt_gamma", min_value=0.0, max_value=0.1,
                format="%.5f",
                callback=lambda s, a: setattr(rend, "dt_gamma", a),
            )
            dpg.add_slider_int(
                label="max steps", min_value=1, max_value=64,
                default_value=16,
                callback=lambda s, a: setattr(rend, "max_steps", a),
            )
            dpg.add_slider_float(
                label="T_thresh", min_value=1e-5, max_value=1e-1,
                format="%.5f",
                callback=lambda s, a: setattr(rend, "t_thresh", a),
            )
            dpg.add_color_edit(
                (255, 255, 255), label="Background Color", no_alpha=True,
                callback=lambda s, a: setattr(
                    rend, "bg_color", [float(c) for c in a[:3]]
                ),
            )
        with dpg.handler_registry():
            dpg.add_mouse_drag_handler(
                callback=lambda s, a: (
                    self.cam.orbit(a[1], a[2]),
                )
            )
            dpg.add_mouse_wheel_handler(
                callback=lambda s, a: self.cam.scale(a)
            )
        dpg.create_viewport(title="geneface-tpu", width=W, height=H)
        dpg.setup_dearpygui()
        dpg.show_viewport()
        dpg.set_primary_window("_primary", True)
        while dpg.is_dearpygui_running():
            frame = self.renderer.render(self.cam).astype(np.float32) / 255.0
            dpg.set_value("_texture", frame.ravel())
            self.renderer.cond_index += 1
            dpg.render_dearpygui_frame()
        dpg.destroy_context()


_PAGE = """<!doctype html><html><head><title>geneface-tpu viewer</title>
<style>body{margin:0;background:#111;color:#eee;font:13px monospace;
display:flex}#hud{position:fixed;top:8px;left:8px}
#panel{padding:10px;min-width:260px}#panel label{display:block;margin:6px 0}
#panel input{width:120px;vertical-align:middle}</style></head>
<body><div><img id="v" draggable="false"><div id="hud"></div></div>
<div id="panel">
<label>audio <input type=range id=cond_index min=0 max=0 step=1>
  <span id=cond_index_v></span></label>
<label>ind code <input type=number id=ind_index min=0 value=0></label>
<label>FoV <input type=range id=fovy min=1 max=120 step=1>
  <span id=fovy_v></span></label>
<label>dt_gamma <input type=number id=dt_gamma step=0.001 placeholder=cfg></label>
<label>max steps <input type=number id=max_steps min=1 max=64 placeholder=cfg></label>
<label>T_thresh <input type=number id=t_thresh step=0.0001 placeholder=cfg></label>
<label>downscale <select id=downscale><option value=0>auto</option>
  <option value=1>1.0</option><option value=0.75>0.75</option>
  <option value=0.5>0.5</option><option value=0.25>0.25</option></select></label>
<label>target ms <input type=number id=target_frame_ms min=1 value=40></label>
</div><script>
let playing = true;
const KEYS = ['cond_index','ind_index','fovy','dt_gamma','max_steps',
              't_thresh','downscale','target_frame_ms'];
async function loadState(){
  const s = await (await fetch('/state')).json();
  document.getElementById('cond_index').max = s.n_conds - 1;
  for (const k of KEYS){ const el = document.getElementById(k);
    if (s[k] !== null && s[k] !== undefined) el.value = s[k]; }
}
for (const k of KEYS){
  document.getElementById(k).onchange = e => {
    const v = e.target.value;
    fetch('/state', {method:'POST',
      body: JSON.stringify({[k]: v === '' ? null : parseFloat(v)})});
  };
}
async function tick(){
  const img = document.getElementById('v');
  const r = await fetch('/frame' + (playing ? '?advance=1' : ''));
  const meta = JSON.parse(r.headers.get('x-meta'));
  img.src = URL.createObjectURL(await r.blob());
  document.getElementById('hud').textContent =
    `frame ${meta.cond_index}  ${meta.w}x${meta.h}  ${meta.ms.toFixed(1)} ms`;
  document.getElementById('cond_index').value = meta.cond_index;
  setTimeout(tick, 10);
}
let drag = null;
v.onmousedown = e => drag = [e.clientX, e.clientY];
window.onmouseup = () => drag = null;
window.onmousemove = e => { if (drag) {
  fetch(`/orbit?dx=${e.clientX-drag[0]}&dy=${e.clientY-drag[1]}`);
  drag = [e.clientX, e.clientY]; } };
window.onwheel = e => fetch(`/zoom?d=${e.deltaY>0?-1:1}`);
window.onkeydown = e => { if (e.key===' ') playing = !playing; };
loadState(); tick();
</script></body></html>"""


class NeRFWebGUI:
    """Browser viewer over plain ``http.server`` — no GUI dependencies.

    Endpoints: ``/`` (page), ``/frame[?advance=1]`` (JPEG + x-meta header),
    ``/orbit?dx&dy``, ``/zoom?d``, ``/state``.
    """

    def __init__(self, infer, host: str = "127.0.0.1", port: int = 8765):
        self.renderer = RealtimeRenderer(infer)
        self.cam = OrbitCamera(infer.dataset.W, infer.dataset.H)
        self.cam.update_intrinsics(infer.dataset.intrinsics)
        self.cam.update_pose(np.asarray(infer.dataset.poses[0]))
        self.host = host
        self.port = port
        self._lock = threading.Lock()

    def _encode_jpeg(self, frame: np.ndarray) -> bytes:
        import cv2

        ok, buf = cv2.imencode(
            ".jpg", cv2.cvtColor(frame, cv2.COLOR_RGB2BGR),
            [int(cv2.IMWRITE_JPEG_QUALITY), 90],
        )
        assert ok
        return bytes(buf)

    def make_handler(self):
        gui = self

        from http.server import BaseHTTPRequestHandler
        from urllib.parse import parse_qs, urlparse

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, body, ctype="text/html", extra=None):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                for k, v in (extra or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                q = parse_qs(u.query)
                if u.path == "/":
                    self._send(200, _PAGE.encode())
                elif u.path == "/frame":
                    with gui._lock:
                        if q.get("advance"):
                            gui.renderer.cond_index += 1
                        frame = gui.renderer.render(gui.cam)
                    meta = json.dumps(
                        {
                            "cond_index": gui.renderer.cond_index,
                            "h": frame.shape[0],
                            "w": frame.shape[1],
                            "ms": gui.renderer.last_frame_ms,
                        }
                    )
                    self._send(
                        200, gui._encode_jpeg(frame), "image/jpeg",
                        {"x-meta": meta},
                    )
                elif u.path == "/orbit":
                    with gui._lock:
                        gui.cam.orbit(
                            float(q.get("dx", [0])[0]), float(q.get("dy", [0])[0])
                        )
                    self._send(200, b"ok", "text/plain")
                elif u.path == "/zoom":
                    with gui._lock:
                        gui.cam.scale(float(q.get("d", [0])[0]))
                    self._send(200, b"ok", "text/plain")
                elif u.path == "/state":
                    self._send(
                        200, json.dumps(gui.state()).encode(),
                        "application/json",
                    )
                else:
                    self._send(404, b"not found", "text/plain")

            def do_POST(self):
                u = urlparse(self.path)
                if u.path != "/state":
                    self._send(404, b"not found", "text/plain")
                    return
                n = int(self.headers.get("Content-Length", 0))
                try:
                    payload = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    self._send(400, b"bad json", "text/plain")
                    return
                with gui._lock:
                    gui.apply_state(payload)
                self._send(
                    200, json.dumps(gui.state()).encode(), "application/json"
                )

        return Handler

    # ------------------------------------------------- control surface ----
    #: every reference GUI slider (radnerf_gui.py:427-471) has a state key:
    #: audio scrub (cond_index), individual code (ind_index), FoV (fovy),
    #: dt_gamma, max_steps, T_thresh (t_thresh), manual downscale
    #: (downscale_override, 0/None → dynamic ladder), bg color, target FPS.
    def state(self) -> dict:
        r = self.renderer
        return {
            "radius": float(self.cam.radius),
            "fovy": float(self.cam.fovy),
            "downscale": float(r.downscale_override or r.downscale),
            "downscale_override": r.downscale_override,
            "dynamic_resolution": bool(r.dynamic_resolution),
            "cond_index": int(r.cond_index),
            "n_conds": int(len(self.renderer.ds.conds)),
            "ind_index": int(r.ind_index),
            "dt_gamma": r.dt_gamma,
            "max_steps": r.max_steps,
            "t_thresh": r.t_thresh,
            "bg_color": r.bg_color,
            "target_frame_ms": float(r.target_frame_ms),
            "last_frame_ms": float(r.last_frame_ms),
        }

    def apply_state(self, payload: dict) -> None:
        r = self.renderer
        if "fovy" in payload:
            self.cam.fovy = float(np.clip(float(payload["fovy"]), 1.0, 120.0))
        if "radius" in payload:
            self.cam.radius = max(float(payload["radius"]), 1e-3)
        if "cond_index" in payload:
            r.cond_index = int(payload["cond_index"])
        if "ind_index" in payload:
            r.ind_index = max(int(payload["ind_index"]), 0)
        if "dt_gamma" in payload:
            v = payload["dt_gamma"]
            r.dt_gamma = None if v in (None, "") else float(v)
        if "max_steps" in payload:
            v = payload["max_steps"]
            r.max_steps = None if v in (None, "") else max(int(v), 1)
        if "t_thresh" in payload:
            v = payload["t_thresh"]
            r.t_thresh = None if v in (None, "") else float(v)
        if "bg_color" in payload:
            v = payload["bg_color"]
            r.bg_color = None if v in (None, "") else [
                float(np.clip(c, 0.0, 1.0)) for c in v
            ][:3]
        if "downscale" in payload:
            v = float(payload["downscale"] or 0)
            r.downscale_override = None if v <= 0 else min(
                _DOWNSCALE_LADDER, key=lambda x: abs(x - v)
            )
        if "target_frame_ms" in payload:
            r.target_frame_ms = max(float(payload["target_frame_ms"]), 1.0)

    def serve(self, blocking: bool = True):
        from http.server import ThreadingHTTPServer

        self.httpd = ThreadingHTTPServer(
            (self.host, self.port), self.make_handler()
        )
        print(f"NeRFWebGUI serving on http://{self.host}:{self.port}")
        if blocking:  # pragma: no cover
            self.httpd.serve_forever()
        else:
            self._thread = threading.Thread(
                target=self.httpd.serve_forever, daemon=True
            )
            self._thread.start()
        return self.httpd

    def close(self):
        if hasattr(self, "httpd"):
            self.httpd.shutdown()
            self.httpd.server_close()
