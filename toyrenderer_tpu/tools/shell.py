"""Interactive shell: browser-based viewer with live HUD + camera input.

The reference is an interactive windowed renderer — WinMain message pump,
WASD/mouse camera, and an ImGui HUD with per-renderer ms, FPS and pipeline
statistics (source/Engine.cpp:259-353, Scene.cpp:530-562).  A TPU host has
no swapchain, so the shell is a tiny HTTP server instead: the render loop
streams JPEG frames to a browser page that sends camera/input events back
and renders the HUD (frame ms, cull/raster counters, exposure) as a side
panel.  Pass toggles retrace the (cached) jitted frame like the
reference's imgui-mutated Scene booleans.

Usage:
  python -m toyrenderer_tpu.tools.shell --scene resources/cornell.gltf \
      --displayresolution 960x540 --port 8787 [--platform cpu]
then open http://localhost:8787/ (keys: WASD move, QE up/down, arrows or
mouse-drag look, 0-9 debug views).
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>toyrenderer_tpu shell</title><style>
 body { margin:0; background:#14151a; color:#d8dbe2;
        font:13px/1.45 system-ui, sans-serif; display:flex; }
 #view { flex:1; display:flex; align-items:center; justify-content:center; }
 #frame { max-width:100%; image-rendering:pixelated; outline:none; }
 #hud  { width:300px; padding:14px 16px; background:#1b1d24;
         border-left:1px solid #2a2d36; overflow-y:auto; }
 h1 { font-size:14px; margin:0 0 10px; color:#fff; }
 table { border-collapse:collapse; width:100%; margin-bottom:12px; }
 td { padding:1px 4px; border-bottom:1px solid #262933; }
 td.v { text-align:right; font-variant-numeric:tabular-nums; }
 .k { color:#8a8fa3; }
 button { background:#2a2d36; color:#d8dbe2; border:1px solid #3a3e4a;
          border-radius:4px; margin:2px; padding:3px 8px; cursor:pointer; }
 button.on { background:#3d5afe33; border-color:#3d5afe; }
 #help { color:#666c7e; font-size:11px; margin-top:10px; }
</style></head><body>
<div id=view><img id=frame tabindex=0></div>
<div id=hud><h1>toyrenderer_tpu</h1>
 <table id=stats></table>
 <div id=toggles></div>
 <div id=props></div>
 <div id=help>WASD move &middot; QE up/down &middot; drag or arrows look
 &middot; 0&ndash;9 debug view &middot; toggles retrace (first frame after
 a toggle recompiles)</div>
</div>
<script>
const img = document.getElementById('frame');
let seq = 0;
function tick() {
  img.src = '/frame.jpg?x=' + (seq++);
}
img.onload = () => setTimeout(tick, 16);
img.onerror = () => setTimeout(tick, 250);
tick();
function send(o) { fetch('/input', {method:'POST', body:JSON.stringify(o)}); }
const held = new Set();
window.addEventListener('keydown', e => {
  if (e.repeat) return;
  if (e.key >= '0' && e.key <= '9') send({debug:+e.key});
  else held.add(e.key.toLowerCase());
});
window.addEventListener('keyup', e => held.delete(e.key.toLowerCase()));
setInterval(() => { if (held.size) send({keys:[...held]}); }, 50);
let drag = null;
img.addEventListener('mousedown', e => drag = [e.clientX, e.clientY]);
window.addEventListener('mouseup', () => drag = null);
window.addEventListener('mousemove', e => {
  if (!drag) return;
  send({look:[(e.clientX-drag[0])*0.004, (e.clientY-drag[1])*0.004]});
  drag = [e.clientX, e.clientY];
});
const TOGGLES = ['shadows','ao','gi','taa','bloom','culling','autoexposure'];
let propsInit = false;
async function hud() {
  try {
    const s = await (await fetch('/stats.json')).json();
    const rows = Object.entries(s.stats).map(
      ([k,v]) => `<tr><td class=k>${k}</td><td class=v>${v}</td></tr>`);
    document.getElementById('stats').innerHTML = rows.join('');
    document.getElementById('toggles').innerHTML = TOGGLES.map(t =>
      `<button class="${s.toggles[t]?'on':''}"
        onclick='send({toggle:"${t}"})'>${t}</button>`).join('');
    if (!propsInit) {      // property grid (Scene.cpp:528-660 parity)
      propsInit = true;
      const P = s.props;
      document.getElementById('props').innerHTML = `
       <table>
        <tr><td class=k>sun azim</td><td><input type=range min=-3.14
         max=3.14 step=0.02 value=${P.sun_az} id=p_sun_az></td></tr>
        <tr><td class=k>sun elev</td><td><input type=range min=0.05
         max=1.5 step=0.02 value=${P.sun_el} id=p_sun_el></td></tr>
        <tr><td class=k>sun inten</td><td><input type=range min=0 max=20
         step=0.25 value=${P.sun_intensity} id=p_sun_intensity></td></tr>
        <tr><td class=k>exposure</td><td><input type=range min=-10 max=2
         step=0.1 value=${Math.log2(P.exposure)} id=p_exposure></td></tr>
        <tr><td class=k>forced lod</td><td><select id=p_forced_lod>
         ${[-1,0,1,2,3].map(v=>`<option ${v==P.forced_lod?'selected':''}
          value=${v}>${v<0?'auto':v}</option>`).join('')}
        </select></td></tr>
        <tr><td class=k>shadow tech</td><td><select id=p_shadowtech>
         ${['map','rt'].map(v=>`<option ${v==P.shadowtech?'selected':''}
          value=${v}>${v}</option>`).join('')}
        </select></td></tr>
       </table>`;
      for (const id of ['sun_az','sun_el','sun_intensity','exposure',
                        'forced_lod','shadowtech']) {
        document.getElementById('p_'+id).addEventListener('change', e => {
          let v = e.target.value;
          if (id == 'exposure') v = Math.pow(2, +v);
          send({set:{[id]: id=='shadowtech' ? v : +v}});
        });
      }
    }
  } catch (e) {}
  setTimeout(hud, 500);
}
hud();
</script></body></html>"""


class _State:
    def __init__(self):
        self.lock = threading.Lock()
        self.jpeg = b""
        self.stats = {}
        self.toggles = {}
        self.props = {}
        self.inputs = []          # pending input events


def _make_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/frame.jpg"):
                with state.lock:
                    body = state.jpeg
                if not body:
                    self._send(503, "text/plain", b"no frame yet")
                else:
                    self._send(200, "image/jpeg", body)
            elif self.path.startswith("/stats.json"):
                with state.lock:
                    body = json.dumps(dict(stats=state.stats,
                                           toggles=state.toggles,
                                           props=state.props))
                self._send(200, "application/json", body.encode())
            else:
                self._send(200, "text/html", _PAGE.encode())

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                ev = json.loads(self.rfile.read(n) or b"{}")
            except ValueError:
                ev = {}
            with state.lock:
                state.inputs.append(ev)
            self._send(200, "text/plain", b"ok")
    return Handler


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="resources/cornell.gltf")
    p.add_argument("--displayresolution", default="960x540")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--platform", default=None)
    p.add_argument("--exposure", type=float, default=0.01)
    p.add_argument("--speed", type=float, default=None,
                   help="camera move speed (units/s); default scene-sized")
    p.add_argument("--max-frames", type=int, default=0,
                   help="exit after N frames (0 = run until killed)")
    args = p.parse_args(argv)

    import jax

    from toyrenderer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from PIL import Image

    from toyrenderer_tpu.scene import load_scene
    from toyrenderer_tpu.engine import RenderSettings, init_carry, View
    from toyrenderer_tpu.engine.frame import (
        make_render_fn, default_frame_inputs)
    from toyrenderer_tpu.ops.geometry import static_meshlet_pairs

    w, h = (int(x) for x in args.displayresolution.split("x"))
    scene_host = load_scene(args.scene)
    scene = scene_host.to_device()
    pi, pm = static_meshlet_pairs(scene_host)
    pi, pm = jnp.asarray(pi), jnp.asarray(pm)
    ext = float(np.linalg.norm(
        np.asarray(scene_host.world_aabb[1])
        - np.asarray(scene_host.world_aabb[0])))
    speed = args.speed if args.speed else max(ext * 0.25, 1e-3)

    view = View.from_scene(scene_host, w, h)
    toggles = dict(shadows=False, ao=False, gi=False, taa=False,
                   bloom=False, culling=False, autoexposure=False)
    debug = [0]
    # runtime-editable scene properties (the reference's imgui property
    # grid, Scene.cpp:528-660): sun direction/intensity and exposure are
    # DYNAMIC frame inputs (no retrace); forced LOD and the shadow
    # technique are static settings (cached retrace)
    sd = np.asarray(scene_host.sun_direction, dtype=float)
    props = dict(
        sun_az=float(np.arctan2(sd[0], sd[2])),
        sun_el=float(np.arcsin(np.clip(-sd[1], -1, 1))),
        sun_intensity=float(scene_host.sun_intensity),
        exposure=float(args.exposure),
        forced_lod=-1, shadowtech='map')

    def sun_dir():
        ce = np.cos(props['sun_el'])
        return np.asarray([np.sin(props['sun_az']) * ce,
                           -np.sin(props['sun_el']),
                           np.cos(props['sun_az']) * ce], np.float32)

    def make_settings(t=None):
        t = t if t is not None else toggles
        vol_on = t['gi']
        return RenderSettings(
            width=w, height=h, manual_exposure=props['exposure'],
            debug_mode=debug[0],
            enable_shadows=t['shadows'],
            shadow_technique=props['shadowtech'],
            enable_ao=t['ao'], enable_gi=vol_on,
            enable_taa=t['taa'],
            enable_bloom=t['bloom'],
            enable_culling=t['culling'],
            enable_auto_exposure=t['autoexposure'],
            forced_lod=props['forced_lod'])

    state = _State()
    state.toggles = dict(toggles)
    state.props = dict(props)
    server = ThreadingHTTPServer(("0.0.0.0", args.port),
                                 _make_handler(state))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    print(f"[shell] serving http://localhost:{args.port}/  "
          f"({w}x{h}, scene extent {ext:.1f})")

    from toyrenderer_tpu.ops.ddgi import volume_from_aabb
    ddgi_volume = volume_from_aabb(scene_host.world_aabb[0],
                                   scene_host.world_aabb[1])
    rt_static_box = [None]

    def get_rt_static(settings):
        if not (settings.enable_gi or (settings.enable_shadows and
                                       settings.shadow_technique == 'rt')):
            return None
        if rt_static_box[0] is None:
            from toyrenderer_tpu.ops.bvh_sah import build_rt_static_auto
            # shell uses the 'all' pair filter, so masked pairs are
            # already in the RT list (no separate set to append)
            rt_static_box[0] = build_rt_static_auto(
                scene_host, np.asarray(pi), np.asarray(pm))
        return rt_static_box[0]

    def vol_for(settings):
        return ddgi_volume if settings.enable_gi else None

    settings = make_settings()
    carry = init_carry(scene, settings)
    render = make_render_fn(settings)

    # -- background prewarm: AOT-compile the one-toggle-flip neighbours
    # of the current settings so a HUD toggle pays only a persistent-
    # cache deserialize (seconds) instead of a full remote compile -------
    def prewarm():
        view_p = View.from_scene(scene_host, w, h)
        fi_p = default_frame_inputs(scene_host, view_p.matrices())
        for name in list(toggles):
            t2 = dict(toggles)
            t2[name] = not t2[name]
            try:
                s2 = make_settings(t2)
                c2 = init_carry(scene, s2, vol_for(s2))
                fn2 = make_render_fn(s2, vol_for(s2))
                fn2.lower(scene, pi, pm, fi_p, c2,
                          rt_static=get_rt_static(s2)).compile()
            except Exception as e:     # pragma: no cover - best effort
                print(f"[prewarm] {name}: {type(e).__name__}: {e}")

    threading.Thread(target=prewarm, daemon=True).start()
    ema_ms = None
    frames = 0
    last_t = time.time()
    while True:
        # -- drain input events ------------------------------------------
        with state.lock:
            events, state.inputs = state.inputs, []
        dt = min(time.time() - last_t, 0.25)
        last_t = time.time()
        retrace = False
        for ev in events:
            if 'keys' in ev:
                k = set(ev['keys'])
                step = speed * max(dt, 0.05)
                view.move(
                    forward=step * (('w' in k) - ('s' in k)),
                    right=step * (('d' in k) - ('a' in k)),
                    up=step * (('e' in k) - ('q' in k)))
                look = 1.5 * max(dt, 0.05)
                yaw = look * (('arrowright' in k) - ('arrowleft' in k))
                pit = look * (('arrowdown' in k) - ('arrowup' in k))
                if yaw or pit:
                    view.rotate_yaw_pitch(yaw, pit)
            if 'look' in ev:
                view.rotate_yaw_pitch(ev['look'][0], ev['look'][1])
            if 'debug' in ev:
                debug[0] = int(ev['debug'])
                retrace = True
            if 'toggle' in ev and ev['toggle'] in toggles:
                toggles[ev['toggle']] = not toggles[ev['toggle']]
                retrace = True
            if 'set' in ev:
                for k, v in ev['set'].items():
                    if k not in props:
                        continue
                    props[k] = (v if isinstance(props[k], str)
                                else float(v) if k != 'forced_lod'
                                else int(v))
                    if k in ('forced_lod', 'shadowtech'):
                        retrace = True       # static settings
                    elif k == 'exposure':
                        carry['exposure'] = jnp.asarray(
                            props['exposure'], jnp.float32)
        if retrace:
            settings = make_settings()
            carry = init_carry(scene, settings,
                               vol_for(settings))  # shapes may change
            render = make_render_fn(settings, vol_for(settings))
            with state.lock:
                state.toggles = dict(toggles)
                state.props = dict(props)
                state.stats = dict(state.stats, status='compiling...')

        # -- render one frame --------------------------------------------
        mats = view.matrices()
        fi = default_frame_inputs(scene_host, mats)
        # live sun properties (dynamic inputs: no retrace needed)
        sdir = sun_dir()
        if (abs(props['sun_az']) > 1e-6 or props['sun_el'] != 0.0):
            from toyrenderer_tpu.ops.shadowmap import sun_ortho_matrix
            from toyrenderer_tpu.ops.sky import hosek_sky_params
            # host numpy: make_render_fn packs these into the single
            # per-frame transfer (device values would force a readback)
            fi['sun_direction'] = np.asarray(sdir, np.float32)
            fi['sun_intensity'] = np.asarray(props['sun_intensity'],
                                             np.float32)
            fi['sun_view_proj'] = np.asarray(sun_ortho_matrix(
                scene_host.world_aabb, sdir), np.float32)
            fi['sky_params'] = np.asarray(hosek_sky_params(
                2.5, -sdir), np.float32)
        t0 = time.time()
        image, carry, aux = render(scene, pi, pm, fi, carry,
                                   rt_static=get_rt_static(settings))
        image = np.asarray(image)                 # device sync
        ms = (time.time() - t0) * 1000.0
        view.advance(mats)
        ema_ms = ms if ema_ms is None or ms > 4 * ema_ms else \
            0.9 * ema_ms + 0.1 * ms

        buf = io.BytesIO()
        Image.fromarray(image).save(buf, format="JPEG", quality=88)
        stats = {
            'frame ms': f"{ema_ms:.2f}",
            'fps': f"{1000.0 / max(ema_ms, 1e-3):.1f}",
            'resolution': f"{w}x{h}",
            'debug view': debug[0],
            'exposure': f"{float(carry['exposure']):.4f}",
            'covered px': int((np.asarray(aux['tri_id']) >= 0).sum()),
        }
        # device memory telemetry (the reference HUD's VRAM row,
        # Engine.cpp:414-423)
        mem = getattr(jax.devices()[0], 'memory_stats', lambda: None)()
        if mem:
            used = mem.get('bytes_in_use', 0)
            peak = mem.get('peak_bytes_in_use', 0)
            stats['hbm used'] = f"{used / 2**20:.0f} MB"
            stats['hbm peak'] = f"{peak / 2**20:.0f} MB"
        for k in ('early_instances', 'late_instances', 'early_pairs',
                  'late_pairs', 'resolved_pixels', 'raster_tris',
                  'raster_binned_pairs', 'early_raster_binned_pairs',
                  'late_raster_binned_pairs'):
            if k in aux:
                stats[k.replace('_', ' ')] = int(aux[k])
        with state.lock:
            state.jpeg = buf.getvalue()
            state.stats = stats
        frames += 1
        if args.max_frames and frames >= args.max_frames:
            break
    server.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
