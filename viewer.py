"""Interactive viewer — the TPU-side substitute for the reference
dearpygui GUI (`gui.py`).

The reference couples rendering and UI in one process; on TPU the
idiomatic split is a jit'd render server and any thin client.  This
serves frames over HTTP (`GET /render?theta=..&phi=..&radius=..&mode=..`
returns a PNG; `GET /` returns a minimal pan/orbit HTML client;
`GET /modes` lists the available result channels), with per-frame
render-time reporting (the reference's FPS counter, `gui.py:193-220`)
and the shader animation clock (time/dt fed to shader stages).

Offline: `--turntable N` renders N orbit frames to --output and exits
(interactive-rate measurement without a client).
"""
from __future__ import annotations

import argparse
import io
import json
import os
import time


def orbit_camera(theta: float, phi: float, radius: float,
                 width: int, height: int, fovx: float = 0.9):
    """OrbitCamera analogue (`gui.py:32-95`)."""
    import numpy as np
    from relightable3dgaussian_tpu.ops import transforms as tf
    from relightable3dgaussian_tpu.scene.cameras import make_camera

    c = np.array([
        radius * np.cos(phi) * np.cos(theta),
        radius * np.sin(phi),
        radius * np.cos(phi) * np.sin(theta),
    ])
    fwd = -c / np.linalg.norm(c)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right /= max(np.linalg.norm(right), 1e-9)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=1)
    fovy = tf.focal2fov(tf.fov2focal(fovx, width), height)
    return make_camera(uid=0, R=R, t=-R.T @ c, fovx=fovx, fovy=fovy,
                       width=width, height=height)


_CLIENT_HTML = """<!doctype html><html><body style="margin:0;background:#111">
<img id=v width=100% style="image-rendering:pixelated">
<div id=s style="color:#0f0;font:12px monospace;position:fixed;top:4px;left:4px"></div>
<script>
// Pipelined streaming client: keep up to MAXQ requests in flight so
// frame N+1 renders on the device while frame N is PNG-encoding and
// in transit — the transport latency hides behind the render.  Frames
// are sequence-numbered; stale responses (an earlier frame finishing
// after a later one) are dropped instead of displayed.
let th=0.5, ph=0.3, r=2.5, li=0, drag=false, lx, ly, mode="render";
let inflight=0, MAXQ=2, seq=0, shown=-1, done=[];
async function frame(){ if(inflight>=MAXQ) return; inflight++;
 const my=seq++;
 try{
  const res=await fetch(`/render?theta=${th}&phi=${ph}&radius=${r}&mode=${mode}&light=${li}`);
  const blob=await res.blob();
  if(my>shown){ shown=my; v.src=URL.createObjectURL(blob);
   const now=performance.now(); done.push(now); while(done.length>24) done.shift();
   const fps=done.length>1 ? 1000*(done.length-1)/(done[done.length-1]-done[0]) : 0;
   s.textContent=`${fps.toFixed(1)} fps (pipelined x${MAXQ})  render ${res.headers.get('X-Render-Ms')} ms  θ=${th.toFixed(2)} φ=${ph.toFixed(2)} r=${r.toFixed(2)} [${mode}] (keys: m=mode, l/L=light, wheel=zoom)`;
  }
 } finally { inflight--; }
}
v.onmousedown=e=>{drag=true;lx=e.clientX;ly=e.clientY};
window.onmouseup=()=>drag=false;
window.onmousemove=e=>{if(!drag)return; th+=(e.clientX-lx)*0.01; ph+=(e.clientY-ly)*0.01;
 ph=Math.max(-1.4,Math.min(1.4,ph)); lx=e.clientX; ly=e.clientY; frame();};
window.onwheel=e=>{r*=e.deltaY>0?1.1:0.9; frame();};
window.onkeydown=async e=>{ if(e.key=='l'){li+=0.2;frame();} if(e.key=='L'){li-=0.2;frame();} if(e.key=='m'){ const ms=await (await fetch('/modes')).json();
 mode=ms[(ms.indexOf(mode)+1)%ms.length]; frame(); }};
frame(); setInterval(frame, 25);
</script></body></html>"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-p", "--ply", default=None)
    ap.add_argument("-co", "--config", default=None,
                    help="composition config dir (transform.json) — "
                         "load + merge multiple PLYs and relight "
                         "interactively (reference gui.py:388-407)")
    ap.add_argument("-e", "--envmap_path", default=None,
                    help="HDR env map for composition relighting")
    ap.add_argument("--bake", action="store_true",
                    help="composition: bake visibility SH instead of "
                         "ray-traced precompute")
    ap.add_argument("-t", "--type", default="render",
                    choices=["render", "neilf", "shader", "composite"])
    ap.add_argument("--width", type=int, default=400)
    ap.add_argument("--height", type=int, default=400)
    ap.add_argument("--port", type=int, default=8600)
    ap.add_argument("--sample_num", type=int, default=24)
    ap.add_argument("--sh_shader", default=None,
                    help="SH shader name for all splats (shader mode)")
    ap.add_argument("--splat_shader", default=None)
    ap.add_argument("--post", default="",
                    help="comma-separated post passes (shader mode)")
    ap.add_argument("--max_per_tile", type=int, default=None,
                    help="per-tile depth budget K (default: config)")
    ap.add_argument("--chunk", type=int, default=None)
    ap.add_argument("--turntable", type=int, default=0,
                    help="render N offline orbit frames and exit")
    ap.add_argument("--output", default="./turntable")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from relightable3dgaussian_tpu.models import lights as L
    from relightable3dgaussian_tpu.models import neilf as NF
    from relightable3dgaussian_tpu.models import render as R
    from relightable3dgaussian_tpu.models import shadergs
    from relightable3dgaussian_tpu.models import shaders as S
    from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
    from relightable3dgaussian_tpu.training import checkpoint as ckpt

    vis = envmap = None
    if args.config:
        import json as _json

        from relightable3dgaussian_tpu.models import compose
        args.type = "composite"
        with open(os.path.join(args.config, "transform.json")) as f:
            scene_dict = _json.load(f)
        st = compose.load_composition(scene_dict)
        if args.bake:
            st = compose.finetune_visibility(st, iterations=1000)
        else:
            print("precomputing ray-traced visibility...", flush=True)
            vis = compose.precompute_visibility(
                st, sample_num=args.sample_num)
        if args.envmap_path:
            envmap = L.load_envmap(args.envmap_path)
        else:
            envmap = L.EnvMap(image=jnp.ones((64, 128, 3)) * 0.8)
    else:
        if not args.ply:
            ap.error("one of --ply / --config is required")
        st = ckpt.load_ply(args.ply, use_pbr=args.type == "neilf")
        print(f"loaded {int(st.num_alive)} splats", flush=True)
    cfg_kw = {}
    if args.max_per_tile:
        cfg_kw["max_per_tile"] = args.max_per_tile
    if args.chunk:
        cfg_kw["chunk"] = args.chunk
    cfg = RasterizeConfig(width=args.width, height=args.height, **cfg_kw)
    bg = jnp.zeros(3)
    env = L.create_direct_light(3) if args.type == "neilf" else None
    clock = {"t0": time.time(), "last": 0.0}

    sh_ids = splat_ids = None
    post = [p for p in args.post.split(",") if p]
    if args.sh_shader:
        sh_ids = jnp.full(st.params.capacity,
                          list(S.SH_SHADERS).index(args.sh_shader),
                          jnp.int32)
    if args.splat_shader:
        splat_ids = jnp.full(st.params.capacity,
                             list(S.SPLAT_SHADERS).index(args.splat_shader),
                             jnp.int32)

    # One jitted frame function per mode: the render paths are pure
    # jittable fns; calling them eagerly dispatches thousands of ops
    # per frame through the device transport (measured 4.1 s/frame vs
    # ~60 ms jitted at 800², 100k splats on v5e).  Scalars that change
    # every frame (clock, light angle) are traced arguments.
    if args.type == "composite":
        from relightable3dgaussian_tpu.models import compose

        @jax.jit
        def frame_fn(camera, t, dt, light):
            ca, sa = jnp.cos(light), jnp.sin(light)
            rot = jnp.array([[ca, -sa, 0.0], [sa, ca, 0.0],
                             [0.0, 0.0, 1.0]])
            return compose.render_composite(
                st, camera, bg, cfg, envmap, visibility_precomp=vis,
                sample_num=args.sample_num, light_transform=rot)
    elif args.type == "neilf":
        @jax.jit
        def frame_fn(camera, t, dt, light):
            return NF.render_view(
                st.params, st.alive, camera, bg, cfg, env_light=env,
                sample_num=args.sample_num, is_training=False)
    elif args.type == "shader":
        @jax.jit
        def frame_fn(camera, t, dt, light):
            return shadergs.render(
                st.params, st.alive, camera, bg, cfg,
                sh_shader_ids=sh_ids, splat_shader_ids=splat_ids,
                post_passes=post, time=t, dt=dt)
    else:
        @jax.jit
        def frame_fn(camera, t, dt, light):
            return R.render_view(st.params, st.alive, camera, bg, cfg,
                                 compute_pseudo_normal=True)

    import threading
    dispatch_lock = threading.Lock()

    def render_frame(cam, mode="render", light=0.0):
        """Dispatch one frame; returns the DEVICE u8 image (async).

        Only the dispatch is serialized (`dispatch_lock`): the caller's
        device→host transfer and PNG encode run outside it, so with a
        threaded server the next frame's render overlaps this frame's
        encode + transport — the pipelining the streaming client relies
        on."""
        camera = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
        with dispatch_lock:
            now = (time.time() - clock["t0"]) * 1000.0
            dt = now - clock["last"]
            clock["last"] = now
            res = frame_fn(camera, jnp.float32(now), jnp.float32(dt),
                           jnp.float32(light))
            img = res.get(mode, res["render"])
            # display transforms + u8 quantization ON DEVICE:
            # transferring 800² f32 through the host link is 4x the
            # bytes of u8 and dominated the frame time
            if img.ndim == 2:
                img = jnp.repeat(img[..., None], 3, -1)
                img = img / jnp.maximum(jnp.max(img), 1e-6)
            if "normal" in mode:
                img = img * 0.5 + 0.5
            img = (jnp.clip(img[..., :3], 0, 1) * 255).astype(jnp.uint8)
        return img, res

    # warm up / compile
    t0 = time.time()
    img, res0 = render_frame(orbit_camera(0.5, 0.3, 2.5,
                                          args.width, args.height))
    modes = [k for k, v in res0.items()
             if hasattr(v, "ndim") and v.ndim in (2, 3)
             and v.shape[:2] == (args.height, args.width)]
    print(f"first frame (compile): {time.time() - t0:.1f}s; "
          f"modes: {modes}", flush=True)

    if args.turntable:
        from relightable3dgaussian_tpu.training.evaluate import save_image
        os.makedirs(args.output, exist_ok=True)
        times = []
        for i in range(args.turntable):
            t0 = time.time()
            img, _ = render_frame(orbit_camera(
                2 * np.pi * i / args.turntable, 0.3, 2.5,
                args.width, args.height),
                light=2 * np.pi * i / args.turntable)
            jax.block_until_ready(img)
            times.append(time.time() - t0)
            save_image(os.path.join(args.output, f"frame_{i:04d}.png"),
                       np.asarray(img) / 255.0)
        fps = 1.0 / float(np.median(times))
        print(f"turntable: {args.turntable} frames, median "
              f"{np.median(times) * 1000:.1f} ms/frame = {fps:.1f} fps",
              flush=True)
        # device-only rate: pipeline a block of frames and block once —
        # what a host-local deployment sees (no per-frame transport
        # round trip; the dev relay adds ~200 ms/frame of dispatch +
        # transfer that PCIe-attached hosts do not pay)
        cams = [orbit_camera(2 * np.pi * i / 8, 0.3, 2.5, args.width,
                             args.height) for i in range(8)]
        camd = [{k: jnp.asarray(v) for k, v in c.render_inputs().items()}
                for c in cams]
        z = jnp.float32(0.0)
        out = frame_fn(camd[0], z, z, z)
        jax.block_until_ready(out["render"])
        t0 = time.time()
        for cd in camd:
            out = frame_fn(cd, z, z, z)
        jax.block_until_ready(out["render"])
        dev_ms = (time.time() - t0) / len(camd) * 1000
        print(f"device-only (pipelined): {dev_ms:.1f} ms/frame = "
              f"{1000.0 / dev_ms:.1f} fps", flush=True)
        return

    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse
    from PIL import Image

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/":
                body = _CLIENT_HTML.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.end_headers()
                self.wfile.write(body)
                return
            if u.path == "/modes":
                body = json.dumps(modes).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
                return
            if u.path != "/render":
                self.send_response(404)
                self.end_headers()
                return
            q = parse_qs(u.query)
            get = lambda k, d: float(q.get(k, [d])[0])
            cam = orbit_camera(get("theta", 0.5), get("phi", 0.3),
                               get("radius", 2.5), args.width, args.height)
            mode = q.get("mode", ["render"])[0]
            t0 = time.time()
            img, _ = render_frame(cam, mode, light=get("light", 0.0))
            arr = np.asarray(img)  # device→host sync, outside the lock
            ms = (time.time() - t0) * 1000
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("X-Render-Ms", f"{ms:.1f}")
            self.end_headers()
            self.wfile.write(buf.getvalue())

    # Threaded: a second /render parses + encodes while the first is on
    # the device (dispatch itself is serialized by `dispatch_lock`) —
    # required for the client's pipelining to hide transport latency.
    srv = ThreadingHTTPServer(("127.0.0.1", args.port), Handler)
    print(f"serving on http://127.0.0.1:{args.port}/", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
