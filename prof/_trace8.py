"""Capture a profiler trace of the chunk=128 full step, then summarize."""
import glob
import gzip
import json
import os
import shutil
import time

import numpy as np
import jax, jax.numpy as jnp

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.models import render as R
from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
from relightable3dgaussian_tpu.scene.cameras import make_camera

rng = np.random.default_rng(0)
W = H = 800
P = 100_000
z = rng.uniform(1.2, 4.0, P)
half = np.tan(0.45) * z
x = rng.uniform(-1, 1, P) * half
y = rng.uniform(-1, 1, P) * half
pts = np.stack([x, y, 2.8 - z], -1).astype(np.float32)
cols = rng.uniform(0, 1, (P, 3)).astype(np.float32)
state = G.create_from_points(pts, cols, capacity=131_072,
                             init_scale=np.full(P, 0.012, np.float32))
c = np.array([0.0, 0.0, 2.8])
fwd_v = -c / np.linalg.norm(c)
up = np.array([0.0, 1.0, 0.0])
r = np.cross(fwd_v, up)
dn = np.cross(fwd_v, r)
Rm = np.stack([r, dn, fwd_v], 1)
cam = make_camera(uid=0, R=Rm, t=-Rm.T @ c, fovx=0.9, fovy=0.9,
                  width=W, height=H)
ci = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
bg = jnp.zeros(3)
target = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))
loss_cfg = R.LossConfig(lambda_dssim=0.2)
cfg = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=32,
                      max_per_tile=512, chunk=128)


@jax.jit
def fwd_bwd(params):
    def loss_fn(p):
        results = R.render_view(
            p, state.alive, ci, bg, cfg, active_sh_degree=3,
            compute_pseudo_normal=False)
        loss, _ = R.calculate_loss(results, {"image": target}, loss_cfg)
        return loss
    return jax.value_and_grad(loss_fn)(params)


out = fwd_bwd(state.params)
jax.block_until_ready(out)
t0 = time.perf_counter()
out = fwd_bwd(state.params)
jax.block_until_ready(out)
print(f"step: {(time.perf_counter()-t0)*1000:.1f} ms", flush=True)

tracedir = "/tmp/jaxtrace8"
shutil.rmtree(tracedir, ignore_errors=True)
with jax.profiler.trace(tracedir):
    for _ in range(3):
        out = fwd_bwd(state.params)
        jax.block_until_ready(out)

# summarize: find trace.json.gz and aggregate per-op durations
paths = glob.glob(tracedir + "/**/*.trace.json.gz", recursive=True)
print("trace files:", paths, flush=True)
agg = {}
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0)
        pid = ev.get("pid", 0)
        agg.setdefault(name, [0, 0.0])
        agg[name][0] += 1
        agg[name][1] += dur
rows = sorted(agg.items(), key=lambda kv: -kv[1][1])[:45]
for name, (cnt, dur) in rows:
    print(f"{dur/3/1000.0:9.2f} ms x{cnt:4d}  {name[:110]}")
