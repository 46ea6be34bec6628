"""Dump compiled HLO of the full step; identify the big fusions.
Also time pipelined dispatch (block once per 10 steps)."""
import re
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


lowered = fwd_bwd.lower(state.params)
compiled = lowered.compile()
txt = compiled.as_text()
with open("/tmp/step_hlo.txt", "w") as f:
    f.write(txt)
print("HLO chars:", len(txt), flush=True)

# print the definition line + body op histogram of the named fusions
for name in ["fusion.3", "fusion.1", "fusion.2", "fusion.15"]:
    m = re.search(rf"^\s*%?{re.escape(name)} = .*$", txt, re.M)
    if m:
        print("=" * 20, name, "=" * 20)
        print(m.group(0)[:600])
    # find its called computation
    m2 = re.search(rf"{re.escape(name)} = [^\n]*calls=([%\w.\-_]+)", txt)
    if m2:
        comp = m2.group(1).lstrip("%")
        cm = re.search(
            rf"^%?{re.escape(comp)} [^\n]*{{\n(.*?)^}}", txt, re.M | re.S)
        if cm:
            body = cm.group(1)
            ops = re.findall(r"= ([a-z0-9\-]+)\(|= [a-z0-9\[\]{}, ]+ ([a-z\-]+)\(", body)
            hist = {}
            for a, b in ops:
                op = a or b
                hist[op] = hist.get(op, 0) + 1
            print("  body ops:", sorted(hist.items(), key=lambda kv: -kv[1])[:15])
            big = [ln.strip()[:200] for ln in body.splitlines()
                   if ("gather" in ln or "scatter" in ln or "sort" in ln
                       or "while" in ln or "convolution" in ln
                       or "1310720" in ln or "4194304" in ln)]
            for ln in big[:12]:
                print("   |", ln)

# pipelined timing: enqueue 10 steps, block once
out = fwd_bwd(state.params)
jax.block_until_ready(out)
for trial in range(3):
    t0 = time.perf_counter()
    outs = None
    for _ in range(10):
        outs = fwd_bwd(state.params)
    jax.block_until_ready(outs)
    print(f"pipelined 10-step avg: {(time.perf_counter()-t0)*100:.1f} ms",
          flush=True)
