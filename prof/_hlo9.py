"""Dump the scatter fusion's full body to see what's fused inside."""
import re
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

txt = fwd_bwd.lower(state.params).compile().as_text()
with open("/tmp/step_hlo.txt", "w") as f:
    f.write(txt)
# find all scatter ops and their enclosing fusions
for m in re.finditer(r"^\s*(%?[\w.\-]+) = [^\n]*scatter\([^\n]*$", txt, re.M):
    print(m.group(0)[:500])
    print("-----")
# fusion.2 full body
m2 = re.search(r"%fused_computation\.12 [^\n]*\{\n(.*?)^\}", txt, re.M | re.S)
if m2:
    body = m2.group(1)
    print("== fused_computation.12 ==")
    print(body[:4000])
