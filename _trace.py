import numpy as np
import jax, jax.numpy as jnp

from relightable3dgaussian_tpu.models import gaussians as G
from relightable3dgaussian_tpu.models import render as R
from relightable3dgaussian_tpu.ops.rasterize import RasterizeConfig
from relightable3dgaussian_tpu.scene.cameras import make_camera

W = H = 800
P = 100_000
cap = 131_072
rng = np.random.default_rng(0)
z = rng.uniform(1.2, 4.0, P)
half = np.tan(0.45) * z
pts = np.stack([rng.uniform(-1,1,P)*half, rng.uniform(-1,1,P)*half,
                2.8 - z], -1).astype(np.float32)
state = G.create_from_points(pts, rng.uniform(0,1,(P,3)).astype(np.float32),
                             capacity=cap, init_scale=np.full(P, 0.012, np.float32))
cfg = RasterizeConfig(width=W, height=H, max_tiles_per_gaussian=32,
                      max_per_tile=512, chunk=32)
c = np.array([0., 0., 2.8]); fw = -c/np.linalg.norm(c); up=np.array([0.,1.,0.])
r = np.cross(fw, up); dn = np.cross(fw, r); Rm = np.stack([r, dn, fw], 1)
cam = make_camera(uid=0, R=Rm, t=-Rm.T@c, fovx=0.9, fovy=0.9, width=W, height=H)
ci = {k: jnp.asarray(v) for k, v in cam.render_inputs().items()}
target = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

@jax.jit
def fwd_bwd(params):
    def loss_fn(p):
        res = R.render_view(p, state.alive, camera=ci, bg_color=jnp.zeros(3),
                            config=cfg, active_sh_degree=3,
                            compute_pseudo_normal=False)
        loss, _ = R.calculate_loss(res, {"image": target}, R.LossConfig())
        return loss
    return jax.grad(loss_fn)(params)

g = fwd_bwd(state.params); jax.block_until_ready(g)
with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(3):
        g = fwd_bwd(state.params)
    jax.block_until_ready(g)
print("trace done", flush=True)
